"""Eval runners end-to-end on synthetic data trees (tiny model, random init)."""

import numpy as np
import pytest

from pips_tpu.evals import common as evals_common
from pips_tpu.models import Pips

PIL = pytest.importorskip("PIL")

TINY = dict(latent_dim=16, corr_levels=3, corr_radius=2, mixer_dim=32,
            mixer_depth=2)


def tiny_pips(S=8, stride=8, **kw):
    return Pips(S=S, stride=stride, **TINY)


def test_run_flt_end_to_end(monkeypatch, tmp_path_factory):
    from tests_treeutil import make_flyingthings_tree

    from pips_tpu.evals import run_flt

    root = make_flyingthings_tree(tmp_path_factory.mktemp("flt"), dset="TEST")
    monkeypatch.setattr(evals_common, "Pips", tiny_pips)
    logd = str(tmp_path_factory.mktemp("logs"))
    out = run_flt.main(init_dir="random", dataset_location=root, N=8,
                       crop_size=(96, 128), max_iters=2, iters=1,
                       log_dir=logd, log_freq=1)
    assert np.isfinite(out["ate_all"])
    assert out["ate_all"] > 0
    # log_freq emitted the reference's eval media (ATE-stamped gt overlay
    # + estimate gif; test_on_flt.py:58,106)
    import glob
    import os
    media = glob.glob(os.path.join(logd, "media", "*"))
    assert any(m.endswith(".png") for m in media)
    assert any(m.endswith(".gif") for m in media)


def test_run_badja_end_to_end(monkeypatch, tmp_path_factory):
    from tests_treeutil import make_badja_tree

    from pips_tpu.evals import run_badja

    root = make_badja_tree(tmp_path_factory.mktemp("badja"))
    monkeypatch.setattr(evals_common, "Pips", tiny_pips)
    out = run_badja.main(init_dir="random", data_dir=root, S=4, stride=8,
                         iters=1, max_iters=1, resize_hw=(64, 96))
    assert "avg" in out and np.isfinite(out["avg"])


def test_run_crohd_end_to_end(monkeypatch, tmp_path_factory):
    from tests_treeutil import make_crohd_tree

    from pips_tpu.evals import run_crohd

    root = make_crohd_tree(tmp_path_factory.mktemp("ht21"))
    monkeypatch.setattr(evals_common, "Pips", tiny_pips)
    logd = str(tmp_path_factory.mktemp("crohd_logs"))
    out = run_crohd.main(init_dir="random", dataset_root=root, S=8, stride=8,
                         N=4, iters=1, max_iters=2, req_occlusion=False,
                         log_freq=1, log_dir=logd)
    assert np.isfinite(out["ate_all"])
    import glob
    import os
    media = glob.glob(os.path.join(logd, "media", "*"))
    assert any(m.endswith(".png") for m in media)
    assert any(m.endswith(".gif") for m in media)


@pytest.fixture(scope="module")
def dino_ckpt(tmp_path_factory):
    """Tiny DINO-format ViT checkpoint on disk (dim 128 -> 2 heads inferred)."""
    import torch
    from test_vit_convert import make_dino_sd

    sd = make_dino_sd(np.random.RandomState(7), dim=128, heads=2, depth=2,
                      patch=8, grid=4)
    path = tmp_path_factory.mktemp("dino") / "dino_tiny.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    return str(path)


@pytest.fixture(scope="module")
def raft_ckpt(tmp_path_factory):
    """Reference-format RAFT checkpoint (random weights, 'module.' prefixes
    like the published raft-things.pth)."""
    import sys

    import torch

    from conftest import REFERENCE_DIR

    if not __import__("os").path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not available")
    for p in (REFERENCE_DIR, f"{REFERENCE_DIR}/nets/raft_core"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from raft import RAFT as TorchRAFT  # noqa: E402

    import argparse
    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False)
    torch.manual_seed(3)
    sd = {f"module.{k}": v for k, v in TorchRAFT(args).state_dict().items()}
    path = tmp_path_factory.mktemp("raft") / "raft_tiny.pth"
    torch.save(sd, str(path))
    return str(path)


def test_run_badja_raft(raft_ckpt, tmp_path_factory):
    """--modeltype raft: flow-chained baseline over the full BADJA video
    (reference test_on_badja.py:161-228). 128x160 keeps every corr-pyramid
    level >= 2px."""
    from tests_treeutil import make_badja_tree

    from pips_tpu.evals import run_badja

    root = make_badja_tree(tmp_path_factory.mktemp("badja"), T=2)
    out = run_badja.main(init_dir=raft_ckpt, data_dir=root, max_iters=1,
                         resize_hw=(128, 160), modeltype="raft", raft_iters=1)
    assert "avg" in out and np.isfinite(out["avg"])


def test_run_badja_dino(dino_ckpt, tmp_path_factory):
    """--modeltype dino: label-prop baseline (reference test_on_badja.py:386-539)."""
    from tests_treeutil import make_badja_tree

    from pips_tpu.evals import run_badja

    root = make_badja_tree(tmp_path_factory.mktemp("badja"), T=3)
    out = run_badja.main(init_dir=dino_ckpt, data_dir=root, max_iters=1,
                         resize_hw=(64, 96), modeltype="dino")
    assert "avg" in out and np.isfinite(out["avg"])


def test_run_crohd_raft(raft_ckpt, tmp_path_factory):
    from tests_treeutil import make_crohd_tree

    from pips_tpu.evals import run_crohd

    # S=8 like the pips test: prep_sample's motion filter rejects shorter
    # windows on this tree; 128x160 keeps every corr-pyramid level >= 2px
    root = make_crohd_tree(tmp_path_factory.mktemp("ht21"), H=128, W=160)
    out = run_crohd.main(init_dir=raft_ckpt, dataset_root=root, S=8, N=4,
                         max_iters=2, req_occlusion=False, modeltype="raft",
                         raft_iters=1)
    assert np.isfinite(out["ate_all"])


def test_run_crohd_dino(dino_ckpt, tmp_path_factory):
    from tests_treeutil import make_crohd_tree

    from pips_tpu.evals import run_crohd

    root = make_crohd_tree(tmp_path_factory.mktemp("ht21"))
    out = run_crohd.main(init_dir=dino_ckpt, dataset_root=root, S=8, N=4,
                         max_iters=2, req_occlusion=False, modeltype="dino")
    assert np.isfinite(out["ate_all"])


def test_run_davis_end_to_end(monkeypatch, tmp_path_factory):
    from tests_treeutil import make_davis_tree

    from pips_tpu.evals import run_davis

    root = make_davis_tree(tmp_path_factory.mktemp("davis"))
    monkeypatch.setattr(evals_common, "Pips", tiny_pips)
    out = run_davis.main(init_dir="random", davis_dir=root, S=8, stride=8,
                         iters=1, chunk=16, resize_hw=(48, 96), max_videos=1,
                         point_stride=16)
    assert np.isfinite(out["mean_tps"]) and out["mean_tps"] > 0


def test_run_davis_single_call(monkeypatch, tmp_path_factory):
    """--chunk 0: the whole dense grid in ONE track call (TPU-native mode)."""
    from tests_treeutil import make_davis_tree

    from pips_tpu.evals import run_davis

    root = make_davis_tree(tmp_path_factory.mktemp("davis"))
    monkeypatch.setattr(evals_common, "Pips", tiny_pips)
    out = run_davis.main(init_dir="random", davis_dir=root, S=8, stride=8,
                         iters=1, chunk=0, resize_hw=(48, 96), max_videos=1,
                         point_stride=16)
    assert np.isfinite(out["mean_tps"]) and out["mean_tps"] > 0


def test_run_davis_mesh_matches_single_device(monkeypatch, tmp_path_factory):
    """--mesh 1,8 (VERDICT r4 #3): dense grid sharded over the 8-device CPU
    mesh returns the same trajectories as the single-device run."""
    from tests_treeutil import make_davis_tree

    from pips_tpu.evals import run_davis

    root = make_davis_tree(tmp_path_factory.mktemp("davis"))
    monkeypatch.setattr(evals_common, "Pips", tiny_pips)
    kw = dict(init_dir="random", davis_dir=root, S=8, stride=8, iters=1,
              chunk=0, resize_hw=(48, 96), max_videos=1, point_stride=16)
    out1 = run_davis.main(**kw)
    out2 = run_davis.main(**kw, mesh="1,8")
    assert np.isfinite(out2["trajs"]).all()
    np.testing.assert_allclose(out1["trajs"], out2["trajs"], atol=5e-3)
