"""BADJA / CroHD / PointOdyssey loaders against synthetic on-disk trees."""

import json
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def fake_badja(tmp_path_factory):
    root = tmp_path_factory.mktemp("badja")
    rng = np.random.RandomState(0)
    (root / "joint_annotations").mkdir()
    animal = "bear"
    img_dir = root / "DAVIS/JPEGImages/Full-Resolution" / animal
    seg_dir = root / "DAVIS/Annotations/Full-Resolution" / animal
    img_dir.mkdir(parents=True)
    seg_dir.mkdir(parents=True)
    H, W = 60, 80
    ann = []
    for fr in range(5):
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{fr:05d}.jpg")
        seg = np.zeros((H, W), np.uint8)
        seg[10:40, 20:60] = 255
        Image.fromarray(seg).save(seg_dir / f"{fr:05d}.png")
        if fr != 2:  # frame 2 unannotated -> zero-filled
            ann.append({
                "image_path": f"DAVIS/JPEGImages/Full-Resolution/{animal}/{fr:05d}.jpg",
                "segmentation_path":
                    f"DAVIS/Annotations/Full-Resolution/{animal}/{fr:05d}.png",
                "joints": (rng.rand(37, 2) * [H - 1, W - 1]).tolist(),  # (y, x)!
                "visibility": rng.randint(0, 2, 37).tolist(),
            })
    (root / "joint_annotations" / "bear.json").write_text(json.dumps(ann))
    return str(root)


def test_badja_dataset(fake_badja):
    from pips_tpu.data.badja import ANNOTATED_CLASSES, BadjaDataset

    ds = BadjaDataset(fake_badja)
    assert len(ds) == 1
    d = ds[0]
    S = d["rgbs"].shape[0]
    assert S == 5
    N = len(ANNOTATED_CLASSES)
    assert d["trajs"].shape == (S, N, 2)
    assert d["segs"].shape == d["rgbs"].shape[:3]
    # unannotated frame zero-filled
    assert (d["trajs"][2] == 0).all() and (d["visibles"][2] == 0).all()
    # (y, x) -> (x, y) flip applied: x coords bounded by W
    assert d["trajs"][0, :, 0].max() <= d["rgbs"].shape[2] - 1


@pytest.fixture(scope="module")
def fake_crohd(tmp_path_factory):
    root = tmp_path_factory.mktemp("ht21")
    rng = np.random.RandomState(0)
    n_frames, n_heads = 30, 4
    for sub in ("HT21-01", "HT21-02", "HT21-03", "HT21-04"):
        img_dir = root / "HT21/train" / sub / "img1"
        gt_dir = root / "HT21Labels/train" / sub / "gt"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for fr in range(n_frames):
            Image.fromarray((rng.rand(32, 48, 3) * 255).astype(np.uint8)).save(
                img_dir / f"{fr + 1:06d}.jpg")
        rows = []
        for fr in range(n_frames):
            for hid in range(n_heads):
                x = 5 + hid * 8 + fr * (2 if hid == 0 else 0.2)
                y = 10.0 + hid
                rows.append(f"{fr + 1},{hid + 1},{x:.1f},{y:.1f},4,4,1,1,1")
        (gt_dir / "gt.txt").write_text("\n".join(rows))
    return str(root)


def test_crohd_dataset(fake_crohd):
    from pips_tpu.data.crohd import CrohdDataset, prep_sample

    ds = CrohdDataset(seqlen=24, dset="t", dataset_root=fake_crohd)
    assert len(ds) == 4  # 4 folders x (30 // 24)
    sample = ds[0]
    assert sample["rgbs"].shape == (24, 32, 48, 3)
    assert sample["xylist"].shape[2] == 2

    d, ok = prep_sample(sample, N_max=16, S_stride=3, req_occlusion=False)
    assert ok
    assert d["rgbs"].shape[1] == 8
    # only head 0 moves >150px cumulative from frame 0
    assert d["trajs_g"].shape == (1, 8, 1, 2)


@pytest.fixture(scope="module")
def fake_pointodyssey(tmp_path_factory):
    root = tmp_path_factory.mktemp("po")
    rng = np.random.RandomState(0)
    seq = root / "train" / "seq0"
    (seq / "rgbs").mkdir(parents=True)
    T, H, W, N = 12, 64, 96, 40
    for fr in range(T):
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            seq / "rgbs" / f"rgb_{fr + 1:05d}.jpg")
    trajs = rng.rand(T, N, 2) * [W - 4, H - 4] + 2
    vis = np.ones((T, N))
    np.savez(seq / "annotations.npz", trajs_2d=trajs, visibilities=vis)
    return str(root)


def test_pointodyssey_dataset(fake_pointodyssey):
    from pips_tpu.data.pointodyssey import PointOdysseyDataset

    ds = PointOdysseyDataset(fake_pointodyssey, dset="train", S=8, N=16,
                             crop_size=(48, 64))
    assert len(ds) == 4  # 12 - 8
    sample, gotit = ds[0]
    assert gotit
    assert sample["rgbs"].shape == (8, 48, 64, 3)
    assert sample["trajs"].shape == (8, 16, 2)
    assert sample["valids"].shape == (8, 16)
