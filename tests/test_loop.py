"""End-to-end train() driver test: tiny model, synthetic data, 2 steps."""

import os

import numpy as np


def test_train_loop_end_to_end(tmp_path):
    from pips_tpu.train.config import TrainConfig
    from pips_tpu.train.loop import train

    cfg = TrainConfig(
        B=1, S=4, N=8, crop_size=(64, 96), I=1,
        latent_dim=16, corr_levels=3, corr_radius=2, mixer_dim=32, mixer_depth=2,
        dataset="synthetic", horz_flip=False, vert_flip=False,
        max_iters=2, lr=1e-4, log_freq=100, val_freq=2, save_freq=2,
        ckpt_dir=str(tmp_path / "ckpts"), log_dir=str(tmp_path / "logs"),
        mesh_shape=(1, 1), use_scheduler=False, val_batches=2,
    )
    metrics = train(cfg)
    assert np.isfinite(metrics["total_loss"])

    # checkpoint was written with keep-latest semantics
    from pips_tpu.utils import saverloader
    run_dirs = os.listdir(cfg.ckpt_dir)
    assert len(run_dirs) == 1
    steps = saverloader.list_steps(os.path.join(cfg.ckpt_dir, run_dirs[0]))
    assert steps == [2]

    # metrics were logged, including the pooled validation pass
    logs = os.listdir(cfg.log_dir)
    assert len(logs) == 1
    import json
    events = [json.loads(l) for l in
              open(os.path.join(cfg.log_dir, logs[0], "events.jsonl"))]
    keys = {k for e in events for k in e}
    assert any(k.startswith("val_pooled/") for k in keys), sorted(keys)


def test_config_cli_roundtrip():
    from pips_tpu.train.config import parse_cli

    cfg = parse_cli(["--B", "2", "--lr", "1e-3", "--horz_flip", "false",
                     "--crop_size", "256,384", "--dataset=synthetic", "--quick"])
    assert cfg.B == 2 and cfg.lr == 1e-3
    assert cfg.horz_flip is False
    assert tuple(cfg.crop_size) == (256, 384)
    assert cfg.dataset == "synthetic"
    assert cfg.quick is True


def test_model_name_format():
    from pips_tpu.train.config import TrainConfig

    cfg = TrainConfig(B=1, horz_flip=True, vert_flip=True, S=8, N=128, I=6,
                      lr=3e-4, use_augs=True, exp_name="tb89")
    name = cfg.model_name()
    assert name.startswith("4hv_8_128_I6_3e-4_A_tb89")
