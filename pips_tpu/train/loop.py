"""The training driver (capability parity: reference ``train.py:146-417``).

Composes: dataset -> host batcher -> device prefetch -> sharded jitted step
-> pooled metric logging -> periodic val + checkpointing with auto-resume.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from pips_tpu.data import DevicePrefetcher, SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.parallel import make_mesh, make_sharded_train_step, replicate, shard_batch
from pips_tpu.train.config import TrainConfig
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState
from pips_tpu.utils import SimplePool, saverloader
from pips_tpu.utils.logging import MetricWriter


def build_dataset(cfg: TrainConfig, split: str = "train"):
    if cfg.dataset == "synthetic":
        return SyntheticPointDataset(S=cfg.S, N=cfg.N, H=cfg.crop_size[0],
                                     W=cfg.crop_size[1],
                                     seed=125 if split == "train" else 9125)
    if cfg.dataset == "flyingthings":
        from pips_tpu.data.flyingthings import FlyingThingsDataset
        return FlyingThingsDataset(
            dataset_location=cfg.dataset_location,
            dset="TRAIN" if split == "train" else "TEST",
            subset=cfg.subset if split == "train" else "all",
            use_augs=cfg.use_augs, N=cfg.N, S=cfg.S, crop_size=tuple(cfg.crop_size))
    if cfg.dataset == "pointodyssey":
        from pips_tpu.data.pointodyssey import PointOdysseyDataset
        return PointOdysseyDataset(
            dataset_location=cfg.dataset_location,
            dset="train" if split == "train" else "val",
            use_augs=cfg.use_augs, N=cfg.N, S=cfg.S, crop_size=tuple(cfg.crop_size))
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def init_state(cfg: TrainConfig, model: Pips, rng_seed: int = 0) -> TrainState:
    rng = jax.random.PRNGKey(rng_seed)
    H, W = cfg.crop_size
    rgbs = np.zeros((1, cfg.S, H, W, 3), np.float32)
    xys = np.ones((1, 4, 2), np.float32)
    params = model.init(rng, xys, rgbs, iters=1)
    tx = make_optimizer(cfg.lr, cfg.max_iters // cfg.grad_acc, wdecay=cfg.wdecay,
                        use_scheduler=cfg.use_scheduler)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def train(cfg: Optional[TrainConfig] = None) -> dict:
    cfg = cfg or TrainConfig()
    if cfg.quick:  # smoke mode (reference train2.py:180-190 analog)
        cfg = type(cfg)(**{**cfg.__dict__, "B": 1, "N": 16, "max_iters": 20,
                           "crop_size": (128, 192), "use_augs": False,
                           "dataset": "synthetic", "log_freq": 10, "val_freq": 10,
                           "save_freq": 10})

    name = cfg.model_name()
    print("model_name", name)

    mesh = make_mesh(cfg.mesh_shape)
    model = Pips(S=cfg.S, stride=cfg.stride, latent_dim=cfg.latent_dim,
                 corr_levels=cfg.corr_levels, corr_radius=cfg.corr_radius,
                 mixer_dim=cfg.mixer_dim, mixer_depth=cfg.mixer_depth,
                 remat_mixer=cfg.remat_mixer, remat_corr=cfg.remat_corr)
    state = init_state(cfg, model)

    ckpt_dir = f"{cfg.ckpt_dir}/{name}"
    global_step = 0
    if cfg.init_dir:
        target = state if cfg.load_optimizer else state.params
        restored, step = saverloader.load(cfg.init_dir, target,
                                          ignore_load=cfg.ignore_load)
        if cfg.load_optimizer:
            state = restored
        else:
            state = state.replace(params=restored)
        if cfg.load_step:
            global_step = step

    state = jax.device_put(state, replicate(mesh))

    step_fn = make_sharded_train_step(
        model, state.tx, mesh, iters=cfg.I, horz_flip=cfg.horz_flip,
        vert_flip=cfg.vert_flip, grad_acc=cfg.grad_acc,
        use_fused_corr=cfg.use_fused_corr, remat=cfg.remat)

    train_it = DevicePrefetcher(
        batch_iterator(build_dataset(cfg, "train"), cfg.B, shuffle=cfg.shuffle,
                       grad_acc=cfg.grad_acc),
        put_fn=lambda b: shard_batch(mesh, b, cfg.grad_acc))
    val_it = None
    if cfg.val_freq > 0:
        val_it = DevicePrefetcher(
            batch_iterator(build_dataset(cfg, "val"), cfg.B, shuffle=True),
            put_fn=lambda b: shard_batch(mesh, b, 1))

    from pips_tpu.train.step import train_loss_fn
    val_fn = jax.jit(lambda p, b: train_loss_fn(model, p, b, cfg.I, is_train=False))

    writer = MetricWriter(f"{cfg.log_dir}/{name}")
    pools = {k: SimplePool(100) for k in
             ("total_loss", "seq", "vis", "ce", "ate_all", "ate_vis", "ate_occ")}

    last_metrics = {}
    while global_step < cfg.max_iters:
        global_step += 1
        if cfg.profile_dir and global_step == 10:
            jax.profiler.start_trace(cfg.profile_dir)
        if cfg.profile_dir and global_step == 15:
            jax.profiler.stop_trace()
        t0 = time.time()
        batch = next(train_it)
        read_time = time.time() - t0
        state, metrics = step_fn(state, batch)
        sync = (global_step % max(cfg.metrics_every, 1) == 0
                or global_step == cfg.max_iters)
        if sync:
            metrics = jax.device_get(metrics)
            for k, pool in pools.items():
                v = float(metrics[k])
                if v > 0 or k == "total_loss":
                    pool.update([v])
        iter_time = time.time() - t0
        if sync and global_step % max(cfg.log_freq // 100, 1) == 0:
            writer.scalars(global_step,
                           {f"pooled/{k}": p.mean() for k, p in pools.items()})

        if val_it is not None and global_step % cfg.val_freq == 0:
            # quick val probe: loss on one held-out batch (no grad)
            vb = next(val_it)
            _, vmetrics = val_fn(state.params, vb)
            writer.scalars(global_step,
                           {f"val/{k}": float(v) for k, v in jax.device_get(vmetrics).items()})

        if global_step % cfg.save_freq == 0:
            saverloader.save(ckpt_dir, jax.device_get(state), global_step,
                             keep_latest=cfg.keep_latest)

        if sync:
            last_metrics = {k: float(v) for k, v in metrics.items()}
            print(f"{name}; step {global_step:06d}/{cfg.max_iters}; "
                  f"rtime {read_time:.2f}; itime {iter_time:.2f}; "
                  f"loss = {last_metrics['total_loss']:.5f}")

    train_it.close()
    if val_it is not None:
        val_it.close()
    writer.close()
    return last_metrics


def main(argv: Optional[list[str]] = None):
    import sys
    from pips_tpu.train.config import parse_cli
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
