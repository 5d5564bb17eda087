"""The training driver (capability parity: reference ``train.py:146-417``).

Composes: dataset -> host batcher -> device prefetch -> sharded jitted step
-> pooled metric logging -> periodic val + checkpointing with auto-resume.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pips_tpu.data import DevicePrefetcher, SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.parallel import (distributed_init, make_hybrid_mesh, make_mesh,
                               make_sharded_train_step, replicate, shard_batch)
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


def resolve_dtype(name: str):
    """Config dtype string -> model compute dtype (None keeps exact fp32)."""
    table = {"float32": None, "f32": None, "fp32": None,
             "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}
    if name not in table:
        raise ValueError(f"unknown dtype {name!r}; use float32 or bfloat16")
    return table[name]


def resolve_fuse_chanff(flag: int, dtype, devices=None) -> bool:
    """-1 auto: fused mixer kernel iff running on TPU with bf16 compute
    (pallas compiles there and the bf16 tolerance applies); 0/1 force.
    Pass the mesh's devices so the gate reflects where the step actually
    runs (the default backend can differ from the mesh placement)."""
    from pips_tpu.kernels import fused_kernels_supported

    if flag >= 0:
        return bool(flag)
    return dtype == jnp.bfloat16 and fused_kernels_supported(devices)


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
    from pips_tpu.utils.compcache import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()
    cfg = cfg or TrainConfig()
    if cfg.quick:  # smoke mode (reference train2.py:180-190 analog)
        # mesh pinned to one device: a wide point-sharded compile of the
        # full-dim model takes tens of minutes on virtual CPU devices
        cfg = type(cfg)(**{**cfg.__dict__, "B": 1, "N": 16, "max_iters": 20,
                           "crop_size": (128, 192), "use_augs": False,
                           "dataset": "synthetic", "log_freq": 10, "val_freq": 10,
                           "save_freq": 10, "mesh_shape": (1, 1)})

    if cfg.multihost:
        distributed_init(cfg.coordinator or None, cfg.num_processes or None,
                         cfg.process_id)
    is_main = jax.process_index() == 0

    name = cfg.model_name()
    if is_main:
        print("model_name", name)

    from pips_tpu.parallel import default_mesh_shape
    if cfg.multihost:
        ici = tuple(cfg.mesh_shape) if cfg.mesh_shape else (jax.local_device_count(), 1)
        mesh = make_hybrid_mesh(ici)
    else:
        mesh = make_mesh(cfg.mesh_shape
                         or default_mesh_shape(len(jax.devices()), cfg.B, cfg.N))
    if cfg.model_family == "pips2":
        from pips_tpu.models import Pips2
        # mixer_dim/mixer_depth double as the temporal refiner's knobs
        # (PIPs++ default 256x6 <- set via CLI)
        model = Pips2(stride=cfg.stride, latent_dim=cfg.latent_dim,
                      corr_levels=cfg.corr_levels, corr_radius=cfg.corr_radius,
                      refiner_dim=cfg.mixer_dim, refiner_depth=cfg.mixer_depth,
                      dtype=resolve_dtype(cfg.dtype),
                      fuse_chanff=resolve_fuse_chanff(
                          cfg.fuse_chanff, resolve_dtype(cfg.dtype),
                          devices=mesh.devices.flat))
    else:
        model = Pips(S=cfg.S, stride=cfg.stride, latent_dim=cfg.latent_dim,
                     corr_levels=cfg.corr_levels, corr_radius=cfg.corr_radius,
                     mixer_dim=cfg.mixer_dim, mixer_depth=cfg.mixer_depth,
                     dtype=resolve_dtype(cfg.dtype),
                     remat_mixer=cfg.remat_mixer, remat_corr=cfg.remat_corr,
                     remat_encoder=cfg.remat_encoder,
                     fuse_chanff=resolve_fuse_chanff(cfg.fuse_chanff,
                                                     resolve_dtype(cfg.dtype),
                                                     devices=mesh.devices.flat),
                     fuse_conv3=resolve_fuse_chanff(cfg.fuse_conv3,
                                                    resolve_dtype(cfg.dtype),
                                                    devices=mesh.devices.flat))
    state = init_state(cfg, model)

    ckpt_dir = f"{cfg.ckpt_dir}/{name}"
    global_step = 0
    if cfg.auto_resume and not cfg.init_dir and saverloader.list_steps(ckpt_dir):
        # auto-resume: a killed/preempted run relaunched with the SAME config
        # picks up its own latest checkpoint — full state (params+optimizer)
        # and step counter. (The reference requires an explicit
        # --init_dir/--load_optimizer/--load_step relaunch, train.py:263-268;
        # on preemptible TPU pods resume must not depend on operator flags.)
        state, global_step = saverloader.load(ckpt_dir, state)
        if jax.process_index() == 0:
            print(f"auto-resumed from {ckpt_dir} at step {global_step}")
    elif cfg.init_dir:
        target = state if cfg.load_optimizer else state.params
        restored, step = saverloader.load(cfg.init_dir, target,
                                          ignore_load=cfg.ignore_load)
        if cfg.load_optimizer:
            state = restored
        else:
            state = state.replace(params=restored)
        if cfg.load_step:
            global_step = step

    if jax.process_count() > 1:
        # Checkpoints are written by process 0 only, so every host must see
        # the same ckpt_dir (shared filesystem) to resume from the same step.
        # A divergent resume would silently mix restored and fresh params and
        # run different trip counts through the step loop (deadlocking at the
        # final steps' collectives) — fail loudly instead.
        from jax.experimental import multihost_utils
        steps = np.asarray(
            multihost_utils.process_allgather(np.int32(global_step))).ravel()
        if int(steps.min()) != int(steps.max()):
            raise RuntimeError(
                "auto-resume divergence: processes found checkpoint steps "
                f"{sorted(set(int(s) for s in steps))}; ckpt_dir must be a "
                "filesystem shared by all hosts")
    if global_step >= cfg.max_iters and is_main:
        print(f"{ckpt_dir} is already at step {global_step} >= "
              f"max_iters={cfg.max_iters}; nothing to train "
              f"(pass --auto_resume false or a new --exp_name to start fresh)")

    state = jax.device_put(state, replicate(mesh))

    step_fn = make_sharded_train_step(
        model, state.tx, mesh, iters=cfg.I, horz_flip=cfg.horz_flip,
        vert_flip=cfg.vert_flip, grad_acc=cfg.grad_acc,
        use_fused_corr=cfg.use_fused_corr, remat=cfg.remat)

    # per-process seed decorrelation: each host draws distinct samples
    seed0 = 125 + 1000 * jax.process_index()
    train_it = DevicePrefetcher(
        batch_iterator(build_dataset(cfg, "train"), cfg.B, shuffle=cfg.shuffle,
                       seed=seed0, grad_acc=cfg.grad_acc,
                       num_workers=cfg.num_workers,
                       use_processes=cfg.loader_processes),
        put_fn=lambda b: shard_batch(mesh, b, cfg.grad_acc))
    val_it = None
    if cfg.val_freq > 0:
        val_it = DevicePrefetcher(
            batch_iterator(build_dataset(cfg, "val"), cfg.B, shuffle=True,
                           seed=seed0, num_workers=max(cfg.num_workers // 2, 1)),
            put_fn=lambda b: shard_batch(mesh, b, 1))

    from pips_tpu.train.step import train_loss_fn
    val_fn = jax.jit(lambda p, b: train_loss_fn(model, p, b, cfg.I, is_train=False))

    writer = MetricWriter(f"{cfg.log_dir}/{name}")

    # visual summary probe (the reference threads `sw` INTO the model forward,
    # nets/pips.py:481-497; here a small fixed batch is re-tracked every
    # log_freq steps and rendered host-side, off the jit path)
    vis_state = None
    if cfg.log_media and cfg.log_freq > 0 and jax.process_count() == 1:
        NV = min(16, cfg.N)
        vb = next(batch_iterator(build_dataset(cfg, "train"), 1, shuffle=True,
                                 seed=777, num_workers=1))
        vb = {k: (v if k == "rgbs" else v[:, :, :NV]) for k, v in vb.items()}
        # fcp heatmaps re-track with compute_fcp=True — a SECOND full forward
        # variant. At production HxW that is a second multi-minute compile on
        # the tunnel for a GIF; above the guard we render trajectories only.
        want_fcp = vb["rgbs"].shape[2] * vb["rgbs"].shape[3] <= 384 * 512
        vis_fn = jax.jit(lambda p, b: model.apply(
            p, b["trajs"][:, 0], b["rgbs"], iters=cfg.I, is_train=False,
            compute_fcp=want_fcp))
        vis_state = (vb, jax.device_put(vb), vis_fn)
    METRIC_KEYS = ("total_loss", "seq", "vis", "ce", "ate_all", "ate_vis",
                   "ate_occ")
    pools = {k: SimplePool(100) for k in METRIC_KEYS}
    # validation pools persist across val events (reference train.py:358-402
    # pools val metrics with n=10000 alongside the train pools)
    val_pools = {k: SimplePool(10000) for k in METRIC_KEYS}

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
                # ate_* are masked means that return 0 when the mask is empty
                # (e.g. no occluded points in the batch) — skip those; loss
                # terms pool unconditionally (a legitimate ce == 0 counts)
                if v > 0 or not k.startswith("ate_"):
                    pool.update([v])
        iter_time = time.time() - t0
        if sync and is_main and global_step % max(cfg.log_freq // 100, 1) == 0:
            writer.scalars(global_step,
                           {f"pooled/{k}": p.mean() for k, p in pools.items()})

        if vis_state is not None and global_step % cfg.log_freq == 0:
            from pips_tpu.utils.improc import Summ_writer, render_fcp_vis
            vb, vb_dev, vis_fn = vis_state
            out = jax.device_get(vis_fn(state.params, vb_dev))
            sw = Summ_writer(writer, global_step, log_freq=cfg.log_freq)
            rgbs8 = np.clip(vb["rgbs"][0], 0, 255).astype(np.uint8)  # (S,H,W,3)
            vis_p = 1.0 / (1.0 + np.exp(-out.vis_e[0]))              # (S,NV)
            sw.summ_traj2ds_on_rgbs("train/trajs_on_rgbs",
                                    out.coord_predictions[-1][0], rgbs8,
                                    visibles=vis_p)
            if out.fcps is not None:
                # score-map heatmaps, point 0 (reference nets/pips.py:566-598)
                sw.summ_rgbs("train/fcp_point0", list(render_fcp_vis(
                    out.fcps[0, :, :, 0], out.coord_predictions[:, 0, :, 0],
                    trajs_g=vb["trajs"][0, :, 0], stride=cfg.stride)))

        if val_it is not None and global_step % cfg.val_freq == 0:
            # validation pass: cfg.val_batches held-out batches, pooled
            # metrics (reference train.py:358-402)
            for _ in range(max(cfg.val_batches, 1)):
                vb = next(val_it)
                _, vmetrics = val_fn(state.params, vb)
                vmetrics = jax.device_get(vmetrics)
                for k, pool in val_pools.items():
                    v = float(vmetrics[k])
                    if v > 0 or not k.startswith("ate_"):
                        pool.update([v])
            if is_main:
                writer.scalars(global_step, {
                    **{f"val/{k}": float(v) for k, v in vmetrics.items()},
                    **{f"val_pooled/{k}": p.mean()
                       for k, p in val_pools.items() if p.items}})

        if global_step % cfg.save_freq == 0 and is_main:
            saverloader.save(ckpt_dir, jax.device_get(state), global_step,
                             keep_latest=cfg.keep_latest)

        if sync and is_main:
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
