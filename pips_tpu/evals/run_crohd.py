"""CroHD head-tracking eval (capability parity: reference ``test_on_crohd.py``).

Runs the S=8 (of 24, stride-3) windows through the model and reports pooled
ATE over the visible and occluded head subsets (reference expected values:
ate_vis 4.57, ate_occ 7.71 — ``test_on_crohd.py:245-246``).
``--modeltype pips|raft|dino`` selects the model, like the reference's three
eval columns (``test_on_crohd.py:276-288``).

    python -m pips_tpu.evals.run_crohd --init_dir <ckpt> --dataset_root <ht21>
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from pips_tpu.data.crohd import CrohdDataset, prep_sample
from pips_tpu.evals.common import load_params
from pips_tpu.evals.metrics import ate_metrics
from pips_tpu.models import Pips
from pips_tpu.utils import SimplePool


def main(init_dir: str = "checkpoints/ref", dataset_root: str = "/data/head_tracking",
         S: int = 8, N: int = 16, stride: int = 4, iters: int = 6,
         max_iters: int = 0, req_occlusion: bool = True, dset: str = "t",
         dtype: str = "float32", modeltype: str = "pips", raft_iters: int = 32,
         log_freq: int = 0, log_dir: str = "logs_test_on_crohd"):
    if modeltype == "pips":
        from pips_tpu.evals.common import make_pips
        model = make_pips(S=S, stride=stride, dtype=dtype)
        params = load_params(model, init_dir)

        @jax.jit
        def fwd(params, xys, rgbs):
            out = model.apply(params, xys, rgbs, iters=iters, is_train=False,
                              corr_mode="onehot")
            return out.coord_predictions[-1]

        track = lambda xys, rgbs: np.asarray(  # noqa: E731
            fwd(params, jnp.asarray(xys), jnp.asarray(rgbs)))
    else:
        # raft: flow-chained trajectories over the S-frame window
        # (test_on_crohd.py:169-222); dino: windowed label propagation
        # (test_on_crohd.py:65-93)
        from pips_tpu.evals.common import build_baseline_tracker
        track = build_baseline_tracker(modeltype, init_dir,
                                       raft_iters=raft_iters)

    dataset = CrohdDataset(seqlen=S * 3, dset=dset, dataset_root=dataset_root)
    max_iters = max_iters or len(dataset)

    pools = {k: SimplePool(10000) for k in ("ate_all", "ate_vis", "ate_occ")}
    writer = None
    for step in range(max_iters):
        raw = dataset[step]
        d, ok = prep_sample(raw, N_max=N, S_stride=3, req_occlusion=req_occlusion)
        if not ok:
            continue
        # pad/truncate to fixed N for stable jit shapes
        n = d["trajs_g"].shape[2]
        if n < N:
            pad = N - n
            d["trajs_g"] = np.concatenate(
                [d["trajs_g"], np.repeat(d["trajs_g"][:, :, :1], pad, 2)], axis=2)
            d["vis_g"] = np.concatenate(
                [d["vis_g"], np.repeat(d["vis_g"][:, :, :1], pad, 2)], axis=2)
            valids = np.concatenate(
                [np.ones((1, S, n)), np.zeros((1, S, pad))], axis=2).astype(np.float32)
        else:
            valids = np.ones((1, S, N), np.float32)

        t0 = time.time()
        trajs_e = track(d["trajs_g"][:, 0], d["rgbs"])
        m = ate_metrics(np.asarray(trajs_e), d["trajs_g"], valids, d["vis_g"])
        for k, p in pools.items():
            if m[k] > 0:
                p.update([m[k]])
        print(f"step {step + 1:04d}/{max_iters}; itime {time.time() - t0:.2f}; "
              + "; ".join(f"{k} {p.mean():.2f}" for k, p in pools.items()))
        if log_freq and step % log_freq == 0:
            # reference test_on_crohd.py:102,152,217: ATE-stamped gt trajs on
            # the time-mean frame ('winter'), plus the estimate gif
            from pips_tpu.utils.improc import Summ_writer, preprocess_color
            from pips_tpu.utils.logging import MetricWriter
            if writer is None:
                writer = MetricWriter(log_dir, use_tensorboard=False)
            sw = Summ_writer(writer, global_step=step, log_freq=1, fps=8)
            rgb_mean = preprocess_color(d["rgbs"][0].mean(axis=0))
            sw.summ_traj2ds_on_rgb("inputs_0_all/single_trajs_on_rgb",
                                   d["trajs_g"][0], rgb_mean, valids=valids[0],
                                   cmap="winter", linewidth=2,
                                   frame_id=m["ate_all"])
            sw.summ_traj2ds_on_rgbs("outputs/trajs_on_rgbs",
                                    np.asarray(trajs_e)[0],
                                    preprocess_color(d["rgbs"][0]),
                                    cmap="spring", linewidth=2)
    return {k: p.mean() for k, p in pools.items()}


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    print(auto_cli(main))
