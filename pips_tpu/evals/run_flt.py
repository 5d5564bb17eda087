"""FlyingThings++ eval (capability parity: reference ``test_on_flt.py``).

Reports pooled ate_all / ate_vis / ate_occ with the per-sequence visibility
relabeling ("visible in >= 4 frames"). Usage:

    python -m pips_tpu.evals.run_flt --init_dir <ckpt> --dataset_location <flt>
"""

from __future__ import annotations

import time

import numpy as np

from pips_tpu.data.flyingthings import FlyingThingsDataset
from pips_tpu.evals.metrics import ate_metrics, per_seq_vis_label
from pips_tpu.utils import SimplePool
from pips_tpu.utils.logging import MetricWriter


def _build_tracker(modeltype: str, init_dir: str, S: int, stride: int, iters: int,
                   dtype: str = "float32", raft_iters: int = 32):
    """Returns fn(trajs_g0 (1,N,2), rgbs (1,S,H,W,3)) -> trajs_e (1,S,N,2)."""
    if modeltype == "pips":
        from pips_tpu.evals.common import build_pips_tracker
        return build_pips_tracker(init_dir, S=S, stride=stride, iters=iters,
                                  dtype=dtype)

    from pips_tpu.evals.common import build_baseline_tracker
    return build_baseline_tracker(modeltype, init_dir, raft_iters=raft_iters)


def main(init_dir: str = "checkpoints/ref", dataset_location: str = "/data/flyingthings",
         S: int = 8, N: int = 16, stride: int = 8, iters: int = 6,
         crop_size=(384, 512), max_iters: int = 0, log_dir: str = "logs_test_on_flt",
         subset: str = "all", shuffle: bool = True, modeltype: str = "pips",
         dtype: str = "float32", raft_iters: int = 32, log_freq: int = 0):
    tracker = _build_tracker(modeltype, init_dir, S, stride, iters,
                             dtype=dtype, raft_iters=raft_iters)

    dataset = FlyingThingsDataset(
        dataset_location=dataset_location, dset="TEST", subset=subset,
        use_augs=False, N=N, S=S, crop_size=tuple(crop_size))
    max_iters = max_iters or len(dataset)

    writer = MetricWriter(log_dir)
    pools = {k: SimplePool(10000) for k in ("ate_all", "ate_vis", "ate_occ")}
    step = 0
    idx = np.random.RandomState(125).permutation(len(dataset)) if shuffle \
        else np.arange(len(dataset))
    for i in idx:
        if step >= max_iters:
            break
        sample, gotit = dataset[int(i)]
        if not gotit:
            continue
        step += 1
        rgbs = sample["rgbs"][None]
        trajs_g = sample["trajs"][None]
        valids = sample["valids"][None]
        vis_g = per_seq_vis_label(sample["visibles"][None], min_frames=4)

        t0 = time.time()
        trajs_e = tracker(trajs_g[:, 0], rgbs)
        m = ate_metrics(trajs_e, trajs_g, valids, vis_g)
        for k, p in pools.items():
            if m[k] > 0:
                p.update([m[k]])
        print(f"step {step:06d}/{max_iters}; itime {time.time() - t0:.2f}; "
              + "; ".join(f"{k} {p.mean():.2f}" for k, p in pools.items()))
        writer.scalars(step, {f"pooled/{k}": p.mean() for k, p in pools.items()})
        if log_freq and step % log_freq == 0:
            from pips_tpu.evals.common import emit_eval_media
            emit_eval_media(writer, step, rgbs[0], trajs_g[0], trajs_e[0],
                            valids[0], m["ate_all"])
    writer.close()
    return {k: p.mean() for k, p in pools.items()}


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    print(auto_cli(main))
