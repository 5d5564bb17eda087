"""Chaining-regime benchmark on synthetic long clips with exact ground truth.

BADJA/CroHD accuracy comes from the CHAINING loop (T >> S with occlusion
gaps, reference ``test_on_badja.py:64-113``), but those benchmarks need real
data this environment cannot hold. This harness evaluates the full chain
(encode -> window refinement -> visibility-aware skip rule -> re-query)
on ``tools/make_synth_flt.make_long_clip`` videos — T ~ 40 frames, exact
trajectories, engineered 1-6 frame occlusion gaps — and reports the
reference FLT metric family (ate_all/vis/occ, ``test_on_flt.py:89-98``)
plus per-window-start telemetry (VERDICT r4 #5).

    python tools/chain_benchmark.py --ckpt /tmp/prod_ckpts/<run> \
        --compare_random true --dtype bfloat16
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def eval_weights(params, model, clips, iters=6, capacity=768, mesh=None):
    from pips_tpu.evals.metrics import ate_metrics, per_seq_vis_label
    from pips_tpu.inference.chain import ChainTracker

    tracker = ChainTracker(model, params, iters=iters, capacity=capacity,
                           record_starts=True, mesh=mesh)
    pools = {k: [] for k in ("ate_all", "ate_vis", "ate_occ")}
    n_windows, skips = [], []
    for rgbs, trajs_g, vis_g in clips:
        trajs_e, _ = tracker.track_video(rgbs, trajs_g[0])
        m = ate_metrics(trajs_e[None], trajs_g[None],
                        valids=np.ones_like(vis_g)[None], vis_g=vis_g[None])
        for k in pools:
            pools[k].append(m[k])
        starts = tracker.last_window_starts
        n_windows += [len(s) for s in starts]
        skips += [b - a for s in starts for a, b in zip(s, s[1:])]
    out = {k: float(np.mean(v)) for k, v in pools.items()}
    out["windows_per_point"] = float(np.mean(n_windows))
    out["skip_hist"] = {str(k): int((np.asarray(skips) == k).sum())
                        for k in sorted(set(skips))}
    return out


def main(ckpt: str = "", compare_random: bool = True, n_clips: int = 3,
         T: int = 40, H: int = 368, W: int = 496, N: int = 256,
         iters: int = 6, dtype: str = "bfloat16", seed: int = 0,
         mesh: str = "", out_json: str = "/tmp/chain_benchmark.json"):
    import jax.numpy as jnp
    from pips_tpu.evals.common import make_pips, load_params
    from pips_tpu.parallel.mesh import parse_mesh_arg
    from pips_tpu.utils.compcache import maybe_enable_compilation_cache
    from tools.make_synth_flt import make_long_clip

    maybe_enable_compilation_cache()
    clips = [make_long_clip(T=T, H=H, W=W, N=N, seed=seed + 17 * i)
             for i in range(n_clips)]
    frac_gap = float(np.mean([(v == 0).any(0).mean() for _, _, v in clips]))
    print(f"{n_clips} clips, T={T}, N={N}; {frac_gap:.0%} of points have "
          f"occlusion gaps", flush=True)

    model = make_pips(S=8, stride=8, dtype=dtype)
    mesh_obj = parse_mesh_arg(mesh)
    results = {"config": dict(n_clips=n_clips, T=T, H=H, W=W, N=N,
                              iters=iters, dtype=dtype, frac_gap=frac_gap)}
    runs = [("trained", ckpt)] if ckpt else []
    if compare_random or not ckpt:
        runs.append(("random", "random"))
    for tag, init in runs:
        params = load_params(model, init)
        results[tag] = eval_weights(params, model, clips, iters=iters,
                                    capacity=min(N, 768), mesh=mesh_obj)
        print(tag, json.dumps(results[tag]), flush=True)
    if "trained" in results and "random" in results:
        results["ate_all_gap"] = (results["random"]["ate_all"]
                                  - results["trained"]["ate_all"])
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "config"}))
    return results


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    auto_cli(main)
