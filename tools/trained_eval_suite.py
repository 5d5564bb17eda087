"""Trained-weights eval sweep: run every benchmark runner against a real
checkpoint and contrast with random init (VERDICT r3 missing #1 — accuracy
evidence that exercises dataset -> chain -> metrics with trained weights).

Expects a FlyingThings-format tree (tools/make_synth_flt.py or real FLT++)
and a checkpoint dir produced by the train loop. BADJA/CroHD run through the
dress-rehearsal synthetic trees (exact on-disk formats).

    python tools/trained_eval_suite.py --ckpt_root /tmp/big_ckpts \
        --flt_root /tmp/flt_big --crop_h 184 --crop_w 248
"""

import json
import os
import sys

sys.path.insert(0, ".")


def latest_run(ckpt_root: str) -> str:
    runs = sorted(os.listdir(ckpt_root))
    assert runs, f"no runs under {ckpt_root}"
    return os.path.join(ckpt_root, runs[-1])


def main(ckpt_root: str = "/tmp/big_ckpts", flt_root: str = "/tmp/flt_big",
         crop_h: int = 184, crop_w: int = 248, N: int = 64, iters: int = 6,
         max_iters: int = 12, dtype: str = "float32",
         badja_root: str = "/tmp/badja_synth", crohd_root: str = "/tmp/crohd_synth",
         out_json: str = "/tmp/trained_eval_suite.json"):
    from pips_tpu.evals import run_flt
    from tools.eval_dress_rehearsal import main as rehearsal

    ckpt = latest_run(ckpt_root)
    print(f"== checkpoint: {ckpt}", flush=True)
    results = {"ckpt": ckpt}

    for tag, init in (("random", "random"), ("trained", ckpt)):
        print(f"== run_flt [{tag}]", flush=True)
        results[f"flt_{tag}"] = run_flt.main(
            init_dir=init, dataset_location=flt_root, N=N,
            crop_size=(crop_h, crop_w), max_iters=max_iters, iters=iters,
            dtype=dtype, log_dir=f"/tmp/tes_flt_{tag}",
            log_freq=max_iters)  # one media dump per run

    for bench, root in (("badja", badja_root), ("crohd", crohd_root)):
        for tag, init in (("random", "random"), ("trained", ckpt)):
            print(f"== {bench} dress rehearsal [{tag}]", flush=True)
            results[f"{bench}_{tag}"] = rehearsal(
                benchmark=bench, root=root, init_dir=init, iters=iters)

    print(json.dumps(results, indent=2, default=float))
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    auto_cli(main)
