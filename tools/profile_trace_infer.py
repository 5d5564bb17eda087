"""Trace the bf16 inference window (fuse_chanff on/off) and print top HLO ops
by self time. Usage: python tools/profile_trace_infer.py [fuse] [trace_dir]"""
import glob
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.models import Pips

fuse = len(sys.argv) > 1 and sys.argv[1] in ("1", "true", "fuse")
trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/infertrace{int(fuse)}"

S, Ni, Hi, Wi = 8, 256, 480, 1024
r = np.random.RandomState(0)
rgbs = jnp.asarray(r.rand(1, S, Hi, Wi, 3) * 255, jnp.float32)
xys = jnp.asarray(r.rand(1, Ni, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)

model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=fuse)
params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 2)),
                    jnp.zeros((1, S, 64, 64, 3)), iters=1)

fwd = jax.jit(lambda p, x, rg: model.apply(
    p, x, rg, iters=6, is_train=False, corr_mode="onehot")
    .coord_predictions[-1])

out = fwd(params, xys, rgbs)
print("warm", float(jax.device_get(jnp.sum(out))), flush=True)

jax.profiler.start_trace(trace_dir)
for k in range(3):
    out = fwd(params, xys + np.float32(k) * 1e-3, rgbs)
float(jax.device_get(jnp.sum(out)))
jax.profiler.stop_trace()

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", len(pbs), flush=True)
if pbs:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rd
    data, _ = rd.xspace_to_tool_data(pbs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    with open(f"{trace_dir}/hlo_stats.json", "w") as f:
        f.write(data)
    rows = json.loads(data)
    # gviz table: {cols: [...], rows: [{c: [{v: ...}...]}]}
    cols = [c.get("label") or c.get("id") for c in rows["cols"]]
    i_self = next(i for i, c in enumerate(cols) if "self" in c.lower()
                  and "time" in c.lower() and "%" not in c.lower())
    i_name = next(i for i, c in enumerate(cols) if "hlo op name" in c.lower()
                  or c.lower() == "hlo op")
    i_cat = next((i for i, c in enumerate(cols) if "category" in c.lower()), None)
    table = []
    for row in rows["rows"]:
        c = row["c"]
        table.append((float(c[i_self]["v"] or 0), str(c[i_name]["v"]),
                      str(c[i_cat]["v"]) if i_cat is not None else ""))
    table.sort(reverse=True)
    tot = sum(t for t, _, _ in table)
    print(f"total self time: {tot:.0f} us over 3 reps")
    for t, name, cat in table[:25]:
        print(f"{t / 3:10.1f} us  {cat:24s} {name[:90]}")
