"""Capture a jax.profiler trace of the bf16 train step and print the top
HLO ops by self time (tensorboard_plugin_profile xplane parsing)."""
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

B, S, N, I = 1, 8, 128, 6
H, W = 384, 512

model = Pips(S=S, stride=8, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)
tx = make_optimizer(5e-4, 100000)
state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = next(batch_iterator(ds, batch_size=B, num_workers=4))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

step = jax.jit(make_train_step(model, tx, iters=I, horz_flip=False,
                               vert_flip=False))

# warm/compile
st, m = step(state, batch)
print("warm loss", float(jax.device_get(m["total_loss"])), flush=True)

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/traintrace"
jax.profiler.start_trace(trace_dir)
for _ in range(3):
    st, m = step(st, batch)
float(jax.device_get(m["total_loss"]))
jax.profiler.stop_trace()
print("trace captured", flush=True)

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", pbs, flush=True)
if pbs:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rd
    data, _ = rd.xspace_to_tool_data(pbs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    out = f"{trace_dir}/hlo_stats.json"
    with open(out, "w") as f:
        f.write(data)
    print("wrote", out, len(data))
