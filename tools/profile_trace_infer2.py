"""Trace the bf16 inference window as ONE on-device scan chain (no host
transfers inside the traced region), fuse_chanff on/off.
Usage: python tools/profile_trace_infer2.py [fuse] [trace_dir]"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.models import Pips

fuse = len(sys.argv) > 1 and sys.argv[1] in ("1", "true", "fuse")
trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/itrace{int(fuse)}"

S, Ni, Hi, Wi = 8, 256, 480, 1024
r = np.random.RandomState(0)
rgbs = jnp.asarray(r.rand(1, S, Hi, Wi, 3) * 255, jnp.float32)
xys0 = jnp.asarray(r.rand(1, Ni, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
lims = jnp.asarray([Wi - 8.0, Hi - 8.0])

model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=fuse)
params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 2)),
                    jnp.zeros((1, S, 64, 64, 3)), iters=1)


@functools.partial(jax.jit, static_argnames=("n",))
def chain(p, xys, eps, n):
    def body(x, _):
        rr = rgbs + x[0, 0, 0] * 1e-12 + eps
        out = model.apply(p, x, rr, iters=6, is_train=False, corr_mode="onehot")
        nxt = jnp.clip(out.coord_predictions[-1][:, -1] * 0.99 + 1.0, 8.0, lims)
        return nxt, jnp.mean(out.vis_e)
    xys_f, vs = jax.lax.scan(body, xys, None, length=n)
    return jnp.sum(xys_f) + jnp.sum(vs)


print("warm", float(jax.device_get(chain(params, xys0, jnp.float32(0.0), n=3))),
      flush=True)
jax.profiler.start_trace(trace_dir)
v = float(jax.device_get(chain(params, xys0, jnp.float32(1e-6), n=3)))
jax.profiler.stop_trace()
print("traced", v, flush=True)
