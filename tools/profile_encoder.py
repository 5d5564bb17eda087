"""Encoder cost: fp32 vs bf16, chained timing. Run from repo root."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from pips_tpu.models import Pips

def chain_time(step_fn, carry0, reps=4):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(c0, n):
        def body(c, _):
            return step_fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jnp.sum(c)
    for n in (1, reps + 1):
        jax.block_until_ready(run(carry0, n))
    def best(n):
        b = float("inf")
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(run(carry0, n)); b = min(b, time.time() - t0)
        return b
    return max(best(reps + 1) - best(1), 1e-9) / reps

rng = np.random.RandomState(0)
rgbs = jnp.asarray(rng.rand(1, 8, 480, 1024, 3) * 255, jnp.float32)
m32 = Pips(S=8, stride=8)
m16 = Pips(S=8, stride=8, dtype=jnp.bfloat16)
params = m32.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 2)), rgbs[:, :, :64, :64], iters=1)

for name, m in (("fp32", m32), ("bf16", m16)):
    def step(r, m=m):
        fm = m.apply(params, r, method=Pips.encode)
        return r + jnp.mean(fm).astype(r.dtype) * 1e-12
    print(f"encode {name}: {chain_time(step, rgbs) * 1e3:.2f} ms")
