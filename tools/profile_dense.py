"""Dense-grid single-call tracking (full DAVIS grid, one device call) vs the
reference's 256-point chunks. Run from repo root."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from pips_tpu.models import Pips

def chain_time(step_fn, carry0, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(c0, eps, n):
        def body(c, _):
            return step_fn(c + eps * 1e-6), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jnp.sum(c.astype(jnp.float32))
    def sync(eps, n):
        return float(jax.device_get(run(carry0, jnp.float32(eps), n)))
    for n in (1, reps + 1):
        sync(0.0, n)
    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time(); sync(k + 1.0, n); b = min(b, time.time() - t0)
        return b
    return max(best(reps + 1) - best(1), 1e-9) / reps

rng = np.random.RandomState(0)
Hi, Wi = 480, 1024
N = (Hi // 8) * (Wi // 8)  # 7680: every 8th pixel, the full davis probe grid
rgbs = jnp.asarray(rng.rand(1, 8, Hi, Wi, 3) * 255, jnp.float32)
xys0 = jnp.asarray(rng.rand(1, N, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
lims = jnp.asarray([Wi - 8.0, Hi - 8.0])

for name, dtype, mode, fuse in (("fp32 onehot", None, "onehot", False),
                                ("bf16 onehot", jnp.bfloat16, "onehot", False),
                                ("bf16 onehot+fusedmixer", jnp.bfloat16,
                                 "onehot", True),
                                ("bf16 fused", jnp.bfloat16, "fused", False)):
    model = Pips(S=8, stride=8, dtype=dtype, fuse_chanff=fuse)
    # every variant inits its own params (all variants share the tree today,
    # but reusing one init would silently go stale if a variant diverges)
    params = model.init(jax.random.PRNGKey(0), xys0[:, :8],
                        rgbs[:, :, :64, :64], iters=1)
    fmaps = jax.jit(lambda p, r: model.apply(p, r, method=Pips.encode))(params, rgbs)
    def step(xys, m=model, mo=mode):
        out = m.apply(params, fmaps, xys, iters=6, is_train=False, corr_mode=mo,
                      method=Pips.track)
        return jnp.clip(out.coord_predictions[-1][:, -1] * 0.99 + 1.0, 8.0, lims)
    try:
        t = chain_time(step, xys0)
        print(f"dense N={N} {name}: {t*1e3:.1f} ms ({N*8/t:.0f} pf/s track-only)")
    except Exception as e:
        print(f"dense N={N} {name}: FAILED {type(e).__name__} {str(e)[:150]}")
