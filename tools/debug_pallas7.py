"""Test whether 3D broadcast-multiply + axis reduction lowers in Mosaic."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, ".")
S, H, W, C, N, TN, r = 1, 16, 128, 128, 8, 8, 3
P, G = 2*r+1, 2*r+2
rng = np.random.RandomState(0)
fmap = jnp.asarray(rng.rand(S, H*W, C), jnp.float32)
targets = jnp.asarray(rng.rand(S, N, C), jnp.float32)
coords = jnp.asarray(rng.rand(S, N, 2) * [W-1, H-1], jnp.float32)
def run(kernel, pp=P*P):
    return pl.pallas_call(
        kernel, grid=(S, N // TN),
        in_specs=[
            pl.BlockSpec((1, TN, 2), lambda s, n: (s, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H*W, C), lambda s, n: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, C), lambda s, n: (s, n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, pp), lambda s, n: (s, n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, N, pp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TN, H*W), jnp.float32)],
    )(coords, fmap, targets)

def t(name, fn):
    try:
        out = fn(); out.block_until_ready(); print(f"OK   {name}"); return out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:110]}")

def k_rows(c_ref, f_ref, t_ref, o_ref, scr):
    scr[:] = jax.lax.dot_general(t_ref[0], f_ref[0],
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    c = c_ref[0]
    x0 = jnp.floor(c[:, 0:1]).astype(jnp.int32)
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)
    m3 = scr[:].reshape(TN, H, W)
    hh = jax.lax.broadcasted_iota(jnp.int32, (TN, H), 1)
    ww = jax.lax.broadcasted_iota(jnp.int32, (TN, W), 1)
    rows = []  # G row-vectors (TN, W), zero-padded OOB
    for a in range(G):
        yy = y0 - r + a
        oy = ((hh == yy) & (yy >= 0) & (yy <= H - 1)).astype(jnp.float32)
        rows.append(jnp.sum(m3 * oy[:, :, None], axis=1))  # (TN, W)
    out = []
    for b in range(G):
        xx = x0 - r + b
        ox = ((ww == xx) & (xx >= 0) & (xx <= W - 1)).astype(jnp.float32)
        for a in range(G):
            out.append(jnp.sum(rows[a] * ox, axis=1, keepdims=True))  # (TN,1)
    o_ref[0] = jnp.concatenate(out[:P*P], axis=1)
t("rowwise 3d-reduce", lambda: run(k_rows))
