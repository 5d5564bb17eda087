import sys, functools
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

def run(kernel, out_shape):
    return pl.pallas_call(
        kernel, grid=(S, N // TN),
        in_specs=[
            pl.BlockSpec((1, TN, 2), lambda s, n: (s, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H*W, C), lambda s, n: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, C), lambda s, n: (s, n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, out_shape[-1]), lambda s, n: (s, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, N, out_shape[-1]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TN, H*W), jnp.float32)],
    )(coords, fmap, targets)

def t(name, fn):
    try:
        out = fn(); out.block_until_ready()
        print(f"OK   {name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:120]}")

# (a) matmul into scratch, write row sums
def k_a(c_ref, f_ref, t_ref, o_ref, scr):
    scr[:] = jax.lax.dot_general(t_ref[0], f_ref[0],
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    o_ref[0] = jnp.sum(scr[:], axis=1, keepdims=True) * jnp.ones((TN, P*P))
t("a: matmul+reduce", lambda: run(k_a, (S, N, P*P)))

# (b) + reshape scratch to (TN, H, W) and reduce
def k_b(c_ref, f_ref, t_ref, o_ref, scr):
    scr[:] = jax.lax.dot_general(t_ref[0], f_ref[0],
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    m = scr[:].reshape(TN, H, W)
    o_ref[0] = jnp.sum(m, axis=(1,)).sum(axis=1, keepdims=True) * jnp.ones((TN, P*P))
t("b: + reshape3d", lambda: run(k_b, (S, N, P*P)))

# (c) + iota one-hots
def k_c(c_ref, f_ref, t_ref, o_ref, scr):
    scr[:] = jax.lax.dot_general(t_ref[0], f_ref[0],
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    c = c_ref[0]
    x0 = jnp.floor(c[:, 0]).astype(jnp.int32)
    y0 = jnp.floor(c[:, 1]).astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (TN, G), 1)
    rows = y0[:, None] - r + a
    hh = jax.lax.broadcasted_iota(jnp.int32, (G, H), 1)
    oy = (rows[:, :, None] == hh[None]).astype(jnp.float32)
    o_ref[0] = jnp.sum(oy, axis=(1, 2))[:, None] * jnp.ones((TN, P*P))
t("c: + iota onehot", lambda: run(k_c, (S, N, P*P)))

# (d) + batched dot_general (TN,G,H)x(TN,H,W)
def k_d(c_ref, f_ref, t_ref, o_ref, scr):
    scr[:] = jax.lax.dot_general(t_ref[0], f_ref[0],
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1]).astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (TN, G), 1)
    rows = y0[:, None] - r + a
    hh = jax.lax.broadcasted_iota(jnp.int32, (G, H), 1)
    oy = (rows[:, :, None] == hh[None]).astype(jnp.float32)
    m = scr[:].reshape(TN, H, W)
    sel = jax.lax.dot_general(oy, m,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[0] = jnp.sum(sel, axis=(1, 2))[:, None] * jnp.ones((TN, P*P))
t("d: + batched dot", lambda: run(k_d, (S, N, P*P)))
