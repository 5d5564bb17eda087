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
        out = fn(); out.block_until_ready(); print(f"OK   {name}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:100]}")

def k_j(c_ref, f_ref, t_ref, o_ref, scr):
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)            # (TN,1)
    a = jax.lax.broadcasted_iota(jnp.int32, (TN, G), 1)
    rows = y0 - r + a                                       # (TN,G)
    o_ref[0] = jnp.sum(rows.astype(jnp.float32)) * jnp.ones((TN, P*P))
t("j: rows", lambda: run(k_j))

def k_k(c_ref, f_ref, t_ref, o_ref, scr):
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (TN, G), 1)
    rows = (y0 - r + a).reshape(TN * G, 1)
    o_ref[0] = jnp.sum(rows.astype(jnp.float32)) * jnp.ones((TN, P*P))
t("k: rows reshape", lambda: run(k_k))

def k_l(c_ref, f_ref, t_ref, o_ref, scr):
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (TN, G), 1)
    rows = (y0 - r + a).reshape(TN * G, 1)
    hh = jax.lax.broadcasted_iota(jnp.int32, (TN * G, H), 1)
    oh = (rows == hh).astype(jnp.float32)
    o_ref[0] = jnp.sum(oh) * jnp.ones((TN, P*P))
t("l: rows==iota", lambda: run(k_l))

# m: avoid reshape: keep (TN, G) rows; compare to iota (TN, G*? ) -- use repeat
def k_m(c_ref, f_ref, t_ref, o_ref, scr):
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)
    a = jax.lax.broadcasted_iota(jnp.int32, (TN, G), 1)
    rows = y0 - r + a                      # (TN, G)
    # one-hot via matmul-free trick: for each h, mask = (rows == h) summed later
    acc = jnp.zeros((TN, G), jnp.float32)
    for h in range(H):
        acc = acc + (rows == h).astype(jnp.float32) * h
    o_ref[0] = jnp.sum(acc) * jnp.ones((TN, P*P))
t("m: unrolled compare", lambda: run(k_m))
