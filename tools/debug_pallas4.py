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

def k_e(c_ref, f_ref, t_ref, o_ref, scr):  # read coords, float math only
    c = c_ref[0]
    s = jnp.sum(c[:, 1:2] - jnp.floor(c[:, 1:2]))
    o_ref[0] = s * jnp.ones((TN, P*P))
t("e: coords float", lambda: run(k_e))

def k_f(c_ref, f_ref, t_ref, o_ref, scr):  # int cast
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)  # (TN,1)
    o_ref[0] = jnp.sum(y0.astype(jnp.float32)) * jnp.ones((TN, P*P))
t("f: + int cast", lambda: run(k_f))

def k_g(c_ref, f_ref, t_ref, o_ref, scr):  # iota 2D alone
    ii = jax.lax.broadcasted_iota(jnp.int32, (TN, H), 1)
    o_ref[0] = jnp.sum(ii.astype(jnp.float32)) * jnp.ones((TN, P*P))
t("g: iota2d", lambda: run(k_g))

def k_h(c_ref, f_ref, t_ref, o_ref, scr):  # int compare iota vs iota
    ii = jax.lax.broadcasted_iota(jnp.int32, (TN, H), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (TN, H), 0)
    oh = (ii == jj).astype(jnp.float32)
    o_ref[0] = jnp.sum(oh) * jnp.ones((TN, P*P))
t("h: iota==iota", lambda: run(k_h))

def k_i(c_ref, f_ref, t_ref, o_ref, scr):  # broadcast int vec vs iota
    c = c_ref[0]
    y0 = jnp.floor(c[:, 1:2]).astype(jnp.int32)  # (TN,1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (TN, H), 1)
    oh = (ii == y0).astype(jnp.float32)  # broadcast compare (TN,H) vs (TN,1)
    o_ref[0] = jnp.sum(oh) * jnp.ones((TN, P*P))
t("i: vec==iota", lambda: run(k_i))
