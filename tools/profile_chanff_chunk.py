"""Experiment: F-chunked channel-FF Pallas kernels vs the monolithic ones.

Hypothesis: the monolithic kernel serializes [matmul1 -> gelu(VPU) -> matmul2]
on a full (TR, F) tile, so the VPU gelu poly (~25 f32 ops/elem on TRxF) sits
on the critical path. Splitting F into static chunks gives Mosaic independent
chunk pipelines whose VPU work can overlap other chunks' MXU work.
Usage: python tools/profile_chanff_chunk.py [FC ...]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pips_tpu.kernels.mixer_pallas as mp

D, F = 512, 2048
DEPTH = 12
rng = np.random.RandomState(0)

WS = [
    (jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32),
     jnp.asarray(0.1 * rng.randn(D), jnp.float32),
     jnp.asarray(rng.randn(D, F) * 0.03, jnp.float32),
     jnp.asarray(0.1 * rng.randn(F), jnp.float32),
     jnp.asarray(rng.randn(F, D) * 0.03, jnp.float32),
     jnp.asarray(0.1 * rng.randn(D), jnp.float32))
    for _ in range(DEPTH)
]


def _fwd_kernel_chunked(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        y_ref, *, cdtype, fc):
    xf = x_ref[...].astype(jnp.float32)
    _, _, xa = mp._ln_f32(xf, g_ref[...], b_ref[...])
    xa_c = xa.astype(cdtype)
    o = jnp.zeros(y_ref.shape, jnp.float32)
    for i in range(F // fc):
        sl = slice(i * fc, (i + 1) * fc)
        a1 = jax.lax.dot_general(
            xa_c, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[:, sl]
        g1 = mp._gelu_f32(a1)
        o = o + jax.lax.dot_general(
            g1.astype(cdtype), w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y_ref[...] = (xf + o + b2_ref[...]).astype(y_ref.dtype)


def _bwd_kernel_chunked(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                        dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                        db2_ref, *, cdtype, fc):
    r = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)
    xn, rsig, xa = mp._ln_f32(xf, g_ref[...], b_ref[...])
    xa_c = xa.astype(cdtype)
    dy = dy_ref[...].astype(jnp.float32)
    dy_c = dy.astype(cdtype)

    @pl.when(r == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dxa = jnp.zeros(xa.shape, jnp.float32)
    for i in range(F // fc):
        sl = slice(i * fc, (i + 1) * fc)
        a1 = jax.lax.dot_general(
            xa_c, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[:, sl]
        g1 = mp._gelu_f32(a1)
        g1_c = g1.astype(cdtype)
        dg1 = jax.lax.dot_general(dy_c, w2_ref[sl, :],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        phi = jnp.exp(-0.5 * jnp.square(a1)) * mp._INV_SQRT2PI
        da1 = dg1 * (0.5 * (1.0 + mp._erf_f32(a1 / mp._SQRT2)) + a1 * phi)
        da1_c = da1.astype(cdtype)
        dxa = dxa + jax.lax.dot_general(
            da1_c, w1_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1_ref[:, sl] += jax.lax.dot_general(
            xa_c, da1_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[:, sl] += jnp.sum(da1, axis=0, keepdims=True)
        dw2_ref[sl, :] += jax.lax.dot_general(
            g1_c, dy_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dxn = dxa * g_ref[...]
    m1 = jnp.mean(dxn, axis=1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=1, keepdims=True)
    dxf = rsig * (dxn - m1 - xn * m2)
    dx_ref[...] = (dy + dxf).astype(dx_ref.dtype)
    dg_ref[...] += jnp.sum(dxa * xn, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dxa, axis=0, keepdims=True)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def make_chunked(fc):
    @functools.partial(jax.custom_vjp)
    def block(x, ln_scale, ln_bias, w1, b1, w2, b2):
        y, _ = fwd(x, ln_scale, ln_bias, w1, b1, w2, b2)
        return y

    def fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
        R, Dd, Ff, cdtype, (g, b, w1c, b1r, w2c, b2r) = mp._prep(
            x, ln_scale, ln_bias, w1, b1, w2, b2)
        Rp = mp._padded_rows(R)
        xp = mp._pad_rows(x, Rp)
        TR = mp._row_tile(Rp)
        const = lambda r: (0, 0)  # noqa: E731
        y = pl.pallas_call(
            functools.partial(_fwd_kernel_chunked, cdtype=cdtype, fc=fc),
            grid=(Rp // TR,),
            in_specs=[
                pl.BlockSpec((TR, Dd), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((Dd, Ff), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Ff), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((Ff, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, Dd), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rp, Dd), x.dtype),
        )(xp, g, b, w1c, b1r, w2c, b2r)
        if Rp != R:
            y = y[:R]
        return y, (x, ln_scale, ln_bias, w1, b1, w2, b2)

    def bwd(res, dy):
        x, ln_scale, ln_bias, w1, b1, w2, b2 = res
        R, Dd, Ff, cdtype, (g, b, w1c, b1r, w2c, _) = mp._prep(
            x, ln_scale, ln_bias, w1, b1, w2, b2)
        Rp = mp._padded_rows(R)
        xp = mp._pad_rows(x, Rp)
        TR = mp._row_tile(Rp)
        const = lambda r: (0, 0)  # noqa: E731
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_chunked, cdtype=cdtype, fc=fc),
            grid=(Rp // TR,),
            in_specs=[
                pl.BlockSpec((TR, Dd), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, Dd), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((Dd, Ff), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Ff), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((Ff, Dd), const, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TR, Dd), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((Dd, Ff), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Ff), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((Ff, Dd), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dd), const, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Rp, Dd), x.dtype),
                jax.ShapeDtypeStruct((1, Dd), jnp.float32),
                jax.ShapeDtypeStruct((1, Dd), jnp.float32),
                jax.ShapeDtypeStruct((Dd, Ff), jnp.float32),
                jax.ShapeDtypeStruct((1, Ff), jnp.float32),
                jax.ShapeDtypeStruct((Ff, Dd), jnp.float32),
                jax.ShapeDtypeStruct((1, Dd), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=24 * 2**20),
        )(xp, mp._pad_rows(dy.astype(x.dtype), Rp), g, b, w1c, b1r, w2c)
        dx, dg, db, dw1, db1, dw2, db2 = outs
        if Rp != R:
            dx = dx[:R]
        return (dx,
                dg.reshape(ln_scale.shape).astype(ln_scale.dtype),
                db.reshape(ln_bias.shape).astype(ln_bias.dtype),
                dw1.astype(w1.dtype),
                db1.reshape(b1.shape).astype(b1.dtype),
                dw2.astype(w2.dtype),
                db2.reshape(b2.shape).astype(b2.dtype))

    block.defvjp(fwd, bwd)
    return block


@functools.partial(jax.jit, static_argnames=("tag", "n", "bwd", "fc"))
def chain(ws, x, eps, tag, n, bwd, fc):
    fn = mp.chan_ff_block if tag == "base" else make_chunked(fc)

    def loss(ws, x):
        for w in ws:
            x = fn(x, *w)
        return jnp.sum(x.astype(jnp.float32))

    def one(carry):
        xi = x + (carry * 1e-9 + eps).astype(x.dtype)
        if not bwd:
            return loss(ws, xi)
        v, grads = jax.value_and_grad(loss)(ws, xi)
        acc = v
        for g in jax.tree_util.tree_leaves(grads):
            acc = acc + jnp.sum(g).astype(jnp.float32) * 1e-12
        return acc

    v, _ = jax.lax.scan(lambda c, _: (one(c), None), jnp.float32(0.0),
                        None, length=n)
    return v


def timeit(tag, R, bwd, fc=512, reps=16):
    x0 = jnp.asarray(rng.randn(R, D), jnp.bfloat16)
    args = (WS, x0)
    float(jax.device_get(chain(*args, jnp.float32(0.0), tag, 1, bwd, fc)))
    float(jax.device_get(chain(*args, jnp.float32(0.0), tag, reps + 1, bwd, fc)))

    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(
                chain(*args, jnp.float32(1e-6 * (k + 1)), tag, n, bwd, fc)))
            b = min(b, time.time() - t0)
        return b

    dt = (best(reps + 1) - best(1)) / reps
    nmm = 12 * (7 if bwd else 2)
    fl = nmm * 2 * R * D * F
    print(f"{tag:6s} fc={fc:4d} R={R} {'fwd+bwd' if bwd else 'fwd':7s}:"
          f" {dt * 1e6:7.0f} us ({fl / dt / 1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    fcs = [int(a) for a in sys.argv[1:]] or [512, 1024]
    for R in (1024,):
        for bwd in (False, True):
            timeit("base", R, bwd)
            for fc in fcs:
                try:
                    timeit("chunk", R, bwd, fc)
                except Exception as e:  # noqa: BLE001
                    print(f"chunk fc={fc} {'bwd' if bwd else 'fwd'}: FAIL "
                          f"{type(e).__name__} {str(e)[:140]}", flush=True)
