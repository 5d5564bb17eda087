"""DINO ViT converter correctness vs a numpy transformer oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pips_tpu.models.dino import ViT
from pips_tpu.torchport.convert import convert_dino_vit_state_dict


def make_dino_sd(rng, dim=32, heads=4, depth=2, patch=8, grid=4):
    sd = {
        "patch_embed.proj.weight": rng.randn(dim, 3, patch, patch).astype(np.float32) * 0.05,
        "patch_embed.proj.bias": rng.randn(dim).astype(np.float32) * 0.05,
        "cls_token": rng.randn(1, 1, dim).astype(np.float32) * 0.05,
        "pos_embed": rng.randn(1, 1 + grid * grid, dim).astype(np.float32) * 0.05,
        "norm.weight": rng.rand(dim).astype(np.float32) + 0.5,
        "norm.bias": rng.randn(dim).astype(np.float32) * 0.05,
    }
    for d in range(depth):
        p = f"blocks.{d}"
        sd[f"{p}.norm1.weight"] = rng.rand(dim).astype(np.float32) + 0.5
        sd[f"{p}.norm1.bias"] = rng.randn(dim).astype(np.float32) * 0.05
        sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32) * 0.05
        sd[f"{p}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32) * 0.05
        sd[f"{p}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32) * 0.05
        sd[f"{p}.attn.proj.bias"] = rng.randn(dim).astype(np.float32) * 0.05
        sd[f"{p}.norm2.weight"] = rng.rand(dim).astype(np.float32) + 0.5
        sd[f"{p}.norm2.bias"] = rng.randn(dim).astype(np.float32) * 0.05
        sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32) * 0.05
        sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * dim).astype(np.float32) * 0.05
        sd[f"{p}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32) * 0.05
        sd[f"{p}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32) * 0.05
    return sd


def numpy_vit_forward(sd, x, dim, heads, depth, patch):
    """Oracle: timm/DINO ViT semantics in plain numpy. x: (B, H, W, 3)."""
    from scipy.special import erf

    def ln(v, w, b):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-6) * w + b

    def gelu(v):
        return 0.5 * v * (1 + erf(v / np.sqrt(2.0)))

    B, H, W, _ = x.shape
    h, w = H // patch, W // patch
    # patch embed: conv stride=patch == per-patch linear
    kernel = sd["patch_embed.proj.weight"]  # (dim, 3, p, p)
    tokens = np.zeros((B, h * w, dim), np.float32)
    for i in range(h):
        for j in range(w):
            patch_px = x[:, i * patch:(i + 1) * patch, j * patch:(j + 1) * patch]
            # torch conv: sum over (c, ky, kx)
            v = np.einsum("byxc,dcyx->bd", patch_px, kernel) + sd["patch_embed.proj.bias"]
            tokens[:, i * w + j] = v
    cls = np.broadcast_to(sd["cls_token"], (B, 1, dim))
    t = np.concatenate([cls, tokens], 1) + sd["pos_embed"]

    hd = dim // heads
    for d in range(depth):
        p = f"blocks.{d}"
        y = ln(t, sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
        qkv = y @ sd[f"{p}.attn.qkv.weight"].T + sd[f"{p}.attn.qkv.bias"]
        q, k, v = np.split(qkv, 3, axis=-1)
        out = np.zeros_like(q)
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            att = q[..., sl] @ k[..., sl].transpose(0, 2, 1) / np.sqrt(hd)
            att = np.exp(att - att.max(-1, keepdims=True))
            att /= att.sum(-1, keepdims=True)
            out[..., sl] = att @ v[..., sl]
        t = t + out @ sd[f"{p}.attn.proj.weight"].T + sd[f"{p}.attn.proj.bias"]
        y = ln(t, sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])
        y = gelu(y @ sd[f"{p}.mlp.fc1.weight"].T + sd[f"{p}.mlp.fc1.bias"])
        t = t + y @ sd[f"{p}.mlp.fc2.weight"].T + sd[f"{p}.mlp.fc2.bias"]
    t = ln(t, sd["norm.weight"], sd["norm.bias"])
    return t[:, 1:]


def test_vit_converter_matches_numpy_oracle(rng):
    dim, heads, depth, patch, grid = 32, 4, 2, 8, 4
    sd = make_dino_sd(rng, dim, heads, depth, patch, grid)
    variables = convert_dino_vit_state_dict(sd, dim=dim, heads=heads, depth=depth)

    B, H, W = 2, grid * patch, grid * patch
    x = rng.randn(B, H, W, 3).astype(np.float32)
    model = ViT(patch_size=patch, dim=dim, depth=depth, heads=heads)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    want = numpy_vit_forward(sd, x, dim, heads, depth, patch)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_pos_embed_interpolation(rng):
    sd = make_dino_sd(rng, grid=4)
    variables = convert_dino_vit_state_dict(sd, grid_hw=(6, 8), dim=32, heads=4, depth=2)
    assert variables["params"]["pos_embed"].shape == (1, 1 + 48, 32)
