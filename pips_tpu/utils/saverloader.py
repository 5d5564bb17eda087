"""Checkpoint save/load with the reference's operational semantics
(reference ``saverloader.py:5-69``): ``model-%09d`` naming, keep-latest
pruning, auto-resume from max step, and substring-based ``ignore_load``
filtering for partial warm-starts.

Format: one msgpack file per step (flax.serialization) holding the full
pytree {params, opt_state, step}. Device arrays are pulled to host first.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from flax import serialization

_PATTERN = re.compile(r"model-(\d{9})\.msgpack$")


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"model-{step:09d}.msgpack")


def list_steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _PATTERN.match(name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def save(ckpt_dir: str, tree: Any, step: int, keep_latest: int = 1) -> str:
    """Serialize ``tree`` (any pytree: train state, params, ...) at ``step``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    host_tree = jax.tree.map(np.asarray, tree)
    path = _ckpt_path(ckpt_dir, step)
    data = serialization.to_bytes(host_tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)

    if keep_latest > 0:
        for old_step in list_steps(ckpt_dir)[:-keep_latest]:
            try:
                os.remove(_ckpt_path(ckpt_dir, old_step))
            except OSError:
                pass
    return path


def load_raw(ckpt_dir: str, step: Optional[int] = None) -> tuple[Any, int]:
    """Restore the max (or given) step WITHOUT a target structure.

    Returns (nested plain dict, step) via msgpack_restore — useful when the
    caller only wants a sub-tree (e.g. eval loading ``params`` out of a full
    TrainState checkpoint) and doesn't know/care which pytree shape the
    checkpoint was written with. Raises if no checkpoint exists.
    """
    steps = list_steps(ckpt_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    step = step if step is not None else steps[-1]
    with open(_ckpt_path(ckpt_dir, step), "rb") as f:
        return serialization.msgpack_restore(f.read()), step


def load(ckpt_dir: str, target: Any, step: Optional[int] = None,
         ignore_load: Optional[Sequence[str]] = None) -> tuple[Any, int]:
    """Restore into ``target``'s structure from the max (or given) step.

    ``ignore_load``: substrings; any leaf whose path contains one keeps the
    target's value (reference ``saverloader.py:47-56`` semantics).
    Returns (tree, step); (target, 0) if no checkpoint exists.
    """
    steps = list_steps(ckpt_dir)
    if not steps:
        print(f"-- note: no checkpoint found in {ckpt_dir}; starting fresh")
        return target, 0
    step = step if step is not None else steps[-1]
    with open(_ckpt_path(ckpt_dir, step), "rb") as f:
        restored = serialization.from_bytes(target, f.read())

    if ignore_load:
        if isinstance(ignore_load, str):
            ignore_load = [ignore_load]
        flat_r = jax.tree_util.tree_flatten_with_path(restored)[0]
        flat_t = {jax.tree_util.keystr(p): v
                  for p, v in jax.tree_util.tree_flatten_with_path(target)[0]}
        out = []
        for p, v in flat_r:
            key = jax.tree_util.keystr(p)
            if any(ig in key for ig in ignore_load):
                print(f"-- ignoring load of {key}")
                v = flat_t[key]
            out.append(v)
        treedef = jax.tree_util.tree_structure(target)
        restored = jax.tree_util.tree_unflatten(treedef, out)
    return restored, step
