"""Opt-in persistent XLA compilation cache.

The reference pays no compile cost (eager PyTorch); here every fresh
process recompiles the full model — 1.5-4 min per variant on the tunneled
dev TPU, tens of seconds on CPU. JAX's persistent compilation cache
serializes compiled executables to disk keyed by (HLO, compile options,
backend version), so a second process skips straight to execution.

Enabled by setting ``PIPS_JAX_CACHE`` to a directory (or ``1`` for the
default ``<repo>/.jax_cache``). ``bench.py`` defaults it ON (via
``os.environ.setdefault``) because the driver re-runs it in a fresh process
every round; the train loop and eval runners remain opt-in — the cache
trades disk for compile time and is a workflow optimization, not a
correctness feature. Entry points call ``maybe_enable_compilation_cache()``
once, before the first jit.

The default dir lives INSIDE the repo (and its blobs are committed) because
the driver environment is a fresh filesystem every round — only git content
survives — so a /tmp cache can never amortize the ~5 min bench compile
across rounds (r3 lesson: cache was enabled yet BENCH_r03 still paid full
compile).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")
_enabled = False


def maybe_enable_compilation_cache() -> str | None:
    """Enable jax's persistent compilation cache if PIPS_JAX_CACHE is set.

    Returns the cache dir when enabled, else None. Safe to call multiple
    times and before/after other jax config updates; never raises (an
    unsupported backend just leaves the cache unused).
    """
    global _enabled
    val = os.environ.get("PIPS_JAX_CACHE", "")
    if not val:
        return None
    cache_dir = _DEFAULT_DIR if val == "1" else val
    if _enabled:
        return cache_dir
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every entry regardless of compile time / size (-1 sentinels)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_raise_persistent_cache_errors", False)
        # jax's default enables the GPU per-fusion autotune cache, whose
        # ABSOLUTE PATH (under cache_dir) is serialized into debug_options
        # and thus into every cache KEY — entries become unreadable from any
        # other cache location or checkout path (r5 lesson: one byte of
        # '/tmp/x' vs '.jax_cache' missed 100% of the committed bench
        # cache). GPU-only feature; disable for path-independent keys.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "")
        _enabled = True
        return cache_dir
    except Exception as e:  # pragma: no cover - config names are stable
        print(f"warning: could not enable compilation cache: {e}")
        return None
