"""Persistent XLA compilation cache.

Storm-scale fused-step programs take tens of seconds to compile through the
remote-compile TPU tunnel, and every process (bench stages, CLI runs,
sweeps) pays it again: JAX's in-memory cache dies with the process.  The
persistent cache serializes compiled executables to disk keyed by HLO +
compile options, so the second process loads in milliseconds (verified on
the axon backend).  Opt-out with SD_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

# Repo-local by default (and committed): the cache is keyed by HLO +
# compile options, NOT source text, so a fresh checkout gets warm compiles
# for every program whose traced form is unchanged — this is what lets a
# driver-day bench run skip the 100-300 s storm-scale compiles that
# starved stages in rounds 3-4.  ~/.cache would die with the environment.
_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".sd_compile_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache; returns the dir (or None)."""
    if os.environ.get("SD_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    path = cache_dir or os.environ.get("SD_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    # Only cache for the TPU path.  XLA:CPU AOT artifacts record a machine
    # feature set that the loader rejects even on the producing machine
    # ("could lead to execution errors such as SIGILL"), so CPU-forced
    # runs (tests, wall-compare legs) skip the persistent cache — their
    # compiles are cheap anyway.
    try:
        plats = jax.config.jax_platforms or "default"
    except Exception:
        plats = "default"
    # Skip only when CPU is the PRIMARY platform (tests, wall-compare CPU
    # legs).  The axon tunnel reports "axon,cpu" — the trailing fallback
    # entry must not disable caching for the TPU path (a substring test
    # here silently turned the cache off for every device run in rounds
    # 4-5 until caught: every process re-paid 100-300 s storm compiles).
    if plats.split(",")[0].strip() == "cpu":
        return None
    path = os.path.join(path, plats.replace(",", "_"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Only persist compiles that cost real time; trivia stays in memory.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
