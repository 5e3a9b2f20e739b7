"""CI sanity checks beyond the pytest tier (SURVEY.md §5 sanitizer-analog).

Runs on the CPU backend (hermetic — no device required):

  1. NaN-debug smoke: a short lands SD run under jax_debug_nans — any NaN
     produced inside the fused step/master/evaluator raises immediately
     instead of silently corrupting estimates (the JAX analog of a
     sanitizer job).
  2. Rerun determinism: the same seed must reproduce the incumbent
     BIT-FOR-BIT across two fresh solver instances (fixed-seed discipline,
     reference config.sd:22-52; threaded PRNG keys make this exact).

Usage: python scripts/ci_checks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def build_solver():
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    return SDSolver(sp, SDConfig(MAX_ITER=40, EVAL_FLAG=False))


def nan_debug_smoke():
    jax.config.update("jax_debug_nans", True)
    try:
        r = build_solver().solve_replication(0)
        assert np.isfinite(r.incumb_est), "non-finite incumbent estimate"
        assert np.all(np.isfinite(r.incumb_x)), "non-finite incumbent"
    finally:
        jax.config.update("jax_debug_nans", False)
    print(f"[ci] nan-debug smoke OK (k={r.iterations}, "
          f"est={r.incumb_est:.6f})")


def determinism_check():
    r1 = build_solver().solve_replication(0)
    r2 = build_solver().solve_replication(0)
    assert r1.iterations == r2.iterations, \
        f"iteration drift: {r1.iterations} vs {r2.iterations}"
    if not np.array_equal(r1.incumb_x, r2.incumb_x):
        raise AssertionError(
            f"incumbent not bit-identical across reruns:\n{r1.incumb_x}\n"
            f"{r2.incumb_x}")
    if r1.incumb_est != r2.incumb_est:
        raise AssertionError(
            f"estimate not bit-identical: {r1.incumb_est!r} vs "
            f"{r2.incumb_est!r}")
    print(f"[ci] rerun determinism OK (incumbent bit-identical, "
          f"k={r1.iterations})")


def main():
    nan_debug_smoke()
    determinism_check()
    print("[ci] all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
