"""Per-iteration metrics stream.

Reference: the hand-rolled runTime phase timers (twoSD.h:87-99) written to
detailedResults.csv.  The fused device step cannot split phases by clock()
brackets, so this module records per-iteration records (k, estimates, gamma,
quadScalar, pool sizes, pi_ratio, stability) to JSONL and supports
jax.profiler trace capture around a window of steps for phase attribution.
"""

from __future__ import annotations

import json
import time
from typing import Optional


class MetricsRecorder:
    def __init__(self, path: Optional[str] = None, every: int = 1):
        self.path = path
        self.every = max(1, every)
        self._fh = open(path, "w") if path else None
        self._last_t = time.monotonic()

    def record(self, state) -> None:
        k = int(state.k)
        if k % self.every or self._fh is None:
            return
        now = time.monotonic()
        rec = {
            "k": k,
            "candid_est": float(state.candid_est),
            "incumb_est": float(state.incumb_est),
            "gamma": float(state.gamma),
            "quad_scalar": float(state.quad_scalar),
            "omega_cnt": int(state.omega_cnt),
            "lambda_cnt": int(state.lambda_cnt),
            "sigma_cnt": int(state.sigma_cnt),
            "cuts": int(sum(bool(m) for m in state.cut_mask)),
            "dual_stable": bool(state.dual_stable),
            "dt": now - self._last_t,
        }
        self._last_t = now
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


def estimate_phase_times(solver, state, eval_key, *, iterations: int,
                         lp_count: int, full_tests: int, tau: int,
                         samples: int = 5) -> dict:
    """Per-phase second estimates for the runTime columns (twoSD.h:87-99).

    The production SD iteration is ONE fused device program, so clock()
    brackets cannot split it; instead each jitted substep (core/step.py
    make_substeps) is dispatched separately on the FINAL state, its
    per-dispatch cost measured, and scaled by the phase's call count:
      * master   = t(master_step)    x iterations
      * subprob  = t(subprob_update) x LP count  (includes the per-solve
                   stochastic updates, which the reference books under
                   argmax — noted in the docs)
      * argmax   = t(cut_step)       x cut formations (candidate + TAU-cycle
                   incumbent cuts)
      * opttest  = t(full_test)      x full tests run
    Final-state pools are the largest of the run, so these are conservative
    (upper) estimates of the per-phase averages."""
    import jax

    def t_of(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)           # compile outside the clock
        t0 = time.monotonic()
        for _ in range(samples):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.monotonic() - t0) / samples

    sub = solver.substeps
    t_master = t_of(sub["master_step"], state)
    t_subprob = t_of(sub["subprob_update"], state)
    t_cut = t_of(sub["cut_step"], state)
    t_opt = t_of(solver.full_test, state, eval_key) if full_tests else 0.0

    n_cut_calls = iterations * (1.0 + 1.0 / max(tau, 1))
    return {
        "time_master": t_master * iterations,
        "time_subprob": t_subprob * lp_count,
        "time_argmax": t_cut * n_cut_calls,
        "time_opttest": t_opt * full_tests,
    }


def profile_steps(step_fn, state, n: int, trace_dir: str):
    """Capture a jax.profiler trace around n SD steps (SURVEY.md §5 plan)."""
    import jax

    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            state = step_fn(state)
        jax.block_until_ready(state)
    return state
