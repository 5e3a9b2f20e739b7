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


def profile_steps(step_fn, state, n: int, trace_dir: str):
    """Capture a jax.profiler trace around n SD steps (SURVEY.md §5 plan)."""
    import jax

    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            state = step_fn(state)
        jax.block_until_ready(state)
    return state
