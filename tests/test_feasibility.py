"""Feasibility-cut machinery and compromise-problem tests (M4/M7)."""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def _solver(name, **cfg_kw):
    core, tim, stoc = load_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, ef_x = solve_extensive_form(sp, outs, probs)
    return SDSolver(sp, SDConfig(**cfg_kw)), ef_obj, ef_x


def test_feasibility_cuts_resolve_and_converge():
    # feastest's mean-value solution (x1+x2 around 4) makes the subproblem
    # infeasible under the d=6 observation -> feasibility mode must trigger
    # and the run must still converge to the extensive-form optimum.
    solver, ef_obj, ef_x = _solver("feastest", MAX_ITER=300, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    assert r.feas_rounds > 0, "expected feasibility mode to trigger"
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.01
    # The induced constraint x1 + x2 >= 6 must (approximately) hold.
    assert r.incumb_x.sum() >= 6.0 - 1e-6


def test_compromise_solution():
    solver, ef_obj, ef_x = _solver(
        "lands", MAX_ITER=120, EVAL_FLAG=False,
        MULTIPLE_REP=3, COMPROMISE_PROB=True)
    result = solver.run()
    assert result.compromise_x is not None
    assert result.average_x is not None
    # All replications agreed on a tied decision; evaluate both aggregates.
    ev_c = solver.evaluate_x(result.compromise_x)
    ev_a = solver.evaluate_x(result.average_x)
    for ev in (ev_c, ev_a):
        excess = (ev.mean - ef_obj) / abs(ef_obj)
        assert -0.01 < excess < 0.02
    # Compromise decision should be a first-stage-feasible point.
    pa = solver.pa
    lhs = np.asarray(pa.A1) @ result.compromise_x
    sense = np.asarray(pa.sense1)
    b = np.asarray(pa.b1)
    for i in range(len(b)):
        if sense[i] == 1:
            assert lhs[i] >= b[i] - 1e-6
        elif sense[i] == -1:
            assert lhs[i] <= b[i] + 1e-6
        else:
            assert abs(lhs[i] - b[i]) < 1e-6
