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


@pytest.mark.slow
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


@pytest.mark.slow
def test_ray_only_pool_skips_cut_then_recovers():
    # When the FIRST subproblem solve is infeasible, the dual-vertex pool
    # holds only extreme-ray entries; SDCut must not form an optimality cut
    # from them (the istar < 0 guard, cuts.c:136-139).  After feasibility is
    # restored, the cut for that iteration IS formed (cuts.c:40-56).
    import jax

    from stochasticdecomposition_tpu.core.feasibility import (
        resolve_infeasibility,
    )
    from stochasticdecomposition_tpu.core.state import init_state

    solver, _, _ = _solver("feastest", MAX_ITER=50, EVAL_FLAG=False)
    cfg = solver.cfg
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(cfg.RUN_SEED[0] % (2 ** 31)))
    # Drive steps until the first infeasible subproblem appears (the mean-
    # value solution is infeasible under the d=6 observation).
    for _ in range(20):
        state = solver.step(state)
        if not bool(state.sp_feas):
            break
    assert not bool(state.sp_feas), "expected an infeasible subproblem"
    if int(state.k) == 1:
        # Ray-only pool on the very first iteration: the cut was skipped.
        assert not bool(state.cut_ok)
        assert int(np.asarray(state.cut_mask).sum()) == 0, \
            "no optimality cut may be formed from a ray-only pool"
    n_cuts_before = int(np.asarray(state.cut_mask).sum())
    state, pa_, pb_ = resolve_infeasibility(
        solver.pa, state, cfg, solver.substeps, [], [])
    assert bool(state.sp_feas)
    # Feasibility restored: the interrupted iteration's cut was formed.
    assert bool(state.cut_ok)
    assert int(np.asarray(state.cut_mask).sum()) > n_cuts_before


def test_evaluate_raises_on_material_infeasible_fraction():
    # feastest's mean-value solution is infeasible for the d=6 scenario
    # (30% of draws): evaluation must surface that instead of silently
    # biasing the mean (evaluate.c:70-76 errors on infeasible subproblems).
    solver, _, _ = _solver("feastest", MAX_ITER=50, EVAL_FLAG=False)
    with pytest.raises(RuntimeError, match="dropped"):
        solver.evaluate_x(solver.mean_sol)


@pytest.mark.slow
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
