"""LP master mode (MASTER_TYPE=0): the x-space Benders variant.

Reference: master.c:41 passes config.MASTER_TYPE to the solver;
setup.c:105-119 skips all incumbent/proximal machinery for non-QP masters;
inout.c:27-30 reports candidX.  The reference's LP branch is incomplete
(optimal.c:104-108 aborts the bootstrap test), so under MASTER_TYPE=0 the
run stops on MAX_ITER only — handled explicitly in runner.py.
"""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import MASTER_LP, SDConfig
from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def _setup(name, **cfg_kw):
    core, tim, stoc = load_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    return SDSolver(sp, SDConfig(MASTER_TYPE=MASTER_LP, **cfg_kw)), ef_obj


@pytest.mark.slow
def test_lands_converges_under_lp_master():
    solver, ef_obj = _setup("lands", MAX_ITER=150, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    # MAX_ITER stop: the statistical test is unavailable for LP masters.
    assert r.iterations == 150
    assert not r.optimal
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.02, f"LP-master solution off by {excess:.4f}"


@pytest.mark.slow
def test_pgp2like_converges_under_lp_master():
    solver, ef_obj = _setup("pgp2like", MAX_ITER=200, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    assert r.iterations == 200
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.02


def test_lp_master_state_has_no_incumbent_slot():
    import jax

    solver, _ = _setup("lands", MAX_ITER=10, EVAL_FLAG=False)
    from stochasticdecomposition_tpu.core.state import init_state

    state = init_state(solver.pa, solver.caps, solver.cfg, solver.mean_sol,
                       jax.random.PRNGKey(0))
    assert int(state.i_cut_idx) == -1   # setup.c:113-119
    state = solver.step(state)
    # Candidate doubles as the reported solution.
    np.testing.assert_array_equal(np.asarray(state.incumb_x),
                                  np.asarray(state.candid_x))
