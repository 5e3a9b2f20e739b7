"""Random-cost (v2.0) path tests: basis machinery + argmax with multipliers.

Reference: randCost.c, stocUpdate.c basis branches; validated with the
STOCH_CHECK oracle and extensive-form parity on synthetic instances with
random cost coefficients (the baa99-style configuration in BASELINE.md).
"""

import jax
import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.randcost import height_table_randcost
from stochasticdecomposition_tpu.core.state import init_state
from stochasticdecomposition_tpu.core.update import solve_subproblem
from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def _setup(seed, **kw):
    core, tim, stoc = parse_synthetic(seed=seed, **kw)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    return sp, ef_obj


@pytest.mark.slow
def test_randcost_stoch_check_oracle():
    sp, _ = _setup(21, n_rv=1, support=2, rand_d=2, n2=6, m2=4)
    assert sp.rv.nd == 2
    cfg = SDConfig(MAX_ITER=100, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(5))
    for _ in range(50):
        state = solver.step(state)
    assert int(state.basis_cnt) >= 1

    x = state.candid_x
    H, bo_valid, _ = height_table_randcost(solver.pa, state, x)
    Hm = np.where(np.array(bo_valid), np.array(H), -1e300)
    hstar = Hm.max(axis=0)
    exact = 0
    ocnt = int(state.omega_cnt)
    for o in range(ocnt):
        res = solve_subproblem(solver.pa, x, state.omega_vals[o])
        true_h = float(res.obj)
        assert hstar[o] <= true_h + 1e-6
        if abs(hstar[o] - true_h) < 1e-7:
            exact += 1
    assert exact >= 0.8 * ocnt


@pytest.mark.slow
def test_fused_triple_argmax_matches_materialized():
    # The production blockwise reduction (triple_argmax_randcost) must match
    # the materialized [B, nd, O] reference implementation for all three
    # dual-stability masks.
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.core.randcost import (
        triple_argmax_randcost,
    )

    sp, _ = _setup(21, n_rv=1, support=2, rand_d=2, n2=6, m2=4)
    cfg = SDConfig(MAX_ITER=100, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(5))
    for _ in range(40):
        state = solver.step(state)
    x = state.candid_x
    k = state.k
    ns_eff = k - jnp.floor(0.1 * k.astype(float) + 1).astype(k.dtype)
    og = state.basis_ck <= ns_eff
    ng = state.basis_ck > ns_eff

    ia, ha, io, ho, inw, hn, _ = triple_argmax_randcost(
        solver.pa, state, x, og, ng, block=3)   # force multiple blocks

    H, bo_valid, _ = height_table_randcost(solver.pa, state, x)
    Hnp = np.asarray(H)
    bo = np.asarray(bo_valid)
    for gate, h_got, i_got in [(np.ones(len(og), bool), ha, ia),
                               (np.asarray(og), ho, io),
                               (np.asarray(ng), hn, inw)]:
        Hm = np.where(bo & gate[:, None], Hnp, -1e300)
        np.testing.assert_allclose(np.asarray(h_got), Hm.max(axis=0),
                                   rtol=1e-12, atol=1e-12)
        # argmax may differ only between equal heights
        got_h = Hm[np.asarray(i_got), np.arange(Hm.shape[1])]
        np.testing.assert_allclose(got_h, Hm.max(axis=0), rtol=1e-12)


@pytest.mark.slow
def test_randcost_converges():
    sp, ef_obj = _setup(21, n_rv=1, support=2, rand_d=2, n2=6, m2=4)
    cfg = SDConfig(MAX_ITER=400, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.01


@pytest.mark.slow
def test_randcost_mixed_b_and_d():
    sp, ef_obj = _setup(33, n_rv=2, support=2, rand_d=1, n2=5, m2=4)
    assert sp.rv.nb == 2 and sp.rv.nd == 1
    cfg = SDConfig(MAX_ITER=400, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.015
