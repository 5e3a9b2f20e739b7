"""End-to-end objective parity vs the extensive form (SURVEY.md §4 (d))."""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def _setup(parse, **cfg_kw):
    core, tim, stoc = parse
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, ef_x = solve_extensive_form(sp, outs, probs)
    cfg = SDConfig(**cfg_kw)
    return SDSolver(sp, cfg), ef_obj


@pytest.mark.slow
def test_lands_converges():
    solver, ef_obj = _setup(load_instance("lands"),
                            MAX_ITER=400, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    assert r.optimal, "bootstrap optimality test should trigger"
    ev = solver.evaluate_x(r.incumb_x)
    # True objective of the SD solution within 1% of the optimum.
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.01
    # Lower-bound estimate in the same neighbourhood.
    assert abs(r.incumb_est - ef_obj) / abs(ef_obj) < 0.05


@pytest.mark.slow
def test_pgp2like_converges():
    solver, ef_obj = _setup(load_instance("pgp2like"),
                            MAX_ITER=500, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.01


@pytest.mark.slow
def test_synthetic_random_C_converges():
    solver, ef_obj = _setup(
        parse_synthetic(seed=2, n_rv=2, support=2, rand_C=2, n2=6, m2=4),
        MAX_ITER=400, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.015


@pytest.mark.slow
def test_replication_reproducible():
    solver, _ = _setup(load_instance("lands"), MAX_ITER=50, EVAL_FLAG=False)
    r1 = solver.solve_replication(0)
    r2 = solver.solve_replication(0)
    np.testing.assert_allclose(r1.incumb_x, r2.incumb_x, atol=1e-12)
    assert r1.iterations == r2.iterations
