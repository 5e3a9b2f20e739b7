"""SMPS frontend golden tests (SURVEY.md §4 test plan (a))."""

import numpy as np

from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.smps.stoc import DIST_DISCRETE


def test_lands_parse():
    core, tim, stoc = load_instance("lands")
    assert core.n_rows == 9            # objective excluded
    assert core.n_cols == 16
    assert core.obj_name == "OBJ"
    assert tim.num_stages == 2
    assert tim.row_starts == [0, 2]    # MINCAP.. first stage, CAP1.. second
    assert tim.col_starts == [0, 4]
    assert stoc.num_omega == 1
    el = stoc.elements[0]
    assert el.dist == DIST_DISCRETE
    np.testing.assert_allclose(el.values, [3.0, 5.0, 7.0])
    np.testing.assert_allclose(el.probs.sum(), 1.0)


def test_lands_decompose():
    core, tim, stoc = load_instance("lands")
    sp = decompose(core, tim, stoc)
    assert sp.first.A.shape == (2, 4)
    assert sp.second.D.shape == (7, 12)
    assert sp.second.C_bar.shape == (7, 4)
    # The CAPi rows couple to x via -1 entries.
    np.testing.assert_allclose(np.diag(sp.second.C_bar[:4, :4]), -1.0)
    # Mean folded into b_bar on the random row (DEM1 = row 4 of stage 2).
    assert sp.rv.nb == 1
    assert sp.rv.rv_b_rows[0] == 4
    np.testing.assert_allclose(sp.second.b_bar[4], 5.0)
    assert sp.lb_is_trivial and sp.lb == 0.0
    # C_cols: all four x columns appear in C_bar.
    np.testing.assert_array_equal(sp.rv.C_cols, [0, 1, 2, 3])
    np.testing.assert_array_equal(sp.rv.lambda_rows, [4])


def test_lands_extensive_form():
    core, tim, stoc = load_instance("lands")
    sp = decompose(core, tim, stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    assert outs.shape == (3, 1)
    np.testing.assert_allclose(probs.sum(), 1.0)
    obj, x = solve_extensive_form(sp, outs, probs)
    # Classical published optimum for 3-scenario LandS is ~381.853.
    assert abs(obj - 381.853) < 0.5
    # Cross-check with the framework's own LP kernel.
    obj2, _ = solve_extensive_form(sp, outs, probs, backend="own")
    assert abs(obj - obj2) < 1e-6


def test_synthetic_roundtrip():
    core, tim, stoc = parse_synthetic(seed=3, n_rv=2, support=3)
    sp = decompose(core, tim, stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    assert len(probs) == 9
    obj, x = solve_extensive_form(sp, outs, probs)
    obj2, _ = solve_extensive_form(sp, outs, probs, backend="own")
    assert abs(obj - obj2) < 1e-6 * max(1.0, abs(obj))


def test_synthetic_random_C():
    core, tim, stoc = parse_synthetic(seed=5, n_rv=1, support=2, rand_C=2)
    sp = decompose(core, tim, stoc)
    assert sp.rv.nC == 2
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    assert len(probs) == 2 * 2 * 2
    obj, _ = solve_extensive_form(sp, outs, probs)
    obj2, _ = solve_extensive_form(sp, outs, probs, backend="own")
    assert abs(obj - obj2) < 1e-6 * max(1.0, abs(obj))


_RANGES_CORE = """NAME          RNGTEST
ROWS
 N  OBJ
 L  RL
 G  RG
 E  REP
 E  REN
COLUMNS
    X         OBJ       1.0    RL        1.0
    Y         OBJ       2.0    RG        1.0
    Z         OBJ       1.0    REP       1.0
    W         OBJ       1.0    REN       1.0
RHS
    RHS       RL        10.0   RG        2.0
    RHS       REP       1.0    REN       8.0
RANGES
    RNG       RL        4.0    RG        3.0
    RNG       REP       2.0    REN       -2.0
ENDATA
"""


def test_ranges_reformulation(tmp_path):
    """RANGES rows lower to equality + bounded slack with the standard MPS
    two-sided semantics: L:[r-|v|,r], G:[r,r+|v|], E+:[r,r+v], E-:[r-|v|,r]."""
    from stochasticdecomposition_tpu.smps.core import _read_core_py

    p = tmp_path / "rng.cor"
    p.write_text(_RANGES_CORE)
    core = _read_core_py(str(p))

    assert core.col_names == ["X", "Y", "Z", "W",
                              "RL$RNG", "RG$RNG", "REP$RNG", "REN$RNG"]
    np.testing.assert_array_equal(core.sense, [0, 0, 0, 0])  # all equalities
    np.testing.assert_allclose(core.b, [10.0, 2.0, 1.0, 8.0])  # rhs unchanged
    # slack coefficients: +1 when rhs is the upper side, -1 when lower.
    np.testing.assert_allclose(core.A[0, 4], 1.0)    # L row
    np.testing.assert_allclose(core.A[1, 5], -1.0)   # G row
    np.testing.assert_allclose(core.A[2, 6], -1.0)   # E row, v >= 0
    np.testing.assert_allclose(core.A[3, 7], 1.0)    # E row, v < 0
    np.testing.assert_allclose(core.lb[4:], 0.0)
    np.testing.assert_allclose(core.ub[4:], [4.0, 3.0, 2.0, 2.0])
    assert core.range_slacks == [(0, 4), (1, 5), (2, 6), (3, 7)]

    # Functional check: min x+2y+z+w lands on the interval lower ends
    # x=6 (RL: [6,10]), y=2 (RG: [2,5]), z=1 (REP: [1,3]), w=6 (REN: [6,8]).
    from scipy.optimize import linprog

    r = linprog(core.c, A_eq=core.A, b_eq=core.b,
                bounds=list(zip(core.lb, core.ub)), method="highs")
    assert r.status == 0
    np.testing.assert_allclose(r.fun, 6 + 2 * 2 + 1 + 6, atol=1e-8)
    np.testing.assert_allclose(r.x[:4], [6.0, 2.0, 1.0, 6.0], atol=1e-8)


def test_ranges_unknown_row_rejected(tmp_path):
    import pytest

    bad = _RANGES_CORE.replace("RNG       RL", "RNG       NOPE")
    p = tmp_path / "bad.cor"
    p.write_text(bad)
    from stochasticdecomposition_tpu.smps.core import _read_core_py

    with pytest.raises(ValueError, match="unknown row"):
        _read_core_py(str(p))


def test_sampler_distribution():
    import jax

    from stochasticdecomposition_tpu.sampler import build_sampler, sample_omega

    core, tim, stoc = load_instance("pgp2like")
    sp = decompose(core, tim, stoc)
    spec = build_sampler(stoc, sp.rv_order)
    key = jax.random.PRNGKey(0)
    obs = np.array(sample_omega(spec, key, 4000))
    assert obs.shape == (4000, 3)
    means = sp.rv.omega_mean
    np.testing.assert_allclose(obs.mean(axis=0), means, atol=0.15)
    # support check
    for k in range(3):
        assert set(np.unique(obs[:, k])).issubset(
            set(np.unique(np.array(spec.disc_vals[k]))))
