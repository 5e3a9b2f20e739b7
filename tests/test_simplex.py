"""LP kernel unit tests vs scipy.optimize.linprog (SURVEY.md §4 test plan (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from stochasticdecomposition_tpu.ops.simplex import (
    AT_LOWER, AT_UPPER, BASIC, STATUS_INFEASIBLE, STATUS_OPTIMAL,
    STATUS_UNBOUNDED, solve_lp,
)


def _scipy_solve(D, sense, d, l, u, b):
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(len(b)):
        if sense[i] == -1:
            A_ub.append(D[i]); b_ub.append(b[i])
        elif sense[i] == 1:
            A_ub.append(-D[i]); b_ub.append(-b[i])
        else:
            A_eq.append(D[i]); b_eq.append(b[i])
    return linprog(
        d, A_ub=np.array(A_ub) if A_ub else None,
        b_ub=np.array(b_ub) if b_ub else None,
        A_eq=np.array(A_eq) if A_eq else None,
        b_eq=np.array(b_eq) if b_eq else None,
        bounds=list(zip(l, u)), method="highs")


def _random_lp(rng):
    m = int(rng.integers(3, 12))
    n = int(rng.integers(3, 15))
    D = rng.normal(size=(m, n)).round(2)
    sense = rng.choice([-1, 0, 1], size=m, p=[0.4, 0.2, 0.4])
    d = rng.normal(size=n).round(2)
    b = rng.normal(size=m).round(2)
    l = np.zeros(n)
    u = np.full(n, np.inf)
    ub_mask = rng.random(n) < 0.3
    u[ub_mask] = rng.uniform(0.5, 5.0, size=int(ub_mask.sum()))
    fr_mask = (rng.random(n) < 0.15) & ~ub_mask
    l[fr_mask] = -np.inf
    return D, sense, d, l, u, b


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_random_lps_match_scipy(seed):
    rng = np.random.default_rng(seed)
    for _ in range(6):
        D, sense, d, l, u, b = _random_lp(rng)
        ref = _scipy_solve(D, sense, d, l, u, b)
        out = solve_lp(jnp.array(D), jnp.array(sense), jnp.array(d),
                       jnp.array(l), jnp.array(u), jnp.array(b))
        status = int(out.status)
        if ref.status == 0:
            assert status == STATUS_OPTIMAL
            assert abs(float(out.obj) - ref.fun) <= 1e-6 * max(1, abs(ref.fun))
            # dual stationarity:  d - pi'D - dj == 0
            resid = d - np.array(out.pi) @ D - np.array(out.dj)
            assert np.max(np.abs(resid)) < 1e-7
            # complementary slackness on rows
            slack = D @ np.array(out.y) - b
            assert np.max(np.abs(np.array(out.pi) * slack)) < 1e-6
        elif ref.status == 2:
            assert status == STATUS_INFEASIBLE
        elif ref.status == 3:
            assert status == STATUS_UNBOUNDED


@pytest.mark.parametrize("seed", range(4))
def test_random_lps_partial_pricing_match_scipy(seed):
    """The opt-in partial-pricing path (candidate-list Devex, full
    pricing only at refresh points) must reach the same optima, duals
    and statuses as scipy — small NC/window force many refresh cycles
    and idle pivots."""
    rng = np.random.default_rng(100 + seed)
    for _ in range(6):
        D, sense, d, l, u, b = _random_lp(rng)
        ref = _scipy_solve(D, sense, d, l, u, b)
        out = solve_lp(jnp.array(D), jnp.array(sense), jnp.array(d),
                       jnp.array(l), jnp.array(u), jnp.array(b),
                       partial_pricing=True, pp_window=3, pp_cands=4)
        status = int(out.status)
        if ref.status == 0:
            assert status == STATUS_OPTIMAL
            assert abs(float(out.obj) - ref.fun) <= 1e-6 * max(1, abs(ref.fun))
            resid = d - np.array(out.pi) @ D - np.array(out.dj)
            assert np.max(np.abs(resid)) < 1e-7
        elif ref.status == 2:
            assert status == STATUS_INFEASIBLE
        elif ref.status == 3:
            assert status == STATUS_UNBOUNDED


def test_dual_sign_convention():
    # min -x s.t. x <= 2  ->  pi(LE row) = -1 (CPLEX minimization convention)
    out = solve_lp(jnp.array([[1.0]]), jnp.array([-1]), jnp.array([-1.0]),
                   jnp.array([0.0]), jnp.array([jnp.inf]), jnp.array([2.0]))
    assert int(out.status) == STATUS_OPTIMAL
    assert float(out.y[0]) == pytest.approx(2.0)
    assert float(out.pi[0]) == pytest.approx(-1.0)

    # min x s.t. x >= 3  ->  pi(GE row) = +1
    out = solve_lp(jnp.array([[1.0]]), jnp.array([1]), jnp.array([1.0]),
                   jnp.array([0.0]), jnp.array([jnp.inf]), jnp.array([3.0]))
    assert float(out.pi[0]) == pytest.approx(1.0)


def test_cstat_and_basis():
    # min -y1 - 2 y2 s.t. y1 + y2 <= 4, y2 <= 3; 0<=y<=10
    D = jnp.array([[1.0, 1.0], [0.0, 1.0]])
    out = solve_lp(D, jnp.array([-1, -1]), jnp.array([-1.0, -2.0]),
                   jnp.array([0.0, 0.0]), jnp.array([10.0, 10.0]),
                   jnp.array([4.0, 3.0]))
    assert int(out.status) == STATUS_OPTIMAL
    np.testing.assert_allclose(np.array(out.y), [1.0, 3.0], atol=1e-9)
    assert set(int(s) for s in out.cstat) <= {AT_LOWER, BASIC, AT_UPPER}
    # binv is really the inverse of the final basis matrix
    A = np.concatenate([np.array(D), np.eye(2)], axis=1)
    B = A[:, np.array(out.basis)]
    np.testing.assert_allclose(B @ np.array(out.binv), np.eye(2), atol=1e-9)


def test_farkas_certificate():
    # x >= 2 and x <= 1 is infeasible.
    D = jnp.array([[1.0], [1.0]])
    sense = jnp.array([1, -1])
    out = solve_lp(D, sense, jnp.array([0.0]), jnp.array([0.0]),
                   jnp.array([jnp.inf]), jnp.array([2.0, 1.0]))
    assert int(out.status) == STATUS_INFEASIBLE
    ray = np.array(out.farkas)
    # Certificate: ray'b > sup_y ray'Dy over the y bounds (y in [0, inf) and
    # row senses folded via the standard form). Check the aggregated row
    # ray'D <= 0 componentwise for increasable y and positive violation.
    assert ray @ np.array([2.0, 1.0]) > 1e-9
    assert np.all(ray @ np.array(D) <= 1e-9)


@pytest.mark.slow
def test_vmapped_batch():
    rng = np.random.default_rng(7)
    D, sense, d, l, u, b = _random_lp(rng)
    batch = 16
    bs = np.tile(b, (batch, 1)) + rng.normal(scale=0.1, size=(batch, len(b)))
    sol = jax.vmap(lambda bb: solve_lp(
        jnp.array(D), jnp.array(sense), jnp.array(d),
        jnp.array(l), jnp.array(u), bb))(jnp.array(bs))
    for i in range(batch):
        ref = _scipy_solve(D, sense, d, l, u, bs[i])
        if ref.status == 0:
            assert int(sol.status[i]) == STATUS_OPTIMAL
            assert abs(float(sol.obj[i]) - ref.fun) <= 1e-6 * max(1, abs(ref.fun))


def _assert_matches_scipy(D, sense, d, l, u, b, tol=1e-6):
    ref = _scipy_solve(D, sense, d, l, u, b)
    res = solve_lp(jnp.asarray(D), jnp.asarray(sense, jnp.int32),
                   jnp.asarray(d), jnp.asarray(l), jnp.asarray(u),
                   jnp.asarray(b))
    if ref.status == 0:
        assert int(res.status) == STATUS_OPTIMAL, int(res.status)
        scale = 1.0 + abs(ref.fun)
        assert abs(float(res.obj) - ref.fun) / scale < tol, \
            (float(res.obj), ref.fun)
    elif ref.status == 2:
        assert int(res.status) == STATUS_INFEASIBLE
    elif ref.status == 3:
        assert int(res.status) == STATUS_UNBOUNDED


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_degenerate_lps_match_scipy(seed):
    """Harris ratio-test stress: highly degenerate LPs (duplicated rows,
    zero rhs, many ties in the ratio test)."""
    rng = np.random.default_rng(1000 + seed)
    m, n = 14, 10
    base = rng.normal(size=(m // 2, n)).round(1)
    D = np.vstack([base, base * rng.choice([1.0, 2.0], size=(m // 2, 1))])
    sense = np.full(m, -1)
    sense[rng.random(m) < 0.3] = 1
    d = rng.normal(size=n).round(1)
    b = np.zeros(m)                      # degenerate vertex at the origin
    b[rng.random(m) < 0.4] = rng.uniform(0.5, 2.0)
    b = np.where(sense == 1, -np.abs(b), np.abs(b))
    l = np.zeros(n)
    u = np.full(n, np.inf)
    _assert_matches_scipy(D, sense, d, l, u, b)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_ill_scaled_lps_match_scipy(seed):
    """Harris ratio-test stress: columns/rows scaled across 8 orders of
    magnitude (storm-class scaling risk; SURVEY.md §7 hard part 1)."""
    rng = np.random.default_rng(2000 + seed)
    m = int(rng.integers(6, 12))
    n = int(rng.integers(6, 14))
    D = rng.normal(size=(m, n))
    col_scale = 10.0 ** rng.uniform(-4, 4, size=n)
    row_scale = 10.0 ** rng.uniform(-2, 2, size=m)
    D = D * col_scale[None, :] * row_scale[:, None]
    sense = rng.choice([-1, 1], size=m, p=[0.6, 0.4])
    d = rng.normal(size=n) * col_scale
    b = rng.normal(size=m) * row_scale
    b = np.where(sense == 1, -np.abs(b), np.abs(b))
    l = np.zeros(n)
    u = np.full(n, np.inf)
    _assert_matches_scipy(D, sense, d, l, u, b, tol=1e-5)


@pytest.mark.slow
def test_suite_scale_degenerate_batch():
    """A vmapped batch of dispatch-style recourse LPs with degenerate rhs
    (the storm-class silent-quality risk)."""
    from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.core.state import stage_problem
    from stochasticdecomposition_tpu.core.update import subproblem_rhs_cost

    core, tim, stoc = parse_synthetic(seed=3, n1=12, m1=2, n2=120, m2=60,
                                      n_rv=8, support=3)
    sp = decompose(core, tim, stoc)
    pa = stage_problem(sp)
    x = jnp.full(12, 1.0, pa.c1.dtype)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(16, len(sp.rv.omega_mean))) * 0.5)

    def one(wi):
        rhs, cost = subproblem_rhs_cost(pa, x, wi)
        res = solve_lp(pa.D, pa.sense2, cost, pa.l2, pa.u2, rhs)
        return res.obj, res.status

    objs, stats = jax.vmap(one)(W)
    assert np.all(np.asarray(stats) == STATUS_OPTIMAL)
    # spot-check two lanes against scipy
    D = np.asarray(pa.D); sense = np.asarray(pa.sense2)
    for i in (0, 7):
        rhs, cost = subproblem_rhs_cost(pa, x, W[i])
        ref = _scipy_solve(D, sense, np.asarray(cost), np.asarray(pa.l2),
                           np.asarray(pa.u2), np.asarray(rhs))
        assert abs(float(objs[i]) - ref.fun) / (1 + abs(ref.fun)) < 1e-6


def test_lu_refine_inv_accuracy():
    """Newton-refined f32-seed inverse reaches f64 accuracy on
    well-to-moderately-conditioned bases (the simplex refactorization
    contract; ill-conditioning beyond ~1e6 is excluded by pivot tols)."""
    import numpy as np

    from stochasticdecomposition_tpu.ops.linalg import gj_inv, lu_refine_inv

    rng = np.random.default_rng(0)
    for m, cond in [(7, 1e2), (80, 1e3), (256, 1e5), (528, 1e6)]:
        u, _ = np.linalg.qr(rng.standard_normal((m, m)))
        v, _ = np.linalg.qr(rng.standard_normal((m, m)))
        s = np.logspace(0, np.log10(cond), m)
        A = jnp.asarray(u @ np.diag(s) @ v, jnp.float64)
        X = np.asarray(lu_refine_inv(A))
        R = np.eye(m) - np.asarray(A) @ X
        assert np.max(np.abs(R)) < 1e-9, (m, cond, np.max(np.abs(R)))
        # Parity with the Gauss-Jordan path it replaces.
        Xg = np.asarray(gj_inv(A))
        assert np.max(np.abs(X - Xg)) < 1e-6 * np.max(np.abs(Xg))


def test_lu_refine_inv_singular_nonfinite():
    """A singular basis must surface as non-finite output (the warm-start
    guard in solve_lp keys on isfinite), not silently-junk values."""
    import numpy as np

    from stochasticdecomposition_tpu.ops.linalg import lu_refine_inv

    A = jnp.asarray(np.ones((16, 16)), jnp.float64)
    X = np.asarray(lu_refine_inv(A))
    assert not np.all(np.isfinite(X))


def test_lu_refine_inv_divergence_poisoned():
    """Above kappa ~1e7 the f32 Newton seed residual exceeds 1 and the
    iteration diverges; after a fixed step count the result can be
    finite-but-WRONG.  The residual certificate must poison such outputs
    to NaN (advisor r4 medium: a corrupted-but-finite inverse would feed
    duals, reduced costs, and _certify_optimal from the same wrong data
    with no way to notice)."""
    import numpy as np

    from stochasticdecomposition_tpu.ops.linalg import lu_refine_inv

    rng = np.random.default_rng(4)
    for m, cond in [(64, 1e9), (256, 1e10)]:
        u, _ = np.linalg.qr(rng.standard_normal((m, m)))
        v, _ = np.linalg.qr(rng.standard_normal((m, m)))
        s = np.logspace(0, np.log10(cond), m)
        A = jnp.asarray(u @ np.diag(s) @ v, jnp.float64)
        X = np.asarray(lu_refine_inv(A))
        # The f32 seed residual is ~kappa*6e-8 >> 1 here, so Newton
        # diverges and the certificate must have fired.
        assert not np.all(np.isfinite(X)), (m, cond)
