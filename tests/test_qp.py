"""QP kernel unit tests: KKT residuals + closed forms (SURVEY.md §4 (b))."""

import jax.numpy as jnp
import numpy as np
import pytest

from stochasticdecomposition_tpu.ops.qp import solve_qp


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_random_qp_kkt(seed):
    rng = np.random.default_rng(seed)
    for _ in range(4):
        n = int(rng.integers(2, 10))
        me = int(rng.integers(0, 3))
        mi = int(rng.integers(1, 12))
        L = rng.normal(size=(n, n))
        Q = L @ L.T + 0.1 * np.eye(n)
        c = rng.normal(size=n)
        A = rng.normal(size=(me, n))
        G = rng.normal(size=(mi, n))
        v0 = rng.normal(size=n)
        h = G @ v0 + rng.uniform(0.1, 2.0, size=mi)
        b = A @ v0 if me else np.zeros(0)

        res = solve_qp(jnp.array(Q), jnp.array(c), jnp.array(A), jnp.array(b),
                       jnp.array(G), jnp.array(h))
        assert bool(res.converged)
        v, y, z = np.array(res.v), np.array(res.y), np.array(res.z)
        stat = Q @ v + c + (A.T @ y if me else 0) + G.T @ z
        assert np.max(np.abs(stat)) < 1e-6
        assert np.max(G @ v - h) < 1e-6
        if me:
            assert np.max(np.abs(A @ v - b)) < 1e-6
        assert np.max(np.abs(z * (h - G @ v))) < 1e-6
        assert np.all(z > -1e-9)


def test_box_projection_closed_form():
    s, n = 2.0, 6
    c = np.array([3.0, -1.0, 0.5, -4.0, 0.25, 2.5])
    G = np.vstack([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)
    res = solve_qp(jnp.array(s * np.eye(n)), jnp.array(c),
                   jnp.zeros((0, n)), jnp.zeros(0), jnp.array(G), jnp.array(h))
    expect = np.clip(-c / s, -1, 1)
    np.testing.assert_allclose(np.array(res.v), expect, atol=1e-6)


def test_masked_rows():
    # Padded (masked-off) rows must not affect the solution.
    n = 3
    Q = 2.0 * np.eye(n)
    c = np.array([1.0, -2.0, 0.5])
    G = np.vstack([np.eye(n), 100 * np.ones((2, n))])
    h = np.concatenate([np.ones(n), np.zeros(2)])
    mask = np.array([True] * n + [False] * 2)
    res = solve_qp(jnp.array(Q), jnp.array(c), jnp.zeros((0, n)), jnp.zeros(0),
                   jnp.array(G), jnp.array(h), ineq_mask=jnp.array(mask))
    expect = np.clip(-c / 2.0, -np.inf, 1.0)
    np.testing.assert_allclose(np.array(res.v), expect, atol=1e-6)
