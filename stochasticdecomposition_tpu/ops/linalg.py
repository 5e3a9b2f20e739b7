"""Dense linear algebra primitives that lower to plain arithmetic.

The TPU backend implements LuDecomposition/TriangularSolve only for f32, but
the SD solver needs f64 basis factorizations (the reference gets f64 from
CPLEX for free).  These Gauss-Jordan routines use only elementwise ops,
dynamic-slice row swaps and outer products, so they compile for any dtype on
any backend and `vmap` cleanly across LP/QP batches.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def gj_solve(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B with Gauss-Jordan elimination + partial pivoting.

    A: [n, n], B: [n, k] (or [n] which is treated as [n, 1]).
    """
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    n = A.shape[0]
    aug = jnp.concatenate([A, B.astype(A.dtype)], axis=1)
    rows = jnp.arange(n)
    tiny = jnp.asarray(jnp.finfo(A.dtype).tiny * 1e4, A.dtype)

    def body(i, aug):
        col = aug[:, i]
        cand = jnp.where(rows >= i, jnp.abs(col), -1.0)
        p = jnp.argmax(cand)
        row_i = aug[i]
        row_p = aug[p]
        aug = aug.at[i].set(row_p).at[p].set(row_i)
        piv = aug[i, i]
        piv = jnp.where(jnp.abs(piv) < tiny,
                        jnp.where(piv < 0, -tiny, tiny), piv)
        new_row = aug[i] / piv
        factors = aug[:, i].at[i].set(0.0)
        aug = aug - jnp.outer(factors, new_row)
        aug = aug.at[i].set(new_row)
        return aug

    aug = lax.fori_loop(0, n, body, aug)
    X = aug[:, n:]
    return X[:, 0] if squeeze else X


def gj_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Matrix inverse via Gauss-Jordan (any dtype, any backend)."""
    n = A.shape[0]
    return gj_solve(A, jnp.eye(n, dtype=A.dtype))
