"""Stochastic updates: the incremental omega/lambda/sigma/delta machinery.

Reference: stocUpdate.c.  Dedup scans (equalVector with TOLERANCE at
stocUpdate.c:272,300-308,331) become masked all-pairs compares; the delta
table fills (stocUpdate.c:196-257) become einsums against precomputed scatter
maps.  Everything is in-jit with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState
from stochasticdecomposition_tpu.ops.simplex import (
    AT_LOWER, AT_UPPER, STATUS_INFEASIBLE, STATUS_OPTIMAL, solve_lp,
)


def subproblem_rhs_cost(pa: ProblemArrays, x, w):
    """rhs = (bBar + b_w) - (CBar + C_w) x and cost = dBar + d_w for one
    centered observation w (reference computeRHS/computeCostCoeff,
    subprob.c:96-156)."""
    nb = pa.rv_b_rows.shape[0]
    nC = pa.rv_C_rows.shape[0]
    nd = pa.rv_d_cols.shape[0]
    off_C = nb
    off_d = nb + nC

    rhs = pa.b_bar - pa.C_bar @ x
    if nb:
        rhs = rhs.at[pa.rv_b_rows].add(w[:nb])
    if nC:
        contrib = w[off_C:off_C + nC] * x[pa.rv_C_cols]
        rhs = rhs.at[pa.rv_C_rows].add(-contrib)
    cost = pa.d_bar
    if nd:
        cost = cost.at[pa.rv_d_cols].add(w[off_d:off_d + nd])
    return rhs, cost


def solve_subproblem(pa: ProblemArrays, x, w, *, max_iter: int = 0,
                     init_basis=None, init_at_upper=None):
    """One subproblem LP solve (subprob.c:17-84 without the updates)."""
    rhs, cost = subproblem_rhs_cost(pa, x, w)
    return solve_lp(pa.D, pa.sense2, cost, pa.l2, pa.u2, rhs,
                    max_iter=max_iter, init_basis=init_basis,
                    init_at_upper=init_at_upper)


def warm_solve_subproblem(pa: ProblemArrays, state, x, w):
    """Subproblem solve warm-started from the previous optimal basis carried
    in the state; returns (res, state) with the warm basis refreshed.  The
    reference's CPLEX problem object keeps its basis between solves for the
    same effect (subprob.c:43-45 runs primal simplex on the warm object)."""
    res = solve_subproblem(pa, x, w, init_basis=state.warm_basis,
                           init_at_upper=state.warm_atup)
    ok = res.status == STATUS_OPTIMAL
    atup = jnp.concatenate([res.cstat, res.rstat]) == AT_UPPER
    state = state._replace(
        warm_basis=jnp.where(ok, res.basis, state.warm_basis),
        warm_atup=jnp.where(ok, atup, state.warm_atup))
    return res, state


def compute_mu(res):
    """mubBar: bound-dual correction (computeMU, stocUpdate.c:351-387)."""
    at_bound = (res.cstat == AT_LOWER) | (res.cstat == AT_UPPER)
    return jnp.sum(jnp.where(at_bound, res.dj * res.y, 0.0))


def calc_omega(state: SDState, w, tol: float):
    """Dedup the new observation into the omega pool (stocUpdate.c:326-348).

    Returns (state, idx, is_new)."""
    O = state.omega_vals.shape[0]
    ids = jnp.arange(O)
    close = jnp.all(jnp.abs(state.omega_vals - w[None, :]) <= tol, axis=1) \
        if w.shape[0] else jnp.ones(O, bool)
    match = close & (ids < state.omega_cnt)
    found = jnp.any(match)
    first = jnp.argmax(match)
    idx = jnp.where(found, first, state.omega_cnt).astype(jnp.int32)

    omega_vals = lax.cond(
        found, lambda: state.omega_vals,
        lambda: state.omega_vals.at[idx].set(w))
    omega_w = state.omega_w.at[idx].add(1)
    omega_cnt = jnp.where(found, state.omega_cnt, state.omega_cnt + 1)
    return state._replace(omega_vals=omega_vals, omega_w=omega_w,
                          omega_cnt=omega_cnt), idx, ~found


def delta_new_omega_column(pa: ProblemArrays, state: SDState, o_idx):
    """Fill delta column o_idx for every stored lambda (calcDelta Case I,
    stocUpdate.c:206-229).  Unused lambda rows are zero so no mask needed."""
    nb = pa.rv_b_rows.shape[0]
    nC = pa.rv_C_rows.shape[0]
    w = state.omega_vals[o_idx]

    if nb:
        wb = pa.bmap @ w[:nb]                       # [nlr]
        col_pib = state.lambda_vals @ wb            # [L]
    else:
        col_pib = jnp.zeros(state.lambda_vals.shape[0], state.lambda_vals.dtype)
    delta_pib = state.delta_pib.at[:, o_idx].set(col_pib)

    if nC:
        wc = w[nb:nb + nC]                          # [nC]
        lamC = state.lambda_vals[:, pa.lam_pos_C]   # [L, nC]
        col_piC = (lamC * wc[None, :]) @ pa.Cgroup  # [L, nCr]
        delta_piC = state.delta_piC.at[:, o_idx, :].set(col_piC)
    else:
        delta_piC = state.delta_piC
    return state._replace(delta_pib=delta_pib, delta_piC=delta_piC)


def delta_new_lambda_row(pa: ProblemArrays, state: SDState, l_idx):
    """Fill delta row l_idx for every stored omega (calcDelta Case II,
    stocUpdate.c:230-254).  Unused omega columns are zero-vectors -> zeros."""
    nb = pa.rv_b_rows.shape[0]
    nC = pa.rv_C_rows.shape[0]
    lam = state.lambda_vals[l_idx]

    if nb:
        row_pib = state.omega_vals[:, :nb] @ (pa.bmap.T @ lam)   # [O]
    else:
        row_pib = jnp.zeros(state.omega_vals.shape[0], lam.dtype)
    delta_pib = state.delta_pib.at[l_idx, :].set(row_pib)

    if nC:
        lamk = lam[pa.lam_pos_C]                                  # [nC]
        row_piC = (state.omega_vals[:, nb:nb + nC] * lamk[None, :]) @ pa.Cgroup
        delta_piC = state.delta_piC.at[l_idx, :, :].set(row_piC)
    else:
        delta_piC = state.delta_piC
    return state._replace(delta_pib=delta_pib, delta_piC=delta_piC)


def calc_lambda(pa: ProblemArrays, state: SDState, pi, tol: float):
    """Dedup the dual sub-vector on random rows (calcLambda,
    stocUpdate.c:264-284).  Returns (state, lidx, is_new)."""
    lam = pi[pa.lambda_rows] if pa.lambda_rows.shape[0] else \
        jnp.zeros(0, pi.dtype)
    L = state.lambda_vals.shape[0]
    ids = jnp.arange(L)
    close = jnp.all(jnp.abs(state.lambda_vals - lam[None, :]) <= tol, axis=1) \
        if lam.shape[0] else jnp.ones(L, bool)
    match = close & (ids < state.lambda_cnt)
    found = jnp.any(match)
    idx = jnp.where(found, jnp.argmax(match), state.lambda_cnt).astype(jnp.int32)

    lambda_vals = lax.cond(
        found, lambda: state.lambda_vals,
        lambda: state.lambda_vals.at[idx].set(lam))
    lambda_cnt = jnp.where(found, state.lambda_cnt, state.lambda_cnt + 1)
    state = state._replace(lambda_vals=lambda_vals, lambda_cnt=lambda_cnt)
    # New lambda -> fill its delta row against all observations.
    state = lax.cond(found, lambda s: s,
                     lambda s: delta_new_lambda_row(pa, s, idx), state)
    return state, idx, ~found


def calc_sigma(pa: ProblemArrays, state: SDState, pi, mub_bar, lidx,
               new_lambda, feas, k, tol: float):
    """Dedup (pib, piC, lambdaIdx) into sigma (calcSigma,
    stocUpdate.c:286-320).  Returns (state, sidx, is_new)."""
    pib = pi @ pa.b_bar + mub_bar
    piC = (pi @ pa.C_bar)[pa.C_cols] if pa.C_cols.shape[0] else \
        jnp.zeros(0, pi.dtype)

    S = state.sigma_pib.shape[0]
    ids = jnp.arange(S)
    close_b = jnp.abs(state.sigma_pib - pib) <= tol
    close_C = jnp.all(jnp.abs(state.sigma_piC - piC[None, :]) <= tol, axis=1) \
        if piC.shape[0] else jnp.ones(S, bool)
    match = close_b & close_C & (state.sigma_lidx == lidx) & \
        (ids < state.sigma_cnt) & ~new_lambda
    found = jnp.any(match)
    idx = jnp.where(found, jnp.argmax(match), state.sigma_cnt).astype(jnp.int32)

    def _add(s):
        return s._replace(
            sigma_pib=s.sigma_pib.at[idx].set(pib),
            sigma_piC=s.sigma_piC.at[idx].set(piC),
            sigma_lidx=s.sigma_lidx.at[idx].set(lidx),
            sigma_ck=s.sigma_ck.at[idx].set(k),
            sigma_feas=s.sigma_feas.at[idx].set(feas),
            sigma_cnt=s.sigma_cnt + 1,
        )

    state = lax.cond(found, lambda s: s, _add, state)
    return state, idx, ~found


def stochastic_updates(pa: ProblemArrays, state: SDState, res, o_idx, new_o,
                       k, tol: float):
    """Full update pass for one subproblem dual (stochasticUpdates,
    stocUpdate.c:14-133).  Dispatches to the random-cost basis machinery
    (randcost.py) when the problem has random cost coefficients.
    Returns (state, sigma_idx)."""
    if int(pa.rv_d_cols.shape[0]) > 0:
        from stochasticdecomposition_tpu.core.randcost import (
            stochastic_updates_randcost,
        )

        state = stochastic_updates_randcost(pa, state, res, o_idx, new_o,
                                            k, tol)
        return state, jnp.int32(0)

    # New observation -> new delta column against all lambdas (must run before
    # the new lambda row fill, mirroring stocUpdate.c:24-31).
    state = lax.cond(new_o, lambda s: delta_new_omega_column(pa, s, o_idx),
                     lambda s: s, state)

    feas = res.status == STATUS_OPTIMAL
    # For infeasible subproblems the dual ray (Farkas certificate) enters the
    # pools with feasFlag=false (stocUpdate.c:66-75): it feeds feasibility
    # cuts but is masked out of the optimality argmax.
    pi = jnp.where(feas, res.pi, res.farkas)
    # Ray bound correction: infeasibility of rhs r is certified by
    #   ray'r > sup_{l<=y<=u} ray'Dy = sum_j u_j max(ray'D_j,0)+l_j min(.,0),
    # so the feasibility cut's constant absorbs -sup (the ray analog of the
    # mubBar term computeMU adds for optimal bases, stocUpdate.c:351-387).
    rd = res.farkas @ pa.D
    u_fin = jnp.where(jnp.isfinite(pa.u2), pa.u2, 0.0)
    l_fin = jnp.where(jnp.isfinite(pa.l2), pa.l2, 0.0)
    mub_ray = -jnp.sum(u_fin * jnp.maximum(rd, 0.0) +
                       l_fin * jnp.minimum(rd, 0.0))
    mub = jnp.where(feas, compute_mu(res), mub_ray)

    state, lidx, new_lam = calc_lambda(pa, state, pi, tol)
    state, sidx, _ = calc_sigma(pa, state, pi, mub, lidx, new_lam, feas, k, tol)
    return state, sidx
