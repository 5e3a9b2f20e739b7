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
                     init_basis=None, init_at_upper=None, pivot_dtype=None):
    """One subproblem LP solve (subprob.c:17-84 without the updates)."""
    rhs, cost = subproblem_rhs_cost(pa, x, w)
    return solve_lp(pa.D, pa.sense2, cost, pa.l2, pa.u2, rhs,
                    max_iter=max_iter, init_basis=init_basis,
                    init_at_upper=init_at_upper, pivot_dtype=pivot_dtype)


def warm_solve_subproblem(pa: ProblemArrays, state, x, w, pivot_dtype=None):
    """Subproblem solve warm-started from the previous optimal basis carried
    in the state; returns (res, state) with the warm basis refreshed.  The
    reference's CPLEX problem object keeps its basis between solves for the
    same effect (subprob.c:43-45 runs primal simplex on the warm object)."""
    res = solve_subproblem(pa, x, w, init_basis=state.warm_basis,
                           init_at_upper=state.warm_atup,
                           pivot_dtype=pivot_dtype)
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


def _batch_dedup(cand, pool, pool_cnt, cnt0, tol, extra_eq=None):
    """Order-preserving two-phase dedup of a candidate batch against a pool.

    Replicates EXACTLY what a sequential scan of per-item dedup would do
    (stocUpdate.c's equalVector scans, one item at a time): item i matches
    the pool, or an earlier batch item j < i that was itself ADDED as new
    (items that matched the pool are never added, so near-matches to them do
    NOT count — the tolerance-chaining semantics of the sequential scan).

    cand: [B, d]; pool: [P, d] (rows >= pool_cnt are garbage).
    extra_eq: optional [B, P] / [B, B] extra equality masks (e.g. sigma's
    lambda-index match) given as a pair (eq_pool, eq_batch).
    Returns (idx [B], is_new [B], new_cnt) where idx is each item's final
    pool index and new items get consecutive slots starting at cnt0.
    """
    B, d = cand.shape
    P = pool.shape[0]
    ids = jnp.arange(P)
    if d:
        close_pool = jnp.all(
            jnp.abs(cand[:, None, :] - pool[None, :, :]) <= tol, axis=2)
        close_batch = jnp.all(
            jnp.abs(cand[:, None, :] - cand[None, :, :]) <= tol, axis=2)
    else:
        close_pool = jnp.ones((B, P), bool)
        close_batch = jnp.ones((B, B), bool)
    if extra_eq is not None:
        close_pool &= extra_eq[0]
        close_batch &= extra_eq[1]
    close_pool &= (ids[None, :] < pool_cnt)
    earlier = jnp.tril(jnp.ones((B, B), bool), k=-1)

    match_pool = jnp.any(close_pool, axis=1)                     # [B]
    first_pool = jnp.argmax(close_pool, axis=1).astype(jnp.int32)

    # is_new[i] = no pool match and no match to an earlier NEW item.
    def scan_new(new_so_far, i):
        hits = close_batch[i] & earlier[i] & new_so_far
        is_new_i = ~match_pool[i] & ~jnp.any(hits)
        return new_so_far.at[i].set(is_new_i), (is_new_i, jnp.argmax(hits))

    (_, (is_new, first_new_j)) = lax.scan(
        scan_new, jnp.zeros(B, bool), jnp.arange(B))

    # Slot numbering follows batch order, exactly like the sequential scan.
    slot = cnt0 + jnp.cumsum(is_new.astype(jnp.int32)) - 1       # [B]
    # Resolve each item: pool hit -> pool idx; new -> own slot; else the
    # slot of the first earlier new item it matched.
    idx = jnp.where(match_pool, first_pool,
                    jnp.where(is_new, slot, jnp.take(slot, first_new_j)))
    # x64 note: jnp.sum(int32) promotes to int64 — pin the count dtype so
    # pool counters keep their int32 dtype across steps (scan carries and
    # downstream scatters require it).
    new_cnt = (cnt0 + jnp.sum(is_new.astype(jnp.int32))).astype(jnp.int32)
    return idx.astype(jnp.int32), is_new, new_cnt


def calc_omega_batch(state: SDState, w_batch, tol: float):
    """Batched calc_omega: dedup B observations into the omega pool in one
    pass (same final pool contents, weights, and slot order as B sequential
    calc_omega calls).  Returns (state, o_idxs [B], new_flags [B])."""
    idx, is_new, cnt1 = _batch_dedup(
        w_batch, state.omega_vals, state.omega_cnt, state.omega_cnt, tol)
    # Scatter the new representatives (non-new rows write to a dump slot).
    O = state.omega_vals.shape[0]
    rows = jnp.where(is_new, idx, O)            # O = one-past-end dump row
    omega_vals = jnp.zeros(
        (O + 1, state.omega_vals.shape[1]),
        state.omega_vals.dtype).at[:O].set(state.omega_vals)
    omega_vals = omega_vals.at[rows].set(w_batch)[:O]
    omega_w = state.omega_w.at[idx].add(1)
    return state._replace(omega_vals=omega_vals, omega_w=omega_w,
                          omega_cnt=cnt1), idx, is_new


def stochastic_updates_batch(pa: ProblemArrays, state: SDState, res_b,
                             o_idxs, new_o, k, tol: float):
    """Batched stochasticUpdates for the plain-randomness path: pools B
    subproblem duals with the same final state as a sequential lax.scan of
    stochastic_updates, but with the dedup decisions in one tiny scan and
    ALL delta fills as single matmuls (the scan version dispatches B
    sequential per-observation fills, which dominates the batched step).

    The delta table is a pure function of (lambda_row, omega_col), so fill
    order does not affect values — only coverage matters: new-lambda rows
    are filled against the already-extended omega pool and new-omega columns
    against the already-extended lambda pool; (new, new) pairs are written
    twice with identical values.
    """
    nb = pa.rv_b_rows.shape[0]
    nC = pa.rv_C_rows.shape[0]
    dtype = state.lambda_vals.dtype
    B = o_idxs.shape[0]

    feas = res_b.status == STATUS_OPTIMAL                        # [B]
    pi_b = jnp.where(feas[:, None], res_b.pi, res_b.farkas)      # [B, m2]
    rd = res_b.farkas @ pa.D                                     # [B, n2]
    u_fin = jnp.where(jnp.isfinite(pa.u2), pa.u2, 0.0)
    l_fin = jnp.where(jnp.isfinite(pa.l2), pa.l2, 0.0)
    mub_ray = -jnp.sum(u_fin[None, :] * jnp.maximum(rd, 0.0) +
                       l_fin[None, :] * jnp.minimum(rd, 0.0), axis=1)
    at_bound = (res_b.cstat == AT_LOWER) | (res_b.cstat == AT_UPPER)
    mu_opt = jnp.sum(jnp.where(at_bound, res_b.dj * res_b.y, 0.0), axis=1)
    mub = jnp.where(feas, mu_opt, mub_ray)                       # [B]

    # ---- lambda dedup (calcLambda x B) -----------------------------------
    lam_b = pi_b[:, pa.lambda_rows] if pa.lambda_rows.shape[0] else \
        jnp.zeros((B, 0), dtype)
    lidx, new_lam, lam_cnt1 = _batch_dedup(
        lam_b, state.lambda_vals, state.lambda_cnt, state.lambda_cnt, tol)
    L = state.lambda_vals.shape[0]
    lrows = jnp.where(new_lam, lidx, L)
    lambda_vals = jnp.zeros((L + 1, state.lambda_vals.shape[1]), dtype) \
        .at[:L].set(state.lambda_vals)
    lambda_vals = lambda_vals.at[lrows].set(lam_b)[:L]
    state = state._replace(lambda_vals=lambda_vals, lambda_cnt=lam_cnt1)

    # ---- delta fills, batched --------------------------------------------
    # New-lambda rows over ALL omegas (calcDelta Case II) and new-omega
    # columns over ALL lambdas (Case I), each computed at [B] width only
    # and scattered through one-past-end dump slots (non-new lanes write to
    # the dump row/column, which the final slice drops, so tolerance-level
    # differences of a duplicate never overwrite the FIRST-stored values —
    # matching the sequential dedup semantics bit-for-bit).
    #
    # An earlier version recomputed the ENTIRE [L, O] table as one matmul
    # per step and masked one column in; at storm scale (L=6145, O=4224,
    # nb=118) that is a multi-GFLOP emulated-f64 matmul per iteration and
    # made the fused step ~19x slower than the sum of its real work.
    Ocap = state.delta_pib.shape[1]
    lrows = jnp.where(new_lam, lidx, L)                  # [B] dump row = L
    ocols = jnp.where(new_o, o_idxs, Ocap)               # [B] dump col = O
    if nb:
        rows_pib = (state.omega_vals[:, :nb] @ (pa.bmap.T @ lam_b.T)).T
        cols_pib = lambda_vals @ (pa.bmap @
                                  state.omega_vals[o_idxs, :nb].T)  # [L, B]
        dp = jnp.zeros((L + 1, Ocap + 1), dtype) \
            .at[:L, :Ocap].set(state.delta_pib)
        dp = dp.at[lrows, :Ocap].set(rows_pib)           # Case II rows
        dp = dp[:L].at[:, ocols].set(cols_pib)           # Case I cols
        delta_pib = dp[:, :Ocap]
    else:
        delta_pib = state.delta_pib
    if nC:
        lamC_b = lam_b[:, pa.lam_pos_C]                          # [B, nC]
        rows_piC = jnp.einsum(
            "oc,bc,cr->bor", state.omega_vals[:, nb:nb + nC], lamC_b,
            pa.Cgroup)                                           # [B, O, nCr]
        lamC_all = lambda_vals[:, pa.lam_pos_C]                  # [L, nC]
        cols_piC = jnp.einsum(
            "bc,lc,cr->lbr", state.omega_vals[o_idxs, nb:nb + nC],
            lamC_all, pa.Cgroup)                                 # [L, B, nCr]
        nCr = state.delta_piC.shape[2]
        dc = jnp.zeros((L + 1, Ocap + 1, nCr), dtype) \
            .at[:L, :Ocap].set(state.delta_piC)
        dc = dc.at[lrows, :Ocap].set(rows_piC)
        dc = dc[:L].at[:, ocols].set(cols_piC)
        delta_piC = dc[:, :Ocap]
    else:
        delta_piC = state.delta_piC
    state = state._replace(delta_pib=delta_pib, delta_piC=delta_piC)

    # ---- sigma dedup (calcSigma x B) --------------------------------------
    pib_b = pi_b @ pa.b_bar + mub                                # [B]
    piC_b = (pi_b @ pa.C_bar)[:, pa.C_cols] if pa.C_cols.shape[0] else \
        jnp.zeros((B, 0), dtype)
    cand = jnp.concatenate([pib_b[:, None], piC_b], axis=1)      # [B, 1+nCc]
    pool = jnp.concatenate(
        [state.sigma_pib[:, None], state.sigma_piC], axis=1)
    # A new lambda forces a new sigma entry (calcSigma's ~new_lambda gate):
    # pool rows never match a new-lambda item, and within the batch items
    # only match earlier items with the same FINAL lambda index (new-lambda
    # items share their index only with later duplicates, which the
    # eq_batch lidx test handles).
    eq_pool = (state.sigma_lidx[None, :] == lidx[:, None]) & \
        ~new_lam[:, None]
    eq_batch = lidx[None, :] == lidx[:, None]
    sidx, new_sig, sig_cnt1 = _batch_dedup(
        cand, pool, state.sigma_cnt, state.sigma_cnt, tol,
        extra_eq=(eq_pool, eq_batch))
    S = state.sigma_pib.shape[0]
    srows = jnp.where(new_sig, sidx, S)
    pad = lambda a, fill=0: jnp.concatenate(  # noqa: E731
        [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
    sigma_pib = pad(state.sigma_pib).at[srows].set(pib_b)[:S]
    sigma_piC = pad(state.sigma_piC).at[srows].set(piC_b)[:S]
    sigma_lidx = pad(state.sigma_lidx).at[srows].set(lidx)[:S]
    sigma_ck = pad(state.sigma_ck).at[srows].set(k)[:S]
    sigma_feas = pad(state.sigma_feas.astype(jnp.int32)).at[srows].set(
        feas.astype(jnp.int32))[:S].astype(bool)
    return state._replace(
        sigma_pib=sigma_pib, sigma_piC=sigma_piC, sigma_lidx=sigma_lidx,
        sigma_ck=sigma_ck, sigma_feas=sigma_feas, sigma_cnt=sig_cnt1)


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
