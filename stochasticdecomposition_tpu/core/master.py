"""Regularized QP master in d-space.

Reference: master.c.  The reference mutates a persistent CPLEX model
(changeEtaCol k/j rescaling at master.c:146-161, RHS lb-shifts at
master.c:163-188, proximal reload at master.c:191-211).  Here the master is a
*pure function* of the cut pool, incumbent and proximal scalar: the QP data
is rebuilt (vectorized) every iteration, which is exactly the eta-rescaling
trick without any solver-state edits — the XLA-friendly formulation.

Variables v = [d ; eta], d = x - incumbent:
    min  c'd + eta + (sigma/2)||d||^2
    s.t. A1 d {sense} b1 - A1 xbar
         (k/ns_j) eta + beta_j'd >= alpha_j - beta_j'xbar + (k/ns_j - 1) lb
         beta_f'd >= alpha_f - beta_f'xbar          (feasibility cuts)
         l - xbar <= d <= u - xbar
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState
from stochasticdecomposition_tpu.ops.qp import solve_qp


class MasterResult(NamedTuple):
    x: jnp.ndarray            # new candidate (incumbent + d)
    eta: jnp.ndarray
    d_norm2: jnp.ndarray      # ||d||^2
    pi_first: jnp.ndarray     # [m1] duals, CPLEX sign convention
    pi_cuts: jnp.ndarray      # [K] cut-row duals (>= 0)
    dj: jnp.ndarray           # [n1] reduced costs (bound duals, zl - zu)
    obj: jnp.ndarray
    ok: jnp.ndarray           # converged flag


def build_and_solve_master(pa: ProblemArrays, state: SDState, k,
                           *, tol: float = 1e-9,
                           l1=None, u1=None) -> MasterResult:
    """``l1``/``u1`` override the first-stage variable bounds — used by the
    branch-and-bound MILP/MIQP master (core/bnb.py) to tighten a node's box."""
    dtype = pa.c1.dtype
    n1 = pa.c1.shape[0]
    m1 = pa.b1.shape[0]
    K = state.cut_mask.shape[0]
    F = state.fcut_mask.shape[0]
    nv = n1 + 1
    kf = jnp.asarray(k, dtype)
    xbar = state.incumb_x

    Q = jnp.zeros((nv, nv), dtype).at[jnp.arange(n1), jnp.arange(n1)].set(
        state.quad_scalar)
    c = jnp.concatenate([pa.c1, jnp.ones(1, dtype)])

    b_shift = pa.b1 - pa.A1 @ xbar

    # --- equality rows (first-stage '=' constraints) ---------------------
    eq_mask = pa.sense1 == 0
    A_eq = jnp.concatenate([pa.A1, jnp.zeros((m1, 1), dtype)], axis=1)
    b_eq = b_shift

    # --- inequality rows, all oriented as G v <= h -----------------------
    # First-stage <= rows keep sign; >= rows flip.
    sgn = jnp.where(pa.sense1 > 0, -1.0, 1.0).astype(dtype)
    G_first = sgn[:, None] * A_eq
    h_first = sgn * b_shift
    m_first = ~eq_mask

    # Cut rows: (k/ns) eta + beta'd >= rhs  ->  -beta'd - (k/ns) eta <= -rhs.
    ns = jnp.maximum(state.cut_ns, 1).astype(dtype)
    eta_coef = kf / ns
    # lb shift (updateRHS, master.c:163-188); vanishes for TRIVIAL lb = 0.
    cut_rhs = state.cut_alpha - state.cut_beta @ xbar + (eta_coef - 1.0) * pa.lb
    G_cut = jnp.concatenate([-state.cut_beta, -eta_coef[:, None]], axis=1)
    h_cut = -cut_rhs

    # Feasibility cut rows: beta'd >= rhs -> -beta'd <= -rhs (no eta).
    f_rhs = state.fcut_alpha - state.fcut_beta @ xbar
    G_f = jnp.concatenate([-state.fcut_beta, jnp.zeros((F, 1), dtype)], axis=1)
    h_f = -f_rhs

    # Bound rows on d (infinite bounds masked off).
    lo_d = (pa.l1 if l1 is None else l1) - xbar
    up_d = (pa.u1 if u1 is None else u1) - xbar
    eye = jnp.eye(n1, dtype=dtype)
    zcol = jnp.zeros((n1, 1), dtype)
    G_up = jnp.concatenate([eye, zcol], axis=1)
    G_lo = jnp.concatenate([-eye, zcol], axis=1)
    up_mask = jnp.isfinite(up_d)
    lo_mask = jnp.isfinite(lo_d)

    # eta floor: while NO optimality cut is active (possible in feasibility
    # mode when the first subproblem was infeasible and its cut skipped),
    # the free eta column would make the master unbounded; pin eta >= lb
    # (the reference never reaches this state without erroring — its eta is
    # free at master.c:434-435 but SDCut aborts on istar < 0, cuts.c:136-139).
    G_eta = jnp.zeros((1, nv), dtype).at[0, n1].set(-1.0)
    h_eta = -pa.lb[None]
    eta_mask = ~jnp.any(state.cut_mask)[None]

    G = jnp.concatenate([G_first, G_cut, G_f, G_up, G_lo, G_eta], axis=0)
    h = jnp.concatenate([h_first, h_cut, h_f,
                         jnp.where(up_mask, up_d, 1.0),
                         jnp.where(lo_mask, -lo_d, 1.0), h_eta])
    gmask = jnp.concatenate([m_first, state.cut_mask, state.fcut_mask,
                             up_mask, lo_mask, eta_mask])

    res = solve_qp(Q, c, A_eq, b_eq, G, h,
                   ineq_mask=gmask, eq_mask=eq_mask, tol=tol)

    d = res.v[:n1]
    eta = res.v[n1]

    # Map duals back to the CPLEX minimization convention the bootstrap test
    # expects (optimal.c:240-338): >= rows positive, <= rows negative,
    # equality rows from the free eq multipliers (pi = -y).
    z = res.z
    z_first = z[:m1]
    pi_first = jnp.where(eq_mask, -res.y,
                         jnp.where(pa.sense1 > 0, z_first, -z_first))
    pi_cuts = z[m1:m1 + K] * state.cut_mask
    z_up = z[m1 + K + F:m1 + K + F + n1]
    z_lo = z[m1 + K + F + n1:m1 + K + F + 2 * n1]
    dj = z_lo - z_up

    return MasterResult(
        x=xbar + d, eta=eta, d_norm2=d @ d,
        pi_first=pi_first, pi_cuts=pi_cuts, dj=dj,
        obj=res.obj, ok=res.converged,
    )


def build_and_solve_master_lp(pa: ProblemArrays, state: SDState,
                              k, *, l1=None, u1=None) -> MasterResult:
    """LP master (MASTER_TYPE=0, master.c:41 with PROB_LP): the plain
    Benders/L-shaped master in x-space — no proximal term, no d-shift.

    The reference's LP branch is vestigial (solveQPMaster would dereference
    the NULL incumbX at master.c:63 and fullTest aborts at optimal.c:104-108),
    so this is the *completed* LP mode: variables [x; eta],

        min  c'x + eta
        s.t. A1 x {sense} b1
             (k/ns_j) eta + beta_j'x >= alpha_j + (k/ns_j - 1) lb
             beta_f'x >= alpha_f
             l <= x <= u,  eta >= lb

    solved by the bounded-variable simplex.  Inactive cut slots become
    all-zero rows with zero rhs (trivially satisfied).  The eta >= lb floor
    replaces the QP path's no-cuts guard and is a valid Benders
    initialization (eta estimates E[h] >= lb)."""
    from stochasticdecomposition_tpu.ops.simplex import (
        STATUS_OPTIMAL, solve_lp,
    )

    dtype = pa.c1.dtype
    n1 = pa.c1.shape[0]
    m1 = pa.b1.shape[0]
    K = state.cut_mask.shape[0]
    F = state.fcut_mask.shape[0]
    nv = n1 + 1
    kf = jnp.asarray(k, dtype)

    ns = jnp.maximum(state.cut_ns, 1).astype(dtype)
    eta_coef = jnp.where(state.cut_mask, kf / ns, 0.0)
    cut_rhs = jnp.where(state.cut_mask,
                        state.cut_alpha + (kf / ns - 1.0) * pa.lb, 0.0)
    cut_beta = jnp.where(state.cut_mask[:, None], state.cut_beta, 0.0)
    f_beta = jnp.where(state.fcut_mask[:, None], state.fcut_beta, 0.0)
    f_rhs = jnp.where(state.fcut_mask, state.fcut_alpha, 0.0)

    D = jnp.concatenate([
        jnp.concatenate([pa.A1, jnp.zeros((m1, 1), dtype)], axis=1),
        jnp.concatenate([cut_beta, eta_coef[:, None]], axis=1),
        jnp.concatenate([f_beta, jnp.zeros((F, 1), dtype)], axis=1),
    ], axis=0)
    b = jnp.concatenate([pa.b1, cut_rhs, f_rhs])
    sense = jnp.concatenate([
        pa.sense1,
        jnp.ones(K, jnp.int32),        # cut rows are >=
        jnp.ones(F, jnp.int32),
    ])
    c = jnp.concatenate([pa.c1, jnp.ones(1, dtype)])
    lo = jnp.concatenate([pa.l1 if l1 is None else l1, pa.lb[None]])
    hi = jnp.concatenate([pa.u1 if u1 is None else u1,
                          jnp.full(1, jnp.inf, dtype)])

    res = solve_lp(D, sense, c, lo, hi, b,
                   max_iter=8 * (D.shape[0] + nv) + 256)
    x = res.y[:n1]
    eta = res.y[n1]
    d = x - state.candid_x

    # solve_lp's duals already follow the CPLEX minimization convention
    # (>= rows nonnegative); cut-row duals feed the eviction slack test.
    pi_first = res.pi[:m1]
    pi_cuts = res.pi[m1:m1 + K] * state.cut_mask

    return MasterResult(
        x=x, eta=eta, d_norm2=d @ d,
        pi_first=pi_first, pi_cuts=pi_cuts, dj=res.dj[:n1],
        obj=res.obj, ok=res.status == STATUS_OPTIMAL,
    )
