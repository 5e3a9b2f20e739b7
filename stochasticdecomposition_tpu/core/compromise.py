"""Compromise problem: multi-replication variance-reduced decision.

Reference: compromise.c.  After the replications finish, their first-stage
copies are tied together by equality constraints (addBatchEquality,
compromise.c:285-311) and the cut collections of every replication act on one
common decision; a single QP with the averaged proximal weight is solved
(solveCompromise, compromise.c:249-283).

Instead of the reference's incremental CPLEX model surgery (column/row
appends with renamed labels, compromise.c:31-231), the batch QP is assembled
as one block-structured dense problem and solved by the IPM kernel.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.state import ProblemArrays
from stochasticdecomposition_tpu.ops.qp import solve_qp


@dataclasses.dataclass
class BatchEntry:
    """Per-replication artifacts collected by buildCompromise
    (compromise.c:16-47 / batchSummary, twoSD.h:151-162)."""

    incumb_x: np.ndarray
    k: int
    quad_scalar: float
    obj_lb: float
    cut_alpha: np.ndarray     # [K]
    cut_beta: np.ndarray      # [K, n1]
    cut_ns: np.ndarray        # [K]
    cut_mask: np.ndarray      # [K] bool
    fcut_alpha: np.ndarray    # [F]
    fcut_beta: np.ndarray     # [F, n1]
    fcut_mask: np.ndarray     # [F] bool


def batch_entry_from_state(state) -> BatchEntry:
    return BatchEntry(
        incumb_x=np.asarray(state.incumb_x),
        k=int(state.k),
        quad_scalar=float(state.quad_scalar),
        obj_lb=float(state.incumb_est),
        cut_alpha=np.asarray(state.cut_alpha),
        cut_beta=np.asarray(state.cut_beta),
        cut_ns=np.asarray(state.cut_ns),
        cut_mask=np.asarray(state.cut_mask),
        fcut_alpha=np.asarray(state.fcut_alpha),
        fcut_beta=np.asarray(state.fcut_beta),
        fcut_mask=np.asarray(state.fcut_mask),
    )


def solve_compromise(pa: ProblemArrays, cfg: SDConfig,
                     entries: List[BatchEntry], *,
                     x_lo=None, x_hi=None, _return_obj: bool = False):
    """Returns (compromise_x, avg_x).

    Variables: per replication b, a block [d_b (n1); eta_b].  Objective
    sum_b c'd_b + eta_b + (sigma_bar/2)||d_b||^2 with sigma_bar the averaged
    proximal scalar (compromise.c:216-224).  eta_b >= lb (compromise.c:121).

    ``x_lo``/``x_hi`` override the first-stage variable bounds (applied to
    every replication block — the equality ties make the copies one
    decision); used by the branch-and-bound integer compromise below.
    """
    B = len(entries)
    n1 = int(pa.c1.shape[0])
    m1 = int(pa.b1.shape[0])
    lb = float(pa.lb)
    A1 = np.asarray(pa.A1)
    b1 = np.asarray(pa.b1)
    sense1 = np.asarray(pa.sense1)
    c1 = np.asarray(pa.c1)
    l1 = np.asarray(pa.l1) if x_lo is None else np.asarray(x_lo)
    u1 = np.asarray(pa.u1) if x_hi is None else np.asarray(x_hi)

    blk = n1 + 1
    nv = B * blk
    sigma_bar = float(np.mean([e.quad_scalar for e in entries]))

    Q = np.zeros((nv, nv))
    c = np.zeros(nv)
    for b in range(B):
        s = b * blk
        Q[range(s, s + n1), range(s, s + n1)] = sigma_bar
        c[s:s + n1] = c1
        c[s + n1] = 1.0

    G_rows, h_vals = [], []
    A_rows, b_vals = [], []

    def g_row(vec, rhs):
        G_rows.append(vec)
        h_vals.append(rhs)

    for b, e in enumerate(entries):
        s = b * blk
        xbar = e.incumb_x
        shift = b1 - A1 @ xbar
        for i in range(m1):
            row = np.zeros(nv)
            row[s:s + n1] = A1[i]
            if sense1[i] == 0:
                r = np.zeros(nv)
                r[s:s + n1] = A1[i]
                A_rows.append(r)
                b_vals.append(shift[i])
            elif sense1[i] > 0:     # >=  ->  -row <= -shift
                g_row(-row, -shift[i])
            else:
                g_row(row, shift[i])
        # Optimality cuts: (k_b/ns) eta_b + beta'd_b >= rhs.
        for j in np.where(e.cut_mask)[0]:
            ns = max(int(e.cut_ns[j]), 1)
            coef = e.k / ns
            rhs = e.cut_alpha[j] - e.cut_beta[j] @ xbar + (coef - 1.0) * lb
            row = np.zeros(nv)
            row[s:s + n1] = -e.cut_beta[j]
            row[s + n1] = -coef
            g_row(row, -rhs)
        # Feasibility cuts.
        for j in np.where(e.fcut_mask)[0]:
            rhs = e.fcut_alpha[j] - e.fcut_beta[j] @ xbar
            row = np.zeros(nv)
            row[s:s + n1] = -e.fcut_beta[j]
            g_row(row, -rhs)
        # Bounds on d_b.
        for i in range(n1):
            if np.isfinite(u1[i]):
                row = np.zeros(nv)
                row[s + i] = 1.0
                g_row(row, u1[i] - xbar[i])
            if np.isfinite(l1[i]):
                row = np.zeros(nv)
                row[s + i] = -1.0
                g_row(row, -(l1[i] - xbar[i]))
        # eta_b >= lb.
        row = np.zeros(nv)
        row[s + n1] = -1.0
        g_row(row, -lb)

    # Equality ties (addBatchEquality, compromise.c:285-300):
    #   d_0[j] - d_b[j] = xbar_b[j] - xbar_0[j]   for b = 1..B-1.
    x0 = entries[0].incumb_x
    for b in range(1, B):
        xb = entries[b].incumb_x
        for j in range(n1):
            r = np.zeros(nv)
            r[j] = 1.0
            r[b * blk + j] = -1.0
            A_rows.append(r)
            b_vals.append(xb[j] - x0[j])

    A = np.array(A_rows) if A_rows else np.zeros((0, nv))
    bb = np.array(b_vals) if b_vals else np.zeros(0)
    G = np.array(G_rows)
    h = np.array(h_vals)

    # The compromise QP is the HOST epilogue of the run (SURVEY §2c: "host
    # gather -> one small QP on host 0"; the reference hands it to CPLEX on
    # the host, compromise.c:259).  Pin it to the CPU backend: it is solved
    # once per run, is tiny (B*(n1+1) dense variables), and the TPU's
    # emulated-f64 IPM fails to converge on storm-scale instances where the
    # identical system converges in 12 iterations on CPU (measured r5; the
    # equality-tied block structure drives late-barrier KKT systems past
    # what emulated f64 resolves, and the active-set polish inherits the
    # same ill-conditioned gj_solve).
    import jax

    try:
        _cpu = jax.devices("cpu")[0]
    except RuntimeError:
        _cpu = None
    with jax.default_device(_cpu):
        res = solve_qp(jnp.asarray(Q), jnp.asarray(c), jnp.asarray(A),
                       jnp.asarray(bb), jnp.asarray(G), jnp.asarray(h),
                       polish=(nv + len(A) + len(G)) <= 2000, max_iter=100)
    if _return_obj:
        # B&B node mode: report (x, obj, ok) and let the caller prune — a
        # non-certified node on a tightened box is (almost always) an
        # infeasible box, not an error.
        d0 = np.asarray(res.v)[:n1]
        return x0 + d0, float(res.obj), bool(res.converged)
    if not bool(res.converged):
        raise RuntimeError("compromise QP failed to converge")

    d0 = np.asarray(res.v)[:n1]
    compromise_x = x0 + d0
    avg_x = np.mean([e.incumb_x for e in entries], axis=0)
    return compromise_x, avg_x


def solve_compromise_mip(pa: ProblemArrays, cfg: SDConfig,
                         entries: List[BatchEntry], *,
                         max_nodes: int = 2048):
    """Integer-mode compromise (MASTER_TYPE 1/7): the reference solves the
    batch problem with the configured master type (compromise.c:260), so
    CPLEX enforces first-stage integrality there too.  Host best-first
    branch-and-bound on the common decision x = x0 + d0 over the continuous
    batch-QP relaxation above.  Returns (compromise_x, avg_x) with
    ``compromise_x`` integral on the flagged columns; ``avg_x`` is the plain
    replication average (fractional by nature, reported as-is like the
    reference's batch average)."""
    int_idx = np.where(np.asarray(pa.int1))[0]
    int_tol = 1e-6
    lo = np.asarray(pa.l1, np.float64).copy()
    hi = np.asarray(pa.u1, np.float64).copy()
    lo[int_idx] = np.ceil(lo[int_idx] - int_tol)
    hi[int_idx] = np.floor(hi[int_idx] + int_tol)

    open_nodes = [(-np.inf, lo, hi, 0)]
    best_obj, best_x = np.inf, None
    nodes = 0
    uncertified = 0
    while open_nodes and nodes < max_nodes:
        open_nodes.sort(key=lambda t: t[0])
        bound, lo_n, hi_n, tries = open_nodes.pop(0)
        if bound >= best_obj - 1e-9:
            continue
        nodes += 1
        x, obj, ok = solve_compromise(pa, cfg, entries, x_lo=lo_n, x_hi=hi_n,
                                      _return_obj=True)
        if not ok:
            # A transiently unconverged batch QP is not proof the box is
            # integer-infeasible (the run's final deliverable would be
            # silently lost): retry the node once; only a repeat failure
            # prunes, and is counted for the terminal diagnostic.
            if tries == 0:
                open_nodes.append((bound, lo_n, hi_n, 1))
            else:
                uncertified += 1
            continue
        if obj >= best_obj - 1e-9:
            continue
        frac = np.abs(x[int_idx] - np.round(x[int_idx]))
        j_rel = int(np.argmax(frac)) if int_idx.size else 0
        if int_idx.size == 0 or frac[j_rel] <= int_tol:
            xi = x.copy()
            xi[int_idx] = np.round(xi[int_idx])
            best_obj, best_x = obj, xi
            continue
        j = int(int_idx[j_rel])
        dn = hi_n.copy(); dn[j] = np.floor(x[j])
        up = lo_n.copy(); up[j] = np.ceil(x[j])
        if dn[j] >= lo_n[j] - int_tol:
            open_nodes.append((obj, lo_n.copy(), dn, 0))
        if up[j] <= hi_n[j] + int_tol:
            open_nodes.append((obj, up, hi_n.copy(), 0))

    if best_x is None:
        if uncertified:
            raise RuntimeError(
                f"integer compromise: batch-QP relaxations failed to "
                f"converge ({uncertified} of {nodes} nodes uncertified "
                "after retry) — not proof of integer infeasibility")
        raise RuntimeError(
            f"integer compromise: no integer-feasible point found "
            f"({nodes} nodes explored)")
    avg_x = np.mean([e.incumb_x for e in entries], axis=0)
    return best_x, avg_x
