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
                     entries: List[BatchEntry]):
    """Returns (compromise_x, avg_x).

    Variables: per replication b, a block [d_b (n1); eta_b].  Objective
    sum_b c'd_b + eta_b + (sigma_bar/2)||d_b||^2 with sigma_bar the averaged
    proximal scalar (compromise.c:216-224).  eta_b >= lb (compromise.c:121).
    """
    B = len(entries)
    n1 = int(pa.c1.shape[0])
    m1 = int(pa.b1.shape[0])
    lb = float(pa.lb)
    A1 = np.asarray(pa.A1)
    b1 = np.asarray(pa.b1)
    sense1 = np.asarray(pa.sense1)
    c1 = np.asarray(pa.c1)
    l1 = np.asarray(pa.l1)
    u1 = np.asarray(pa.u1)

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

    res = solve_qp(jnp.asarray(Q), jnp.asarray(c), jnp.asarray(A),
                   jnp.asarray(bb), jnp.asarray(G), jnp.asarray(h),
                   polish=(nv + len(A) + len(G)) <= 2000, max_iter=100)
    if not bool(res.converged):
        raise RuntimeError("compromise QP failed to converge")

    d0 = np.asarray(res.v)[:n1]
    compromise_x = x0 + d0
    avg_x = np.mean([e.incumb_x for e in entries], axis=0)
    return compromise_x, avg_x
