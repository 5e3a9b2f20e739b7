"""Branch-and-bound MILP/MIQP master (MASTER_TYPE 1 and 7).

The reference hands the master to CPLEX with the configured problem type
(master.c:41 ``solveProblem(..., config.MASTER_TYPE, ...)``; master.c:331
"type of problem: LP, QP, MIP or MIQP"; config.sd:10-11) and lets CPLEX's
MIP machinery enforce first-stage integrality.  Here the MIP machinery is
built in, TPU-style: a host-driven best-first branch-and-bound whose node
relaxations are the existing jitted LP/QP masters, dispatched as ONE
vmapped batch per wave — W open nodes cost one device program, not W
sequential solves.

Correctness invariants:
  * a node's relaxation objective lower-bounds every integer-feasible point
    in the node's box (bound tightening only shrinks the feasible set), so
    pruning on ``relax_obj >= best - eps`` is exact;
  * branching on x_j splits the box into floor/ceil halves that cover all
    integer values, so no integer point is lost;
  * the proximal term of the MIQP master is convex, which is all the bound
    argument needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.config import (
    MASTER_MILP, MASTER_MIQP, SDConfig,
)
from stochasticdecomposition_tpu.core.master import (
    build_and_solve_master, build_and_solve_master_lp,
)
from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState

INT_TOL = 1e-6          # integrality tolerance on relaxation solutions
PRUNE_EPS = 1e-9        # bound-pruning slack


class MIPResult:
    __slots__ = ("x", "obj", "found", "nodes", "waves", "truncated",
                 "uncertified")

    def __init__(self, x, obj, found, nodes, waves, truncated=False,
                 uncertified=0):
        self.x = x            # np [n1] — best integral solution (rounded)
        self.obj = obj        # master objective at x
        self.found = found    # bool: an integral solution was certified
        self.nodes = nodes    # nodes expanded
        self.waves = waves    # device dispatches
        # Node limit hit with open nodes left: the incumbent may be
        # suboptimal (the reference's CPLEX MIP solves to optimality, so a
        # silent cap would be a divergence — "no silent caps").
        self.truncated = truncated
        # Nodes pruned because their relaxation failed to certify EVEN ON
        # RETRY (distinct from integer-infeasible boxes).
        self.uncertified = uncertified


def make_mip_master(pa: ProblemArrays, cfg: SDConfig, *, wave: int = 8,
                    max_nodes: int = 2048):
    """Build the host B&B driver for this problem.  Returns
    ``solve(state) -> MIPResult`` enforcing integrality on the columns
    flagged in ``pa.int1``.

    ``wave`` nodes are relaxed per device dispatch (one vmapped program,
    compiled once); SD masters are small (n1 ~ 10-100, the reference suite's
    first stages), so the tree rarely exceeds a few waves.
    """
    int_idx = np.where(np.asarray(pa.int1))[0]
    if int_idx.size == 0:
        raise ValueError("make_mip_master on a problem with no integer "
                         "first-stage columns")
    n1 = int(pa.c1.shape[0])
    dtype = pa.c1.dtype
    qp = cfg.MASTER_TYPE == MASTER_MIQP
    relax = build_and_solve_master if qp else build_and_solve_master_lp

    @functools.partial(jax.jit, static_argnums=())
    def _solve_wave(state: SDState, lo_b, hi_b):
        def one(lo, hi):
            res = relax(pa, state, state.k, l1=lo, u1=hi)
            return res.x, res.obj, res.ok
        return jax.vmap(one)(lo_b, hi_b)

    # Root box: the problem bounds with integer columns pre-tightened to
    # their integer hull (ceil of lb, floor of ub).
    l_root = np.asarray(pa.l1, np.float64).copy()
    u_root = np.asarray(pa.u1, np.float64).copy()
    l_root[int_idx] = np.ceil(l_root[int_idx] - INT_TOL)
    u_root[int_idx] = np.floor(u_root[int_idx] + INT_TOL)

    def solve(state: SDState) -> MIPResult:
        # (bound, lo, hi, tries) open-node pool; bound = parent relaxation
        # objective (root uses -inf).  Best-first: waves take lowest bounds.
        open_nodes = [(-np.inf, l_root.copy(), u_root.copy(), 0)]
        best_obj = np.inf
        best_x = None
        nodes = 0
        waves = 0
        uncertified = 0

        while open_nodes and nodes < max_nodes:
            open_nodes.sort(key=lambda t: t[0])
            take = open_nodes[:wave]
            open_nodes = open_nodes[wave:]
            # Prune by bound before paying for the solve.
            take = [t for t in take if t[0] < best_obj - PRUNE_EPS]
            if not take:
                continue
            W = len(take)
            lo_b = np.stack([t[1] for t in take] +
                            [take[0][1]] * (wave - W))
            hi_b = np.stack([t[2] for t in take] +
                            [take[0][2]] * (wave - W))
            xs, objs, oks = _solve_wave(
                state, jnp.asarray(lo_b, dtype), jnp.asarray(hi_b, dtype))
            xs = np.asarray(xs, np.float64)
            objs = np.asarray(objs, np.float64)
            oks = np.asarray(oks)
            waves += 1
            for w in range(W):
                nodes += 1
                if not bool(oks[w]):
                    # Uncertified relaxation: on a tightened box this is
                    # USUALLY infeasibility — but master certification also
                    # fails transiently on emulated-f64 backends (the same
                    # event the runner's master_step retry tolerates,
                    # runner.py), and pruning such a node could silently
                    # lose the integral optimum.  Re-enqueue once; only a
                    # second failure prunes, and is counted so the caller
                    # can distinguish "relaxations failed to certify" from
                    # "integer-infeasible".
                    if take[w][3] == 0:
                        open_nodes.append((take[w][0], take[w][1],
                                           take[w][2], 1))
                    else:
                        uncertified += 1
                    continue
                if objs[w] >= best_obj - PRUNE_EPS:
                    continue
                x = xs[w]
                frac = np.abs(x[int_idx] - np.round(x[int_idx]))
                j_rel = int(np.argmax(frac))
                if frac[j_rel] <= INT_TOL:
                    x_int = x.copy()
                    x_int[int_idx] = np.round(x_int[int_idx])
                    best_obj = float(objs[w])
                    best_x = x_int
                    continue
                j = int(int_idx[j_rel])
                lo_w, hi_w = take[w][1], take[w][2]
                xj = x[j]
                dn_hi = hi_w.copy()
                dn_hi[j] = np.floor(xj)
                up_lo = lo_w.copy()
                up_lo[j] = np.ceil(xj)
                if dn_hi[j] >= lo_w[j] - INT_TOL:
                    open_nodes.append((float(objs[w]), lo_w.copy(), dn_hi, 0))
                if up_lo[j] <= hi_w[j] + INT_TOL:
                    open_nodes.append((float(objs[w]), up_lo, hi_w.copy(), 0))

        truncated = bool(open_nodes) and nodes >= max_nodes
        return MIPResult(best_x, best_obj, best_x is not None, nodes, waves,
                         truncated=truncated, uncertified=uncertified)

    return solve
