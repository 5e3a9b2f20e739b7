"""Batched bounded-variable revised simplex in JAX.

TPU-native replacement for the CPLEX primal-simplex calls of the reference
(solveProblem with presolve off at subprob.c:43-45): every SD subproblem solve
needs not just the objective but the optimal *basis* — duals, reduced costs,
column status — because the stochastic-updates machinery (stocUpdate.c:14-133)
and the random-cost basis decomposition (randCost.c) consume them.

Design notes (TPU-first):
  * Everything is static-shape: the LP  min c'y  s.t. D y {<=,=,>=} b, l<=y<=u
    is converted once to the computational standard form  A z = b, lo<=z<=up
    with A = [D | I] (one slack per row; slack bounds encode the row sense).
  * Phase 1 uses the composite method: while any basic variable violates its
    bound, price with the infeasibility gradient and pivot; infeasible basics
    block at the bound they violate.  Phase 2 is the textbook bounded-variable
    primal simplex with Dantzig pricing and a Bland fallback on stalls
    (guarantees finiteness under degeneracy).
  * The basis inverse is maintained explicitly (product-form rank-1 updates)
    and refactorized periodically with a dense solve — dense [m,m] linear
    algebra maps straight onto the MXU and vmaps cleanly across a scenario
    batch, which is how the out-of-sample evaluator (evaluate.c:49-103) and
    batched-sampling mode get their throughput.
  * Statuses/columns statuses mirror what the reference reads back from CPLEX
    (getBasis/getDual/getDualSlacks; AT_LOWER / BASIC / AT_UPPER / FREE).

The whole solve is one `lax.while_loop` body, so `jax.vmap(solve_lp)` yields a
batched LP solver with per-instance convergence masking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from stochasticdecomposition_tpu.ops.linalg import lu_refine_inv

# Column / row status codes (mirror CPLEX's CPX_AT_LOWER etc. so that the
# encode/dedup logic of the reference, randCost.c:171-172, carries over).
AT_LOWER = 0
BASIC = 1
AT_UPPER = 2
FREE_NB = 3

STATUS_OPTIMAL = 0
STATUS_INFEASIBLE = 1
STATUS_UNBOUNDED = 2
STATUS_ITER_LIMIT = 3

# Maximum lanes per vmapped solve_lp DISPATCH.  On the TPU backend, vmap
# widths >= 1024 of this solver on ssn-shape LPs (175x881) deterministically
# miscompile: lanes terminate at feasible but wildly suboptimal vertices
# with OPTIMAL status and self-consistent (wrong-program) duals, while the
# identical inputs solved at <= 512 lanes — or as lax.map chunks of 512
# inside ONE jit — are correct at the same throughput (the kernel is
# compute-saturated well below 512 lanes).  Isolation: batched
# jnp.linalg.inv and the pricing/ftran GEMVs are each correct at 2048 lanes,
# and disabling TPU rematerialization does not change the wrong results, so
# this is a whole-program compiler defect, not a kernel of ours.  Batch
# entry points (core/evaluate.make_eval_batch, scripts/lp_scaling) chunk
# wider batches with lax.map at this width.
MAX_VMAP_LANES = 512

# HBM guard for batched solves at LARGE row counts.  A solve_lp batch's
# peak HBM scales as lanes * m^2: the basis inverse plus the
# refactorization-scan's remat copies dominate, and XLA keeps ~64 live
# copies at peak (measured: a 512-lane m=528 f32 eval program demanded
# 36.6 GB against 15.75 GB HBM — the SD loop only ever survived storm
# shape because SAMPLE_INCREMENT=64).  mem_lane_cap derives the widest
# power-of-two dispatch width that keeps that peak under
# LANE_HBM_BUDGET; wider batches run as lax.map chunks of this width
# (vmap_chunked), sequentially reusing the buffers.
LANE_HBM_BUDGET = 10 * 1024**3
_LANE_HBM_COPIES = 64

# Staged batched-solve parameters (kernel-fault guard, RESULTS §4b.2) —
# canonical values shared by the SD loop (core/step.py) and the
# out-of-sample evaluator (core/evaluate.py).  Stage 1 bounds the pivot
# budget at full batch width (64-lane x ~5300-pivot storm programs are
# proven safe; faults sat near the ~7200-pivot cap); stage 2 finishes
# stragglers at a lane width proven safe for 5000+-pivot solves.
STAGE1_PIVOTS = 2048
STAGE2_LANES = 8
# Stage-1 width proven at the pivot budget on device (stormhvlike SI=64
# certified stops); staged batch paths clamp their dispatch width here.
STAGE1_MAX_LANES = 64
# Row count above which batched solve paths auto-enable the staged guard
# (storm-class shapes; the fault regime was never observed below this).
STAGED_MIN_ROWS = 384


def mem_lane_cap(m: int, dtype_bytes: int = 4) -> int:
    """Widest safe vmap width for an m-row solve_lp batch: power of two in
    [8, MAX_VMAP_LANES] with lanes * m^2 * dtype_bytes * ~64 live copies
    under LANE_HBM_BUDGET.  528-row (storm) f32 -> 128; <=256-row shapes
    are uncapped (MAX_VMAP_LANES)."""
    per_lane = _LANE_HBM_COPIES * dtype_bytes * m * m
    cap = max(8, min(MAX_VMAP_LANES, int(LANE_HBM_BUDGET // max(per_lane, 1))))
    return 1 << (cap.bit_length() - 1)


def vmap_chunked(fn, xs, max_lanes: int | None = None):
    """``jax.vmap(fn)(xs)`` with the dispatch width capped at ``max_lanes``.

    ``xs`` is a pytree whose leaves share the leading batch axis.  Batches
    wider than ``max_lanes`` run as ``lax.map`` over padded chunks inside
    the SAME jitted program — the documented defense against the
    MAX_VMAP_LANES whole-program miscompilation, at identical throughput
    (the solver saturates the chip well below the cap).  EVERY code path
    that vmaps ``solve_lp`` over a user-controlled width must go through
    this helper (or replicate its chunking): core/step.py's SD subproblem
    batch, core/evaluate.make_eval_batch, parallel/mesh.make_sharded_eval
    and the measurement scripts all do.
    """
    if max_lanes is None:
        # Resolved at call time so tests can shrink the cap to exercise
        # the chunked path on tiny batches.
        max_lanes = MAX_VMAP_LANES
    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    if n <= max_lanes:
        return jax.vmap(fn)(xs)
    n_chunks = -(-n // max_lanes)
    pad = n_chunks * max_lanes - n

    def _pad(a):
        if pad:
            a = jnp.concatenate([a, a[:pad]])
        return a.reshape((n_chunks, max_lanes) + a.shape[1:])

    out = lax.map(jax.vmap(fn), jax.tree_util.tree_map(_pad, xs))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_chunks * max_lanes,) + a.shape[2:])[:n], out)


_BIG = jnp.inf


class StandardForm(NamedTuple):
    """A z = b with bounds; z = [structural y (n) | slacks s (m)]."""

    A: jnp.ndarray        # [m, n + m]
    b: jnp.ndarray        # [m]
    c: jnp.ndarray        # [n + m] (slack costs are 0)
    lo: jnp.ndarray       # [n + m]
    up: jnp.ndarray       # [n + m]
    n: int                # number of structural columns


class LPResult(NamedTuple):
    status: jnp.ndarray       # int32 scalar
    obj: jnp.ndarray          # objective value (c'y)
    y: jnp.ndarray            # [n] primal solution (structural)
    pi: jnp.ndarray           # [m] row duals; sign convention: GE rows >= 0,
    #                           LE rows <= 0 (matches CPLEX minimization duals)
    dj: jnp.ndarray           # [n] reduced costs of structural columns
    cstat: jnp.ndarray        # [n] column status (AT_LOWER/BASIC/AT_UPPER/FREE_NB)
    rstat: jnp.ndarray        # [m] slack status
    basis: jnp.ndarray        # [m] basic variable index per row (into n+m)
    binv: jnp.ndarray         # [m, m] basis inverse (for the randCost path,
    #                           reference getBasisInvRow/getBasisInvACol)
    iters: jnp.ndarray        # iterations used
    farkas: jnp.ndarray       # [m] dual ray certificate when infeasible
    #                           (satisfies: ray'D <= 0 over free range of y,
    #                            ray'b > 0); zeros otherwise.



def _mm(a, b):
    """Matmul at HIGHEST precision: pivoting decisions are sign tests on
    reduced costs, and under vmap these matvecs become MXU matmuls that
    default to bf16 passes — enough error to stall the simplex.  Pinned here
    so the kernel is correct regardless of jax_default_matmul_precision."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

def make_standard_form(D, sense, d, l, u) -> StandardForm:
    """Build [D | I] z = b standard form; slack bounds encode row senses.

    sense: +1 (>=), 0 (=), -1 (<=) per row — see smps.core.
    For '<=' rows the slack is in [0, inf); '>=' rows in (-inf, 0]; '=' fixed 0.
    """
    m, n = D.shape
    A = jnp.concatenate([D, jnp.eye(m, dtype=D.dtype)], axis=1)
    slack_lo = jnp.where(sense > 0, -_BIG, 0.0).astype(D.dtype)
    slack_up = jnp.where(sense < 0, _BIG, 0.0).astype(D.dtype)
    lo = jnp.concatenate([l, slack_lo])
    up = jnp.concatenate([u, slack_up])
    c = jnp.concatenate([d, jnp.zeros(m, dtype=d.dtype)])
    return StandardForm(A=A, b=jnp.zeros(m, dtype=d.dtype), c=c, lo=lo, up=up, n=n)


class _State(NamedTuple):
    basis: jnp.ndarray        # [m] int32
    in_basis: jnp.ndarray     # [nt] bool
    at_upper: jnp.ndarray     # [nt] bool (meaningful for nonbasic only)
    binv: jnp.ndarray         # [m, m]
    xb: jnp.ndarray           # [m] basic values
    gamma: jnp.ndarray        # [nt] Devex reference weights
    it: jnp.ndarray           # int32 total iterations
    stall: jnp.ndarray        # int32 consecutive degenerate pivots
    done: jnp.ndarray        # bool
    status: jnp.ndarray       # int32


def _nonbasic_values(sf: StandardForm, at_upper, in_basis):
    """Value assumed by each nonbasic variable (at a finite bound, else 0)."""
    lo, up = sf.lo, sf.up
    v_lower = jnp.where(jnp.isfinite(lo), lo, jnp.where(jnp.isfinite(up), up, 0.0))
    v_upper = jnp.where(jnp.isfinite(up), up, jnp.where(jnp.isfinite(lo), lo, 0.0))
    vals = jnp.where(at_upper, v_upper, v_lower)
    return jnp.where(in_basis, 0.0, vals)


def _certify_optimal(status, dj, in_basis, at_upper, lo, up, c, tol):
    """Demote claimed-OPTIMAL lanes whose clean-refactorization reduced
    costs violate dual feasibility by far more than pivot-tolerance drift.

    Defense-in-depth for the full (non-lite) path, where dj already comes
    from an independent f64 refactorization of the final basis — the check
    costs only comparisons.  It catches loop-carry corruption (a basis
    left at a genuinely suboptimal vertex shows order-1 dual
    infeasibility) and tolerance-level Devex/Harris termination slips.
    NOTE: it cannot catch the wide-vmap whole-program miscompilation
    documented at MAX_VMAP_LANES (there the duals are self-consistent with
    the corrupted program); the lane-width cap is the defense for that.
    Demoted lanes get ITER_LIMIT, which every caller already treats as
    "lane not usable" (the evaluator drops it, the SD loop fails loudly).
    The threshold sits far above legitimate refactorization drift, so
    healthy lanes are never demoted (tested across the scipy-parity
    suite).
    """
    ctol = jnp.asarray(
        jnp.maximum(1e-3, 1e3 * tol) * (1.0 + jnp.max(jnp.abs(c))), dj.dtype)
    fixed = (up - lo) <= tol
    free_nb = ~in_basis & ~jnp.isfinite(lo) & ~jnp.isfinite(up)
    at_lo = ~in_basis & ~fixed & (~at_upper | free_nb)
    at_up = ~in_basis & ~fixed & (at_upper | free_nb)
    viol = (at_lo & (dj < -ctol)) | (at_up & (dj > ctol))
    dual_ok = ~jnp.any(viol)
    return jnp.where((status == STATUS_OPTIMAL) & ~dual_ok,
                     jnp.int32(STATUS_ITER_LIMIT), status)


def _refactorize(sf: StandardForm, basis):
    B = jnp.take(sf.A, basis, axis=1)                       # [m, m]
    if B.dtype == jnp.float32:
        # XLA's LU-based inverse is a single fused op on TPU for f32.
        return jnp.linalg.inv(B)
    # f64: f32 LU seed + Newton refinement — parallel MXU matmuls instead
    # of gj_inv's m sequential elimination steps (dominant latency at
    # storm scale; see ops/linalg.lu_refine_inv).
    return lu_refine_inv(B)


def _compute_xb(sf: StandardForm, binv, basis, xn_full):
    rhs_eff = sf.b - _mm(sf.A, xn_full)
    return _mm(binv, rhs_eff)


def solve_lp(D, sense, d, l, u, b, *, max_iter: int = 0, tol: float = 1e-9,
             refac_every: int | None = None, stall_limit: int = 24,
             pivot_dtype=None, lite: bool = False,
             partial_pricing: bool = False, pp_window: int = 16,
             pp_cands: int = 256,
             init_basis=None, init_at_upper=None) -> LPResult:
    """Solve  min d'y  s.t.  D y {sense} b,  l <= y <= u.

    Pure function of static-shape arrays — jit/vmap friendly.  ``max_iter=0``
    derives a cap of 4*(m+n)+64.  ``refac_every=None`` derives the
    refactorization cadence from the row count: max(64, min(512, m // 4)).
    Measured on device at storm shape (m=528, 64 f32 lanes, cold): the
    refactorization costs ~29 pivot-equivalents, so the old fixed 64
    cadence spent ~31%% of the wall refactorizing — cadence 128-512 is
    20-36%% faster on long cold solves with unchanged pivot counts and
    objectives (scripts/lp_scaling.py --refac-sweep), while short warm
    solves (~300 pivots) are cadence-neutral at m//4.

    ``pivot_dtype``: run the pivoting loop in a cheaper dtype (float32 hits
    the MXU on TPU instead of emulated f64) while the final basis
    refactorization, duals and reduced costs are computed in the input dtype.
    Pivot decisions are discrete, so for well-scaled problems the chosen
    basis matches; use for the statistical evaluation path where a rare
    slightly-suboptimal basis is tolerable.

    ``lite``: skip the final clean refactorization in the output dtype and
    report objective/primal/duals straight from the pivot-loop state.  Saves
    an O(m) sequential Gauss-Jordan pass per solve; for the out-of-sample
    evaluator (evaluate.c:49-103), which consumes only (obj, status), the
    f32-state objective recomputed against the f64 cost vector is plenty.

    Loop structure (the TPU-critical bit): pivots run in an inner
    ``fori_loop`` of ``refac_every`` product-form steps with finished lanes
    masked, and the outer ``while_loop`` refactorizes ONCE per chunk.  A
    naive per-iteration ``lax.cond`` refactorization would execute BOTH
    branches on every pivot under ``vmap`` (cond lowers to select), paying an
    O(m)-sequential-step Gauss-Jordan inversion per pivot — measured ~40x
    slower on an 80x240 batch.
    """
    out_dtype = jnp.result_type(D.dtype, jnp.float32)
    dtype = jnp.dtype(pivot_dtype) if pivot_dtype is not None else out_dtype
    if pivot_dtype is not None and tol < 1e-6 and dtype == jnp.float32:
        tol = 1e-5
    D64 = D.astype(out_dtype)
    d64 = d.astype(out_dtype)
    l64 = l.astype(out_dtype)
    u64 = u.astype(out_dtype)
    b64 = b.astype(out_dtype)
    D = D.astype(dtype)
    d = d.astype(dtype)
    l = l.astype(dtype)
    u = u.astype(dtype)
    b = b.astype(dtype)
    m, n = D.shape
    nt = n + m
    if max_iter == 0:
        max_iter = 4 * (m + n) + 64
    if refac_every is None:
        refac_every = max(64, min(512, m // 4))

    A = jnp.concatenate([D, jnp.eye(m, dtype=dtype)], axis=1)
    slack_lo = jnp.where(sense > 0, -_BIG, 0.0).astype(dtype)
    slack_up = jnp.where(sense < 0, _BIG, 0.0).astype(dtype)
    lo = jnp.concatenate([l, slack_lo])
    up = jnp.concatenate([u, slack_up])
    c = jnp.concatenate([d, jnp.zeros(m, dtype=dtype)])
    sf = StandardForm(A=A, b=b, c=c, lo=lo, up=up, n=n)

    col_ids = jnp.arange(nt, dtype=jnp.int32)

    # ---- initial basis: warm start or all-slack ---------------------------
    # A warm basis (the previous SD subproblem's optimal basis; the LP data
    # differ only in rhs/cost, so the basis matrix stays nonsingular) enters
    # through phase 1: basics violating bounds under the new rhs are priced
    # by the composite infeasibility gradient — the standard primal restart.
    if init_basis is None:
        basis0 = jnp.arange(n, n + m, dtype=jnp.int32)
        in_basis0 = jnp.concatenate([jnp.zeros(n, bool), jnp.ones(m, bool)])
        # nonbasics start at lower if finite else upper else value 0 (free).
        at_upper0 = ~jnp.isfinite(lo) & jnp.isfinite(up)
        binv0 = jnp.eye(m, dtype=dtype)
    else:
        basis_w = init_basis.astype(jnp.int32)
        in_basis_w = jnp.zeros(nt, bool).at[basis_w].set(True)
        at_upper_w = (jnp.asarray(init_at_upper, bool) & ~in_basis_w
                      if init_at_upper is not None
                      else (~jnp.isfinite(lo) & jnp.isfinite(up)) & ~in_basis_w)
        binv_w = _refactorize(sf, basis_w)
        # Singularity guard: a stale/ill-conditioned warm basis can invert to
        # non-finite values (especially on the f32 jnp.linalg.inv path), which
        # would NaN-poison xb and terminate the lane "optimal" with a NaN
        # objective.  Demote such lanes to the cold all-slack start.
        warm_ok = jnp.all(jnp.isfinite(binv_w))
        basis_c = jnp.arange(n, n + m, dtype=jnp.int32)
        in_basis_c = jnp.concatenate([jnp.zeros(n, bool), jnp.ones(m, bool)])
        at_upper_c = ~jnp.isfinite(lo) & jnp.isfinite(up)
        basis0 = jnp.where(warm_ok, basis_w, basis_c)
        in_basis0 = jnp.where(warm_ok, in_basis_w, in_basis_c)
        at_upper0 = jnp.where(warm_ok, at_upper_w, at_upper_c)
        binv0 = jnp.where(warm_ok, binv_w, jnp.eye(m, dtype=dtype))
    xn0 = _nonbasic_values(sf, at_upper0, in_basis0)
    xb0 = _compute_xb(sf, binv0, basis0, xn0)

    state0 = _State(
        basis=basis0, in_basis=in_basis0, at_upper=at_upper0,
        binv=binv0, xb=xb0,
        gamma=jnp.ones(nt, dtype=dtype),
        it=jnp.int32(0), stall=jnp.int32(0), done=jnp.bool_(False),
        status=jnp.int32(STATUS_OPTIMAL),
    )

    big_ratio = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)

    def body(st: _State) -> _State:
        basis, in_basis, at_upper, binv, xb = (
            st.basis, st.in_basis, st.at_upper, st.binv, st.xb)

        lo_b = jnp.take(lo, basis)
        up_b = jnp.take(up, basis)
        viol_lo = xb < lo_b - tol
        viol_hi = xb > up_b + tol
        infeasible_now = viol_lo | viol_hi
        in_phase1 = jnp.any(infeasible_now)

        # Pricing vector: phase-1 infeasibility gradient or real costs.
        cb1 = jnp.where(viol_lo, -1.0, jnp.where(viol_hi, 1.0, 0.0)).astype(dtype)
        cb2 = jnp.take(c, basis)
        cb = jnp.where(in_phase1, cb1, cb2)
        piv = _mm(cb, binv)                                 # [m] simplex multipliers
        # Reduced costs: phase-1 nonbasic cost is 0; phase-2 cost is c_j.
        red = jnp.where(in_phase1, 0.0, c) - _mm(piv, A)      # [nt]

        # Eligibility: nonbasic at lower wants red<-tol (increase), at upper
        # wants red>tol (decrease); free nonbasics may move either way.
        free_nb = ~in_basis & ~jnp.isfinite(lo) & ~jnp.isfinite(up)
        not_fixed = (up - lo) > tol
        elig_inc = ~in_basis & not_fixed & (~at_upper | free_nb) & (red < -tol)
        elig_dec = ~in_basis & not_fixed & (at_upper | free_nb) & (red > tol)
        elig = elig_inc | elig_dec
        # Devex pricing (Forrest-Goldfarb): red^2 / reference weight.  Plain
        # Dantzig (|red|) needs several times more pivots on the degenerate
        # dispatch-style recourse LPs of the benchmark suite.
        score = jnp.where(elig, red * red / st.gamma, -1.0)

        use_bland = st.stall >= stall_limit
        bland_key = jnp.where(elig, -col_ids, -(nt + 1))
        j_dantzig = jnp.argmax(score)
        j_bland = jnp.argmax(bland_key)
        j = jnp.where(use_bland, j_bland, j_dantzig).astype(jnp.int32)
        any_elig = jnp.any(elig)

        # Termination when no eligible column.
        #   phase-1 active  -> LP infeasible (composite phase 1 minimized).
        #   otherwise       -> optimal.
        term_status = jnp.where(in_phase1, STATUS_INFEASIBLE, STATUS_OPTIMAL)

        # Direction: +1 if entering increases, -1 if it decreases.
        dir_ = jnp.where(jnp.take(elig_inc, j), 1.0, -1.0).astype(dtype)

        w = _mm(binv, A[:, j])                                # [m]
        # Basic movement per unit t: xb <- xb - t * dir * w.
        delta = -dir_ * w

        # --- Harris two-pass ratio test ----------------------------------
        # Feasible basics block at the bound they move toward.  Infeasible
        # basics block at the bound they violate when moving toward it
        # (becoming feasible there) and do NOT block when moving away from it
        # (the phase-1 pricing already accounts for the worsening).
        #
        # Pass 1 relaxes each blocking BOUND by the feasibility tolerance
        # (per-row scaled by |delta|, the Harris scheme) to find the relaxed
        # maximum step; pass 2 picks, among rows whose exact ratio is within
        # the relaxed step, the one with the LARGEST |pivot element| — the
        # numerically stable choice on degenerate/ill-scaled LPs, where a
        # plain min-ratio rule is forced onto near-zero pivots.
        moving_up = delta > tol
        moving_dn = delta < -tol
        upper_target = jnp.where(viol_lo, lo_b,
                                 jnp.where(viol_hi, _BIG, up_b))
        lower_target = jnp.where(viol_hi, up_b,
                                 jnp.where(viol_lo, -_BIG, lo_b))
        r_up = jnp.where(moving_up & jnp.isfinite(upper_target),
                         (upper_target - xb) / jnp.where(moving_up, delta, 1.0),
                         big_ratio)
        r_dn = jnp.where(moving_dn & jnp.isfinite(lower_target),
                         (lower_target - xb) / jnp.where(moving_dn, delta, 1.0),
                         big_ratio)
        ratios = jnp.minimum(r_up, r_dn)
        ratios = jnp.maximum(ratios, 0.0)   # numerical guard on tiny negatives

        feas_tol = jnp.asarray(max(tol, 1e-9), dtype)
        r_up_rel = jnp.where(
            moving_up & jnp.isfinite(upper_target),
            (upper_target - xb + feas_tol) / jnp.where(moving_up, delta, 1.0),
            big_ratio)
        r_dn_rel = jnp.where(
            moving_dn & jnp.isfinite(lower_target),
            (lower_target - xb - feas_tol) / jnp.where(moving_dn, delta, 1.0),
            big_ratio)
        theta_rel = jnp.maximum(jnp.min(jnp.minimum(r_up_rel, r_dn_rel)), 0.0)

        # Entering variable's own bound-to-bound flip distance.
        span_j = jnp.take(up, j) - jnp.take(lo, j)
        flip_ratio = jnp.where(jnp.isfinite(span_j), span_j, big_ratio)

        # Pass 2: stable leaving row among the relaxed candidates.
        cand = ratios <= theta_rel
        leave_score = jnp.where(cand, jnp.abs(w), -1.0)
        r_leave = jnp.argmax(leave_score).astype(jnp.int32)
        min_basic_ratio = jnp.where(jnp.any(cand),
                                    jnp.take(ratios, r_leave), big_ratio)

        t_star = jnp.minimum(min_basic_ratio, flip_ratio)
        unbounded = (t_star >= big_ratio) & ~in_phase1
        # In phase 1 an unbounded improving ray cannot persist (violated
        # basics provide finite blocks); guard anyway.
        stuck = (t_star >= big_ratio) & in_phase1

        do_flip = flip_ratio < min_basic_ratio - tol

        # --- apply the step --------------------------------------------
        xb_new = xb + t_star * delta
        # Bound flip: entering stays nonbasic, switches bound.
        at_upper_flip = at_upper.at[j].set(~jnp.take(at_upper, j))

        # Basis change: entering j becomes basic in row r_leave.
        leave_var = jnp.take(basis, r_leave)
        # Leaving variable goes to the bound it blocked at.
        leave_delta = jnp.take(delta, r_leave)
        leave_to_upper = leave_delta > 0
        # (if it was an infeasible-below basic blocking at lo while moving up,
        # leave_to_upper is True but the block target was lo; recompute:)
        blocked_at = jnp.where(leave_delta > 0,
                               jnp.take(upper_target, r_leave),
                               jnp.take(lower_target, r_leave))
        leave_is_upper = jnp.abs(blocked_at - jnp.take(up, leave_var)) <= \
            jnp.abs(blocked_at - jnp.take(lo, leave_var))

        basis_new = basis.at[r_leave].set(j)
        in_basis_new = in_basis.at[j].set(True).at[leave_var].set(False)
        at_upper_new = at_upper.at[leave_var].set(leave_is_upper).at[j].set(False)

        # Devex weight update: pivot row alpha = e_r' Binv A over all
        # columns; for nonbasic j, gamma_j <- max(gamma_j, (a_j/a_q)^2 g_q);
        # the leaving variable re-enters the nonbasic set with
        # max(g_q / a_q^2, 1).  Reset to the reference framework when the
        # weights outgrow their useful dynamic range.
        w_r0 = jnp.take(w, r_leave)
        safe_aq = jnp.where(jnp.abs(w_r0) < 1e-12, 1.0, w_r0)
        alpha_row = _mm(binv[r_leave], A)                    # [nt]
        g_q = jnp.take(st.gamma, j)
        cand_g = jnp.square(alpha_row / safe_aq) * g_q
        gamma_piv = jnp.maximum(st.gamma, cand_g)
        gamma_piv = gamma_piv.at[leave_var].set(
            jnp.maximum(g_q / jnp.square(safe_aq), 1.0))
        gamma_piv = jnp.where(jnp.max(gamma_piv) > 1e8,
                              jnp.ones_like(gamma_piv), gamma_piv)

        # Product-form update of the inverse: E = I - (w - e_r)/w_r * e_r'.
        w_r = jnp.take(w, r_leave)
        safe_wr = jnp.where(jnp.abs(w_r) < 1e-12, 1.0, w_r)
        eta = -w / safe_wr
        eta = eta.at[r_leave].set(1.0 / safe_wr)
        binv_row_r = binv[r_leave]
        binv_new = binv + jnp.outer(eta - jnp.eye(m, dtype=dtype)[:, r_leave],
                                    binv_row_r)
        # Entering variable's basic value.
        x_j_old = jnp.take(_nonbasic_values(sf, at_upper, in_basis), j)
        xb_pivot = xb_new.at[r_leave].set(x_j_old + dir_ * t_star)

        # Select flip vs pivot vs nothing.
        def _on_flip():
            return basis, in_basis, at_upper_flip, binv, xb_new, st.gamma
        def _on_pivot():
            return (basis_new, in_basis_new, at_upper_new, binv_new,
                    xb_pivot, gamma_piv)
        basis2, in_basis2, at_upper2, binv2, xb2, gamma2 = lax.cond(
            do_flip, _on_flip, _on_pivot)

        degen = t_star <= tol
        stall_new = jnp.where(degen, st.stall + 1, jnp.int32(0))

        finished = ~any_elig | unbounded | stuck
        status_new = jnp.where(
            ~any_elig, term_status,
            jnp.where(unbounded, STATUS_UNBOUNDED,
                      jnp.where(stuck, STATUS_INFEASIBLE, st.status)))

        # Keep the pre-step state when this step finished the lane (the step
        # is meaningless) OR when the lane was already done before the step
        # (finished lanes ride along masked inside the chunked fori_loop).
        keep = finished | st.done
        return _State(
            basis=jnp.where(keep, basis, basis2),
            in_basis=jnp.where(keep, in_basis, in_basis2),
            at_upper=jnp.where(keep, at_upper, at_upper2),
            binv=jnp.where(keep, binv, binv2),
            xb=jnp.where(keep, xb, xb2),
            gamma=jnp.where(keep, st.gamma, gamma2),
            it=jnp.where(st.done, st.it, st.it + 1),
            stall=jnp.where(st.done, st.stall, stall_new),
            done=st.done | finished,
            status=jnp.where(st.done, st.status,
                             status_new).astype(jnp.int32),
        )

    # Chunk length: ~one refactorization per m pivots (standard practice),
    # floored so tiny LPs don't refactorize constantly and capped by
    # refac_every so drift stays controlled.  The while-loop exit check only
    # happens between chunks, so small chunks also stop near-converged
    # batches sooner.
    chunk = max(8, min(refac_every, m))

    def outer_body(st: _State) -> _State:
        # `chunk` product-form pivots, then ONE batched refactorization
        # + xb recompute to control drift (amortizes the O(m)-sequential-step
        # Gauss-Jordan across the whole chunk; see docstring).
        st = lax.fori_loop(0, chunk, lambda _, s: body(s), st)
        binv_ = _refactorize(sf, st.basis)
        xn_full = _nonbasic_values(sf, st.at_upper, st.in_basis)
        xb_ = _compute_xb(sf, binv_, st.basis, xn_full)
        return st._replace(binv=binv_, xb=xb_)

    def cond(st: _State):
        return ~st.done & (st.it < max_iter)

    # ---- partial pricing (opt-in): candidate-list Devex -----------------
    # At suite scale the two full-width [m, nt] GEMVs — pricing and the
    # Devex weight row — are ~72% of per-pivot flops (storm: 4.9 of 6.8
    # MFLOP).  Partial pricing refreshes a top-NC candidate set by FULL
    # pricing every ``pp_window`` pivots and restricts both GEMVs to the
    # gathered [m, NC] candidate block in between (the classic partial /
    # candidate-list scheme).  Correctness invariants:
    #   * termination ("no eligible column" -> OPTIMAL/INFEASIBLE) is
    #     decided ONLY at refresh points, where pricing is full-width —
    #     a lane with no eligible CANDIDATE merely idles to the next
    #     refresh (bounded by pp_window);
    #   * unboundedness/phase-1 stuckness found on a candidate column are
    #     global certificates and terminate immediately;
    #   * non-candidate Devex weights go stale (standard for the scheme);
    #     the 1e8 reset guard is unchanged.
    if partial_pricing:
        NC = min(pp_cands, nt)
        win = max(1, min(pp_window, chunk))
        n_mini = max(1, chunk // win)
        neg_big = jnp.asarray(-jnp.finfo(dtype).max / 8, dtype)

        def _phase_piv(st):
            lo_b = jnp.take(lo, st.basis)
            up_b = jnp.take(up, st.basis)
            viol_lo = st.xb < lo_b - tol
            viol_hi = st.xb > up_b + tol
            in_phase1 = jnp.any(viol_lo | viol_hi)
            cb1 = jnp.where(viol_lo, -1.0,
                            jnp.where(viol_hi, 1.0, 0.0)).astype(dtype)
            cb = jnp.where(in_phase1, cb1, jnp.take(c, st.basis))
            piv = _mm(cb, st.binv)
            return in_phase1, piv, viol_lo, viol_hi, lo_b, up_b

        def _refresh(st):
            """Full pricing: termination decision + new candidate set."""
            in_phase1, piv, _, _, _, _ = _phase_piv(st)
            red = jnp.where(in_phase1, 0.0, c) - _mm(piv, A)
            free_nb = ~st.in_basis & ~jnp.isfinite(lo) & ~jnp.isfinite(up)
            not_fixed = (up - lo) > tol
            elig_inc = ~st.in_basis & not_fixed & \
                (~st.at_upper | free_nb) & (red < -tol)
            elig_dec = ~st.in_basis & not_fixed & \
                (st.at_upper | free_nb) & (red > tol)
            elig = elig_inc | elig_dec
            any_elig = jnp.any(elig)
            term_status = jnp.where(in_phase1, STATUS_INFEASIBLE,
                                    STATUS_OPTIMAL)
            status_new = jnp.where(
                st.done, st.status,
                jnp.where(~any_elig, term_status, st.status)).astype(
                    jnp.int32)
            done_new = st.done | ~any_elig
            use_bland = st.stall >= stall_limit
            score = jnp.where(elig, red * red / st.gamma, neg_big)
            bland_score = jnp.where(elig, -col_ids.astype(dtype),
                                    neg_big)
            sel = jnp.where(use_bland, bland_score, score)
            _, cand_idx = lax.top_k(sel, NC)
            cand_idx = cand_idx.astype(jnp.int32)
            A_C = jnp.take(A, cand_idx, axis=1)          # [m, NC]
            return st._replace(done=done_new, status=status_new), \
                cand_idx, A_C

        def _pivot_c(st, cand_idx, A_C):
            in_phase1, piv, viol_lo, viol_hi, lo_b, up_b = _phase_piv(st)
            basis, in_basis, at_upper, binv, xb = (
                st.basis, st.in_basis, st.at_upper, st.binv, st.xb)

            c_C = jnp.take(c, cand_idx)
            red_C = jnp.where(in_phase1, 0.0, c_C) - _mm(piv, A_C)  # [NC]
            lo_C = jnp.take(lo, cand_idx)
            up_C = jnp.take(up, cand_idx)
            inb_C = jnp.take(in_basis, cand_idx)
            atu_C = jnp.take(at_upper, cand_idx)
            free_C = ~inb_C & ~jnp.isfinite(lo_C) & ~jnp.isfinite(up_C)
            nf_C = (up_C - lo_C) > tol
            elig_inc_C = ~inb_C & nf_C & (~atu_C | free_C) & (red_C < -tol)
            elig_dec_C = ~inb_C & nf_C & (atu_C | free_C) & (red_C > tol)
            elig_C = elig_inc_C | elig_dec_C
            any_elig_C = jnp.any(elig_C)

            gamma_C = jnp.take(st.gamma, cand_idx)
            score_C = jnp.where(elig_C, red_C * red_C / gamma_C, -1.0)
            bland_C = jnp.where(elig_C, -cand_idx, -(nt + 1))
            use_bland = st.stall >= stall_limit
            jc = jnp.where(use_bland, jnp.argmax(bland_C),
                           jnp.argmax(score_C)).astype(jnp.int32)
            j = jnp.take(cand_idx, jc)
            dir_ = jnp.where(jnp.take(elig_inc_C, jc), 1.0,
                             -1.0).astype(dtype)

            w = _mm(binv, A_C[:, jc])                     # [m]
            delta = -dir_ * w

            # Harris two-pass ratio test — identical to the full body.
            moving_up = delta > tol
            moving_dn = delta < -tol
            upper_target = jnp.where(viol_lo, lo_b,
                                     jnp.where(viol_hi, _BIG, up_b))
            lower_target = jnp.where(viol_hi, up_b,
                                     jnp.where(viol_lo, -_BIG, lo_b))
            r_up = jnp.where(
                moving_up & jnp.isfinite(upper_target),
                (upper_target - xb) / jnp.where(moving_up, delta, 1.0),
                big_ratio)
            r_dn = jnp.where(
                moving_dn & jnp.isfinite(lower_target),
                (lower_target - xb) / jnp.where(moving_dn, delta, 1.0),
                big_ratio)
            ratios = jnp.maximum(jnp.minimum(r_up, r_dn), 0.0)
            feas_tol = jnp.asarray(max(tol, 1e-9), dtype)
            r_up_rel = jnp.where(
                moving_up & jnp.isfinite(upper_target),
                (upper_target - xb + feas_tol) /
                jnp.where(moving_up, delta, 1.0), big_ratio)
            r_dn_rel = jnp.where(
                moving_dn & jnp.isfinite(lower_target),
                (lower_target - xb - feas_tol) /
                jnp.where(moving_dn, delta, 1.0), big_ratio)
            theta_rel = jnp.maximum(
                jnp.min(jnp.minimum(r_up_rel, r_dn_rel)), 0.0)
            span_j = jnp.take(up, j) - jnp.take(lo, j)
            flip_ratio = jnp.where(jnp.isfinite(span_j), span_j, big_ratio)
            cand_rows = ratios <= theta_rel
            leave_score = jnp.where(cand_rows, jnp.abs(w), -1.0)
            r_leave = jnp.argmax(leave_score).astype(jnp.int32)
            min_basic_ratio = jnp.where(jnp.any(cand_rows),
                                        jnp.take(ratios, r_leave),
                                        big_ratio)
            t_star = jnp.minimum(min_basic_ratio, flip_ratio)
            # The certificates only hold for a REAL eligible entering
            # column; an idle pivot (no eligible candidate) produces a
            # garbage ray and must not terminate the lane.
            unbounded = (t_star >= big_ratio) & ~in_phase1 & any_elig_C
            stuck = (t_star >= big_ratio) & in_phase1 & any_elig_C
            do_flip = flip_ratio < min_basic_ratio - tol

            xb_new = xb + t_star * delta
            at_upper_flip = at_upper.at[j].set(~jnp.take(at_upper, j))

            leave_var = jnp.take(basis, r_leave)
            leave_delta = jnp.take(delta, r_leave)
            blocked_at = jnp.where(leave_delta > 0,
                                   jnp.take(upper_target, r_leave),
                                   jnp.take(lower_target, r_leave))
            leave_is_upper = jnp.abs(
                blocked_at - jnp.take(up, leave_var)) <= \
                jnp.abs(blocked_at - jnp.take(lo, leave_var))
            basis_new = basis.at[r_leave].set(j)
            in_basis_new = in_basis.at[j].set(True).at[leave_var].set(False)
            at_upper_new = at_upper.at[leave_var].set(
                leave_is_upper).at[j].set(False)

            # Devex update restricted to the candidate block.
            w_r0 = jnp.take(w, r_leave)
            safe_aq = jnp.where(jnp.abs(w_r0) < 1e-12, 1.0, w_r0)
            alpha_C = _mm(binv[r_leave], A_C)             # [NC]
            g_q = jnp.take(st.gamma, j)
            cand_g_C = jnp.square(alpha_C / safe_aq) * g_q
            gamma_piv = st.gamma.at[cand_idx].max(cand_g_C)
            gamma_piv = gamma_piv.at[leave_var].set(
                jnp.maximum(g_q / jnp.square(safe_aq), 1.0))
            gamma_piv = jnp.where(jnp.max(gamma_piv) > 1e8,
                                  jnp.ones_like(gamma_piv), gamma_piv)

            w_r = jnp.take(w, r_leave)
            safe_wr = jnp.where(jnp.abs(w_r) < 1e-12, 1.0, w_r)
            eta = -w / safe_wr
            eta = eta.at[r_leave].set(1.0 / safe_wr)
            binv_new = binv + jnp.outer(
                eta - jnp.eye(m, dtype=dtype)[:, r_leave], binv[r_leave])
            lo_j = jnp.take(lo, j)
            up_j = jnp.take(up, j)
            vl_j = jnp.where(jnp.isfinite(lo_j), lo_j,
                             jnp.where(jnp.isfinite(up_j), up_j, 0.0))
            vu_j = jnp.where(jnp.isfinite(up_j), up_j,
                             jnp.where(jnp.isfinite(lo_j), lo_j, 0.0))
            x_j_old = jnp.where(jnp.take(at_upper, j), vu_j, vl_j)
            xb_pivot = xb_new.at[r_leave].set(x_j_old + dir_ * t_star)

            def _on_flip():
                return basis, in_basis, at_upper_flip, binv, xb_new, st.gamma

            def _on_pivot():
                return (basis_new, in_basis_new, at_upper_new, binv_new,
                        xb_pivot, gamma_piv)

            basis2, in_basis2, at_upper2, binv2, xb2, gamma2 = lax.cond(
                do_flip, _on_flip, _on_pivot)

            degen = t_star <= tol
            # An idle pivot (no eligible candidate) keeps everything; it
            # does NOT terminate — only the next full-pricing refresh may.
            keep = ~any_elig_C | unbounded | stuck | st.done
            did = ~keep
            status_new = jnp.where(
                st.done, st.status,
                jnp.where(unbounded, STATUS_UNBOUNDED,
                          jnp.where(stuck, STATUS_INFEASIBLE,
                                    st.status))).astype(jnp.int32)
            return _State(
                basis=jnp.where(keep, basis, basis2),
                in_basis=jnp.where(keep, in_basis, in_basis2),
                at_upper=jnp.where(keep, at_upper, at_upper2),
                binv=jnp.where(keep, binv, binv2),
                xb=jnp.where(keep, xb, xb2),
                gamma=jnp.where(keep, st.gamma, gamma2),
                it=jnp.where(did, st.it + 1, st.it),
                stall=jnp.where(did,
                                jnp.where(degen, st.stall + 1,
                                          jnp.int32(0)), st.stall),
                done=st.done | unbounded | stuck,
                status=status_new,
            )

        def _mini_body(i, st):
            st, cand_idx, A_C = _refresh(st)
            return lax.fori_loop(
                0, win, lambda _, s: _pivot_c(s, cand_idx, A_C), st)

        def outer_body_p(st: _State) -> _State:
            st = lax.fori_loop(0, n_mini, _mini_body, st)
            binv_ = _refactorize(sf, st.basis)
            xn_full = _nonbasic_values(sf, st.at_upper, st.in_basis)
            xb_ = _compute_xb(sf, binv_, st.basis, xn_full)
            return st._replace(binv=binv_, xb=xb_)

        final = lax.while_loop(cond, outer_body_p, state0)
    else:
        final = lax.while_loop(cond, outer_body, state0)

    status = jnp.where(final.done, final.status, jnp.int32(STATUS_ITER_LIMIT))

    if lite:
        # Objective/primal from the (chunk-end refactorized) loop state; the
        # f64 cost vector keeps the reported objective accurate.
        xn_full = _nonbasic_values(sf, final.at_upper, final.in_basis)
        x_full = xn_full.at[final.basis].set(final.xb).astype(out_dtype)
        c64_ = jnp.concatenate([d64, jnp.zeros(m, dtype=out_dtype)])
        cb_ = jnp.take(c64_, final.basis)
        pi_ = _mm(cb_, final.binv.astype(out_dtype))
        dj_ = c64_ - _mm(pi_, jnp.concatenate(
            [D64, jnp.eye(m, dtype=out_dtype)], axis=1))
        cstat_l = jnp.where(
            final.in_basis, BASIC,
            jnp.where(~jnp.isfinite(lo) & ~jnp.isfinite(up), FREE_NB,
                      jnp.where(final.at_upper, AT_UPPER, AT_LOWER)),
        ).astype(jnp.int32)
        obj_l = c64_ @ x_full
        # Non-finite guard: never report a NaN/inf objective as OPTIMAL
        # (callers like make_eval_batch count ok lanes into the UB estimate).
        status = jnp.where(jnp.isfinite(obj_l), status,
                           jnp.int32(STATUS_ITER_LIMIT))
        return LPResult(
            status=status, obj=obj_l, y=x_full[:n], pi=pi_,
            dj=dj_[:n], cstat=cstat_l[:n], rstat=cstat_l[n:],
            basis=final.basis, binv=final.binv.astype(out_dtype),
            iters=final.it,
            farkas=jnp.zeros(m, out_dtype),
        )

    # ---- clean final quantities (refactorized, in the OUTPUT dtype) -----
    A64 = jnp.concatenate([D64, jnp.eye(m, dtype=out_dtype)], axis=1)
    lo64 = jnp.concatenate(
        [l64, jnp.where(sense > 0, -_BIG, 0.0).astype(out_dtype)])
    up64 = jnp.concatenate(
        [u64, jnp.where(sense < 0, _BIG, 0.0).astype(out_dtype)])
    c64 = jnp.concatenate([d64, jnp.zeros(m, dtype=out_dtype)])
    sf64 = StandardForm(A=A64, b=b64, c=c64, lo=lo64, up=up64, n=n)

    binv = _refactorize(sf64, final.basis)
    xn_full = _nonbasic_values(sf64, final.at_upper, final.in_basis)
    xb = _compute_xb(sf64, binv, final.basis, xn_full)
    x_full = xn_full.at[final.basis].set(xb)

    c = c64
    A = A64
    lo, up = lo64, up64
    cb = jnp.take(c, final.basis)
    pi = _mm(cb, binv)                                        # [m]
    dj_full = c - _mm(pi, A)
    obj = c @ x_full

    # Farkas ray for infeasible LPs: the phase-1 multipliers. ray = cb1'Binv
    # satisfies ray'A_j <= 0 for columns increasable from their bound and
    # ray'b > sup-over-bounds of ray'Az at the phase-1 optimum, certifying
    # infeasibility (consumed by the feasibility-cut machinery, cuts.c:465).
    lo_b = jnp.take(lo, final.basis)
    up_b = jnp.take(up, final.basis)
    cb1 = jnp.where(xb < lo_b - 1e-7, -1.0,
                    jnp.where(xb > up_b + 1e-7, 1.0, 0.0)).astype(out_dtype)
    farkas = _mm(cb1, binv)
    farkas = jnp.where(status == STATUS_INFEASIBLE, farkas, jnp.zeros_like(farkas))

    cstat_full = jnp.where(
        final.in_basis, BASIC,
        jnp.where(~jnp.isfinite(lo) & ~jnp.isfinite(up), FREE_NB,
                  jnp.where(final.at_upper, AT_UPPER, AT_LOWER)),
    ).astype(jnp.int32)

    # Non-finite guard (see lite path).
    status = jnp.where(jnp.isfinite(obj) & jnp.all(jnp.isfinite(pi)), status,
                       jnp.int32(STATUS_ITER_LIMIT))
    # Independent dual certification — dj_full already comes from the clean
    # f64 refactorization of the final basis (not the loop carry), so this
    # costs only the comparisons.
    status = _certify_optimal(status, dj_full, final.in_basis,
                              final.at_upper, lo, up, c, tol)

    return LPResult(
        status=status,
        obj=obj,
        y=x_full[:n],
        pi=pi,
        dj=dj_full[:n],
        cstat=cstat_full[:n],
        rstat=cstat_full[n:],
        basis=final.basis,
        binv=binv,
        iters=final.it,
        farkas=farkas,
    )
