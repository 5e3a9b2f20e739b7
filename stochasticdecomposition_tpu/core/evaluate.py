"""Out-of-sample evaluation, batched.

Reference: evaluate.c — a sequential loop of thousands of CPLEX solves with a
Welford mean/variance update and the 95%-CI stopping rule (evaluate.c:49).
Here each round draws EVAL_BATCH observations and solves them as one vmapped
simplex batch — the embarrassingly-parallel axis that gives the TPU its
wall-clock win and shards across devices (parallel/mesh.py).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.state import ProblemArrays
from stochasticdecomposition_tpu.core.update import subproblem_rhs_cost
from stochasticdecomposition_tpu.ops.simplex import STATUS_OPTIMAL, solve_lp
from stochasticdecomposition_tpu.sampler import SamplerSpec, sample_omega


class EvalResult(NamedTuple):
    mean: float          # total objective estimate: c'x + E[h(x, omega)]
    stdev: float         # stdev of the recourse term estimate
    count: int           # observations used
    ci_low: float
    ci_high: float
    error: float         # 3.29 stdev / mean (reference inout.c:37 convention)
    dropped: int = 0     # infeasible subproblem lanes excluded from the mean


def eval_lane_plan(pa: ProblemArrays, pivot_dtype=None):
    """(lanes, staged) for batched evaluation solves at this shape.

    ``lanes`` is the per-dispatch vmap width: MAX_VMAP_LANES guards the
    TPU wide-vmap miscompile, mem_lane_cap guards the HBM peak at large
    row counts (a 512-lane storm-shape eval program needs 36.6 GB of
    temps; 128-lane chunks reuse the same buffers), and STAGE1_MAX_LANES
    clamps staged dispatches to the width proven at the stage-1 pivot
    budget.  ``staged`` enables the two-stage kernel-fault guard
    (RESULTS §4b.2) on storm-class row counts.  Shared by the
    single-device and sharded (parallel/mesh.py) evaluators."""
    import jax.numpy as _jnp

    from stochasticdecomposition_tpu.ops.simplex import (
        MAX_VMAP_LANES, STAGE1_MAX_LANES, STAGE2_LANES, STAGED_MIN_ROWS,
        mem_lane_cap,
    )

    nbytes = 4 if pivot_dtype == _jnp.float32 else pa.c1.dtype.itemsize
    lanes = min(MAX_VMAP_LANES, mem_lane_cap(int(pa.D.shape[0]), nbytes))
    staged = int(pa.D.shape[0]) >= STAGED_MIN_ROWS and lanes > STAGE2_LANES
    if staged:
        lanes = min(lanes, STAGE1_MAX_LANES)
    return lanes, staged


def warm_staged_chunk_solver(pa: ProblemArrays, x, staged: bool,
                             pivot_dtype=None):
    """Trace-time helper: returns ``solve_chunk(w_c) -> (obj[L], ok[L])``.

    Solves the mean observation ONCE and warm-starts every scenario from
    its optimal basis (all scenarios share x and differ only in rhs/cost,
    so each warm solve is a handful of restart pivots instead of a cold
    ~O(m+n)-pivot pass).  With ``staged`` (kernel-fault guard, RESULTS
    §4b.2 — added after stormhvlike's replication eval crashed the TPU
    worker: wide-spread draws put warm starts thousands of pivots out),
    stage 1 solves the chunk under a bounded pivot budget and stage 2
    gathers stragglers <= STAGE2_LANES at a time, finishing them with the
    full budget from their own stage-1 bases."""
    from jax import lax

    from stochasticdecomposition_tpu.ops.simplex import (
        AT_UPPER, STAGE1_PIVOTS, STAGE2_LANES, STATUS_ITER_LIMIT,
    )

    zero_w = jnp.zeros(pa.omega_mean.shape, pa.c1.dtype)
    rhs0, cost0 = subproblem_rhs_cost(pa, x, zero_w)
    base = solve_lp(pa.D, pa.sense2, cost0, pa.l2, pa.u2, rhs0,
                    pivot_dtype=pivot_dtype, lite=True)
    base_atup = jnp.concatenate([base.cstat, base.rstat]) == AT_UPPER

    def _solve(wi, max_pivots, init_basis, init_atup):
        rhs, cost = subproblem_rhs_cost(pa, x, wi)
        return solve_lp(pa.D, pa.sense2, cost, pa.l2, pa.u2, rhs,
                        pivot_dtype=pivot_dtype, lite=True,
                        max_iter=max_pivots,
                        init_basis=init_basis, init_at_upper=init_atup)

    def solve_chunk(w_c):
        L = w_c.shape[0]
        res = jax.vmap(lambda wi: _solve(
            wi, STAGE1_PIVOTS if staged else 0,
            base.basis, base_atup))(w_c)
        if staged:
            max_trips = -(-L // STAGE2_LANES)

            def _strag(r, att):
                return (r.status == STATUS_ITER_LIMIT) & ~att

            def _cond(carry):
                r, att, t = carry
                return jnp.any(_strag(r, att)) & (t < max_trips)

            def _body(carry):
                r, att, t = carry
                sg = _strag(r, att)
                idx = jnp.argsort(~sg)[:STAGE2_LANES]
                take = sg[idx]
                atup_all = jnp.concatenate(
                    [r.cstat, r.rstat], axis=1) == AT_UPPER
                r2 = jax.vmap(lambda wi, bi, ai: _solve(wi, 0, bi, ai))(
                    w_c[idx], r.basis[idx], atup_all[idx])

                def scat(old, new):
                    tk = take.reshape((-1,) + (1,) * (new.ndim - 1))
                    return old.at[idx].set(jnp.where(tk, new, old[idx]))

                r = jax.tree.map(scat, r, r2)
                return r, att.at[idx].set(att[idx] | take), t + 1

            res, _, _ = lax.while_loop(
                _cond, _body,
                (res, jnp.zeros(L, bool), jnp.int32(0)))
        return res.obj, res.status == STATUS_OPTIMAL

    return solve_chunk


def make_eval_batch(pa: ProblemArrays, spec: SamplerSpec, batch: int,
                    pivot_dtype=None):
    """Jitted: (x, key) -> (mean, M2, n_ok) over one observation batch.

    ``mean`` is the batch mean of the ok lanes and ``M2`` the sum of squared
    deviations from it — the per-batch Welford statistics (evaluate.c:86-93).
    The host merges batches with :func:`welford_merge`; naive sum/sum-of-
    squares would lose ~8 digits to cancellation at storm-scale magnitudes
    (~1.5e7 recourse values with comparatively tiny variance).

    ``pivot_dtype=jnp.float32`` runs the simplex pivot loops on the MXU with
    f64 final cleanup (cfg.EVAL_F32_PIVOT)."""

    def eval_batch(x, key):
        dtype = pa.c1.dtype
        w_raw = sample_omega(spec, key, batch, dtype=dtype)
        w = w_raw - pa.omega_mean[None, :]

        from jax import lax

        lanes, staged = eval_lane_plan(pa, pivot_dtype)
        solve_chunk = warm_staged_chunk_solver(pa, x, staged, pivot_dtype)
        # Batches wider than the lane plan run as lax.map chunks inside
        # this one jitted program — measured at the same throughput (the
        # solver saturates the chip well below the caps).
        if batch > lanes:
            n_chunks = -(-batch // lanes)
            pad = n_chunks * lanes - batch
            w_p = jnp.concatenate([w, w[:pad]]) if pad else w
            objs_c, ok_c = lax.map(
                solve_chunk, w_p.reshape(n_chunks, lanes, -1))
            objs = objs_c.reshape(-1)[:batch]
            ok = ok_c.reshape(-1)[:batch]
        else:
            objs, ok = solve_chunk(w)
        objs = jnp.where(ok, objs, 0.0)
        n_ok = jnp.sum(ok)
        mean = jnp.sum(objs) / jnp.maximum(n_ok, 1)
        dev = jnp.where(ok, objs - mean, 0.0)
        m2 = jnp.sum(dev * dev)
        return mean, m2, n_ok

    return jax.jit(eval_batch)


def welford_merge(n, mean, M2, nb, mean_b, m2_b):
    """Chan-style parallel merge of two Welford accumulators.

    The batched analog of the reference's scalar update (evaluate.c:86-93):
    combines (count, mean, sum-of-squared-deviations) statistics without the
    catastrophic cancellation of sum/sum-of-squares accumulation."""
    nb = int(nb)
    if nb == 0:
        return n, mean, M2
    mean_b = float(mean_b)
    m2_b = float(m2_b)
    n_new = n + nb
    delta = mean_b - mean
    mean = mean + delta * nb / n_new
    M2 = M2 + m2_b + delta * delta * n * nb / n_new
    return n_new, mean, M2


def evaluate(pa: ProblemArrays, spec: SamplerSpec, cfg: SDConfig, x,
             key, *, max_obs: int = 200_000, eval_batch_fn=None,
             max_dropped_frac: float = 0.01) -> EvalResult:
    """evaluate (evaluate.c:16-111): estimate c'x + E[h] to the configured
    accuracy: stop when 3.92*stdev <= EVAL_ERROR*|mean| and count >= MIN.

    An infeasible evaluation subproblem is an error in the reference
    (evaluate.c:70-76).  Here lanes may fail individually (iteration limit,
    genuine infeasibility without complete recourse); they are excluded from
    the mean, COUNTED (EvalResult.dropped), warned about, and the evaluation
    errors out when their fraction exceeds ``max_dropped_frac`` — silently
    dropping lanes would bias the UB estimate."""
    import warnings

    batch = cfg.EVAL_BATCH
    fn = eval_batch_fn or make_eval_batch(pa, spec, batch)
    x = jnp.asarray(x, pa.c1.dtype)

    n = 0
    n_drawn = 0
    mean = 0.0
    M2 = 0.0
    stdev = float("inf")
    while n < max_obs:
        key, sub = jax.random.split(key)
        mb, m2b, ok = fn(x, sub)
        n, mean, M2 = welford_merge(n, mean, M2, ok, mb, m2b)
        n_drawn += batch
        if n > 1:
            var = max(M2 / (n - 1), 0.0)
            stdev = math.sqrt(var / n)
        if n >= cfg.EVAL_MIN_ITER and 3.92 * stdev <= cfg.EVAL_ERROR * abs(mean):
            break

    dropped = n_drawn - n
    if dropped:
        frac = dropped / max(n_drawn, 1)
        if frac > max_dropped_frac:
            raise RuntimeError(
                f"evaluation dropped {dropped}/{n_drawn} infeasible "
                f"subproblem lanes ({100 * frac:.2f}% > "
                f"{100 * max_dropped_frac:.2f}%); the UB estimate would be "
                "biased (evaluate.c:70-76 treats this as an error)")
        warnings.warn(
            f"evaluation dropped {dropped}/{n_drawn} infeasible subproblem "
            "lanes; UB estimate excludes them", RuntimeWarning)

    first_cost = float(jnp.asarray(pa.c1 @ x))
    total = mean + first_cost
    return EvalResult(
        mean=total, stdev=stdev, count=n,
        ci_low=total - 1.645 * stdev, ci_high=total + 1.645 * stdev,
        error=3.29 * stdev / total if total else float("inf"),
        dropped=dropped,
    )
