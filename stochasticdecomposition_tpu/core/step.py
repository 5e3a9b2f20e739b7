"""One SD iteration as a single jitted program.

Composes the reference hot path (solveCell body, algo.c:127-183):
draw observation -> dedup -> candidate subproblem + stochastic updates +
candidate cut -> incumbent cut every TAU -> incumbent-improvement check ->
regularized QP master.  The factory closes over the problem arrays, sampler
spec and (static) config so the returned function is state -> state and the
host loop only reads back a handful of scalars per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from stochasticdecomposition_tpu.config import (
    MASTER_LP, MASTER_MILP, SDConfig,
)
from stochasticdecomposition_tpu.core.cuts import (
    add_cut, form_cut, max_cut_height,
)
from stochasticdecomposition_tpu.core.master import (
    build_and_solve_master, build_and_solve_master_lp,
)
from stochasticdecomposition_tpu.core.state import (
    Capacities, ProblemArrays, SDState,
)
from stochasticdecomposition_tpu.core.update import (
    calc_omega, calc_omega_batch, solve_subproblem, stochastic_updates,
    stochastic_updates_batch, warm_solve_subproblem,
)
from stochasticdecomposition_tpu.ops.simplex import STATUS_OPTIMAL
from stochasticdecomposition_tpu.sampler import SamplerSpec, sample_omega

# Staged batched-solve parameters (kernel-fault guard, RESULTS §4b.2) —
# canonical values in ops/simplex.py, re-exported here (tests monkeypatch
# this module's copy).  Stage 1's pivot budget sits above the steady-state
# pivot tail (a 1024 budget still tripped stage 2 often enough to cost 14%
# steady rate on stormlike SI=64 — measured A/B r5) but below the fault
# regime: stormlike's own r4 driver runs executed ~5300-pivot x 64-lane
# f32 programs repeatedly without faulting, while the crashes
# (stormhvlike, f64 probes) sat near the ~7200-pivot iteration cap.
# Stage 2 finishes at a lane width proven safe for 5000+ pivot solves
# (f64 8-lane storm probes).
from stochasticdecomposition_tpu.ops.simplex import (  # noqa: F401
    STAGE1_PIVOTS, STAGE2_LANES,
)


def _staged_batch(pa: ProblemArrays, cfg: SDConfig) -> bool:
    """Whether the batched subproblem solve runs the two-stage fault
    guard.  Auto (None): on for storm-class row counts at batch widths
    above the safe stage-2 lane width."""
    if cfg.SUBPROB_STAGED_BATCH is not None:
        return bool(cfg.SUBPROB_STAGED_BATCH)
    from stochasticdecomposition_tpu.ops.simplex import STAGED_MIN_ROWS

    m = int(pa.D.shape[0])
    return m >= STAGED_MIN_ROWS and int(cfg.SAMPLE_INCREMENT) > STAGE2_LANES


def make_substeps(pa: ProblemArrays, spec: SamplerSpec, cfg: SDConfig):
    """Jitted sub-pieces used by the host feasibility-mode loop
    (resolveInfeasibility, cuts.c:402-449): a subproblem-solve-plus-updates
    step at the current candidate, a master-only solve, and the cut
    formation formSDCut performs once feasibility is restored (the SDCut
    call after resolveInfeasibility returns, cuts.c:40-56)."""
    tol = cfg.TOLERANCE
    dtype = pa.c1.dtype
    batch_ = max(1, int(cfg.SAMPLE_INCREMENT))
    scan_ = cfg.eff_scan_len()

    sub_pd = jnp.float32 if cfg.SUBPROB_F32_PIVOT else None

    def subprob_update(state: SDState) -> SDState:
        res, state = warm_solve_subproblem(
            pa, state, state.candid_x, state.omega_vals[state.last_o_idx],
            pivot_dtype=sub_pd)
        sp_feas = res.status == STATUS_OPTIMAL
        state = state._replace(lp_cnt=state.lp_cnt + 1, sp_feas=sp_feas)
        state, _ = stochastic_updates(pa, state, res, state.last_o_idx,
                                      jnp.bool_(False), state.k, tol)
        return state

    lp_master = cfg.MASTER_TYPE in (MASTER_LP, MASTER_MILP)
    master_solve = build_and_solve_master_lp if lp_master \
        else build_and_solve_master

    def master_step(state: SDState) -> SDState:
        res = master_solve(pa, state, state.k)
        candid_est = pa.c1 @ res.x + max_cut_height(pa, state, res.x, state.k)
        state = state._replace(
            candid_x=res.x, candid_est=candid_est,
            gamma=candid_est - state.incumb_est,
            norm_dk=res.d_norm2,
            pi_first=res.pi_first, pi_cuts=res.pi_cuts,
            dj_master=res.dj, eta=res.eta,
            master_ok=state.master_ok & res.ok)
        if lp_master:
            # No incumbent in LP mode (setup.c:113-119): track the candidate
            # for reporting/feasibility checks (inout.c:27-30 writes candidX).
            state = state._replace(incumb_x=res.x, incumb_est=candid_est,
                                   gamma=jnp.asarray(0.0, dtype))
        return state

    def cut_step(state: SDState) -> SDState:
        state = state._replace(cut_ok=jnp.bool_(True))
        parts, state = form_cut(
            pa, state, state.candid_x, state.k,
            dual_stability=cfg.DUAL_STABILITY,
            pi_eval_start=cfg.PI_EVAL_START,
            pi_cycle=cfg.PI_CYCLE, scan_len=scan_, batch=batch_)
        state, _ = add_cut(pa, state, parts, state.k, incumbent=False,
                           tol=tol)
        return state

    import jax as _jax
    return {
        "subprob_update": _jax.jit(subprob_update),
        "master_step": _jax.jit(master_step),
        "cut_step": _jax.jit(cut_step),
    }


def make_step(pa: ProblemArrays, spec: SamplerSpec, cfg: SDConfig,
              *, jit: bool = True):
    """Build the jitted SD iteration for a staged problem."""
    tol = cfg.TOLERANCE
    dtype = pa.c1.dtype
    sub_pd = jnp.float32 if cfg.SUBPROB_F32_PIVOT else None
    lp_master = cfg.MASTER_TYPE in (MASTER_LP, MASTER_MILP)
    master_solve = build_and_solve_master_lp if lp_master \
        else build_and_solve_master

    def _form_sd_cut(state: SDState, x, o_idx, new_o, k, incumbent: bool):
        """formSDCut (cuts.c:22-89): solve subproblem, run stochastic
        updates, build the SD cut via argmax, add it to pool."""
        w = state.omega_vals[o_idx]
        res, state = warm_solve_subproblem(pa, state, x, w,
                                           pivot_dtype=sub_pd)
        sp_feas = res.status == STATUS_OPTIMAL
        state = state._replace(lp_cnt=state.lp_cnt + 1,
                               sp_feas=state.sp_feas & sp_feas)
        state, _sidx = stochastic_updates(pa, state, res, o_idx, new_o, k, tol)
        parts, state = form_cut(
            pa, state, x, k,
            dual_stability=cfg.DUAL_STABILITY,
            pi_eval_start=cfg.PI_EVAL_START,
            pi_cycle=cfg.PI_CYCLE,
            scan_len=eff_scan, batch=batch)
        state, slot = add_cut(pa, state, parts, k, incumbent=incumbent,
                              tol=tol)
        return state, slot

    def _check_improvement(state: SDState, cand_slot, k):
        """checkImprovement / replaceIncumbent (soln.c:24-94)."""
        candid_est = pa.c1 @ state.candid_x + \
            max_cut_height(pa, state, state.candid_x, k)
        incumb_est = pa.c1 @ state.incumb_x + \
            max_cut_height(pa, state, state.incumb_x, k)
        state = state._replace(incumb_est=incumb_est)

        # An uncertified master (master_ok False) may have produced a
        # slightly first-stage-infeasible candidate; never promote it to
        # incumbent.  This matters under CHECK_EVERY>1 where the host-loop
        # retry (runner.py) only re-solves the FINAL master of a chunk and
        # could not undo a mid-chunk replacement.
        improved = ((candid_est - incumb_est) < cfg.R1 * state.gamma) \
            & state.master_ok

        def _replace(s: SDState) -> SDState:
            # Proximal rescale (soln.c:69-74).
            qs = s.quad_scalar
            grow = (s.norm_dk > tol) & (s.norm_dk >= cfg.R3 * s.norm_dk_1)
            qs_new = jnp.clip(
                qs * cfg.R2 * cfg.R3 * s.norm_dk_1 /
                jnp.where(s.norm_dk > tol, s.norm_dk, 1.0),
                cfg.MIN_QUAD_SCALAR, cfg.MAX_QUAD_SCALAR)
            qs = jnp.where(grow, qs_new, qs)
            return s._replace(
                incumb_x=s.candid_x,
                incumb_est=candid_est,
                quad_scalar=qs,
                i_cut_idx=cand_slot,
                i_cut_updt=k,
                incumb_chg=jnp.bool_(False),
                norm_dk_1=s.norm_dk,
                infeas_incumb=jnp.bool_(False),
                gamma=jnp.asarray(0.0, dtype),
            )

        def _shrink(s: SDState) -> SDState:
            # No improvement: strengthen the proximal term (soln.c:50-51).
            # The reference applies /R2 once per iteration == once per
            # SAMPLE; with cfg.QS_RELAX_PER_SAMPLE a batched step compounds
            # R2 per sample so the quad_scalar trajectory is calibrated in
            # samples at any SAMPLE_INCREMENT (without this the proximal
            # stays ~B-fold too weak at small step counts, the master
            # bounces between distant vertices, and the pre-test never
            # fires in batched mode); with it off, /R2 applies once per
            # master solve — the reference's literal rule.  Trade-offs in
            # config.py QS_RELAX_PER_SAMPLE.
            relax = cfg.R2 ** batch if cfg.QS_RELAX_PER_SAMPLE else cfg.R2
            return s._replace(
                quad_scalar=jnp.minimum(
                    jnp.asarray(cfg.MAX_QUAD_SCALAR, dtype),
                    s.quad_scalar / relax),
                norm_dk_1=s.norm_dk,
            )

        return lax.cond(improved, _replace, _shrink, state)

    batch = max(1, int(cfg.SAMPLE_INCREMENT))
    staged = _staged_batch(pa, cfg)
    # One pi_ratio entry is written per *step*; the window is
    # ceil(SCAN_LEN/batch) steps so it spans SCAN_LEN SAMPLES at any batch
    # (cuts.c:172 indexes the window by numSamples — certification is
    # calibrated in samples, not steps).
    eff_scan = cfg.eff_scan_len()

    def step(state: SDState) -> SDState:
        k = state.k + batch
        key, k_draw = jax.random.split(state.key)
        state = state._replace(k=k, key=key, sp_feas=jnp.bool_(True),
                               cut_ok=jnp.bool_(True))

        # 2. generateOmega + mean-centering + dedup (algo.c:145-152).
        # Batched-sampling mode (SAMPLE_INCREMENT > 1): k advances by the
        # batch size; all B fresh observations are deduped, their subproblems
        # solved as one vmapped batch, and their duals pooled sequentially —
        # one SD cut then covers the enlarged sample (the TPU inversion of
        # the reference's one-LP-per-iteration economics, SURVEY.md §7).
        w_raw = sample_omega(spec, k_draw, batch, dtype=dtype)
        w_batch = w_raw - pa.omega_mean[None, :]

        if batch == 1:
            state, o_idx, new_o = calc_omega(state, w_batch[0], tol)
            state = state._replace(last_o_idx=o_idx)
            # 3. candidate cut (algo.c:155).
            state, cand_slot = _form_sd_cut(
                state, state.candid_x, o_idx, new_o, k, incumbent=False)
        else:
            plain = int(pa.rv_d_cols.shape[0]) == 0
            if plain:
                # Two-phase batch dedup: same final pools/weights/slot order
                # as B sequential calc_omega calls, one pass.
                state, o_idxs, new_flags = calc_omega_batch(
                    state, w_batch, tol)
            else:
                # Random-cost path: dedup sequentially (the randcost pool
                # machinery consumes per-observation state).
                def dedup_one(s, w_i):
                    s, oi, nf = calc_omega(s, w_i, tol)
                    return s, (oi, nf)

                state, (o_idxs, new_flags) = lax.scan(
                    dedup_one, state, w_batch)
            state = state._replace(last_o_idx=o_idxs[-1])

            # Solve all B subproblems at the candidate as one vmapped batch.
            # vmap_chunked caps the dispatch width at MAX_VMAP_LANES: wider
            # raw vmaps of solve_lp deterministically miscompile on the TPU
            # backend (ops/simplex.py), so a user-legal SAMPLE_INCREMENT
            # above the cap runs as lax.map chunks inside this same jit —
            # identical results (tests/test_batched_sampling.py) at
            # identical throughput (the solver saturates well below 512).
            from stochasticdecomposition_tpu.ops.simplex import (
                AT_UPPER, vmap_chunked,
            )
            ws = state.omega_vals[o_idxs]
            if staged:
                # Kernel-fault guard (RESULTS §4b.2): cold/far-warm-start
                # storm-shape solve programs at >=64 lanes with thousands
                # of pivots crash the TPU worker.  Stage 1 runs the batch
                # at full width under a bounded pivot budget (warm steady
                # solves take a few hundred pivots and finish there);
                # stage 2 is a straggler-only while_loop: each trip
                # gathers up to STAGE2_LANES unfinished lanes, solves
                # them with the FULL budget at that narrow width (proven
                # safe for 5000+ pivot solves: f64 8-lane storm probes),
                # and scatters the results back.  Zero trips when nothing
                # straggled — the steady state pays only the predicate —
                # and a cold start runs ceil(B/8) bounded-width trips
                # instead of one fault-regime program.  Lanes that hit
                # the iteration cap even at full budget are attempted
                # once and keep ITER_LIMIT (fail-loud downstream), so the
                # loop always terminates.
                from stochasticdecomposition_tpu.ops.simplex import (
                    STATUS_ITER_LIMIT,
                )
                res1 = vmap_chunked(lambda wi: solve_subproblem(
                    pa, state.candid_x, wi, init_basis=state.warm_basis,
                    init_at_upper=state.warm_atup, pivot_dtype=sub_pd,
                    max_iter=STAGE1_PIVOTS), ws)

                max_trips = -(-batch // STAGE2_LANES)

                def _strag(res, attempted):
                    return (res.status == STATUS_ITER_LIMIT) & ~attempted

                def _s2_cond(carry):
                    res, attempted, trips = carry
                    return jnp.any(_strag(res, attempted)) & \
                        (trips < max_trips)

                def _s2_body(carry):
                    res, attempted, trips = carry
                    strag = _strag(res, attempted)
                    # Stable sort: straggler indices first, take 8.
                    idx = jnp.argsort(~strag)[:STAGE2_LANES]
                    take = strag[idx]
                    atup_all = jnp.concatenate(
                        [res.cstat, res.rstat], axis=1) == AT_UPPER
                    r2 = jax.vmap(lambda wi, bi, ai: solve_subproblem(
                        pa, state.candid_x, wi, init_basis=bi,
                        init_at_upper=ai, pivot_dtype=sub_pd))(
                            ws[idx], res.basis[idx], atup_all[idx])

                    def scat(old, new):
                        t = take.reshape((-1,) + (1,) * (new.ndim - 1))
                        return old.at[idx].set(
                            jnp.where(t, new, old[idx]))

                    res = jax.tree.map(scat, res, r2)
                    return res, attempted.at[idx].set(attempted[idx] | take), \
                        trips + 1

                res_b, _, _ = lax.while_loop(
                    _s2_cond, _s2_body,
                    (res1, jnp.zeros(batch, bool), jnp.int32(0)))
            else:
                res_b = vmap_chunked(lambda wi: solve_subproblem(
                    pa, state.candid_x, wi, init_basis=state.warm_basis,
                    init_at_upper=state.warm_atup, pivot_dtype=sub_pd), ws)
            all_feas = jnp.all(res_b.status == STATUS_OPTIMAL)
            # Refresh the warm basis from the optimal lane whose (centered)
            # observation is closest to the batch centroid — the most
            # typical scenario, so the NEXT batch's warm start minimizes
            # the worst-case pivot distance (an extreme lane's basis would
            # double it on wide-spread instances; part of the kernel-fault
            # mitigation above).
            okb = res_b.status == STATUS_OPTIMAL
            norms = jnp.sum(ws * ws, axis=1)
            score = jnp.where(okb, -norms, -jnp.inf)
            li = jnp.argmax(score)
            atup_b = jnp.concatenate(
                [res_b.cstat[li], res_b.rstat[li]]) == AT_UPPER
            use = jnp.any(okb)
            state = state._replace(
                warm_basis=jnp.where(use, res_b.basis[li], state.warm_basis),
                warm_atup=jnp.where(use, atup_b, state.warm_atup))
            state = state._replace(lp_cnt=state.lp_cnt + batch,
                                   sp_feas=state.sp_feas & all_feas)

            if plain:
                # Batched pooling: dedup decisions in one tiny scan, delta
                # fills as single matmuls (update.stochastic_updates_batch).
                state = stochastic_updates_batch(
                    pa, state, res_b, o_idxs, new_flags, k, tol)
            else:
                # Random-cost path: pool the duals sequentially (the basis
                # machinery is per-observation).
                def upd_one(s, inp):
                    res_i, oi, nf = inp
                    s, _ = stochastic_updates(pa, s, res_i, oi, nf, k, tol)
                    return s, ()

                state, _ = lax.scan(upd_one, state,
                                    (res_b, o_idxs, new_flags))

            parts, state = form_cut(
                pa, state, state.candid_x, k,
                dual_stability=cfg.DUAL_STABILITY,
                pi_eval_start=cfg.PI_EVAL_START,
                pi_cycle=cfg.PI_CYCLE, scan_len=eff_scan, batch=batch)
            state, cand_slot = add_cut(pa, state, parts, k,
                                       incumbent=False, tol=tol)

        # 4. incumbent cut every TAU iterations (algo.c:161-166).
        # 5. incumbent improvement check (algo.c:169-171).
        # Both are QP-master machinery (LP mode has no incumbent,
        # setup.c:113-119) — statically compiled out under MASTER_TYPE=0.
        if not lp_master:
            if batch == 1:
                do_inc = jnp.mod(k - state.i_cut_updt, cfg.TAU) == 0
            else:
                do_inc = (k - state.i_cut_updt) >= cfg.TAU
            state = lax.cond(
                do_inc,
                lambda s: _form_sd_cut(s, s.incumb_x, s.last_o_idx,
                                       jnp.bool_(False), k, incumbent=True)[0],
                lambda s: s, state)

            do_chk = ~state.incumb_chg & (k > 1)
            state = lax.cond(do_chk,
                             lambda s: _check_improvement(s, cand_slot, k),
                             lambda s: s, state)

        # 6. master QP/LP (algo.c:174, master.c:18-88).
        res = master_solve(pa, state, k)
        candid_est = pa.c1 @ res.x + max_cut_height(pa, state, res.x, k)
        state = state._replace(
            candid_x=res.x,
            candid_est=candid_est,
            gamma=candid_est - state.incumb_est,
            norm_dk=res.d_norm2,
            norm_dk_1=jnp.where(k == 1, res.d_norm2, state.norm_dk_1),
            pi_first=res.pi_first,
            pi_cuts=res.pi_cuts,
            dj_master=res.dj,
            eta=res.eta,
            master_ok=state.master_ok & res.ok,
        )
        if lp_master:
            # Candidate doubles as the reported solution (inout.c:27-30);
            # feasibility checks and cut heights key off incumb_x.
            state = state._replace(incumb_x=res.x, incumb_est=candid_est,
                                   gamma=jnp.asarray(0.0, dtype))
        return state

    chunk = max(1, int(getattr(cfg, "CHECK_EVERY", 1)))
    if chunk > 1:
        base = step

        def step(state: SDState) -> SDState:   # noqa: F811
            def body(s, _):
                return base(s), ()

            out, _ = lax.scan(body, state, None, length=chunk)
            return out

    return jax.jit(step, donate_argnums=0) if jit else step
