"""Replication orchestration: the ``algo()`` / ``solveCell()`` equivalent.

Reference: algo.c.  The device executes one fused SD iteration per step
(core/step.py); this host loop owns only the stopping decisions (optimal.c
gate) and replication lifecycle (seeds at algo.c:43-44, cell reset at
setup.c:195-268 — which here is just constructing a fresh state pytree).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.evaluate import (
    EvalResult, evaluate, make_eval_batch,
)
from stochasticdecomposition_tpu.core.state import (
    Capacities, derive_capacities, init_state, stage_problem,
)
from stochasticdecomposition_tpu.core.compromise import (
    batch_entry_from_state, solve_compromise,
)
from stochasticdecomposition_tpu.core.feasibility import resolve_infeasibility
from stochasticdecomposition_tpu.core.step import make_step, make_substeps
from stochasticdecomposition_tpu.core.stopping import make_full_test, pre_test
from stochasticdecomposition_tpu.ops.simplex import STATUS_OPTIMAL, solve_lp
from stochasticdecomposition_tpu.prob import StagedProblem
from stochasticdecomposition_tpu.sampler import build_sampler


def check_pool_overflow(omega_cnt: int, lambda_cnt: int, sigma_cnt: int,
                        caps, rep: int | None = None) -> None:
    """Pool-overflow detection (fail loud, never silent-wrong): counts
    past capacity mean scatter writes were dropped.  lambda/sigma
    overflow only WEAKENS cuts (the argmax runs over the stored subset —
    still valid lower bounds), so warn; an overflowed omega pool is
    INVALID — calc_omega returns the out-of-range index and the
    subproblem then solves a clamp-read (wrong) observation, corrupting
    the sample stream.  Discovered live in the r5 occupancy study, where
    pinned pools overflowed by 0.7% with no signal."""
    tag = "" if rep is None else f"replication {rep}: "
    if omega_cnt > caps.O:
        raise RuntimeError(
            f"{tag}omega pool overflowed its capacity ({omega_cnt} > "
            f"{caps.O}): observations past capacity were clamped to the "
            "last stored row, corrupting the sample stream.  Raise "
            "MAX_OMEGA (it must cover the dedup'd support, or the sample "
            "budget on effectively-continuous instances).")
    if lambda_cnt > caps.L or sigma_cnt > caps.S:
        import warnings
        warnings.warn(
            f"{tag}dual-vertex pools overflowed (lambda {lambda_cnt}/"
            f"{caps.L}, sigma {sigma_cnt}/{caps.S}): vertices past "
            "capacity were dropped.  Cuts remain valid lower bounds but "
            "are weaker; raise MAX_LAMBDA/MAX_SIGMA for full strength.",
            RuntimeWarning, stacklevel=3)


@dataclasses.dataclass
class ReplicationResult:
    rep: int
    iterations: int
    incumb_x: np.ndarray
    incumb_est: float           # lower-bound estimate at termination
    optimal: bool               # stopped by the statistical test (vs MAX_ITER)
    lp_count: int
    unique_omegas: int
    pool_sizes: dict
    time_total: float
    time_setup: float
    eval: Optional[EvalResult] = None
    quad_scalar: float = 0.0
    cuts_active: int = 0
    feas_rounds: int = 0
    batch_entry: Optional[object] = None   # compromise artifacts
    # Per-phase seconds (runTime analog, twoSD.h:87-99).  The SD iteration
    # is ONE fused device program, so these are substep-dispatch estimates
    # produced by the --time-phases diagnostics mode; -1 = not measured.
    time_master: float = -1.0
    time_subprob: float = -1.0
    time_opttest: float = -1.0
    time_argmax: float = -1.0


@dataclasses.dataclass
class RunResult:
    problem: str
    replications: List[ReplicationResult]
    compromise_x: Optional[np.ndarray] = None
    average_x: Optional[np.ndarray] = None
    compromise_eval: Optional[EvalResult] = None
    average_eval: Optional[EvalResult] = None


@functools.lru_cache(maxsize=32)
def _mean_value_jit(max_iter: int):
    return jax.jit(functools.partial(solve_lp, max_iter=max_iter))


def mean_value_solution(sp: StagedProblem, dtype=jnp.float64) -> np.ndarray:
    """Solve the deterministic mean-value LP; its first-stage part seeds the
    initial candidate/incumbent (meanProblem at setup.c:21, used as xk)."""
    f, s = sp.first, sp.second
    m1, n1 = f.A.shape
    m2, n2 = s.D.shape
    A = np.zeros((m1 + m2, n1 + n2))
    A[:m1, :n1] = f.A
    A[m1:, :n1] = s.C_bar
    A[m1:, n1:] = s.D
    b = np.concatenate([f.b, s.b_bar])
    sense = np.concatenate([f.sense, s.sense])
    c = np.concatenate([f.c, s.d_bar])
    lo = np.concatenate([f.lb, s.lb])
    hi = np.concatenate([f.ub, s.ub])
    # One jitted program (instead of eager per-op dispatch, which pays a
    # compile+RPC per op through the remote tunnel) — and a single
    # persistent-cache entry, so repeat processes skip the compile.  The
    # jit wrapper is memoized per max_iter: constructing several SDSolvers
    # for the same instance in one process (bench parity stages, sweeps,
    # SAMPLE_INCREMENT scans) then hits the in-process executable cache
    # instead of re-tracing a fresh pjit object each time.
    solve = _mean_value_jit(12 * (A.shape[0] + A.shape[1]) + 256)
    out = solve(jnp.asarray(A, dtype), jnp.asarray(sense, jnp.int32),
                jnp.asarray(c, dtype), jnp.asarray(lo, dtype),
                jnp.asarray(hi, dtype), jnp.asarray(b, dtype))
    if int(out.status) != STATUS_OPTIMAL:
        raise RuntimeError(
            f"mean-value problem not optimal (status {int(out.status)})")
    return np.asarray(out.y[:n1])


def _key_from_seed(seed: int):
    return jax.random.PRNGKey(seed % (2 ** 63 - 1))


class SDSolver:
    """Compiled solver bound to one staged problem + configuration."""

    def __init__(self, sp: StagedProblem, cfg: SDConfig, dtype=jnp.float64):
        self.sp = sp
        self.cfg = cfg
        if cfg.LOWER_BOUND is not None:
            sp.lb = float(cfg.LOWER_BOUND)
            sp.lb_is_trivial = sp.lb == 0.0
        self.pa = stage_problem(sp, dtype)
        self.spec = build_sampler_from(sp)
        self.caps = derive_capacities(sp, cfg)
        from stochasticdecomposition_tpu.core.state import audit_capacities
        self.pool_bytes = audit_capacities(sp, cfg=cfg, caps=self.caps)
        self.step = make_step(self.pa, self.spec, cfg)
        self.substeps = make_substeps(self.pa, self.spec, cfg)
        self.full_test = make_full_test(self.pa, cfg, cfg.MAX_ITER)
        self.eval_batch_fn = None
        self.mean_sol = mean_value_solution(sp, dtype)
        # MILP/MIQP master (MASTER_TYPE 1/7): the fused step solves the
        # continuous relaxation (its duals feed the eviction/bootstrap
        # machinery); a host branch-and-bound (core/bnb.py) then restores
        # integrality on the candidate after every iteration — the
        # master.c:41 solveProblem(.., config.MASTER_TYPE, ..) semantics.
        self.mip_master = None
        from stochasticdecomposition_tpu.config import (
            MASTER_MILP, MASTER_MIQP,
        )
        if cfg.MASTER_TYPE in (MASTER_MILP, MASTER_MIQP) and \
                bool(np.any(np.asarray(self.pa.int1))):
            from stochasticdecomposition_tpu.core.bnb import make_mip_master
            from stochasticdecomposition_tpu.core.cuts import max_cut_height
            self.mip_master = make_mip_master(self.pa, cfg)
            milp = cfg.MASTER_TYPE == MASTER_MILP
            pa = self.pa

            def _commit(s, x):
                est = pa.c1 @ x + max_cut_height(pa, s, x, s.k)
                s = s._replace(candid_x=x, candid_est=est,
                               gamma=est - s.incumb_est)
                if milp:
                    # LP-mode reporting: candidate IS the solution
                    # (no incumbent machinery, setup.c:113-119).
                    s = s._replace(incumb_x=x, incumb_est=est,
                                   gamma=jnp.zeros((), pa.c1.dtype))
                return s

            self._mip_commit = jax.jit(_commit)
        # All host-loop control scalars packed into ONE device array so the
        # per-iteration device->host sync is a single transfer.  Through a
        # remote-tunnel TPU each separate int()/bool() read is its own RPC
        # (~100ms+); unpacked reads made the host loop ~10x slower than the
        # SD step itself.
        self._snapshot = jax.jit(lambda s: jnp.stack([
            s.k.astype(jnp.float64), s.dual_stable.astype(jnp.float64),
            s.candid_est.astype(jnp.float64),
            s.incumb_est.astype(jnp.float64),
            s.sp_feas.astype(jnp.float64), s.cut_ok.astype(jnp.float64),
            s.master_ok.astype(jnp.float64)]))

    def solve_replication(self, rep: int = 0, log=lambda s: None,
                          checkpoint_every: int = 0,
                          checkpoint_dir: str | None = None,
                          resume_from: str | None = None,
                          metrics=None,
                          time_phases: bool = False) -> ReplicationResult:
        cfg = self.cfg
        t0 = time.monotonic()
        key = _key_from_seed(cfg.RUN_SEED[rep])
        key, eval_key = jax.random.split(key)
        state = init_state(self.pa, self.caps, cfg, self.mean_sol, key)
        pool_alpha, pool_beta = [], []   # host-side feasibility cut pool
        if resume_from:
            from stochasticdecomposition_tpu.utils.checkpoint import (
                load_checkpoint,
            )
            state, extras = load_checkpoint(resume_from, state)
            if "eval_key" in extras:
                eval_key = extras["eval_key"]
            if "pool_alpha" in extras:
                pool_alpha = extras["pool_alpha"]
                pool_beta = extras["pool_beta"]
            else:
                # Old checkpoint without the host pool: reset the watermarks
                # so update_feas_cut_pool rebuilds it from the restored
                # sigma/delta pools instead of permanently losing the
                # pre-checkpoint (ray x observation) cuts.
                state = state._replace(f_updt=jnp.zeros(2, jnp.int32))
        t_setup = time.monotonic() - t0

        # Elapsed-k trigger, NOT exact modulo: with SAMPLE_INCREMENT*
        # CHECK_EVERY > 1 the observed k values stride past most multiples
        # of checkpoint_every, so an exact-modulo cadence would silently
        # skip checkpoints in batched configs (advisor r4).
        last_ckpt_k = [0]

        def _maybe_checkpoint(st, ekey, k):
            if checkpoint_every and checkpoint_dir and \
                    k - last_ckpt_k[0] >= checkpoint_every:
                last_ckpt_k[0] = k
                import os

                from stochasticdecomposition_tpu.utils.checkpoint import (
                    save_state,
                )
                os.makedirs(checkpoint_dir, exist_ok=True)
                save_state(
                    os.path.join(checkpoint_dir,
                                 f"rep{rep:02d}_k{int(st.k):06d}.npz"),
                    st, eval_key=ekey,
                    pool_alpha=pool_alpha, pool_beta=pool_beta)

        # LP masters have no bootstrap lower bound (fullTest aborts at
        # optimal.c:104-108): the statistical stop is unavailable and the
        # run terminates on MAX_ITER only — the documented reference gap,
        # handled explicitly.  MILP inherits the LP behavior (a MIP has no
        # well-defined duals for the bootstrap test); MIQP keeps the
        # statistical stop using the continuous relaxation's duals.
        from stochasticdecomposition_tpu.config import MASTER_LP, MASTER_MILP
        stat_stop = cfg.MASTER_TYPE not in (MASTER_LP, MASTER_MILP)

        optimal = False
        n_full_tests = 0
        master_fails = 0
        # One packed device->host transfer per iteration (see _snapshot).
        snap = np.asarray(self._snapshot(state))
        while int(snap[0]) < cfg.MAX_ITER:
            k = int(snap[0])
            # Optimality gate (optimal.c:23-42): min iterations + stable duals
            # + pre-test, then the bootstrap full test.
            if stat_stop and k > cfg.MIN_ITER and snap[1] != 0.0:
                if pre_test(float(snap[2]), float(snap[3]),
                            cfg.PRE_EPSILON):
                    eval_key, sub = jax.random.split(eval_key)
                    n_full_tests += 1
                    if bool(self.full_test(state, sub)):
                        optimal = True
                        log(">")
                        break
                    log(".")
            state = self.step(state)
            snap = np.asarray(self._snapshot(state))
            if metrics is not None:
                metrics.record(state)
            _maybe_checkpoint(state, eval_key, int(snap[0]))
            if snap[4] == 0.0:
                # Feasibility mode (resolveInfeasibility, cuts.c:402-449).
                log("F")
                state, pool_alpha, pool_beta = resolve_infeasibility(
                    self.pa, state, cfg, self.substeps,
                    pool_alpha, pool_beta)
                snap = np.asarray(self._snapshot(state))
            if snap[5] == 0.0 and snap[4] != 0.0:
                # A skipped cut while the subproblem solved feasibly means
                # the argmax found no valid vertex for some observation —
                # the istar < 0 hard error of the reference (cuts.c:136-139).
                raise RuntimeError(
                    f"SD cut formation failed at k={int(snap[0])}: no valid "
                    "dual vertex for some observation")
            if snap[6] == 0.0:
                # Transient master non-convergence: the IPM's certification
                # can fail inside the fused step on emulated-f64 backends
                # (compilation-context-dependent rounding) while the SAME
                # master solves cleanly as a standalone dispatch.  An
                # uncertified master never corrupts the algorithm — cuts are
                # valid minorants at ANY candidate and estimates come from
                # max_cut_height, not the QP objective — so re-solve once
                # via the master_step substep; if even the retry is
                # uncertified, CONTINUE with the best iterate (still a
                # feasible-by-construction d-space point) and only raise
                # when certification fails persistently — observed at
                # storm scale as an intermittent single-iteration event,
                # where a hard raise killed a 25-minute run at k=256.
                # The reference errors only on a true CPLEX failure
                # (master.c:42-46); persistent = 5 consecutive iterations.
                log("M")
                state = self.substeps["master_step"](
                    state._replace(master_ok=jnp.bool_(True)))
                snap = np.asarray(self._snapshot(state))
                if snap[6] == 0.0:
                    master_fails += 1
                    log("!")
                    if master_fails >= 5:
                        raise RuntimeError(
                            f"master QP failed to converge at "
                            f"k={int(snap[0])} (5 consecutive iterations, "
                            "retries included)")
                    state = state._replace(master_ok=jnp.bool_(True))
                    snap = np.asarray(self._snapshot(state))
                else:
                    master_fails = 0
            else:
                master_fails = 0
            if self.mip_master is not None:
                # Integer master (MASTER_TYPE 1/7): branch-and-bound over the
                # relaxation replaces the candidate with the integral optimum
                # of the SAME master (master.c:41 semantics); the relaxation's
                # duals stay in state for the eviction/bootstrap machinery.
                mres = self.mip_master(state)
                if not mres.found:
                    if mres.uncertified:
                        # Distinct failure mode: the box wasn't proven
                        # integer-infeasible — node relaxations failed to
                        # certify even after the per-node retry.
                        raise RuntimeError(
                            f"B&B master: node relaxations failed to certify "
                            f"at k={int(snap[0])} ({mres.uncertified} of "
                            f"{mres.nodes} nodes uncertified after retry)")
                    raise RuntimeError(
                        f"B&B master found no integer-feasible point at "
                        f"k={int(snap[0])} ({mres.nodes} nodes explored)")
                if mres.truncated:
                    # No silent caps: a node-limited B&B may report a
                    # suboptimal integral master solution.
                    log(f"\n[warn] B&B master hit its node limit at "
                        f"k={int(snap[0])} ({mres.nodes} nodes); integral "
                        "candidate may be suboptimal\n")
                state = self._mip_commit(
                    state, jnp.asarray(mres.x, self.pa.c1.dtype))
                snap = np.asarray(self._snapshot(state))
            if k % 100 == 0:
                log(f"\nIteration-{k:4d}: ")

        if self.mip_master is not None:
            # The incumbent seed is the (possibly fractional) mean-value
            # solution; if no integral candidate ever improved on it, report
            # the final integral candidate instead — the user asked for a
            # mixed-integer solution.
            ii = np.where(np.asarray(self.pa.int1))[0]
            xi = np.asarray(state.incumb_x)
            if np.max(np.abs(xi[ii] - np.round(xi[ii]))) > 1e-6:
                state = state._replace(incumb_x=state.candid_x,
                                       incumb_est=state.candid_est)

        check_pool_overflow(int(state.omega_cnt), int(state.lambda_cnt),
                            int(state.sigma_cnt), self.caps)

        total = time.monotonic() - t0
        phase = {}
        if time_phases:
            from stochasticdecomposition_tpu.utils.metrics import (
                estimate_phase_times,
            )
            phase = estimate_phase_times(
                self, state, eval_key, iterations=int(state.k),
                lp_count=int(state.lp_cnt), full_tests=n_full_tests,
                tau=cfg.TAU)
        return ReplicationResult(
            rep=rep,
            iterations=int(state.k),
            incumb_x=np.asarray(state.incumb_x),
            incumb_est=float(state.incumb_est),
            optimal=optimal,
            lp_count=int(state.lp_cnt),
            unique_omegas=int(state.omega_cnt),
            pool_sizes=dict(
                omega=int(state.omega_cnt), lam=int(state.lambda_cnt),
                sigma=int(state.sigma_cnt),
                cuts=int(jnp.sum(state.cut_mask))),
            time_total=total,
            time_setup=t_setup,
            quad_scalar=float(state.quad_scalar),
            cuts_active=int(jnp.sum(state.cut_mask)),
            feas_rounds=int(state.feas_cnt),
            batch_entry=batch_entry_from_state(state),
            **phase,
        )

    def evaluate_x(self, x, rep: int = 0) -> EvalResult:
        if self.eval_batch_fn is None:
            pivot = jnp.float32 if self.cfg.EVAL_F32_PIVOT else None
            self.eval_batch_fn = make_eval_batch(
                self.pa, self.spec, self.cfg.EVAL_BATCH, pivot_dtype=pivot)
        key = _key_from_seed(self.cfg.EVAL_SEED[rep])
        return evaluate(self.pa, self.spec, self.cfg, x, key,
                        eval_batch_fn=self.eval_batch_fn)

    def run(self, log=lambda s: None, checkpoint_every: int = 0,
            checkpoint_dir: str | None = None,
            resume_from: str | None = None,
            mesh=None, metrics_every: int = 0,
            metrics_dir: str | None = None,
            time_phases: bool = False) -> RunResult:
        """Full multi-replication run with the compromise epilogue
        (algo.c:36-96).

        ``mesh``: a (rep, obs) jax.sharding.Mesh — replications then run
        data-parallel as one vmapped+sharded program (parallel/runner.py)
        with identical per-replication stopping/feasibility behavior.
        Checkpoint/resume works on both paths: per-replication .npz on the
        sequential path, stacked wave checkpoints on the meshed path
        (utils/checkpoint.save_wave_checkpoint; single-process meshes).
        """
        cfg = self.cfg
        # Host-side epilogues — out-of-sample evaluation, the compromise QP
        # (compromise.c:249-311), and result files — run on the coordinator
        # only: under multi-host execution every process executes the meshed
        # SD program, but duplicating the epilogue would duplicate file
        # writes and waste eval solves (all processes hold identical
        # replicated results).
        from stochasticdecomposition_tpu.parallel.distributed import (
            is_coordinator,
        )
        coord = is_coordinator()
        if mesh is not None:
            if self.mip_master is not None:
                raise ValueError(
                    "MILP/MIQP masters run on the sequential path only "
                    "(the branch-and-bound is a per-iteration host loop); "
                    "drop --mesh")
            from stochasticdecomposition_tpu.parallel.runner import (
                run_replications_meshed,
            )
            reps = run_replications_meshed(
                self, mesh, log=log, checkpoint_every=checkpoint_every,
                checkpoint_dir=checkpoint_dir, resume_from=resume_from)
            if cfg.EVAL_FLAG and coord:
                for r in reps:
                    r.eval = self.evaluate_x(r.incumb_x, r.rep)
        else:
            reps = []
            for rep in range(cfg.MULTIPLE_REP):
                metrics = None
                if metrics_every and metrics_dir:
                    import os

                    from stochasticdecomposition_tpu.utils.metrics import (
                        MetricsRecorder,
                    )
                    os.makedirs(metrics_dir, exist_ok=True)
                    metrics = MetricsRecorder(
                        os.path.join(metrics_dir,
                                     f"metrics_rep{rep:02d}.jsonl"),
                        every=metrics_every)
                try:
                    r = self.solve_replication(
                        rep, log=log, checkpoint_every=checkpoint_every,
                        checkpoint_dir=checkpoint_dir,
                        resume_from=resume_from if rep == 0 else None,
                        metrics=metrics, time_phases=time_phases)
                finally:
                    if metrics is not None:
                        metrics.close()
                if cfg.EVAL_FLAG:
                    r.eval = self.evaluate_x(r.incumb_x, rep)
                reps.append(r)
        result = RunResult(problem=self.sp.name, replications=reps)

        if cfg.COMPROMISE_PROB and len(reps) > 1 and coord:
            entries = [r.batch_entry for r in reps]
            if self.mip_master is not None:
                # Integer mode: the reference applies MASTER_TYPE to the
                # batch problem too (compromise.c:260).
                from stochasticdecomposition_tpu.core.compromise import (
                    solve_compromise_mip,
                )
                cx, ax = solve_compromise_mip(self.pa, cfg, entries)
            else:
                cx, ax = solve_compromise(self.pa, cfg, entries)
            result.compromise_x = cx
            result.average_x = ax
            if cfg.EVAL_FLAG:
                result.compromise_eval = self.evaluate_x(cx, 0)
                result.average_eval = self.evaluate_x(ax, 0)
        return result


def build_sampler_from(sp: StagedProblem):
    # The sampler needs the parse-order -> omega-position map; StagedProblem
    # carries it and the StocData is reconstructed by the caller; to keep the
    # dependency one-way we stash stoc on sp when available.
    stoc = getattr(sp, "_stoc", None)
    if stoc is None:
        raise ValueError(
            "StagedProblem lacks attached stoch data; use solve_smps()/"
            "attach_stoc() so the sampler can be built")
    return build_sampler(stoc, sp.rv_order)


def attach_stoc(sp: StagedProblem, stoc) -> StagedProblem:
    sp._stoc = stoc
    return sp


def solve_smps(input_dir: str, prob_name: str, cfg: Optional[SDConfig] = None,
               log=lambda s: None) -> RunResult:
    """End-to-end entry: read SMPS triplet, decompose, run (twoSD.c main)."""
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.smps import read_smps

    cfg = cfg or SDConfig()
    core, tim, stoc = read_smps(input_dir, prob_name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    return SDSolver(sp, cfg).run(log=log)
