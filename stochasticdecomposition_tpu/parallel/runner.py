"""Production multi-device replication driver.

The reference runs replications sequentially in one process (algo.c:36-76).
Here replications are the framework's data-parallel axis: a wave of
MULTIPLE_REP SD cells steps as ONE vmapped+sharded program over a
(rep, obs) device mesh (parallel/mesh.py), while the host keeps the exact
per-replication control flow of the sequential driver (runner.py):

  * the optimality gate (optimal.c:23-42) fires per replication, with each
    replication's own eval_key stream — identical stopping decisions to the
    sequential path;
  * finished replications are masked: the vmapped step computes their next
    state but a per-rep select keeps the old one (no counter drift);
  * subproblem infeasibility pulls THAT replication's cell to a single-rep
    state, runs the host feasibility loop (resolveInfeasibility,
    cuts.c:402-449) on the jitted substeps, and scatters the resolved cell
    back into the wave;
  * results hand off to the same compromise epilogue (compromise.c) as the
    sequential path.

Multi-host: initialize jax.distributed (parallel/distributed.py) before
building the mesh; jax.devices() then spans all hosts and the same code
shards replications across them.
"""

from __future__ import annotations

import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.feasibility import resolve_infeasibility
from stochasticdecomposition_tpu.core.state import init_state
from stochasticdecomposition_tpu.core.step import make_step
from stochasticdecomposition_tpu.core.stopping import pre_test
from stochasticdecomposition_tpu.parallel.mesh import (
    make_mesh, state_shardings,
)


def _make_wave_helpers(mesh, shardings):
    """Extract/scatter/snapshot over the (rep, obs) mesh.

    Outputs that the host reads are forced FULLY REPLICATED
    (``P()`` out_shardings): under multi-host execution each process only
    addresses its local shard of a rep-sharded array, and ``np.asarray`` /
    ``float`` on a non-addressable shard raises — replication makes every
    host-visible value readable on every process (and is free
    single-process)."""
    replicated = NamedSharding(mesh, P())

    extract = jax.jit(
        lambda s, i: jax.tree.map(lambda a: a[i], s),
        out_shardings=replicated)

    scatter = jax.jit(
        lambda s, i, st: jax.tree.map(lambda a, b: a.at[i].set(b), s, st),
        out_shardings=shardings, donate_argnums=0)

    snapshot = jax.jit(lambda s: jnp.stack([
        s.k.astype(jnp.float64), s.dual_stable.astype(jnp.float64),
        s.candid_est.astype(jnp.float64), s.incumb_est.astype(jnp.float64),
        s.sp_feas.astype(jnp.float64), s.cut_ok.astype(jnp.float64),
        s.master_ok.astype(jnp.float64)]), out_shardings=replicated)

    return extract, scatter, snapshot


def make_masked_multi_rep_step(pa, spec, cfg: SDConfig, mesh):
    """The production wave step: vmapped over replications, sharded over
    (rep, obs), with finished replications masked to their old state."""
    base = make_step(pa, spec, cfg, jit=False)

    def masked(state, done):
        new = base(state)
        return jax.tree.map(lambda o, n: jnp.where(done, o, n), state, new)

    shardings = state_shardings(mesh, with_rep_axis=True)
    done_sharding = NamedSharding(mesh, P("rep"))
    return jax.jit(jax.vmap(masked), in_shardings=(shardings, done_sharding),
                   out_shardings=shardings, donate_argnums=0)


def run_replications_meshed(solver, mesh=None, log=lambda s: None,
                            checkpoint_every: int = 0,
                            checkpoint_dir: str | None = None,
                            resume_from: str | None = None,
                            ) -> List["ReplicationResult"]:
    """Run all MULTIPLE_REP replications over the device mesh in waves of
    the mesh's rep-axis size.  Matches SDSolver.solve_replication per
    replication (same seeds, same stopping decisions, same feasibility
    handling); returns the same ReplicationResult list.

    Checkpoint/resume (SURVEY §5): every ``checkpoint_every`` iterations the
    stacked wave state + per-replication host loop state is saved to
    ``checkpoint_dir`` (utils/checkpoint.save_wave_checkpoint); finished
    waves additionally save a ``mesh_waveNN_final.npz``.  ``resume_from``
    restores a wave checkpoint and continues bit-identically; earlier
    finished waves are rebuilt from their final files in the same directory.
    """
    import os

    from stochasticdecomposition_tpu.runner import (
        ReplicationResult, _key_from_seed,
    )
    from stochasticdecomposition_tpu.core.compromise import (
        batch_entry_from_state,
    )
    from stochasticdecomposition_tpu.utils.checkpoint import (
        load_wave_checkpoint, save_wave_checkpoint,
    )

    cfg = solver.cfg
    if mesh is None:
        mesh = make_mesh(n_rep=1)
    W = mesh.shape["rep"]
    n_obs = mesh.shape["obs"]
    if solver.caps.O % n_obs:
        raise ValueError(
            f"omega capacity {solver.caps.O} not divisible by the obs mesh "
            f"axis {n_obs}")
    if (checkpoint_every or resume_from) and jax.process_count() > 1:
        raise ValueError(
            "meshed checkpoint/resume requires a single-process mesh "
            "(saving gathers the wave state to host numpy)")
    resume_wave = -1
    if resume_from:
        # Peek the wave index without shape validation (that needs the
        # staged wave below).
        resume_wave = int(np.load(resume_from)["__host_wave_start"])

    shardings = state_shardings(mesh, with_rep_axis=True)
    done_sharding = NamedSharding(mesh, P("rep"))
    step = make_masked_multi_rep_step(solver.pa, solver.spec, cfg, mesh)
    # Control scalars for the whole wave packed into one [7, W] transfer
    # (see runner.SDSolver._snapshot for why); extract/scatter with
    # host-readable (replicated) outputs under multi-host meshes.
    _extract_rep, _scatter_rep, snapshot = _make_wave_helpers(mesh, shardings)

    def _result_from_state(st, rep, opt, t_total, t_setup_):
        # Same fail-loud contract as the sequential driver.
        from stochasticdecomposition_tpu.runner import check_pool_overflow
        check_pool_overflow(int(st.omega_cnt), int(st.lambda_cnt),
                            int(st.sigma_cnt), solver.caps, rep=rep)
        return ReplicationResult(
            rep=rep,
            iterations=int(st.k),
            incumb_x=np.asarray(st.incumb_x),
            incumb_est=float(st.incumb_est),
            optimal=bool(opt),
            lp_count=int(st.lp_cnt),
            unique_omegas=int(st.omega_cnt),
            pool_sizes=dict(
                omega=int(st.omega_cnt), lam=int(st.lambda_cnt),
                sigma=int(st.sigma_cnt),
                cuts=int(jnp.sum(st.cut_mask))),
            time_total=t_total,
            time_setup=t_setup_,
            quad_scalar=float(st.quad_scalar),
            cuts_active=int(jnp.sum(st.cut_mask)),
            feas_rounds=int(st.feas_cnt),
            batch_entry=batch_entry_from_state(st),
        )

    results: List[ReplicationResult] = []
    R = cfg.MULTIPLE_REP
    for wave_start in range(0, R, W):
        reps = list(range(wave_start, min(wave_start + W, R)))
        t0 = time.monotonic()
        # Exactly the sequential path's per-replication key derivation
        # (solve_replication): split(PRNGKey(seed)) -> (run key, eval key).
        run_keys, eval_keys = [], []
        for rep in reps:
            k, ek = jax.random.split(_key_from_seed(cfg.RUN_SEED[rep]))
            run_keys.append(k)
            eval_keys.append(ek)
        while len(run_keys) < W:          # pad a short final wave with rep 0
            run_keys.append(run_keys[0])
            eval_keys.append(eval_keys[0])

        states = [init_state(solver.pa, solver.caps, cfg, solver.mean_sol, k)
                  for k in run_keys]
        # Stage through host numpy: device_put of numpy onto a global
        # sharding works under multi-host (every process computes the same
        # values and contributes its addressable shards), while device_put
        # of a process-local device array would not.
        stacked = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *states)

        done = np.array([i >= len(reps) for i in range(W)])  # padding = done
        master_fails: dict = {}       # consecutive uncertified-master count
        optimal = np.zeros(W, bool)
        pools = {i: ([], []) for i in range(W)}  # host feasibility cut pools

        if resume_from and wave_start < resume_wave:
            # A wave that finished BEFORE the checkpoint: rebuild its
            # results from the final file saved alongside the checkpoint.
            fin = os.path.join(os.path.dirname(os.path.abspath(resume_from)),
                               f"mesh_wave{wave_start:02d}_final.npz")
            if not os.path.exists(fin):
                raise FileNotFoundError(
                    f"resume needs the finished-wave file {fin}")
            st_fin, ex = load_wave_checkpoint(fin, stacked)
            for i, rep in enumerate(reps):
                st_i = jax.tree.map(lambda a: a[i], st_fin)
                results.append(_result_from_state(
                    st_i, rep, ex["optimal"][i], 0.0, 0.0))
            continue
        if resume_from and wave_start == resume_wave:
            stacked, ex = load_wave_checkpoint(resume_from, stacked)
            done = ex["done"]
            optimal = ex["optimal"]
            eval_keys = ex["eval_keys"]
            master_fails = ex["master_fails"]
            pools = ex["pools"]
            # Padded lanes of a short final wave stay done.
            for i in range(len(reps), W):
                done[i] = True
        stacked = jax.device_put(stacked, shardings)
        t_setup = time.monotonic() - t0

        def _save(path):
            save_wave_checkpoint(
                path, stacked, wave_start=wave_start, done=done,
                optimal=optimal, eval_keys=eval_keys,
                master_fails=master_fails, pools=pools)

        last_ckpt_k = 0
        # LP masters stop on MAX_ITER only (optimal.c:104-108; see runner.py).
        from stochasticdecomposition_tpu.config import MASTER_LP, MASTER_MILP
        # MILP inherits the LP-mode MAX_ITER stop (runner.py rationale); the
        # meshed driver only ever sees it integrality-free (SDSolver.run
        # rejects --mesh when a B&B master is active).
        stat_stop = cfg.MASTER_TYPE not in (MASTER_LP, MASTER_MILP)

        snap = np.asarray(snapshot(stacked))
        while not done.all():
            ks, stable, cand, inc = snap[0], snap[1], snap[2], snap[3]
            for i in range(len(reps)):
                if done[i]:
                    continue
                if ks[i] >= cfg.MAX_ITER:
                    done[i] = True
                    continue
                # Optimality gate (optimal.c:23-42), per replication.
                if stat_stop and ks[i] > cfg.MIN_ITER and bool(stable[i]) \
                        and pre_test(float(cand[i]), float(inc[i]),
                                     cfg.PRE_EPSILON):
                    eval_keys[i], sub = jax.random.split(eval_keys[i])
                    # Pass the key as host numpy: a process-local device
                    # array cannot mix with global-mesh state under
                    # multi-host execution.
                    if bool(solver.full_test(_extract_rep(stacked, i),
                                             np.asarray(sub))):
                        done[i] = True
                        optimal[i] = True
                        log(">")
                        continue
                    log(".")
            if done.all():
                break

            # Build the rep-sharded done mask as a GLOBAL array: every
            # process computes the same host values and contributes its
            # addressable shards (jit itself refuses to shard plain numpy
            # across processes).
            done_dev = jax.make_array_from_callback(
                done.shape, done_sharding, lambda idx: done[idx])
            stacked = step(stacked, done_dev)
            snap = np.asarray(snapshot(stacked))

            # Per-replication feasibility / failure handling.
            spf, cut_ok, master_ok = snap[4], snap[5], snap[6]
            scattered = False
            for i in range(len(reps)):
                if done[i]:
                    continue
                if not bool(spf[i]):
                    log("F")
                    st_i = _extract_rep(stacked, i)
                    pa_, pb_ = pools[i]
                    st_i, pa_, pb_ = resolve_infeasibility(
                        solver.pa, st_i, cfg, solver.substeps, pa_, pb_)
                    pools[i] = (pa_, pb_)
                    stacked = _scatter_rep(stacked, i, st_i)
                    scattered = True
                elif not bool(cut_ok[i]):
                    raise RuntimeError(
                        f"SD cut formation failed in replication {reps[i]} "
                        f"at k={int(ks[i]) + 1}")
                if not bool(master_ok[i]):
                    # Transient non-convergence: retry as a standalone
                    # dispatch; tolerate isolated retry failures and raise
                    # only when persistent (see runner.solve_replication —
                    # uncertified masters never corrupt cut validity).
                    log("M")
                    st_i = _extract_rep(stacked, i)
                    st_i = solver.substeps["master_step"](
                        st_i._replace(master_ok=jnp.bool_(True)))
                    if not bool(st_i.master_ok):
                        log("!")
                        master_fails[i] = master_fails.get(i, 0) + 1
                        if master_fails[i] >= 5:
                            raise RuntimeError(
                                f"master QP failed in replication {reps[i]} "
                                f"at k={int(ks[i]) + 1} (5 consecutive "
                                "iterations, retries included)")
                        st_i = st_i._replace(master_ok=jnp.bool_(True))
                    else:
                        master_fails[i] = 0
                    stacked = _scatter_rep(stacked, i, st_i)
                    scattered = True
            if scattered:
                snap = np.asarray(snapshot(stacked))
            kmin = int(np.min(snap[0][:len(reps)][~done[:len(reps)]])) \
                if not done.all() else 0
            # Elapsed-k trigger, NOT exact modulo: k advances in strides of
            # SAMPLE_INCREMENT*CHECK_EVERY per dispatch, so kmin only hits
            # exact multiples of checkpoint_every when the stride divides it
            # (e.g. stride 256 vs every=1000 would first align at the lcm,
            # k=32000 — the cadence would silently degrade in exactly the
            # production batched configs).
            if checkpoint_every and checkpoint_dir and kmin and \
                    kmin - last_ckpt_k >= checkpoint_every:
                os.makedirs(checkpoint_dir, exist_ok=True)
                _save(os.path.join(
                    checkpoint_dir,
                    f"mesh_wave{wave_start:02d}_k{kmin:06d}.npz"))
                last_ckpt_k = kmin
            if kmin % 100 == 0:
                log(f"\nIteration-{kmin:4d}: ")

        if checkpoint_every and checkpoint_dir:
            # Finished-wave file: lets a later-wave resume rebuild this
            # wave's results without re-running it.
            os.makedirs(checkpoint_dir, exist_ok=True)
            _save(os.path.join(checkpoint_dir,
                               f"mesh_wave{wave_start:02d}_final.npz"))
        total = time.monotonic() - t0
        for i, rep in enumerate(reps):
            st = _extract_rep(stacked, i)
            results.append(_result_from_state(st, rep, optimal[i], total,
                                              t_setup))
    return results
