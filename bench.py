"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: batched subproblem-LP throughput on the device (the axis the
reference spends its time on: evaluate.c's thousands of sequential CPLEX
solves).  ``vs_baseline`` compares against scipy/HiGHS solving the same LPs
sequentially on the host CPU — the honest single-core stand-in for the
reference's CPLEX loop (CPLEX itself is unavailable here; see BASELINE.md).
Per-call Python/HiGHS setup overhead is included in the CPU number.

Extras:
  * objective parity measured EXACTLY by scenario enumeration (no sampling
    error): per-replication and compromise-solution gaps vs the
    extensive-form optimum at nominal tolerance (BASELINE.md 0.001 target);
  * end-to-end SD wall-clock in sequential (batch=1) and batched
    (SAMPLE_INCREMENT) modes — the claimed TPU-economics win;
  * suite-scale full SD runs (ssnlike 175x706/86RV, stormlike 528x1259/118RV)
    with pool telemetry and the static-pool memory audit.
"""

import json
import sys
import time

import jax


def _prog(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(f"[bench +{time.perf_counter() - _t0[0]:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench_eval_throughput(solver, batch, rounds=8, pivot_dtype=None):
    from stochasticdecomposition_tpu.core.evaluate import make_eval_batch

    fn = make_eval_batch(solver.pa, solver.spec, batch,
                         pivot_dtype=pivot_dtype)
    x = jnp.asarray(solver.mean_sol, solver.pa.c1.dtype)
    key = jax.random.PRNGKey(0)
    s0, _, ok0 = fn(x, key)          # warmup/compile
    jax.block_until_ready((s0, ok0))
    mean_obj = float(s0) / max(int(ok0), 1)
    t0 = time.perf_counter()
    n = 0
    for i in range(rounds):
        key, sub = jax.random.split(key)
        s, sq, ok = fn(x, sub)
        n += batch
    jax.block_until_ready((s, sq, ok))
    dt = time.perf_counter() - t0
    return n / dt, mean_obj


def scipy_mean_obj(solver, n_solve=50):
    """Mean subproblem objective via scipy at the mean solution (sanity)."""
    from scipy.optimize import linprog

    from stochasticdecomposition_tpu.sampler import sample_omega

    pa = solver.pa
    D = np.asarray(pa.D)
    sense = np.asarray(pa.sense2)
    x = np.asarray(solver.mean_sol)
    w = np.asarray(sample_omega(solver.spec, jax.random.PRNGKey(9), n_solve,
                                dtype=pa.c1.dtype)) - np.asarray(pa.omega_mean)
    bounds = list(zip(np.asarray(pa.l2), np.asarray(pa.u2)))
    ub_rows, ge_rows, eq_rows = sense == -1, sense == 1, sense == 0
    objs = []
    for i in range(n_solve):
        rhs = np.asarray(pa.b_bar) - np.asarray(pa.C_bar) @ x
        nb = pa.rv_b_rows.shape[0]
        if nb:
            rhs[np.asarray(pa.rv_b_rows)] += w[i, :nb]
        A_ub = np.vstack([D[ub_rows], -D[ge_rows]])
        b_ub = np.concatenate([rhs[ub_rows], -rhs[ge_rows]])
        r = linprog(np.asarray(pa.d_bar), A_ub=A_ub if len(A_ub) else None,
                    b_ub=b_ub if len(b_ub) else None,
                    A_eq=D[eq_rows] if eq_rows.any() else None,
                    b_eq=rhs[eq_rows] if eq_rows.any() else None,
                    bounds=bounds, method="highs")
        objs.append(r.fun)
    return float(np.mean(objs))


def bench_scipy_throughput(solver, n_solve=200):
    from scipy.optimize import linprog

    from stochasticdecomposition_tpu.sampler import sample_omega

    pa = solver.pa
    D = np.asarray(pa.D)
    sense = np.asarray(pa.sense2)
    l = np.asarray(pa.l2)
    u = np.asarray(pa.u2)
    x = np.asarray(solver.mean_sol)
    w = np.asarray(sample_omega(solver.spec, jax.random.PRNGKey(2), n_solve,
                                dtype=pa.c1.dtype)) - np.asarray(pa.omega_mean)

    bounds = list(zip(l, u))
    ub_rows = sense == -1
    ge_rows = sense == 1
    eq_rows = sense == 0
    t0 = time.perf_counter()
    for i in range(n_solve):
        rhs = np.asarray(pa.b_bar) - np.asarray(pa.C_bar) @ x
        nb = pa.rv_b_rows.shape[0]
        if nb:
            rhs[np.asarray(pa.rv_b_rows)] += w[i, :nb]
        cost = np.asarray(pa.d_bar)
        A_ub = np.vstack([D[ub_rows], -D[ge_rows]])
        b_ub = np.concatenate([rhs[ub_rows], -rhs[ge_rows]])
        linprog(cost, A_ub=A_ub if len(A_ub) else None,
                b_ub=b_ub if len(b_ub) else None,
                A_eq=D[eq_rows] if eq_rows.any() else None,
                b_eq=rhs[eq_rows] if eq_rows.any() else None,
                bounds=bounds, method="highs")
    dt = time.perf_counter() - t0
    return n_solve / dt


def bench_sd_rate(solver, cfg, n_iter=40):
    """Fused-step dispatch rate (steps/s and samples/s) from a fresh state."""
    from stochasticdecomposition_tpu.core.state import init_state

    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(3))
    state = solver.step(state)              # compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n_iter - 1):
        state = solver.step(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps_per_s = (n_iter - 1) / dt
    return steps_per_s, steps_per_s * max(1, cfg.SAMPLE_INCREMENT), state


def exact_objective(solver, x, outs, probs):
    """c'x + E[h(x, omega)] by FULL scenario enumeration — zero sampling
    error, so parity gaps are exact (vs the r1 bench's CI-limited eval)."""
    from stochasticdecomposition_tpu.core.update import subproblem_rhs_cost
    from stochasticdecomposition_tpu.ops.simplex import solve_lp

    pa = solver.pa
    x = jnp.asarray(x, pa.c1.dtype)
    W = jnp.asarray(outs, pa.c1.dtype) - pa.omega_mean[None, :]

    def h_one(wi):
        rhs, cost = subproblem_rhs_cost(pa, x, wi)
        return solve_lp(pa.D, pa.sense2, cost, pa.l2, pa.u2, rhs).obj

    hs = jax.vmap(h_one)(W)
    return float(pa.c1 @ x + jnp.asarray(probs) @ hs)


def bench_parity():
    """pgp2like multi-rep + compromise exact parity at nominal tolerance."""
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.extensive import (
        enumerate_scenarios, solve_extensive_form,
    )
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("pgp2like")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    cfg = SDConfig(MAX_ITER=520, EVAL_FLAG=False, MULTIPLE_REP=3,
                   COMPROMISE_PROB=True)   # nominal EPSILON/SCAN_LEN
    solver = SDSolver(sp, cfg)
    t0 = time.perf_counter()
    res = solver.run()
    wall = time.perf_counter() - t0
    gaps = [abs(exact_objective(solver, r.incumb_x, outs, probs) - ef_obj)
            / abs(ef_obj) for r in res.replications]
    comp = abs(exact_objective(solver, res.compromise_x, outs, probs)
               - ef_obj) / abs(ef_obj)

    # lands single replication, same exact measurement.
    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs_l, probs_l = enumerate_scenarios(stoc, sp.rv_order)
    ef_l, _ = solve_extensive_form(sp, outs_l, probs_l)
    sol_l = SDSolver(sp, SDConfig(MAX_ITER=520, EVAL_FLAG=False))
    r_l = sol_l.solve_replication(0)
    gap_l = abs(exact_objective(sol_l, r_l.incumb_x, outs_l, probs_l)
                - ef_l) / abs(ef_l)
    return {
        "parity_rep_gaps_pgp2like": [round(g, 6) for g in gaps],
        "parity_compromise_gap_pgp2like": round(comp, 6),
        "parity_gap_lands": round(gap_l, 6),
        "parity_iters_to_stop": [r.iterations for r in res.replications],
        "parity_wall_s": round(wall, 1),
        "solver": solver,
    }


def bench_suite_sd(name, n_iter, sample_increment=1):
    """Full SD loop at suite scale with pool/memory telemetry."""
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.suite import load_suite_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_suite_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=n_iter, EVAL_FLAG=False,
                   SAMPLE_INCREMENT=sample_increment)
    t0 = time.perf_counter()
    solver = SDSolver(sp, cfg)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = solver.solve_replication(0)
    wall = time.perf_counter() - t0
    # Steady-state rate on the already-compiled step (the wall number above
    # includes the one-time XLA compile).
    _, steady, _ = bench_sd_rate(solver, cfg, n_iter=6)
    return {
        "iters": r.iterations,
        "samples_per_s": round(r.iterations / wall, 2),
        "samples_per_s_steady": round(steady, 2),
        "wall_s": round(wall, 1),
        "setup_s": round(t_setup, 1),
        "pools": r.pool_sizes,
        "lb_estimate": round(r.incumb_est, 2),
        "pool_mem_mb": round(solver.pool_bytes["total"] / 2 ** 20, 1),
    }


def main():
    global _T_START
    _T_START = time.perf_counter()
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    extras = {}

    # ---- on-device Pallas self-check -------------------------------------
    # The triple-argmax kernel's CPU tests run in interpret mode; this
    # exercises real Mosaic lowering (both whole-VMEM and DMA-streamed
    # paths, odd pool sizes included) and compares against the XLA fallback.
    try:
        from stochasticdecomposition_tpu.ops.pallas_argmax import (
            triple_masked_argmax, triple_masked_argmax_xla,
        )
        rng = np.random.default_rng(0)
        ok_all = True
        for S, O in [(37, 256), (2251, 1664)]:
            H = jnp.asarray(rng.standard_normal((S, O)))
            m1 = jnp.asarray(rng.random(S) > 0.3)
            m2 = m1 & jnp.asarray(rng.random(S) > 0.5)
            got = triple_masked_argmax(H, m1, m2, m1 & ~m2)
            ref = triple_masked_argmax_xla(H, m1, m2, m1 & ~m2)
            ok_all &= all(np.allclose(np.asarray(a), np.asarray(b))
                          for a, b in zip(got, ref))
        extras["pallas_argmax_device_match"] = bool(ok_all)
    except Exception as e:
        extras["pallas_argmax_device_match"] = f"error: {e}"[:160]
    _prog("pallas self-check done")

    # ---- parity (exact, by scenario enumeration) ------------------------
    _prog("parity start")
    par = bench_parity()
    _prog("parity done")
    solver = par.pop("solver")
    extras.update(par)

    # ---- LP throughput vs sequential HiGHS -------------------------------
    batch = 512
    tpu_rate, _ = bench_eval_throughput(solver, batch)
    _prog("eval throughput (f64) done")
    tpu_rate_f32, _ = bench_eval_throughput(solver, batch,
                                            pivot_dtype=jnp.float32)
    cpu_rate = bench_scipy_throughput(solver, n_solve=100)

    # ---- SD wall-clock: sequential vs batched sampling -------------------
    cfg1 = SDConfig(MAX_ITER=400, EVAL_FLAG=False)
    s1 = SDSolver(solver.sp, cfg1)
    steps1, samples1, _ = bench_sd_rate(s1, cfg1, n_iter=40)
    cfg64 = SDConfig(MAX_ITER=6400, EVAL_FLAG=False, SAMPLE_INCREMENT=64,
                     CHECK_EVERY=1)
    s64 = SDSolver(solver.sp, cfg64)
    steps64, samples64, _ = bench_sd_rate(s64, cfg64, n_iter=12)
    _prog("sd rates done")
    extras.update({
        "sd_iters_per_s": round(steps1, 2),
        "sd_samples_per_s_batch1": round(samples1, 2),
        "sd_samples_per_s_batch64": round(samples64, 2),
        "sd_batch64_speedup": round(samples64 / samples1, 2),
    })

    # ---- mid-scale synthetic (ssn-class): batched LP throughput ----------
    class _Shim:
        pass

    core2, tim2, stoc2 = parse_synthetic(seed=7, n1=20, m1=3, n2=160, m2=80,
                                         n_rv=12, support=5)
    sp2 = attach_stoc(decompose(core2, tim2, stoc2), stoc2)
    from stochasticdecomposition_tpu.core.state import stage_problem
    from stochasticdecomposition_tpu.sampler import build_sampler

    solver2 = _Shim()
    solver2.pa = stage_problem(sp2)
    solver2.spec = build_sampler(stoc2, sp2.rv_order)
    solver2.mean_sol = np.full(20, 2.0)
    big_batch = 256
    big_rate_f32, big_mean_f32 = bench_eval_throughput(
        solver2, big_batch, rounds=2, pivot_dtype=jnp.float32)
    big_cpu_rate = bench_scipy_throughput(solver2, n_solve=20)
    big_mean_cpu = scipy_mean_obj(solver2, n_solve=20)
    f32_obj_err = abs(big_mean_f32 - big_mean_cpu) / max(abs(big_mean_cpu), 1)

    # ---- suite scale: full SD end-to-end ---------------------------------
    # Time-budgeted: always emit the JSON line even if the big compiles are
    # slow on this backend (skipped instances are reported as such).
    import os
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    for name, iters, si in [("ssnlike", 64, 8), ("20termlike", 64, 8),
                            ("stormlike", 48, 8)]:
        if time.perf_counter() - _T_START > budget:
            extras[f"sd_{name}"] = {"skipped": "bench time budget"}
            continue
        try:
            _prog(f"suite {name} start")
            extras[f"sd_{name}"] = bench_suite_sd(name, iters,
                                                  sample_increment=si)
        except Exception as e:          # report, don't die
            extras[f"sd_{name}"] = {"error": str(e)[:200]}

    print(json.dumps({
        "metric": "batched_subproblem_lp_throughput_large",
        "value": round(big_rate_f32, 2),
        "unit": "LP solves/s (80x240 LPs, f32 pivots)",
        "vs_baseline": round(big_rate_f32 / big_cpu_rate, 3),
        "large_cpu_scipy_lp_per_s": round(big_cpu_rate, 2),
        "large_f32_vs_cpu_obj_relerr": round(f32_obj_err, 6),
        "small_tpu_lp_per_s_f64": round(tpu_rate, 2),
        "small_tpu_lp_per_s_f32pivot": round(tpu_rate_f32, 2),
        "small_cpu_scipy_lp_per_s": round(cpu_rate, 2),
        "small_vs_baseline": round(tpu_rate / cpu_rate, 3),
        "device": str(jax.devices()[0]),
        **extras,
    }))


if __name__ == "__main__":
    main()
