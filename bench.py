"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: batched subproblem-LP throughput on the device (the axis the
reference spends its time on: evaluate.c's thousands of sequential CPLEX
solves).  ``vs_baseline`` compares against scipy/HiGHS solving the same LPs
sequentially on the host CPU — the honest single-core stand-in for the
reference's CPLEX loop (CPLEX itself is unavailable here; see BASELINE.md).

Extras report end-to-end SD iteration rate and objective parity vs the
extensive-form optimum.
"""

import json
import time

import jax

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
    # warmup/compile
    s0, _, ok0 = fn(x, key)
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


def bench_sd_iterations(solver, cfg, n_iter=60):
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
    return (n_iter - 1) / dt, state


def main():
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.extensive import (
        enumerate_scenarios, solve_extensive_form,
    )
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    # ---- small classical-scale instance: full algorithm + parity --------
    core, tim, stoc = load_instance("pgp2like")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=400, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)

    batch = 512
    tpu_rate, _ = bench_eval_throughput(solver, batch)
    tpu_rate_f32, _ = bench_eval_throughput(solver, batch,
                                            pivot_dtype=jnp.float32)
    cpu_rate = bench_scipy_throughput(solver, n_solve=100)
    iters_per_sec, _ = bench_sd_iterations(solver, cfg, n_iter=40)

    # Objective parity: full SD run vs extensive form.
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    parity_gap = abs(ev.mean - ef_obj) / abs(ef_obj)

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
    # Any first-stage point works for throughput (complete recourse).
    solver2.mean_sol = np.full(20, 2.0)
    big_batch = 256
    big_rate_f32, big_mean_f32 = bench_eval_throughput(
        solver2, big_batch, rounds=2, pivot_dtype=jnp.float32)
    big_cpu_rate = bench_scipy_throughput(solver2, n_solve=20)
    big_mean_cpu = scipy_mean_obj(solver2, n_solve=20)
    f32_obj_err = abs(big_mean_f32 - big_mean_cpu) / max(abs(big_mean_cpu), 1)

    # ---- suite scale (ssn: 175x881 second stage, 86 RVs) -----------------
    from stochasticdecomposition_tpu.models.suite import load_suite_instance

    core3, tim3, stoc3 = load_suite_instance("ssnlike")
    sp3 = attach_stoc(decompose(core3, tim3, stoc3), stoc3)
    solver3 = _Shim()
    solver3.pa = stage_problem(sp3)
    solver3.spec = build_sampler(stoc3, sp3.rv_order)
    solver3.mean_sol = np.full(89, 2.0)
    ssn_rate, _ = bench_eval_throughput(solver3, 128, rounds=2,
                                        pivot_dtype=jnp.float32)
    ssn_cpu_rate = bench_scipy_throughput(solver3, n_solve=8)

    print(json.dumps({
        "metric": "batched_subproblem_lp_throughput_large",
        "value": round(big_rate_f32, 2),
        "unit": "LP solves/s (80x240 LPs, f32 pivots)",
        "vs_baseline": round(big_rate_f32 / big_cpu_rate, 3),
        "ssn_scale_tpu_lp_per_s": round(ssn_rate, 2),
        "ssn_scale_cpu_scipy_lp_per_s": round(ssn_cpu_rate, 2),
        "ssn_scale_vs_baseline": round(ssn_rate / ssn_cpu_rate, 3),
        "large_cpu_scipy_lp_per_s": round(big_cpu_rate, 2),
        "large_f32_vs_cpu_obj_relerr": round(f32_obj_err, 6),
        "small_tpu_lp_per_s_f64": round(tpu_rate, 2),
        "small_tpu_lp_per_s_f32pivot": round(tpu_rate_f32, 2),
        "small_cpu_scipy_lp_per_s": round(cpu_rate, 2),
        "small_vs_baseline": round(tpu_rate / cpu_rate, 3),
        "sd_iters_per_s": round(iters_per_sec, 2),
        "sd_iterations_to_stop": r.iterations,
        "objective_parity_gap": round(parity_gap, 6),
        "eval_obj": round(ev.mean, 4),
        "ef_opt": round(ef_obj, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
