"""LP-solve throughput vs lane count at suite subproblem shapes.

VERDICT r3 item 5 evidence: the batched simplex (ops/simplex.py) measured
across vmap lane counts at the ssn-class (175x706) and storm-class
(528x1259) subproblem shapes, f64 and f32-pivot modes, with analytic
GFLOP/s (same accounting as bench.bench_utilization) — plus the honest
CPU yardstick: sequential scipy/HiGHS solving the SAME subproblems on the
host (the reference's per-iteration CPLEX solve role, subprob.c:43-45).

Usage:  python scripts/lp_scaling.py [--cpu] [--shapes ssn,storm]
Emits one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.utils.compilecache import (
    enable_persistent_cache,
)


def mean_sol_scipy(sp):
    """First-stage mean-value solution via host scipy (no XLA compile)."""
    from scipy.optimize import linprog

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
    ub_rows, ge_rows, eq_rows = sense == -1, sense == 1, sense == 0
    A_ub = np.vstack([A[ub_rows], -A[ge_rows]])
    b_ub = np.concatenate([b[ub_rows], -b[ge_rows]])
    r = linprog(c, A_ub=A_ub if len(A_ub) else None,
                b_ub=b_ub if len(b_ub) else None,
                A_eq=A[eq_rows] if eq_rows.any() else None,
                b_eq=b[eq_rows] if eq_rows.any() else None,
                bounds=list(zip(lo, hi)), method="highs")
    if r.status != 0:
        raise RuntimeError(f"mean-value LP not optimal (scipy status {r.status})")
    return r.x[:n1]


def build(name):
    from stochasticdecomposition_tpu.core.state import stage_problem
    from stochasticdecomposition_tpu.models.suite import load_suite_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import attach_stoc
    from stochasticdecomposition_tpu.sampler import build_sampler

    core, tim, stoc = load_suite_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    pa = stage_problem(sp)
    spec = build_sampler(stoc, sp.rv_order)
    x = mean_sol_scipy(sp)
    return pa, spec, x


def rhs_batch(pa, spec, x, key, batch):
    from stochasticdecomposition_tpu.sampler import sample_omega

    w = sample_omega(spec, key, batch, dtype=pa.c1.dtype) - pa.omega_mean
    rhs = jnp.tile(pa.b_bar - pa.C_bar @ jnp.asarray(x, pa.c1.dtype),
                   (batch, 1))
    nb = int(pa.rv_b_rows.shape[0])
    if nb:
        rhs = rhs.at[:, pa.rv_b_rows].add(w[:, :nb])
    return rhs


def measure(pa, spec, x, batch, pivot_dtype, rounds=3, lite=True,
            refac_every=None, partial=False, pp_window=16, pp_cands=256):
    from jax import lax

    from stochasticdecomposition_tpu.ops.simplex import (
        MAX_VMAP_LANES, solve_lp,
    )

    m, n2 = pa.D.shape
    nt = n2 + m
    # Wider batches run as lax.map chunks of MAX_VMAP_LANES inside one jit
    # (raw vmap widths >= 1024 miscompile on TPU; see ops/simplex).
    lanes = min(batch, MAX_VMAP_LANES)
    assert batch % lanes == 0, (batch, lanes)

    def one(key):
        rhs = rhs_batch(pa, spec, x, key, batch)

        def chunk(rb):
            res = jax.vmap(lambda b: solve_lp(
                pa.D, pa.sense2, pa.d_bar, pa.l2, pa.u2, b,
                pivot_dtype=pivot_dtype, lite=lite,
                refac_every=refac_every, partial_pricing=partial,
                pp_window=pp_window, pp_cands=pp_cands))(rb)
            return res.iters, res.status, res.obj

        if batch > lanes:
            it, st, ob = lax.map(chunk, rhs.reshape(batch // lanes, lanes, -1))
            return it.reshape(-1), st.reshape(-1), ob.reshape(-1)
        return chunk(rhs)

    fn = jax.jit(one)
    t0 = time.perf_counter()
    iters, status, obj = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(iters)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in range(rounds):
        iters, status, obj = fn(jax.random.PRNGKey(r + 1))
    jax.block_until_ready(iters)
    wall = time.perf_counter() - t0
    iters = np.asarray(iters)
    ok = float(np.mean(np.asarray(status) == 0))
    if refac_every is None:
        refac_every = max(64, min(512, m // 4))   # mirrors solve_lp
    chunk = max(8, min(refac_every, m))
    n_chunks = int(np.ceil(iters.max() / chunk))
    flops_pivot = 4 * m * nt + 7 * m * m
    flops_lane = n_chunks * (chunk * flops_pivot + 2 * m ** 3 + 4 * m * m)
    gflops = batch * flops_lane * rounds / wall / 1e9
    return {
        "lp_per_s": round(batch * rounds / wall, 2),
        "gflops": round(gflops, 1),
        "pivots_mean": round(float(iters.mean()), 1),
        "pivots_max": int(iters.max()),
        "ok_frac": round(ok, 4),
        "compile_s": round(compile_s, 1),
        "mean_obj": round(float(np.asarray(obj).mean()), 4),
    }


def cpu_yardstick(pa, spec, x, n_solve=20):
    """Sequential scipy/HiGHS on the SAME subproblems (reference CPLEX role)."""
    from scipy.optimize import linprog

    rhs = np.asarray(rhs_batch(pa, spec, x, jax.random.PRNGKey(7), n_solve))
    D = np.asarray(pa.D)
    sense = np.asarray(pa.sense2)
    bounds = list(zip(np.asarray(pa.l2), np.asarray(pa.u2)))
    ub_rows, ge_rows, eq_rows = sense == -1, sense == 1, sense == 0
    A_ub = np.vstack([D[ub_rows], -D[ge_rows]])
    objs = []
    t0 = time.perf_counter()
    for i in range(n_solve):
        b_ub = np.concatenate([rhs[i][ub_rows], -rhs[i][ge_rows]])
        r = linprog(np.asarray(pa.d_bar),
                    A_ub=A_ub if len(A_ub) else None,
                    b_ub=b_ub if len(b_ub) else None,
                    A_eq=D[eq_rows] if eq_rows.any() else None,
                    b_eq=rhs[i][eq_rows] if eq_rows.any() else None,
                    bounds=bounds, method="highs")
        objs.append(r.fun)
    wall = time.perf_counter() - t0
    return {"lp_per_s": round(n_solve / wall, 2),
            "mean_obj": round(float(np.mean(objs)), 4)}


SHAPES = {"ssn": "ssnlike", "storm": "stormlike"}
LANES = {"ssn": (80, 256, 512, 2048), "storm": (64, 256, 512)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the XLA:CPU backend")
    ap.add_argument("--shapes", default="ssn,storm")
    ap.add_argument("--lanes", default="")
    ap.add_argument("--skip-yardstick", action="store_true")
    ap.add_argument("--f32-only", action="store_true",
                    help="skip the f64 operating points (the f64 64-lane "
                         "storm cold-start probes sit in the kernel-fault "
                         "regime, RESULTS 4b.2)")
    ap.add_argument("--refac-sweep", default="",
                    help="comma list of refac_every values: sweep the "
                         "refactorization cadence at each (shape, first "
                         "lane count, f32) operating point — the per-solve "
                         "latency lever (VERDICT r4 item 6)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()
    jax.config.update("jax_enable_x64", True)

    out = {"device": str(jax.devices()[0])}
    for tag in args.shapes.split(","):
        name = SHAPES[tag]
        pa, spec, x = build(name)
        m, n2 = pa.D.shape
        out[f"{tag}_shape"] = [m, n2]
        lanes = ([int(v) for v in args.lanes.split(",")] if args.lanes
                 else LANES[tag])
        from stochasticdecomposition_tpu.ops.simplex import MAX_VMAP_LANES

        for batch in lanes:
            for pd, label in ((jnp.float32, "f32"), (None, "f64")):
                if label == "f64" and args.f32_only:
                    continue
                if label == "f64" and batch > MAX_VMAP_LANES:
                    # f64 Newton-refinement temporaries OOM/fault the
                    # device at kilo-lane widths and the operating point
                    # has no user (f64 batches stay <= the lane cap).
                    continue
                try:
                    r = measure(pa, spec, x, batch, pd)
                except Exception as e:   # e.g. f64 HBM OOM at high lanes
                    r = {"error": str(e)[:160]}
                out[f"{tag}_b{batch}_{label}"] = r
                print(f"[{tag} b={batch} {label}] {r}", file=sys.stderr,
                      flush=True)
        if args.refac_sweep:
            b0 = lanes[0]
            for rf in (int(v) for v in args.refac_sweep.split(",")):
                try:
                    r = measure(pa, spec, x, b0, jnp.float32, refac_every=rf)
                except Exception as e:
                    r = {"error": str(e)[:160]}
                out[f"{tag}_b{b0}_f32_refac{rf}"] = r
                print(f"[{tag} b={b0} f32 refac={rf}] {r}", file=sys.stderr,
                      flush=True)
        if not args.skip_yardstick:
            y = cpu_yardstick(pa, spec, x)
            out[f"{tag}_cpu_highs"] = y
            print(f"[{tag} cpu/HiGHS] {y}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
