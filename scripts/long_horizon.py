"""Long-horizon SD run: throughput vs k, pool occupancy, stop depth.

VERDICT r3 item 4 evidence.  The reference's per-iteration cost GROWS with
k (argmax over the whole dual-vertex pool, stocUpdate.c:161-184; delta
fills over all stored observations, stocUpdate.c:196-257).  This
framework's pools are STATIC capacity (derive_capacities, setup.c:136-144
analog), so the fused step's cost is capacity-constant — the throughput
curve vs k should be FLAT, paying the full-capacity cost from iteration 1.
This script runs a high-variance storm-class instance (suite
'stormhvlike') to the statistical stop and records the samples/s curve,
pool occupancy and the certification depth, emitting one JSON line.

Usage: python scripts/long_horizon.py [stormhvlike] [--tol n] [--si 64]
          [--check-every 4] [--max-iter 4096] [--cpu]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", default="stormhvlike")
    ap.add_argument("--tol", default="n", choices=["l", "n", "t"])
    ap.add_argument("--si", type=int, default=64)
    ap.add_argument("--check-every", type=int, default=4)
    ap.add_argument("--max-iter", type=int, default=4096)
    ap.add_argument("--metrics-every", type=int, default=256)
    ap.add_argument("--f32-pivot", action="store_true",
                    help="SUBPROB_F32_PIVOT (production large-scale mode)")
    ap.add_argument("--max-lambda", type=int, default=None,
                    help="pin the lambda/sigma pool capacities (pool-"
                         "occupancy studies: the high-fill argmax/delta "
                         "regime needs capacity near the expected dedup'd "
                         "fill, not the MAX_ITER-derived bound)")
    ap.add_argument("--max-omega", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stochasticdecomposition_tpu.utils.compilecache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.suite import load_suite_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc
    from stochasticdecomposition_tpu.utils.metrics import MetricsRecorder

    core, tim, stoc = load_suite_instance(args.name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=args.max_iter, EVAL_FLAG=False,
                   SAMPLE_INCREMENT=args.si,
                   SUBPROB_F32_PIVOT=args.f32_pivot,
                   MAX_LAMBDA=args.max_lambda, MAX_SIGMA=args.max_lambda,
                   MAX_OMEGA=args.max_omega,
                   CHECK_EVERY=args.check_every).apply_tolerance_preset(
                       args.tol)
    t0 = time.perf_counter()
    solver = SDSolver(sp, cfg)
    setup_s = time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as td:
        mpath = os.path.join(td, "metrics.jsonl")
        rec = MetricsRecorder(mpath, every=args.metrics_every)
        t0 = time.perf_counter()
        r = solver.solve_replication(0, metrics=rec,
                                     log=lambda s: (sys.stderr.write(s),
                                                    sys.stderr.flush()))
        wall = time.perf_counter() - t0
        rec.close()
        with open(mpath) as fh:
            recs = [json.loads(line) for line in fh]

    # samples/s per metrics window (dt covers the window ending at k);
    # the first window carries the XLA compile, so report it separately.
    curve = []
    prev_k = 0
    for m in recs:
        dk = m["k"] - prev_k
        prev_k = m["k"]
        if m["dt"] > 0:
            curve.append({"k": m["k"],
                          "samples_per_s": round(dk / m["dt"], 2),
                          "pools": [m["omega_cnt"], m["lambda_cnt"],
                                    m["sigma_cnt"], m["cuts"]]})
    steady = [c["samples_per_s"] for c in curve[1:]] or \
        [c["samples_per_s"] for c in curve]
    caps = solver.caps
    out = {
        "instance": args.name,
        "device": str(jax.devices()[0]),
        "tol": args.tol,
        "si": args.si,
        "check_every": args.check_every,
        "f32_pivot": bool(args.f32_pivot),
        "samples_to_stop": r.iterations,
        "stopped_statistically": bool(r.optimal),
        "wall_s": round(wall, 1),
        "setup_s": round(setup_s, 1),
        "lb_estimate": round(r.incumb_est, 3),
        "pools_at_stop": r.pool_sizes,
        "capacities": {"O": caps.O, "L": caps.L, "S": caps.S,
                       "K": caps.K, "B": caps.B},
        "occupancy_pct": {
            "omega": round(100 * r.pool_sizes["omega"] / caps.O, 1),
            "lam": round(100 * r.pool_sizes["lam"] / caps.L, 1),
            "sigma": round(100 * r.pool_sizes["sigma"] / caps.S, 1)},
        "pool_mem_mb": round(solver.pool_bytes["total"] / 2 ** 20, 1),
        "samples_per_s_first_window_incl_compile": curve[0]["samples_per_s"]
        if curve else -1,
        "samples_per_s_steady_mean": round(
            sum(steady) / max(len(steady), 1), 2),
        "samples_per_s_steady_min": min(steady) if steady else -1,
        "samples_per_s_steady_max": max(steady) if steady else -1,
        "throughput_curve": curve,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
