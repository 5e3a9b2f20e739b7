"""Run one suite instance to the STATISTICAL stop on the attached device.

Produces the evidence VERDICT round 2 asked for (item 1): iterations to
stop, steady samples/s, pool sizes and memory at real iteration counts for
the large suite members (stormlike 528x1259/118RV, 20termlike 124x764/40RV;
reference scales from sd_experiments.sh:21).  Prints ONE JSON line; stdout
is machine-readable, progress goes to stderr.

Usage:
    python scripts/suite_to_stop.py stormlike --tol l --si 8 --max-iter 4096
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from stochasticdecomposition_tpu.utils.compilecache import (
    enable_persistent_cache,
)

enable_persistent_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--tol", default="l", choices=["l", "n", "t"])
    ap.add_argument("--si", type=int, default=8,
                    help="SAMPLE_INCREMENT (new observations per step)")
    ap.add_argument("--max-iter", type=int, default=4096,
                    help="sample budget (k counts samples)")
    ap.add_argument("--check-every", type=int, default=4)
    ap.add_argument("--seed-rep", type=int, default=0)
    ap.add_argument("--f32-pivot", action="store_true",
                    help="run the SD-loop subproblem pivot loops in f32 "
                         "(SUBPROB_F32_PIVOT; duals/basis still f64)")
    ap.add_argument("--max-lambda", type=int, default=None,
                    help="pin lambda AND sigma pool capacity (compute in the "
                         "capacity-static design scales with capacity, so "
                         "MAX_ITER-derived v2.0 caps — rvd*MAX_ITER, "
                         "setup.c:136-139 — dominate wall on small instances)")
    ap.add_argument("--max-omega", type=int, default=None,
                    help="pin omega pool capacity")
    args = ap.parse_args()

    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.suite import load_suite_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    t0 = time.perf_counter()
    core, tim, stoc = load_suite_instance(args.name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=args.max_iter, EVAL_FLAG=False,
                   SAMPLE_INCREMENT=args.si, CHECK_EVERY=args.check_every,
                   SUBPROB_F32_PIVOT=args.f32_pivot,
                   MAX_LAMBDA=args.max_lambda, MAX_SIGMA=args.max_lambda,
                   MAX_OMEGA=args.max_omega)
    cfg = cfg.apply_tolerance_preset(args.tol)
    solver = SDSolver(sp, cfg)
    t_setup = time.perf_counter() - t0
    print(f"[{args.name}] setup {t_setup:.1f}s; caps={solver.caps}, "
          f"pool_mem={solver.pool_bytes['total'] / 2**20:.0f}MiB",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    r = solver.solve_replication(args.seed_rep,
                                 log=lambda s: print(s, file=sys.stderr,
                                                     flush=True))
    wall = time.perf_counter() - t0

    # Steady-state dispatch rate on the already-compiled step.
    from bench import bench_sd_rate
    _, steady, _ = bench_sd_rate(solver, cfg, n_iter=6)
    steady *= cfg.CHECK_EVERY   # bench_sd_rate counts dispatches

    out = {
        "instance": args.name,
        "tolerance": args.tol,
        "sample_increment": args.si,
        "check_every": args.check_every,
        "f32_pivot": bool(args.f32_pivot),
        "samples_to_stop": r.iterations,
        "stopped_statistically": bool(r.optimal),
        "wall_s": round(wall, 1),
        "setup_s": round(t_setup, 1),
        "samples_per_s": round(r.iterations / wall, 2),
        "samples_per_s_steady": round(steady, 2),
        "lb_estimate": round(r.incumb_est, 4),
        "pools": r.pool_sizes,
        "cuts_active": r.cuts_active,
        "quad_scalar": round(r.quad_scalar, 6),
        "pool_mem_mb": round(solver.pool_bytes["total"] / 2**20, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
