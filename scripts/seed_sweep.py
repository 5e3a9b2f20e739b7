"""Per-seed exact-gap distribution at nominal tolerance (VERDICT r2 item 3).

Round-2 parity reported first-replication exact gaps of ~0.002 on
pgp2like/lands vs the 0.001 target, with later seeds at 0.0004-0.0006.
This sweep runs ALL 30 RUN_SEED bank entries per instance and reports the
full gap distribution, iterations-to-stop, and whether the stop was
statistical — the data needed to decide "unlucky seed" vs "biased stop".

Gaps are exact (scenario-enumeration extensive form; no sampling error),
so the sweep is backend-independent — run it on CPU while the device is
busy, or on TPU.  Prints one JSON line per replication plus a summary.

Usage:
    JAX_PLATFORMS=cpu python scripts/seed_sweep.py pgp2like lands
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize pins JAX_PLATFORMS to the TPU tunnel, so an env
# var cannot force CPU; the config knob (set before backend init) can.
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

from stochasticdecomposition_tpu.utils.compilecache import (
    enable_persistent_cache,
)

enable_persistent_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")


def sweep(name: str, n_seeds: int, max_iter: int, si: int = 1,
          min_iter: int = 1, check_every: int = 1, deep_pools: bool = False):
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.extensive import (
        enumerate_scenarios, exact_objective_fn, solve_extensive_form,
    )
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    pool_kw = {}
    if deep_pools:
        # Deep batched runs on finite-support instances: pool capacity
        # follows the dedup'd support, not the sample count (the omega
        # pool only ever holds the distinct outcomes).
        pool_kw = dict(MAX_OMEGA=128, MAX_LAMBDA=512, MAX_SIGMA=512)
    cfg = SDConfig(MAX_ITER=max_iter, EVAL_FLAG=False,  # nominal preset
                   SAMPLE_INCREMENT=si, MIN_ITER=min_iter,
                   CHECK_EVERY=check_every, **pool_kw)
    solver = SDSolver(sp, cfg)
    exact = exact_objective_fn(solver.pa, outs, probs)

    rows = []
    for rep in range(n_seeds):
        t0 = time.perf_counter()
        r = solver.solve_replication(rep)
        gap = abs(float(exact(r.incumb_x)) - ef_obj) / abs(ef_obj)
        row = {"instance": name, "rep": rep, "gap": round(gap, 6),
               "iters": r.iterations, "statistical": bool(r.optimal),
               "wall_s": round(time.perf_counter() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    gaps = [r["gap"] for r in rows]
    return {
        "instance": name,
        "sample_increment": si,
        "min_iter": min_iter,
        "ef_obj": round(ef_obj, 6),
        "gaps": gaps,
        "iters": [r["iters"] for r in rows],
        "statistical_stops": sum(r["statistical"] for r in rows),
        "median_gap": round(statistics.median(gaps), 6),
        "mean_gap": round(statistics.fmean(gaps), 6),
        "max_gap": round(max(gaps), 6),
        "frac_below_tol": round(sum(g <= 1e-3 for g in gaps) / len(gaps), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("instances", nargs="+")
    ap.add_argument("--seeds", type=int, default=30)
    ap.add_argument("--max-iter", type=int, default=1024)
    ap.add_argument("--si", type=int, default=1,
                    help="SAMPLE_INCREMENT (batched sampling)")
    ap.add_argument("--min-iter", type=int, default=1,
                    help="MIN_ITER: minimum SAMPLES before the stop gate "
                         "opens — the reference's own depth knob; batched "
                         "samples are ~40x cheaper, so forcing thousands "
                         "of samples is the in-framework cure for "
                         "flat-objective tails (RESULTS.md section 2)")
    ap.add_argument("--check-every", type=int, default=1)
    ap.add_argument("--deep-pools", action="store_true",
                    help="cap pools at the dedup'd finite support "
                         "(MAX_OMEGA=128, MAX_LAMBDA/SIGMA=512) so deep "
                         "sample budgets stay cheap")
    args = ap.parse_args()
    out = [sweep(n, args.seeds, args.max_iter, args.si, args.min_iter,
                 args.check_every, args.deep_pools) for n in args.instances]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
