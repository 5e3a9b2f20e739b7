"""Result files and console summaries.

Reference: inout.c — detailedResults.csv (TSV schema at inout.c:20-24),
incumb.dat, summary.dat, and the console optimization/evaluation summaries
(inout.c:42-71).  Column layout is kept compatible so downstream tooling that
consumed the reference's outputs keeps working; a structured JSONL stream is
added alongside.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from stochasticdecomposition_tpu.core.evaluate import EvalResult
from stochasticdecomposition_tpu.runner import ReplicationResult, RunResult

_HEADER = ("Replication\tIterations\tLB estimate\tTotal time\tMaster time\t"
           " Subproblem time\t Optimality time\tArgmax time\t"
           "UB Estimate\tError\tCI-L\tCI-U\tOutcomes\n")


def write_detailed_results(path: str, result: RunResult) -> None:
    """detailedResults.csv (writeOptimizationStatistics, inout.c:16-39).

    The per-phase CPU timers of the reference do not decompose here — the SD
    iteration is one fused device program — so master/subproblem/argmax time
    columns carry the fused iteration time split markers (-1 = fused)."""
    with open(path, "w") as fh:
        fh.write(_HEADER)
        for r in result.replications:
            fh.write(f"{r.rep + 1}\t{r.iterations}\t{r.incumb_est:.4f}\t"
                     f"{r.time_total:.4f}\t-1\t-1\t-1\t-1")
            if r.eval is not None:
                e = r.eval
                fh.write(f"\t{e.mean:.4f}\t{e.error:.4f}\t{e.ci_low:.4f}\t"
                         f"{e.ci_high:.4f}\t{e.count}\n")
            else:
                fh.write("\n")


def write_incumb(path: str, result: RunResult) -> None:
    """incumb.dat: incumbent vector per replication (inout.c:26-31)."""
    with open(path, "w") as fh:
        for r in result.replications:
            fh.write(" ".join(f"{v:.6f}" for v in r.incumb_x) + "\n")


def write_jsonl(path: str, result: RunResult) -> None:
    with open(path, "w") as fh:
        for r in result.replications:
            rec = {
                "rep": r.rep, "iterations": r.iterations,
                "lb_estimate": r.incumb_est, "optimal": r.optimal,
                "lp_count": r.lp_count, "pools": r.pool_sizes,
                "time_total": r.time_total, "quad_scalar": r.quad_scalar,
            }
            if r.eval is not None:
                rec["eval"] = r.eval._asdict()
            fh.write(json.dumps(rec) + "\n")


def print_optimization_summary(r: ReplicationResult, max_iter: int,
                               out=print) -> None:
    """Console summary (printOptimizationSummary, inout.c:42-59)."""
    out("\n------------------------------ Optimization ------------------------------")
    out("Algorithm                          : Two-stage Stochastic Decomposition (TPU)")
    star = "*" if r.iterations >= max_iter else ""
    out(f"Number of iterations               : {r.iterations}{star}")
    out(f"Number of unique observations      : {r.unique_omegas}")
    out(f"Lower bound estimate               : {r.incumb_est:f}")
    out(f"Total time                         : {r.time_total:f}")
    out(f"LPs solved                         : {r.lp_count}")
    out(f"Pool sizes (omega/lambda/sigma)    : {r.pool_sizes['omega']}/"
        f"{r.pool_sizes['lam']}/{r.pool_sizes['sigma']}")


def print_evaluation_summary(e: EvalResult, out=print) -> None:
    """Console summary (printEvaluationSummary, inout.c:61-71)."""
    out("\n------------------------------- Evaluation -------------------------------")
    out(f"Upper bound estimate               : {e.mean:f}")
    out(f"Error in estimation                : {e.error:f}")
    out(f"Confidence interval at 95%         : [{e.ci_low:f}, {e.ci_high:f}]")
    out(f"Number of observations             : {e.count}")


def write_all(output_dir: str, result: RunResult) -> None:
    os.makedirs(output_dir, exist_ok=True)
    write_detailed_results(os.path.join(output_dir, "detailedResults.csv"),
                           result)
    write_incumb(os.path.join(output_dir, "incumb.dat"), result)
    write_jsonl(os.path.join(output_dir, "results.jsonl"), result)
