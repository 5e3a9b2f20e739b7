"""Command line interface.

Mirrors the reference CLI (parseCmdLine, twoSD.c:67-128): ``-p`` problem
name, ``-i`` input dir, ``-o`` output dir, ``-e`` eval flag, ``-d`` dual
stability, ``-t {l,n,t}`` tolerance preset, ``-m`` replications, ``-c``
compromise; plus ``--config`` for a config.sd file (readConfig,
twoSD.c:152-254).

Usage:  python -m stochasticdecomposition_tpu.cli -p lands -i <dir> -o out/
Built-in instances resolve without ``-i`` (e.g. ``-p lands``).
"""

from __future__ import annotations

import argparse
import os
import sys

from stochasticdecomposition_tpu.config import SDConfig, load_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="twoSD-tpu",
        description="TPU-native two-stage stochastic decomposition")
    p.add_argument("-p", dest="prob_name", required=True,
                   help="problem name (SMPS base name or built-in instance)")
    p.add_argument("-i", dest="input_dir", default=None,
                   help="directory with <prob>.cor/.tim/.sto")
    p.add_argument("-o", dest="output_dir", default="./output",
                   help="output directory for result files")
    p.add_argument("-e", dest="eval_flag", type=int, default=None,
                   help="evaluate the final solution out of sample {0,1}")
    p.add_argument("-d", dest="dual_stability", type=int, default=None,
                   help="use the dual stability test {0,1}")
    p.add_argument("-t", dest="tolerance", choices=["l", "n", "t"],
                   default=None, help="tolerance preset: loose/nominal/tight")
    p.add_argument("-m", dest="multiple_rep", type=int, default=None,
                   help="number of replications")
    p.add_argument("-c", dest="compromise", type=int, default=None,
                   help="build and solve the compromise problem {0,1}")
    p.add_argument("--config", dest="config_path", default=None,
                   help="path to a config.sd file")
    p.add_argument("--max-iter", dest="max_iter", type=int, default=None)
    p.add_argument("--checkpoint-every", dest="checkpoint_every", type=int,
                   default=0, metavar="N",
                   help="save the full solver state every N iterations")
    p.add_argument("--checkpoint-dir", dest="checkpoint_dir", default=None)
    p.add_argument("--resume", dest="resume_from", default=None,
                   metavar="CKPT.npz",
                   help="resume replication 0 from a saved state")
    p.add_argument("--seed-offset", dest="seed_offset", type=int, default=0,
                   metavar="K",
                   help="rotate the RUN_SEED/EVAL_SEED banks by K entries so "
                        "replication r uses seed bank entry (r+K) mod 30 — "
                        "lets independent jobs cover disjoint seeds")
    p.add_argument("--metrics-every", dest="metrics_every", type=int,
                   default=0, metavar="N",
                   help="write a per-iteration JSONL metrics stream "
                        "(metrics_repNN.jsonl) every N iterations")
    p.add_argument("--time-phases", dest="time_phases", action="store_true",
                   help="estimate per-phase times (master/subproblem/"
                        "optimality/argmax) for detailedResults.csv via "
                        "substep dispatch timing")
    p.add_argument("--mesh", dest="mesh", default=None, metavar="RxO",
                   help="run replications over a (rep x obs) device mesh, "
                        "e.g. --mesh 2x4 (requires R*O <= device count)")
    p.add_argument("--distributed", dest="distributed", action="store_true",
                   help="initialize the JAX multi-host runtime before "
                        "building the mesh (coordinates from the "
                        "environment: COORDINATOR_ADDRESS/NUM_PROCESSES/"
                        "PROCESS_ID, or cloud auto-detection)")
    return p


def apply_seed_offset(cfg: SDConfig, offset: int) -> SDConfig:
    """Rotate the RUN_SEED/EVAL_SEED banks (config.sd:22-52,64-93) so
    replication r draws bank entry (r + offset) mod bank size — lets
    independent jobs cover disjoint seeds (``--seed-offset``)."""
    off = offset % len(cfg.RUN_SEED)
    cfg.RUN_SEED = cfg.RUN_SEED[off:] + cfg.RUN_SEED[:off]
    offe = offset % len(cfg.EVAL_SEED)
    cfg.EVAL_SEED = cfg.EVAL_SEED[offe:] + cfg.EVAL_SEED[:offe]
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from stochasticdecomposition_tpu.utils.compilecache import (
        enable_persistent_cache,
    )
    enable_persistent_cache()
    jax.config.update("jax_enable_x64", True)

    if args.distributed:
        from stochasticdecomposition_tpu.parallel.distributed import (
            maybe_initialize,
        )
        maybe_initialize()

    cfg = load_config(args.config_path) if args.config_path else SDConfig()
    if args.eval_flag is not None:
        cfg.EVAL_FLAG = bool(args.eval_flag)
    if args.dual_stability is not None:
        cfg.DUAL_STABILITY = bool(args.dual_stability)
    if args.tolerance is not None:
        cfg.apply_tolerance_preset(args.tolerance)
    if args.multiple_rep is not None:
        cfg.MULTIPLE_REP = args.multiple_rep
    if args.compromise is not None:
        cfg.COMPROMISE_PROB = bool(args.compromise)
    if args.max_iter is not None:
        cfg.MAX_ITER = args.max_iter
    if args.seed_offset:
        apply_seed_offset(cfg, args.seed_offset)
    if cfg.MULTIPLE_REP == 1:
        cfg.COMPROMISE_PROB = False

    from stochasticdecomposition_tpu.models.instances import INSTANCES, load_instance
    from stochasticdecomposition_tpu.models.suite import SUITE, load_suite_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc
    from stochasticdecomposition_tpu.smps import read_smps
    from stochasticdecomposition_tpu.utils import io as sdio

    if args.input_dir:
        core, tim, stoc = read_smps(args.input_dir, args.prob_name)
    elif args.prob_name in INSTANCES:
        core, tim, stoc = load_instance(args.prob_name)
    elif args.prob_name in SUITE:
        core, tim, stoc = load_suite_instance(args.prob_name)
    else:
        print(f"unknown problem {args.prob_name!r}: provide -i or use one of "
              f"{sorted(INSTANCES) + sorted(SUITE)}", file=sys.stderr)
        return 2

    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, cfg)

    def log(s):
        sys.stdout.write(s)
        sys.stdout.flush()

    print("Starting two-stage stochastic decomposition (TPU).")
    if args.resume_from and not os.path.exists(args.resume_from):
        print(f"checkpoint not found: {args.resume_from}", file=sys.stderr)
        return 2
    ckpt_dir = args.checkpoint_dir
    if args.checkpoint_every and not ckpt_dir:
        ckpt_dir = os.path.join(args.output_dir, "twoSD_tpu",
                                args.prob_name, "checkpoints")
    mesh = None
    if args.mesh:
        from stochasticdecomposition_tpu.parallel.mesh import make_mesh
        try:
            n_rep, n_obs = (int(v) for v in args.mesh.lower().split("x"))
        except ValueError:
            print(f"--mesh expects RxO (e.g. 2x4), got {args.mesh!r}",
                  file=sys.stderr)
            return 2
        mesh = make_mesh(n_rep=n_rep, n_obs=n_obs,
                         devices=jax.devices()[:n_rep * n_obs])
    out_dir = os.path.join(args.output_dir, "twoSD_tpu", args.prob_name)
    sdio.decompose_summary(sp, out=print)
    result = solver.run(log=log, checkpoint_every=args.checkpoint_every,
                        checkpoint_dir=ckpt_dir,
                        resume_from=args.resume_from, mesh=mesh,
                        metrics_every=args.metrics_every,
                        metrics_dir=out_dir if args.metrics_every else None,
                        time_phases=args.time_phases)
    print()
    # Result files/summaries are owned by the coordinator process; worker
    # processes in a multi-host run exit quietly after the meshed program
    # (the compromise epilogue was already coordinator-gated in run()).
    from stochasticdecomposition_tpu.parallel.distributed import (
        is_coordinator,
    )
    if not is_coordinator():
        return 0
    for r in result.replications:
        sdio.print_optimization_summary(r, cfg.MAX_ITER)
        if r.eval is not None:
            sdio.print_evaluation_summary(r.eval)

    sdio.write_all(out_dir, result, sp=sp, max_iter=cfg.MAX_ITER)
    print(f"\nResults written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
