"""Validate --time-phases substep estimates against a jax.profiler trace
(VERDICT r2 item 8 / weak #7).

``estimate_phase_times`` (utils/metrics.py) attributes the fused SD step's
cost to the reference's four runTime phases (twoSD.h:87-99) by dispatching
each jitted substep separately and scaling by call counts.  Two concerns it
left open: (a) host-clock brackets include tunnel-RPC overhead, and (b) the
final-state measurement point.  This script captures a real jax.profiler
trace on the device around N dispatches of each substep AND of the fused
step, parses the trace with jax.profiler.ProfileData, and compares:

  * device-time fractions per substep (trace)  vs  host-clock fractions
    (the estimate method);
  * sum of substep device times  vs  fused-step device time (how much the
    fusion saves = how conservative the estimates are).

Prints one JSON line; paste the table into RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

from stochasticdecomposition_tpu.utils.compilecache import (
    enable_persistent_cache,
)

enable_persistent_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

N_DISPATCH = 8


def device_times_from_trace(trace_dir):
    """Sum device-plane event durations per jit program name."""
    from jax.profiler import ProfileData

    # Find the serialized xspace file the trace context wrote.
    path = None
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                path = os.path.join(root, f)
    if path is None:
        raise RuntimeError(f"no .xplane.pb under {trace_dir}")
    data = ProfileData.from_file(path)
    totals = {}
    for plane in data.planes:
        name = plane.name or ""
        if "TPU" not in name and "device" not in name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                # Top-level events are the executed programs: jit(step),
                # jit(master_step), ...  Nested HLO-op lines repeat the
                # time, so only take events that look like program names.
                en = ev.name
                if en.startswith("jit(") or en.startswith("pjit"):
                    dur = ev.duration_ns if hasattr(ev, "duration_ns") else 0
                    totals[en] = totals.get(en, 0) + dur
    return {k: v / 1e9 for k, v in totals.items()}


def main():
    import argparse

    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default="pgp2like")
    ap.add_argument("--suite", action="store_true",
                    help="load from models/suite.py instead of instances.py")
    ap.add_argument("--steps", type=int, default=200,
                    help="iterations to run before measuring (fills pools)")
    ap.add_argument("--si", type=int, default=1)
    ap.add_argument("--max-iter", type=int, default=520)
    args = ap.parse_args()

    if args.suite:
        from stochasticdecomposition_tpu.models.suite import (
            load_suite_instance,
        )
        core, tim, stoc = load_suite_instance(args.instance)
    else:
        core, tim, stoc = load_instance(args.instance)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=args.max_iter, EVAL_FLAG=False,
                   SAMPLE_INCREMENT=args.si)
    solver = SDSolver(sp, cfg)

    # Run iterations first so pools are realistically full.
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(0))
    for _ in range(args.steps):
        state = solver.step(state)
    jax.block_until_ready(state)
    key = jax.random.PRNGKey(7)

    sub = solver.substeps
    fns = {
        "master": lambda: sub["master_step"](state),
        "subprob": lambda: sub["subprob_update"](state),
        "argmax": lambda: sub["cut_step"](state),
        "opttest": lambda: solver.full_test(state, key),
        "fused_step": lambda: solver.step(state),
    }
    # Compile everything outside the trace.
    for f in fns.values():
        jax.block_until_ready(f())

    # Host-clock estimates (the estimate_phase_times method).
    host = {}
    for name, f in fns.items():
        t0 = time.monotonic()
        for _ in range(N_DISPATCH):
            out = f()
        jax.block_until_ready(out)
        host[name] = (time.monotonic() - t0) / N_DISPATCH

    # Device trace around the same dispatches.
    tdir = tempfile.mkdtemp(prefix="sd_phase_trace_")
    with jax.profiler.trace(tdir):
        for name, f in fns.items():
            for _ in range(N_DISPATCH):
                out = f()
            jax.block_until_ready(out)
    dev_raw = device_times_from_trace(tdir)
    # Map program names back to phases.
    name_map = {"master": "master_step", "subprob": "subprob_update",
                "argmax": "cut_step", "opttest": "full_test",
                "fused_step": "step"}
    dev = {}
    for phase, prog in name_map.items():
        hits = [v for k, v in dev_raw.items() if prog in k]
        dev[phase] = sum(hits) / N_DISPATCH if hits else -1.0

    phases = ["master", "subprob", "argmax", "opttest"]
    host_tot = sum(host[p] for p in phases)
    dev_tot = sum(dev[p] for p in phases if dev[p] > 0)
    out = {
        "device": str(jax.devices()[0]),
        "instance": args.instance,
        "k_at_measurement": int(state.k),
        "host_ms": {p: round(host[p] * 1e3, 2) for p in fns},
        "device_ms": {p: round(dev[p] * 1e3, 3) for p in dev},
        "host_frac": {p: round(host[p] / host_tot, 3) for p in phases},
        "device_frac": {p: round(dev[p] / dev_tot, 3) for p in phases
                        if dev[p] > 0},
        "substep_sum_over_fused_device": round(
            dev_tot / dev["fused_step"], 2) if dev.get("fused_step", 0) > 0
        else -1.0,
        "substep_sum_over_fused_host": round(
            host_tot / host["fused_step"], 2),
        "trace_programs_found": sorted(dev_raw),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
