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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402,F401

N_DISPATCH = 8


def device_times_from_trace(trace_dir):
    """Per-program compute busy-seconds from a jax.profiler trace.

    The host plane's ``python`` line carries ``PjitFunction(<name>)``
    events marking when each program was dispatched.  main() dispatches
    the programs in disjoint sequential blocks with a barrier between
    them, so each program owns the wall window [its first dispatch start,
    next program's first dispatch start); every compute-thunk event (the
    non-``python`` lines, ThreadpoolListener bookkeeping excluded) inside
    that window is attributed to it.  Sums are thread-busy seconds (XLA:CPU
    runs thunks on a pool), so compare them as FRACTIONS.  The tunneled
    TPU backend emits no compute planes at all — callers fall back to
    host-clock-only there."""
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

    starts = {}                       # program -> first dispatch start_ns
    compute = []                      # (start_ns, end_ns) of compute events
    for plane in data.planes:
        for line in plane.lines:
            if line.name == "python":
                for ev in line.events:
                    n = ev.name
                    if n.startswith("PjitFunction("):
                        prog = n[len("PjitFunction("):-1]
                        s = starts.get(prog)
                        if s is None or ev.start_ns < s:
                            starts[prog] = ev.start_ns
            else:
                for ev in line.events:
                    if ev.name.startswith("ThreadpoolListener"):
                        continue
                    compute.append((ev.start_ns, ev.end_ns))
    if not starts or not compute:
        return {}
    order = sorted(starts, key=starts.get)
    bounds = [starts[p] for p in order] + [float("inf")]
    totals = {}
    for i, prog in enumerate(order):
        lo, hi = bounds[i], bounds[i + 1]
        busy = sum(min(e, hi) - max(s, lo)
                   for s, e in compute if e > lo and s < hi)
        totals[prog] = busy / 1e9
    return totals


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
    # solver.step donates its argument, so it must never consume the shared
    # `state` the other substeps keep reading: give the fused step its own
    # state chain (also the realistic usage — state evolves through it).
    box = {"s": jax.tree_util.tree_map(jnp.copy, state)}

    def _fused():
        box["s"] = solver.step(box["s"])
        return box["s"]

    fns = {
        "master": lambda: sub["master_step"](state),
        "subprob": lambda: sub["subprob_update"](state),
        "argmax": lambda: sub["cut_step"](state),
        "opttest": lambda: solver.full_test(state, key),
        "fused_step": _fused,
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

    # Device trace around the same dispatches.  The axon remote-tunnel TPU
    # backend rejects dispatches under an active profiler trace
    # (InvalidArgument), so tracing is best-effort: on that backend the
    # validation runs host-clock-only here and the trace-based method
    # check runs on the CPU backend (--cpu), whose XLA:CPU planes parse
    # fine with jax.profiler.ProfileData.
    trace_error = None
    dev_raw = {}
    try:
        tdir = tempfile.mkdtemp(prefix="sd_phase_trace_")
        with jax.profiler.trace(tdir):
            for name, f in fns.items():
                for _ in range(N_DISPATCH):
                    out = f()
                jax.block_until_ready(out)
        dev_raw = device_times_from_trace(tdir)
    except Exception as e:  # noqa: BLE001 — report, don't die
        trace_error = str(e)[:160]
    # Map program names back to phases.
    name_map = {"master": "master_step", "subprob": "subprob_update",
                "argmax": "cut_step", "opttest": "full_test",
                "fused_step": "step"}
    dev = {}
    for phase, prog in name_map.items():
        # Exact program-name match first ("step" is a substring of
        # "master_step"/"cut_step"); substring only as a fallback.
        if prog in dev_raw:
            hits = [dev_raw[prog]]
        else:
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
        "device_ms": {p: round(dev[p] * 1e3, 3) for p in dev if dev[p] > 0},
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
    if trace_error:
        out["device_trace_error"] = trace_error
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
