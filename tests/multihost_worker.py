"""Worker process for the emulated multi-host test (not a pytest module).

Launched by tests/test_multihost.py as N separate OS processes joined by
jax.distributed (gRPC coordination service on localhost) — the CPU-backend
emulation of a multi-host TPU slice.  Each process owns 4 virtual CPU
devices; the global (rep, obs) mesh spans all processes, so the meshed
replication driver (parallel/runner.py) executes as a true multi-controller
SPMD program, and the compromise epilogue + file writes must land on the
coordinator only (compromise.c:249-311 aggregation point).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    outdir = sys.argv[4]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from stochasticdecomposition_tpu.parallel.distributed import (
        is_coordinator, maybe_initialize,
    )
    assert maybe_initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.parallel.mesh import make_mesh
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=60, EVAL_FLAG=False, MULTIPLE_REP=2,
                   COMPROMISE_PROB=True)
    solver = SDSolver(sp, cfg)

    mesh = make_mesh(n_rep=2, n_obs=2 * nproc, devices=jax.devices())
    result = solver.run(mesh=mesh)

    # Every process reports what it produced; the test asserts the
    # compromise epilogue ran on the coordinator ONLY.
    payload = {
        "process_id": pid,
        "is_coordinator": bool(is_coordinator()),
        "compromise_ran": result.compromise_x is not None,
        "replications": [
            {
                "rep": r.rep,
                "iterations": r.iterations,
                "optimal": r.optimal,
                "incumb_est": r.incumb_est,
                "incumb_x": [float(v) for v in r.incumb_x],
                "pool_sizes": r.pool_sizes,
            }
            for r in result.replications
        ],
    }
    if result.compromise_x is not None:
        payload["compromise_x"] = [float(v) for v in result.compromise_x]
        payload["average_x"] = [float(v) for v in result.average_x]
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as fh:
        json.dump(payload, fh)
    print(f"proc {pid} ok", flush=True)


if __name__ == "__main__":
    main()
