"""Emulated multi-host execution of the meshed replication driver.

Launches 2 OS processes joined by jax.distributed (CPU backend, 4 virtual
devices each — the BASELINE.md ">= 2 hosts" row in emulation), runs the
production meshed driver over the global 8-device (rep, obs) mesh, and
checks:

  * both processes complete the SPMD program and agree on every
    replication's results;
  * the results match the single-process meshed/sequential driver exactly
    (same seeds -> same iterations/incumbents, test_mesh_runner contract);
  * the compromise epilogue and its artifacts exist on the COORDINATOR
    process only (compromise.c:249-311 gathers to one aggregation point).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_meshed_run_matches_single_process(tmp_path):
    nproc = 2
    port = _free_port()
    env = dict(os.environ)
    # The workers configure their own platform/device count; scrub any
    # pytest-process XLA_FLAGS so the 4-device setting is theirs alone.
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    payloads = []
    for pid in range(nproc):
        with open(tmp_path / f"proc{pid}.json") as fh:
            payloads.append(json.load(fh))

    # Coordinator gating: epilogue ran exactly on process 0.
    assert payloads[0]["is_coordinator"] and payloads[0]["compromise_ran"]
    assert not payloads[1]["is_coordinator"]
    assert not payloads[1]["compromise_ran"]

    # Both processes executed the same SPMD program -> identical results.
    for r0, r1 in zip(payloads[0]["replications"],
                      payloads[1]["replications"]):
        assert r0["iterations"] == r1["iterations"]
        assert r0["optimal"] == r1["optimal"]
        np.testing.assert_allclose(r0["incumb_x"], r1["incumb_x"],
                                   rtol=1e-12, atol=1e-12)

    # Cross-check against the single-process drivers (same seeds/config).
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MAX_ITER=60, EVAL_FLAG=False,
                                   MULTIPLE_REP=2, COMPROMISE_PROB=True))
    seq = solver.run()
    for r_mh, r_seq in zip(payloads[0]["replications"], seq.replications):
        assert r_mh["iterations"] == r_seq.iterations
        assert r_mh["optimal"] == r_seq.optimal
        np.testing.assert_allclose(r_mh["incumb_x"], r_seq.incumb_x,
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(r_mh["incumb_est"], r_seq.incumb_est,
                                   rtol=1e-8, atol=1e-8)
        assert r_mh["pool_sizes"] == r_seq.pool_sizes
    np.testing.assert_allclose(payloads[0]["compromise_x"],
                               seq.compromise_x, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(payloads[0]["average_x"],
                               seq.average_x, rtol=1e-6, atol=1e-8)
