"""Production multi-device replication driver vs the sequential path.

The meshed driver (parallel/runner.py) must reproduce the sequential
driver's per-replication results exactly: same seeds, same stopping
decisions, same feasibility handling (VERDICT r1 item 1's done criterion).
Runs on the virtual 8-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.parallel.mesh import make_mesh
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

pytestmark = pytest.mark.slow


def _solver(name, **cfg_kw):
    core, tim, stoc = load_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    return SDSolver(sp, SDConfig(**cfg_kw))


def _compare(seq, mesh):
    assert len(seq.replications) == len(mesh.replications)
    for rs, rm in zip(seq.replications, mesh.replications):
        assert rs.rep == rm.rep
        assert rs.iterations == rm.iterations, \
            f"rep {rs.rep}: {rs.iterations} vs {rm.iterations} iterations"
        assert rs.optimal == rm.optimal
        np.testing.assert_allclose(rm.incumb_x, rs.incumb_x,
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(rm.incumb_est, rs.incumb_est,
                                   rtol=1e-8, atol=1e-8)
        assert rs.unique_omegas == rm.unique_omegas
        assert rs.pool_sizes == rm.pool_sizes


def test_meshed_replications_match_sequential():
    solver = _solver("lands", MAX_ITER=60, EVAL_FLAG=False,
                     MULTIPLE_REP=2, COMPROMISE_PROB=True)
    seq = solver.run()
    mesh = make_mesh(n_rep=2, n_obs=4)
    msh = solver.run(mesh=mesh)
    _compare(seq, msh)
    # Compromise epilogue works off the meshed batch entries too.
    assert msh.compromise_x is not None
    np.testing.assert_allclose(msh.compromise_x, seq.compromise_x,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(msh.average_x, seq.average_x,
                               rtol=1e-6, atol=1e-8)


def test_meshed_feasibility_mode_matches_sequential():
    # feastest triggers per-replication host feasibility handling inside the
    # meshed wave (extract -> resolve -> scatter back).
    solver = _solver("feastest", MAX_ITER=40, EVAL_FLAG=False,
                     MULTIPLE_REP=2)
    seq = solver.run()
    assert any(r.feas_rounds > 0 for r in seq.replications)
    msh = solver.run(mesh=make_mesh(n_rep=2, n_obs=4))
    _compare(seq, msh)
    for rs, rm in zip(seq.replications, msh.replications):
        assert rs.feas_rounds == rm.feas_rounds


def test_meshed_wave_scheduling_more_reps_than_mesh():
    # 3 replications over a 2-wide rep axis: two waves, second wave padded.
    solver = _solver("lands", MAX_ITER=30, EVAL_FLAG=False, MULTIPLE_REP=3)
    seq = solver.run()
    msh = solver.run(mesh=make_mesh(n_rep=2, n_obs=4))
    _compare(seq, msh)


def test_meshed_checkpoint_cadence_batched_stride(tmp_path):
    """Meshed checkpoints fire on ELAPSED k (advisor r4 medium): with
    SAMPLE_INCREMENT=8 the observed kmin never hits most multiples of
    checkpoint_every=10, and the old exact-modulo rule only aligned at
    lcm(8,10)=40 — the very end of this run."""
    ck = str(tmp_path / "ck")
    solver = _solver("lands", MAX_ITER=40, EVAL_FLAG=False, MULTIPLE_REP=2,
                     SAMPLE_INCREMENT=8)
    mesh = make_mesh(n_rep=2, n_obs=4)
    solver.run(mesh=mesh, checkpoint_every=10, checkpoint_dir=ck)
    import glob
    import os
    mids = sorted(glob.glob(os.path.join(ck, "mesh_wave00_k*.npz")))
    # Elapsed-k trigger: fires at k=16 and k=32 (stride 8, >=10 elapsed).
    assert len(mids) >= 2, os.listdir(ck)


def test_meshed_checkpoint_resume_bit_identical(tmp_path):
    """A killed --mesh run resumes bit-identically (VERDICT r3 item 7):
    3 reps over a 2-wide rep axis exercises BOTH the in-progress-wave
    restore and the finished-wave-final rebuild path."""
    ck = str(tmp_path / "ck")
    solver = _solver("lands", MAX_ITER=40, EVAL_FLAG=False, MULTIPLE_REP=3)
    mesh = make_mesh(n_rep=2, n_obs=4)
    full = solver.run(mesh=mesh, checkpoint_every=16, checkpoint_dir=ck)

    import glob
    import os
    # Resume the SECOND wave (rep 2) from its mid-run checkpoint; wave 0's
    # results must come back from mesh_wave00_final.npz.
    cks = sorted(glob.glob(os.path.join(ck, "mesh_wave02_k*.npz")))
    assert cks, os.listdir(ck)
    assert os.path.exists(os.path.join(ck, "mesh_wave00_final.npz"))
    resumed = solver.run(mesh=mesh, resume_from=cks[0])
    _compare(full, resumed)
    for rf, rr in zip(full.replications, resumed.replications):
        np.testing.assert_array_equal(rr.incumb_x, rf.incumb_x)
        assert rr.incumb_est == rf.incumb_est
