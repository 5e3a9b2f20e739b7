"""CLI, result writers, config parsing, and checkpoint round-trip tests."""

import os
import tempfile

import jax
import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig, load_config


def test_config_sd_roundtrip():
    text = """
// comment line
TOLERANCE    0.001
MIN_ITER 1
MAX_ITER   500
MASTER_TYPE 5
CUT_MULT  1
TAU 2
MIN_QUAD_SCALAR 0.001
RUN_SEED    3554548844580680
RUN_SEED    4650175399072632
EVAL_FLAG 1
EVAL_MIN_ITER 250
EVAL_ERROR 0.01
EVAL_SEED	2668655841019641
EVAL_SEED	8879657642464524
MAX_QUAD_SCALAR 10000.0
R1 0.2
R2 0.95
R3 2
DUAL_STABILITY	1
PI_EVAL_START 0
PI_CYCLE 1
BOOTSTRAP_REP 50
PERCENT_PASS 0.95
PRE_EPSILON 0.01
EPSILON 0.001
SCAN_LEN 256
MULTIPLE_REP 2
COMPROMISE_PROB	1
SAMPLE_INCREMENT 64
CHECK_EVERY 4
SUBPROB_F32_PIVOT 1
"""
    with tempfile.NamedTemporaryFile("w", suffix=".sd", delete=False) as fh:
        fh.write(text)
        path = fh.name
    cfg = load_config(path)
    os.unlink(path)
    assert cfg.MAX_ITER == 500
    assert cfg.RUN_SEED == [3554548844580680, 4650175399072632]
    assert cfg.MULTIPLE_REP == 2 and cfg.COMPROMISE_PROB
    # the production large-scale keys must round-trip through config.sd
    # (the reference's vestigial -s flag analog lives here, twoSD.c:69-117)
    assert cfg.SAMPLE_INCREMENT == 64 and cfg.CHECK_EVERY == 4
    assert cfg.SUBPROB_F32_PIVOT is True
    assert cfg.apply_tolerance_preset("l").EPSILON == 0.01


def test_mixed_integer_master_types_accepted():
    # MASTER_TYPE 1 (MILP) / 7 (MIQP), reference config.sd:10-11, run the
    # branch-and-bound master (core/bnb.py, tests/test_milp.py); the fused
    # chunk cadence must stay 1 so the host B&B sees every master solve.
    assert SDConfig(MASTER_TYPE=1).MASTER_TYPE == 1
    assert SDConfig(MASTER_TYPE=7).MASTER_TYPE == 7
    with pytest.raises(ValueError, match="CHECK_EVERY=1"):
        SDConfig(MASTER_TYPE=7, CHECK_EVERY=4)
    with pytest.raises(ValueError, match="unknown MASTER_TYPE"):
        SDConfig(MASTER_TYPE=3)


def test_seed_offset_rotates_banks():
    from stochasticdecomposition_tpu.cli import apply_seed_offset, build_parser

    args = build_parser().parse_args(["-p", "lands", "--seed-offset", "5"])
    assert args.seed_offset == 5
    base = SDConfig()
    cfg = apply_seed_offset(SDConfig(), 5)
    # Replication 0 now draws what bank entry 5 held; banks stay permutations.
    assert cfg.RUN_SEED[0] == base.RUN_SEED[5]
    assert cfg.EVAL_SEED[0] == base.EVAL_SEED[5]
    assert sorted(cfg.RUN_SEED) == sorted(base.RUN_SEED)
    # Offset 30 is a full rotation (identity).
    assert apply_seed_offset(SDConfig(), 30).RUN_SEED == base.RUN_SEED


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from stochasticdecomposition_tpu.cli import main

    rc = main(["-p", "lands", "-o", str(tmp_path), "-e", "0",
               "--max-iter", "60", "-t", "l"])
    assert rc == 0
    out = tmp_path / "twoSD_tpu" / "lands"
    assert (out / "detailedResults.csv").exists()
    assert (out / "incumb.dat").exists()
    assert (out / "results.jsonl").exists()
    header = (out / "detailedResults.csv").read_text().splitlines()[0]
    assert header.startswith("Replication\tIterations\tLB estimate")
    # summary.dat (algo.c:29-31): decompose summary + per-rep sections.
    summary = (out / "summary.dat").read_text()
    assert "Replication-1" in summary
    assert "First stage" in summary


@pytest.mark.slow
def test_cli_metrics_and_phase_times(tmp_path):
    from stochasticdecomposition_tpu.cli import main

    rc = main(["-p", "lands", "-o", str(tmp_path), "-e", "0",
               "--max-iter", "30", "--metrics-every", "5", "--time-phases"])
    assert rc == 0
    out = tmp_path / "twoSD_tpu" / "lands"
    metrics = (out / "metrics_rep00.jsonl").read_text().splitlines()
    assert len(metrics) >= 5
    import json as _json
    rec = _json.loads(metrics[0])
    assert {"k", "candid_est", "incumb_est", "quad_scalar"} <= set(rec)
    # Timer columns populated (not the -1 fused markers).
    row = (out / "detailedResults.csv").read_text().splitlines()[1].split("\t")
    t_master, t_sub, t_opt, t_arg = map(float, row[4:8])
    assert t_master > 0 and t_sub > 0 and t_arg > 0


@pytest.mark.slow
def test_checkpoint_roundtrip():
    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc
    from stochasticdecomposition_tpu.utils.checkpoint import (
        load_state, save_state,
    )

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=40, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(0))
    for _ in range(10):
        state = solver.step(state)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        save_state(path, state)
        fresh = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                           jax.random.PRNGKey(0))
        restored = load_state(path, fresh)

    # Continue both and compare: bit-identical resumption.
    a = solver.step(state)
    b = solver.step(restored)
    np.testing.assert_array_equal(np.asarray(a.candid_x),
                                  np.asarray(b.candid_x))
    assert int(a.k) == int(b.k)


@pytest.mark.slow
def test_checkpoint_missing_field_fails_loudly():
    """A checkpoint lacking an SDState field (older code version) must
    raise, not silently resume with mixed restored/fresh state (advisor
    r4 low)."""
    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc
    from stochasticdecomposition_tpu.utils.checkpoint import (
        load_state, save_state,
    )

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=40, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        save_state(path, state)
        data = dict(np.load(path))
        del data["quad_scalar"]
        np.savez_compressed(path, **data)
        fresh = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                           jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="quad_scalar"):
            load_state(path, fresh)


@pytest.mark.slow
def test_checkpoint_cadence_batched_stride(tmp_path):
    """Checkpoints must fire on ELAPSED k, not exact modulo: with
    SAMPLE_INCREMENT*CHECK_EVERY=32 the observed k never hits a multiple
    of 100, and the old modulo rule wrote nothing (advisor r4 medium)."""
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=320, EVAL_FLAG=False, SAMPLE_INCREMENT=8,
                   CHECK_EVERY=4, MIN_ITER=400)  # no stat stop before 320
    solver = SDSolver(sp, cfg)
    ckdir = str(tmp_path / "ck")
    solver.solve_replication(0, checkpoint_every=100, checkpoint_dir=ckdir)
    import glob
    ckpts = sorted(glob.glob(os.path.join(ckdir, "*.npz")))
    # k strides 32, 64, ..., 320: elapsed-k trigger fires at 128, 256.
    assert len(ckpts) >= 2, ckpts


@pytest.mark.slow
def test_sharded_eval_matches_single(monkeypatch):
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.core.evaluate import make_eval_batch
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.parallel.mesh import (
        make_mesh, make_sharded_eval,
    )
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("pgp2like")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MAX_ITER=40, EVAL_FLAG=False))

    mesh = make_mesh(n_rep=2, n_obs=4)
    batch = 64
    x = jnp.asarray(solver.mean_sol)
    key = jax.random.PRNGKey(3)
    with mesh:
        m_sh, m2_sh, ok_sh = make_sharded_eval(
            solver.pa, solver.spec, batch, mesh)(x, key)
    m1, m21, ok1 = make_eval_batch(solver.pa, solver.spec, batch)(x, key)
    assert int(ok_sh) == int(ok1)
    np.testing.assert_allclose(float(m_sh), float(m1), rtol=1e-10)
    np.testing.assert_allclose(float(m2_sh), float(m21), rtol=1e-8)


def test_mem_lane_cap_and_chunked_eval_equivalence(monkeypatch):
    """mem_lane_cap (HBM guard, RESULTS §4b): storm-class row counts shrink
    the per-dispatch width (a 512-lane 528-row f32 eval program measured a
    36.6 GB HBM peak against 15.75 GB); small shapes stay uncapped.  A
    batch forced through the chunked path must match the single-vmap
    dispatch."""
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.core.evaluate import make_eval_batch
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.ops import simplex
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    assert simplex.mem_lane_cap(528, 4) == 128   # storm f32 pivots
    assert simplex.mem_lane_cap(528, 8) == 64    # storm f64
    assert simplex.mem_lane_cap(175, 4) == 512   # ssn: uncapped
    assert simplex.mem_lane_cap(80, 8) == 512    # small: uncapped
    assert simplex.mem_lane_cap(5000, 8) == 8    # floor
    for m in (100, 300, 528, 900):
        cap = simplex.mem_lane_cap(m, 8)
        assert 8 <= cap <= simplex.MAX_VMAP_LANES
        assert cap & (cap - 1) == 0              # power of two

    core, tim, stoc = load_instance("pgp2like")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MAX_ITER=40, EVAL_FLAG=False))
    x = jnp.asarray(solver.mean_sol)
    key = jax.random.PRNGKey(7)
    ref = make_eval_batch(solver.pa, solver.spec, 32)(x, key)
    # shrink the budget so pgp2like's 7-row shape caps at 8 lanes -> the
    # same 32-draw batch runs as 4 lax.map chunks
    monkeypatch.setattr(simplex, "LANE_HBM_BUDGET", 300_000)
    assert simplex.mem_lane_cap(7, 8) == 8
    chunked = make_eval_batch(solver.pa, solver.spec, 32)(x, key)
    assert int(ref[2]) == int(chunked[2])
    np.testing.assert_allclose(float(ref[0]), float(chunked[0]), rtol=1e-12)
    np.testing.assert_allclose(float(ref[1]), float(chunked[1]), rtol=1e-10)


def test_staged_eval_matches_unstaged(monkeypatch):
    """The evaluator's kernel-fault staging (stage-1 bounded pivots +
    stage-2 straggler finish, RESULTS §4b.2 — added after stormhvlike's
    replication eval crashed the TPU worker) must be bit-equivalent to the
    plain path.  Forced on via tiny thresholds so stage 2 really trips."""
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.core.evaluate import make_eval_batch
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.ops import simplex
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("pgp2like")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MAX_ITER=40, EVAL_FLAG=False))
    x = jnp.asarray(solver.mean_sol)
    key = jax.random.PRNGKey(11)
    ref = make_eval_batch(solver.pa, solver.spec, 48)(x, key)
    # stage everything: any row count qualifies, stage 1 gets a 3-pivot
    # budget (pgp2like warm solves need more, so stragglers are real),
    # stage 2 finishes 2 lanes per trip
    monkeypatch.setattr(simplex, "STAGED_MIN_ROWS", 1)
    monkeypatch.setattr(simplex, "STAGE1_PIVOTS", 3)
    monkeypatch.setattr(simplex, "STAGE2_LANES", 2)
    monkeypatch.setattr(simplex, "STAGE1_MAX_LANES", 16)
    staged = make_eval_batch(solver.pa, solver.spec, 48)(x, key)
    assert int(ref[2]) == int(staged[2])        # every lane solved
    np.testing.assert_allclose(float(ref[0]), float(staged[0]), rtol=1e-12)
    np.testing.assert_allclose(float(ref[1]), float(staged[1]), rtol=1e-10)


@pytest.mark.slow
def test_cli_checkpoint_and_resume(tmp_path):
    """--checkpoint-every writes .npz saves; --resume restarts from one."""
    from stochasticdecomposition_tpu.cli import main

    rc = main(["-p", "lands", "-o", str(tmp_path), "-e", "0",
               "--max-iter", "30", "-t", "l", "--checkpoint-every", "10"])
    assert rc == 0
    ckpts = sorted(
        (tmp_path / "twoSD_tpu" / "lands" / "checkpoints").glob("*.npz"))
    assert len(ckpts) >= 2
    # resume from the k=10 save and run to 30 again
    rc = main(["-p", "lands", "-o", str(tmp_path / "resumed"), "-e", "0",
               "--max-iter", "30", "-t", "l", "--resume", str(ckpts[0])])
    assert rc == 0
    a = (tmp_path / "twoSD_tpu" / "lands" / "incumb.dat").read_text()
    b = (tmp_path / "resumed" / "twoSD_tpu" / "lands" /
         "incumb.dat").read_text()
    assert a == b   # bit-identical restart (same PRNG key in the state)
