"""Batched sampling (SAMPLE_INCREMENT > 1): the TPU inversion of the
reference's one-LP-per-iteration economics (SURVEY.md §7, the vestigial -s
flag of sd_experiments.sh:11).

k counts SAMPLES (matching the reference's iteration==sample bookkeeping),
advancing by the batch size per step; all batch subproblems solve as one
vmapped simplex dispatch and one SD cut covers the enlarged sample.  These
tests pin the semantics: objective parity with the sequential mode, correct
k bookkeeping, and a working statistical stop.  Also covers CHECK_EVERY
(chunked host stopping checks) and EVAL_F32_PIVOT.
"""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def _setup(name, **cfg_kw):
    core, tim, stoc = load_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    return SDSolver(sp, SDConfig(**cfg_kw)), ef_obj


@pytest.mark.slow
@pytest.mark.parametrize("batch", [4, 16])
def test_batched_sampling_objective_parity(batch):
    # Same sample budget as the sequential runs of test_e2e (k counts
    # samples); the solution must reach the extensive-form optimum within
    # the same tolerance as batch=1.
    solver, ef_obj = _setup("lands", MAX_ITER=160, EVAL_FLAG=False,
                            SAMPLE_INCREMENT=batch)
    r = solver.solve_replication(0)
    assert r.iterations <= 160
    # k advances by the batch size per step.
    assert r.iterations % batch == 0 or r.iterations == 160
    assert r.lp_count >= r.iterations  # one LP per sample (+incumbent cuts)
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.02, \
        f"batch={batch} solution off by {excess:.4f}"


@pytest.mark.slow
def test_batched_sampling_statistical_stop():
    # The dual-stability window is step-scaled (SCAN_LEN/batch); the
    # bootstrap full test must still terminate the run before MAX_ITER on
    # an easy instance.
    solver, ef_obj = _setup("lands", MAX_ITER=1600, EVAL_FLAG=False,
                            SAMPLE_INCREMENT=8, SCAN_LEN=128,
                            EPSILON=0.01)
    r = solver.solve_replication(0)
    assert r.optimal, "statistical stop did not fire in batched mode"
    assert r.iterations < 1600
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.02


@pytest.mark.slow
def test_check_every_chunked_stepping_matches():
    # CHECK_EVERY=4 runs 4 fused iterations per dispatch; a MAX_ITER-stop
    # run must produce the same trajectory as per-iteration dispatch.
    import jax

    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.core.step import make_step

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg1 = SDConfig(MAX_ITER=40, EVAL_FLAG=False)
    cfg4 = SDConfig(MAX_ITER=40, EVAL_FLAG=False, CHECK_EVERY=4)
    s1 = SDSolver(sp, cfg1)
    step1 = s1.step
    step4 = make_step(s1.pa, s1.spec, cfg4)

    st1 = init_state(s1.pa, s1.caps, cfg1, s1.mean_sol, jax.random.PRNGKey(7))
    st4 = init_state(s1.pa, s1.caps, cfg4, s1.mean_sol, jax.random.PRNGKey(7))
    for _ in range(8):
        st1 = step1(st1)
    for _ in range(2):
        st4 = step4(st4)
    assert int(st1.k) == int(st4.k) == 8
    np.testing.assert_allclose(np.asarray(st4.candid_x),
                               np.asarray(st1.candid_x), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(st4.incumb_est), float(st1.incumb_est),
                               rtol=1e-9)


@pytest.mark.parametrize("name,batch", [
    ("lands", 16),
    pytest.param("pgp2like", 24, marks=pytest.mark.slow),
])
def test_batch_pooling_identical_to_sequential_scan(name, batch):
    """stochastic_updates_batch (two-phase dedup + matmul delta fills) must
    produce EXACTLY the same pools — contents, slot order, counts, weights,
    delta tables — as a sequential scan of per-observation updates over the
    same vmapped LP results (the semantics it replaces in core/step.py)."""
    import jax
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.core.update import (
        calc_omega, calc_omega_batch, solve_subproblem, stochastic_updates,
        stochastic_updates_batch,
    )
    from stochasticdecomposition_tpu.sampler import sample_omega

    core, tim, stoc = load_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=64, EVAL_FLAG=False, SAMPLE_INCREMENT=batch)
    solver = SDSolver(sp, cfg)
    pa, tol = solver.pa, cfg.TOLERANCE
    state0 = init_state(pa, solver.caps, cfg, solver.mean_sol,
                        jax.random.PRNGKey(11))
    # Warm the pools with one batch, then compare on a second batch so both
    # pool-extension and dedup-against-pool paths are exercised.
    for rnd in range(2):
        w = sample_omega(solver.spec, jax.random.PRNGKey(100 + rnd), batch,
                         dtype=pa.c1.dtype) - pa.omega_mean[None, :]
        k = jnp.int32((rnd + 1) * batch)

        # (a) sequential reference: per-obs dedup + updates.
        st_a = state0
        oi_a, nf_a = [], []
        for i in range(batch):
            st_a, oi, nf = calc_omega(st_a, w[i], tol)
            oi_a.append(int(oi))
            nf_a.append(bool(nf))
        res_b = jax.vmap(lambda wi: solve_subproblem(
            pa, state0.candid_x, wi, init_basis=state0.warm_basis,
            init_at_upper=state0.warm_atup))(st_a.omega_vals[jnp.asarray(oi_a)])
        for i in range(batch):
            st_a, _ = stochastic_updates(
                pa, st_a, jax.tree.map(lambda a: a[i], res_b),
                jnp.int32(oi_a[i]), jnp.bool_(nf_a[i]), k, tol)

        # (b) batched path under test.
        st_b, oi_b, nf_b = calc_omega_batch(state0, w, tol)
        np.testing.assert_array_equal(np.asarray(oi_b), np.asarray(oi_a))
        np.testing.assert_array_equal(np.asarray(nf_b), np.asarray(nf_a))
        st_b = stochastic_updates_batch(pa, st_b, res_b, oi_b, nf_b, k, tol)

        for field in ("omega_vals", "omega_w", "omega_cnt", "lambda_vals",
                      "lambda_cnt", "sigma_pib", "sigma_piC", "sigma_lidx",
                      "sigma_ck", "sigma_feas", "sigma_cnt", "delta_pib",
                      "delta_piC"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_b, field)),
                np.asarray(getattr(st_a, field)), err_msg=field)
        state0 = st_b


def test_vmap_chunked_matches_raw_vmap():
    """vmap_chunked must be bit-identical to a raw vmap (CPU has no
    wide-vmap defect, so the raw dispatch is the oracle), including the
    padded-tail case where the batch is not a multiple of the cap."""
    import jax
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.ops.simplex import solve_lp, vmap_chunked

    rng = np.random.default_rng(3)
    m, n = 6, 10
    D = jnp.asarray(rng.standard_normal((m, n)))
    sense = jnp.asarray(rng.integers(-1, 2, m))
    d = jnp.asarray(rng.standard_normal(n))
    l = jnp.zeros(n)
    u = jnp.full(n, 10.0)
    bs = jnp.asarray(rng.standard_normal((37, m)))  # 37 = 4*8 + 5 padded tail

    fn = lambda b: solve_lp(D, sense, d, l, u, b)   # noqa: E731
    raw = jax.vmap(fn)(bs)
    chunked = vmap_chunked(fn, bs, max_lanes=8)
    for a, b in zip(raw, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sd_step_chunked_batch_identical(monkeypatch):
    """The SD loop's subproblem batch goes through vmap_chunked (the
    VERDICT-r4 silent-wrong-answer hole: a raw vmap at SAMPLE_INCREMENT
    width would miscompile on TPU above MAX_VMAP_LANES).  Shrinking the
    cap so a batch of 24 runs as 3 chunks must reproduce the unchunked
    step bit-for-bit."""
    import jax

    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.core.step import make_step
    from stochasticdecomposition_tpu.ops import simplex as simplex_mod

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=96, EVAL_FLAG=False, SAMPLE_INCREMENT=24)
    solver = SDSolver(sp, cfg)
    # Two identical fresh states (solver.step donates its argument).
    st_raw = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                        jax.random.PRNGKey(5))
    st_chk = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                        jax.random.PRNGKey(5))
    for _ in range(3):
        st_raw = solver.step(st_raw)

    monkeypatch.setattr(simplex_mod, "MAX_VMAP_LANES", 8)
    step_chunked = make_step(solver.pa, solver.spec, cfg)
    for _ in range(3):
        st_chk = step_chunked(st_chk)

    assert int(st_raw.k) == int(st_chk.k) == 72
    for field in ("candid_x", "incumb_x", "omega_vals", "omega_w",
                  "sigma_pib", "cut_alpha", "cut_beta", "pi_ratio"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_chk, field)),
            np.asarray(getattr(st_raw, field)), err_msg=field)


def test_staged_batch_solve_matches_unstaged():
    """The two-stage kernel-fault guard (SUBPROB_STAGED_BATCH: bounded
    stage-1 pivots at full width, 8-lane chunked finish) must reproduce
    the single-pass batched step exactly when no lane hits the stage-1
    budget — the guard changes WHERE pivots run, not the solves."""
    import jax

    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.core.step import make_step

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg_a = SDConfig(MAX_ITER=96, EVAL_FLAG=False, SAMPLE_INCREMENT=24,
                     SUBPROB_STAGED_BATCH=False)
    cfg_b = SDConfig(MAX_ITER=96, EVAL_FLAG=False, SAMPLE_INCREMENT=24,
                     SUBPROB_STAGED_BATCH=True)
    solver = SDSolver(sp, cfg_a)
    step_b = make_step(solver.pa, solver.spec, cfg_b)
    st_a = init_state(solver.pa, solver.caps, cfg_a, solver.mean_sol,
                      jax.random.PRNGKey(9))
    st_b = init_state(solver.pa, solver.caps, cfg_b, solver.mean_sol,
                      jax.random.PRNGKey(9))
    for _ in range(3):
        st_a = solver.step(st_a)
        st_b = step_b(st_b)
    assert int(st_a.k) == int(st_b.k) == 72
    for field in ("candid_x", "incumb_x", "cut_alpha", "cut_beta",
                  "sigma_pib", "warm_basis"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_b, field)),
            np.asarray(getattr(st_a, field)), err_msg=field)


def test_staged_batch_stage2_finishes_stragglers(monkeypatch):
    """Force stage 2: with a 2-pivot stage-1 budget every lane hits
    ITER_LIMIT, so the 8-lane chunked finish must complete the solves —
    the final state must match the unstaged step exactly (stage 2 has
    the full iteration budget and warm-starts from stage-1 bases)."""
    import jax

    from stochasticdecomposition_tpu.core import step as step_mod
    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.core.step import make_step

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg_a = SDConfig(MAX_ITER=64, EVAL_FLAG=False, SAMPLE_INCREMENT=16,
                     SUBPROB_STAGED_BATCH=False)
    cfg_b = SDConfig(MAX_ITER=64, EVAL_FLAG=False, SAMPLE_INCREMENT=16,
                     SUBPROB_STAGED_BATCH=True)
    solver = SDSolver(sp, cfg_a)
    monkeypatch.setattr(step_mod, "STAGE1_PIVOTS", 2)
    step_b = make_step(solver.pa, solver.spec, cfg_b)
    st_a = init_state(solver.pa, solver.caps, cfg_a, solver.mean_sol,
                      jax.random.PRNGKey(13))
    st_b = init_state(solver.pa, solver.caps, cfg_b, solver.mean_sol,
                      jax.random.PRNGKey(13))
    for _ in range(2):
        st_a = solver.step(st_a)
        st_b = step_b(st_b)
    assert bool(st_b.sp_feas), "stage 2 must finish the stragglers"
    for field in ("candid_x", "cut_alpha", "sigma_pib"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_b, field)),
            np.asarray(getattr(st_a, field)), err_msg=field)


@pytest.mark.slow
def test_sample_increment_1024_runs_chunked():
    """SI=1024 (above MAX_VMAP_LANES=512) is a legal public config; the
    step must run it through the lax.map chunked path and keep correct
    sample bookkeeping — no code path may reach a >512-lane vmapped
    solve_lp dispatch (VERDICT r4 item 2)."""
    solver, ef_obj = _setup("lands", MAX_ITER=2048, EVAL_FLAG=False,
                            SAMPLE_INCREMENT=1024, MAX_OMEGA=128,
                            MAX_LAMBDA=512, MAX_SIGMA=512)
    r = solver.solve_replication(0)
    assert r.iterations in (1024, 2048)
    ev = solver.evaluate_x(r.incumb_x)
    excess = (ev.mean - ef_obj) / abs(ef_obj)
    assert -0.01 < excess < 0.02


@pytest.mark.slow
def test_eval_f32_pivot_statistically_accurate():
    solver, ef_obj = _setup("pgp2like", MAX_ITER=120, EVAL_FLAG=False)
    r = solver.solve_replication(0)
    ev64 = solver.evaluate_x(r.incumb_x)
    solver.cfg.EVAL_F32_PIVOT = True
    solver.eval_batch_fn = None          # rebuild with f32 pivots
    ev32 = solver.evaluate_x(r.incumb_x)
    assert abs(ev32.mean - ev64.mean) / abs(ev64.mean) < 5e-3


def test_pool_overflow_fails_loudly():
    """Overflowed pools must signal (found live in the r5 occupancy
    study): omega overflow corrupts the sample stream (clamp-read of a
    wrong observation) -> RuntimeError; lambda/sigma overflow only
    weakens cuts -> RuntimeWarning."""
    from stochasticdecomposition_tpu.runner import check_pool_overflow

    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    # Unit contract (omega capacity is lane-aligned to >=128, so a tiny
    # instance cannot overflow it end-to-end; the check itself must).
    solver = SDSolver(sp, SDConfig(MAX_ITER=24, EVAL_FLAG=False))
    with pytest.raises(RuntimeError, match="omega pool overflowed"):
        check_pool_overflow(solver.caps.O + 1, 0, 0, solver.caps)
    with pytest.warns(RuntimeWarning, match="dual-vertex pools"):
        check_pool_overflow(0, solver.caps.L + 1, 0, solver.caps)
    # Integration: tiny lambda/sigma pools overflow on a real run and
    # the replication warns (still completes — cuts are valid).
    solver = SDSolver(sp, SDConfig(MAX_ITER=24, EVAL_FLAG=False,
                                   MAX_LAMBDA=1, MAX_SIGMA=1))
    with pytest.warns(RuntimeWarning, match="dual-vertex pools"):
        solver.solve_replication(0)


@pytest.mark.slow
def test_batched_certification_deep_stop():
    """Batched runs reach the STATISTICAL stop with solution quality at
    least batch-1's (VERDICT r3 item 3).  The pi_ratio window is
    calibrated in SAMPLES (SCAN_LEN spans the same history at any
    SAMPLE_INCREMENT; a steps-counted window needed >2.5k samples' history
    at B=64), while the proximal dynamics stay per-master-solve
    (QS_RELAX_PER_SAMPLE=False default): certification needs roughly the
    same number of master solves as batch-1, bought with ~40x cheaper
    samples — the certified stop lands deeper AND with a smaller exact
    gap than batch-1 (device: pgp2like B=64 certifies at 11,776 samples,
    gap 0.00043 vs batch-1's 0.00196 at 264).  Pool capacities are
    overridden to the dedup'd finite support so deep runs stay small."""
    solver, ef_obj = _setup("lands", MAX_ITER=32768, EVAL_FLAG=False,
                            SAMPLE_INCREMENT=64, CHECK_EVERY=4,
                            MAX_OMEGA=128, MAX_LAMBDA=512, MAX_SIGMA=512)
    r = solver.solve_replication(0)
    assert r.optimal, "batched run must stop statistically, not on MAX_ITER"
    from stochasticdecomposition_tpu.models.extensive import (
        enumerate_scenarios, exact_objective_fn,
    )
    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    exact = exact_objective_fn(solver.pa, outs, probs)
    gap = abs(float(exact(r.incumb_x)) - ef_obj) / abs(ef_obj)
    # batch-1 lands stops at 261 samples with gap ~0.00045.
    assert gap <= 0.002, gap
