"""The STOCH_CHECK oracle as a property test.

Reference: the compile-gated STOCH_CHECK block in formSDCut (cuts.c:64-76)
re-solves the subproblem for every stored observation and compares against
the argmax estimate.  Here it is a real test: after N iterations, for every
stored observation the masked argmax height at the candidate must (a) never
exceed the true subproblem optimum (cut validity / lower-bound property) and
(b) match it exactly for observations whose optimal dual is already pooled.
"""

import jax
import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.cuts import height_table
from stochasticdecomposition_tpu.core.state import init_state
from stochasticdecomposition_tpu.core.update import solve_subproblem
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.models.synthetic import parse_synthetic
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def _run_steps(name_or_parse, n_steps, cfg=None):
    if isinstance(name_or_parse, str):
        core, tim, stoc = load_instance(name_or_parse)
    else:
        core, tim, stoc = name_or_parse
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = cfg or SDConfig(MAX_ITER=n_steps + 10, EVAL_FLAG=False)
    solver = SDSolver(sp, cfg)
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(7))
    for _ in range(n_steps):
        state = solver.step(state)
    return solver, state


def _check_heights(solver, state, x):
    H, s_valid, o_valid = height_table(solver.pa, state, x)
    Hm = np.where(np.array(s_valid)[:, None], np.array(H), -1e300)
    hstar = Hm.max(axis=0)
    ocnt = int(state.omega_cnt)
    exact = 0
    for o in range(ocnt):
        res = solve_subproblem(solver.pa, x, state.omega_vals[o])
        true_h = float(res.obj)
        assert hstar[o] <= true_h + 1e-6, \
            f"argmax height {hstar[o]} exceeds true objective {true_h}"
        if abs(hstar[o] - true_h) < 1e-7:
            exact += 1
    return ocnt, exact


@pytest.mark.parametrize("name,steps,min_exact_frac", [
    ("lands", 40, 1.0), ("pgp2like", 60, 0.8)])
@pytest.mark.slow
def test_stoch_check_property(name, steps, min_exact_frac):
    solver, state = _run_steps(name, steps)
    ocnt, exact = _check_heights(solver, state, state.candid_x)
    assert ocnt > 0
    # On these RHS-random problems the dual vertex pool quickly covers the
    # support: heights should be (mostly) exact.
    assert exact >= min_exact_frac * ocnt


@pytest.mark.slow
def test_stoch_check_random_C():
    parse = parse_synthetic(seed=11, n_rv=2, support=2, rand_C=2)
    solver, state = _run_steps(parse, 40)
    ocnt, exact = _check_heights(solver, state, state.candid_x)
    assert ocnt > 0
    assert exact >= 1   # at minimum the newest observation is exact


@pytest.mark.slow
def test_cut_is_lower_bound_everywhere():
    # Validity: each cut's height at arbitrary x must lower-bound the true
    # expected recourse over stored observations (with the empirical weights),
    # since every dual vertex is feasible for every observation (RHS case).
    solver, state = _run_steps("lands", 30)
    rng = np.random.default_rng(0)
    k = int(state.k)
    w = np.array(state.omega_w)[:int(state.omega_cnt)].astype(float)
    from stochasticdecomposition_tpu.ops.simplex import STATUS_OPTIMAL
    checked = 0
    for _ in range(6):
        x = np.abs(rng.normal(3.0, 1.5, solver.pa.c1.shape[0]))
        true_h = []
        feasible = True
        for o in range(int(state.omega_cnt)):
            res = solve_subproblem(solver.pa, x.astype(float),
                                   state.omega_vals[o])
            if int(res.status) != STATUS_OPTIMAL:
                feasible = False   # h(x, w) = +inf: bound holds trivially
                break
            true_h.append(float(res.obj))
        if not feasible:
            continue
        checked += 1
        emp = float(w @ np.array(true_h)) / k
        alpha = np.array(state.cut_alpha)
        beta = np.array(state.cut_beta)
        mask = np.array(state.cut_mask)
        ns = np.array(state.cut_ns)
        for j in np.where(mask)[0]:
            height = (ns[j] / k) * (alpha[j] - beta[j] @ x)
            # (1 - ns/k) * lb term is zero (trivial lb).
            assert height <= emp + 1e-6
    assert checked >= 1


@pytest.mark.slow
def test_pallas_triple_argmax_interpret_matches_xla():
    """Kernel vs jnp fallback (interpret mode; both VMEM-whole and DMA-stream
    paths, plus the empty-mask sentinel case)."""
    import jax.numpy as jnp

    from stochasticdecomposition_tpu.ops.pallas_argmax import (
        _MASK_ROW_BYTES, _VMEM_BUDGET, _WHOLE_MULT, triple_masked_argmax,
        triple_masked_argmax_xla,
    )

    rng = np.random.default_rng(3)
    for S, O in [(37, 128), (300, 256), (3000, 1024)]:
        H = jnp.asarray(rng.normal(size=(S, O)))
        bm = jnp.asarray(rng.random(S) < 0.8)
        om = bm & jnp.asarray(rng.random(S) < 0.5)
        nm = bm & ~om
        path = ("whole" if _WHOLE_MULT * S * O * 4
                + S * _MASK_ROW_BYTES <= _VMEM_BUDGET else "stream")
        got = triple_masked_argmax(H, bm, om, nm, interpret=True)
        want = triple_masked_argmax_xla(H, bm, om, nm)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       err_msg=f"{path} S={S} O={O}")
        em = jnp.zeros(S, bool)
        got = triple_masked_argmax(H, bm, em, em, interpret=True)
        want = triple_masked_argmax_xla(H, bm, em, em)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_pallas_path_working_set_accounting():
    """Path selection must budget the kernel's VMEM working set (input block
    PLUS the Mosaic-materialized iota and masked-copy temporaries), not just
    the input block.  Regression: a [1544, 1152] f32 table chose the
    whole-VMEM path under input-only accounting and hit the 16 MiB
    scoped-vmem limit at 21.2 MiB on device (3 x 7.1 MiB live)."""
    from stochasticdecomposition_tpu.ops.pallas_argmax import (
        _MASK_ROW_BYTES, _STREAM_MULT, _VMEM_BUDGET, _WHOLE_MULT,
        pallas_path_available,
    )

    S, O = 1544, 1152
    # The regression shape must still have a kernel path (stream), but the
    # whole-VMEM working set must now be over budget.
    assert pallas_path_available(S, O)
    assert _WHOLE_MULT * S * O * 4 + S * _MASK_ROW_BYTES > _VMEM_BUDGET
    # A pool too tall for even a 128-lane stream chunk has no kernel path.
    S_huge = (_VMEM_BUDGET // (_STREAM_MULT * 128 * 4)) + 64
    assert not pallas_path_available(S_huge, 1280)
    # Non-lane-aligned observation axis has no kernel path.
    assert not pallas_path_available(100, 130)
    # The stream working set at the chosen minimum chunk stays in budget.
    S8 = ((S + 7) // 8) * 8
    assert _STREAM_MULT * S8 * 128 * 4 + S8 * _MASK_ROW_BYTES \
        <= _VMEM_BUDGET
