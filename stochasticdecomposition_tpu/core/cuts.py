"""SD cut formation: the argmax procedure as a dense masked max-reduce.

Reference: ``computeIstar`` (stocUpdate.c:142-190) loops over bases per
observation; here the whole height table H[sigma, obs] is one fused tensor
expression and the per-observation argmax / weighted accumulation of
(alpha, beta) (SDCut, cuts.c:91-194) is a batched reduce — the natural TPU
shape of the algorithm's hot loop.  Also: cut heights (cuts.c:197-227), the
dual-stability ratio (cuts.c:112-128,171-182) and cut-pool management
(addCut2Pool / reduceCuts, cuts.c:261-360,610-661).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState

_NEG = -1e300


def jax_backend_is_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def height_table(pa: ProblemArrays, state: SDState, x):
    """H[s, o] = sigma.pib + delta.pib - (sigma.piC)'x - (delta.piC)'x
    for every stored dual vertex s and observation o, plus validity masks.

    This is the argmax kernel of computeIstar (stocUpdate.c:161-184): height
    of dual vertex s's affine function at first-stage point x under
    observation o.
    """
    nCc = pa.C_cols.shape[0]
    piCbarX = state.sigma_piC @ x[pa.C_cols] if nCc else \
        jnp.zeros_like(state.sigma_pib)
    dpib = state.delta_pib[state.sigma_lidx]                  # [S, O]
    if pa.C_cols_rand.shape[0] and pa.rv_C_rows.shape[0]:
        dpiCx = state.delta_piC[state.sigma_lidx] @ x[pa.C_cols_rand]
    else:
        dpiCx = jnp.zeros_like(dpib)
    H = (state.sigma_pib - piCbarX)[:, None] + dpib - dpiCx   # [S, O]

    s_ids = jnp.arange(H.shape[0])
    o_ids = jnp.arange(H.shape[1])
    s_valid = (s_ids < state.sigma_cnt) & state.sigma_feas    # feasFlag gate
    o_valid = o_ids < state.omega_cnt
    return H, s_valid, o_valid


class CutParts(NamedTuple):
    alpha: jnp.ndarray        # scalar
    beta: jnp.ndarray         # [n1]
    istar: jnp.ndarray        # [O] int32
    height: jnp.ndarray       # [O] argmax height per observation
    found: jnp.ndarray        # bool: every active obs had a valid vertex


def _argmax_masked(H, s_mask):
    Hm = jnp.where(s_mask[:, None], H, _NEG)
    istar = jnp.argmax(Hm, axis=0).astype(jnp.int32)          # [O]
    hstar = jnp.max(Hm, axis=0)
    return istar, hstar


def _argmax_masked2(H, mask2d):
    """Masked per-observation argmax with a full [pool, O] mask."""
    Hm = jnp.where(mask2d, H, _NEG)
    istar = jnp.argmax(Hm, axis=0).astype(jnp.int32)          # [O]
    hstar = jnp.max(Hm, axis=0)
    return istar, hstar


def _accumulate(pa: ProblemArrays, state: SDState, istar, o_valid, k):
    """Weighted (alpha, beta) sums over observations (cuts.c:160-168,184-188)."""
    n1 = pa.c1.shape[0]
    w = jnp.where(o_valid, state.omega_w, 0).astype(state.sigma_pib.dtype)
    kf = jnp.asarray(k, state.sigma_pib.dtype)

    pib_sel = state.sigma_pib[istar]                          # [O]
    lidx_sel = state.sigma_lidx[istar]                        # [O]
    o_ids = jnp.arange(istar.shape[0])
    dpib_sel = state.delta_pib[lidx_sel, o_ids]               # [O]
    alpha = jnp.sum(w * (pib_sel + dpib_sel)) / kf

    beta = jnp.zeros(n1, state.sigma_pib.dtype)
    if pa.C_cols.shape[0]:
        piC_sel = state.sigma_piC[istar]                      # [O, nCc]
        beta = beta.at[pa.C_cols].add(jnp.sum(w[:, None] * piC_sel, axis=0))
    if pa.C_cols_rand.shape[0] and pa.rv_C_rows.shape[0]:
        dpiC_sel = state.delta_piC[lidx_sel, o_ids]           # [O, nCr]
        beta = beta.at[pa.C_cols_rand].add(
            jnp.sum(w[:, None] * dpiC_sel, axis=0))
    beta = beta / kf
    return alpha, beta


def form_cut(pa: ProblemArrays, state: SDState, x, k, *,
             dual_stability: bool, pi_eval_start: int, pi_cycle: int,
             scan_len: int, batch: int = 1):
    """SDCut (cuts.c:91-194): argmax over the vertex pool for every
    observation, weighted cut coefficients, and the dual-stability update.

    With random costs the pool axis is the basis pool and heights carry
    per-column cost multipliers (randcost.py); otherwise it is the sigma
    pool directly.  Returns (CutParts, state) — state carries the
    pi_ratio/dual_stable update.
    """
    has_rand_d = int(pa.rv_d_cols.shape[0]) > 0
    dtype = state.sigma_pib.dtype
    kf = jnp.asarray(k, dtype)
    # 10% holdout split (computeIstar:147-157): "old" vertices were found
    # at ck <= k - (0.1k + 1); "new" ones after.
    ns_eff = k - jnp.floor(0.1 * kf + 1).astype(k.dtype)

    if has_rand_d:
        from stochasticdecomposition_tpu.core.randcost import (
            accumulate_randcost, triple_argmax_randcost,
        )

        ck_arr = state.basis_ck
        # Fused blockwise reduction: never materializes the [B, nd, O]
        # gather or masked height tables (the v2.0 analog of the plain
        # path's Pallas kernel).
        i_all, h_all, i_old, h_old, i_new, h_new, o_valid = \
            triple_argmax_randcost(pa, state, x,
                                   ck_arr <= ns_eff, ck_arr > ns_eff)
        accumulate = lambda st, istar, ov, kk: accumulate_randcost(
            pa, st, istar, ov, kk)
    else:
        H, s_valid, o_valid = height_table(pa, state, x)
        ck_arr = state.sigma_ck
        om1 = s_valid & (ck_arr <= ns_eff)
        nm1 = s_valid & (ck_arr > ns_eff)

        # Plain path on TPU: one fused Pallas pass produces all three masked
        # (argmax, max) reductions with a single read of H.
        from stochasticdecomposition_tpu.ops.pallas_argmax import (
            pallas_path_available, triple_masked_argmax,
        )

        if jax_backend_is_tpu() and \
                pallas_path_available(H.shape[0], H.shape[1]):
            i_all, h_all, i_old, h_old, i_new, h_new = triple_masked_argmax(
                H, s_valid, om1, nm1)
        else:
            i_all, h_all = _argmax_masked(H, s_valid)
            if dual_stability:
                i_old, h_old = _argmax_masked(H, om1)
                i_new, h_new = _argmax_masked(H, nm1)
            else:
                i_old = i_new = i_all
                h_old = h_new = h_all
        accumulate = lambda st, istar, ov, kk: _accumulate(
            pa, st, istar, ov, kk)

    if dual_stability:
        # pi_eval gate (cuts.c:112-113): every PI_CYCLE iters past the start.
        pi_eval = (k > pi_eval_start) & (jnp.mod(k, pi_cycle) == 0) \
            if pi_cycle > 1 else (k > pi_eval_start)
        use_new = h_new > h_old
        istar_split = jnp.where(use_new, i_new, i_old)
        h_split = jnp.maximum(h_old, h_new)
        istar = jnp.where(pi_eval, istar_split, i_all)
        hstar = jnp.where(pi_eval, h_split, h_all)

        w = jnp.where(o_valid, state.omega_w, 0).astype(dtype)
        cumm_old = jnp.sum(w * jnp.maximum(h_old - pa.lb, 0.0))
        cumm_all = jnp.sum(w * jnp.maximum(h_split - pa.lb, 0.0))
        ratio = cumm_old / jnp.where(cumm_all == 0.0, 1.0, cumm_all)
        ratio = jnp.where(cumm_all == 0.0, 1.0, ratio)

        # Rolling window indexed by the STEP number k/batch, mirroring the
        # reference's pi_ratio[numSamples % SCAN_LEN] (cuts.c:172): the
        # candidate and incumbent cuts of one iteration share a slot (the
        # second write overwrites the first), and the window counts
        # iterations, NOT form_cut calls.  In batched-sampling mode the
        # caller passes scan_len = ceil(SCAN_LEN / batch) steps
        # (SDConfig.eff_scan_len) so the window spans the SAME number of
        # SAMPLES at any batch size — SCAN_LEN is calibrated in samples,
        # exactly as the reference's numSamples indexing.
        step_idx = (k // batch) if batch > 1 else k
        slot = jnp.mod(step_idx, scan_len)
        pi_ratio = jnp.where(pi_eval, state.pi_ratio.at[slot].set(ratio),
                             state.pi_ratio)
        ratio_cnt = jnp.where(pi_eval, state.ratio_cnt + 1, state.ratio_cnt)

        # variance over the window (calcVariance, cuts.c:366-396); only
        # meaningful once the window has fully wrapped — the reference gates
        # on numSamples - PI_EVAL_START > SCAN_LEN (cuts.c:173-176); the
        # gate here is likewise in SAMPLES (scan_len*batch >= SCAN_LEN).
        window = pi_ratio[:scan_len]
        var = jnp.var(window) * scan_len / (scan_len - 1)
        have_window = (k - pi_eval_start) > scan_len * batch
        variance = jnp.where(have_window, var, 1.0)

        stable = ~((jnp.abs(variance) >= 2e-6) | (ratio < 0.95))
        dual_stable = jnp.where(pi_eval, stable, state.dual_stable)
        state = state._replace(pi_ratio=pi_ratio, dual_stable=dual_stable,
                               ratio_cnt=ratio_cnt)
    else:
        istar, hstar = i_all, h_all

    alpha, beta = accumulate(state, istar, o_valid, k)
    found = jnp.all(~o_valid | (hstar > _NEG / 2))
    return CutParts(alpha=alpha, beta=beta, istar=istar, height=hstar,
                    found=found), state


def cut_heights_at(pa: ProblemArrays, state: SDState, x, k):
    """Height of every pooled cut at x with the sample-size discounting
    (cutHeight, cuts.c:213-227):  (j/k)(alpha - beta'x) + (1 - j/k) lb."""
    dtype = state.cut_alpha.dtype
    kf = jnp.asarray(k, dtype)
    t_over_k = state.cut_ns.astype(dtype) / kf
    raw = state.cut_alpha - state.cut_beta @ x
    return t_over_k * raw + (1.0 - t_over_k) * pa.lb


def max_cut_height(pa: ProblemArrays, state: SDState, x, k):
    """maxCutHeight (cuts.c:197-209) over active cut slots.

    With NO active cuts (only possible transiently in feasibility mode when
    the first cut was skipped) the approximation of E[h] is just its lower
    bound — matching the setup-time estimate candid_est = c'x + lb
    (setup.c:102)."""
    h = cut_heights_at(pa, state, x, k)
    return jnp.where(jnp.any(state.cut_mask),
                     jnp.max(jnp.where(state.cut_mask, h, _NEG)), pa.lb)


def add_cut(pa: ProblemArrays, state: SDState, parts: CutParts, k, *,
            incumbent: bool, tol: float):
    """addCut2Pool (cuts.c:616-661) + reduceCuts eviction (cuts.c:277-320).

    Slot discipline: free slot if available; otherwise CANDIDATE cuts evict
    the oldest slack non-incumbent cut (else the lowest non-incumbent cut at
    candidX), INCUMBENT cuts replace the old incumbent slot.

    A cut whose argmax found no valid vertex for some observation
    (``parts.found`` False — the istar < 0 error of cuts.c:136-139, possible
    when the pool holds only extreme-ray entries during feasibility mode) is
    NOT stored: every write below is masked off and ``state.cut_ok`` records
    the skip so the host loop can raise when it happens outside feasibility
    recovery.  Returns (state, slot)."""
    K = state.cut_mask.shape[0]
    ids = jnp.arange(K)
    full = jnp.sum(state.cut_mask) >= K
    free_slot = jnp.argmin(state.cut_mask)        # first False

    is_inc_slot = ids == state.i_cut_idx
    if incumbent:
        evict_slot = state.i_cut_idx
    else:
        # Oldest (min numSamples) slack cut: |pi| <= tol, not incumbent.
        slack = (jnp.abs(state.pi_cuts) <= tol) & state.cut_mask & ~is_inc_slot
        ns_key = jnp.where(slack, state.cut_ns, jnp.int32(2 ** 30))
        oldest = jnp.argmin(ns_key)
        any_slack = jnp.any(slack)
        # Fallback: min height at candidX among non-incumbent cuts.
        h = cut_heights_at(pa, state, state.candid_x, k)
        h_key = jnp.where(state.cut_mask & ~is_inc_slot, h, jnp.inf)
        lowest = jnp.argmin(h_key)
        evict_slot = jnp.where(any_slack, oldest, lowest).astype(jnp.int32)

    slot = jnp.where(full, evict_slot, free_slot).astype(jnp.int32)

    ok = parts.found

    def _set(arr, val):
        return arr.at[slot].set(jnp.where(ok, val, arr[slot]))

    state = state._replace(
        cut_alpha=_set(state.cut_alpha, parts.alpha),
        cut_beta=_set(state.cut_beta, parts.beta),
        cut_ns=_set(state.cut_ns, jnp.asarray(k, state.cut_ns.dtype)),
        cut_omega_cnt=_set(state.cut_omega_cnt, state.omega_cnt),
        cut_istar=_set(state.cut_istar, parts.istar),
        cut_mask=_set(state.cut_mask, jnp.bool_(True)),
        pi_cuts=_set(state.pi_cuts, jnp.asarray(0.0, state.pi_cuts.dtype)),
        cut_ok=state.cut_ok & ok,
    )
    if incumbent:
        state = state._replace(
            i_cut_idx=jnp.where(ok, slot, state.i_cut_idx),
            i_cut_updt=jnp.where(ok, jnp.asarray(k, state.i_cut_updt.dtype),
                                 state.i_cut_updt))
    return state, jnp.where(ok, slot, state.i_cut_idx).astype(jnp.int32)
