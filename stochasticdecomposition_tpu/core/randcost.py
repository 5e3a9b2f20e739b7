"""Random-cost (v2.0) basis machinery.

Reference: randCost.c + the basis branches of stocUpdate.c.  With random cost
coefficients d(w) the subproblem dual depends on w; per discovered basis the
dual decomposes as  pi(w) = piDet + sum_n phi_n * w_n  (decomposeDualSolution,
randCost.c:182-199) where phi_n are dual-basis-inverse rows for basic columns
with random costs (calcBasis, randCost.c:19-123).  Heights, cut coefficients
and reformed cuts then carry per-column multipliers (the observation's cost
components), and every (basis, observation) pair has a dual-feasibility mask
(checkBasisFeasibility, randCost.c:202-258).

Layout deviation (documented in state.py): phi/psi/sigma_idx slots are
indexed by d-RV with a presence mask instead of the reference's packed
arrays — same math, static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState
from stochasticdecomposition_tpu.core.update import (
    calc_lambda, calc_sigma, compute_mu, delta_new_omega_column,
)
from stochasticdecomposition_tpu.ops.simplex import AT_UPPER, STATUS_OPTIMAL

_NEG = -1e300


def _wd(pa: ProblemArrays, state: SDState):
    """d-block (cost) components of every stored observation: [O, nd]."""
    nb = pa.rv_b_rows.shape[0]
    nC = pa.rv_C_rows.shape[0]
    nd = pa.rv_d_cols.shape[0]
    return state.omega_vals[:, nb + nC:nb + nC + nd]


def check_basis_obs(pa: ProblemArrays, sense_ge, sense_le,
                    phi_b, present_b, pidet_b, gbar_b, psi_b, cstat_b,
                    wd_o, tol):
    """checkBasisFeasibility (randCost.c:202-258) for one basis x one obs."""
    wdm = jnp.where(present_b, wd_o, 0.0)                       # [nd]
    theta = wdm @ phi_b                                         # [m2]
    pi_o = pidet_b + theta
    row_ok = jnp.all(~(((pi_o < -tol) & sense_ge) |
                       ((pi_o > tol) & sense_le)))
    rc = gbar_b.at[pa.rv_d_cols].add(wd_o) - wdm @ psi_b        # [n2]
    col_ok = jnp.all(~((rc < -tol) & (cstat_b != AT_UPPER)))
    return row_ok & col_ok


def _sense_masks(pa: ProblemArrays):
    return pa.sense2 == 1, pa.sense2 == -1


def refresh_obs_feas_new_omega(pa: ProblemArrays, state: SDState, o_idx,
                               tol: float) -> SDState:
    """New observation: re-check every stored basis against it
    (stocUpdate.c:27-31)."""
    sge, sle = _sense_masks(pa)
    wd_o = _wd(pa, state)[o_idx]

    def one(phi_b, present_b, pidet_b, gbar_b, psi_b, cstat_b):
        return check_basis_obs(pa, sge, sle, phi_b, present_b, pidet_b,
                               gbar_b, psi_b, cstat_b, wd_o, tol)

    feas_col = jax.vmap(one)(state.basis_phi, state.basis_present,
                             state.basis_pidet, state.basis_gbar,
                             state.basis_psi, state.basis_cstat)
    return state._replace(obs_feas=state.obs_feas.at[:, o_idx].set(feas_col))


def stochastic_updates_randcost(pa: ProblemArrays, state: SDState, res,
                                o_idx, new_o, k, tol: float):
    """The nd>0 variant of stochasticUpdates (stocUpdate.c:14-133)."""
    nd = int(pa.rv_d_cols.shape[0])
    m2 = int(pa.D.shape[0])
    n2 = int(pa.D.shape[1])
    nb = pa.rv_b_rows.shape[0]
    nC = pa.rv_C_rows.shape[0]
    dtype = state.sigma_pib.dtype

    # New observation: delta column + basis feasibility refresh.
    state = lax.cond(new_o, lambda s: delta_new_omega_column(pa, s, o_idx),
                     lambda s: s, state)
    state = lax.cond(new_o,
                     lambda s: refresh_obs_feas_new_omega(pa, s, o_idx, tol),
                     lambda s: s, state)

    feasible = res.status == STATUS_OPTIMAL

    def _ray_branch(state):
        """Infeasible subproblem: only the Farkas ray enters the pools
        (sigma entry with feasFlag false); no basis is stored."""
        ray = res.farkas
        rd = ray @ pa.D
        u_fin = jnp.where(jnp.isfinite(pa.u2), pa.u2, 0.0)
        l_fin = jnp.where(jnp.isfinite(pa.l2), pa.l2, 0.0)
        mub_ray = -jnp.sum(u_fin * jnp.maximum(rd, 0.0) +
                           l_fin * jnp.minimum(rd, 0.0))
        state2, lidx, new_lam = calc_lambda(pa, state, ray, tol)
        state2, _, _ = calc_sigma(pa, state2, ray, mub_ray, lidx, new_lam,
                                  jnp.bool_(False), k, tol)
        return state2

    def _basis_branch(state):
        B = state.basis_cstat.shape[0]
        ids = jnp.arange(B)
        cstat8 = res.cstat.astype(jnp.int8)
        rstat8 = res.rstat.astype(jnp.int8)

        # ---- dedup 1: identical (cstat, rstat) (stocUpdate.c:39-53) ----
        same = jnp.all(state.basis_cstat == cstat8[None, :], axis=1) & \
            jnp.all(state.basis_rstat == rstat8[None, :], axis=1) & \
            state.basis_feas & (ids < state.basis_cnt)
        found1 = jnp.any(same)

        def _known(s):
            return s, jnp.argmax(same).astype(jnp.int32)

        def _new(s: SDState):
            w = s.omega_vals[o_idx]
            delta_d = w[nb + nC:nb + nC + nd]                    # [nd]

            # calcBasis (randCost.c:19-123): phi rows, psi tableau, gBar.
            eq = res.basis[:, None] == pa.rv_d_cols[None, :]     # [m2, nd]
            present = jnp.any(eq, axis=0)                        # [nd]
            pos = jnp.argmax(eq, axis=0)                         # [nd]
            phi = jnp.where(present[:, None], res.binv[pos], 0.0)  # [nd, m2]
            psi = phi @ pa.D                                     # [nd, n2]
            dbar_B = jnp.where(res.basis < n2,
                               pa.d_bar[jnp.clip(res.basis, 0, n2 - 1)], 0.0)
            yrow = dbar_B @ res.binv                             # [m2]
            gbar = pa.d_bar - yrow @ pa.D                        # [n2]
            pidet = res.pi - jnp.where(present, delta_d, 0.0) @ phi
            mub = compute_mu(res)

            # Pool piDet and each phi column (stocUpdate.c:78-99).
            s2, lidx, new_lam = calc_lambda(pa, s, pidet, tol)
            s2, sidx0, new_sig0 = calc_sigma(
                pa, s2, pidet, mub, lidx, new_lam, jnp.bool_(True), k, tol)
            any_new = new_sig0
            sidx_phi = jnp.zeros(nd, jnp.int32)
            for n in range(nd):
                phin = jnp.where(present[n], phi[n], jnp.zeros(m2, dtype))
                s2, lidx_n, new_lam_n = calc_lambda(pa, s2, phin, tol)
                s2, sidx_n, new_sig_n = calc_sigma(
                    pa, s2, phin, jnp.asarray(0.0, dtype), lidx_n, new_lam_n,
                    jnp.bool_(True), k, tol)
                sidx_phi = sidx_phi.at[n].set(
                    jnp.where(present[n], sidx_n, 0))
                any_new = any_new | (new_sig_n & present[n])

            # ---- dedup 2: same sigma signature (stocUpdate.c:101-114) ----
            same2 = (state.basis_sigma0 == sidx0) & \
                jnp.all(state.basis_present == present[None, :], axis=1) & \
                jnp.all(jnp.where(state.basis_present,
                                  state.basis_sigma_idx == sidx_phi[None, :],
                                  True), axis=1) & \
                state.basis_feas & (ids < state.basis_cnt) & \
                state.obs_feas[:, o_idx] & ~any_new
            found2 = jnp.any(same2)

            def _dup(s3):
                return s3, jnp.argmax(same2).astype(jnp.int32)

            def _store(s3: SDState):
                bi = s3.basis_cnt
                s3 = s3._replace(
                    basis_cstat=s3.basis_cstat.at[bi].set(cstat8),
                    basis_rstat=s3.basis_rstat.at[bi].set(rstat8),
                    basis_phi=s3.basis_phi.at[bi].set(phi),
                    basis_present=s3.basis_present.at[bi].set(present),
                    basis_sigma0=s3.basis_sigma0.at[bi].set(sidx0),
                    basis_sigma_idx=s3.basis_sigma_idx.at[bi].set(sidx_phi),
                    basis_pidet=s3.basis_pidet.at[bi].set(pidet),
                    basis_gbar=s3.basis_gbar.at[bi].set(gbar),
                    basis_psi=s3.basis_psi.at[bi].set(psi),
                    basis_mub=s3.basis_mub.at[bi].set(mub),
                    basis_ck=s3.basis_ck.at[bi].set(k),
                    basis_feas=s3.basis_feas.at[bi].set(True),
                    basis_cnt=bi + 1,
                )
                # obsFeasible for the new basis vs all observations
                # (stocUpdate.c:119-127).
                sge, sle = _sense_masks(pa)
                WD = _wd(pa, s3)                                  # [O, nd]

                def one(wd_o):
                    return check_basis_obs(pa, sge, sle, phi, present,
                                           pidet, gbar, psi, cstat8,
                                           wd_o, tol)

                feas_row = jax.vmap(one)(WD)
                o_mask = jnp.arange(WD.shape[0]) < s3.omega_cnt
                s3 = s3._replace(
                    obs_feas=s3.obs_feas.at[bi, :].set(feas_row & o_mask))
                return s3, bi.astype(jnp.int32)

            return lax.cond(found2, _dup, _store, s2)

        return lax.cond(found1, _known, _new, state)

    def _feasible_path(state):
        state2, _bi = _basis_branch(state)
        return state2

    state = lax.cond(feasible, _feasible_path, _ray_branch, state)
    return state


def height_table_randcost(pa: ProblemArrays, state: SDState, x):
    """computeIstar heights over (basis, obs) with cost multipliers
    (stocUpdate.c:161-184, randCost branch).

    Materializes the full [B, nd, O] gather — used by tests as the
    reference implementation; the production argmax path is the fused
    blockwise reduction below (triple_argmax_randcost)."""
    from stochasticdecomposition_tpu.core.cuts import height_table

    # T[s, o]: plain per-sigma-entry heights (the c-th component values).
    T, _sv, o_valid = height_table(pa, state, x)
    WD = _wd(pa, state)                                         # [O, nd]

    T0 = T[state.basis_sigma0]                                  # [B, O]
    Tn = T[state.basis_sigma_idx]                                # [B, nd, O]
    mult = jnp.where(state.basis_present[:, None, :],
                     WD[None, :, :], 0.0)                       # [B, O, nd]
    H = T0 + jnp.einsum("bon,bno->bo", mult, Tn)                 # [B, O]

    ids = jnp.arange(H.shape[0])
    b_valid = (ids < state.basis_cnt) & state.basis_feas
    bo_valid = b_valid[:, None] & state.obs_feas                # [B, O]
    return H, bo_valid, o_valid


def triple_argmax_randcost(pa: ProblemArrays, state: SDState, x,
                           old_gate, new_gate, block: int = 256):
    """Fused (argmax, max) over the basis pool for the three dual-stability
    masks (all / old / new), WITHOUT materializing the [B, nd, O] gather or
    any masked [B, O] height table.

    The v2.0 argmax hot loop (stocUpdate.c:161-184 randCost branch) scans
    the basis pool in blocks: per block the heights
        H[b, o] = T[sigma0[b], o] + sum_n present[b,n] WD[o,n] T[sn[b,n], o]
    are one gather + one einsum over [block, nd, O], immediately reduced
    into six running [O] carries — peak memory O(block*nd*O) instead of
    O(B*nd*O), and one pass over the pool instead of three.  This is the
    XLA analog of the plain path's Pallas triple-argmax (ops/pallas_argmax);
    a Pallas version would need per-row dynamic VMEM gathers, which Mosaic
    does not lower.

    old_gate/new_gate: [B] bools (the ck-window split).  Returns
    (i_all, h_all, i_old, h_old, i_new, h_new), each [O]."""
    from stochasticdecomposition_tpu.core.cuts import height_table

    T, _sv, o_valid = height_table(pa, state, x)                # [S, O]
    WD = _wd(pa, state)                                         # [O, nd]
    dtype = T.dtype
    B = state.basis_sigma0.shape[0]
    O = T.shape[1]
    nblk = -(-B // block)
    Bp = nblk * block

    def pad(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((Bp - B,) + a.shape[1:], fill, a.dtype)], axis=0) \
            if Bp > B else a

    s0 = pad(state.basis_sigma0)
    sn = pad(state.basis_sigma_idx)
    present = pad(state.basis_present, False)
    obs_feas = pad(state.obs_feas, False)
    ids = jnp.arange(Bp)
    b_valid = (ids < state.basis_cnt) & pad(state.basis_feas, False)
    og = pad(old_gate, False) & b_valid
    ng = pad(new_gate, False) & b_valid

    neg = jnp.asarray(_NEG, dtype)
    init = tuple(jnp.full(O, neg) if i % 2 else jnp.zeros(O, jnp.int32)
                 for i in range(6))   # (i_all, h_all, i_old, h_old, i_new, h_new)

    def body(carry, blk):
        lo = blk * block
        s0_b = lax.dynamic_slice_in_dim(s0, lo, block)
        sn_b = lax.dynamic_slice_in_dim(sn, lo, block)
        pr_b = lax.dynamic_slice_in_dim(present, lo, block)
        of_b = lax.dynamic_slice_in_dim(obs_feas, lo, block)
        bv_b = lax.dynamic_slice_in_dim(b_valid, lo, block)
        og_b = lax.dynamic_slice_in_dim(og, lo, block)
        ng_b = lax.dynamic_slice_in_dim(ng, lo, block)
        idx_b = lo + jnp.arange(block)

        T0 = T[s0_b]                                            # [blk, O]
        Tn = T[sn_b]                                            # [blk, nd, O]
        mult = jnp.where(pr_b[:, None, :], WD[None, :, :], 0.0)
        Hb = T0 + jnp.einsum("bon,bno->bo", mult, Tn)           # [blk, O]
        base = bv_b[:, None] & of_b

        ia, ha, io, ho, inw, hn = carry

        def upd(gate, h_best, i_best):
            Hm = jnp.where(gate[:, None] & base, Hb, neg)
            h_blk = jnp.max(Hm, axis=0)
            i_blk = idx_b[jnp.argmax(Hm, axis=0)].astype(jnp.int32)
            better = h_blk > h_best
            return (jnp.where(better, h_blk, h_best),
                    jnp.where(better, i_blk, i_best))

        ha, ia = upd(bv_b, ha, ia)
        ho, io = upd(og_b, ho, io)
        hn, inw = upd(ng_b, hn, inw)
        return (ia, ha, io, ho, inw, hn), ()

    (ia, ha, io, ho, inw, hn), _ = lax.scan(body, init, jnp.arange(nblk))
    return ia, ha, io, ho, inw, hn, o_valid


def accumulate_randcost(pa: ProblemArrays, state: SDState, istar, o_valid, k):
    """Cut (alpha, beta) accumulation with multipliers (cuts.c:142-159)."""
    n1 = pa.c1.shape[0]
    dtype = state.sigma_pib.dtype
    kf = jnp.asarray(k, dtype)
    O = istar.shape[0]
    o_ids = jnp.arange(O)
    w = jnp.where(o_valid, state.omega_w, 0).astype(dtype)      # [O]
    WD = _wd(pa, state)                                         # [O, nd]

    s0 = state.basis_sigma0[istar]                              # [O]
    sn = state.basis_sigma_idx[istar]                            # [O, nd]
    mult = jnp.where(state.basis_present[istar], WD, 0.0)       # [O, nd]

    pib0 = state.sigma_pib[s0] + \
        state.delta_pib[state.sigma_lidx[s0], o_ids]            # [O]
    pibn = state.sigma_pib[sn] + \
        state.delta_pib[state.sigma_lidx[sn], o_ids[:, None]]   # [O, nd]
    alpha = jnp.sum(w * (pib0 + jnp.sum(mult * pibn, axis=1))) / kf

    beta = jnp.zeros(n1, dtype)
    if pa.C_cols.shape[0]:
        piC0 = state.sigma_piC[s0]                               # [O, nCc]
        piCn = state.sigma_piC[sn]                               # [O, nd, nCc]
        contrib = w[:, None] * (piC0 + jnp.einsum("on,onc->oc", mult, piCn))
        beta = beta.at[pa.C_cols].add(jnp.sum(contrib, axis=0))
    if pa.C_cols_rand.shape[0] and pa.rv_C_rows.shape[0]:
        dpiC0 = state.delta_piC[state.sigma_lidx[s0], o_ids]     # [O, nCr]
        dpiCn = state.delta_piC[state.sigma_lidx[sn], o_ids[:, None]]
        contrib = w[:, None] * (dpiC0 +
                                jnp.einsum("on,onc->oc", mult, dpiCn))
        beta = beta.at[pa.C_cols_rand].add(jnp.sum(contrib, axis=0))
    beta = beta / kf
    return alpha, beta

def reform_cuts_randcost(pa: ProblemArrays, state: SDState, counts):
    """reformCuts (optimal.c:187-236) with cost multipliers: rebuild every
    cut's (alpha, beta) under resampled observation counts using the stored
    per-observation basis indices."""
    K, O = state.cut_istar.shape
    n1 = pa.c1.shape[0]
    dtype = state.sigma_pib.dtype
    kf = jnp.asarray(state.k, dtype)
    o_ids = jnp.arange(O)

    valid = o_ids[None, :] < state.cut_omega_cnt[:, None]       # [K, O]
    eff = jnp.where(valid, counts[None, :], 0).astype(dtype)    # [K, O]

    istar = state.cut_istar                                     # [K, O]
    WD = _wd(pa, state)                                         # [O, nd]
    s0 = state.basis_sigma0[istar]                              # [K, O]
    sn = state.basis_sigma_idx[istar]                           # [K, O, nd]
    mult = jnp.where(state.basis_present[istar],
                     WD[None, :, :], 0.0)                       # [K, O, nd]

    pib0 = state.sigma_pib[s0] + \
        state.delta_pib[state.sigma_lidx[s0], o_ids[None, :]]   # [K, O]
    pibn = state.sigma_pib[sn] + \
        state.delta_pib[state.sigma_lidx[sn], o_ids[None, :, None]]
    alpha = jnp.sum(eff * (pib0 + jnp.sum(mult * pibn, axis=2)), axis=1) / kf

    beta = jnp.zeros((K, n1), dtype)
    if pa.C_cols.shape[0]:
        piC0 = state.sigma_piC[s0]                              # [K, O, nCc]
        piCn = state.sigma_piC[sn]                              # [K, O, nd, nCc]
        term = piC0 + jnp.einsum("kon,konc->koc", mult, piCn)
        beta = beta.at[:, pa.C_cols].add(
            jnp.einsum("ko,koc->kc", eff, term))
    if pa.C_cols_rand.shape[0] and pa.rv_C_rows.shape[0]:
        dpiC0 = state.delta_piC[state.sigma_lidx[s0], o_ids[None, :]]
        dpiCn = state.delta_piC[state.sigma_lidx[sn], o_ids[None, :, None]]
        term = dpiC0 + jnp.einsum("kon,konc->koc", mult, dpiCn)
        beta = beta.at[:, pa.C_cols_rand].add(
            jnp.einsum("ko,koc->kc", eff, term))
    beta = beta / kf

    count = jnp.sum(eff, axis=1)
    alpha = alpha + (1.0 - count / kf) * pa.lb
    return alpha, beta
