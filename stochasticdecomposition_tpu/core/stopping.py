"""Optimality tests: pre-test and the bootstrap full test.

Reference: optimal.c.  The full test (optimal.c:69-133) resamples the
empirical distribution BOOTSTRAP_REP times, reforms the "good" cuts from the
stored iStar indices (reformCuts, optimal.c:187-236), and compares the upper
estimate against the closed-form QP dual lower bound (calcBootstrpLB,
optimal.c:240-338).  Here all replications run as one vmapped computation.

Note: reformCuts in the reference declares ``int lb`` — truncating a
non-integer lower bound.  That is a latent defect (SURVEY.md "quirks"), not
replicated here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState

_NEG = -1e300


def pre_test(candid_est: float, incumb_est: float, pre_epsilon: float) -> bool:
    """preTest (optimal.c:46-59): candidate height close to incumbent's."""
    if candid_est >= 0:
        return candid_est >= (1.0 - pre_epsilon) * incumb_est
    return candid_est > (1.0 + pre_epsilon) * incumb_est


def make_full_test(pa: ProblemArrays, cfg: SDConfig, max_iter: int):
    """Build the jitted bootstrap full test: (state, key) -> passed (bool)."""
    dtype = pa.c1.dtype
    tol = cfg.TOLERANCE
    reps = cfg.BOOTSTRAP_REP

    has_rand_d = int(pa.rv_d_cols.shape[0]) > 0

    def _reform_cuts(state: SDState, counts):
        """reformCuts (optimal.c:187-236) for every cut under resampled
        observation counts; returns (alpha', beta') [K], [K, n1]."""
        if has_rand_d:
            from stochasticdecomposition_tpu.core.randcost import (
                reform_cuts_randcost,
            )

            return reform_cuts_randcost(pa, state, counts)
        K, O = state.cut_istar.shape
        n1 = pa.c1.shape[0]
        kf = jnp.asarray(state.k, dtype)

        o_ids = jnp.arange(O)
        # Per-cut observation validity: only obs known when the cut was formed.
        valid = o_ids[None, :] < state.cut_omega_cnt[:, None]       # [K, O]
        eff = jnp.where(valid, counts[None, :], 0).astype(dtype)    # [K, O]

        istar = state.cut_istar                                      # [K, O]
        pib_sel = state.sigma_pib[istar]                             # [K, O]
        lidx_sel = state.sigma_lidx[istar]                           # [K, O]
        dpib_sel = state.delta_pib[lidx_sel, o_ids[None, :]]         # [K, O]
        alpha = jnp.sum(eff * (pib_sel + dpib_sel), axis=1) / kf     # [K]

        beta = jnp.zeros((K, n1), dtype)
        if pa.C_cols.shape[0]:
            piC_sel = state.sigma_piC[istar]                         # [K, O, nCc]
            beta = beta.at[:, pa.C_cols].add(
                jnp.einsum("ko,koc->kc", eff, piC_sel))
        if pa.C_cols_rand.shape[0] and pa.rv_C_rows.shape[0]:
            dpiC_sel = state.delta_piC[lidx_sel, o_ids[None, :]]     # [K, O, nCr]
            beta = beta.at[:, pa.C_cols_rand].add(
                jnp.einsum("ko,koc->kc", eff, dpiC_sel))
        beta = beta / kf

        # NONTRIVIAL lb correction for unseen observations (optimal.c:232-233).
        count = jnp.sum(eff, axis=1)
        alpha = alpha + (1.0 - count / kf) * pa.lb
        return alpha, beta

    def _boot_lb(state: SDState, good, alpha, beta):
        """calcBootstrpLB (optimal.c:240-338): closed-form dual value of the
        reformed master QP at the stored multipliers."""
        kf = jnp.asarray(state.k, dtype)
        bk = pa.b1 - pa.A1 @ state.incumb_x
        lam = -state.pi_first
        bk_lambda = bk @ lam

        ns = jnp.maximum(state.cut_ns, 1).astype(dtype)
        theta = jnp.where(good, (kf / ns) * state.pi_cuts, 0.0)
        Vk = jnp.sum(theta * (alpha - beta @ state.incumb_x))
        Bk_theta = theta @ beta                                      # [n1]

        # -A'lam + dj  (optimal.c:298-303: MSparsexvSub into zeros then +=dj).
        At_lam = -(pa.A1.T @ lam) + state.dj_master
        q = pa.c1 - Bk_theta - At_lam
        return Vk + bk_lambda - (q @ q) / state.quad_scalar / 2.0

    def full_test(state: SDState, key) -> jnp.ndarray:
        """fullTest (optimal.c:69-133).  Returns bool scalar."""
        K, O = state.cut_istar.shape
        kf = jnp.asarray(state.k, dtype)

        # (a) choose good cuts: positive master dual (chooseCuts:139-155).
        good = state.cut_mask & (state.pi_cuts > tol)
        any_good = jnp.any(good)

        # (b,c) resample: counts ~ Multinomial(k, weights/k) per replication.
        probs = state.omega_w.astype(dtype)
        probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
        logits = jnp.where(jnp.arange(O) < state.omega_cnt,
                           jnp.log(jnp.maximum(probs, 1e-300)), -jnp.inf)
        keys = jax.random.split(key, reps)

        def one_rep(rk):
            draws = jax.random.categorical(rk, logits, shape=(max_iter,))
            draw_mask = jnp.arange(max_iter) < state.k
            counts = jnp.zeros(O, jnp.int32).at[
                jnp.where(draw_mask, draws, 0)].add(
                jnp.where(draw_mask, 1, 0))
            alpha, beta = _reform_cuts(state, counts)

            # (e) best reformed height at the incumbent (optimal.c:100).
            ns_frac = state.cut_ns.astype(dtype) / kf
            h = ns_frac * (alpha - beta @ state.incumb_x) + \
                (1.0 - ns_frac) * pa.lb
            est = jnp.max(jnp.where(good, h, _NEG))

            # (f) closed-form lower bound (optimal.c:110).
            lb_val = _boot_lb(state, good, alpha, beta)

            # (g) normalized gap (optimal.c:117).
            denom = jnp.where(jnp.abs(state.incumb_est) < 1e-12, 1.0,
                              state.incumb_est)
            return jnp.abs((est - lb_val) / denom) <= cfg.EPSILON

        passes = jax.vmap(one_rep)(keys)
        frac = jnp.mean(passes.astype(dtype))
        return any_good & (frac >= cfg.PERCENT_PASS)

    return jax.jit(full_test)
