"""Feasibility-cut machinery (induced constraints).

Reference: cuts.c:398-567.  When a subproblem is infeasible for the current
candidate, the algorithm enters feasibility mode: dual extreme rays (stored
in the pools with feasFlag=false by stochastic_updates) are crossed with all
observations to form feasibility cuts  beta'x >= alpha  (updtFeasCutPool,
cuts.c:465-517), violated ones enter the master (checkFeasCutPool,
cuts.c:521-567), the proximal term is relaxed, and master/subproblem solves
alternate until a feasible candidate emerges (resolveInfeasibility,
cuts.c:402-449).

This is a rare, control-flow-heavy path, so it runs host-side with NumPy on
pulled pool slices, delegating master/subproblem solves to the jitted
substeps — the device stays the compute engine, the host owns the loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.state import ProblemArrays, SDState


def _feas_cut_coeffs(pa_np, state, s_idx, o_idx):
    """alpha/beta of the feasibility cut from ray-entry s and observation o
    (cuts.c:477-487)."""
    lidx = int(np.asarray(state.sigma_lidx)[s_idx])
    alpha = float(np.asarray(state.sigma_pib)[s_idx]) + \
        float(np.asarray(state.delta_pib)[lidx, o_idx])
    n1 = pa_np["n1"]
    beta = np.zeros(n1)
    if pa_np["C_cols"].size:
        beta[pa_np["C_cols"]] += np.asarray(state.sigma_piC)[s_idx]
    if pa_np["C_cols_rand"].size and pa_np["has_rand_C"]:
        beta[pa_np["C_cols_rand"]] += np.asarray(state.delta_piC)[lidx, o_idx]
    return alpha, beta


def update_feas_cut_pool(pa: ProblemArrays, state: SDState, cfg: SDConfig,
                         pool_alpha, pool_beta):
    """updtFeasCutPool (cuts.c:465-517): cross new (ray, observation) pairs
    into the host-side pool with dedup; watermarks in state.f_updt."""
    tol = cfg.TOLERANCE
    pa_np = {
        "n1": int(pa.c1.shape[0]),
        "C_cols": np.asarray(pa.C_cols),
        "C_cols_rand": np.asarray(pa.C_cols_rand),
        "has_rand_C": int(pa.rv_C_rows.shape[0]) > 0,
    }
    s_mark, o_mark = int(state.f_updt[0]), int(state.f_updt[1])
    s_cnt = int(state.sigma_cnt)
    o_cnt = int(state.omega_cnt)
    feas_flags = np.asarray(state.sigma_feas)[:s_cnt]

    def _try_add(alpha, beta):
        for a2, b2 in zip(pool_alpha, pool_beta):
            if abs(alpha - a2) < tol and np.all(np.abs(beta - b2) < tol):
                return
        pool_alpha.append(alpha)
        pool_beta.append(beta)

    # New observations x old ray entries (cuts.c:472-491).
    for o in range(o_mark, o_cnt):
        for s in range(0, s_mark):
            if not feas_flags[s]:
                _try_add(*_feas_cut_coeffs(pa_np, state, s, o))
    # All observations x new ray entries (cuts.c:495-514).
    for o in range(0, o_cnt):
        for s in range(s_mark, s_cnt):
            if not feas_flags[s]:
                _try_add(*_feas_cut_coeffs(pa_np, state, s, o))

    state = state._replace(f_updt=jnp.asarray([s_cnt, o_cnt], jnp.int32))
    return state, pool_alpha, pool_beta


def check_feas_cut_pool(pa: ProblemArrays, state: SDState, cfg: SDConfig,
                        pool_alpha, pool_beta):
    """checkFeasCutPool (cuts.c:521-567): activate pool cuts violated by the
    incumbent (marks infeasIncumb) or the candidate into the masked fcut
    slots of the master."""
    tol = cfg.TOLERANCE
    fa = np.asarray(state.fcut_alpha).copy()
    fb = np.asarray(state.fcut_beta).copy()
    fm = np.asarray(state.fcut_mask).copy()
    incumb = np.asarray(state.incumb_x)
    candid = np.asarray(state.candid_x)
    infeas_incumb = bool(state.infeas_incumb)

    def _active_dup(alpha, beta):
        for j in np.where(fm)[0]:
            if abs(alpha - fa[j]) < tol and np.all(np.abs(beta - fb[j]) < tol):
                return True
        return False

    def _activate(alpha, beta):
        free = np.where(~fm)[0]
        if free.size == 0:
            raise RuntimeError("feasibility cut slots exhausted; raise CUT_MULT")
        j = free[0]
        fa[j] = alpha
        fb[j] = beta
        fm[j] = True

    for alpha, beta in zip(pool_alpha, pool_beta):
        dup = _active_dup(alpha, beta)
        if beta @ incumb < alpha - tol:
            infeas_incumb = True
            if not dup:
                _activate(alpha, beta)
        elif not dup and beta @ candid < alpha - tol:
            _activate(alpha, beta)

    state = state._replace(
        fcut_alpha=jnp.asarray(fa), fcut_beta=jnp.asarray(fb),
        fcut_mask=jnp.asarray(fm),
        fcut_cnt=jnp.int32(int(fm.sum())),
        infeas_incumb=jnp.bool_(infeas_incumb))
    return state


def resolve_infeasibility(pa: ProblemArrays, state: SDState, cfg: SDConfig,
                          substeps, pool_alpha, pool_beta,
                          max_rounds: int = 200):
    """resolveInfeasibility (cuts.c:402-449): alternate feasibility-cut
    generation and master solves until the subproblem is feasible at the
    candidate.  Returns the updated state (opt mode restored)."""
    state = state._replace(opt_mode=jnp.bool_(False))
    rounds = 0
    while True:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("feasibility mode failed to converge")
        state, pool_alpha, pool_beta = update_feas_cut_pool(
            pa, state, cfg, pool_alpha, pool_beta)
        state = check_feas_cut_pool(pa, state, cfg, pool_alpha, pool_beta)
        # Relax the proximal term (cuts.c:412-417).
        state = state._replace(
            quad_scalar=jnp.asarray(cfg.MIN_QUAD_SCALAR,
                                    state.quad_scalar.dtype),
            feas_cnt=state.feas_cnt + 1)
        state = substeps["master_step"](state)
        if not bool(state.master_ok):
            raise RuntimeError("master failed during feasibility mode")
        state = substeps["subprob_update"](state)
        if bool(state.sp_feas):
            break

    # Feasibility restored: form the optimality cut formSDCut was about to
    # build when the infeasible subproblem interrupted it (SDCut runs after
    # resolveInfeasibility returns, cuts.c:40-56).  If the pool still holds
    # only ray entries (cut_ok False) the cut is skipped, never stored.
    if "cut_step" in substeps:
        state = substeps["cut_step"](state)

    # Infeasible incumbent -> replace with the (feasible) candidate
    # (cuts.c:440-443, soln.c:62-94).
    if bool(state.infeas_incumb):
        state = state._replace(
            incumb_x=state.candid_x,
            incumb_est=state.candid_est,
            i_cut_updt=state.k,
            incumb_chg=jnp.bool_(True),
            infeas_incumb=jnp.bool_(False),
            gamma=jnp.asarray(0.0, state.gamma.dtype),
        )
    state = state._replace(opt_mode=jnp.bool_(True))
    # De-alias every leaf: the donating step must not receive a state where
    # two leaves share one buffer (e.g. incumb_x = candid_x above).
    import jax

    return jax.tree.map(jnp.copy, state), pool_alpha, pool_beta
