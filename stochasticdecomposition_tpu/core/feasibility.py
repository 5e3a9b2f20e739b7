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


def update_feas_cut_pool(pa: ProblemArrays, state: SDState, cfg: SDConfig,
                         pool_alpha, pool_beta):
    """updtFeasCutPool (cuts.c:465-517): cross new (ray, observation) pairs
    into the host-side pool with dedup; watermarks in state.f_updt.

    Vectorized: all candidate (alpha, beta) pairs are built as one batched
    gather/scatter, deduplicated by tolerance-quantized keys (np.unique) —
    a long feasibility phase (rays x thousands of observations) is one
    array pass instead of O(pool^2) Python loops.  Quantized dedup may keep
    a pair of cuts within TOLERANCE of each other that the reference's
    ball-dedup would merge; duplicates are harmless (slot-level dedup
    happens again in check_feas_cut_pool)."""
    tol = cfg.TOLERANCE
    n1 = int(pa.c1.shape[0])
    s_mark, o_mark = int(state.f_updt[0]), int(state.f_updt[1])
    s_cnt = int(state.sigma_cnt)
    o_cnt = int(state.omega_cnt)
    feas_flags = np.asarray(state.sigma_feas)[:s_cnt]
    has_rand_C = int(pa.rv_C_rows.shape[0]) > 0 and pa.C_cols_rand.size

    # (ray, obs) index cross products: new obs x old rays + all obs x new
    # rays (cuts.c:472-514).
    old_rays = np.where(~feas_flags[:s_mark])[0]
    new_rays = s_mark + np.where(~feas_flags[s_mark:s_cnt])[0]
    pairs_s = np.concatenate([
        np.repeat(old_rays, max(o_cnt - o_mark, 0)),
        np.repeat(new_rays, o_cnt),
    ]).astype(np.int64)
    pairs_o = np.concatenate([
        np.tile(np.arange(o_mark, o_cnt), len(old_rays)),
        np.tile(np.arange(o_cnt), len(new_rays)),
    ]).astype(np.int64)
    if pairs_s.size == 0:
        state = state._replace(f_updt=jnp.asarray([s_cnt, o_cnt], jnp.int32))
        return state, pool_alpha, pool_beta

    sigma_pib = np.asarray(state.sigma_pib)
    sigma_piC = np.asarray(state.sigma_piC)
    sigma_lidx = np.asarray(state.sigma_lidx)
    delta_pib = np.asarray(state.delta_pib)
    lidx = sigma_lidx[pairs_s]
    alpha = sigma_pib[pairs_s] + delta_pib[lidx, pairs_o]       # [P]
    beta = np.zeros((len(pairs_s), n1))
    C_cols = np.asarray(pa.C_cols)
    if C_cols.size:
        beta[:, C_cols] += sigma_piC[pairs_s]
    if has_rand_C:
        delta_piC = np.asarray(state.delta_piC)
        beta[:, np.asarray(pa.C_cols_rand)] += delta_piC[lidx, pairs_o]

    # Tolerance-quantized dedup, within the batch and against the pool.
    keys = np.round(np.concatenate([alpha[:, None], beta], axis=1) / tol)
    _, first = np.unique(keys, axis=0, return_index=True)
    if pool_alpha:
        pool_keys = np.round(np.concatenate(
            [np.asarray(pool_alpha)[:, None], np.stack(pool_beta)],
            axis=1) / tol)
        pool_set = {k.tobytes() for k in pool_keys.astype(np.int64)}
    else:
        pool_set = set()
    for i in sorted(first):
        kb = keys[i].astype(np.int64).tobytes()
        if kb not in pool_set:
            pool_set.add(kb)
            pool_alpha.append(float(alpha[i]))
            pool_beta.append(beta[i])

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
