"""Algorithm state: the cellType equivalent as a static-shape pytree.

The reference keeps all mutable algorithm state in ``cellType``
(twoSD.h:101-149) with pools preallocated to MAX_ITER-derived capacities
(setup.c:126,136-144).  Here every pool is a fixed-capacity device array with
a count scalar, so the whole SD iteration jits into one XLA program and state
updates are masked writes — the TPU translation of the reference's
preallocation discipline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.config import MASTER_QP, SDConfig
from stochasticdecomposition_tpu.prob import StagedProblem


class ProblemArrays(NamedTuple):
    """Device-resident immutable problem data (probType equivalent)."""

    # First stage.
    A1: jnp.ndarray          # [m1, n1]
    b1: jnp.ndarray          # [m1]
    sense1: jnp.ndarray      # [m1]
    c1: jnp.ndarray          # [n1]
    l1: jnp.ndarray          # [n1]
    u1: jnp.ndarray          # [n1]
    # Second stage templates (means folded in).
    D: jnp.ndarray           # [m2, n2]
    b_bar: jnp.ndarray       # [m2]
    sense2: jnp.ndarray      # [m2]
    C_bar: jnp.ndarray       # [m2, n1]
    d_bar: jnp.ndarray       # [n2]
    l2: jnp.ndarray          # [n2]
    u2: jnp.ndarray          # [n2]
    # Randomness coordinates.
    rv_b_rows: jnp.ndarray   # [nb] int32
    rv_C_rows: jnp.ndarray   # [nC]
    rv_C_cols: jnp.ndarray   # [nC]
    rv_d_cols: jnp.ndarray   # [nd]
    omega_mean: jnp.ndarray  # [R]
    lambda_rows: jnp.ndarray  # [nlr] rows with randomness (coord->rvRows)
    C_cols: jnp.ndarray      # [nCc] first-stage cols of Cbar (coord->CCols)
    # Derived maps for the delta tables.
    bmap: jnp.ndarray        # [nlr, nb]: lambda-row scatter of the b block
    lam_pos_C: jnp.ndarray   # [nC]: position of rv_C_rows within lambda_rows
    Cgroup: jnp.ndarray      # [nC, nCr] one-hot: rv C entry -> distinct col
    C_cols_rand: jnp.ndarray  # [nCr] distinct first-stage cols w/ random C
    # Scalars.
    lb: jnp.ndarray          # lower bound on E[h]
    lb_nontrivial: bool      # static
    # First-stage integrality (MASTER_TYPE 1/7; master.c:331 "LP, QP, MIP or
    # MIQP").  All-False for pure LPs; the branch-and-bound master keys off it.
    int1: jnp.ndarray = None  # [n1] bool


class SDState(NamedTuple):
    """Mutable SD state (cellType, twoSD.h:101-149)."""

    key: jnp.ndarray            # PRNG key
    k: jnp.ndarray              # iteration counter (int32)
    lp_cnt: jnp.ndarray

    # omegaType (stoc.h:33-39)
    omega_vals: jnp.ndarray     # [O, R] centered observations
    omega_w: jnp.ndarray        # [O] int32 weights
    omega_cnt: jnp.ndarray

    # lambdaType (stoc.h:45-48)
    lambda_vals: jnp.ndarray    # [L, nlr]
    lambda_cnt: jnp.ndarray

    # sigmaType (stoc.h:55-60) + the per-entry feasibility flag that stands in
    # for oneBasis.feasFlag on the plain (no random cost) path
    sigma_pib: jnp.ndarray      # [S]
    sigma_piC: jnp.ndarray      # [S, nCc]
    sigma_lidx: jnp.ndarray     # [S] int32 -> lambda row
    sigma_ck: jnp.ndarray       # [S] int32 iteration first seen
    sigma_feas: jnp.ndarray     # [S] bool (False = extreme ray entry)
    sigma_cnt: jnp.ndarray

    # deltaType (stoc.h:68-70)
    delta_pib: jnp.ndarray      # [L, O]
    delta_piC: jnp.ndarray      # [L, O, nCr]

    # basisType (stoc.h:72-97) — random-cost (v2.0) path; when the problem
    # has no random costs these are 1-slot placeholders and statically unused.
    # Layout deviation from the reference: phi columns are indexed by the
    # d-RV they belong to (mask basis_present) instead of packed arrays.
    basis_cstat: jnp.ndarray    # [B, n2] int8 column status (dedup + feas)
    basis_rstat: jnp.ndarray    # [B, m2] int8
    basis_phi: jnp.ndarray      # [B, nd, m2] dual-basis-inverse rows
    basis_present: jnp.ndarray  # [B, nd] bool: d-RV n basic in this basis
    basis_sigma0: jnp.ndarray   # [B] int32 sigma entry of piDet
    basis_sigma_idx: jnp.ndarray  # [B, nd] int32 sigma entry per phi column
    basis_pidet: jnp.ndarray    # [B, m2]
    basis_gbar: jnp.ndarray     # [B, n2] deterministic reduced costs
    basis_psi: jnp.ndarray      # [B, nd, n2] tableau rows for phi positions
    basis_mub: jnp.ndarray      # [B]
    basis_ck: jnp.ndarray       # [B] int32
    basis_feas: jnp.ndarray     # [B] bool
    basis_cnt: jnp.ndarray
    obs_feas: jnp.ndarray       # [B, O] bool: basis dual-feasible at obs

    # cutsType (twoSD.h:69-85): fixed slots, masked
    cut_alpha: jnp.ndarray      # [K]
    cut_beta: jnp.ndarray       # [K, n1] (beta over x; eta coeff is implicit)
    cut_ns: jnp.ndarray         # [K] int32 numSamples at formation
    cut_omega_cnt: jnp.ndarray  # [K] int32
    cut_istar: jnp.ndarray      # [K, O] int32
    cut_mask: jnp.ndarray       # [K] bool
    # feasibility cuts (cell->fcuts + pool)
    fcut_alpha: jnp.ndarray     # [F]
    fcut_beta: jnp.ndarray      # [F, n1]
    fcut_mask: jnp.ndarray      # [F] bool
    fcut_cnt: jnp.ndarray
    f_updt: jnp.ndarray         # [2] int32: (sigma, omega) watermark (fUpdt)

    # incumbent & master (cellType scalars)
    candid_x: jnp.ndarray       # [n1]
    candid_est: jnp.ndarray
    incumb_x: jnp.ndarray       # [n1]
    incumb_est: jnp.ndarray
    quad_scalar: jnp.ndarray
    gamma: jnp.ndarray
    norm_dk: jnp.ndarray
    norm_dk_1: jnp.ndarray
    i_cut_idx: jnp.ndarray      # int32 slot of the incumbent cut
    i_cut_updt: jnp.ndarray     # int32 iteration of last incumbent cut
    incumb_chg: jnp.ndarray     # bool
    pi_first: jnp.ndarray       # [m1] master duals on first-stage rows
    pi_cuts: jnp.ndarray        # [K] master duals on cut rows
    dj_master: jnp.ndarray      # [n1] master reduced costs (bound duals)
    eta: jnp.ndarray            # last master eta value

    # dual stability (cuts.c:171-182)
    pi_ratio: jnp.ndarray       # [SCAN_LEN]
    dual_stable: jnp.ndarray    # bool
    ratio_cnt: jnp.ndarray      # number of ratio entries written

    # status
    last_o_idx: jnp.ndarray     # int32: omega index of the current iteration
    sp_feas: jnp.ndarray        # bool: last subproblem feasible
    opt_mode: jnp.ndarray       # bool: False while resolving infeasibility
    infeas_incumb: jnp.ndarray  # bool
    feas_cnt: jnp.ndarray       # int32
    master_ok: jnp.ndarray      # bool: last master solve converged
    cut_ok: jnp.ndarray         # bool: last argmax found a valid vertex for
    #                             every observation (istar >= 0 guard,
    #                             cuts.c:136-139); a False cut is skipped

    # warm-start basis for the next subproblem solve (the reference gets
    # this for free from CPLEX's in-memory problem object; here the optimal
    # basis of the previous solve restarts the next one via phase 1)
    warm_basis: jnp.ndarray     # [m2] int32
    warm_atup: jnp.ndarray      # [n2s + m2] bool (standard-form at-upper)


def stage_problem(sp: StagedProblem, dtype=jnp.float64) -> ProblemArrays:
    rv = sp.rv
    nlr = len(rv.lambda_rows)
    nb, nC = rv.nb, rv.nC

    bmap = np.zeros((nlr, nb))
    lam_index = {int(r): i for i, r in enumerate(rv.lambda_rows)}
    for j, r in enumerate(rv.rv_b_rows):
        bmap[lam_index[int(r)], j] = 1.0

    C_cols_rand = np.unique(rv.rv_C_cols) if nC else np.zeros(0, np.int32)
    group_index = {int(ccol): q for q, ccol in enumerate(C_cols_rand)}
    Cgroup = np.zeros((nC, max(len(C_cols_rand), 1)))
    lam_pos_C = np.zeros(nC, np.int32)
    for j in range(nC):
        Cgroup[j, group_index[int(rv.rv_C_cols[j])]] = 1.0
        lam_pos_C[j] = lam_index[int(rv.rv_C_rows[j])]

    f, s = sp.first, sp.second
    return ProblemArrays(
        A1=jnp.asarray(f.A, dtype), b1=jnp.asarray(f.b, dtype),
        sense1=jnp.asarray(f.sense, jnp.int32), c1=jnp.asarray(f.c, dtype),
        l1=jnp.asarray(f.lb, dtype), u1=jnp.asarray(f.ub, dtype),
        D=jnp.asarray(s.D, dtype), b_bar=jnp.asarray(s.b_bar, dtype),
        sense2=jnp.asarray(s.sense, jnp.int32),
        C_bar=jnp.asarray(s.C_bar, dtype), d_bar=jnp.asarray(s.d_bar, dtype),
        l2=jnp.asarray(s.lb, dtype), u2=jnp.asarray(s.ub, dtype),
        rv_b_rows=jnp.asarray(rv.rv_b_rows, jnp.int32),
        rv_C_rows=jnp.asarray(rv.rv_C_rows, jnp.int32),
        rv_C_cols=jnp.asarray(rv.rv_C_cols, jnp.int32),
        rv_d_cols=jnp.asarray(rv.rv_d_cols, jnp.int32),
        omega_mean=jnp.asarray(rv.omega_mean, dtype),
        lambda_rows=jnp.asarray(rv.lambda_rows, jnp.int32),
        C_cols=jnp.asarray(rv.C_cols, jnp.int32),
        bmap=jnp.asarray(bmap, dtype),
        lam_pos_C=jnp.asarray(lam_pos_C, jnp.int32),
        Cgroup=jnp.asarray(Cgroup, dtype),
        C_cols_rand=jnp.asarray(C_cols_rand, jnp.int32),
        lb=jnp.asarray(sp.lb, dtype),
        lb_nontrivial=not sp.lb_is_trivial,
        int1=jnp.asarray(
            f.is_int if f.is_int is not None
            else np.zeros(f.A.shape[1], bool)),
    )


class Capacities(NamedTuple):
    """Static pool capacities (setup.c:126,136-144 equivalents)."""

    O: int      # omega pool
    L: int      # lambda pool
    S: int      # sigma pool
    K: int      # optimality cut slots (maxCuts)
    F: int      # feasibility cut slots
    B: int      # basis pool (random-cost path; 1 when unused)
    scan: int   # SCAN_LEN


def derive_capacities(sp: StagedProblem, cfg: SDConfig) -> Capacities:
    n1 = sp.first.A.shape[1]
    cap = cfg.pool_capacity(sp.rv.nd)
    # k counts samples (matching the reference's iteration==sample), so at
    # most MAX_ITER observations are ever drawn regardless of batching.
    O = cfg.MAX_OMEGA or (cfg.MAX_ITER + max(1, cfg.SAMPLE_INCREMENT))
    O = ((O + 127) // 128) * 128      # lane-align the observation axis
    L = cfg.MAX_LAMBDA or cap
    S = cfg.MAX_SIGMA or cap
    B = (cfg.MAX_BASES or (cfg.MAX_ITER + cfg.MAX_ITER // cfg.TAU + 1)) \
        if sp.rv.nd > 0 else 1
    return Capacities(O=O, L=L, S=S, K=cfg.max_cuts(n1),
                      F=cfg.max_cuts(n1), B=B, scan=cfg.SCAN_LEN)


def estimate_pool_bytes(sp: StagedProblem, caps: Capacities,
                        cfg: SDConfig) -> dict:
    """Static-pool memory breakdown (bytes) at the derived capacities.

    The reference preallocates the same pools logically, but in host RAM
    with sparse vectors (setup.c:136-144); on TPU they are dense device
    arrays whose footprint must fit HBM — delta is [L, O] and the
    random-cost psi/phi tables multiply by nd, so storm-class runs at
    MAX_ITER=5000 can reach tens of GB if unchecked."""
    rv = sp.rv
    n1 = sp.first.A.shape[1]
    m2, n2 = sp.second.D.shape
    R = len(rv.omega_mean)
    nlr = max(len(rv.lambda_rows), 1)
    nCc = max(len(rv.C_cols), 1)
    nCr = max(len(np.unique(rv.rv_C_cols)) if rv.nC else 0, 1)
    nd = rv.nd
    O, L, S, K, F, B = caps.O, caps.L, caps.S, caps.K, caps.F, caps.B
    fb = 8 if cfg.DTYPE == "float64" else 4

    out = {
        "omega": O * R * fb + O * 4,
        "lambda": L * nlr * fb,
        "sigma": S * (1 + nCc) * fb + S * 9,
        "delta_pib": L * O * fb,
        "delta_piC": L * O * nCr * fb if rv.nC else 0,
        "cuts": K * (O * 4 + n1 * fb + fb + 8) + F * (n1 + 1) * fb,
    }
    if nd > 0:
        out["basis_phi"] = B * nd * m2 * fb
        out["basis_psi"] = B * nd * n2 * fb
        out["basis_other"] = B * ((n2 + m2) * (1 + fb) + nd * 5 + O + 16)
    out["total"] = sum(out.values())
    return out


def audit_capacities(sp: StagedProblem, caps: Capacities,
                     cfg: SDConfig) -> dict:
    """Fail loudly (instead of OOMing mid-run) when the static pools exceed
    the configured HBM budget; returns the byte breakdown."""
    est = estimate_pool_bytes(sp, caps, cfg)
    budget = cfg.MEMORY_BUDGET_GB * 2 ** 30
    # The donated step keeps ~one copy live; leave headroom for the
    # compiler's temporaries and the (re)factorization workspaces.
    if est["total"] * 1.25 > budget:
        detail = ", ".join(f"{k}={v / 2**20:.0f}MiB"
                           for k, v in sorted(est.items(), key=lambda kv: -kv[1])
                           if k != "total")
        raise MemoryError(
            f"static pools need ~{est['total'] / 2**30:.2f} GiB "
            f"(+25% headroom) > MEMORY_BUDGET_GB={cfg.MEMORY_BUDGET_GB}: "
            f"{detail}.  Reduce MAX_ITER / MAX_OMEGA / MAX_LAMBDA / "
            f"MAX_BASES, raise SAMPLE_INCREMENT (fewer pool entries per "
            f"sample), or raise MEMORY_BUDGET_GB if the device allows.")
    return est


def init_state(pa: ProblemArrays, caps: Capacities, cfg: SDConfig,
               x0: jnp.ndarray, key) -> SDState:
    """Fresh replication state (newCell, setup.c:67-186 / cleanCellType)."""
    dtype = pa.c1.dtype
    n1 = pa.c1.shape[0]
    R = pa.omega_mean.shape[0]
    nlr = pa.lambda_rows.shape[0]
    nCc = pa.C_cols.shape[0]
    nCr = pa.C_cols_rand.shape[0] if pa.C_cols_rand.shape[0] else 1
    O, L, S, K, F, B = caps.O, caps.L, caps.S, caps.K, caps.F, caps.B
    # Basis-pool inner dims collapse to 1 when there are no random costs.
    has_rand_d = int(pa.rv_d_cols.shape[0]) > 0
    ndb = int(pa.rv_d_cols.shape[0]) if has_rand_d else 1
    m2b = int(pa.D.shape[0]) if has_rand_d else 1
    n2b = int(pa.D.shape[1]) if has_rand_d else 1

    x0 = jnp.asarray(x0, dtype)
    candid_est = pa.lb + pa.c1 @ x0    # setup.c:102

    state = SDState(
        key=key,
        k=jnp.int32(0),
        lp_cnt=jnp.int32(0),
        omega_vals=jnp.zeros((O, R), dtype),
        omega_w=jnp.zeros(O, jnp.int32),
        omega_cnt=jnp.int32(0),
        lambda_vals=jnp.zeros((L, nlr), dtype),
        lambda_cnt=jnp.int32(0),
        sigma_pib=jnp.zeros(S, dtype),
        sigma_piC=jnp.zeros((S, nCc), dtype),
        sigma_lidx=jnp.zeros(S, jnp.int32),
        sigma_ck=jnp.zeros(S, jnp.int32),
        sigma_feas=jnp.zeros(S, bool),
        sigma_cnt=jnp.int32(0),
        delta_pib=jnp.zeros((L, O), dtype),
        delta_piC=jnp.zeros((L, O, nCr), dtype),
        basis_cstat=jnp.zeros((B, n2b), jnp.int8),
        basis_rstat=jnp.zeros((B, m2b), jnp.int8),
        basis_phi=jnp.zeros((B, ndb, m2b), dtype),
        basis_present=jnp.zeros((B, ndb), bool),
        basis_sigma0=jnp.zeros(B, jnp.int32),
        basis_sigma_idx=jnp.zeros((B, ndb), jnp.int32),
        basis_pidet=jnp.zeros((B, m2b), dtype),
        basis_gbar=jnp.zeros((B, n2b), dtype),
        basis_psi=jnp.zeros((B, ndb, n2b), dtype),
        basis_mub=jnp.zeros(B, dtype),
        basis_ck=jnp.zeros(B, jnp.int32),
        basis_feas=jnp.zeros(B, bool),
        basis_cnt=jnp.int32(0),
        obs_feas=jnp.zeros((B, O if has_rand_d else 1), bool),
        cut_alpha=jnp.zeros(K, dtype),
        cut_beta=jnp.zeros((K, n1), dtype),
        cut_ns=jnp.zeros(K, jnp.int32),
        cut_omega_cnt=jnp.zeros(K, jnp.int32),
        cut_istar=jnp.zeros((K, O), jnp.int32),
        cut_mask=jnp.zeros(K, bool),
        fcut_alpha=jnp.zeros(F, dtype),
        fcut_beta=jnp.zeros((F, n1), dtype),
        fcut_mask=jnp.zeros(F, bool),
        fcut_cnt=jnp.int32(0),
        f_updt=jnp.zeros(2, jnp.int32),
        candid_x=x0,
        candid_est=candid_est,
        incumb_x=x0,
        incumb_est=candid_est,
        quad_scalar=jnp.asarray(cfg.MIN_QUAD_SCALAR, dtype),
        gamma=jnp.asarray(0.0, dtype),
        norm_dk=jnp.asarray(0.0, dtype),
        norm_dk_1=jnp.asarray(0.0, dtype),
        # LP masters have no incumbent cut slot (iCutIdx = -1, setup.c:113-119).
        i_cut_idx=jnp.int32(0 if cfg.MASTER_TYPE == MASTER_QP else -1),
        i_cut_updt=jnp.int32(0),
        incumb_chg=jnp.bool_(False),
        pi_first=jnp.zeros(pa.b1.shape[0], dtype),
        pi_cuts=jnp.zeros(K, dtype),
        dj_master=jnp.zeros(n1, dtype),
        eta=jnp.asarray(0.0, dtype),
        pi_ratio=jnp.zeros(caps.scan, dtype),
        dual_stable=jnp.bool_(not cfg.DUAL_STABILITY),
        ratio_cnt=jnp.int32(0),
        last_o_idx=jnp.int32(0),
        sp_feas=jnp.bool_(True),
        opt_mode=jnp.bool_(True),
        infeas_incumb=jnp.bool_(False),
        feas_cnt=jnp.int32(0),
        master_ok=jnp.bool_(True),
        cut_ok=jnp.bool_(True),
        warm_basis=jnp.arange(pa.D.shape[1], pa.D.shape[1] + pa.D.shape[0],
                              dtype=jnp.int32),
        warm_atup=jnp.zeros(pa.D.shape[1] + pa.D.shape[0], bool),
    )
    # Distinct buffers per leaf: the step donates its input, and XLA rejects
    # donating one buffer twice (x0 / candid_est would otherwise be shared).
    import jax

    return jax.tree.map(jnp.copy, state)
