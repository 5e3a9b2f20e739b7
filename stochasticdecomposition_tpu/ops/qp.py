"""Dense primal-dual interior-point solver for the regularized master QP.

TPU-native replacement for the CPLEX QP solves of the reference master
(solveProblem at master.c:41 with the separable proximal Q loaded via
copyQPseparable, master.c:191-211).  The master in d-space is tiny — at most
first-stage-cols + 1 variables and rows + maxCuts constraints (setup.c:126) —
so one fused Mehrotra predictor-corrector with dense KKT solves is both exact
and fast, and `vmap` gives the batched compromise/bootstrap variants for free.

Problem form:   min 0.5 v'Qv + c'v   s.t.  A v = b,   G v <= h.

Duals returned follow the CPLEX minimization convention used by the reference
bootstrap lower bound (optimal.c:240-338): multipliers `z` of the G rows are
nonnegative; callers flip signs when mapping back to >=/<= rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from stochasticdecomposition_tpu.ops.linalg import gj_solve


class QPResult(NamedTuple):
    converged: jnp.ndarray    # bool
    v: jnp.ndarray            # [n] primal solution
    obj: jnp.ndarray          # 0.5 v'Qv + c'v
    y: jnp.ndarray            # [me] equality duals (free sign)
    z: jnp.ndarray            # [mi] inequality duals (>= 0)
    s: jnp.ndarray            # [mi] slacks of G v <= h
    iters: jnp.ndarray
    gap: jnp.ndarray          # final complementarity measure


def solve_qp(Q, c, A, b, G, h, *, max_iter: int = 60, tol: float = 1e-9,
             ineq_mask=None, eq_mask=None, polish: bool = True) -> QPResult:
    """Solve the convex QP. All shapes static; empty A/G allowed (0 rows).

    ``ineq_mask``/``eq_mask`` optionally disable padded rows (True = active):
    masked-out inequality rows behave as 0'v <= 1, masked-out equality rows as
    0'v = 0, so callers can preallocate constraint blocks at fixed capacity.
    """
    dtype = Q.dtype
    n = Q.shape[0]
    me = A.shape[0]
    mi = G.shape[0]

    if ineq_mask is not None:
        G = jnp.where(ineq_mask[:, None], G, 0.0)
        h = jnp.where(ineq_mask, h, 1.0)
    if eq_mask is not None:
        A = jnp.where(eq_mask[:, None], A, 0.0)
        b = jnp.where(eq_mask, b, 0.0)
        # A padded zero equality row keeps the KKT matrix singular; give it a
        # dummy identity-ish entry tied to a zero rhs via regularization below.

    # --- row equilibration -------------------------------------------------
    # SD cut rows carry eta coefficients that grow ~k (changeEtaCol,
    # master.c:146-161), so raw rows span orders of magnitude and the late
    # barrier KKT systems exceed what emulated-f64 Gauss-Jordan can resolve.
    # Scale every constraint row to unit inf-norm; duals/slacks are scaled
    # back below, so callers see the original row scaling.
    def _row_scale(Mat):
        r = jnp.max(jnp.abs(Mat), axis=1) if Mat.shape[0] else \
            jnp.zeros(0, dtype)
        return jnp.where(r > 0, r, 1.0)

    rG = _row_scale(G)
    G = G / rG[:, None] if mi else G
    h = h / rG if mi else h
    rA = _row_scale(A)
    A = A / rA[:, None] if me else A
    b = b / rA if me else b

    # Convergence is tested on residuals relative to their OWN data scale
    # (dual residual vs costs, primal residuals vs rhs) rather than one
    # global multiplier — a single 1+max|c| factor would loosen the primal
    # feasibility and complementarity tests on large-cost problems toward
    # the algorithmic TOLERANCE of 1e-3.
    scale_d = 1.0 + jnp.max(jnp.abs(c))
    scale_p = (1.0 + jnp.max(jnp.abs(b))) if me else jnp.asarray(1.0, dtype)
    scale_g = (1.0 + jnp.max(jnp.abs(h))) if mi else jnp.asarray(1.0, dtype)

    # Initial point.
    v0 = jnp.zeros(n, dtype=dtype)
    y0 = jnp.zeros(me, dtype=dtype)
    s0 = jnp.maximum(jnp.abs(h), 1.0)
    z0 = jnp.ones(mi, dtype=dtype)

    eq_reg = 1e-10   # tiny dual regularization keeps padded eq rows nonsingular

    def kkt_solve(M, rhs_v, rhs_y):
        """Solve [[M, A'], [A, -eq_reg I]] [dv, dy] = [rhs_v, rhs_y] with one
        iterative-refinement pass (the TPU's emulated-f64 Gauss-Jordan is
        ~1e-11 accurate; refinement recovers the extra digits the barrier's
        ill-conditioned late iterations need)."""
        if me == 0:
            x0 = gj_solve(M, rhs_v)
            x0 = x0 + gj_solve(M, rhs_v - M @ x0)
            return x0, jnp.zeros(0, dtype=dtype)
        K = jnp.block([
            [M, A.T],
            [A, -eq_reg * jnp.eye(me, dtype=dtype)],
        ])
        rhs = jnp.concatenate([rhs_v, rhs_y])
        sol = gj_solve(K, rhs)
        sol = sol + gj_solve(K, rhs - K @ sol)
        return sol[:n], sol[n:]

    def body(carry):
        v, y, z, s, it, done, gap_prev = carry

        rd = Q @ v + c + (A.T @ y if me else 0.0) + G.T @ z
        rp = (A @ v - b) if me else jnp.zeros(0, dtype=dtype)
        rg = G @ v + s - h
        mu = jnp.dot(s, z) / jnp.maximum(mi, 1)

        res_rel = jnp.maximum(
            jnp.max(jnp.abs(rd)) / scale_d,
            jnp.maximum((jnp.max(jnp.abs(rg)) / scale_g) if mi else 0.0,
                        (jnp.max(jnp.abs(rp)) / scale_p) if me else 0.0))
        converged = (res_rel < tol * 10) & (mu < tol * scale_d)

        # Clamp the barrier weights: unbounded z/s ratios make the late KKT
        # systems unsolvable at emulated-f64 accuracy.
        zs = jnp.clip(z / s, 1e-10, 1e12)
        M = Q + (G.T * zs) @ G + 1e-12 * jnp.eye(n, dtype=dtype)

        # --- affine (predictor) step ---
        rc_aff = z * s
        rhs_v = -(rd + G.T @ ((-rc_aff + z * rg) / s))
        dv_aff, dy_aff = kkt_solve(M, rhs_v, -rp)
        ds_aff = -rg - G @ dv_aff
        dz_aff = (-rc_aff - z * ds_aff) / s

        def max_step(x, dx):
            r = jnp.where(dx < 0, -x / jnp.where(dx < 0, dx, -1.0), jnp.inf)
            return jnp.minimum(1.0, jnp.min(r) if mi else 1.0)

        ap_aff = max_step(s, ds_aff)
        ad_aff = max_step(z, dz_aff)
        mu_aff = jnp.dot(s + ap_aff * ds_aff, z + ad_aff * dz_aff) / jnp.maximum(mi, 1)
        sigma = (mu_aff / jnp.maximum(mu, 1e-300)) ** 3

        # --- corrector step ---
        rc = z * s + ds_aff * dz_aff - sigma * mu
        rhs_v = -(rd + G.T @ ((-rc + z * rg) / s))
        dv, dy = kkt_solve(M, rhs_v, -rp)
        ds = -rg - G @ dv
        dz = (-rc - z * ds) / s

        frac = 0.995
        ap = frac * max_step(s, ds)
        ad = frac * max_step(z, dz)

        v_new = v + ap * dv
        s_new = s + ap * ds
        y_new = y + ad * dy
        z_new = z + ad * dz

        v, y, z, s = lax.cond(
            converged,
            lambda: (v, y, z, s),
            lambda: (v_new, y_new, z_new, s_new))
        return (v, y, z, s, it + 1, done | converged, mu)

    def cond(carry):
        _, _, _, _, it, done, _ = carry
        return ~done & (it < max_iter)

    v, y, z, s, it, done, gap = lax.while_loop(
        cond, body, (v0, y0, z0, s0, jnp.int32(0), jnp.bool_(False),
                     jnp.asarray(jnp.inf, dtype)))

    # Soft acceptance: if the strict tolerance was not reached within the
    # iteration cap (possible under TPU f64 emulation), accept a KKT point at
    # 1e-6 accuracy — far tighter than the algorithmic tolerances consuming
    # these solutions (config.sd TOLERANCE is 1e-3).
    soft = 1e-6
    rd_f = Q @ v + c + (A.T @ y if me else 0.0) + G.T @ z
    rg_f = (G @ v + s - h) if mi else jnp.zeros(0, dtype)
    rp_f = (A @ v - b) if me else jnp.zeros(0, dtype)
    mu_f = (jnp.dot(s, z) / mi) if mi else jnp.asarray(0.0, dtype)
    res_f = jnp.max(jnp.concatenate([
        jnp.abs(rd_f) / scale_d, jnp.abs(rg_f) / scale_g,
        jnp.abs(rp_f) / scale_p, jnp.zeros(1, dtype)]))
    done = done | ((res_f < soft) & (mu_f < soft * scale_d))

    # Undo the row equilibration so duals/slacks are in the caller's row
    # scaling: for G_s = G/r, stationarity gives z_orig = z_s / r.
    if mi:
        z = z / rG
        s = s * rG
    if me:
        y = y / rA
        G = G * rG[:, None]
        h = h * rG
        A = A * rA[:, None]
        b = b * rA
    elif mi:
        G = G * rG[:, None]
        h = h * rG

    # ---- active-set polish ("crossover-lite") ---------------------------
    # IPM iterates land O(sqrt(mu)) away from degenerate vertices; the
    # reference's CPLEX returns exact basic solutions.  Re-solve the KKT
    # equalities on the identified active set and keep the polished point if
    # it satisfies the full KKT system.
    #
    # The polish is also the CONVERGENCE RESCUE for emulated-f64 backends:
    # the barrier's late KKT systems (z/s ratios spanning ~1e12) can leave
    # the dual residual stagnant above tolerance while complementarity and
    # primal feasibility are already tight (observed on storm-scale masters
    # on TPU).  The active-set system has none of that ill-conditioning, and
    # a polished point passing the explicit KKT checks below (stationarity,
    # primal feasibility, z >= 0; complementarity holds by construction) is
    # a certified global optimum of the convex QP — so it upgrades `done`
    # even when the IPM's own residual test failed.
    if mi and polish:
        slack = h - G @ v
        active = z > slack                      # strongly-active classifier
        act = active.astype(dtype)
        reg = 1e-12
        # Rows: [Q A' G'; A -eI 0; diag(act) G  0  -(1-act) I - e I]
        top = jnp.concatenate([Q, A.T, G.T], axis=1) if me else \
            jnp.concatenate([Q, G.T], axis=1)
        if me:
            mid = jnp.concatenate(
                [A, -reg * jnp.eye(me, dtype=dtype),
                 jnp.zeros((me, mi), dtype=dtype)], axis=1)
        G_act = act[:, None] * G
        zblk = jnp.diag(-(1.0 - act) - reg)
        bot = jnp.concatenate(
            [G_act] + ([jnp.zeros((mi, me), dtype=dtype)] if me else []) +
            [zblk], axis=1)
        K = jnp.concatenate([top] + ([mid] if me else []) + [bot], axis=0)
        rhs = jnp.concatenate(
            [-c] + ([b] if me else []) + [act * h])
        sol = gj_solve(K, rhs)
        sol = sol + gj_solve(K, rhs - K @ sol)   # one refinement pass
        v_p = sol[:n]
        y_p = sol[n:n + me]
        z_p = sol[n + me:]
        # All acceptance checks are RELATIVE to the row/dual scale: at
        # storm-class magnitudes (|h| ~ 1e3) an absolute 1e-7 test is 1e-10
        # relative — below what fusion-dependent emulated-f64 rounding can
        # reproducibly deliver, making acceptance flicker between compiled
        # contexts.  1e-7 relative is still four orders tighter than the
        # algorithmic TOLERANCE (1e-3) consuming these solutions.
        feas = jnp.all(G @ v_p - h <= 1e-7 * (1.0 + jnp.abs(h))) \
            if mi else jnp.bool_(True)
        # Dual nonnegativity is tested against the DUAL DATA scale (1+max|c|),
        # not max|z_p|: with a wide z_p spread the latter would let a
        # meaningfully negative multiplier pass, get clamped to 0 below, and
        # corrupt the duals feeding pi_cuts / the bootstrap lower bound.
        feas &= jnp.min(z_p) >= -1e-7 * scale_d
        if me:
            feas &= jnp.all(jnp.abs(A @ v_p - b) <= 1e-7 * (1.0 + jnp.abs(b)))
        rd_p = Q @ v_p + c + (A.T @ y_p if me else 0.0) + \
            G.T @ jnp.maximum(z_p, 0.0)
        stat_ok = jnp.max(jnp.abs(rd_p)) <= soft * scale_d
        # Adopt the polished point only when it passes the FULL KKT check
        # (stationarity included) — never replace an already-converged IPM
        # solution with a merely-feasible polish.
        use = feas & stat_ok
        v = jnp.where(use, v_p, v)
        y = jnp.where(use, y_p, y) if me else y
        z = jnp.where(use, jnp.maximum(z_p, 0.0), z)
        s = jnp.where(use, jnp.maximum(h - G @ v, 0.0), s)
        done = done | (feas & stat_ok)

    obj = 0.5 * v @ (Q @ v) + c @ v
    return QPResult(converged=done, v=v, obj=obj, y=y, z=z, s=s,
                    iters=it, gap=gap)
