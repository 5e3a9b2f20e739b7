"""Scenario sampler: the TPU-native ``generateOmega`` (reference: algo.c:145).

The reference draws one observation per iteration from the stoch-file
distributions with a hand-rolled LCG seeded by RUN_SEED.  Here the
distributions (INDEP discrete/normal/uniform + BLOCKS discrete) are staged
into padded tables and sampled with `jax.random` — reproducing the
*distributions* (not the reference bit-stream) with explicit threaded PRNG
keys, so sampling vmaps/shards across observation batches and devices.

The omega vector layout follows the reference's rvOffset convention
(subprob.c:107-110,141): [ b-block | C-block | d-block ], mean-UNcentered.
Mean-centering happens in the algorithm loop (algo.c:148-149).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stochasticdecomposition_tpu.smps.stoc import (
    DIST_BLOCK, DIST_DISCRETE, DIST_NORMAL, DIST_UNIFORM, StocData,
)


class SamplerSpec(NamedTuple):
    """Padded distribution tables; all leaves are arrays (a pytree)."""

    num_rv: int
    # INDEP DISCRETE: for each such RV, support and cdf (padded to max size).
    disc_pos: jnp.ndarray       # [n_disc] positions in the omega vector
    disc_vals: jnp.ndarray      # [n_disc, S]
    disc_cdf: jnp.ndarray       # [n_disc, S] inclusive cdf, padded with 1.0
    # INDEP NORMAL.
    norm_pos: jnp.ndarray       # [n_norm]
    norm_mean: jnp.ndarray
    norm_std: jnp.ndarray
    # INDEP UNIFORM.
    unif_pos: jnp.ndarray       # [n_unif]
    unif_lo: jnp.ndarray
    unif_hi: jnp.ndarray
    # BLOCKS DISCRETE: joint outcomes scattered to member positions.
    blk_cdf: jnp.ndarray        # [n_blk, O] inclusive cdf padded with 1.0
    blk_pos: jnp.ndarray        # [n_blk, M] member positions (pad: 0)
    blk_mask: jnp.ndarray       # [n_blk, M] member validity
    blk_vals: jnp.ndarray       # [n_blk, O, M]


def build_sampler(stoc: StocData, rv_order: np.ndarray) -> SamplerSpec:
    """Stage a parsed stoch file into padded sampling tables.

    ``rv_order[i]`` is the omega-vector position of parsed element i (the
    [b|C|d] grouping permutation computed by prob.decompose).
    """
    disc, norm, unif = [], [], []
    for i, el in enumerate(stoc.elements):
        pos = int(rv_order[i])
        if el.dist == DIST_DISCRETE:
            disc.append((pos, el.values, el.probs))
        elif el.dist == DIST_NORMAL:
            norm.append((pos, el.p1, el.p2))
        elif el.dist == DIST_UNIFORM:
            unif.append((pos, el.p1, el.p2))
        elif el.dist == DIST_BLOCK:
            pass   # handled through stoc.blocks
        else:
            raise ValueError(el.dist)

    S = max([len(v) for _, v, _ in disc], default=1)
    n_disc = len(disc)
    disc_pos = np.zeros(n_disc, np.int32)
    disc_vals = np.zeros((n_disc, S))
    disc_cdf = np.ones((n_disc, S))
    for k, (pos, vals, probs) in enumerate(disc):
        disc_pos[k] = pos
        disc_vals[k, :len(vals)] = vals
        disc_vals[k, len(vals):] = vals[-1]
        disc_cdf[k, :len(probs)] = np.cumsum(probs)

    n_blk = len(stoc.blocks)
    O = max([len(b.probs) for b in stoc.blocks], default=1)
    M = max([len(b.elem_indices) for b in stoc.blocks], default=1)
    blk_cdf = np.ones((n_blk, O))
    blk_pos = np.zeros((n_blk, M), np.int32)
    blk_mask = np.zeros((n_blk, M), bool)
    blk_vals = np.zeros((n_blk, O, M))
    for k, b in enumerate(stoc.blocks):
        no, nm = len(b.probs), len(b.elem_indices)
        blk_cdf[k, :no] = np.cumsum(b.probs)
        blk_pos[k, :nm] = rv_order[np.asarray(b.elem_indices)]
        blk_mask[k, :nm] = True
        blk_vals[k, :no, :nm] = b.outcomes
        blk_vals[k, no:, :nm] = b.outcomes[-1]

    return SamplerSpec(
        num_rv=len(stoc.elements),
        disc_pos=jnp.asarray(disc_pos),
        disc_vals=jnp.asarray(disc_vals),
        disc_cdf=jnp.asarray(disc_cdf),
        norm_pos=jnp.asarray(np.array([p for p, _, _ in norm], np.int32)),
        norm_mean=jnp.asarray(np.array([m for _, m, _ in norm])),
        norm_std=jnp.asarray(np.sqrt(np.array([v for _, _, v in norm]))),
        unif_pos=jnp.asarray(np.array([p for p, _, _ in unif], np.int32)),
        unif_lo=jnp.asarray(np.array([lo for _, lo, _ in unif])),
        unif_hi=jnp.asarray(np.array([hi for _, _, hi in unif])),
        blk_cdf=jnp.asarray(blk_cdf),
        blk_pos=jnp.asarray(blk_pos),
        blk_mask=jnp.asarray(blk_mask),
        blk_vals=jnp.asarray(blk_vals),
    )


def sample_omega(spec: SamplerSpec, key, n: int, dtype=jnp.float64) -> jnp.ndarray:
    """Draw ``n`` raw (uncentered) observation vectors, shape [n, num_rv]."""
    k_disc, k_norm, k_unif, k_blk = jax.random.split(key, 4)
    out = jnp.zeros((n, spec.num_rv), dtype=dtype)

    n_disc = spec.disc_pos.shape[0]
    if n_disc:
        u = jax.random.uniform(k_disc, (n, n_disc))
        # inverse-cdf lookup: first index where u <= cdf
        idx = jnp.sum(u[:, :, None] > spec.disc_cdf[None, :, :], axis=-1)
        idx = jnp.clip(idx, 0, spec.disc_vals.shape[1] - 1)
        vals = jnp.take_along_axis(
            jnp.broadcast_to(spec.disc_vals[None], (n,) + spec.disc_vals.shape),
            idx[:, :, None], axis=-1)[..., 0]
        out = out.at[:, spec.disc_pos].set(vals.astype(dtype))

    if spec.norm_pos.shape[0]:
        z = jax.random.normal(k_norm, (n, spec.norm_pos.shape[0]))
        vals = spec.norm_mean[None] + spec.norm_std[None] * z
        out = out.at[:, spec.norm_pos].set(vals.astype(dtype))

    if spec.unif_pos.shape[0]:
        u = jax.random.uniform(k_unif, (n, spec.unif_pos.shape[0]))
        vals = spec.unif_lo[None] + (spec.unif_hi - spec.unif_lo)[None] * u
        out = out.at[:, spec.unif_pos].set(vals.astype(dtype))

    n_blk = spec.blk_cdf.shape[0]
    if n_blk:
        u = jax.random.uniform(k_blk, (n, n_blk))
        idx = jnp.sum(u[:, :, None] > spec.blk_cdf[None, :, :], axis=-1)
        idx = jnp.clip(idx, 0, spec.blk_vals.shape[1] - 1)
        # gather chosen outcome rows: [n, n_blk, M]
        chosen = jnp.take_along_axis(
            jnp.broadcast_to(spec.blk_vals[None], (n,) + spec.blk_vals.shape),
            idx[:, :, None, None], axis=2)[:, :, 0, :]
        # scatter into omega positions (masked members)
        flat_pos = spec.blk_pos.reshape(-1)
        flat_mask = spec.blk_mask.reshape(-1)
        flat_vals = chosen.reshape(n, -1)
        safe_pos = jnp.where(flat_mask, flat_pos, 0)
        contrib = jnp.where(flat_mask, flat_vals, 0.0)
        upd = jnp.zeros_like(out).at[:, safe_pos].add(contrib.astype(dtype))
        out = out + upd

    return out
