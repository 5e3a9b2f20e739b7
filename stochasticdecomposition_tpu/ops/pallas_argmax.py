"""Pallas TPU kernel for the SD argmax (cut-height) reduction.

The hot loop of the algorithm (computeIstar, stocUpdate.c:142-190) is, per
observation o, an argmax over the dual-vertex pool of

    H[s, o] = (sigma.pib - piCbarX)[s] + delta_pib[lidx[s], o] - dpiCx[s, o]

The dual-stability split (cuts.c:118-128) needs THREE masked argmaxes per
observation (all vertices / ck <= threshold / ck > threshold).  The XLA
fallback materializes three masked [S, O] tables; this kernel streams the
height table tile-by-tile out of VMEM and produces all three (max, argmax)
pairs in one pass — one read of H instead of six.

Grid: observation tiles; each program reduces over the full pool axis in
VMEM-sized chunks.  Written for the plain (no random cost) path where the
pool axis is the sigma pool; the randcost basis path reuses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e300


def _kernel(H_ref, base_mask_ref, old_mask_ref, new_mask_ref,
            iall_ref, hall_ref, iold_ref, hold_ref, inew_ref, hnew_ref):
    import jax.numpy as jnp

    H = H_ref[:, :]                                   # [S, TO]
    S = H.shape[0]
    s_ids = jax.lax.broadcasted_iota(jnp.int32, H.shape, dimension=0)

    def masked_reduce(mask_col):
        Hm = jnp.where(mask_col[:, None], H, _NEG)
        hmax = jnp.max(Hm, axis=0)
        # argmax via first index attaining the max
        hit = Hm >= hmax[None, :]
        idx = jnp.min(jnp.where(hit, s_ids, S), axis=0).astype(jnp.int32)
        return idx, hmax

    ia, ha = masked_reduce(base_mask_ref[:])
    io, ho = masked_reduce(old_mask_ref[:])
    inw, hn = masked_reduce(new_mask_ref[:])
    iall_ref[:] = ia
    hall_ref[:] = ha
    iold_ref[:] = io
    hold_ref[:] = ho
    inew_ref[:] = inw
    hnew_ref[:] = hn


@functools.partial(jax.jit, static_argnames=("interpret",))
def triple_masked_argmax(H, base_mask, old_mask, new_mask, *,
                         interpret: bool = False):
    """Returns (i_all, h_all, i_old, h_old, i_new, h_new), each [O].

    H: [S, O] float; masks: [S] bool.  Pure-jnp fallback semantics; the
    Pallas path is selected by callers on TPU backends.
    """
    from jax.experimental import pallas as pl

    S, O = H.shape
    TO = 128 if O % 128 == 0 else O   # lane-aligned obs tile when possible
    grid = (O // TO,)

    out_shape = tuple(
        jax.ShapeDtypeStruct((O,), dt)
        for dt in (jnp.int32, H.dtype, jnp.int32, H.dtype, jnp.int32, H.dtype))

    out_spec = pl.BlockSpec((TO,), lambda i: (i,))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, TO), lambda i: (0, i)),
            pl.BlockSpec((S,), lambda i: (0,)),
            pl.BlockSpec((S,), lambda i: (0,)),
            pl.BlockSpec((S,), lambda i: (0,)),
        ],
        out_specs=(out_spec,) * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(H, base_mask, old_mask, new_mask)


def triple_masked_argmax_xla(H, base_mask, old_mask, new_mask):
    """Reference jnp implementation (used off-TPU and in tests)."""
    def mr(mask):
        Hm = jnp.where(mask[:, None], H, _NEG)
        return jnp.argmax(Hm, axis=0).astype(jnp.int32), jnp.max(Hm, axis=0)

    ia, ha = mr(base_mask)
    io, ho = mr(old_mask)
    inw, hn = mr(new_mask)
    return ia, ha, io, ho, inw, hn
