"""Pallas TPU kernel for the SD argmax (cut-height) reduction.

The hot loop of the algorithm (computeIstar, stocUpdate.c:142-190) is, per
observation o, an argmax over the dual-vertex pool of

    H[s, o] = (sigma.pib - piCbarX)[s] + delta_pib[lidx[s], o] - dpiCx[s, o]

The dual-stability split (cuts.c:118-128) needs THREE masked argmaxes per
observation (all vertices / ck <= threshold / ck > threshold).  The XLA
fallback materializes three masked [S, O] tables; this kernel streams the
height table through VMEM once and produces all three (max, argmax) pairs in
a single pass — one read of H instead of six.

TPU constraints honored here (see the Pallas guide):
  * no f64 on the VPU — selection runs in f32; the caller re-gathers exact
    f64 heights at the winning indices (any pool index yields a *valid*
    minorant, argmax only controls tightness, so f32 tie-breaks are safe);
  * all refs are >= 2-D with a 128-lane last axis; masks ship as [S, 1]
    int32 columns; outputs as [1, O] rows;
  * argmax is computed as min-index-attaining-max via broadcasted_iota;
  * NO pallas grid: the remote-compile backend in this environment fails to
    lower gridded kernels, so tiling over the observation axis is done
    manually — small tables are taken whole into VMEM, large ones stay in
    HBM (pl.ANY) and are streamed with double-buffered async DMA inside a
    fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e300          # f64 sentinel used by the XLA fallback
_NEG32 = -3.0e38       # finite f32 sentinel for the kernel

# VMEM budget (bytes) for choosing the path at trace time.  A [S, 1] int32
# column pads to [S, 128] on chip (512 B/row), hence the three masks are
# bit-packed into ONE column; the stream path double-buffers [S, CHUNK] f32.
#
# Working-set accounting: Mosaic stack-allocates the _reduce3 temporaries —
# the broadcasted iota ([S, O] int32) and one masked copy of the block
# ([S, O] f32) are live together with the block itself, so the whole-VMEM
# path costs ~3x the table (measured: a 7.1 MiB [1544, 1152] table hit the
# 16 MiB scoped-vmem limit at 21.2 MiB).  The stream path holds the
# double-buffered scratch (2 chunks) plus the same two temporaries per
# chunk, ~4 chunk-buffers; use 5 for headroom.
_VMEM_BUDGET = 12 * 2 ** 20
_WHOLE_MULT = 3
_STREAM_MULT = 5
_MASK_ROW_BYTES = 512


def _reduce3(H, mask_bits, S):
    """Three masked (first-argmax, max) pairs over axis 0 of an f32 block.

    mask_bits: [S, 1] int32 bitfield — bit0 = all, bit1 = old, bit2 = new.
    """
    s_ids = jax.lax.broadcasted_iota(jnp.int32, H.shape, dimension=0)
    neg = jnp.float32(_NEG32)
    S32 = jnp.int32(S)

    def mr(bit):
        Hm = jnp.where((mask_bits & jnp.int32(bit)) > 0, H, neg)
        hmax = jnp.max(Hm, axis=0, keepdims=True)     # [1, TO]
        hit = Hm >= hmax
        idx = jnp.min(jnp.where(hit, s_ids, S32), axis=0, keepdims=True)
        return idx, hmax

    return mr(1) + mr(2) + mr(4)                      # 6-tuple of [1, TO]


def _whole_kernel(H_ref, mask_ref,
                  iall_ref, hall_ref, iold_ref, hold_ref, inew_ref, hnew_ref):
    S = H_ref.shape[0]
    ia, ha, io, ho, inw, hn = _reduce3(H_ref[:, :], mask_ref[:, :], S)
    iall_ref[:, :] = ia
    hall_ref[:, :] = ha
    iold_ref[:, :] = io
    hold_ref[:, :] = ho
    inew_ref[:, :] = inw
    hnew_ref[:, :] = hn


def _make_stream_kernel(S, O, CHUNK):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = O // CHUNK

    def kernel(H_hbm, mask_ref,
               iall_ref, hall_ref, iold_ref, hold_ref, inew_ref, hnew_ref):
        mask_bits = mask_ref[:, :]

        def body(scratch, sem):
            def get_dma(slot, ci):
                slot = jnp.asarray(slot, jnp.int32)   # x64 mode: Python-int
                ci = jnp.asarray(ci, jnp.int32)       # indices lower as i64
                return pltpu.make_async_copy(
                    H_hbm.at[:, pl.ds(ci * jnp.int32(CHUNK), CHUNK)],
                    scratch.at[slot], sem.at[slot])

            get_dma(0, 0).start()

            def loop(ci, carry):
                one = jnp.int32(1)            # x64 mode: keep every index
                slot = jax.lax.rem(ci, jnp.int32(2))      # 32-bit for Mosaic
                nxt = jax.lax.rem(ci + one, jnp.int32(2))

                @pl.when(ci + one < jnp.int32(n_chunks))
                def _():
                    get_dma(nxt, ci + one).start()

                get_dma(slot, ci).wait()
                ia, ha, io, ho, inw, hn = _reduce3(
                    scratch[slot], mask_bits, S)
                off = pl.ds(ci * CHUNK, CHUNK)
                iall_ref[:, off] = ia
                hall_ref[:, off] = ha
                iold_ref[:, off] = io
                hold_ref[:, off] = ho
                inew_ref[:, off] = inw
                hnew_ref[:, off] = hn
                return carry

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), loop,
                              jnp.int32(0))

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, S, CHUNK), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def pallas_path_available(S: int, O: int) -> bool:
    """Whether a TPU kernel path exists for an [S, O] f32 height table."""
    if O % 128 != 0:
        return False
    S = ((S + 7) // 8) * 8          # sublane padding (see _triple_argmax_f32)
    mask_bytes = S * _MASK_ROW_BYTES
    if _WHOLE_MULT * S * O * 4 + mask_bytes <= _VMEM_BUDGET:
        return True
    # minimum stream chunk (128 lanes)
    return _STREAM_MULT * S * 128 * 4 + mask_bytes <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def _triple_argmax_f32(H32, base_mask, old_mask, new_mask, *,
                       interpret: bool = False):
    """Raw kernel launch: H32 [S, O] f32, masks [S] bool -> six [O] arrays."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, O = H32.shape
    # Mosaic requires HBM memref slices 8-aligned along the sublane dim
    # ("Slice shape along dimension 0 must be aligned to tiling (8)"): pad
    # the pool axis.  Padded rows carry the sentinel and a zero mask, so
    # they are never selected.
    if S % 8:
        pad = 8 - S % 8
        H32 = jnp.concatenate(
            [H32, jnp.full((pad, O), _NEG32, jnp.float32)], axis=0)
        zpad = jnp.zeros(pad, bool)
        base_mask = jnp.concatenate([base_mask, zpad])
        old_mask = jnp.concatenate([old_mask, zpad])
        new_mask = jnp.concatenate([new_mask, zpad])
        S = S + pad
    mask_bits = (base_mask.astype(jnp.int32)
                 + 2 * old_mask.astype(jnp.int32)
                 + 4 * new_mask.astype(jnp.int32)).reshape(S, 1)
    out_shape = tuple(
        jax.ShapeDtypeStruct((1, O), dt)
        for dt in (jnp.int32, jnp.float32) * 3)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    mask_bytes = S * _MASK_ROW_BYTES
    if _WHOLE_MULT * S * O * 4 + mask_bytes <= _VMEM_BUDGET:
        kernel, h_spec = _whole_kernel, vspec
    else:
        budget = (_VMEM_BUDGET - mask_bytes) // (_STREAM_MULT * S * 4)
        CHUNK = 128
        while CHUNK * 2 <= budget and O % (CHUNK * 2) == 0:
            CHUNK *= 2
        kernel = _make_stream_kernel(S, O, CHUNK)
        h_spec = pl.BlockSpec(memory_space=pl.ANY)

    outs = pl.pallas_call(
        kernel,
        in_specs=[h_spec, vspec],
        out_specs=(vspec,) * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(H32, mask_bits)
    return tuple(o.reshape(O) for o in outs)


def triple_masked_argmax(H, base_mask, old_mask, new_mask, *,
                         interpret: bool = False):
    """Returns (i_all, h_all, i_old, h_old, i_new, h_new), each [O].

    H: [S, O] float (any precision); masks: [S] bool.  Selection runs on the
    TPU VPU in f32; returned heights are exact ``H[i, o]`` gathers in H's own
    dtype (matching the XLA fallback up to f32 argmax tie-breaking), with the
    fallback's ``_NEG`` sentinel where a mask selects nothing.
    """
    S, O = H.shape
    # Clamp into the finite f32 range before casting: f64 magnitudes beyond
    # ~3.4e38 would overflow to inf/-inf and break the kernel's finite
    # sentinel logic.  (f32-resolution ties may still pick a different —
    # equally valid — vertex than the f64 XLA fallback; see cuts.py caller.)
    f32max = jnp.asarray(jnp.finfo(jnp.float32).max, H.dtype)
    H32 = jnp.clip(H, -f32max, f32max).astype(jnp.float32)
    ia, _, io, _, inw, _ = _triple_argmax_f32(
        H32, base_mask, old_mask, new_mask, interpret=interpret)

    o_ids = jnp.arange(O)
    neg = jnp.asarray(_NEG, H.dtype)

    def gather(idx, mask):
        idx_c = jnp.minimum(idx, S - 1)
        h = H[idx_c, o_ids]
        return idx_c, jnp.where(mask[idx_c] & (idx < S), h, neg)

    i_all, h_all = gather(ia, base_mask)
    i_old, h_old = gather(io, old_mask)
    i_new, h_new = gather(inw, new_mask)
    return i_all, h_all, i_old, h_old, i_new, h_new


def triple_masked_argmax_xla(H, base_mask, old_mask, new_mask):
    """Reference jnp implementation (used off-TPU and in tests)."""
    def mr(mask):
        Hm = jnp.where(mask[:, None], H, _NEG)
        return jnp.argmax(Hm, axis=0).astype(jnp.int32), jnp.max(Hm, axis=0)

    ia, ha = mr(base_mask)
    io, ho = mr(old_mask)
    inw, hn = mr(new_mask)
    return ia, ha, io, ho, inw, hn
