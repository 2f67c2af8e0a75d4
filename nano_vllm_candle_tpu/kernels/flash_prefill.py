"""Pallas TPU flash-attention kernel for packed multi-sequence prefill.

Replaces the XLA reference path (``ops/attention.py:packed_prefill_attention``,
which materializes [nkv, g, T, T] f32 scores in HBM — 64 MB/layer at T=1024)
with a tiled online-softmax kernel that keeps every score tile in VMEM.

Packed-segment insight: prompts are concatenated in order, so token index j >
i implies either same segment with position_j > position_i (causally masked)
or a *later* segment (segment-masked). Strictly-upper K tiles are therefore
fully masked and skipped exactly like plain causal flash attention — the
segment mask only matters inside the block-diagonal band.

GQA: the grid iterates over *query* heads with K/V blocks indexed by
``h // group`` in the BlockSpec index map, so K/V are never expanded in
memory (cf. the reference's emulated numpy.repeat,
``/root/reference/src/models/qwen3.rs:236-256``). Layout is heads-leading
``[h, T, hd]`` so every block's trailing two dims are (block, head_dim) —
Mosaic-tileable for any head_dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _prefill_kernel(
    # scalar prefetch: per-tile segment ranges for block-level skipping
    segf_q_ref,  # [Tq] int32 first real segment of each q tile (INT_MAX: none)
    segl_q_ref,  # [Tq] int32 last segment of each q tile (-1: all padding)
    segf_k_ref,  # [Tk] int32
    segl_k_ref,  # [Tk] int32
    ktstart_ref,  # [Tq] int32 first k tile of each q tile's causal band
    seg_q_ref,  # [1, 1, Bq] int32 (this q tile's segment ids)
    pos_q_ref,  # [1, 1, Bq] int32
    seg_k_ref,  # [1, 1, Bk] int32 (this k tile's)
    pos_k_ref,  # [1, 1, Bk] int32
    q_ref,  # [1, Bq, hd]
    k_ref,  # [1, Bk, hd]
    v_ref,  # [1, Bk, hd]
    o_ref,  # [1, Bq, hd]
    *rest,  # [mo_ref, lo_ref,] m_scr, l_scr, acc_scr
    scale: float,
    block_q: int,
    block_k: int,
    num_k_tiles: int,
    band_tiles: int,
    return_stats: bool,
):
    if return_stats:
        mo_ref, lo_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    qt = pl.program_id(1)
    b = pl.program_id(2)
    # Band grid (round 5): the k grid dim walks only this q tile's causal
    # band [ktstart[qt], ktstart[qt] + band_tiles), not all Tk tiles. At 64
    # packed 128-token prompts the old (nq, Tq, Tk) grid ran 16,384 steps
    # per layer of which only ~512 computed — the ~0.3 us/step scalar cost
    # of the SKIPPED tiles was ~90% of the kernel's 5.5 ms/layer. The band
    # start comes from scalar prefetch; its width is a static host-computed
    # bucket (model_runner passes the exact packed layout's band).
    kt = ktstart_ref[qt] + b

    @pl.when(b == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Skip strictly-upper tiles (k tile entirely after the q tile) AND
    # tiles whose segment ranges cannot overlap: in a packed multi-sequence
    # stream, a q tile of sequence s never attends into k tiles holding
    # only earlier sequences, so the useful region is the block-diagonal
    # band, not the full causal triangle. All-padding tiles (first=INT_MAX /
    # last=-1) can never overlap anything and are skipped outright. Band
    # positions past the table (kt >= Tk, from bucketed band widths at the
    # last q tiles) are skipped by the causal check (kt > qt there).
    causal_ok = (kt < num_k_tiles) & (
        kt * block_k <= qt * block_q + block_q - 1
    )
    kt_c = jnp.minimum(kt, num_k_tiles - 1)
    seg_ok = (segf_k_ref[kt_c] <= segl_q_ref[qt]) & (
        segf_q_ref[qt] <= segl_k_ref[kt_c]
    )

    @pl.when(causal_ok & seg_ok)
    def _compute():
        q = q_ref[0]  # [Bq, hd]
        k = k_ref[0]  # [Bk, hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bq, Bk]

        seg_q = seg_q_ref[0, 0]  # [Bq]
        pos_q = pos_q_ref[0, 0]
        seg_k = seg_k_ref[0, 0]  # [Bk]
        pos_k = pos_k_ref[0, 0]
        mask = (
            (seg_q[:, None] == seg_k[None, :])
            & (pos_k[None, :] <= pos_q[:, None])
            & (seg_q[:, None] >= 0)
        )  # [Bq, Bk]
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        v = v_ref[0]  # [Bk, hd]
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(b == band_tiles - 1)
    def _finalize():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / safe_l).astype(o_ref.dtype)
        if return_stats:
            # Full (Bq, 128)-broadcast stats blocks (tile-aligned output);
            # callers read column 0.
            mo_ref[0] = m_scr[...]
            lo_ref[0] = l_scr[...]


def host_band_tiles(seg_ids, T: int, block: int = 256) -> int:
    """Host-side twin of the kernel's band computation: the max number of k
    tiles any q tile's causal band spans for this packed layout, bucketed
    to a power of two (one jit variant per bucket). The runner computes
    this from the stream it just packed and passes it as the static
    ``band_tiles``; the kernel's scalar-prefetched ``ktstart`` does the
    per-tile positioning."""
    import numpy as np

    block = min(block, T)
    seg = np.asarray(seg_ids).reshape(T // block, block)
    last = seg.max(axis=1)
    first = np.where(seg >= 0, seg, np.iinfo(np.int32).max).min(axis=1)
    # first k tile containing any token of q tile's first segment
    cond = last[None, :] >= first[:, None]  # [Tq, Tk]
    ktstart = np.argmax(cond, axis=1)
    # All-padding q tiles (first == INT_MAX) skip every k tile in-kernel
    # (seg_ok is false) — excluding them here matters: their cond row is
    # all-False, argmax gives ktstart 0, and a trailing bucket-padding
    # tile would otherwise inflate the band to the full triangle (a
    # half-filled 1024 bucket measured band 4 == no optimization at all).
    real = first != np.iinfo(np.int32).max
    if not real.any():
        return 1
    width = int(np.max((np.arange(len(first)) - ktstart + 1)[real]))
    bw = 1
    while bw < width:
        bw *= 2
    return min(bw, T // block)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_q", "block_k", "interpret", "return_stats",
        "band_tiles",
    ),
)
def pallas_packed_prefill_attention(
    q: jax.Array,  # [T, nq, hd]
    k: jax.Array,  # [T, nkv, hd]
    v: jax.Array,  # [T, nkv, hd]
    seg_ids: jax.Array,  # [T] int32, -1 padding
    positions: jax.Array,  # [T] int32
    scale: float,
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    return_stats: bool = False,
    band_tiles: int | None = None,
):
    """Packed-segment causal flash attention.

    ``return_stats=True`` additionally returns the online-softmax statistics
    ``(m, l)`` as f32 ``[T, nq]`` (row max and exp-sum) for flash-merging
    with another attention source (the paged-prefix part of chunked /
    prefix-cached prefill, ``ops/attention.merge_attention_parts``).

    ``band_tiles`` (static): max causal-band width in k tiles — the k grid
    walks only each q tile's band instead of all T/block_k tiles (see
    ``_prefill_kernel``). None = the full triangle (always correct; pays
    the skipped tiles' grid overhead). Callers that know the packed layout
    on host (``host_band_tiles``) pass the exact bucket. MUST cover the
    widest band or tiles are silently skipped — asserted against the
    traced layout in the kernel's host twin."""
    T, nq, hd = q.shape
    nkv = k.shape[1]
    g = nq // nkv
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    if T % block_q or T % block_k:
        raise ValueError(f"T={T} must be a multiple of block sizes")
    num_k_tiles = T // block_k
    if band_tiles is None:
        band_tiles = num_k_tiles
    band_tiles = min(band_tiles, num_k_tiles)

    # heads-leading layout so block trailing dims are (block, hd)
    qh = q.transpose(1, 0, 2)  # [nq, T, hd]
    kh = k.transpose(1, 0, 2)  # [nkv, T, hd]
    vh = v.transpose(1, 0, 2)
    grid = (nq, T // block_q, band_tiles)

    kernel = functools.partial(
        _prefill_kernel,
        scale=scale, block_q=block_q, block_k=block_k, num_k_tiles=num_k_tiles,
        band_tiles=band_tiles, return_stats=return_stats,
    )
    Tk = num_k_tiles

    def kt_of(b, ktstart_ref, qt):
        return jnp.minimum(ktstart_ref[qt] + b, Tk - 1)

    out_shape = jax.ShapeDtypeStruct((nq, T, hd), q.dtype)
    out_specs = pl.BlockSpec((1, block_q, hd), lambda h, qt, b, *_: (h, qt, 0))
    if return_stats:
        stat_spec = pl.BlockSpec(
            (1, block_q, 128), lambda h, qt, b, *_: (h, qt, 0)
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((nq, T, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq, T, 128), jnp.float32),
        )
        out_specs = (out_specs, stat_spec, stat_spec)
    def tile_ranges(block):
        tiles = seg_ids.reshape(T // block, block)
        last = jnp.max(tiles, axis=1).astype(jnp.int32)
        first = jnp.min(
            jnp.where(tiles >= 0, tiles, jnp.iinfo(jnp.int32).max), axis=1
        ).astype(jnp.int32)
        return first, last

    segf_q, segl_q = tile_ranges(block_q)
    segf_k, segl_k = tile_ranges(block_k)
    # First k tile of each q tile's band: the first tile containing any
    # token of the q tile's first segment (in-trace twin of
    # host_band_tiles; padding-only q tiles get 0 and skip via seg_ok).
    ktstart = jnp.argmax(
        segl_k[None, :] >= segf_q[:, None], axis=1
    ).astype(jnp.int32)

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[
                # seg/pos delivered per-tile via BlockSpec (arrays reshaped
                # [n_tiles, 1, block]): dynamic in-kernel lane slices of a
                # full [1, T] row need starts statically divisible by 128,
                # which small tiles can't prove.
                pl.BlockSpec((1, 1, block_q), lambda h, qt, b, *_: (qt, 0, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, qt, b, *_: (qt, 0, 0)),
                pl.BlockSpec(
                    (1, 1, block_k),
                    lambda h, qt, b, sfq, slq, sfk, slk, kts: (
                        kt_of(b, kts, qt), 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k),
                    lambda h, qt, b, sfq, slq, sfk, slk, kts: (
                        kt_of(b, kts, qt), 0, 0),
                ),
                pl.BlockSpec((1, block_q, hd), lambda h, qt, b, *_: (h, qt, 0)),
                pl.BlockSpec(
                    (1, block_k, hd),
                    lambda h, qt, b, sfq, slq, sfk, slk, kts, g=g: (
                        h // g, kt_of(b, kts, qt), 0),
                ),
                pl.BlockSpec(
                    (1, block_k, hd),
                    lambda h, qt, b, sfq, slq, sfk, slk, kts, g=g: (
                        h // g, kt_of(b, kts, qt), 0),
                ),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, hd), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        segf_q, segl_q, segf_k, segl_k, ktstart,
        seg_ids.reshape(T // block_q, 1, block_q),
        positions.reshape(T // block_q, 1, block_q),
        seg_ids.reshape(T // block_k, 1, block_k),
        positions.reshape(T // block_k, 1, block_k),
        qh,
        kh,
        vh,
    )
    if return_stats:
        out, m, l = res
        return (
            out.transpose(1, 0, 2),
            m[:, :, 0].T,  # [T, nq]
            l[:, :, 0].T,
        )
    return res.transpose(1, 0, 2)


# --------------------------------------------------------------------------
# Chunk-vs-prefix attention (chunked / prefix-cached prefill)
# --------------------------------------------------------------------------


def _prefix_kernel(
    li_ref,  # [1] int32 layer index
    bt_ref,  # [W] int32 the sequence's pages
    plen_ref,  # [1] int32 committed prefix length
    q_ref,  # [nkv, Bq, g, hd] this q tile, ALL heads (kv-head-major)
    kv_ref,  # [1, 1, 2, nkv, ps, hd] combined K+V page, all heads
    *rest,  # [s_ref,] o_ref, mo_ref, lo_ref, m_scr, l_scr, acc_scr
    scale: float,
    page_size: int,
    num_pages: int,
    quantized: bool,
):
    """One grid step = (q tile, prefix page) with ALL heads batched.

    The round-2 design ran a (head, q-tile, page) grid with per-head page
    slices — every page slice was DMA'd nq x Tq times (measured ~15 GB of
    KV reads per 4096-token chunk at 16k prefix, >1s/chunk of pure
    re-reads). Here a page is one combined [2, nkv, ps, hd] block fetched
    once per q tile, and the per-head matmuls batch over nkv (one
    single-batch-dim tpu.matmul), cutting chunk KV traffic by ~nq x.
    """
    if quantized:
        s_ref, o_ref, mo_ref, lo_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, mo_ref, lo_ref, m_scr, l_scr, acc_scr = rest
    w = pl.program_id(1)
    ps = page_size
    plen = plen_ref[0]
    nkv, Bq, g, hd = q_ref.shape
    rows = nkv * Bq * g

    @pl.when(w == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(w * ps < plen)
    def _compute():
        q = q_ref[...].reshape(nkv, Bq * g, hd)
        k = kv_ref[0, 0, 0]  # [nkv, ps, hd]
        v = kv_ref[0, 0, 1]
        ks = vs = None
        if quantized:
            cdt = q.dtype if q.dtype != jnp.int8 else jnp.bfloat16
            ks = s_ref[0, 0, 0]  # [nkv, ps] f32, all heads
            vs = s_ref[0, 0, 1]
            k = k.astype(cdt)
            v = v.astype(cdt)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [nkv, Bq*g, ps]
        if ks is not None:
            s = s * ks[:, None, :]
        # Every prefix position precedes every chunk position: only the
        # prefix-length bound masks.
        tok = w * ps + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = (tok < plen).reshape(rows, ps)
        s2 = s.reshape(rows, ps)
        s2 = jnp.where(mask, s2, MASK_VALUE)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s2, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.where(mask, jnp.exp(s2 - m_next), 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        p3 = p.reshape(nkv, Bq * g, ps)
        if vs is not None:
            p3 = p3 * vs[:, None, :]
        pv = jax.lax.dot_general(
            p3.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(rows, hd)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(w == num_pages - 1)
    def _finalize():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (
            (acc_scr[...] / safe_l).reshape(nkv, Bq, g, hd).astype(o_ref.dtype)
        )
        mo_ref[...] = m_scr[...].reshape(nkv, Bq, g, 128)
        lo_ref[...] = l_scr[...].reshape(nkv, Bq, g, 128)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret")
)
def pallas_prefix_attention(
    q: jax.Array,  # [T, nq, hd] chunk queries (ONE sequence)
    kv_cache: jax.Array,  # [L, P, 2, nkv, ps, hd]
    block_table: jax.Array,  # [W] int32 (padded with the last valid page)
    prefix_len: jax.Array,  # scalar int32
    scale: float,
    *,
    kv_scale=None,  # [L, P, 2, nkv, ps] f32 (int8 KV)
    layer_index=None,
    block_q: int = 256,
    interpret: bool = False,
):
    """Chunk-vs-prefix attention for chunked / prefix-cached prefill: every
    chunk token attends to the sequence's entire committed prefix
    ``[0, prefix_len)``. Grid ``(T/Bq, W)``: one combined all-heads K+V
    page block per step (see ``_prefix_kernel``); returns normalized
    ``(out [T, nq, hd], m [T, nq], l [T, nq])`` for
    ``ops.attention.merge_attention_parts`` with the in-chunk flash part.
    ``l == 0`` rows (prefix_len == 0) merge to a no-op.

    XLA twin: ``ops/attention.prefix_attention``.
    """
    T, nq, hd = q.shape
    L, P, _, nkv, ps, _ = kv_cache.shape
    g = nq // nkv
    W = block_table.shape[0]
    quantized = kv_scale is not None
    block_q = min(block_q, T)
    if T % block_q:
        raise ValueError(f"T={T} must be a multiple of block_q={block_q}")
    li = jnp.asarray(layer_index if layer_index is not None else 0,
                     jnp.int32).reshape(1)
    plen = jnp.asarray(prefix_len, jnp.int32).reshape(1)

    # kv-head-major q: [nkv, T, g, hd]; row order nq = kvh*g + gi matches
    # the [T, nq] reshape convention everywhere else.
    qh = q.reshape(T, nkv, g, hd).transpose(1, 0, 2, 3)

    def q_map(qt, w, *_):
        return (0, qt, 0, 0)

    def kv_map(qt, w, li_ref, bt_ref, plen_ref):
        return (li_ref[0], bt_ref[w], 0, 0, 0, 0)

    def s_map(qt, w, li_ref, bt_ref, plen_ref):
        return (li_ref[0], bt_ref[w], 0, 0, 0)

    in_specs = [
        pl.BlockSpec((nkv, block_q, g, hd), q_map),
        pl.BlockSpec((1, 1, 2, nkv, ps, hd), kv_map),
    ]
    operands = [qh, kv_cache]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, 2, nkv, ps), s_map))
        operands.append(kv_scale)

    stat_spec = pl.BlockSpec((nkv, block_q, g, 128), q_map)
    res = pl.pallas_call(
        functools.partial(
            _prefix_kernel, scale=scale, page_size=ps, num_pages=W,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T // block_q, W),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((nkv, block_q, g, hd), q_map),
                stat_spec,
                stat_spec,
            ),
            scratch_shapes=[
                pltpu.VMEM((nkv * block_q * g, 128), jnp.float32),
                pltpu.VMEM((nkv * block_q * g, 128), jnp.float32),
                pltpu.VMEM((nkv * block_q * g, hd), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nkv, T, g, hd), q.dtype),
            jax.ShapeDtypeStruct((nkv, T, g, 128), jnp.float32),
            jax.ShapeDtypeStruct((nkv, T, g, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(li, block_table.astype(jnp.int32), plen, *operands)
    out, m, l = res
    out = out.transpose(1, 0, 2, 3).reshape(T, nq, hd)
    m = m[:, :, :, 0].transpose(1, 0, 2).reshape(T, nq)
    l = l[:, :, :, 0].transpose(1, 0, 2).reshape(T, nq)
    return out, m, l
