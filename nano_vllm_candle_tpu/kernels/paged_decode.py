"""Pallas TPU paged-attention decode kernel.

Replaces the XLA gather fallback (``ops/attention.py:paged_decode_attention``,
which materializes every sequence's gathered KV in HBM) with a streaming
kernel: for each (sequence, page) grid step the Pallas pipeline DMAs exactly
one KV page from HBM into VMEM — double-buffered automatically — while the
kernel folds it into an online-softmax accumulator (flash-attention style,
f32 statistics). KV is read once at HBM speed-of-light; nothing quadratic is
ever materialized.

Design notes:
- **Page gather via BlockSpec indirection**: the page index map reads the
  (scalar-prefetched) block table, so the pipeline fetches physical pages in
  block-table order. No manual DMA bookkeeping.
- **Out-of-range clamping**: past a sequence's last page the index map
  returns the last valid page again; Pallas skips re-fetching a block whose
  index didn't change, so short sequences in a long-grid batch cost no extra
  bandwidth, and compute is skipped with ``pl.when``.
- **Head-major pages** (``[nkv, ps, hd]``, models/qwen3.KVCache): a fetched
  page is directly the per-head matmul operand. The earlier token-major
  layout needed two VMEM ``swapaxes`` per page (Mosaic's batched matmul
  wants batch dims in equal operand positions), measured ~12% of the kernel.
- **Native-dtype MXU**: q/k/v feed the MXU in their stored dtype (bf16 in
  production) with f32 accumulation — ``preferred_element_type=f32``. An
  earlier version upcast operands to f32 first, which forced the MXU's f32
  path (several times fewer MACs/s) and cost ~30% end-to-end.
- **GQA grouping**: q is ``[B, nkv, g, hd]``; scores are batched matmuls per
  KV head — K/V are never expanded (the reference had to emulate
  numpy.repeat semantics for this, ``/root/reference/src/models/
  qwen3.rs:236-256``).

Numerics follow the online-softmax recurrence; masking uses
``-0.7 * f32_max`` (never ``-inf``) and the final division guards l == 0
(inactive padding slots), matching the XLA reference twin at f32
statistics (p is cast to the cache dtype for the PV matmul, same as the
twin's ``weights.astype(v.dtype)``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    # scalar prefetch
    li_ref,  # [1] int32 layer index into the stacked cache
    seq_lens_ref,  # [B] int32 (committed length in ring mode)
    block_tables_ref,  # [B, W] int32
    *args,  # [total_lens_ref,] blocks..., outputs..., scratch...
    scale: float,
    page_size: int,
    num_pages_per_seq: int,
    quantized: bool,
    return_stats: bool,
    ring: bool,
):
    if ring:
        total_lens_ref, *args = args
    q_ref, k_ref, v_ref, *rest = args
    # q_ref [1, nkv, g, hd]; k/v_ref [1, 1, nkv, ps, hd]
    if quantized:
        ks_ref, vs_ref, *rest = rest
    if ring:
        rk_ref, rv_ref, *rest = rest  # [1, 1, GROUP, nkv, hd]
    if return_stats:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    w = pl.program_id(1)
    seq_len = seq_lens_ref[b]

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(w * page_size < seq_len)
    def _compute():
        _, nkv, g, hd = q_ref.shape
        nq = nkv * g
        q = q_ref[0]  # [nkv, g, hd] — native dtype into the MXU
        k = k_ref[0, 0]  # [nkv, ps, hd]
        v = v_ref[0, 0]
        ks = vs = None
        if quantized:
            # int8 values are exact in bf16 — bare casts, then fold the
            # per-vector scales into the small post-matmul tensors (k-scale
            # into scores, v-scale into p; matches the XLA twin,
            # ops/attention.py). Dequantizing whole [nkv, ps, hd] pages in
            # f32 cost ~35% of the decode step at batch 64. Scale planes
            # are token-major ([ps, nkv], commit-window tiling); one small
            # 2D VMEM transpose recovers the head-major broadcast shape.
            cdt = q.dtype if q.dtype != jnp.int8 else jnp.bfloat16
            ks = jnp.swapaxes(ks_ref[0, 0], 0, 1)  # [nkv, ps] f32
            vs = jnp.swapaxes(vs_ref[0, 0], 0, 1)
            k = k.astype(cdt)
            v = v.astype(cdt)

        # scores[nkv, g, ps]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if ks is not None:
            s = s * ks[:, None, :]

        token_idx = w * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (nkv, g, page_size), 2
        )
        s = jnp.where(token_idx < seq_len, s, MASK_VALUE)
        s2 = s.reshape(nq, page_size)

        m_prev = m_ref[:, :1]  # [nq, 1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s2, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s2 - m_next)  # [nq, ps] f32
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        p3 = p.reshape(nkv, g, page_size)
        if vs is not None:
            p3 = p3 * vs[:, None, :]
        pv = jax.lax.dot_general(
            p3.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(nq, hd)
        acc_ref[...] = acc_ref[...] * alpha + pv

    if ring:
        @pl.when(w == num_pages_per_seq)
        def _ring_tail():
            # Uncommitted tail: ring row j holds position committed + j in
            # the ACTIVATION dtype (no dequant scales even under int8 KV).
            _, nkv, g, hd = q_ref.shape
            nq = nkv * g
            G = rk_ref.shape[2]
            q = q_ref[0]
            k = jnp.swapaxes(rk_ref[0, 0], 0, 1)  # [nkv, GROUP, hd]
            v = jnp.swapaxes(rv_ref[0, 0], 0, 1)
            s = jax.lax.dot_general(
                q, k.astype(q.dtype),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [nkv, g, GROUP]
            n_tail = total_lens_ref[b] - seq_len
            j = jax.lax.broadcasted_iota(jnp.int32, (nkv, g, G), 2)
            s = jnp.where(j < n_tail, s, MASK_VALUE)
            s2 = s.reshape(nq, G)
            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_curr = jnp.max(s2, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s2 - m_next)
            p = jnp.where(j.reshape(nq, G) < n_tail, p, 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
            pv = jax.lax.dot_general(
                p.reshape(nkv, g, G).astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(nq, hd)
            acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(w == num_pages_per_seq - 1 + int(ring))
    def _finalize():
        _, nkv, g, hd = o_ref.shape
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = (acc_ref[...] / safe_l).reshape(nkv, g, hd)
        o_ref[0] = out.astype(o_ref.dtype)
        if return_stats:
            # Full (nq, 128)-broadcast stats blocks (tile-aligned output);
            # callers read column 0.
            mo_ref[0] = m_ref[...]
            lo_ref[0] = l_ref[...]


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "return_stats")
)
def pallas_paged_decode_attention(
    q: jax.Array,  # [B, nq, hd]
    k_cache: jax.Array,  # [L, P, nkv, ps, hd] (or [P, nkv, ps, hd], layer 0)
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,  # [B] int32
    scale: float,
    *,
    k_scale: Optional[jax.Array] = None,  # [L, P, ps, nkv] f32 (int8 KV)
    v_scale: Optional[jax.Array] = None,
    layer_index: Optional[jax.Array] = None,
    ring_k: Optional[jax.Array] = None,  # [L, B, GROUP+1, nkv, hd]
    ring_v: Optional[jax.Array] = None,
    total_lens: Optional[jax.Array] = None,  # [B] int32 incl. ring tail
    interpret: bool = False,
    return_stats: bool = False,
):
    """Decode attention against one layer of the full stacked paged cache.

    Taking the stacked ``[L, ...]`` cache + a runtime ``layer_index`` (rather
    than a pre-sliced layer) lets the surrounding ``lax.scan`` keep the cache
    in its carry with zero slicing traffic — the layer choice happens inside
    the BlockSpec index map, so only the block-table-addressed pages of layer
    ``layer_index`` are ever DMA'd.

    INT8 caches pass ``k_scale``/``v_scale``; dequantization happens in VMEM
    right after the page DMA, so the HBM read is genuinely half-width.

    ``return_stats=True`` additionally returns the online-softmax statistics
    ``(m, l)`` as f32 ``[B, nq]`` (row max and exp-sum), letting the caller
    merge this partial attention with another source via the flash combine
    identity. With stats, ``out`` is still normalized by ``l``.

    ``ring_k``/``ring_v`` + ``total_lens`` fold the group-commit ring's
    uncommitted tail (positions ``[seq_lens, total_lens)``) INTO the kernel
    as one extra grid step per slot — replacing the XLA-side
    ``_ring_attention`` + flash combine (and their per-layer ring-slice
    copies and ``[B, nq, 128]`` stats round trips) with a 64 KB VMEM block
    that is fetched once per (layer, slot). ``seq_lens`` is then the
    COMMITTED length.
    """
    B, nq, hd = q.shape
    quantized = k_scale is not None
    ring = ring_k is not None
    if k_cache.ndim == 4:  # single-layer convenience form (tests)
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        if quantized:
            k_scale = k_scale[None]
            v_scale = v_scale[None]
        layer_index = jnp.zeros((), jnp.int32)
    L, P, nkv, ps, _ = k_cache.shape
    g = nq // nkv
    W = block_tables.shape[1]
    qg = q.reshape(B, nkv, g, hd)
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)

    def q_index_map(b, w, li_ref, seq_lens_ref, block_tables_ref, *_):
        return (b, 0, 0, 0)

    def kv_index_map(b, w, li_ref, seq_lens_ref, block_tables_ref, *_):
        # Clamp past-the-end pages to the last valid page: the repeated block
        # index makes the Pallas pipeline skip the redundant DMA.
        last = jnp.maximum(pl.cdiv(seq_lens_ref[b], ps) - 1, 0)
        w_eff = jnp.minimum(w, last)
        return (li_ref[0], block_tables_ref[b, w_eff], 0, 0, 0)

    def scale_index_map(b, w, li_ref, seq_lens_ref, block_tables_ref, *_):
        last = jnp.maximum(pl.cdiv(seq_lens_ref[b], ps) - 1, 0)
        w_eff = jnp.minimum(w, last)
        return (li_ref[0], block_tables_ref[b, w_eff], 0, 0)

    in_specs = [
        pl.BlockSpec((1, nkv, g, hd), q_index_map),
        pl.BlockSpec((1, 1, nkv, ps, hd), kv_index_map),
        pl.BlockSpec((1, 1, nkv, ps, hd), kv_index_map),
    ]
    operands = [qg, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, ps, nkv), scale_index_map),
            pl.BlockSpec((1, 1, ps, nkv), scale_index_map),
        ]
        operands += [k_scale, v_scale]
    if ring:
        GR = ring_k.shape[2] - 1  # ring rows minus the trash row

        def ring_index_map(b, w, li_ref, seq_lens_ref, block_tables_ref, *_):
            return (li_ref[0], b, 0, 0, 0)

        in_specs += [
            pl.BlockSpec((1, 1, GR, nkv, hd), ring_index_map),
            pl.BlockSpec((1, 1, GR, nkv, hd), ring_index_map),
        ]
        operands += [ring_k, ring_v]

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=ps, num_pages_per_seq=W,
        quantized=quantized, return_stats=return_stats, ring=ring,
    )
    out_dtype = q.dtype
    nq_ = nkv * g
    out_shape = jax.ShapeDtypeStruct((B, nkv, g, hd), out_dtype)
    out_specs = pl.BlockSpec((1, nkv, g, hd), q_index_map)
    if return_stats:
        def stat_index_map(b, w, li_ref, seq_lens_ref, block_tables_ref, *_):
            return (b, 0, 0)

        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((B, nq_, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, nq_, 128), jnp.float32),
        )
        out_specs = (
            out_specs,
            pl.BlockSpec((1, nq_, 128), stat_index_map),
            pl.BlockSpec((1, nq_, 128), stat_index_map),
        )
    scalars = [li, seq_lens, block_tables]
    if ring:
        scalars.append(total_lens.astype(jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(B, W + int(ring)),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nq_, 128), jnp.float32),  # m
            pltpu.VMEM((nq_, 128), jnp.float32),  # l
            pltpu.VMEM((nq_, hd), jnp.float32),  # acc
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalars, *operands)
    if return_stats:
        out, m, l = res
        return out.reshape(B, nq, hd), m[:, :, 0], l[:, :, 0]
    return res.reshape(B, nq, hd)
