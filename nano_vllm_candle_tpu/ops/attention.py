"""Attention ops: packed-prefill and paged-decode (XLA reference paths).

These are the numerically-authoritative XLA implementations; the Pallas
kernels in ``nano_vllm_candle_tpu.kernels`` are validated against them and
substituted on TPU. Both replace the reference's naive O(T²)
host-masked attention (``/root/reference/src/models/qwen3.rs:258-275``) and
its GQA expand (``qwen3.rs:236-256``) with mask computation on device and a
grouped-einsum GQA that never materializes repeated K/V.

Shapes follow the paged-KV layout
``[num_pages, num_kv_heads, page_size, head_dim]`` (head-major pages —
see ``models/qwen3.KVCache``), with per-sequence block tables exactly like
the reference's ``Sequence::block_table`` contract
(``/root/reference/src/engine/sequence.rs:18``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def merge_attention_parts(o1, m1, l1, o2, m2, l2):
    """Flash-merge two NORMALIZED partial attentions with their online-
    softmax stats (row max ``m``, exp-sum ``l``; ``l == 0`` marks an empty
    part). Shapes: ``o* [T, nq, hd]``, ``m*/l* [T, nq]``. Used to combine
    the in-stream suffix attention with the paged-prefix attention in
    chunked / prefix-cached prefill."""
    m = jnp.maximum(m1, m2)
    w1 = l1 * jnp.exp(m1 - m)
    w2 = l2 * jnp.exp(m2 - m)
    denom = w1 + w2
    safe = jnp.where(denom == 0.0, 1.0, denom)
    num = (
        o1.astype(jnp.float32) * w1[..., None]
        + o2.astype(jnp.float32) * w2[..., None]
    )
    return (num / safe[..., None]).astype(o1.dtype)


def packed_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seg_ids: jax.Array,
    positions: jax.Array,
    scale: float,
    return_stats: bool = False,
):
    """Causal self-attention over a packed (multi-sequence) token batch.

    Multiple prompts are concatenated into one ``[T]`` token stream (static
    T per bucket); ``seg_ids`` marks which request each token belongs to
    (−1 = padding), ``positions`` its position within that request. A token
    attends to tokens of the same segment at positions <= its own — the
    segment-mask formulation of causal batching, which avoids the reference's
    per-sequence padded ``[B, T, T]`` masks (``llm_engine.rs:60-95``).

    Args:
      q: ``[T, num_q_heads, head_dim]``.
      k/v: ``[T, num_kv_heads, head_dim]``.
      seg_ids: ``[T]`` int32.
      positions: ``[T]`` int32.
      scale: softmax scale (1/sqrt(head_dim)).

    Returns:
      ``[T, num_q_heads, head_dim]`` in q.dtype.
    """
    T, nq, hd = q.shape
    nkv = k.shape[1]
    g = nq // nkv
    qg = q.reshape(T, nkv, g, hd)

    # scores[kv_head, group, T_q, T_kv]
    scores = jnp.einsum(
        "tkgd,skd->kgts", qg, k, preferred_element_type=jnp.float32
    ) * scale

    same_seg = seg_ids[:, None] == seg_ids[None, :]
    causal = positions[None, :] <= positions[:, None]
    valid = seg_ids[:, None] >= 0
    mask = same_seg & causal & valid  # [T_q, T_kv]
    scores = jnp.where(mask[None, None], scores, MASK_VALUE)

    if return_stats:
        m = jnp.max(scores, axis=-1)  # [nkv, g, T]
        p = jnp.exp(scores - m[..., None])
        p = jnp.where(mask[None, None], p, 0.0)
        l = jnp.sum(p, axis=-1)
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = jnp.einsum("kgts,skd->tkgd", p.astype(v.dtype), v)
        out = out / safe_l.transpose(2, 0, 1)[..., None].astype(v.dtype)
        return (
            out.reshape(T, nq, hd).astype(q.dtype),
            m.transpose(2, 0, 1).reshape(T, nq),
            l.transpose(2, 0, 1).reshape(T, nq),
        )

    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("kgts,skd->tkgd", weights.astype(v.dtype), v)
    return out.reshape(T, nq, hd).astype(q.dtype)


def paged_decode_attention(
    q: jax.Array,
    kv_cache: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    kv_scale: jax.Array | None = None,
    return_stats: bool = False,
    new_k: jax.Array | None = None,
    new_v: jax.Array | None = None,
):
    """One-token-per-sequence attention against the paged KV cache.

    Args:
      q: ``[B, num_q_heads, head_dim]`` — the new token's query per slot.
      kv_cache: ``[num_pages, 2, num_kv_heads, page_size, head_dim]``
        (combined head-major pages; see ``models/qwen3.KVCache``).
      block_tables: ``[B, max_blocks_per_seq]`` int32 physical page ids
        (entries past the sequence's pages may be arbitrary valid ids).
      seq_lens: ``[B]`` int32 — tokens in context *including* the new token.
      scale: softmax scale.
      kv_scale: ``[num_pages, 2, num_kv_heads, page_size]`` per-vector
        dequant scales for INT8 caches (None = unquantized); head-major,
        see ``models/qwen3.KVCache``.
      new_k/new_v: ``[B, num_kv_heads, head_dim]`` — the current token's
        k/v rows, FOLDED into the attention instead of being read back from
        the cache. With fold, pages only need tokens ``[0, seq_lens - 1)``
        and the page commit may be deferred past the attention (the Pallas
        kernels' contract, ``kernels/paged_decode.py``); without, the
        current row must already be committed. Folding is also exact under
        INT8 caches (the row never round-trips through quantization).

    Returns:
      ``[B, num_q_heads, head_dim]``.
    """
    B, nq, hd = q.shape
    _, _, nkv, page_size, _ = kv_cache.shape
    g = nq // nkv
    W = block_tables.shape[1]
    fold = new_k is not None

    # Gather each sequence's pages: [B, W, 2, nkv, page_size, hd]
    kv = jnp.take(kv_cache, block_tables, axis=0)
    S = W * page_size
    k = kv[:, :, 0]
    v = kv[:, :, 1]
    ks = vs = None
    if kv_scale is not None:
        # INT8 cache. int8 values are exactly representable in bf16, so a
        # bare cast is lossless; the per-vector scales FOLD into the tiny
        # post-matmul tensors instead of dequantizing whole pages:
        # k-scale rides the scores (s_t *= ks_t), v-scale rides the softmax
        # weights (p_t *= vs_t) — algebraically identical, far less VPU
        # traffic in the Pallas twin (kernels/paged_decode.py mirrors this).
        # head-major scale planes: [B, W, 2, nkv, ps] -> [B, nkv, W*ps]
        s_all = jnp.take(kv_scale, block_tables, axis=0)
        ks = s_all[:, :, 0].transpose(0, 2, 1, 3).reshape(B, nkv, S)
        vs = s_all[:, :, 1].transpose(0, 2, 1, 3).reshape(B, nkv, S)
        compute_dtype = q.dtype if q.dtype != jnp.int8 else jnp.bfloat16
        k = k.astype(compute_dtype)
        v = v.astype(compute_dtype)
        if fold:
            # The folded row is exact: scale 1.0 slots in the score/weight
            # scale vectors.
            ks = jnp.concatenate([ks, jnp.ones((B, nkv, 1), ks.dtype)], -1)
            vs = jnp.concatenate([vs, jnp.ones((B, nkv, 1), vs.dtype)], -1)
    k = jnp.swapaxes(k, 1, 2).reshape(B, nkv, S, hd)
    v = jnp.swapaxes(v, 1, 2).reshape(B, nkv, S, hd)
    if fold:
        k = jnp.concatenate([k, new_k.astype(k.dtype)[:, :, None]], axis=2)
        v = jnp.concatenate([v, new_v.astype(v.dtype)[:, :, None]], axis=2)

    qg = q.reshape(B, nkv, g, hd)
    scores = jnp.einsum(
        "bkgd,bksd->bkgs", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if ks is not None:
        scores = scores * ks[:, :, None, :]

    token_idx = jnp.arange(S + int(fold), dtype=jnp.int32)
    if fold:
        # Pages cover [0, n-1); slot S holds the current (folded) token,
        # valid exactly for active rows (n > 0).
        mask = (token_idx[None, :] < seq_lens[:, None] - 1) | (
            (token_idx[None, :] == S) & (seq_lens[:, None] > 0)
        )
    else:
        mask = token_idx[None, :] < seq_lens[:, None]  # [B, S]
    scores = jnp.where(mask[:, None, None, :], scores, MASK_VALUE)

    if return_stats:
        # Numerically identical to the Pallas kernel's online-softmax
        # recurrence: row max m, exp-sum l, out normalized by l (0-guarded).
        m = jnp.max(scores, axis=-1)  # [B, nkv, g]
        p = jnp.exp(scores - m[..., None])
        # A fully-masked row has scores == m == MASK_VALUE, so exp() gives 1
        # not 0 — zero it explicitly to keep the l == 0 inactive convention.
        p = jnp.where(mask[:, None, None, :], p, 0.0)
        l = jnp.sum(p, axis=-1)
        safe_l = jnp.where(l == 0.0, 1.0, l)
        if vs is not None:
            p = p * vs[:, :, None, :]
        out = jnp.einsum("bkgs,bksd->bkgd", p.astype(v.dtype), v)
        out = out / safe_l[..., None].astype(v.dtype)
        return (
            out.reshape(B, nq, hd).astype(q.dtype),
            m.reshape(B, nq),
            l.reshape(B, nq),
        )

    weights = jax.nn.softmax(scores, axis=-1)
    if vs is not None:
        weights = weights * vs[:, :, None, :]
    out = jnp.einsum("bkgs,bksd->bkgd", weights.astype(v.dtype), v)
    # q.dtype, not v.dtype: the KV cache may be wider/narrower than the
    # activations (e.g. f32 cache under bf16 weights) and the layer-scan
    # carry requires a stable hidden dtype.
    return out.reshape(B, nq, hd).astype(q.dtype)


def prefix_attention(
    q: jax.Array,  # [T, nq, hd] chunk queries (one sequence)
    kv_cache: jax.Array,  # [P, 2, nkv, ps, hd] (one layer)
    block_table: jax.Array,  # [W] int32 the sequence's pages
    prefix_len: jax.Array,  # scalar int32: tokens already in pages
    scale: float,
    kv_scale: jax.Array | None = None,  # [P, 2, nkv, ps] f32 (int8 KV)
):
    """Chunk-vs-prefix attention for chunked / prefix-cached prefill: every
    chunk token attends to the sequence's ENTIRE committed prefix
    ``[0, prefix_len)`` (all prefix positions precede every chunk position,
    so no causal masking is needed). Returns normalized ``(out, m, l)``
    stats for ``merge_attention_parts`` with the in-chunk attention.

    XLA twin of ``kernels/flash_prefill.pallas_prefix_attention``.
    """
    T, nq, hd = q.shape
    _, _, nkv, ps, _ = kv_cache.shape
    g = nq // nkv
    W = block_table.shape[0]
    S = W * ps

    kv = jnp.take(kv_cache, block_table, axis=0)  # [W, 2, nkv, ps, hd]
    k = kv[:, 0]
    v = kv[:, 1]
    ks = vs = None
    if kv_scale is not None:
        s_all = jnp.take(kv_scale, block_table, axis=0)  # [W, 2, nkv, ps]
        ks = s_all[:, 0].transpose(1, 0, 2).reshape(nkv, S)
        vs = s_all[:, 1].transpose(1, 0, 2).reshape(nkv, S)
        cdt = q.dtype if q.dtype != jnp.int8 else jnp.bfloat16
        k = k.astype(cdt)
        v = v.astype(cdt)
    k = jnp.swapaxes(k, 0, 1).reshape(nkv, S, hd)
    v = jnp.swapaxes(v, 0, 1).reshape(nkv, S, hd)

    qg = q.reshape(T, nkv, g, hd)
    scores = jnp.einsum(
        "tkgd,ksd->kgts", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [nkv, g, T, S]
    if ks is not None:
        scores = scores * ks[:, None, None, :]
    mask = jnp.arange(S, dtype=jnp.int32)[None, None, None, :] < prefix_len
    scores = jnp.where(mask, scores, MASK_VALUE)

    m = jnp.max(scores, axis=-1)  # [nkv, g, T]
    p = jnp.exp(scores - m[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    if vs is not None:
        p = p * vs[:, None, None, :]
    out = jnp.einsum("kgts,ksd->tkgd", p.astype(v.dtype), v)
    out = out / safe_l.transpose(2, 0, 1)[..., None].astype(v.dtype)
    return (
        out.reshape(T, nq, hd).astype(q.dtype),
        m.transpose(2, 0, 1).reshape(T, nq),
        l.transpose(2, 0, 1).reshape(T, nq),
    )
