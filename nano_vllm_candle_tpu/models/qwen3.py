"""Qwen3 decoder-only model, TPU-native.

Functional re-design of the reference's ``Qwen3ForCausalLM``
(``/root/reference/src/models/qwen3.rs:104-551``) with the inversions a
KV-cached, jit-compiled TPU engine needs (SURVEY.md §7):

- Parameters are a pytree of stacked per-layer arrays (leading ``L`` axis) so
  the decoder runs as one ``lax.scan`` — one traced layer body instead of the
  reference's unrolled per-layer loop (``qwen3.rs:480-493``), giving O(1)
  compile cost in depth and clean pjit sharding.
- The paged KV cache ``[L, num_pages, num_kv_heads, page_size, head_dim]``
  rides in the scan carry and is updated in place (donated), replacing the
  reference's full-recompute-every-step design (``llm_engine.rs:60-95``).
- RoPE uses a precomputed table indexed by explicit per-token positions
  (``ops/rotary.py``), replacing per-call host cos/sin builds
  (``rotary_embedding.rs:56-80``).
- Same math as the reference otherwise: fused-residual RMSNorm threading
  (``qwen3.rs:374-399``), per-head q/k RMSNorm before RoPE
  (``qwen3.rs:224-232``), GQA via grouped einsum (the semantics the
  reference's unsqueeze/expand/reshape emulates, ``qwen3.rs:236-256``),
  SwiGLU MLP (``qwen3.rs:283-328``).

Page 0 of the KV cache is a *null page*: padding tokens write there and
padded block-table entries read from it (masked out of the softmax), so all
scatters/gathers are unconditional.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nano_vllm_candle_tpu.config import Qwen3Config
from nano_vllm_candle_tpu.ops.activation import silu_and_mul
from nano_vllm_candle_tpu.ops.attention import (
    MASK_VALUE,
    merge_attention_parts,
    packed_prefill_attention,
    paged_decode_attention,
    prefix_attention,
)
from nano_vllm_candle_tpu.layers.linear import TRANSPOSED_PROJS, matmul
from nano_vllm_candle_tpu.ops.layernorm import head_rms_norm, rms_norm
from nano_vllm_candle_tpu.ops.rotary import apply_rope_positions, build_rope_table

Params = Dict[str, Any]


#: Prefill page-commit granularity: the packed prefill stream pads each
#: sequence to a multiple of this so page writes happen as aligned 8-row
#: windows (one f32 sublane tile; bf16/int8 tiles are taller, but an 8-row
#: window at an 8-aligned offset is still a legal Mosaic block for every
#: cache dtype). Decode commits single rows via an 8-row read-modify-write
#: window (kernels/kv_commit.pallas_row_commit). Pages must be a multiple
#: of this (asserted by the runner).
GROUP = 8


class PrefillBatch(NamedTuple):
    """Packed multi-sequence prefill inputs (static T per bucket).

    ``block_table``/``prefix_len`` switch on the chunked / prefix-cached
    mode: the stream then holds ONE sequence's token span
    ``[prefix_len, prefix_len + real_T)`` whose committed prefix lives in
    the pages of ``block_table`` — attention = in-stream causal part
    flash-merged with the paged-prefix part. None = plain prefill (every
    sequence processed from position 0)."""

    token_ids: jax.Array  # [T] int32
    positions: jax.Array  # [T] int32 (0 for padding)
    seg_ids: jax.Array  # [T] int32, -1 for padding
    slot_mapping: jax.Array  # [T] int32 flat cache slot (page*page_size+off)
    logits_indices: jax.Array  # [B] int32 token index of each seq's last token
    block_table: Optional[jax.Array] = None  # [W] int32 (chunked mode)
    prefix_len: Optional[jax.Array] = None  # scalar int32 (chunked mode)


class DecodeBatch(NamedTuple):
    """Fixed-shape decode inputs (one token per active slot)."""

    token_ids: jax.Array  # [B] int32
    positions: jax.Array  # [B] int32
    slot_mapping: jax.Array  # [B] int32
    block_tables: jax.Array  # [B, max_blocks_per_seq] int32
    seq_lens: jax.Array  # [B] int32 (0 for inactive slots)


class KVCache(NamedTuple):
    """Paged KV cache; optionally INT8-quantized with per-vector scales.

    ``kv``: ``[L, num_pages, 2, num_kv_heads, page_size, head_dim]``
    (bf16/f32, or int8 when quantized) — K at index 0 of the combined axis,
    V at index 1. ``kv_scale``: ``[L, num_pages, 2, num_kv_heads,
    page_size]`` f32 per-stored-vector scales, or None for unquantized
    caches. INT8 KV halves the HBM bandwidth per decoded token — the
    dominant cost at long context.

    Axis order is deliberate (round-2 measurements):

    - **K and V combined in one array**: the decode kernel fetches one
      contiguous ``[2, nkv, ps, hd]`` block per page — ONE DMA and ONE
      BlockSpec index map instead of two. Per-grid-step scalar-core cost
      (~0.2 us per operand index map) was a first-order term at batch 64.
    - **Head-major pages** (``[nkv, ps, hd]``): a fetched page is directly
      the per-head ``[ps, hd]`` matmul operand — no in-kernel transpose
      (token-major cost two VMEM swapaxes per page, measured ~12%).
    - **Head-major scales** (``[nkv, ps]``): read by the decode kernel as a
      direct broadcast over scores; the token-major orientation needed an
      in-kernel 2D transpose measured at ~5x the whole attention cost.

    Single-token decode writes use an 8-row read-modify-write window
    (``kernels/kv_commit.pallas_row_commit``) — sub-tile token rows cannot
    be written directly into the (8,128)-tiled page layout, and XLA lowers
    the equivalent scatter to a serialized full-cache select loop.
    """

    kv: jax.Array
    kv_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.kv_scale is not None


def init_kv_cache(
    config: Qwen3Config,
    num_pages: int,
    page_size: int,
    dtype: jnp.dtype = jnp.bfloat16,
) -> KVCache:
    """Allocate the paged cache (combined K/V; see KVCache docstring)."""
    shape = (
        config.num_hidden_layers,
        num_pages,
        2,
        config.num_key_value_heads,
        page_size,
        config.head_dim,
    )
    if jnp.dtype(dtype) == jnp.int8:
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype))


# --------------------------------------------------------------------------
# Parameter construction
# --------------------------------------------------------------------------


def init_params(
    config: Qwen3Config,
    rng: jax.Array,
    dtype: jnp.dtype = jnp.bfloat16,
) -> Params:
    """Random-init parameters (the checkpoint-free seam the reference keeps
    via its random ctors, ``qwen3.rs:116-139,412-428``)."""
    c = config
    L, H, I = c.num_hidden_layers, c.hidden_size, c.intermediate_size
    Q, KV, hd = c.q_size, c.kv_size, c.head_dim
    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * (fan_in**-0.5)).astype(dtype)

    # q/k/v/down are stored TRANSPOSED ([L, out, in]) — the measured-faster
    # orientation on v5e (layers/linear.TRANSPOSED_PROJS); gate/up/o are
    # [L, in, out].
    params: Params = {
        "embed_tokens": dense(next(keys), (c.vocab_size, H), H),
        "layers": {
            "input_layernorm": jnp.ones((L, H), dtype),
            "q_proj": dense(next(keys), (L, Q, H), H),
            "k_proj": dense(next(keys), (L, KV, H), H),
            "v_proj": dense(next(keys), (L, KV, H), H),
            "q_norm": jnp.ones((L, hd), dtype),
            "k_norm": jnp.ones((L, hd), dtype),
            "o_proj": dense(next(keys), (L, Q, H), Q),
            "post_attention_layernorm": jnp.ones((L, H), dtype),
            "gate_proj": dense(next(keys), (L, H, I), H),
            "up_proj": dense(next(keys), (L, H, I), H),
            "down_proj": dense(next(keys), (L, H, I), I),
        },
        "norm": jnp.ones((H,), dtype),
    }
    if not c.tie_word_embeddings:
        params["lm_head"] = dense(next(keys), (H, c.vocab_size), H)
    return params


def rope_tables(config: Qwen3Config) -> Tuple[jax.Array, jax.Array]:
    return build_rope_table(
        config.head_dim, config.max_position_embeddings, config.rope_theta
    )


# --------------------------------------------------------------------------
# Forward pass
# --------------------------------------------------------------------------


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-vector symmetric int8: ``x[T, nkv, hd] -> (int8 values, f32
    scales [T, nkv])`` with true scale (dequant = q * scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _write_kv(
    kv: jax.Array,  # [L, P, 2, nkv, ps, hd] full stacked combined cache
    kvs: Optional[jax.Array],  # [L, P, 2, nkv, ps] or None
    k: jax.Array,  # [T, nkv, hd] new rows
    v: jax.Array,
    slot_mapping: jax.Array,  # [T] flat slots (page*page_size + offset)
    li: jax.Array,  # scalar layer index
):
    """Scatter new k/v rows into layer ``li`` of the full paged cache,
    **in place on the scan carry** (the XLA twin of the Pallas commit
    kernels; used on CPU / for numerics reference).

    The cache never leaves the carry: one scatter writes ``T`` per-token
    ``[2, nkv, hd]`` windows and nothing else moves. (An earlier design
    threaded per-layer caches through ``lax.scan`` xs/ys, which made XLA
    re-materialize the entire cache every step — profiled at ~1 GB of HBM
    traffic per decode step for ~100 KB of actual KV data.)

    Padding tokens carry slots inside the null page 0, so the scatter is
    unconditional. For int8 caches, values are quantized per vector and
    scales scattered alongside.
    """
    L, P, _, nkv, ps, hd = kv.shape
    pages = (slot_mapping // ps)[:, None, None]  # [T, 1, 1]
    offs = (slot_mapping % ps)[:, None, None]
    sel = jnp.arange(2, dtype=jnp.int32)[None, :, None]  # [1, 2, 1]
    heads = jnp.arange(nkv, dtype=jnp.int32)[None, None, :]  # [1, 1, nkv]
    # All advanced indices broadcast to [T, 2, nkv] and are adjacent, so the
    # scatter windows are contiguous [hd] rows and XLA keeps the cache in
    # its default layout. (A separated-index form made XLA relayout the
    # ENTIRE cache around the scatter — ~800 ms/step.)
    rows = jnp.stack([k, v], axis=1)  # [T, 2, nkv, hd]
    if kvs is not None:
        qrows, scales = _quantize_kv(rows)  # scales [T, 2, nkv]
        kvs = kvs.at[li, pages, sel, heads, offs].set(scales, mode="drop")
        rows = qrows
    kv = kv.at[li, pages, sel, heads, offs].set(
        rows.astype(kv.dtype), mode="drop"
    )
    return kv, kvs


# --------------------------------------------------------------------------
# Page commit (the write path for the Pallas attention impl)
#
# Single-token writes into the head-major page layout are sub-tile (a token
# is one ps-row of a (8,128)(2,1)-tiled [ps, hd] plane), which XLA lowers to
# an expensive per-index RMW scatter (~0.6 ms/step measured at bs16).
# Prefill commits aligned GROUP(=8)-row windows (the stream is padded per
# sequence, partial tails garbage-padded inside the sequence's own page and
# masked by seq_len). Decode DEFERS all layers' current-token rows to ONE
# end-of-step commit (kernels/kv_commit.pallas_rows_commit_all): attention
# folds the current token from registers, so a row is only needed by the
# NEXT step's attention — per-layer commits were 28 pallas calls/step of
# near-pure dispatch overhead (and, under a dp mesh, 28 per-layer
# all-gathers of the update rows).
# --------------------------------------------------------------------------


def _write_kv_all_layers(
    kv: jax.Array,  # [L, P, 2, nkv, ps, hd] full stacked combined cache
    kvs: Optional[jax.Array],  # [L, P, 2, nkv, ps] or None
    rows: jax.Array,  # [L, B, 2, nkv, hd] every layer's current-token rows
    slot_mapping: jax.Array,  # [B] flat slots (page*page_size + offset)
):
    """One scatter committing EVERY layer's decode rows (the XLA twin of
    ``kernels/kv_commit.pallas_rows_commit_all``). Padding slots live in
    the null page 0, so the scatter is unconditional."""
    L, P, _, nkv, ps, hd = kv.shape
    layers = jnp.arange(L, dtype=jnp.int32)[:, None, None, None]  # [L,1,1,1]
    pages = (slot_mapping // ps)[None, :, None, None]  # [1,B,1,1]
    offs = (slot_mapping % ps)[None, :, None, None]
    sel = jnp.arange(2, dtype=jnp.int32)[None, None, :, None]
    heads = jnp.arange(nkv, dtype=jnp.int32)[None, None, None, :]
    if kvs is not None:
        qrows, scales = _quantize_kv(rows)  # scales [L, B, 2, nkv]
        kvs = kvs.at[layers, pages, sel, heads, offs].set(scales, mode="drop")
        rows = qrows
    kv = kv.at[layers, pages, sel, heads, offs].set(
        rows.astype(kv.dtype), mode="drop"
    )
    return kv, kvs


def _commit_prefill_groups(kv, kvs, k, v, slot_mapping, seg_ids, li, ps,
                           interpret=False, page_base=None,
                           num_local_pages=None):
    """Commit every GROUP window of the packed prefill stream to its page.

    The runner pads each sequence to a GROUP multiple, so windows never
    straddle sequences and window-start slots are GROUP-aligned within a
    page. A window whose first token is stream padding (seg -1) targets the
    null page; rows past a sequence's real length land inside its own last
    page (ps is a GROUP multiple) and are masked by seq_len forever after.

    ``page_base``/``num_local_pages``: dp-sharded cache (spmd islands) —
    the stream is replicated over dp but each rank owns only pages
    ``[page_base, page_base + num_local_pages)``; windows outside that
    range drop to the rank's LOCAL null page 0 (the owning rank commits
    them from its own replica of this call).
    """
    T = k.shape[0]
    nG = T // GROUP
    first_slot = slot_mapping[::GROUP]  # [nG]
    real = seg_ids[::GROUP] >= 0
    pages = first_slot // ps
    if page_base is not None:
        real = real & (pages >= page_base) & (
            pages < page_base + num_local_pages)
        pages = pages - page_base
    pages = jnp.where(real, pages, 0)
    offs = jnp.where(real, first_slot % ps, 0)

    # [T, nkv, hd] x2 -> [nG, 2, nkv, GROUP, hd]
    rows = jnp.stack([k, v], axis=1).reshape(nG, GROUP, 2, *k.shape[1:])
    upd = rows.transpose(0, 2, 3, 1, 4)
    scales = None
    if kvs is not None:
        upd, scales = _quantize_kv(upd)  # scales [nG, 2, nkv, GROUP]

    from nano_vllm_candle_tpu.kernels.kv_commit import pallas_commit_groups

    return pallas_commit_groups(
        kv, upd, li, pages, offs, kvs, scales, interpret=interpret
    )


# Perf-forensics switch (dev tooling, used by profile_decode.py --ablate):
# stage names added here are SKIPPED in the decode layer so their cost can
# be measured by difference on real hardware. Read at trace time — set it
# before jit and don't mix ablations in one process. Never set in serving.
ABLATE: frozenset = frozenset()
_ABLATABLE = ("norms", "qknorm", "rope", "commit")

# Fuse the decode page commit into the grouped attention kernel. Measured
# SLOWER on v5e (see _decoder_layer); flip for experiments only.
FOLD_COMMIT = False


def _decoder_layer(
    hidden: jax.Array,
    residual: jax.Array,
    lp: Params,  # per-layer plain weights (sliced by the scan)
    qlp: Params,  # FULL-stack quantized weights (indexed by li; see forward)
    li: jax.Array,  # scalar layer index into the stacked cache
    kv: jax.Array,  # [L, P, 2, nkv, ps, hd] full stacked combined cache
    kvs: Optional[jax.Array],  # [L, P, 2, nkv, ps] f32 scales or None
    batch,
    config: Qwen3Config,
    mode: str,
    attn_impl: str,
    mesh=None,
    dp_shard: bool = False,
    prefill_band: Optional[int] = None,
):
    """One decoder layer with the reference's residual-threading contract
    (``qwen3.rs:374-399``).

    Returns ``(hidden, residual, kv, kvs, rows)``. In decode mode ``rows``
    is the layer's current-token ``[B, 2, nkv, hd]`` k/v rows (activation
    dtype), committed ONCE for all layers at the end of the step by
    ``forward`` — attention folds the current token from registers, so the
    page write is only needed before the NEXT step's attention. Prefill
    (and the FOLD_COMMIT experiment, which commits inside the attention
    kernel) returns ``rows=None``."""
    from nano_vllm_candle_tpu.kernels import interpret_default

    c = config
    T = hidden.shape[0]
    scale = c.head_dim**-0.5
    interp = interpret_default()
    # Under a mesh, pallas calls run as shard_map islands (parallel/spmd.py:
    # GSPMD cannot partition a pallas_call) with specs mirroring the GSPMD
    # sharding plan of parallel/mesh.py. With a dp-SHARDED cache the
    # attention/commit sites are islands on the XLA impl too (each rank
    # must address its local page shard; GSPMD would insert cross-rank
    # gathers over the sharded page axis) — matmuls stay GSPMD there.
    islands = mesh is not None and attn_impl == "pallas"
    attn_islands = mesh is not None and (attn_impl == "pallas" or dp_shard)

    def proj(name: str):
        return lp[name] if name in lp else qlp[name]

    # QKV projections (column-parallel under TP; plain or int-quantized);
    # attn_impl doubles as the matmul impl switch: "pallas" routes quantized
    # weights through the fused dequant-matmul kernel (kernels/quant_matmul.py)
    mm = attn_impl

    def pmm(xin, name: str, pre_norm=None):
        # transposed ([out, in]) storage only applies to plain weights
        w = proj(name)
        t = name in TRANSPOSED_PROJS and not isinstance(w, dict)
        if islands:
            from nano_vllm_candle_tpu.parallel.mesh import _LAYER_KINDS
            from nano_vllm_candle_tpu.parallel.spmd import sharded_matmul

            if pre_norm is not None:
                xn, new_res = rms_norm(
                    xin, pre_norm[1], pre_norm[2], pre_norm[0]
                )
                return sharded_matmul(
                    xn, w, mesh, _LAYER_KINDS[name], li, transposed=t,
                    batch_sharded=(mode == "decode"), interpret=interp,
                ), new_res
            return sharded_matmul(
                xin, w, mesh, _LAYER_KINDS[name], li, transposed=t,
                batch_sharded=(mode == "decode"), interpret=interp,
            )
        return matmul(
            xin, w, mm, li, transposed=t, interpret=interp, pre_norm=pre_norm
        )

    def has(name: str) -> bool:
        return name in lp or name in qlp

    if "norms" in ABLATE:
        normed, residual = hidden, hidden
        fuse_norm = False
    else:
        # The fused projections absorb the residual-add + RMSNorm into the
        # matmul kernel (layers/linear.matmul pre_norm); the split q/k/v
        # form shares one norm across three matmuls, so it norms up front.
        fuse_norm = has("qkv_proj") and has("gate_up_proj")
        if not fuse_norm:
            normed, residual = rms_norm(
                hidden, lp["input_layernorm"], c.rms_norm_eps, residual
            )

    if has("qkv_proj"):  # fused stack (layers/linear.fuse_qwen3_params)
        if fuse_norm:
            qkv, residual = pmm(
                hidden, "qkv_proj",
                pre_norm=(residual, lp["input_layernorm"], c.rms_norm_eps),
            )
        else:
            qkv = pmm(normed, "qkv_proj")
        q = qkv[:, : c.q_size]
        k = qkv[:, c.q_size : c.q_size + c.kv_size]
        v = qkv[:, c.q_size + c.kv_size :]
    else:
        q = pmm(normed, "q_proj")
        k = pmm(normed, "k_proj")
        v = pmm(normed, "v_proj")
    q = q.reshape(T, c.num_attention_heads, c.head_dim)
    k = k.reshape(T, c.num_key_value_heads, c.head_dim)
    v = v.reshape(T, c.num_key_value_heads, c.head_dim)

    # Per-head RMSNorm before RoPE (qwen3.rs:224-232)
    if "qknorm" not in ABLATE:
        q = head_rms_norm(q, lp["q_norm"], c.rms_norm_eps)
        k = head_rms_norm(k, lp["k_norm"], c.rms_norm_eps)
    if "rope" not in ABLATE:
        q, k = apply_rope_positions(q, k, batch.positions, c.rope_theta)

    ps = kv.shape[4]
    rows = None  # decode: current-token k/v rows for the deferred commit

    if mode == "prefill":
        chunked = batch.prefix_len is not None
        if attn_islands:
            from nano_vllm_candle_tpu.parallel.spmd import (
                sharded_prefill_attention,
            )

            attn_out, kv, kvs = sharded_prefill_attention(
                mesh, q, k, v, kv, kvs, batch.seg_ids, batch.positions,
                batch.slot_mapping, scale, li, ps,
                batch.block_table, batch.prefix_len,
                dp_shard=dp_shard, impl=attn_impl, band=prefill_band,
                interpret=interp,
            )
        elif attn_impl == "pallas":
            if "commit" not in ABLATE:
                kv, kvs = _commit_prefill_groups(
                    kv, kvs, k, v, batch.slot_mapping, batch.seg_ids, li, ps,
                    interpret=interp,
                )
            from nano_vllm_candle_tpu.kernels.flash_prefill import (
                pallas_packed_prefill_attention,
                pallas_prefix_attention,
            )

            if chunked:
                o_s, m_s, l_s = pallas_packed_prefill_attention(
                    q, k, v, batch.seg_ids, batch.positions, scale,
                    return_stats=True, interpret=interp,
                    band_tiles=prefill_band,
                )
                o_p, m_p, l_p = pallas_prefix_attention(
                    q, kv, batch.block_table, batch.prefix_len, scale,
                    kv_scale=kvs, layer_index=li, interpret=interp,
                )
                attn_out = merge_attention_parts(o_s, m_s, l_s, o_p, m_p, l_p)
            else:
                attn_out = pallas_packed_prefill_attention(
                    q, k, v, batch.seg_ids, batch.positions, scale,
                    interpret=interp, band_tiles=prefill_band,
                )
        else:
            kv, kvs = _write_kv(kv, kvs, k, v, batch.slot_mapping, li)
            if chunked:
                o_s, m_s, l_s = packed_prefill_attention(
                    q, k, v, batch.seg_ids, batch.positions, scale,
                    return_stats=True,
                )
                kv_l = jax.lax.dynamic_index_in_dim(kv, li, 0, keepdims=False)
                kvs_l = (
                    jax.lax.dynamic_index_in_dim(kvs, li, 0, keepdims=False)
                    if kvs is not None else None
                )
                o_p, m_p, l_p = prefix_attention(
                    q, kv_l, batch.block_table, batch.prefix_len, scale,
                    kv_scale=kvs_l,
                )
                attn_out = merge_attention_parts(o_s, m_s, l_s, o_p, m_p, l_p)
            else:
                attn_out = packed_prefill_attention(
                    q, k, v, batch.seg_ids, batch.positions, scale
                )
    elif attn_islands:
        from nano_vllm_candle_tpu.parallel.spmd import sharded_decode_attention

        attn_out = sharded_decode_attention(
            mesh, q, kv, kvs, batch.block_tables, batch.seq_lens, scale,
            k, v, li, dp_shard=dp_shard, impl=attn_impl, interpret=interp,
        )
        attn_out = attn_out.astype(hidden.dtype)
        rows = jnp.stack([k, v], axis=1)  # [B, 2, nkv, hd]
    elif attn_impl == "pallas":
        # Attention over pages [0, n-1) with the current token's k/v folded
        # in-kernel from registers; the page commit is deferred to ONE
        # all-layer call at the end of the step (forward), so no staging
        # structure and no per-layer commit dispatch.
        n = batch.seq_lens  # includes the current token; 0 = inactive slot
        from nano_vllm_candle_tpu.kernels.paged_decode import (
            grouped_supported,
            pallas_paged_decode_attention,
            pallas_paged_decode_commit,
        )

        # Commit fusion is DISABLED by default: fusing the row commit into
        # the grouped attention kernel (pallas_paged_decode_commit) measured
        # 13.2k vs 14.5k tok/s at int4+int8KV bs64 — the in-kernel RMW tail
        # (per-sequence dynamic-slot window reads + serialized write-DMA
        # waits) costs more than the separate commit it replaces, and it
        # delays the cross-group page prefetch. Kept as a tested kernel
        # (test_fold_commit_matches_attention_plus_row_commit); the shipped
        # design is the END-OF-STEP all-layer commit instead.
        fold = FOLD_COMMIT and (
            "commit" not in ABLATE and kvs is not None
            and grouped_supported(
                q.shape[0], True, False, batch.block_tables.shape[1],
                kv.dtype, kv.shape[4],
            )
        )
        if fold:
            # Grouped regime: the commit is FUSED into the attention kernel
            # (kernels/paged_decode.pallas_paged_decode_commit), retiring
            # the separate row-commit grid for this path.
            attn_out, kv, kvs = pallas_paged_decode_commit(
                q, kv, batch.block_tables, n, scale, k, v,
                kv_scale=kvs, layer_index=li, interpret=interp,
            )
            attn_out = attn_out.astype(hidden.dtype)
        else:
            attn_out = pallas_paged_decode_attention(
                q, kv, batch.block_tables, n, scale, k, v,
                kv_scale=kvs, layer_index=li, interpret=interp,
            ).astype(hidden.dtype)
            rows = jnp.stack([k, v], axis=1)
    else:
        # XLA twin (CPU tests / numerics reference): attention over pages
        # [0, n-1) with the current token's row folded exactly (same
        # contract as the Pallas kernels); the commit is deferred to the
        # end-of-step all-layer scatter (_write_kv_all_layers).
        kv_l = jax.lax.dynamic_index_in_dim(kv, li, 0, keepdims=False)
        kvs_l = (
            jax.lax.dynamic_index_in_dim(kvs, li, 0, keepdims=False)
            if kvs is not None else None
        )
        attn_out = paged_decode_attention(
            q, kv_l, batch.block_tables, batch.seq_lens, scale,
            kv_scale=kvs_l, new_k=k, new_v=v,
        )
        rows = jnp.stack([k, v], axis=1)

    # Row-parallel o_proj (all-reduce inserted by GSPMD under TP)
    hidden = pmm(attn_out.reshape(T, c.q_size), "o_proj")

    if "norms" in ABLATE:
        normed = hidden
    elif fuse_norm:
        gu, residual = pmm(
            hidden, "gate_up_proj",
            pre_norm=(residual, lp["post_attention_layernorm"],
                      c.rms_norm_eps),
        )
        return pmm(silu_and_mul(gu), "down_proj"), residual, kv, kvs, rows
    else:
        normed, residual = rms_norm(
            hidden, lp["post_attention_layernorm"], c.rms_norm_eps, residual
        )
    if has("gate_up_proj"):  # fused [.., 2I]: gate half then up half
        hidden = pmm(silu_and_mul(pmm(normed, "gate_up_proj")), "down_proj")
    else:
        gate = pmm(normed, "gate_proj")
        up = pmm(normed, "up_proj")
        hidden = pmm(jax.nn.silu(gate) * up, "down_proj")
    return hidden, residual, kv, kvs, rows


def forward(
    params: Params,
    kv_cache: KVCache,
    batch,
    *,
    config: Qwen3Config,
    mode: str,  # "prefill" | "decode"
    attn_impl: str = "xla",  # "xla" | "pallas"
    mesh=None,  # sharded pallas: kernels run as shard_map islands (spmd.py)
    dp_shard: bool = False,  # KV page axis sharded over dp (spmd.py)
    prefill_band: Optional[int] = None,  # static causal-band width in k
    # tiles for the packed flash kernel (kernels/flash_prefill
    # host_band_tiles); None = full triangle
) -> Tuple[jax.Array, KVCache]:
    """Run the decoder over a token batch; returns (last_hidden, new_cache).

    ``last_hidden`` is ``[B, H]``: only the rows that will be sampled
    (prefill gathers each sequence's final token; decode keeps all slots) —
    fixing the reference's all-positions logits waste (``qwen3.rs:542-550``).

    The full stacked KV cache rides in the scan *carry* (updated in place by
    one scatter per layer; attention kernels index ``cache[layer]`` via
    their BlockSpec index maps) — never through xs/ys, which would make XLA
    re-materialize the whole cache every step.
    """
    c = config
    L = c.num_hidden_layers
    hidden = params["embed_tokens"][batch.token_ids]  # [T, H]
    residual = jnp.zeros_like(hidden)

    # Projections stay OUT of the scan xs (full stacks captured by closure,
    # indexed per layer): scan-slicing them would hand pre-sliced operands
    # to the pallas matmul kernels, which XLA materializes as a full-weight
    # HBM copy per layer (kernels/quant_matmul.py). Quantized stacks always;
    # plain stacks too on the pallas path (the stacked dense kernel), while
    # the XLA path keeps them as scan xs (free per-layer slices).
    from nano_vllm_candle_tpu.layers.linear import _QUANT_TARGETS, is_quantized

    def stays_stacked(name, v):
        return is_quantized(v) or (
            attn_impl == "pallas" and name in _QUANT_TARGETS
        )

    xs_layers = {
        k: v for k, v in params["layers"].items() if not stays_stacked(k, v)
    }
    quant_layers = {
        k: v for k, v in params["layers"].items() if stays_stacked(k, v)
    }

    def layer_fn(carry, xs):
        h, r, kv, kvs = carry
        lp, li = xs
        h, r, kv, kvs, rows = _decoder_layer(
            h, r, lp, quant_layers, li, kv, kvs,
            batch, c, mode, attn_impl, mesh, dp_shard, prefill_band,
        )
        return (h, r, kv, kvs), rows

    (hidden, residual, new_kv, new_kvs), all_rows = jax.lax.scan(
        layer_fn,
        (hidden, residual, kv_cache.kv, kv_cache.kv_scale),
        (xs_layers, jnp.arange(L, dtype=jnp.int32)),
    )

    if all_rows is not None and "commit" not in ABLATE:
        # Deferred decode commit: ONE call writes every layer's current-token
        # rows ([L, B, 2, nkv, hd] scan ys) into the pages — replacing L
        # per-layer commit dispatches (and, under a dp mesh, L per-layer
        # all-gathers of the update rows with a single one).
        if mesh is not None and (attn_impl == "pallas" or dp_shard):
            from nano_vllm_candle_tpu.parallel.spmd import sharded_commit_rows
            from nano_vllm_candle_tpu.kernels import interpret_default

            new_kv, new_kvs = sharded_commit_rows(
                mesh, new_kv, new_kvs, all_rows, batch.slot_mapping,
                dp_shard=dp_shard, impl=attn_impl,
                interpret=interpret_default(),
            )
        elif attn_impl == "pallas":
            from nano_vllm_candle_tpu.kernels.kv_commit import (
                pallas_rows_commit_all,
            )
            from nano_vllm_candle_tpu.kernels import interpret_default

            new_kv, new_kvs = pallas_rows_commit_all(
                new_kv, all_rows, batch.slot_mapping, kv_scale=new_kvs,
                interpret=interpret_default(),
            )
        else:
            new_kv, new_kvs = _write_kv_all_layers(
                new_kv, new_kvs, all_rows, batch.slot_mapping
            )

    hidden, _ = rms_norm(hidden, params["norm"], c.rms_norm_eps, residual)

    if mode == "prefill":
        hidden = hidden[batch.logits_indices]  # [B, H]
    return hidden, KVCache(new_kv, new_kvs)


def compute_logits(
    params: Params,
    hidden: jax.Array,
    impl: str = "xla",
    mesh=None,
    batch_sharded: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``[B, H] @ [H, V]`` — untied lm_head or tied embedding transpose
    (``qwen3.rs:525-528,542-550``; tied support per HF config).

    ``lm_head`` may be an INT8/INT4-quantized dict (``quantize_lm_head``):
    the grouped dequant matmul then reads half/quarter the bytes of the
    bf16 table — the head re-read is ~20% of the 0.6B per-step decode
    budget. ``impl="pallas"`` routes it through the fused dequant-matmul
    kernel; under a mesh that runs as a vocab-sharded shard_map island
    (``parallel/spmd.sharded_logits_matmul``) whose head was padded to
    ``tp * 128`` vocab columns at quantization time — the pad columns are
    masked to -inf here so sampling can never pick them.
    """
    if "lm_head" in params:
        from nano_vllm_candle_tpu.layers.linear import is_quantized, matmul

        if is_quantized(params["lm_head"]):
            if mesh is not None and impl == "pallas":
                from nano_vllm_candle_tpu.parallel.spmd import (
                    sharded_logits_matmul,
                )

                logits = sharded_logits_matmul(
                    mesh, hidden, params["lm_head"],
                    batch_sharded=batch_sharded, interpret=interpret,
                )
            else:
                logits = matmul(
                    hidden, params["lm_head"], impl=impl, interpret=interpret
                )
            V = params["embed_tokens"].shape[0]
            if logits.shape[-1] > V:  # tp-alignment vocab padding
                pad = jnp.arange(logits.shape[-1], dtype=jnp.int32) >= V
                logits = jnp.where(
                    pad[None, :], jnp.asarray(-1e30, logits.dtype), logits
                )
            return logits
        return hidden @ params["lm_head"]
    return hidden @ params["embed_tokens"].T


# --------------------------------------------------------------------------
# Convenience: full-recompute single-sequence forward (parity testing)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def forward_full(
    params: Params,
    token_ids: jax.Array,  # [T] int32
    *,
    config: Qwen3Config,
) -> jax.Array:
    """Full-recompute forward returning all-position logits ``[T, V]``.

    Functional twin of the reference's cache-less path
    (``qwen3.rs:458-499`` + ``compute_logits`` 542-551); used for golden
    parity tests against HF transformers and as the causal-consistency
    baseline for the cached path.
    """
    T = token_ids.shape[0]
    page_size = max(8, T)
    num_pages = 2  # page 0 = null, page 1 = this sequence
    kv = init_kv_cache(config, num_pages, page_size, params["embed_tokens"].dtype)
    batch = PrefillBatch(
        token_ids=token_ids,
        positions=jnp.arange(T, dtype=jnp.int32),
        seg_ids=jnp.zeros((T,), jnp.int32),
        slot_mapping=page_size + jnp.arange(T, dtype=jnp.int32),
        logits_indices=jnp.arange(T, dtype=jnp.int32),  # all positions
    )
    hidden, _ = forward(params, kv, batch, config=config, mode="prefill")
    return compute_logits(params, hidden)
