"""shard_map islands: the Pallas production path under (dp, tp) meshes.

GSPMD partitions XLA ops automatically, but a ``pallas_call`` is opaque to
it — under a sharded mesh the compiler would replicate the kernel's operands
(or fail on the aliased cache updates). Every Pallas call site therefore
runs inside a ``jax.shard_map`` island whose specs mirror the GSPMD
sharding plan (``parallel/mesh.py``): KV heads / projection out-dims shard
on ``tp``, decode request slots on ``dp``, and each device runs the
unchanged single-device kernel on its local shard. The one collective the
reference *omitted* (``/root/reference/src/layers/linear.rs:184-198`` —
RowParallelLinear without its all-reduce) is explicit here: row-parallel
matmul islands ``psum`` their per-shard results over ``tp``. (The psum
itself runs in f32, but each shard's partial has already been rounded to
the activation dtype by ``matmul`` — bf16 in production — so cross-shard
reduction order is f32-stable while per-shard rounding matches the
single-device bf16 matmul, not an end-to-end f32 accumulation.)

Correctness notes:

- GQA co-location: q heads are ordered grouped by kv head, so sharding both
  ``nq`` and ``nkv`` on tp keeps every q head on the chip that owns its kv
  head — attention islands need zero collectives.
- The KV cache's **page axis shards over dp** by default
  (``EngineConfig.dp_shard_kv``): request slots are pinned at admission
  (engine/scheduler), each dp rank owns the page range of its slots
  (per-rank block pools, one null page per rank), and decode attention /
  commits stay entirely rank-local — zero per-step dp collectives and no
  per-replica cache duplication. Chunked-prefix prefill psum-broadcasts
  the home rank's paged-prefix softmax stats (exactly one contributor).
  With ``dp_shard_kv=False`` the cache is dp-REPLICATED instead: decode
  commits all_gather the (tiny) per-slot update rows over dp so every dp
  row performs the identical commit and the replicas stay bit-identical.
  Prefill runs its full token stream on every dp row either way (prefill
  inputs are globally replicated; the redundant work rides behind the
  decode pipeline).
- Specs must hold for the *local* view; the kernels recompute tiling from
  local shapes, so everything divides as long as ``validate_tp`` passed
  (heads % tp == 0) and ``max_num_seqs % dp == 0`` (checked by the runner).

On CPU meshes (tests, ``__graft_entry__.dryrun_multichip``) the kernels run
in interpret mode (``kernels.interpret_default``), so the sharded pallas
path is testable without multi-chip hardware.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

KV_SPEC = P(None, None, None, "tp", None, None)
KVS_SPEC = P(None, None, None, "tp", None)
# dp-sharded cache (EngineConfig.dp_shard_kv): the PAGE axis also shards
# over dp. Each rank owns its pinned slots' pages (block-manager per-rank
# pools), global page indices translate to local ones by subtracting
# rank * local_pages, and the per-step all-gather of commit rows
# disappears (measured 8.7 -> 4.9 ms/step of dp=2 coordination overhead
# in the CPU scaling proxy when the commit's gather is ablated).
KV_SPEC_DP = P(None, "dp", None, "tp", None, None)
KVS_SPEC_DP = P(None, "dp", None, "tp", None)


def _local_pages(kv_local: jax.Array) -> int:
    return kv_local.shape[1]


def _page_base(kv_local: jax.Array) -> jax.Array:
    """Global index of this dp rank's first local page."""
    return jax.lax.axis_index("dp") * _local_pages(kv_local)


def _smap(body, mesh, in_specs, out_specs):
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


# --------------------------------------------------------------------------
# Matmul islands (col/row parallel, plain or quantized, pallas or XLA local)
# --------------------------------------------------------------------------


def sharded_matmul(
    x: jax.Array,  # [T, d_in] (decode: T = max_num_seqs, dp-sharded rows)
    w,  # plain [L, in, out] / [L, out, in], or quantized {"q"|"q4","s"}
    mesh: Mesh,
    kind: str,  # mesh._LAYER_KINDS value: col | col_t | row | row_t
    layer_index: jax.Array,
    *,
    transposed: bool = False,
    batch_sharded: bool = False,  # decode: slots dp-sharded; prefill: replicated
    interpret: bool = False,
) -> jax.Array:
    """``x @ w[layer_index]`` as a shard_map island.

    Column-parallel kinds shard the output dim on tp (x replicated over tp,
    no collective); row-parallel kinds shard the contraction dim (x arrives
    tp-sharded from the preceding column-parallel island) and psum the
    per-shard results — the all-reduce ``linear.rs:184-198`` forgot. The
    psum upcasts to f32 so the cross-shard reduction never compounds bf16
    addition error, but each shard's partial is already rounded to x.dtype
    by ``matmul`` (see the module docstring).
    """
    from nano_vllm_candle_tpu.layers.linear import is_quantized, matmul

    bs = "dp" if batch_sharded else None
    row = kind.startswith("row")
    quant = is_quantized(w)
    if quant:
        from nano_vllm_candle_tpu.parallel.mesh import quant_specs

        w_spec = quant_specs(kind, w)
    else:
        if row:  # contraction: axis 2 when stored [L, out, in], else axis 1
            w_spec = P(None, None, "tp") if transposed else P(None, "tp", None)
        else:  # out: axis 1 when stored [L, out, in], else axis 2
            w_spec = P(None, "tp", None) if transposed else P(None, None, "tp")
    x_spec = P(bs, "tp") if row else P(bs, None)
    out_spec = P(bs, None) if row else P(bs, "tp")
    tp = mesh.shape["tp"]

    def body(x, w, li):
        out = matmul(
            x, w, impl="pallas", layer_index=li, transposed=transposed,
            interpret=interpret,
        )
        if row and tp > 1:
            out = jax.lax.psum(out.astype(jnp.float32), "tp").astype(x.dtype)
        return out

    return _smap(body, mesh, (x_spec, w_spec, P()), out_spec)(
        x, w, layer_index
    )


def sharded_logits_matmul(
    mesh: Mesh,
    x: jax.Array,  # [B, H] last-position hidden rows
    w,  # quantized lm_head dict {"q"|"q4": [G, gs, Vp], "s": [G, Vp]}
    *,
    batch_sharded: bool = False,  # decode: rows dp-sharded; prefill: replicated
    interpret: bool = False,
) -> jax.Array:
    """Quantized lm_head logits matmul as a shard_map island, vocab on tp.

    The head's out (vocab) axis is sharded on tp (``mesh.qwen3_param_pspecs``
    — the reference's ``VocabParallelEmbedding`` stub's declared intent,
    ``/root/reference/src/layers/embed_head.rs:3-15``); each chip streams its
    own vocab shard through the fused dequant-matmul kernel and the logits
    come back ``P(bs, "tp")`` — downstream sampling reductions (argmax /
    top-k) over the sharded vocab axis are resolved by GSPMD collectives,
    same as the XLA fallback path. No collective inside the island.

    The head is quantized with its vocab PADDED to ``tp * 128``
    (``layers/linear.quantize_lm_head pad_vocab_to``) so every local shard
    keeps the kernel's 128-lane alignment; ``models/qwen3.compute_logits``
    masks the pad columns to -inf before sampling. Without this island the
    1.24 GB untied 8B bf16 head would be re-read every step on the exact
    config (TP across a host's chips) where it hurts most.
    """
    from nano_vllm_candle_tpu.layers.linear import matmul
    from nano_vllm_candle_tpu.parallel.mesh import quant_specs

    bs = "dp" if batch_sharded else None

    def body(x, w):
        return matmul(x, w, impl="pallas", interpret=interpret)

    return _smap(
        body, mesh, (P(bs, None), quant_specs("col", w)), P(bs, "tp")
    )(x, w)


# --------------------------------------------------------------------------
# Decode islands: paged attention; all-layer deferred commit
# --------------------------------------------------------------------------


def sharded_decode_attention(
    mesh: Mesh,
    q: jax.Array,  # [B, nq, hd]
    kv: jax.Array,  # [L, P, 2, nkv, ps, hd]
    kvs: Optional[jax.Array],  # [L, P, 2, nkv, ps] f32 or None
    block_tables: jax.Array,  # [B, W]
    seq_lens: jax.Array,  # [B]
    scale: float,
    k: jax.Array,  # [B, nkv, hd] current-token rows
    v: jax.Array,
    li: jax.Array,
    *,
    dp_shard: bool = False,
    impl: str = "pallas",
    interpret: bool = False,
) -> jax.Array:
    """Paged decode attention (current token folded in-kernel), read-only on
    the cache — the page write is deferred to the end-of-step
    ``sharded_commit_rows`` island. Returns ``attn_out [B, nq, hd]``.

    Under a dp-sharded cache each rank's block-table rows reference only
    its own page range (slot pinning + per-rank block pools); global page
    indices translate to local by subtracting the rank's base. Inactive /
    padded entries (global page 0) go negative and clamp to the rank's
    LOCAL null page 0.

    ``impl="xla"`` runs the XLA twin on the local shard instead of the
    Pallas kernel — used when a dp-sharded cache must stay rank-local on
    the XLA attention path (GSPMD would otherwise materialize cross-rank
    gathers over the sharded page axis; this is the multi-process CPU
    scaling harness's serving path)."""
    from nano_vllm_candle_tpu.kernels.paged_decode import (
        pallas_paged_decode_attention,
    )
    from nano_vllm_candle_tpu.ops.attention import paged_decode_attention

    quant = kvs is not None

    def body(q, kv, kvs, bt, n, k, v, li):
        if dp_shard:
            # Foreign/padded pages read the local null page (reads are
            # seq_len-masked; a high-side clamp would read a real page).
            local = bt - _page_base(kv)
            bt = jnp.where(
                (local >= 0) & (local < _local_pages(kv)), local, 0
            )
        if impl == "xla":
            kv_l = jax.lax.dynamic_index_in_dim(kv, li, 0, keepdims=False)
            kvs_l = (
                jax.lax.dynamic_index_in_dim(kvs, li, 0, keepdims=False)
                if quant else None
            )
            return paged_decode_attention(
                q, kv_l, bt, n, scale, kv_scale=kvs_l, new_k=k, new_v=v,
            )
        return pallas_paged_decode_attention(
            q, kv, bt, n, scale, k, v,
            kv_scale=kvs, layer_index=li, interpret=interpret,
        )

    in_specs = (
        P("dp", "tp", None),  # q
        KV_SPEC_DP if dp_shard else KV_SPEC,
        (KVS_SPEC_DP if dp_shard else KVS_SPEC) if quant else P(),
        P("dp", None),  # block_tables
        P("dp"),  # seq_lens
        P("dp", "tp", None),  # k
        P("dp", "tp", None),  # v
        P(),  # layer index
    )
    return _smap(body, mesh, in_specs, P("dp", "tp", None))(
        q, kv, kvs, block_tables, seq_lens, k, v, li
    )


def sharded_commit_rows(
    mesh: Mesh,
    kv: jax.Array,  # [L, P, 2, nkv, ps, hd]
    kvs: Optional[jax.Array],  # [L, P, 2, nkv, ps] f32 or None
    rows: jax.Array,  # [L, B, 2, nkv, hd] all layers' current-token rows
    slot_mapping: jax.Array,  # [B]
    *,
    dp_shard: bool = False,
    impl: str = "pallas",
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """End-of-step all-layer page commit.

    ``dp_shard=True`` (the default serving config): the cache's page axis
    is dp-sharded and every slot's pages live on its own rank, so each rank
    commits ONLY its local rows — zero collectives. Inactive slots (global
    slot 0) clamp to the rank's local null page. ``dp_shard=False``
    (replicated cache): every dp rank must perform the identical commit of
    ALL slots' rows, so the (tiny) dp-sharded rows are all-gathered ONCE
    here — replacing the per-layer all-gathers the old per-layer commit
    design paid L times per step. ``impl="xla"`` uses the XLA scatter twin
    on the local shard (the dp-sharded XLA serving path)."""
    from nano_vllm_candle_tpu.kernels.kv_commit import pallas_rows_commit_all

    dp = mesh.shape["dp"]
    quant = kvs is not None

    def body(kv, kvs, rows, slot):
        if dp_shard:
            # Out-of-range slots (other ranks' pages — unreachable under
            # the slot-pinning invariant, defensive) redirect to the LOCAL
            # NULL page 0, never to a real page: a clamp would silently
            # overwrite the last allocatable page's final row instead.
            ps = kv.shape[4]
            local = slot - _page_base(kv) * ps
            slot = jnp.where(
                (local >= 0) & (local < _local_pages(kv) * ps), local, 0
            )
        elif dp > 1:
            rows = jax.lax.all_gather(rows, "dp", axis=1, tiled=True)
            slot = jax.lax.all_gather(slot, "dp", axis=0, tiled=True)
        if impl == "xla":
            from nano_vllm_candle_tpu.models.qwen3 import (
                _write_kv_all_layers,
            )

            return _write_kv_all_layers(kv, kvs, rows, slot)
        kv, kvs = pallas_rows_commit_all(
            kv, rows, slot, kv_scale=kvs, interpret=interpret
        )
        return kv, kvs

    kv_spec = KV_SPEC_DP if dp_shard else KV_SPEC
    kvs_spec = KVS_SPEC_DP if dp_shard else KVS_SPEC
    in_specs = (
        kv_spec,
        kvs_spec if quant else P(),
        P(None, "dp", None, "tp", None),  # rows
        P("dp"),  # slot_mapping
    )
    out_specs = (kv_spec, kvs_spec if quant else P())
    return _smap(body, mesh, in_specs, out_specs)(kv, kvs, rows, slot_mapping)


# --------------------------------------------------------------------------
# Prefill island: group commit + packed flash (+ paged-prefix merge)
# --------------------------------------------------------------------------


def sharded_prefill_attention(
    mesh: Mesh,
    q: jax.Array,  # [T, nq, hd]
    k: jax.Array,  # [T, nkv, hd]
    v: jax.Array,
    kv: jax.Array,
    kvs: Optional[jax.Array],
    seg_ids: jax.Array,  # [T]
    positions: jax.Array,  # [T]
    slot_mapping: jax.Array,  # [T]
    scale: float,
    li: jax.Array,
    ps: int,
    block_table: Optional[jax.Array],  # [W] (chunked / prefix-cached mode)
    prefix_len: Optional[jax.Array],  # scalar
    *,
    dp_shard: bool = False,
    impl: str = "pallas",
    band: Optional[int] = None,  # static packed-flash band width (k tiles)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Prefill: commit GROUP windows, then packed-segment flash attention
    (flash-merged with the paged-prefix part in chunked mode). The token
    stream is globally replicated; every dp row runs it identically. With a
    replicated cache the commit happens on every dp replica; with a
    dp-sharded cache each rank commits only the windows whose pages it owns
    (the rest drop to its local null page). In chunked mode the committed
    prefix lives entirely on the sequence's home rank, so the home rank's
    paged-prefix softmax stats are psum-broadcast over dp (exactly one rank
    contributes; the others add zeros) before the flash merge — the
    replicated output every rank's sampler needs. Returns
    ``(attn_out [T, nq, hd], kv, kvs)``."""
    quant = kvs is not None
    chunked = block_table is not None

    def body(q, k, v, kv, kvs, seg, pos, slot, li, bt, plen):
        from nano_vllm_candle_tpu.kernels.flash_prefill import (
            pallas_packed_prefill_attention,
            pallas_prefix_attention,
        )
        from nano_vllm_candle_tpu.models.qwen3 import (
            _commit_prefill_groups,
            _write_kv,
        )
        from nano_vllm_candle_tpu.ops.attention import (
            merge_attention_parts,
            packed_prefill_attention,
            prefix_attention,
        )

        base = _page_base(kv) if dp_shard else None
        xla = impl == "xla"
        if xla:
            slot_l = slot
            if dp_shard:
                # Out-of-range (another rank's pages) slots are redirected
                # to local_size — a POSITIVE out-of-bounds page index the
                # scatter's mode="drop" actually drops. (A bare subtraction
                # would leave NEGATIVE locals, and JAX scatter wraps
                # negative indices NumPy-style even under mode="drop":
                # rank r>0 would write rank r-1's prefill rows into its
                # own live pages.)
                ps_ = kv.shape[4]
                local_size = _local_pages(kv) * ps_
                slot_l = slot - base * ps_
                slot_l = jnp.where(
                    (slot_l >= 0) & (slot_l < local_size), slot_l, local_size
                )
            kv, kvs = _write_kv(kv, kvs, k, v, slot_l, li)
        else:
            kv, kvs = _commit_prefill_groups(
                kv, kvs, k, v, slot, seg, li, ps, interpret=interpret,
                page_base=base,
                num_local_pages=_local_pages(kv) if dp_shard else None,
            )
        if chunked:
            if xla:
                o_s, m_s, l_s = packed_prefill_attention(
                    q, k, v, seg, pos, scale, return_stats=True,
                )
            else:
                o_s, m_s, l_s = pallas_packed_prefill_attention(
                    q, k, v, seg, pos, scale,
                    return_stats=True, interpret=interpret,
                    band_tiles=band,
                )
            bt_l = bt
            if dp_shard:
                local = bt - base
                bt_l = jnp.where(
                    (local >= 0) & (local < _local_pages(kv)), local, 0
                )
            if xla:
                kv_l = jax.lax.dynamic_index_in_dim(kv, li, 0, keepdims=False)
                kvs_l = (
                    jax.lax.dynamic_index_in_dim(kvs, li, 0, keepdims=False)
                    if quant else None
                )
                o_p, m_p, l_p = prefix_attention(
                    q, kv_l, bt_l, plen, scale, kv_scale=kvs_l,
                )
            else:
                o_p, m_p, l_p = pallas_prefix_attention(
                    q, kv, bt_l, plen, scale,
                    kv_scale=kvs, layer_index=li, interpret=interpret,
                )
            if dp_shard:
                # The whole committed prefix is on the home rank (per-rank
                # block pools); other ranks just scanned their own (finite,
                # zero-initialized) pages. Zero the non-home stats and psum:
                # exactly one rank contributes, making the stats replicated.
                is_home = (bt[0] >= base) & (
                    bt[0] < base + _local_pages(kv))
                o_p = jax.lax.psum(jnp.where(is_home, o_p, 0.0), "dp")
                m_p = jax.lax.psum(jnp.where(is_home, m_p, 0.0), "dp")
                l_p = jax.lax.psum(jnp.where(is_home, l_p, 0.0), "dp")
            out = merge_attention_parts(o_s, m_s, l_s, o_p, m_p, l_p)
        elif xla:
            out = packed_prefill_attention(q, k, v, seg, pos, scale)
        else:
            out = pallas_packed_prefill_attention(
                q, k, v, seg, pos, scale, interpret=interpret,
                band_tiles=band,
            )
        return out, kv, kvs

    head_spec = P(None, "tp", None)
    kv_spec = KV_SPEC_DP if dp_shard else KV_SPEC
    kvs_spec = KVS_SPEC_DP if dp_shard else KVS_SPEC
    in_specs = (
        head_spec,  # q
        head_spec,  # k
        head_spec,  # v
        kv_spec,
        kvs_spec if quant else P(),
        P(None),  # seg_ids
        P(None),  # positions
        P(None),  # slot_mapping
        P(),  # layer index
        P(None) if chunked else P(),  # block_table
        P(),  # prefix_len
    )
    out_specs = (head_spec, kv_spec, kvs_spec if quant else P())
    return _smap(body, mesh, in_specs, out_specs)(
        q, k, v, kv, kvs, seg_ids, positions, slot_mapping, li,
        block_table, prefix_len,
    )
