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
    packed_prefill_attention,
    paged_decode_attention,
)
from nano_vllm_candle_tpu.layers.linear import TRANSPOSED_PROJS, matmul
from nano_vllm_candle_tpu.ops.layernorm import head_rms_norm, rms_norm
from nano_vllm_candle_tpu.ops.rotary import apply_rope_positions, build_rope_table

Params = Dict[str, Any]


#: Cache-commit group: page writes happen in aligned runs of this many
#: tokens so every committed window is whole physical tiles — the only
#: write granularity that avoids read-modify-write into the head-major page
#: layout. 32 covers every cache dtype's sublane tiling (int8 (32,128) = 1
#: tile, bf16 (16,128) = 2, f32 (8,128) = 4). Pages must be a multiple of
#: this (asserted by the runner).
GROUP = 32


class PrefillBatch(NamedTuple):
    """Packed multi-sequence prefill inputs (static T per bucket)."""

    token_ids: jax.Array  # [T] int32
    positions: jax.Array  # [T] int32 (0 for padding)
    seg_ids: jax.Array  # [T] int32, -1 for padding
    slot_mapping: jax.Array  # [T] int32 flat cache slot (page*page_size+off)
    logits_indices: jax.Array  # [B] int32 token index of each seq's last token
    # Ring-mode only (group-commit cache): ring row for tail tokens
    # (position >= the sequence's last full GROUP boundary), GROUP = trash
    # row for everything else. None in direct-write mode.
    ring_slots: Optional[jax.Array] = None  # [T] int32 in [0, GROUP]


class DecodeBatch(NamedTuple):
    """Fixed-shape decode inputs (one token per active slot)."""

    token_ids: jax.Array  # [B] int32
    positions: jax.Array  # [B] int32
    slot_mapping: jax.Array  # [B] int32
    block_tables: jax.Array  # [B, max_blocks_per_seq] int32
    seq_lens: jax.Array  # [B] int32 (0 for inactive slots)


class KVCache(NamedTuple):
    """Paged KV cache; optionally INT8-quantized with per-vector scales.

    ``k``/``v``: ``[L, num_pages, num_kv_heads, page_size, head_dim]``
    (bf16/f32, or int8 when quantized). ``k_scale``/``v_scale``:
    ``[L, num_pages, page_size, num_kv_heads]`` f32 per-stored-vector
    scales, or None for unquantized caches. INT8 KV halves the HBM
    bandwidth per decoded token — the dominant cost at long context.
    Scale planes are *token-major* (``[ps, nkv]``, opposite of the pages):
    a GROUP commit then writes a ``(GROUP, nkv)`` window whose trailing
    dims satisfy Mosaic's (8, 128)-divisible-or-full-dim block rule for any
    ``page_size`` — the head-major ``[nkv, ps]`` order would need a
    ``(nkv, GROUP)`` block, illegal whenever GROUP < min(ps, 128).

    Axis order is deliberate: pages are **head-major** (``[nkv, ps, hd]``),
    so a fetched page is directly the per-head ``[ps, hd]`` operand the
    decode kernel's batched matmuls need — no in-kernel transpose (the
    token-major ``[ps, nkv, hd]`` order cost two VMEM swapaxes per page per
    layer, measured ~12% of the kernel; a fully head-major *cache*
    ``[L, nkv, P, ps, hd]`` was worse still — XLA relayouts the whole cache
    around the scatter). The write side scatters one ``[nkv, hd]`` plane per
    token at stride ``ps·hd``, which XLA lowers to per-head row writes
    without relayout.
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None
    # Group-commit staging ring (ring mode only): ``[L, B, GROUP + 1, nkv,
    # hd]`` in the ACTIVATION dtype (bf16 even under int8 paged storage —
    # quantization happens at group commit). Ring row ``pos % GROUP`` holds
    # the not-yet-committed tail of each slot's sequence; row GROUP is a
    # trash row for non-tail prefill writes. Per-token ring writes land on
    # the minor ``[nkv, hd]`` dims — whole tiles, so the scatter is cheap —
    # and whole groups commit to pages as aligned ``[nkv, GROUP, hd]``
    # windows.
    ring_k: Optional[jax.Array] = None
    ring_v: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(
    config: Qwen3Config,
    num_pages: int,
    page_size: int,
    dtype: jnp.dtype = jnp.bfloat16,
    *,
    ring_batch: Optional[int] = None,
    ring_dtype: jnp.dtype = jnp.bfloat16,
) -> KVCache:
    """Allocate the paged cache; ``ring_batch=B`` adds the group-commit
    staging ring (required for the ring-mode attention impls)."""
    shape = (
        config.num_hidden_layers,
        num_pages,
        config.num_key_value_heads,
        page_size,
        config.head_dim,
    )
    rings = {}
    if ring_batch is not None:
        rshape = (
            config.num_hidden_layers,
            ring_batch,
            GROUP + 1,
            config.num_key_value_heads,
            config.head_dim,
        )
        rings = dict(
            ring_k=jnp.zeros(rshape, ring_dtype),
            ring_v=jnp.zeros(rshape, ring_dtype),
        )
    if jnp.dtype(dtype) == jnp.int8:
        # Token-major scale planes [L, P, ps, nkv] (see KVCache docstring)
        sshape = (shape[0], shape[1], shape[3], shape[2])
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros(sshape, jnp.float32),
            **rings,
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), **rings)


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
    kk: jax.Array,  # [L, P, nkv, ps, hd] full stacked cache (head-major pages)
    vv: jax.Array,
    kcs: Optional[jax.Array],  # [L, P, ps, nkv] or None
    vcs: Optional[jax.Array],
    k: jax.Array,  # [T, nkv, hd] new rows
    v: jax.Array,
    slot_mapping: jax.Array,  # [T] flat slots (page*page_size + offset)
    li: jax.Array,  # scalar layer index
):
    """Scatter new k/v rows into layer ``li`` of the full paged cache,
    **in place on the scan carry**.

    The cache never leaves the carry: one scatter writes ``T`` per-token
    ``[nkv, hd]`` planes and nothing else moves. (An earlier design threaded
    per-layer caches through ``lax.scan`` xs/ys, which made XLA
    re-materialize the entire cache every step — profiled at ~1 GB of HBM
    traffic per decode step for ~100 KB of actual KV data.)

    Padding tokens carry slots inside the null page 0, so the scatter is
    unconditional. For int8 caches, values are quantized per vector and
    scales scattered alongside.
    """
    L, P, nkv, ps, hd = kk.shape
    pages = (slot_mapping // ps)[:, None]  # [T, 1]
    offs = (slot_mapping % ps)[:, None]
    heads = jnp.arange(nkv, dtype=jnp.int32)[None, :]  # [1, nkv]
    # All advanced indices ([T,1] pages, [1,nkv] heads, [T,1] offs) are
    # adjacent and broadcast to [T, nkv]; the scatter windows are contiguous
    # [hd] rows, so XLA keeps the cache in its default (kernel-required)
    # layout. (A separated-index form ``at[li, pages, :, offs]`` made XLA
    # relayout the ENTIRE cache around the scatter — ~800 ms/step.)
    if kcs is not None:
        k, k_scale = _quantize_kv(k)  # scales [T, nkv]
        v, v_scale = _quantize_kv(v)
        # token-major scale planes [L, P, ps, nkv]
        kcs = kcs.at[li, pages, offs, heads].set(k_scale, mode="drop")
        vcs = vcs.at[li, pages, offs, heads].set(v_scale, mode="drop")
    kk = kk.at[li, pages, heads, offs].set(k, mode="drop")
    vv = vv.at[li, pages, heads, offs].set(v, mode="drop")
    return kk, vv, kcs, vcs


# --------------------------------------------------------------------------
# Group-commit ring (the write path for the Pallas/ring attention impls)
#
# Single-token writes into the head-major page layout are sub-tile (a token
# is one ps-row of a (8,128)(2,1)-tiled [ps, hd] plane), which XLA lowers to
# an expensive per-index RMW scatter (~0.6 ms/step measured at bs16). In
# ring mode, tokens stage in the tile-aligned ring (KVCache.ring_k docs) and
# pages receive only whole [nkv, GROUP, hd] windows — full physical tiles.
# --------------------------------------------------------------------------


def _scatter_groups(cache, updates, li_col, pages, offs, *, promise=True):
    """Scatter GROUP windows into the paged arrays at rows
    ``(li, page, off)``. Rank-5 page data: ``updates [N, nkv, GROUP, hd]``
    into ``cache [L, P, nkv, ps, hd]``. Rank-4 int8 scale planes:
    ``updates [N, nkv, GROUP]`` into the token-major
    ``cache [L, P, ps, nkv]`` (transposed here).
    """
    if cache.ndim == 4:
        updates = jnp.swapaxes(updates, 1, 2)  # [N, GROUP, nkv]
        off_operand_dim = 2
    else:
        off_operand_dim = 3
    n_win = updates.ndim - 1  # window dims in the update
    idx = jnp.stack(
        [li_col, pages.astype(jnp.int32), offs.astype(jnp.int32)], axis=-1
    )
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=tuple(range(1, 1 + n_win)),
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, off_operand_dim),
    )
    return jax.lax.scatter(
        cache, idx, updates.astype(cache.dtype), dnums,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS if promise
        else jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def _commit_windows(
    kk, vv, kcs, vcs, upd_k, upd_v, li, pages, offs, use_kernel
):
    """Write N aligned ``[nkv, GROUP, hd]`` windows (``upd_k/v [N, nkv,
    GROUP, hd]``, activation dtype) into the caches at ``(li, page, off)``.

    ``use_kernel=True`` routes through the Pallas aliased-output commit
    kernel (kernels/kv_commit.py) — XLA lowers the equivalent
    ``lax.scatter`` to a serialized select + full-cache DUS loop costing
    more than the attention itself. The scatter form remains for the
    CPU-testable ``xla_ring`` impl.
    """
    quant = kcs is not None
    sk = sv = None
    if quant:
        upd_k, sk = _quantize_kv(upd_k)  # scales [N, nkv, GROUP]
        upd_v, sv = _quantize_kv(upd_v)
    if use_kernel:
        from nano_vllm_candle_tpu.kernels.kv_commit import pallas_commit_groups

        out = pallas_commit_groups(
            kk, vv, upd_k, upd_v, li, pages, offs,
            k_scale_cache=kcs, v_scale_cache=vcs,
            k_scale_upd=sk, v_scale_upd=sv,
        )
        if quant:
            return out
        return out[0], out[1], None, None
    N = pages.shape[0]
    li_col = jnp.full((N,), li, jnp.int32)
    if quant:
        kcs = _scatter_groups(kcs, sk, li_col, pages, offs)
        vcs = _scatter_groups(vcs, sv, li_col, pages, offs)
    kk = _scatter_groups(kk, upd_k, li_col, pages, offs)
    vv = _scatter_groups(vv, upd_v, li_col, pages, offs)
    return kk, vv, kcs, vcs


def _commit_prefill_groups(
    kk, vv, kcs, vcs, k, v, slot_mapping, ring_slots, li, ps, use_kernel
):
    """Commit every full GROUP of the packed prefill stream to its page.

    The runner pads each sequence to a GROUP multiple, so groups never
    straddle sequences and group-start slots are GROUP-aligned within a
    page. A group whose first token is a tail token (``ring_slots < GROUP``)
    or stream padding (slot 0) targets the null page instead.
    """
    T = k.shape[0]
    nG = T // GROUP
    first_slot = slot_mapping[::GROUP]  # [nG]
    full = ring_slots[::GROUP] == GROUP
    pages = jnp.where(full, first_slot // ps, 0)
    offs = jnp.where(full, first_slot % ps, 0)

    def regroup(x):  # [T, nkv, hd] -> [nG, nkv, GROUP, hd]
        return jnp.swapaxes(x.reshape(nG, GROUP, *x.shape[1:]), 1, 2)

    return _commit_windows(
        kk, vv, kcs, vcs, regroup(k), regroup(v), li, pages, offs, use_kernel
    )


def _commit_decode_group(
    kk, vv, kcs, vcs, rk_l, rv_l, li, n, block_tables, ps, use_kernel
):
    """When a slot's length ``n`` crosses a GROUP boundary, commit its full
    ring (positions n-GROUP..n-1, which occupy ring rows 0..GROUP-1 in
    position order) to the page; other slots write their window into the
    null page."""
    flush = (n > 0) & (n % GROUP == 0)
    start = jnp.maximum(n - GROUP, 0)
    page = jnp.take_along_axis(block_tables, (start // ps)[:, None], 1)[:, 0]
    pages = jnp.where(flush, page, 0)
    offs = jnp.where(flush, start % ps, 0)
    upd_k = jnp.swapaxes(rk_l[:, :GROUP], 1, 2)  # [B, nkv, GROUP, hd]
    upd_v = jnp.swapaxes(rv_l[:, :GROUP], 1, 2)
    return _commit_windows(
        kk, vv, kcs, vcs, upd_k, upd_v, li, pages, offs, use_kernel
    )


def _ring_attention(q, ring_k, ring_v, n, committed, scale):
    """Attention over the uncommitted ring tail (positions
    ``[committed, n)``; ring row j holds position committed + j).

    Returns unnormalized ``(out_u [B, nkv, g, hd] f32, m [B, nkv, g],
    l [B, nkv, g])`` for the flash combine with the paged part.
    """
    B, nkv, g, hd = q.shape
    s = jnp.einsum(
        "bkgd,bjkd->bkgj", q, ring_k[:, :GROUP],
        preferred_element_type=jnp.float32,
    ) * scale  # [B, nkv, g, GROUP]
    valid = jnp.arange(GROUP, dtype=jnp.int32)[None, :] < (n - committed)[:, None]
    s = jnp.where(valid[:, None, None, :], s, MASK_VALUE)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    p = jnp.where(valid[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    out_u = jnp.einsum(
        "bkgj,bjkd->bkgd", p.astype(ring_v.dtype), ring_v[:, :GROUP],
        preferred_element_type=jnp.float32,
    )
    return out_u, m, l


def _combine_attention(out1, m1, l1, out2_u, m2, l2):
    """Flash-merge a normalized partial attention (paged: ``out1, m1, l1``)
    with an unnormalized one (ring: ``out2_u, m2, l2``). All f32 math;
    zero-weight rows (inactive slots) resolve to 0."""
    m = jnp.maximum(m1, m2)
    w1 = l1 * jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    denom = w1 + l2 * a2
    safe = jnp.where(denom == 0.0, 1.0, denom)
    num = out1.astype(jnp.float32) * w1[..., None] + out2_u * a2[..., None]
    return num / safe[..., None]


RING_IMPLS = ("pallas", "xla_ring")

# Perf-forensics switch (dev tooling, used by profile_decode.py --ablate):
# stage names added here are SKIPPED in the decode layer so their cost can
# be measured by difference on real hardware. Read at trace time — set it
# before jit and don't mix ablations in one process. Never set in serving.
ABLATE: frozenset = frozenset()
_ABLATABLE = ("norms", "qknorm", "rope", "ring_write", "commit", "ring_attn")


def _decoder_layer(
    hidden: jax.Array,
    residual: jax.Array,
    lp: Params,  # per-layer plain weights (sliced by the scan)
    qlp: Params,  # FULL-stack quantized weights (indexed by li; see forward)
    li: jax.Array,  # scalar layer index into the stacked cache
    kk: jax.Array,  # [L, P, nkv, ps, hd] full stacked cache (carry)
    vv: jax.Array,
    kcs: Optional[jax.Array],
    vcs: Optional[jax.Array],
    rk: Optional[jax.Array],  # [L, B, GROUP+1, nkv, hd] ring (ring impls)
    rv: Optional[jax.Array],
    batch,
    config: Qwen3Config,
    mode: str,
    attn_impl: str,
):
    """One decoder layer with the reference's residual-threading contract
    (``qwen3.rs:374-399``)."""
    c = config
    T = hidden.shape[0]
    scale = c.head_dim**-0.5

    def proj(name: str):
        return lp[name] if name in lp else qlp[name]

    if "norms" in ABLATE:
        normed, residual = hidden, hidden
    else:
        normed, residual = rms_norm(
            hidden, lp["input_layernorm"], c.rms_norm_eps, residual
        )

    # QKV projections (column-parallel under TP; plain or int-quantized);
    # attn_impl doubles as the matmul impl switch: "pallas" routes quantized
    # weights through the fused dequant-matmul kernel (kernels/quant_matmul.py)
    mm = attn_impl

    def pmm(xin, name: str):
        # transposed ([out, in]) storage only applies to plain weights
        w = proj(name)
        t = name in TRANSPOSED_PROJS and not isinstance(w, dict)
        return matmul(xin, w, mm, li, transposed=t)

    def has(name: str) -> bool:
        return name in lp or name in qlp

    if has("qkv_proj"):  # fused stack (layers/linear.fuse_qwen3_params)
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

    ring = attn_impl in RING_IMPLS
    ps = kk.shape[3]

    if mode == "prefill":
        if ring:
            # Full groups -> pages (tile-aligned); per-seq tails -> ring.
            kk, vv, kcs, vcs = _commit_prefill_groups(
                kk, vv, kcs, vcs, k, v, batch.slot_mapping, batch.ring_slots,
                li, ps, attn_impl == "pallas",
            )
            segc = jnp.maximum(batch.seg_ids, 0)
            rk = rk.at[li, segc, batch.ring_slots].set(k, mode="drop")
            rv = rv.at[li, segc, batch.ring_slots].set(v, mode="drop")
        else:
            kk, vv, kcs, vcs = _write_kv(
                kk, vv, kcs, vcs, k, v, batch.slot_mapping, li
            )
        if attn_impl == "pallas":
            from nano_vllm_candle_tpu.kernels.flash_prefill import (
                pallas_packed_prefill_attention,
            )

            attn_out = pallas_packed_prefill_attention(
                q, k, v, batch.seg_ids, batch.positions, scale
            )
        else:
            attn_out = packed_prefill_attention(
                q, k, v, batch.seg_ids, batch.positions, scale
            )
    elif ring:
        n = batch.seq_lens  # includes the current token; 0 = inactive slot
        B = n.shape[0]
        rslot = jnp.where(n > 0, batch.positions % GROUP, GROUP)
        if attn_impl == "pallas" and not (ABLATE & {"ring_write", "commit"}):
            # Fused ring write + group commit: one aliased-output kernel
            # stages the current row and emits the completed window
            # (kernels/kv_commit.pallas_ring_commit).
            from nano_vllm_candle_tpu.kernels.kv_commit import (
                pallas_ring_commit,
            )

            flush = (n > 0) & (n % GROUP == 0)
            start = jnp.maximum(n - GROUP, 0)
            page = jnp.take_along_axis(
                batch.block_tables, (start // ps)[:, None], 1
            )[:, 0]
            pages = jnp.where(flush, page, 0)
            offs = jnp.where(flush, start % ps, 0)
            out = pallas_ring_commit(
                rk, rv, kk, vv, k, v, li, rslot, pages, offs, kcs, vcs
            )
            if kcs is not None:
                rk, rv, kk, vv, kcs, vcs = out
            else:
                rk, rv, kk, vv = out
        else:
            # 1. Current token -> its ring row (whole-tile write).
            bidx = jnp.arange(B, dtype=jnp.int32)
            if "ring_write" not in ABLATE:
                rk = rk.at[li, bidx, rslot].set(k, mode="drop")
                rv = rv.at[li, bidx, rslot].set(v, mode="drop")
            # 2. Completed group (if n crossed a boundary) -> page.
            rk_l2 = jax.lax.dynamic_index_in_dim(rk, li, 0, keepdims=False)
            rv_l2 = jax.lax.dynamic_index_in_dim(rv, li, 0, keepdims=False)
            if "commit" not in ABLATE:
                kk, vv, kcs, vcs = _commit_decode_group(
                    kk, vv, kcs, vcs, rk_l2, rv_l2, li, n, batch.block_tables,
                    ps, attn_impl == "pallas",
                )
        # 3. Attention = paged part (committed prefix) + ring tail, merged.
        committed = (n // GROUP) * GROUP
        qg = q.reshape(B, c.num_key_value_heads, c.num_q_per_kv, c.head_dim)
        if attn_impl == "pallas":
            from nano_vllm_candle_tpu.kernels.paged_decode import (
                pallas_paged_decode_attention,
            )

            if "ring_attn" in ABLATE:
                out1, m1, l1 = pallas_paged_decode_attention(
                    q, kk, vv, batch.block_tables, committed, scale,
                    k_scale=kcs, v_scale=vcs, layer_index=li,
                    return_stats=True,
                )
                attn_out = out1.astype(hidden.dtype)
            else:
                # Ring tail folded into the kernel as one extra grid step
                # (no XLA-side combine, no per-layer ring slices).
                attn_out = pallas_paged_decode_attention(
                    q, kk, vv, batch.block_tables, committed, scale,
                    k_scale=kcs, v_scale=vcs, layer_index=li,
                    ring_k=rk, ring_v=rv, total_lens=n,
                ).astype(hidden.dtype)
        else:
            rk_l = jax.lax.dynamic_index_in_dim(rk, li, 0, keepdims=False)
            rv_l = jax.lax.dynamic_index_in_dim(rv, li, 0, keepdims=False)
            k_l = jax.lax.dynamic_index_in_dim(kk, li, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(vv, li, 0, keepdims=False)
            kcs_l = (
                jax.lax.dynamic_index_in_dim(kcs, li, 0, keepdims=False)
                if kcs is not None else None
            )
            vcs_l = (
                jax.lax.dynamic_index_in_dim(vcs, li, 0, keepdims=False)
                if vcs is not None else None
            )
            out1, m1, l1 = paged_decode_attention(
                q, k_l, v_l, batch.block_tables, committed, scale,
                k_scale=kcs_l, v_scale=vcs_l, return_stats=True,
            )
            if "ring_attn" in ABLATE:
                attn_out = out1.astype(hidden.dtype)
            else:
                out2_u, m2, l2 = _ring_attention(
                    qg, rk_l, rv_l, n, committed, scale
                )
                shp = (B, c.num_key_value_heads, c.num_q_per_kv)
                merged = _combine_attention(
                    out1.reshape(*shp, c.head_dim), m1.reshape(shp),
                    l1.reshape(shp), out2_u, m2, l2,
                )
                attn_out = merged.reshape(
                    B, c.num_attention_heads, c.head_dim
                ).astype(hidden.dtype)
    else:
        kk, vv, kcs, vcs = _write_kv(
            kk, vv, kcs, vcs, k, v, batch.slot_mapping, li
        )
        # XLA fallback (CPU tests): slice this layer's cache out of the
        # stack. Costs a per-layer dynamic-slice — acceptable off the TPU
        # fast path.
        k_l = jax.lax.dynamic_index_in_dim(kk, li, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(vv, li, 0, keepdims=False)
        kcs_l = (
            jax.lax.dynamic_index_in_dim(kcs, li, 0, keepdims=False)
            if kcs is not None else None
        )
        vcs_l = (
            jax.lax.dynamic_index_in_dim(vcs, li, 0, keepdims=False)
            if vcs is not None else None
        )
        attn_out = paged_decode_attention(
            q, k_l, v_l, batch.block_tables, batch.seq_lens, scale,
            k_scale=kcs_l, v_scale=vcs_l,
        )

    # Row-parallel o_proj (all-reduce inserted by GSPMD under TP)
    hidden = pmm(attn_out.reshape(T, c.q_size), "o_proj")

    if "norms" in ABLATE:
        normed = hidden
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
    return hidden, residual, kk, vv, kcs, vcs, rk, rv


def forward(
    params: Params,
    kv_cache: KVCache,
    batch,
    *,
    config: Qwen3Config,
    mode: str,  # "prefill" | "decode"
    attn_impl: str = "xla",  # "xla" | "pallas"
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

    if attn_impl in RING_IMPLS and kv_cache.ring_k is None:
        raise ValueError(
            f"attn_impl={attn_impl!r} needs the group-commit ring; create the "
            "cache with init_kv_cache(..., ring_batch=max_num_seqs)"
        )

    def layer_fn(carry, xs):
        h, r, kk, vv, kcs, vcs, rk, rv = carry
        lp, li = xs
        h, r, kk, vv, kcs, vcs, rk, rv = _decoder_layer(
            h, r, lp, quant_layers, li, kk, vv, kcs, vcs, rk, rv,
            batch, c, mode, attn_impl,
        )
        return (h, r, kk, vv, kcs, vcs, rk, rv), None

    (hidden, residual, new_k, new_v, new_kcs, new_vcs, new_rk, new_rv), _ = (
        jax.lax.scan(
            layer_fn,
            (hidden, residual, kv_cache.k, kv_cache.v,
             kv_cache.k_scale, kv_cache.v_scale,
             kv_cache.ring_k, kv_cache.ring_v),
            (xs_layers, jnp.arange(L, dtype=jnp.int32)),
        )
    )

    hidden, _ = rms_norm(hidden, params["norm"], c.rms_norm_eps, residual)

    if mode == "prefill":
        hidden = hidden[batch.logits_indices]  # [B, H]
    return hidden, KVCache(new_k, new_v, new_kcs, new_vcs, new_rk, new_rv)


def compute_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """``[B, H] @ [H, V]`` — untied lm_head or tied embedding transpose
    (``qwen3.rs:525-528,542-550``; tied support per HF config)."""
    if "lm_head" in params:
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
