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
    packed_prefill_attention,
    paged_decode_attention,
)
from nano_vllm_candle_tpu.layers.linear import TRANSPOSED_PROJS, matmul
from nano_vllm_candle_tpu.ops.layernorm import head_rms_norm, rms_norm
from nano_vllm_candle_tpu.ops.rotary import apply_rope_positions, build_rope_table

Params = Dict[str, Any]


class PrefillBatch(NamedTuple):
    """Packed multi-sequence prefill inputs (static T per bucket)."""

    token_ids: jax.Array  # [T] int32
    positions: jax.Array  # [T] int32 (0 for padding)
    seg_ids: jax.Array  # [T] int32, -1 for padding
    slot_mapping: jax.Array  # [T] int32 flat cache slot (page*page_size+off)
    logits_indices: jax.Array  # [B] int32 token index of each seq's last token


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
    ``[L, num_pages, num_kv_heads, page_size]`` f32 per-stored-vector
    scales, or None for unquantized caches. INT8 KV halves the HBM
    bandwidth per decoded token — the dominant cost at long context.

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

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(
    config: Qwen3Config,
    num_pages: int,
    page_size: int,
    dtype: jnp.dtype = jnp.bfloat16,
) -> KVCache:
    shape = (
        config.num_hidden_layers,
        num_pages,
        config.num_key_value_heads,
        page_size,
        config.head_dim,
    )
    if jnp.dtype(dtype) == jnp.int8:
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape[:-1], jnp.float32),
            jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


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
    kcs: Optional[jax.Array],  # [L, P, nkv, ps] or None
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
        kcs = kcs.at[li, pages, heads, offs].set(k_scale, mode="drop")
        vcs = vcs.at[li, pages, heads, offs].set(v_scale, mode="drop")
    kk = kk.at[li, pages, heads, offs].set(k, mode="drop")
    vv = vv.at[li, pages, heads, offs].set(v, mode="drop")
    return kk, vv, kcs, vcs


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

    normed, residual = rms_norm(hidden, lp["input_layernorm"], c.rms_norm_eps, residual)

    # QKV projections (column-parallel under TP; plain or int-quantized);
    # attn_impl doubles as the matmul impl switch: "pallas" routes quantized
    # weights through the fused dequant-matmul kernel (kernels/quant_matmul.py)
    mm = attn_impl

    def pmm(xin, name: str):
        # transposed ([out, in]) storage only applies to plain weights
        t = name in TRANSPOSED_PROJS and name in lp
        return matmul(xin, proj(name), mm, li, transposed=t)

    q = pmm(normed, "q_proj").reshape(T, c.num_attention_heads, c.head_dim)
    k = pmm(normed, "k_proj").reshape(T, c.num_key_value_heads, c.head_dim)
    v = pmm(normed, "v_proj").reshape(T, c.num_key_value_heads, c.head_dim)

    # Per-head RMSNorm before RoPE (qwen3.rs:224-232)
    q = head_rms_norm(q, lp["q_norm"], c.rms_norm_eps)
    k = head_rms_norm(k, lp["k_norm"], c.rms_norm_eps)
    q, k = apply_rope_positions(q, k, batch.positions, c.rope_theta)

    kk, vv, kcs, vcs = _write_kv(
        kk, vv, kcs, vcs, k, v, batch.slot_mapping, li
    )

    if mode == "prefill":
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
    elif attn_impl == "pallas":
        from nano_vllm_candle_tpu.kernels.paged_decode import (
            pallas_paged_decode_attention,
        )

        attn_out = pallas_paged_decode_attention(
            q, kk, vv, batch.block_tables, batch.seq_lens, scale,
            k_scale=kcs, v_scale=vcs, layer_index=li,
        )
    else:
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

    normed, residual = rms_norm(
        hidden, lp["post_attention_layernorm"], c.rms_norm_eps, residual
    )
    gate = pmm(normed, "gate_proj")
    up = pmm(normed, "up_proj")
    hidden = pmm(jax.nn.silu(gate) * up, "down_proj")
    return hidden, residual, kk, vv, kcs, vcs


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

    # Quantized projections stay OUT of the scan xs (full stacks captured by
    # closure, indexed per layer): scan-slicing them would hand pre-sliced
    # operands to the pallas dequant-matmul, which XLA materializes as a
    # full-weight HBM copy per layer (kernels/quant_matmul.py).
    from nano_vllm_candle_tpu.layers.linear import is_quantized

    xs_layers = {k: v for k, v in params["layers"].items() if not is_quantized(v)}
    quant_layers = {k: v for k, v in params["layers"].items() if is_quantized(v)}

    def layer_fn(carry, xs):
        h, r, kk, vv, kcs, vcs = carry
        lp, li = xs
        h, r, kk, vv, kcs, vcs = _decoder_layer(
            h, r, lp, quant_layers, li, kk, vv, kcs, vcs, batch, c, mode, attn_impl
        )
        return (h, r, kk, vv, kcs, vcs), None

    (hidden, residual, new_k, new_v, new_kcs, new_vcs), _ = jax.lax.scan(
        layer_fn,
        (hidden, residual, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale),
        (xs_layers, jnp.arange(L, dtype=jnp.int32)),
    )

    hidden, _ = rms_norm(hidden, params["norm"], c.rms_norm_eps, residual)

    if mode == "prefill":
        hidden = hidden[batch.logits_indices]  # [B, H]
    return hidden, KVCache(new_k, new_v, new_kcs, new_vcs)


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
