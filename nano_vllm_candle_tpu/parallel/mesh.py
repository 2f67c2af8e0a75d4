"""Mesh construction and Qwen3 sharding plans.

Axes:
- ``"tp"`` — tensor parallelism. Replicates the reference's column/row-
  parallel split (``/root/reference/src/layers/linear.rs:48-223``) as
  PartitionSpecs: q/k/v/gate/up shard their *output* dim (column-parallel,
  ``linear.rs:80-90``), o/down shard their *input* dim (row-parallel,
  ``linear.rs:201-210``) — and, unlike the reference, GSPMD inserts the
  all-reduce after the row-parallel matmuls that ``linear.rs:184-198``
  omits. The KV cache shards by kv_head (GQA co-location: each chip holds
  the Q heads that read its KV heads — zero attention comms).
- ``"dp"`` — data parallelism over request slots: params replicated, the
  decode batch dim sharded. (Multi-engine DP across hosts is engine-level
  replication; this axis covers in-step batch parallelism.)

The lm_head shards its vocab dim on tp (the reference's
``VocabParallelEmbedding`` stub's declared intent, ``embed_head.rs:3-15``);
sampling reductions (argmax/top-k) over the sharded vocab are resolved by
GSPMD collectives.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nano_vllm_candle_tpu.config import Qwen3Config


def make_mesh(
    tp: int = 1,
    dp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(dp, tp)`` mesh. tp should map to the fastest (ICI)
    axis — device order within a host already is."""
    if devices is None:
        devices = jax.devices()
    n = tp * dp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# column-parallel (shard output dim) / row-parallel (shard contraction dim) /
# replicated, per layer entry — the linear.rs variant mapping
# (layers/linear.py). The ``_t`` kinds are stored TRANSPOSED ([L, out, in],
# layers/linear.TRANSPOSED_PROJS), flipping which plain axis carries the
# sharded dim; their quantized ``[L, G, gs, out]`` form is orientation-fixed.
_LAYER_KINDS = {
    "input_layernorm": "rep",
    "q_proj": "col_t",
    "k_proj": "col_t",
    "v_proj": "col_t",
    "q_norm": "rep",
    "k_norm": "rep",
    "o_proj": "row",
    "post_attention_layernorm": "rep",
    "gate_proj": "col",
    "up_proj": "col",
    "down_proj": "row_t",
}


def _spec_for(kind: str, ndim: int) -> P:
    """Kind → PartitionSpec for PLAIN stacked weights: rank 3
    (``[L, in, out]``, or ``[L, out, in]`` for ``_t`` kinds). Column kinds
    shard the output dim; row kinds shard the contraction dim."""
    if kind == "rep":
        return P(*([None] * ndim))
    if kind == "col":  # [L, in, out]
        return P(None, None, "tp")
    if kind == "col_t":  # [L, out, in]
        return P(None, "tp", None)
    if kind == "row":  # [L, in, out]
        return P(None, "tp", None)
    if kind == "row_t":  # [L, out, in]
        return P(None, None, "tp")
    raise ValueError(f"unknown layer kind {kind!r}")


def quant_specs(kind: str, subtree: dict) -> dict:
    """Specs for a quantized weight dict: ``q``/``q4`` ``[L, G, gs, out]``
    (or headless ``[G, gs, out]``) + ``s`` ``[L, G, out]`` / ``[G, out]``.
    Orientation-independent: column kinds shard ``out`` (last axis of both
    leaves); row kinds shard the group/contraction axis ``G``."""
    return {
        k: quant_leaf_spec(kind, k, v.ndim) for k, v in subtree.items()
    }


def quant_leaf_spec(kind: str, key: str, ndim: int) -> P:
    """Spec for one quantized-weight leaf (see ``quant_specs``)."""
    if kind in ("col", "col_t"):
        return P(*([None] * (ndim - 1)), "tp")  # shard out (last axis)
    # row*: shard the group axis — -3 for q/q4 ([.., G, gs, out]),
    # -2 for s ([.., G, out])
    axes = [None] * ndim
    axes[-2 if key == "s" else -3] = "tp"
    return P(*axes)


def qwen3_param_pspecs(config: Qwen3Config, params: Any) -> Any:
    """PartitionSpec pytree matching ``params`` (plain or quantized)."""
    layer_specs = {
        name: (
            quant_specs(kind, subtree) if isinstance(subtree, dict)
            else _spec_for(kind, subtree.ndim)
        )
        for name, subtree in params["layers"].items()
        for kind in (_LAYER_KINDS[name],)
    }
    specs = {
        # Vocab-parallel embedding (the reference's VocabParallelEmbedding
        # stub's declared intent, embed_head.rs:3-15): rows sharded on tp.
        # GSPMD lowers the token gather to a masked local lookup + psum and
        # the tied-logits matmul to a local matmul over the vocab shard —
        # no full-table replication (a 151936 x H bf16 table is 311 MB at
        # 0.6B and 1.5 GB at 32B per chip if replicated).
        "embed_tokens": P("tp", None),
        "layers": layer_specs,
        "norm": P(None),
    }
    if "lm_head" in params:
        lh = params["lm_head"]
        if isinstance(lh, dict):  # int8 head (quantize_lm_head)
            specs["lm_head"] = quant_specs("col", lh)  # vocab (out) on tp
        else:
            specs["lm_head"] = P(None, "tp")  # vocab-parallel head
    return specs


def kv_cache_pspec(ndim: int = 6, dp_shard: bool = False) -> P:
    """Rank 6: combined pages ``[L, pages, 2, num_kv_heads, page_size,
    head_dim]`` — shard kv_heads (axis 3) on tp. Rank 5: the int8 scale
    planes ``[L, pages, 2, num_kv_heads, page_size]`` — same axis.
    ``dp_shard`` additionally shards the PAGE axis (1) on dp: each dp rank
    owns its pinned slots' pages (engine/block_manager per-rank pools), so
    commits/reads stay rank-local (EngineConfig.dp_shard_kv)."""
    dp = "dp" if dp_shard else None
    return P(None, dp, None, "tp", *([None] * (ndim - 4)))


def shard_params(params: Any, mesh: Mesh, config: Qwen3Config) -> Any:
    specs = qwen3_param_pspecs(config, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_kv_cache(kv_cache: Any, mesh: Mesh, dp_shard: bool = False) -> Any:
    from nano_vllm_candle_tpu.models.qwen3 import KVCache

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return KVCache(
        kv=put(kv_cache.kv, kv_cache_pspec(kv_cache.kv.ndim, dp_shard)),
        kv_scale=(
            put(kv_cache.kv_scale,
                kv_cache_pspec(kv_cache.kv_scale.ndim, dp_shard))
            if kv_cache.kv_scale is not None else None
        ),
    )


def validate_tp(config: Qwen3Config, tp: int) -> None:
    """TP must divide the sharded dims cleanly (MXU-aligned shards)."""
    for name, dim in [
        ("num_key_value_heads", config.num_key_value_heads),
        ("num_attention_heads", config.num_attention_heads),
        ("intermediate_size", config.intermediate_size),
        ("vocab_size", config.vocab_size),
    ]:
        if dim % tp != 0:
            raise ValueError(f"tp={tp} does not divide {name}={dim}")
