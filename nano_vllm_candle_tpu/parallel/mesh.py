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


def qwen3_param_pspecs(config: Qwen3Config) -> Any:
    """PartitionSpec pytree matching ``models.qwen3`` params."""
    specs = {
        "embed_tokens": P(None, None),  # replicated (gather-friendly)
        "layers": {
            "input_layernorm": P(None, None),
            "q_proj": P(None, None, "tp"),  # column-parallel
            "k_proj": P(None, None, "tp"),
            "v_proj": P(None, None, "tp"),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "o_proj": P(None, "tp", None),  # row-parallel (+psum by GSPMD)
            "post_attention_layernorm": P(None, None),
            "gate_proj": P(None, None, "tp"),
            "up_proj": P(None, None, "tp"),
            "down_proj": P(None, "tp", None),  # row-parallel (+psum)
        },
        "norm": P(None),
    }
    if not config.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")  # vocab-parallel head
    return specs


def kv_cache_pspec() -> P:
    """[L, num_kv_heads, pages, page_size, head_dim] — shard kv_heads on tp."""
    return P(None, "tp", None, None, None)


def shard_params(params: Any, mesh: Mesh, config: Qwen3Config) -> Any:
    specs = qwen3_param_pspecs(config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_kv_cache(kv_cache: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, kv_cache_pspec())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), kv_cache)


def validate_tp(config: Qwen3Config, tp: int) -> None:
    """TP must divide the sharded dims cleanly (MXU-aligned shards)."""
    for name, dim in [
        ("num_key_value_heads", config.num_key_value_heads),
        ("num_attention_heads", config.num_attention_heads),
        ("intermediate_size", config.intermediate_size),
    ]:
        if dim % tp != 0:
            raise ValueError(f"tp={tp} does not divide {name}={dim}")
