"""HF safetensors → JAX parameter pytree.

The reference mmaps a single ``model.safetensors`` as F32 via Candle's
``VarBuilder`` (``/root/reference/src/models/qwen3.rs:515-523``) and fuses
q/k/v and gate/up at load (``qwen3.rs:171,310``). TPU-native differences:

- native **bf16** loading (the reference is F32-only — SURVEY.md §2.7);
- multi-file ``model.safetensors.index.json`` support (4B/8B/32B ship
  sharded checkpoints), opened lazily file-by-file (no all-tensors-resident
  host copy);
- ``mesh=`` places each tensor with its target NamedSharding at load time
  (``jax.device_put`` splits the host array directly into per-device
  shards), so a 32B bf16 load never materializes a replicated copy in any
  single chip's HBM;
- **offline quantized artifacts**: ``save_quantized_checkpoint`` writes the
  INT8/INT4 weight pytree (packed nibbles + sub-channel scales) as a
  safetensors file + ``quant_config.json``; ``load_qwen3_params`` detects
  and loads it directly — an 8B/32B INT4 serve never touches bf16 weights;
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


class _ShardReader:
    """Lazy per-tensor access across single- or multi-file checkpoints.

    Tensors are read from disk only when requested (mmap'd by safetensors),
    so peak host memory tracks the largest layer stack, not the checkpoint.
    """

    def __init__(self, model_dir: str, base: str = "model.safetensors"):
        from safetensors import safe_open

        self._safe_open = safe_open
        self._dir = model_dir
        self._file_of: Dict[str, str] = {}
        self._handles: Dict[str, Any] = {}
        index_path = os.path.join(model_dir, base + ".index.json")
        if os.path.exists(index_path):
            with open(index_path) as f:
                self._file_of = dict(json.load(f)["weight_map"])
        else:
            path = os.path.join(model_dir, base)
            with safe_open(path, framework="numpy") as f:
                for name in f.keys():
                    self._file_of[name] = base

    def names(self):
        return self._file_of.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._file_of

    def get(self, name: str) -> np.ndarray:
        fname = self._file_of[name]
        if fname not in self._handles:
            self._handles[fname] = self._safe_open(
                os.path.join(self._dir, fname), framework="numpy"
            ).__enter__()
        return self._handles[fname].get_tensor(name)


def _to_jnp(arr: np.ndarray, dtype: jnp.dtype) -> jax.Array:
    # numpy has no bf16; safetensors returns bf16 tensors as uint16 views in
    # some versions — use jax to reinterpret when needed.
    if arr.dtype == np.uint16:
        return jax.lax.bitcast_convert_type(jnp.asarray(arr), jnp.bfloat16).astype(dtype)
    return jnp.asarray(arr).astype(dtype)


def _sharding_for(name: str, ndim: int, mesh, leaf_key=None):
    """NamedSharding for a parameter by name (mesh's layer-kind mapping).

    ``leaf_key``: "q"/"q4"/"s" for quantized-dict leaves (their group
    layouts shard different axes than plain weights, mesh.quant_leaf_spec).
    """
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nano_vllm_candle_tpu.parallel.mesh import (
        _LAYER_KINDS, _spec_for, quant_leaf_spec,
    )

    if name in _LAYER_KINDS:
        kind = _LAYER_KINDS[name]
        if leaf_key in ("q", "q4", "s"):
            spec = quant_leaf_spec(kind, leaf_key, ndim)
        else:
            spec = _spec_for(kind, ndim)
    elif name == "lm_head":
        if leaf_key in ("q", "q4", "s"):
            spec = quant_leaf_spec("col", leaf_key, ndim)  # vocab on tp
        else:
            spec = P(None, "tp")
    elif name == "embed_tokens":
        spec = P("tp", None)  # vocab-parallel (see mesh.qwen3_param_pspecs)
    else:  # norm
        spec = P(*([None] * ndim))
    return NamedSharding(mesh, spec)


def _place(x: jax.Array, name: str, mesh, leaf_key=None) -> jax.Array:
    sh = _sharding_for(name, x.ndim, mesh, leaf_key=leaf_key)
    return jax.device_put(x, sh) if sh is not None else x


def load_qwen3_params(
    model_dir: str,
    config: Optional[Qwen3Config] = None,
    dtype: jnp.dtype = jnp.bfloat16,
    mesh=None,
) -> Dict[str, Any]:
    """Load a Qwen3 HF checkpoint directory into our stacked-layer pytree.

    ``mesh``: place each tensor with its tensor-parallel NamedSharding as it
    loads — no single device ever holds a replicated copy of a sharded
    weight. If the directory carries an offline quantized artifact
    (``quant_config.json`` + ``quantized.safetensors``), it is loaded
    directly instead of the bf16 checkpoint.
    """
    if os.path.exists(os.path.join(model_dir, "quant_config.json")):
        return load_quantized_checkpoint(model_dir, mesh=mesh)
    if config is None:
        config = Qwen3Config.from_hf_dir(model_dir)
    L = config.num_hidden_layers
    reader = _ShardReader(model_dir)

    def get(name: str, pname: str, transpose: bool = False) -> jax.Array:
        t = _to_jnp(reader.get(name), dtype)
        return _place(t.T if transpose else t, pname, mesh)

    def stack(fmt: str, pname: str, transpose: bool = False) -> jax.Array:
        arrs = [
            np.ascontiguousarray(reader.get(fmt.format(i)).T)
            if transpose else reader.get(fmt.format(i))
            for i in range(L)
        ]
        stacked = _to_jnp(np.stack(arrs), dtype)
        return _place(stacked, pname, mesh)

    params: Dict[str, Any] = {
        "embed_tokens": get("model.embed_tokens.weight", "embed_tokens"),
        "layers": {
            "input_layernorm": stack(
                "model.layers.{}.input_layernorm.weight", "input_layernorm"
            ),
            # q/k/v/down stay in torch's native [out, in] (TRANSPOSED_PROJS)
            "q_proj": stack("model.layers.{}.self_attn.q_proj.weight", "q_proj"),
            "k_proj": stack("model.layers.{}.self_attn.k_proj.weight", "k_proj"),
            "v_proj": stack("model.layers.{}.self_attn.v_proj.weight", "v_proj"),
            "q_norm": stack("model.layers.{}.self_attn.q_norm.weight", "q_norm"),
            "k_norm": stack("model.layers.{}.self_attn.k_norm.weight", "k_norm"),
            "o_proj": stack(
                "model.layers.{}.self_attn.o_proj.weight", "o_proj", transpose=True
            ),
            "post_attention_layernorm": stack(
                "model.layers.{}.post_attention_layernorm.weight",
                "post_attention_layernorm",
            ),
            "gate_proj": stack(
                "model.layers.{}.mlp.gate_proj.weight", "gate_proj", transpose=True
            ),
            "up_proj": stack(
                "model.layers.{}.mlp.up_proj.weight", "up_proj", transpose=True
            ),
            "down_proj": stack("model.layers.{}.mlp.down_proj.weight", "down_proj"),
        },
        "norm": get("model.norm.weight", "norm"),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight", "lm_head", transpose=True)
    return params


# --------------------------------------------------------------------------
# Offline quantized artifacts (SURVEY.md §5.4 rebuild note)
# --------------------------------------------------------------------------


def save_quantized_checkpoint(
    model_dir: str,
    out_dir: str,
    bits: str = "int4",
    group_size: int = 128,
    config: Optional[Qwen3Config] = None,
    params: Optional[Dict[str, Any]] = None,
) -> str:
    """Quantize a bf16 checkpoint offline and write the artifact:
    ``quantized.safetensors`` (flattened pytree; packed nibbles for int4) +
    ``quant_config.json`` + a copy of ``config.json``.

    ``python -m nano_vllm_candle_tpu.quantize`` is the CLI wrapper.
    """
    from safetensors.numpy import save_file

    from nano_vllm_candle_tpu.layers.linear import quantize_qwen3_params

    if config is None:
        config = Qwen3Config.from_hf_dir(model_dir)
    if params is None:
        params = load_qwen3_params(model_dir, config, dtype=jnp.bfloat16)
    qparams = quantize_qwen3_params(params, bits=bits, group_size=group_size)

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(qparams)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            arr = arr.view(np.uint16)  # safetensors-numpy has no bf16
            key += "::bf16"
        flat[key] = arr
    os.makedirs(out_dir, exist_ok=True)
    save_file(flat, os.path.join(out_dir, "quantized.safetensors"))
    with open(os.path.join(out_dir, "quant_config.json"), "w") as f:
        json.dump({"bits": bits, "group_size": group_size}, f)
    src_cfg = os.path.join(model_dir, "config.json")
    if os.path.exists(src_cfg):
        with open(src_cfg) as fin, open(
            os.path.join(out_dir, "config.json"), "w"
        ) as fout:
            fout.write(fin.read())
    return out_dir


def load_quantized_checkpoint(art_dir: str, mesh=None) -> Dict[str, Any]:
    """Load an offline quantized artifact back into the parameter pytree,
    optionally placing each tensor with its target sharding."""
    from safetensors import safe_open

    params: Dict[str, Any] = {}
    with safe_open(
        os.path.join(art_dir, "quantized.safetensors"), framework="numpy"
    ) as f:
        for key in f.keys():
            arr = f.get_tensor(key)
            name = key
            if name.endswith("::bf16"):
                name = name[: -len("::bf16")]
                arr = jax.lax.bitcast_convert_type(
                    jnp.asarray(arr), jnp.bfloat16
                )
            parts = name.split("/")
            node = params
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            # sharding: layer params are named layers/<name>/<q|q4|s>
            pname = parts[1] if parts[0] == "layers" else parts[0]
            leaf_key = parts[-1] if parts[-1] in ("q", "q4", "s") else None
            node[parts[-1]] = _place(
                jnp.asarray(arr), pname, mesh, leaf_key=leaf_key
            )
    return params
