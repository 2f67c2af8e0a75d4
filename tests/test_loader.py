"""Checkpoint loading: sharded placement at load + offline quant artifacts.

Covers VERDICT r1 item 6: the loader must place each tensor with its target
sharding directly (no replicated intermediate — a 32B bf16 load cannot fit
one v5e chip otherwise) and support offline-quantized artifacts so INT4
serving never materializes bf16 weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_vllm_candle_tpu.config import Qwen3Config
from nano_vllm_candle_tpu.layers.linear import quantize_qwen3_params
from nano_vllm_candle_tpu.models import qwen3
from nano_vllm_candle_tpu.parallel.mesh import make_mesh
from nano_vllm_candle_tpu.utils.loader import (
    load_qwen3_params,
    save_quantized_checkpoint,
)
from tests.test_model_parity import TINY, make_hf_checkpoint


def _tiny_config():
    return Qwen3Config.from_hf_dict({**TINY, "tie_word_embeddings": False})


def test_quantized_artifact_roundtrip(tmp_path):
    """save -> load must reproduce on-the-fly quantization exactly."""
    make_hf_checkpoint(tmp_path, tie_word_embeddings=False)
    cfg = _tiny_config()
    params = load_qwen3_params(str(tmp_path), cfg, dtype=jnp.float32)
    art = tmp_path / "int4"
    save_quantized_checkpoint(
        str(tmp_path), str(art), bits="int4", group_size=16,
        config=cfg, params=params,
    )
    got = load_qwen3_params(str(art), cfg)  # auto-detects the artifact
    want = quantize_qwen3_params(params, bits="int4", group_size=16)

    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = {tuple(str(p) for p in path): leaf
              for path, leaf in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert len(flat_g) == len(flat_w)
    for path, leaf in flat_g:
        key = tuple(str(p) for p in path)
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(flat_w[key], np.float32),
            err_msg=str(key),
        )


def test_quantized_artifact_serves_equally(tmp_path):
    """A generation from the artifact matches on-the-fly quantization."""
    make_hf_checkpoint(tmp_path, tie_word_embeddings=True)
    cfg = Qwen3Config.from_hf_dict({**TINY, "tie_word_embeddings": True})
    art = tmp_path / "int8"
    save_quantized_checkpoint(
        str(tmp_path), str(art), bits="int8", group_size=16, config=cfg
    )
    qp_art = load_qwen3_params(str(art), cfg)
    qp_fly = quantize_qwen3_params(
        load_qwen3_params(str(tmp_path), cfg, dtype=jnp.bfloat16),
        bits="int8", group_size=16,
    )
    toks = jnp.asarray(np.arange(10) % cfg.vocab_size, jnp.int32)
    la = qwen3.forward_full(qp_art, toks, config=cfg)
    lf = qwen3.forward_full(qp_fly, toks, config=cfg)
    np.testing.assert_allclose(
        np.asarray(la, np.float32), np.asarray(lf, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sharded_placement_at_load(tmp_path):
    """mesh= places every tensor with its TP sharding: no device holds a
    full copy of a sharded weight."""
    make_hf_checkpoint(tmp_path, tie_word_embeddings=False)
    cfg = _tiny_config()
    mesh = make_mesh(tp=2)
    params = load_qwen3_params(str(tmp_path), cfg, mesh=mesh)

    q = params["layers"]["q_proj"]  # [L, out, in] col_t: out sharded
    L, out, hid = q.shape
    shard = q.addressable_shards[0]
    assert shard.data.shape == (L, out // 2, hid)
    lm = params["lm_head"]  # [in, vocab] vocab-sharded
    assert lm.addressable_shards[0].data.shape == (lm.shape[0], lm.shape[1] // 2)
    norm = params["norm"]  # replicated
    assert norm.addressable_shards[0].data.shape == norm.shape

    # numerics unchanged by placement
    plain = load_qwen3_params(str(tmp_path), cfg)
    toks = jnp.asarray(np.arange(8), jnp.int32)
    with mesh:
        ls = qwen3.forward_full(params, toks, config=cfg)
    lp = qwen3.forward_full(plain, toks, config=cfg)
    # bf16 partials are summed in a different (sharded) order
    np.testing.assert_allclose(
        np.asarray(ls, np.float32), np.asarray(lp, np.float32), atol=2e-2
    )


def test_sharded_quantized_artifact(tmp_path):
    """Quantized artifacts place their q/s tensors sharded too (the 32B
    INT4 multi-chip load path)."""
    make_hf_checkpoint(tmp_path, tie_word_embeddings=False)
    cfg = _tiny_config()
    art = tmp_path / "int8"
    save_quantized_checkpoint(
        str(tmp_path), str(art), bits="int8", group_size=16, config=cfg
    )
    mesh = make_mesh(tp=2)
    params = load_qwen3_params(str(art), cfg, mesh=mesh)
    qq = params["layers"]["q_proj"]["q"]  # [L, G, gs, out] col: out sharded
    assert qq.addressable_shards[0].data.shape[-1] == qq.shape[-1] // 2
    ss = params["layers"]["q_proj"]["s"]
    assert ss.addressable_shards[0].data.shape[-1] == ss.shape[-1] // 2
    dq = params["layers"]["down_proj"]["q"]  # row: groups sharded
    assert dq.addressable_shards[0].data.shape[1] == dq.shape[1] // 2
