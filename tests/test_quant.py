"""Quantization tests: weight-only INT8/INT4 and INT8 KV cache.

Accuracy gates (the WikiText-2 Δppl <= 0.1 criterion needs a real checkpoint
+ dataset, neither available offline — see evals/): these tests bound the
per-op and end-to-end logit error instead, plus exactness properties
(round-trip of already-quantized values).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
from nano_vllm_candle_tpu.layers.linear import (
    dequantize_weight,
    matmul,
    quantize_weight,
    quantize_qwen3_params,
)
from nano_vllm_candle_tpu.llm import LLM
from nano_vllm_candle_tpu.models import qwen3
from nano_vllm_candle_tpu.sampling_params import SamplingParams

CFG = Qwen3Config.tiny()


class TestQuantizeWeight:
    def test_int8_roundtrip_exact_for_grid_values(self):
        """Weights already on the int8 grid survive quantization exactly."""
        rng = np.random.default_rng(0)
        ints = rng.integers(-127, 128, size=(128, 16)).astype(np.float32)
        ints[0, :] = 127  # pin each group's amax to the grid edge
        w = jnp.asarray(ints / 127.0)
        qw = quantize_weight(w, "int8", group_size=128)
        back = dequantize_weight(qw, jnp.float32)
        np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-6)

    def test_int8_error_bound(self):
        w = jax.random.normal(jax.random.key(0), (256, 64), jnp.float32)
        qw = quantize_weight(w, "int8", group_size=128)
        back = dequantize_weight(qw, jnp.float32)
        err = np.abs(np.asarray(back - w))
        amax = np.abs(np.asarray(w)).max()
        assert err.max() <= amax / 127.0  # half-step bound per group

    def test_int4_dtype_and_shapes(self):
        w = jax.random.normal(jax.random.key(1), (2, 256, 64), jnp.float32)
        qw = quantize_weight(w, "int4", group_size=128)
        # nibble-packed: two 4-bit values per uint8 byte along the group axis
        assert qw["q4"].dtype == jnp.uint8
        assert qw["q4"].shape == (2, 2, 64, 64)
        assert qw["s"].shape == (2, 2, 64)

    def test_int4_pack_roundtrip(self):
        from nano_vllm_candle_tpu.layers.linear import _pack_nibbles, _unpack_nibbles

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.integers(-7, 8, size=(3, 128, 16)), jnp.int8)
        back = _unpack_nibbles(_pack_nibbles(q))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q))

    def test_matmul_int8_close_to_exact(self):
        x = jax.random.normal(jax.random.key(2), (4, 256), jnp.float32)
        w = jax.random.normal(jax.random.key(3), (256, 32), jnp.float32)
        exact = x @ w
        approx = matmul(x, quantize_weight(w, "int8", group_size=128))
        rel = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(np.asarray(exact))
        assert rel < 0.01, rel

    def test_matmul_int4_close(self):
        x = jax.random.normal(jax.random.key(4), (4, 256), jnp.float32)
        w = jax.random.normal(jax.random.key(5), (256, 32), jnp.float32)
        approx = matmul(x, quantize_weight(w, "int4", group_size=128))
        exact = x @ w
        rel = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(np.asarray(exact))
        assert rel < 0.12, rel

    def test_quantize_qwen3_params_structure(self):
        params = qwen3.init_params(CFG, jax.random.key(0), jnp.float32)
        qparams = quantize_qwen3_params(params, "int8", group_size=64)
        assert "q" in qparams["layers"]["q_proj"]
        # untouched: embeddings and norms
        assert isinstance(qparams["embed_tokens"], jax.Array)
        assert isinstance(qparams["layers"]["input_layernorm"], jax.Array)


@pytest.fixture(scope="module")
def tiny_params():
    return qwen3.init_params(CFG, jax.random.key(3), dtype=jnp.float32)


def make_llm(tiny_params, **eng_kw):
    defaults = dict(
        max_num_seqs=2,
        max_num_batched_tokens=128,
        num_kvcache_blocks=32,
        kvcache_block_size=8,
        max_model_len=128,
        dtype="float32",
        kv_cache_dtype="float32",
        prefill_buckets=(64, 128),
        use_pallas_kernels=False,
        decode_burst=4,
        quant_group_size=64,
    )
    defaults.update(eng_kw)
    return LLM(config=CFG, params=tiny_params, engine_config=EngineConfig(**defaults))


GREEDY = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
PROMPT = [5, 17, 42, 7, 9, 13]


class TestQuantizedEndToEnd:
    def test_int8_weights_generation_matches_fp(self, tiny_params):
        """A tiny random model is an easy target: int8 weight quantization
        should not change the greedy path."""
        fp = make_llm(tiny_params).generate([PROMPT], GREEDY)[0].token_ids
        q8 = make_llm(tiny_params, quantization="int8").generate([PROMPT], GREEDY)[0].token_ids
        assert q8 == fp

    def test_int4_weights_generation_runs(self, tiny_params):
        out = make_llm(tiny_params, quantization="int4").generate([PROMPT], GREEDY)
        assert len(out[0].token_ids) == 8

    def test_int8_kv_cache_generation_matches_fp(self, tiny_params):
        fp = make_llm(tiny_params).generate([PROMPT], GREEDY)[0].token_ids
        q = make_llm(tiny_params, kv_cache_dtype="int8").generate([PROMPT], GREEDY)[0].token_ids
        assert q == fp

    def test_int8_weights_plus_int8_kv(self, tiny_params):
        out = make_llm(
            tiny_params, quantization="int8", kv_cache_dtype="int8"
        ).generate([PROMPT], GREEDY)
        assert len(out[0].token_ids) == 8

    def test_quantized_logits_close(self, tiny_params):
        """Direct logit comparison, full-precision vs int8 weights."""
        qparams = quantize_qwen3_params(tiny_params, "int8", group_size=64)
        tokens = jnp.asarray(PROMPT, jnp.int32)
        fp = np.asarray(qwen3.forward_full(tiny_params, tokens, config=CFG))
        q8 = np.asarray(qwen3.forward_full(qparams, tokens, config=CFG))
        rel = np.linalg.norm(q8 - fp) / np.linalg.norm(fp)
        assert rel < 0.02, rel


class TestInt8LmHead:
    """The quantized logits head (layers/linear.quantize_lm_head,
    EngineConfig.lm_head_dtype) — the 311 MB/step tied-table re-read it
    halves is ~20% of the 0.6B bs8 device budget (BASELINE.md)."""

    def test_untied_argmax_parity(self, tiny_params):
        from nano_vllm_candle_tpu.layers.linear import quantize_lm_head

        qp = quantize_lm_head(tiny_params, group_size=64)
        assert isinstance(qp["lm_head"], dict)
        hidden = jax.random.normal(
            jax.random.key(7), (16, CFG.hidden_size), jnp.float32
        )
        fp = np.asarray(qwen3.compute_logits(tiny_params, hidden))
        q8 = np.asarray(qwen3.compute_logits(qp, hidden))
        # argmax agreement off-ties: a tiny random model has no exact ties
        np.testing.assert_array_equal(fp.argmax(-1), q8.argmax(-1))
        rel = np.linalg.norm(q8 - fp) / np.linalg.norm(fp)
        assert rel < 0.02, rel

    def test_tied_head_built_from_embedding(self):
        from nano_vllm_candle_tpu.layers.linear import quantize_lm_head

        cfg = Qwen3Config.tiny()
        cfg = Qwen3Config.from_hf_dict(
            {**{f.name: getattr(cfg, f.name)
                for f in __import__("dataclasses").fields(cfg)},
             "tie_word_embeddings": True}
        )
        params = qwen3.init_params(cfg, jax.random.key(5), dtype=jnp.float32)
        assert "lm_head" not in params
        qp = quantize_lm_head(params, group_size=64)
        assert isinstance(qp["lm_head"], dict)
        # embedding stays full precision for the gather
        assert isinstance(qp["embed_tokens"], jax.Array)
        hidden = jax.random.normal(
            jax.random.key(8), (8, cfg.hidden_size), jnp.float32
        )
        fp = np.asarray(qwen3.compute_logits(params, hidden))
        q8 = np.asarray(qwen3.compute_logits(qp, hidden))
        np.testing.assert_array_equal(fp.argmax(-1), q8.argmax(-1))

    def test_generation_matches_bf16_head(self, tiny_params):
        """Greedy generations with the int8 head (the default) match the
        bf16-head opt-out on a tiny random model."""
        q8 = make_llm(tiny_params).generate([PROMPT], GREEDY)[0].token_ids
        fp = make_llm(tiny_params, lm_head_dtype="bfloat16").generate(
            [PROMPT], GREEDY
        )[0].token_ids
        assert q8 == fp

    def test_int4_head_opt_in(self, tiny_params):
        """The int4 head (opt-in) generates and its logits stay close; its
        accuracy gate is the engine-path Δppl harness (test_evals)."""
        from nano_vllm_candle_tpu.layers.linear import quantize_lm_head

        out = make_llm(tiny_params, lm_head_dtype="int4").generate(
            [PROMPT], GREEDY
        )
        assert len(out[0].token_ids) == 8
        qp = quantize_lm_head(tiny_params, bits="int4", group_size=64)
        assert "q4" in qp["lm_head"]
        hidden = jax.random.normal(
            jax.random.key(9), (8, CFG.hidden_size), jnp.float32
        )
        fp = np.asarray(qwen3.compute_logits(tiny_params, hidden))
        q4 = np.asarray(qwen3.compute_logits(qp, hidden))
        rel = np.linalg.norm(q4 - fp) / np.linalg.norm(fp)
        # int4's half-step bound at group 64 lands ~0.10 relative on a
        # tiny random model (measured 0.102)
        assert rel < 0.12, rel

    def test_bad_head_dtype_rejected(self, tiny_params):
        with pytest.raises(ValueError, match="lm_head_dtype"):
            make_llm(tiny_params, lm_head_dtype="int2")
