"""Perplexity harness math checks (tiny random model; no dataset needed)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from evals.ppl import perplexity, token_nll
from nano_vllm_candle_tpu.config import Qwen3Config
from nano_vllm_candle_tpu.models import qwen3

CFG = Qwen3Config.tiny()


def direct_nll(params, tokens):
    logits = qwen3.forward_full(params, jnp.asarray(tokens, jnp.int32), config=CFG)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = [-float(logp[i, tokens[i + 1]]) for i in range(len(tokens) - 1)]
    return sum(nll) / len(nll)


def test_single_window_matches_direct():
    params = qwen3.init_params(CFG, jax.random.key(0), jnp.float32)
    tokens = list(np.random.default_rng(0).integers(0, CFG.vocab_size, 24))
    got = token_nll(params, CFG, tokens, window=64, stride=32)
    want = direct_nll(params, tokens)
    assert abs(got - want) < 1e-5


def test_strided_windows_cover_all_tokens_once():
    params = qwen3.init_params(CFG, jax.random.key(0), jnp.float32)
    tokens = list(np.random.default_rng(1).integers(0, CFG.vocab_size, 50))
    # window 16, stride 8: every target token scored exactly once
    got = token_nll(params, CFG, tokens, window=16, stride=8)
    assert math.isfinite(got) and got > 0


def test_perplexity_is_exp_of_nll_and_bounded():
    params = qwen3.init_params(CFG, jax.random.key(0), jnp.float32)
    tokens = list(np.random.default_rng(2).integers(0, CFG.vocab_size, 40))
    nll = token_nll(params, CFG, tokens)
    assert abs(perplexity(params, CFG, tokens) - math.exp(nll)) < 1e-6
    # a near-uniform random-init model can't beat ~uniform ppl by much, and
    # can't exceed the vocab-size bound by much either
    assert 1.0 < math.exp(nll) < CFG.vocab_size * 4


def test_compare_quantization_end_to_end(tmp_path):
    """Prove the Δppl gate harness end-to-end (VERDICT r1 item 7): fabricate
    a real HF safetensors checkpoint, run ``compare_quantization`` for int8
    and int4 on synthetic text via the byte-fallback tokenizer, and check
    the gate verdict machinery. Real WikiText-2 numbers require the dataset
    (zero-egress environment); this exercises every line of the same path.
    """
    from evals.ppl import compare_quantization
    from tests.test_model_parity import make_hf_checkpoint

    make_hf_checkpoint(tmp_path, tie_word_embeddings=False)
    text = ("the quick brown fox jumps over the lazy dog. " * 30).strip()
    (tmp_path / "synthetic.txt").write_text(text)

    results = {}
    for bits in ("int8", "int4"):
        r = compare_quantization(
            str(tmp_path), str(tmp_path / "synthetic.txt"), bits,
            group_size=16, limit_tokens=192, max_delta=0.5,
        )
        assert math.isfinite(r["ppl_bf16"]) and r["ppl_bf16"] > 1.0
        assert math.isfinite(r[f"ppl_{bits}"])
        assert r["delta"] == r[f"ppl_{bits}"] - r["ppl_bf16"]
        assert r["pass"] == (r["delta"] <= 0.5)
        assert r["num_tokens"] == 192
        results[bits] = r
    # int8 must sit closer to bf16 than int4 does on the same text (loose
    # sanity that quantization error, not noise, drives the delta)
    assert abs(results["int8"]["delta"]) <= abs(results["int4"]["delta"]) + 0.25
