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
