"""Group-commit ring cache: ring-mode attention must match the direct path.

The ring impls ("pallas" on TPU, "xla_ring" its CPU-testable twin) stage
decode tokens in a tile-aligned ring and commit whole GROUP-token windows to
the paged cache (models/qwen3.py). These tests drive the full engine on CPU
in both modes and require identical greedy generations, across group
boundaries, page boundaries, prefix-cache hits and int8 KV.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
from nano_vllm_candle_tpu.llm import LLM
from nano_vllm_candle_tpu.models.qwen3 import GROUP
from nano_vllm_candle_tpu.sampling_params import SamplingParams

CFG = Qwen3Config.tiny(vocab_size=128)


def make_llm(attn_impl, *, kv_dtype="float32", block_size=32, prefix=False):
    eng = EngineConfig(
        max_num_seqs=4,
        max_num_batched_tokens=512,
        num_kvcache_blocks=40,
        kvcache_block_size=block_size,
        max_model_len=256,
        dtype="float32",
        kv_cache_dtype=kv_dtype,
        prefill_buckets=(64, 128, 256),
        use_pallas_kernels=False,
        enable_prefix_caching=prefix,
        attn_impl=attn_impl,
        decode_burst=4,
    )
    params = jax.random.normal(jax.random.key(7), ())  # placeholder to seed
    return LLM(config=CFG, engine_config=eng)


def gen(llm, prompts, max_tokens=40):
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens, ignore_eos=True)
    outs = llm.generate(prompts, sp)
    return [o.token_ids for o in outs]


PROMPTS = [
    list(range(3, 20)),          # 17 tokens: tail of 1 (17 = GROUP + 1)
    list(range(5, 5 + GROUP)),   # exactly one full group, empty tail
    [7, 8, 9],                   # tiny
    list(range(2, 2 + 45)),      # crosses pages (block 32) and groups
]


class TestRingMatchesDirect:
    def test_greedy_generation_identical(self):
        base = gen(make_llm("xla"), PROMPTS)
        ring = gen(make_llm("xla_ring"), PROMPTS)
        assert ring == base

    def test_crossing_many_group_boundaries(self):
        base = gen(make_llm("xla"), [PROMPTS[0]], max_tokens=3 * GROUP + 5)
        ring = gen(make_llm("xla_ring"), [PROMPTS[0]], max_tokens=3 * GROUP + 5)
        assert ring == base

    def test_int8_kv_committed_pages_match(self):
        """INT8: committed pages must hold identical quantized values in
        both modes (same per-vector quantization, batched per group in ring
        mode). Generations may legitimately diverge — ring mode reads the
        uncommitted tail at full precision instead of through int8."""
        prompt = list(range(3, 3 + 2 * GROUP))  # exactly two full groups
        base_llm = make_llm("xla", kv_dtype="int8")
        ring_llm = make_llm("xla_ring", kv_dtype="int8")
        base = gen(base_llm, [prompt], max_tokens=1)
        ring = gen(ring_llm, [prompt], max_tokens=1)
        assert ring == base  # single step after prefill: tail is 1 token
        bk = np.asarray(base_llm.model_runner.kv_cache.k)
        rk = np.asarray(ring_llm.model_runner.kv_cache.k)
        bs = np.asarray(base_llm.model_runner.kv_cache.k_scale)
        rs = np.asarray(ring_llm.model_runner.kv_cache.k_scale)
        # the prompt's two committed groups fill the first real pages
        npages = (2 * GROUP) // 32  # block_size=32 in make_llm
        np.testing.assert_array_equal(
            rk[:, 1 : 1 + npages], bk[:, 1 : 1 + npages]
        )
        np.testing.assert_allclose(
            rs[:, 1 : 1 + npages], bs[:, 1 : 1 + npages], rtol=1e-6
        )

    def test_with_prefix_caching(self):
        common = list(range(1, 1 + 2 * 32))  # two full (32-token) blocks
        prompts = [common + [60, 61], common + [70]]
        base = gen(make_llm("xla", prefix=True), prompts)
        ring = gen(make_llm("xla_ring", prefix=True), prompts)
        assert ring == base

    def test_block_size_must_be_group_multiple(self):
        with pytest.raises(ValueError, match="multiple of"):
            make_llm("xla_ring", block_size=24)


class TestPagedStatsTwin:
    """return_stats on the XLA twin: merging (paged, ring) parts must equal
    full attention — the flash combine identity."""

    def test_stats_combine_identity(self):
        from nano_vllm_candle_tpu.ops.attention import paged_decode_attention

        key = jax.random.key(0)
        B, nq, nkv, hd, ps, P, W = 3, 4, 2, 16, 16, 16, 4
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (B, nq, hd), jnp.float32)
        kc = jax.random.normal(ks[1], (P, nkv, ps, hd), jnp.float32)
        vc = jax.random.normal(ks[2], (P, nkv, ps, hd), jnp.float32)
        bt = jnp.asarray(
            np.stack([1 + 4 * b + np.arange(W) for b in range(B)]), jnp.int32
        )
        full_lens = jnp.asarray([37, 16, 0], jnp.int32)
        committed = (full_lens // GROUP) * GROUP

        ref = paged_decode_attention(q, kc, vc, bt, full_lens, 0.25)
        out1, m1, l1 = paged_decode_attention(
            q, kc, vc, bt, committed, 0.25, return_stats=True
        )

        # Rebuild the "ring" part from the cache tail directly.
        from nano_vllm_candle_tpu.models.qwen3 import (
            _combine_attention,
            _ring_attention,
        )

        g = nq // nkv
        ring_k = np.zeros((B, GROUP + 1, nkv, hd), np.float32)
        ring_v = np.zeros_like(ring_k)
        for b in range(B):
            for p in range(int(committed[b]), int(full_lens[b])):
                page = int(bt[b, p // ps])
                ring_k[b, p % GROUP] = np.asarray(kc[page, :, p % ps])
                ring_v[b, p % GROUP] = np.asarray(vc[page, :, p % ps])
        qg = q.reshape(B, nkv, g, hd)
        o2, m2, l2 = _ring_attention(
            qg, jnp.asarray(ring_k), jnp.asarray(ring_v),
            full_lens, committed, 0.25,
        )
        shp = (B, nkv, g)
        merged = _combine_attention(
            out1.reshape(*shp, hd), m1.reshape(shp), l1.reshape(shp),
            o2, m2, l2,
        ).reshape(B, nq, hd)
        # Active slots match the full reference; the len-0 slot differs by
        # design (plain softmax yields uniform-weight garbage there, the
        # stats path a clean zero).
        np.testing.assert_allclose(
            np.asarray(merged[:2]), np.asarray(ref[:2]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(merged[2]), 0.0)
