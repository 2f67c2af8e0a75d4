"""Unit tests for ops, following the reference's hand-computed-golden style
(``layernorm.rs:63-122``, ``activation.rs:20-37``, ``rotary_embedding.rs:110-138``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_vllm_candle_tpu.ops import (
    apply_rope,
    build_rope_table,
    head_rms_norm,
    packed_prefill_attention,
    paged_decode_attention,
    rms_norm,
    sample_tokens,
    silu_and_mul,
)


class TestRMSNorm:
    def test_hand_computed(self):
        # x = [1, 2, 3], w = [1, 1, 1]: rms = sqrt(14/3)
        x = jnp.array([[1.0, 2.0, 3.0]], jnp.float32)
        w = jnp.ones((3,), jnp.float32)
        out, res = rms_norm(x, w, eps=0.0)
        rms = np.sqrt(14.0 / 3.0)
        np.testing.assert_allclose(out[0], np.array([1, 2, 3]) / rms, rtol=1e-6)
        np.testing.assert_allclose(res, x, rtol=0)

    def test_weight_scaling(self):
        x = jnp.array([[2.0, -2.0]], jnp.float32)
        w = jnp.array([0.5, 2.0], jnp.float32)
        out, _ = rms_norm(x, w, eps=0.0)
        # rms = 2 -> normalized = [1, -1] -> scaled = [0.5, -2]
        np.testing.assert_allclose(out[0], [0.5, -2.0], rtol=1e-6)

    def test_residual_fusion(self):
        """Residual contract: new_residual = x + residual, norm over the sum
        (layernorm.rs:92-109 semantics)."""
        x = jnp.array([[1.0, 1.0]], jnp.float32)
        r = jnp.array([[1.0, 3.0]], jnp.float32)
        w = jnp.ones((2,), jnp.float32)
        out, new_res = rms_norm(x, w, eps=0.0, residual=r)
        np.testing.assert_allclose(new_res, [[2.0, 4.0]], rtol=1e-6)
        expected, _ = rms_norm(jnp.array([[2.0, 4.0]]), w, eps=0.0)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_dtype_preserved(self):
        x = jnp.ones((4, 8), jnp.bfloat16)
        w = jnp.ones((8,), jnp.bfloat16)
        out, res = rms_norm(x, w)
        assert out.dtype == jnp.bfloat16 and res.dtype == jnp.bfloat16

    def test_head_rms_norm_matches_flat(self):
        x = jax.random.normal(jax.random.key(0), (5, 3, 8), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (8,)) + 1.0
        out = head_rms_norm(x, w, eps=1e-6)
        ref, _ = rms_norm(x.reshape(15, 8), w, eps=1e-6)
        np.testing.assert_allclose(out.reshape(15, 8), ref, rtol=1e-5)


class TestSiluAndMul:
    def test_closed_form(self):
        # silu(1) * 2 = (1/(1+e^-1)) * 2, silu(-1) * 3
        x = jnp.array([[1.0, -1.0, 2.0, 3.0]], jnp.float32)
        out = silu_and_mul(x)
        silu = lambda v: v / (1 + np.exp(-v))
        np.testing.assert_allclose(
            out[0], [silu(1.0) * 2.0, silu(-1.0) * 3.0], rtol=1e-6
        )


class TestRotary:
    def test_norm_preserved(self):
        """Rotation invariance (rotary_embedding.rs:110-138)."""
        cos, sin = build_rope_table(16, 128, theta=10_000.0)
        q = jax.random.normal(jax.random.key(0), (10, 4, 16))
        k = jax.random.normal(jax.random.key(1), (10, 2, 16))
        pos = jnp.arange(10, dtype=jnp.int32) * 3
        q2, k2 = apply_rope(q, k, pos, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(q2, axis=-1), jnp.linalg.norm(q, axis=-1), rtol=1e-5
        )
        np.testing.assert_allclose(
            jnp.linalg.norm(k2, axis=-1), jnp.linalg.norm(k, axis=-1), rtol=1e-5
        )

    def test_position_zero_identity(self):
        cos, sin = build_rope_table(16, 8)
        q = jax.random.normal(jax.random.key(0), (1, 1, 16))
        q2, _ = apply_rope(q, q, jnp.zeros((1,), jnp.int32), cos, sin)
        np.testing.assert_allclose(q2, q, rtol=1e-6)

    def test_positions_distinct(self):
        cos, sin = build_rope_table(16, 64)
        q = jnp.ones((2, 1, 16))
        pos = jnp.array([3, 7], jnp.int32)
        q2, _ = apply_rope(q, q, pos, cos, sin)
        assert not np.allclose(q2[0], q2[1])

    def test_matches_hf_rotate_half(self):
        """Our half-split == HF's rotate_half with duplicated cos/sin."""
        hd = 8
        cos, sin = build_rope_table(hd, 32)
        x = jax.random.normal(jax.random.key(2), (4, 2, hd))
        pos = jnp.array([0, 1, 5, 9], jnp.int32)
        ours, _ = apply_rope(x, x, pos, cos, sin)
        cos_full = jnp.concatenate([cos[pos], cos[pos]], -1)[:, None, :]
        sin_full = jnp.concatenate([sin[pos], sin[pos]], -1)[:, None, :]
        x1, x2 = jnp.split(x, 2, axis=-1)
        rot = jnp.concatenate([-x2, x1], axis=-1)
        hf = x * cos_full + rot * sin_full
        np.testing.assert_allclose(ours, hf, rtol=1e-5, atol=1e-6)


class TestPackedPrefillAttention:
    def test_two_segments_match_independent(self):
        """Packed two-sequence attention == each sequence attended alone."""
        key = jax.random.key(0)
        hd, nq, nkv = 8, 4, 2
        lens = [5, 3]
        T = sum(lens) + 2  # plus padding
        qkv_key = jax.random.split(key, 3)
        q = jax.random.normal(qkv_key[0], (T, nq, hd), jnp.float32)
        k = jax.random.normal(qkv_key[1], (T, nkv, hd), jnp.float32)
        v = jax.random.normal(qkv_key[2], (T, nkv, hd), jnp.float32)
        seg = jnp.array([0] * 5 + [1] * 3 + [-1] * 2, jnp.int32)
        pos = jnp.array(list(range(5)) + list(range(3)) + [0, 0], jnp.int32)
        scale = hd**-0.5

        out = packed_prefill_attention(q, k, v, seg, pos, scale)

        start = 0
        for L in lens:
            sl = slice(start, start + L)
            causal = np.tril(np.ones((L, L), bool))
            ref = np.zeros((L, nq, hd), np.float32)
            g = nq // nkv
            for h in range(nq):
                kh = h // g
                s = (np.asarray(q[sl, h]) @ np.asarray(k[sl, kh]).T) * scale
                s = np.where(causal, s, -1e30)
                w = np.exp(s - s.max(-1, keepdims=True))
                w /= w.sum(-1, keepdims=True)
                ref[:, h] = w @ np.asarray(v[sl, kh])
            np.testing.assert_allclose(np.asarray(out[sl]), ref, rtol=2e-5, atol=2e-5)
            start += L

    def test_padding_is_finite(self):
        q = jnp.ones((4, 2, 8))
        k = jnp.ones((4, 1, 8))
        v = jnp.ones((4, 1, 8))
        seg = jnp.array([-1, -1, -1, -1], jnp.int32)
        pos = jnp.zeros((4,), jnp.int32)
        out = packed_prefill_attention(q, k, v, seg, pos, 0.35)
        assert np.all(np.isfinite(np.asarray(out)))


class TestPagedDecodeAttention:
    def test_matches_dense(self):
        """Paged gather attention == dense attention over the context."""
        key = jax.random.key(1)
        B, nq, nkv, hd, ps, P = 2, 4, 2, 8, 4, 8
        seq_lens = jnp.array([7, 3], jnp.int32)
        block_tables = jnp.array([[2, 5, 0], [1, 0, 0]], jnp.int32)
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (B, nq, hd), jnp.float32)
        kv_cache = jax.random.normal(ks[1], (P, 2, nkv, ps, hd), jnp.float32)
        scale = hd**-0.5

        out = paged_decode_attention(q, kv_cache, block_tables, seq_lens, scale)

        g = nq // nkv
        for b in range(B):
            L = int(seq_lens[b])
            pages = [int(p) for p in block_tables[b]]
            # pages are head-major [nkv, ps, hd] -> token-major [ps, nkv, hd]
            k_seq = np.concatenate(
                [np.asarray(kv_cache[p, 0]).transpose(1, 0, 2) for p in pages], axis=0
            )[:L]
            v_seq = np.concatenate(
                [np.asarray(kv_cache[p, 1]).transpose(1, 0, 2) for p in pages], axis=0
            )[:L]
            for h in range(nq):
                kh = h // g
                s = (np.asarray(q[b, h]) @ k_seq[:, kh].T) * scale
                w = np.exp(s - s.max())
                w /= w.sum()
                ref = w @ v_seq[:, kh]
                np.testing.assert_allclose(np.asarray(out[b, h]), ref, rtol=2e-5, atol=2e-5)


class TestSampling:
    def _vecs(self, B, temp=1.0, top_k=0, top_p=1.0):
        return (
            jnp.full((B,), temp, jnp.float32),
            jnp.full((B,), top_k, jnp.int32),
            jnp.full((B,), top_p, jnp.float32),
        )

    def test_greedy(self):
        logits = jnp.array([[0.1, 5.0, -1.0], [2.0, 0.0, 1.9]], jnp.float32)
        t, k, p = self._vecs(2, temp=0.0)
        out = sample_tokens(jax.random.key(0), logits, t, k, p, max_top_k=2)
        np.testing.assert_array_equal(np.asarray(out), [1, 0])

    def test_temperature_sampling_distribution(self):
        logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]], jnp.float32))
        t, k, p = self._vecs(1, temp=1.0)
        counts = np.zeros(3)
        for i in range(300):
            out = sample_tokens(jax.random.key(i), logits, t, k, p)
            counts[int(out[0])] += 1
        assert counts[0] > 150  # ~0.7 * 300
        assert counts.argmax() == 0

    def test_top_k_restricts(self):
        logits = jnp.array([[3.0, 2.0, 1.0, 0.0]], jnp.float32)
        t, k, p = self._vecs(1, temp=1.0, top_k=2)
        for i in range(50):
            out = sample_tokens(jax.random.key(i), logits, t, k, p, max_top_k=4)
            assert int(out[0]) in (0, 1)

    def test_top_p_restricts(self):
        # probs ~ [0.97, 0.01, ...] -> top_p=0.5 keeps only token 0
        logits = jnp.array([[8.0, 3.0, 2.0, 1.0]], jnp.float32)
        t, k, p = self._vecs(1, temp=1.0, top_p=0.5)
        for i in range(50):
            out = sample_tokens(jax.random.key(i), logits, t, k, p)
            assert int(out[0]) == 0

    def test_greedy_only_matches_general_path(self):
        logits = jnp.array([[0.1, 5.0, -1.0], [2.0, 0.0, 1.9]], jnp.float32)
        t, k, p = self._vecs(2, temp=0.0)
        fast = sample_tokens(
            jax.random.key(0), logits, t, k, p, greedy_only=True
        )
        slow = sample_tokens(jax.random.key(0), logits, t, k, p)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))

    def test_mixed_greedy_and_sampled(self):
        logits = jnp.array([[0.0, 4.0], [4.0, 0.0]], jnp.float32)
        t = jnp.array([0.0, 1.0], jnp.float32)
        k = jnp.zeros((2,), jnp.int32)
        p = jnp.ones((2,), jnp.float32)
        out = sample_tokens(jax.random.key(0), logits, t, k, p)
        assert int(out[0]) == 1  # greedy row


class TestTopPBoundedCandidates:
    def test_threshold_exact_within_candidates(self):
        """Bounded top-p == full-sort top-p whenever the nucleus fits in the
        candidate set (the practical case)."""
        from nano_vllm_candle_tpu.ops.sampling import NEG_INF, _apply_top_p

        rng = np.random.default_rng(0)
        # Peaked logits (scale 5): the 0.9-nucleus spans a few dozen tokens,
        # well within the 256-candidate bound — the realistic LM regime.
        logits = jnp.asarray((rng.normal(size=(3, 5000)) * 5).astype(np.float32))
        top_p = jnp.asarray([0.3, 0.9, 1.0], jnp.float32)
        got = np.asarray(_apply_top_p(logits, top_p))

        # full-sort reference
        ln = np.asarray(logits)
        ref = ln.copy()
        for b, p in enumerate([0.3, 0.9, 1.0]):
            if p >= 1.0:
                continue
            order = np.argsort(-ln[b])
            probs = np.exp(ln[b] - ln[b].max())
            probs /= probs.sum()
            cum = np.cumsum(probs[order])
            keep_sorted = (cum - probs[order]) < p
            thresh = ln[b][order][keep_sorted].min()
            ref[b][ln[b] < thresh] = float(NEG_INF)
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_degrades_to_top_candidates_never_looser(self):
        """A nucleus wider than the candidate bound keeps at most
        TOP_P_CANDIDATES tokens (tighter, never looser)."""
        from nano_vllm_candle_tpu.ops.sampling import (
            NEG_INF, TOP_P_CANDIDATES, _apply_top_p,
        )

        V = 2048
        # near-flat but strictly distinct logits: the 0.999-nucleus would
        # span ~all of V under a full sort
        logits = -jnp.arange(V, dtype=jnp.float32)[None, :] * 1e-3
        got = np.asarray(_apply_top_p(logits, jnp.asarray([0.999], jnp.float32)))
        kept = (got[0] > float(NEG_INF) / 2).sum()
        assert kept <= TOP_P_CANDIDATES
        assert kept >= 1
