"""Pallas kernels vs their XLA reference twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_vllm_candle_tpu.ops.attention import paged_decode_attention
from nano_vllm_candle_tpu.kernels.paged_decode import pallas_paged_decode_attention


def make_case(B=4, nq=8, nkv=4, hd=128, ps=16, P=12, W=6, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(keys[0], (B, nq, hd), dtype)
    k_cache = jax.random.normal(keys[1], (P, nkv, ps, hd), dtype)
    v_cache = jax.random.normal(keys[2], (P, nkv, ps, hd), dtype)
    rng = np.random.default_rng(seed)
    # distinct valid pages per sequence (page 0 = null)
    block_tables = np.zeros((B, W), np.int32)
    seq_lens = np.zeros((B,), np.int32)
    for b in range(B):
        L = int(rng.integers(1, W * ps))
        seq_lens[b] = L
        nb = -(-L // ps)
        pages = rng.choice(np.arange(1, P), size=nb, replace=False)
        block_tables[b, :nb] = pages
    return q, k_cache, v_cache, jnp.asarray(block_tables), jnp.asarray(seq_lens)


class TestPagedDecodeKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_xla_reference(self, seed):
        q, k, v, bt, sl, = make_case(seed=seed)
        scale = q.shape[-1] ** -0.5
        ref = paged_decode_attention(q, k, v, bt, sl, scale)
        out = pallas_paged_decode_attention(q, k, v, bt, sl, scale, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_gqa_grouping(self):
        q, k, v, bt, sl = make_case(B=2, nq=16, nkv=2, hd=64, ps=8, P=8, W=4, seed=3)
        scale = 0.125
        ref = paged_decode_attention(q, k, v, bt, sl, scale)
        out = pallas_paged_decode_attention(q, k, v, bt, sl, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_inactive_slots_are_finite(self):
        """seq_len == 0 (padding slot) must produce zeros, not NaN."""
        q, k, v, bt, sl = make_case(B=3, seed=4)
        sl = sl.at[1].set(0)
        out = pallas_paged_decode_attention(q, k, v, bt, sl, q.shape[-1] ** -0.5,
                                            interpret=True)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)

    def test_single_token_context(self):
        q, k, v, bt, sl = make_case(B=2, seed=5)
        sl = jnp.asarray([1, 1], jnp.int32)
        scale = q.shape[-1] ** -0.5
        ref = paged_decode_attention(q, k, v, bt, sl, scale)
        out = pallas_paged_decode_attention(q, k, v, bt, sl, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_int8_kv_matches_xla_reference(self):
        q, k, v, bt, sl = make_case(seed=7)
        P_, nkv_, ps_ = k.shape[:3]
        ps_shape = (P_, ps_, nkv_)  # token-major scale planes [P, ps, nkv]
        keys = jax.random.split(jax.random.key(11), 2)
        kq = jnp.clip(jnp.round(k * 20), -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(v * 20), -127, 127).astype(jnp.int8)
        ks = jax.random.uniform(keys[0], ps_shape, jnp.float32, 0.01, 0.1)
        vs = jax.random.uniform(keys[1], ps_shape, jnp.float32, 0.01, 0.1)
        scale = q.shape[-1] ** -0.5
        ref = paged_decode_attention(q, kq, vq, bt, sl, scale, k_scale=ks, v_scale=vs)
        out = pallas_paged_decode_attention(
            q, kq, vq, bt, sl, scale, k_scale=ks, v_scale=vs, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_bf16_inputs(self):
        q, k, v, bt, sl = make_case(seed=6, dtype=jnp.bfloat16)
        scale = q.shape[-1] ** -0.5
        ref = paged_decode_attention(q, k, v, bt, sl, scale)
        out = pallas_paged_decode_attention(q, k, v, bt, sl, scale, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_return_stats_matches_twin(self):
        """(out, m, l) stats must match the XLA twin's — the contract the
        ring-combine path (models/qwen3) relies on."""
        q, k, v, bt, sl = make_case(seed=8)
        sl = sl.at[1].set(0)  # include an inactive slot: l must be 0 there
        scale = q.shape[-1] ** -0.5
        ref_o, ref_m, ref_l = paged_decode_attention(
            q, k, v, bt, sl, scale, return_stats=True
        )
        out, m, l = pallas_paged_decode_attention(
            q, k, v, bt, sl, scale, interpret=True, return_stats=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(l), np.asarray(ref_l), rtol=2e-5)
        np.testing.assert_array_equal(np.asarray(l[1]), 0.0)


from nano_vllm_candle_tpu.ops.attention import packed_prefill_attention
from nano_vllm_candle_tpu.kernels.flash_prefill import pallas_packed_prefill_attention


def make_packed_case(lens, T, nq=8, nkv=4, hd=64, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(keys[0], (T, nq, hd), dtype)
    k = jax.random.normal(keys[1], (T, nkv, hd), dtype)
    v = jax.random.normal(keys[2], (T, nkv, hd), dtype)
    seg = np.full((T,), -1, np.int32)
    pos = np.zeros((T,), np.int32)
    t = 0
    for i, L in enumerate(lens):
        seg[t : t + L] = i
        pos[t : t + L] = np.arange(L)
        t += L
    return q, k, v, jnp.asarray(seg), jnp.asarray(pos)


class TestFlashPrefillKernel:
    @pytest.mark.parametrize("lens,T", [([100, 80, 50], 256), ([256], 256), ([5, 3], 128)])
    def test_matches_xla_reference(self, lens, T):
        q, k, v, seg, pos = make_packed_case(lens, T)
        scale = q.shape[-1] ** -0.5
        ref = packed_prefill_attention(q, k, v, seg, pos, scale)
        out = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True
        )
        # compare only real (non-padding) tokens
        real = np.asarray(seg) >= 0
        np.testing.assert_allclose(
            np.asarray(out)[real], np.asarray(ref)[real], rtol=2e-5, atol=2e-5
        )

    def test_gqa_heavy_grouping(self):
        q, k, v, seg, pos = make_packed_case([120, 70], 256, nq=16, nkv=2, hd=32, seed=3)
        scale = 0.17
        ref = packed_prefill_attention(q, k, v, seg, pos, scale)
        out = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True
        )
        real = np.asarray(seg) >= 0
        np.testing.assert_allclose(
            np.asarray(out)[real], np.asarray(ref)[real], rtol=2e-5, atol=2e-5
        )

    def test_all_padding_finite(self):
        q, k, v, seg, pos = make_packed_case([], 128, seed=4)
        out = pallas_packed_prefill_attention(
            q, k, v, seg, pos, 0.125, block_q=64, block_k=64, interpret=True
        )
        assert np.all(np.isfinite(np.asarray(out)))

    def test_bf16(self):
        q, k, v, seg, pos = make_packed_case([200, 56], 256, seed=5, dtype=jnp.bfloat16)
        scale = q.shape[-1] ** -0.5
        ref = packed_prefill_attention(q, k, v, seg, pos, scale)
        out = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, interpret=True
        )
        real = np.asarray(seg) >= 0
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[real], np.asarray(ref, np.float32)[real],
            rtol=3e-2, atol=3e-2,
        )


# --------------------------------------------------------------------------
# Fused dequant+matmul kernel (kernels/quant_matmul.py)
# --------------------------------------------------------------------------

from nano_vllm_candle_tpu.kernels.quant_matmul import (  # noqa: E402
    pallas_quant_matmul,
    supported,
)
from nano_vllm_candle_tpu.layers.linear import (  # noqa: E402
    matmul as xla_matmul,
    quantize_weight,
)


class TestQuantMatmulKernel:
    @pytest.mark.parametrize("bits", ["int8", "int4"])
    @pytest.mark.parametrize("T", [8, 64])
    def test_matches_xla_reference(self, bits, T):
        keys = jax.random.split(jax.random.key(0), 2)
        d_in, out = 256, 384
        x = jax.random.normal(keys[0], (T, d_in), jnp.float32)
        w = jax.random.normal(keys[1], (d_in, out), jnp.float32) * 0.05
        qw = quantize_weight(w, bits, group_size=128)
        assert supported(qw, T)
        ref = xla_matmul(x, qw)
        got = pallas_quant_matmul(x, qw, interpret=True)
        # kernel dequantizes weights into x.dtype before the dot (the XLA
        # twin scales f32 partials) -- f32 x here makes them bit-comparable
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_single_group(self):
        """d_in == group_size: exactly one reduction step."""
        keys = jax.random.split(jax.random.key(1), 2)
        x = jax.random.normal(keys[0], (16, 128), jnp.float32)
        w = jax.random.normal(keys[1], (128, 256), jnp.float32)
        qw = quantize_weight(w, "int8", group_size=128)
        got = pallas_quant_matmul(x, qw, interpret=True)
        ref = xla_matmul(x, qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_unsupported_shape_falls_back(self):
        """Out dim not tileable to 128 -> supported() False; matmul(impl=
        "pallas") must still produce correct results via the XLA path."""
        keys = jax.random.split(jax.random.key(2), 2)
        x = jax.random.normal(keys[0], (8, 128), jnp.float32)
        w = jax.random.normal(keys[1], (128, 96), jnp.float32)
        qw = quantize_weight(w, "int8", group_size=128)
        assert not supported(qw, 8)
        got = xla_matmul(x, qw, impl="pallas")
        ref = xla_matmul(x, qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    def test_large_T_not_supported(self):
        """Prefill-sized T routes to the XLA path (kernel keeps x VMEM-
        resident, sized for decode batches only)."""
        w = jnp.ones((128, 256), jnp.float32)
        qw = quantize_weight(w, "int8", group_size=128)
        assert supported(qw, 256)
        assert not supported(qw, 1024)

    def test_accuracy_vs_dense(self):
        """Quantized matmul approximates the dense product (sanity that the
        kernel multiplies scales correctly, not just matches its twin)."""
        keys = jax.random.split(jax.random.key(3), 2)
        x = jax.random.normal(keys[0], (32, 256), jnp.float32)
        w = jax.random.normal(keys[1], (256, 128), jnp.float32) * 0.02
        qw = quantize_weight(w, "int8", group_size=128)
        got = pallas_quant_matmul(x, qw, interpret=True)
        dense = x @ w
        err = np.abs(np.asarray(got) - np.asarray(dense)).mean()
        scale = np.abs(np.asarray(dense)).mean()
        assert err < 0.02 * scale + 1e-3

    @pytest.mark.parametrize("bits", ["int8", "int4"])
    def test_stacked_layer_index(self, bits):
        """Stacked [L, ...] weights + runtime layer_index must match slicing
        the stack by hand (the scan-over-layers fast path)."""
        keys = jax.random.split(jax.random.key(5), 2)
        L, T, d_in, out = 3, 8, 256, 128
        x = jax.random.normal(keys[0], (T, d_in), jnp.float32)
        w = jax.random.normal(keys[1], (L, d_in, out), jnp.float32) * 0.05
        qw = quantize_weight(w, bits, group_size=128)
        assert supported(qw, T)
        for li in range(L):
            sliced = {k: v[li] for k, v in qw.items()}
            ref = xla_matmul(x, sliced)
            got = pallas_quant_matmul(
                x, qw, jnp.int32(li), interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
            )


# --------------------------------------------------------------------------
# Group-commit kernel (kernels/kv_commit.py)
# --------------------------------------------------------------------------

from nano_vllm_candle_tpu.kernels.kv_commit import pallas_commit_groups  # noqa: E402
from nano_vllm_candle_tpu.models.qwen3 import GROUP, _scatter_groups  # noqa: E402


class TestCommitKernel:
    def _case(self, quant=False, seed=0):
        L, P, nkv, ps, hd, N = 2, 6, 2, 2 * GROUP, 32, 3
        ks = jax.random.split(jax.random.key(seed), 4)
        kc = jax.random.normal(ks[0], (L, P, nkv, ps, hd), jnp.float32)
        vc = jax.random.normal(ks[1], (L, P, nkv, ps, hd), jnp.float32)
        ku = jax.random.normal(ks[2], (N, nkv, GROUP, hd), jnp.float32)
        vu = jax.random.normal(ks[3], (N, nkv, GROUP, hd), jnp.float32)
        pages = jnp.asarray([1, 0, 4], jnp.int32)  # window 1 -> null page
        offs = jnp.asarray([GROUP, 0, 0], jnp.int32)
        return kc, vc, ku, vu, pages, offs

    def test_matches_scatter(self):
        kc, vc, ku, vu, pages, offs = self._case()
        li = jnp.int32(1)
        got_k, got_v = pallas_commit_groups(
            kc, vc, ku, vu, li, pages, offs, interpret=True
        )
        li_col = jnp.full((3,), 1, jnp.int32)
        ref_k = _scatter_groups(kc, ku, li_col, pages, offs)
        ref_v = _scatter_groups(vc, vu, li_col, pages, offs)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

    def test_untouched_regions_preserved(self):
        kc, vc, ku, vu, pages, offs = self._case(seed=3)
        before = np.asarray(kc).copy()
        got_k, _ = pallas_commit_groups(
            kc, vc, ku, vu, jnp.int32(0), pages, offs, interpret=True
        )
        after = np.asarray(got_k)
        # layer 1 untouched entirely; page 2,3,5 of layer 0 untouched
        np.testing.assert_array_equal(after[1], before[1])
        for p in (2, 3, 5):
            np.testing.assert_array_equal(after[0, p], before[0, p])
        # window 2 landed at page 4 offset 0
        np.testing.assert_array_equal(
            after[0, 4, :, :GROUP], np.asarray(jnp.asarray(vu is not None and ku)[2])
        )

    def test_quantized_scales(self):
        kc, vc, ku, vu, pages, offs = self._case(seed=4)
        L, P, nkv, ps, hd = kc.shape
        kc8 = jnp.zeros((L, P, nkv, ps, hd), jnp.int8)
        vc8 = jnp.zeros_like(kc8)
        ksc = jnp.zeros((L, P, ps, nkv), jnp.float32)  # token-major
        vsc = jnp.zeros_like(ksc)
        ku8 = jnp.clip(jnp.round(ku * 10), -127, 127).astype(jnp.int8)
        vu8 = jnp.clip(jnp.round(vu * 10), -127, 127).astype(jnp.int8)
        ksu = jnp.abs(jax.random.normal(jax.random.key(9), (3, nkv, GROUP)))
        vsu = ksu * 2
        gk, gv, gks, gvs = pallas_commit_groups(
            kc8, vc8, ku8, vu8, jnp.int32(0), pages, offs,
            k_scale_cache=ksc, v_scale_cache=vsc,
            k_scale_upd=ksu, v_scale_upd=vsu, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(gk[0, 4, :, :GROUP]), np.asarray(ku8[2])
        )
        np.testing.assert_array_equal(
            np.asarray(gks[0, 4, :GROUP, :]), np.asarray(ksu[2]).T
        )


class TestDenseMatmulKernel:
    """Stacked plain-bf16 decode matmul (kernels/quant_matmul.py:
    pallas_dense_matmul) vs jnp.dot."""

    @pytest.mark.parametrize("transposed", [False, True])
    @pytest.mark.parametrize("T", [8, 64])
    def test_matches_xla(self, transposed, T):
        from nano_vllm_candle_tpu.kernels.quant_matmul import (
            dense_supported, pallas_dense_matmul)

        keys = jax.random.split(jax.random.key(0), 2)
        L, d_in, out = 3, 256, 384
        x = jax.random.normal(keys[0], (T, d_in), jnp.float32)
        shape = (L, out, d_in) if transposed else (L, d_in, out)
        w = jax.random.normal(keys[1], shape, jnp.float32) * 0.05
        assert dense_supported(w, T)
        for li in (0, 2):
            got = pallas_dense_matmul(
                x, w, jnp.int32(li), transposed=transposed, interpret=True)
            wl = w[li].T if transposed else w[li]
            ref = jnp.dot(x, wl, preferred_element_type=jnp.float32)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_matmul_routes_stacked_plain(self):
        """layers.linear.matmul with a stacked plain weight + layer_index
        must agree between impl='pallas' and impl='xla'."""
        from nano_vllm_candle_tpu.layers.linear import matmul

        keys = jax.random.split(jax.random.key(1), 2)
        x = jax.random.normal(keys[0], (8, 128), jnp.float32)
        w = jax.random.normal(keys[1], (2, 128, 256), jnp.float32)
        got = matmul(x, w, "xla", jnp.int32(1))
        ref = jnp.dot(x, w[1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
        wt = jnp.swapaxes(w, 1, 2)
        got_t = matmul(x, wt, "xla", jnp.int32(1), transposed=True)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref), rtol=1e-6)


class TestRingCommitKernel:
    """Fused ring-write + group-commit (kernels/kv_commit.pallas_ring_commit)
    vs the two-step XLA path (scatter ring write + _commit_decode_group)."""

    def _case(self, quant, seed=0):
        from nano_vllm_candle_tpu.models.qwen3 import GROUP

        L, P, B, nkv, ps, hd = 2, 6, 4, 2, 2 * GROUP, 32
        ks = jax.random.split(jax.random.key(seed), 6)
        rk = jax.random.normal(ks[0], (L, B, GROUP + 1, nkv, hd), jnp.float32)
        rv = jax.random.normal(ks[1], (L, B, GROUP + 1, nkv, hd), jnp.float32)
        new_k = jax.random.normal(ks[2], (B, nkv, hd), jnp.float32)
        new_v = jax.random.normal(ks[3], (B, nkv, hd), jnp.float32)
        if quant:
            kc = jnp.zeros((L, P, nkv, ps, hd), jnp.int8)
            vc = jnp.zeros_like(kc)
            kcs = jnp.zeros((L, P, ps, nkv), jnp.float32)
            vcs = jnp.zeros_like(kcs)
        else:
            kc = jax.random.normal(ks[4], (L, P, nkv, ps, hd), jnp.float32)
            vc = jax.random.normal(ks[5], (L, P, nkv, ps, hd), jnp.float32)
            kcs = vcs = None
        # slots: 0 flushes a full group, 1 mid-group, 2 inactive, 3 flushes
        n = jnp.asarray([2 * GROUP, GROUP + 3, 0, GROUP], jnp.int32)
        bt = jnp.asarray([[1, 2], [3, 3], [0, 0], [4, 5]], jnp.int32)
        return rk, rv, kc, vc, kcs, vcs, new_k, new_v, n, bt, ps

    def _xla_twin(self, rk, rv, kc, vc, kcs, vcs, new_k, new_v, n, bt, ps, li):
        from nano_vllm_candle_tpu.models.qwen3 import (
            GROUP, _commit_decode_group,
        )

        B = n.shape[0]
        positions = jnp.maximum(n - 1, 0)
        rslot = jnp.where(n > 0, positions % GROUP, GROUP)
        bidx = jnp.arange(B, dtype=jnp.int32)
        rk = rk.at[li, bidx, rslot].set(new_k, mode="drop")
        rv = rv.at[li, bidx, rslot].set(new_v, mode="drop")
        rk_l = rk[li]
        rv_l = rv[li]
        kc, vc, kcs, vcs = _commit_decode_group(
            kc, vc, kcs, vcs, rk_l, rv_l, li, n, bt, ps, use_kernel=False
        )
        return rk, rv, kc, vc, kcs, vcs

    @pytest.mark.parametrize("quant", [False, True])
    def test_matches_xla_twin(self, quant):
        from nano_vllm_candle_tpu.kernels.kv_commit import pallas_ring_commit
        from nano_vllm_candle_tpu.models.qwen3 import GROUP

        case = self._case(quant)
        rk, rv, kc, vc, kcs, vcs, new_k, new_v, n, bt, ps = case
        li = jnp.int32(1)
        positions = jnp.maximum(n - 1, 0)
        rslot = jnp.where(n > 0, positions % GROUP, GROUP)
        flush = (n > 0) & (n % GROUP == 0)
        start = jnp.maximum(n - GROUP, 0)
        page = jnp.take_along_axis(bt, (start // ps)[:, None], 1)[:, 0]
        pages = jnp.where(flush, page, 0)
        offs = jnp.where(flush, start % ps, 0)
        got = pallas_ring_commit(
            rk, rv, kc, vc, new_k, new_v, li, rslot, pages, offs,
            kcs, vcs, interpret=True,
        )
        ref = self._xla_twin(
            rk, rv, kc, vc, kcs, vcs, new_k, new_v, n, bt, ps, li
        )
        names = ["ring_k", "ring_v", "k_cache", "v_cache", "k_scale", "v_scale"]
        ref = [r for r in ref if r is not None]
        for g, r, name in zip(got, ref, names):
            if name.endswith("cache") and quant:
                # null-page garbage differs between impls; compare real pages
                np.testing.assert_array_equal(
                    np.asarray(g)[:, 1:], np.asarray(r)[:, 1:], err_msg=name
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-6,
                    err_msg=name,
                )


class TestRingFoldedDecodeAttention:
    """Paged decode with the ring tail folded into the kernel vs the XLA
    composition (paged stats + _ring_attention + _combine_attention)."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_xla_composition(self, seed):
        from nano_vllm_candle_tpu.models.qwen3 import (
            GROUP, _combine_attention, _ring_attention,
        )

        B, nq, nkv, hd, ps = 3, 8, 4, 128, 2 * GROUP
        q, kc, vc, bt, _ = make_case(
            B=B, nq=nq, nkv=nkv, hd=hd, ps=ps, P=8, W=3, seed=seed
        )
        keys = jax.random.split(jax.random.key(seed + 100), 2)
        rk = jax.random.normal(keys[0], (B, GROUP + 1, nkv, hd), jnp.float32)
        rv = jax.random.normal(keys[1], (B, GROUP + 1, nkv, hd), jnp.float32)
        # totals: mid-group tail, exactly-at-boundary (empty tail), inactive
        n = jnp.asarray([ps + 7, ps, 0], jnp.int32)[:B]
        committed = (n // GROUP) * GROUP
        scale = hd ** -0.5

        got = pallas_paged_decode_attention(
            q, kc, vc, bt, committed, scale,
            ring_k=rk[None], ring_v=rv[None], total_lens=n, interpret=True,
        )

        out1, m1, l1 = paged_decode_attention(
            q, kc, vc, bt, committed, scale, return_stats=True
        )
        g = nq // nkv
        qg = q.reshape(B, nkv, g, hd)
        out2_u, m2, l2 = _ring_attention(qg, rk, rv, n, committed, scale)
        shp = (B, nkv, g)
        ref = _combine_attention(
            out1.reshape(*shp, hd), m1.reshape(shp), l1.reshape(shp),
            out2_u, m2, l2,
        ).reshape(B, nq, hd)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
