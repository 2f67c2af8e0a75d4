"""Pallas kernels vs their XLA reference twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_vllm_candle_tpu.models import qwen3
from nano_vllm_candle_tpu.ops.attention import paged_decode_attention
from nano_vllm_candle_tpu.kernels.paged_decode import pallas_paged_decode_attention


def make_case(B=4, nq=8, nkv=4, hd=128, ps=16, P=24, W=6, seed=0,
              dtype=jnp.float32):
    """Combined-cache decode case. Pages are globally unique per sequence
    (writes would otherwise collide) and block-table rows are padded by
    repeating the last valid page (the kernel's index-map contract)."""
    keys = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(keys[0], (B, nq, hd), dtype)
    kv_cache = jax.random.normal(keys[1], (P, 2, nkv, ps, hd), dtype)
    new_k = jax.random.normal(keys[2], (B, nkv, hd), dtype)
    new_v = jax.random.normal(keys[3], (B, nkv, hd), dtype)
    rng = np.random.default_rng(seed)
    block_tables = np.zeros((B, W), np.int32)
    seq_lens = np.zeros((B,), np.int32)
    free = list(rng.permutation(np.arange(1, P)))
    for b in range(B):
        L = int(rng.integers(1, W * ps))
        seq_lens[b] = L
        nb = -(-L // ps)
        pages = [free.pop() for _ in range(nb)]
        block_tables[b, :nb] = pages
        block_tables[b, nb:] = pages[-1]
    return (q, kv_cache, jnp.asarray(block_tables), jnp.asarray(seq_lens),
            new_k, new_v)


def twin_with_current_rows(q, kv_cache, bt, sl, new_k, new_v, scale,
                           kv_scale=None):
    """XLA twin of the fold-new kernel: write each slot's current row into
    its page (slot of position sl-1), then attend over the cache."""
    B = q.shape[0]
    ps = kv_cache.shape[-2]
    btn = np.asarray(bt)
    sln = np.asarray(sl)
    slots = np.zeros((B,), np.int32)
    for b in range(B):
        n = int(sln[b])
        t = max(n - 1, 0)
        slots[b] = btn[b, t // ps] * ps + t % ps if n > 0 else 0
    kv_w, kvs_w = qwen3._write_kv(
        kv_cache[None], None if kv_scale is None else kv_scale[None],
        new_k, new_v, jnp.asarray(slots), jnp.int32(0),
    )
    return paged_decode_attention(
        q, kv_w[0], bt, sl, scale,
        kv_scale=None if kvs_w is None else kvs_w[0],
    )


class TestPagedDecodeKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_xla_reference(self, seed):
        q, kvc, bt, sl, nk, nv = make_case(seed=seed)
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_gqa_grouping(self):
        q, kvc, bt, sl, nk, nv = make_case(
            B=2, nq=16, nkv=2, hd=64, ps=8, P=16, W=4, seed=3
        )
        scale = 0.125
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_inactive_slots_are_finite(self):
        """seq_len == 0 (padding slot) must produce zeros, not NaN."""
        q, kvc, bt, sl, nk, nv = make_case(B=3, seed=4)
        sl = sl.at[1].set(0)
        bt = bt.at[1].set(0)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, q.shape[-1] ** -0.5, nk, nv, interpret=True
        )
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)

    def test_single_token_context(self):
        """seq_len == 1: the whole context is the folded current token."""
        q, kvc, bt, sl, nk, nv = make_case(B=2, seed=5)
        sl = jnp.asarray([1, 1], jnp.int32)
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_int8_kv_matches_xla_reference(self):
        q, kvc, bt, sl, nk, nv = make_case(seed=7)
        P_, _, nkv_, ps_, _ = kvc.shape
        kq = jnp.clip(jnp.round(kvc * 20), -127, 127).astype(jnp.int8)
        # head-major scale planes [P, 2, nkv, ps]
        s = jax.random.uniform(
            jax.random.key(11), (P_, 2, nkv_, ps_), jnp.float32, 0.01, 0.1
        )
        scale = q.shape[-1] ** -0.5
        # Twin reads the current row back quantized; feed it rows that are
        # exactly representable so both paths agree bitwise.
        ref = paged_decode_attention(
            q, kq, bt, jnp.maximum(sl - 1, 0) + (sl > 0), scale, kv_scale=s
        )
        # For the kernel, pages hold [0, sl-1) and the current token is the
        # dequantized row the twin reads from its page.
        btn, sln = np.asarray(bt), np.asarray(sl)
        kqn, sn = np.asarray(kq), np.asarray(s)
        nk2 = np.zeros_like(np.asarray(nk))
        nv2 = np.zeros_like(np.asarray(nv))
        for b in range(q.shape[0]):
            t = int(sln[b]) - 1
            pg = btn[b, t // ps_]
            nk2[b] = (kqn[pg, 0, :, t % ps_].astype(np.float32)
                      * sn[pg, 0, :, t % ps_][:, None])
            nv2[b] = (kqn[pg, 1, :, t % ps_].astype(np.float32)
                      * sn[pg, 1, :, t % ps_][:, None])
        out = pallas_paged_decode_attention(
            q, kq, bt, sl, scale, jnp.asarray(nk2), jnp.asarray(nv2),
            kv_scale=s, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("B", [8, 16])
    def test_grouped_kernel_matches_xla_reference(self, B):
        """B divisible by SEQ_BLOCK routes to the grouped manual-DMA kernel
        (one grid step per 8 sequences, in-kernel double-buffered page
        DMAs); must match the XLA twin exactly like the per-page kernel."""
        q, kvc, bt, sl, nk, nv = make_case(B=B, P=8 * B, seed=9)
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True,
            force_grouped=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_grouped_kernel_inactive_and_short(self):
        """Grouped path: inactive slots (len 0) stay zero/finite and a
        single-token sequence (whole context = folded row) matches."""
        q, kvc, bt, sl, nk, nv = make_case(B=8, P=64, seed=10)
        sl = sl.at[3].set(0)
        bt = bt.at[3].set(0)
        sl = sl.at[5].set(1)
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True,
            force_grouped=True,
        )
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out[3]), 0.0)
        # The twin helper has no inactive-slot contract (it writes the
        # current row into the null page); compare active slots only.
        active = [b for b in range(8) if b != 3]
        np.testing.assert_allclose(
            np.asarray(out)[active], np.asarray(ref)[active],
            rtol=2e-5, atol=2e-5,
        )

    def test_grouped_kernel_chunked_page_walk(self):
        """W wider than MAX_GROUPED_W walks multiple page-chunk grid steps
        (softmax state persists across chunks) and still matches the twin.
        W=24 also exercises the repeat-last-page table padding to a chunk
        multiple."""
        from nano_vllm_candle_tpu.kernels import paged_decode as pd

        q, kvc, bt, sl, nk, nv = make_case(
            B=8, W=24, ps=8, P=256, seed=21
        )
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True,
            force_grouped=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("B", [4, 12])
    def test_grouped_kernel_batch_padding(self, B):
        """B not a SEQ_BLOCK multiple is padded with inactive rows; the
        sliced output matches the twin on the real rows."""
        q, kvc, bt, sl, nk, nv = make_case(B=B, P=8 * B + 8, seed=22)
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True,
            force_grouped=True,
        )
        assert out.shape == q.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_grouped_kernel_int8_kv(self):
        q, kvc, bt, sl, nk, nv = make_case(B=8, P=64, seed=11)
        P_, _, nkv_, ps_, _ = kvc.shape
        kq = jnp.clip(jnp.round(kvc * 20), -127, 127).astype(jnp.int8)
        s = jax.random.uniform(
            jax.random.key(12), (P_, 2, nkv_, ps_), jnp.float32, 0.01, 0.1
        )
        scale = q.shape[-1] ** -0.5
        ref = paged_decode_attention(
            q, kq, bt, jnp.maximum(sl - 1, 0) + (sl > 0), scale, kv_scale=s
        )
        btn, sln = np.asarray(bt), np.asarray(sl)
        kqn, sn = np.asarray(kq), np.asarray(s)
        nk2 = np.zeros_like(np.asarray(nk))
        nv2 = np.zeros_like(np.asarray(nv))
        for b in range(q.shape[0]):
            t = int(sln[b]) - 1
            pg = btn[b, t // ps_]
            nk2[b] = (kqn[pg, 0, :, t % ps_].astype(np.float32)
                      * sn[pg, 0, :, t % ps_][:, None])
            nv2[b] = (kqn[pg, 1, :, t % ps_].astype(np.float32)
                      * sn[pg, 1, :, t % ps_][:, None])
        out = pallas_paged_decode_attention(
            q, kq, bt, sl, scale, jnp.asarray(nk2), jnp.asarray(nv2),
            kv_scale=s, interpret=True, force_grouped=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("tail", [1, 63, 64, 65, 128])
    def test_grouped_kernel_float_subpage_tail_fetch(self, tail):
        """ps=128 FLOAT pages: the round-5 extension of the sub-page tail
        fetch to non-int8 caches — V's masked rows are zeroed in-kernel so
        NaN bit patterns in un-DMA'd scratch can't poison p@V. Parity vs
        the XLA twin at the quarter boundaries."""
        ps = 128
        q, kvc, bt, sl, nk, nv = make_case(B=8, ps=ps, P=24, W=2, seed=27)
        # Override lengths to pin the tail quarter AND rebuild every row
        # with 2 DISTINCT pages: make_case sized tables for its own random
        # lengths, and a repeat-padded 1-page row would make the twin's
        # current-token write land on a live row of the same page.
        sln = np.asarray(sl).copy()
        btn = np.asarray(bt).copy()
        for b in range(8):
            sln[b] = (ps if b % 2 else 0) + tail
            btn[b] = [1 + 2 * b, 2 + 2 * b]
        sl, bt = jnp.asarray(sln), jnp.asarray(btn)
        scale = q.shape[-1] ** -0.5
        from nano_vllm_candle_tpu.kernels import paged_decode as pd

        assert pd._subpage_tail_supported(ps, kvc.dtype)
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True,
            force_grouped=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("tail", [1, 63, 64, 65, 128])
    def test_grouped_kernel_int8_subpage_tail_fetch(self, tail):
        """ps=128 (quarter QS=32) enables the sub-page tail-fetch branch —
        the grouped walk fetches a sequence's LAST page at quarter-page
        granularity via scalar-guarded static-size DMAs. Every other CI
        case uses ps=8/16 where the branch is disabled (round-4 advisor:
        the quarter-fetch/masking logic was only exercised by the on-chip
        VERIFY run). ``tail`` pins the live rows in the last page at the
        quarter boundaries (1 row, one-short, exact, one-past, full)."""
        ps = 128
        q, kvc, bt, sl, nk, nv = make_case(
            B=8, ps=ps, P=24, W=2, seed=23
        )
        # Force each sequence's tail-page occupancy to the parametrized
        # count: seq b spans 1 full page + `tail` rows (or just `tail`).
        # Rebuild the tables with 2 distinct pages per row (see the float
        # sub-page test: repeat-padded 1-page rows corrupt the twin).
        sln = np.asarray(sl).copy()
        btn = np.asarray(bt).copy()
        for b in range(8):
            sln[b] = (ps if b % 2 else 0) + tail
            btn[b] = [1 + 2 * b, 2 + 2 * b]
        sl, bt = jnp.asarray(sln), jnp.asarray(btn)
        P_, _, nkv_, ps_, _ = kvc.shape
        kq = jnp.clip(jnp.round(kvc * 20), -127, 127).astype(jnp.int8)
        s = jax.random.uniform(
            jax.random.key(24), (P_, 2, nkv_, ps_), jnp.float32, 0.01, 0.1
        )
        scale = q.shape[-1] ** -0.5
        ref = paged_decode_attention(
            q, kq, bt, sl, scale, kv_scale=s
        )
        btn = np.asarray(bt)
        kqn, sn = np.asarray(kq), np.asarray(s)
        nk2 = np.zeros_like(np.asarray(nk))
        nv2 = np.zeros_like(np.asarray(nv))
        for b in range(q.shape[0]):
            t = int(sln[b]) - 1
            pg = btn[b, t // ps_]
            nk2[b] = (kqn[pg, 0, :, t % ps_].astype(np.float32)
                      * sn[pg, 0, :, t % ps_][:, None])
            nv2[b] = (kqn[pg, 1, :, t % ps_].astype(np.float32)
                      * sn[pg, 1, :, t % ps_][:, None])
        from nano_vllm_candle_tpu.kernels import paged_decode as pd

        assert pd._subpage_tail_supported(ps, kq.dtype), (
            "ps=128 int8 must enable the sub-page tail fetch"
        )
        out = pallas_paged_decode_attention(
            q, kq, bt, sl, scale, jnp.asarray(nk2), jnp.asarray(nv2),
            kv_scale=s, interpret=True, force_grouped=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_fold_commit_matches_attention_plus_row_commit(self):
        """pallas_paged_decode_commit == pallas_paged_decode_attention
        followed by pallas_row_commit: identical attention output AND
        identical cache/scale contents (including null-page routing for an
        inactive slot)."""
        from nano_vllm_candle_tpu.kernels.paged_decode import (
            pallas_paged_decode_commit,
        )
        from nano_vllm_candle_tpu.kernels.kv_commit import pallas_row_commit

        B = 16
        q, kvc, bt, sl, nk, nv = make_case(B=B, P=8 * B, seed=13)
        sl = sl.at[5].set(0)
        bt = bt.at[5].set(0)
        P_, _, nkv_, ps_, hd_ = kvc.shape
        kq = jnp.clip(jnp.round(kvc * 20), -127, 127).astype(jnp.int8)
        s = jax.random.uniform(
            jax.random.key(14), (P_, 2, nkv_, ps_), jnp.float32, 0.01, 0.1
        )
        scale = hd_ ** -0.5
        # reference path: attention then separate row commit
        ref_out = pallas_paged_decode_attention(
            q, kq, bt, sl, scale, nk, nv, kv_scale=s, interpret=True,
            force_grouped=True,
        )
        slots = np.zeros((B,), np.int32)
        btn, sln = np.asarray(bt), np.asarray(sl)
        for b in range(B):
            n = int(sln[b])
            t = max(n - 1, 0)
            slots[b] = btn[b, t // ps_] * ps_ + t % ps_ if n > 0 else 0
        ref_kv, ref_s = pallas_row_commit(
            kq[None], nk, nv, jnp.int32(0), jnp.asarray(slots),
            kv_scale=s[None], interpret=True,
        )
        # fused path
        out, kv2, s2 = pallas_paged_decode_commit(
            q, kq[None], bt, sl, scale, nk, nv,
            kv_scale=s[None], layer_index=jnp.int32(0), interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5
        )
        # Page 0 is the null page: row_commit routes INACTIVE slots' rows
        # there while the fused kernel skips them — its contents are
        # garbage by convention and excluded.
        np.testing.assert_array_equal(
            np.asarray(kv2)[:, 1:], np.asarray(ref_kv)[:, 1:]
        )
        np.testing.assert_allclose(
            np.asarray(s2)[:, 1:], np.asarray(ref_s)[:, 1:],
            rtol=1e-6, atol=0,
        )

    def test_bf16_inputs(self):
        q, kvc, bt, sl, nk, nv = make_case(seed=6, dtype=jnp.bfloat16)
        scale = q.shape[-1] ** -0.5
        ref = twin_with_current_rows(q, kvc, bt, sl, nk, nv, scale)
        out = pallas_paged_decode_attention(
            q, kvc, bt, sl, scale, nk, nv, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )


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

    def test_segment_tile_skip_parity(self):
        """Tile-aligned segments make whole off-diagonal tiles skippable
        (the packed-stream band optimization); parity proves skipped tiles
        truly contributed nothing."""
        q, k, v, seg, pos = make_packed_case([64, 64, 64, 64], 256, seed=6)
        scale = q.shape[-1] ** -0.5
        ref = packed_prefill_attention(q, k, v, seg, pos, scale)
        out = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_all_padding_finite(self):
        q, k, v, seg, pos = make_packed_case([], 128, seed=4)
        out = pallas_packed_prefill_attention(
            q, k, v, seg, pos, 0.125, block_q=64, block_k=64, interpret=True
        )
        assert np.all(np.isfinite(np.asarray(out)))

    @pytest.mark.parametrize("lens,T", [
        ([100, 80, 50, 60], 384),   # short segments: band 1-2 tiles
        ([200, 80], 320),           # segment spanning 4 tiles
        ([320], 320),               # single sequence: full triangle band
        ([64, 64, 64, 64, 60], 384),
    ])
    def test_band_grid_matches_full(self, lens, T):
        """Round-5 band grid: the k grid walks only each q tile's causal
        band (static width from ``host_band_tiles``, per-tile start from
        scalar prefetch). Must be bit-equal with the full-triangle grid —
        a band narrower than any tile's need would silently skip real
        attention (the failure mode this test pins)."""
        from nano_vllm_candle_tpu.kernels.flash_prefill import (
            host_band_tiles,
        )

        q, k, v, seg, pos = make_packed_case(lens, T, seed=9)
        scale = q.shape[-1] ** -0.5
        band = host_band_tiles(seg, T, block=64)
        full = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True
        )
        banded = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True,
            band_tiles=band,
        )
        real = np.asarray(seg) >= 0
        np.testing.assert_array_equal(
            np.asarray(banded)[real], np.asarray(full)[real]
        )
        # stats variant too (chunked-prefill merge path)
        o1, m1, l1 = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True,
            return_stats=True, band_tiles=band,
        )
        o2, m2, l2 = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=64, block_k=64, interpret=True,
            return_stats=True,
        )
        np.testing.assert_array_equal(np.asarray(o1)[real], np.asarray(o2)[real])
        np.testing.assert_array_equal(np.asarray(m1)[real], np.asarray(m2)[real])
        np.testing.assert_array_equal(np.asarray(l1)[real], np.asarray(l2)[real])

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
# Page-commit kernels (kernels/kv_commit.py)
# --------------------------------------------------------------------------

from nano_vllm_candle_tpu.kernels.kv_commit import (  # noqa: E402
    pallas_commit_groups,
    pallas_row_commit,
)
from nano_vllm_candle_tpu.models.qwen3 import GROUP  # noqa: E402


class TestCommitGroupsKernel:
    def _case(self, seed=0):
        L, P, nkv, ps, hd, N = 2, 6, 2, 2 * GROUP, 32, 3
        ks = jax.random.split(jax.random.key(seed), 2)
        kvc = jax.random.normal(ks[0], (L, P, 2, nkv, ps, hd), jnp.float32)
        upd = jax.random.normal(ks[1], (N, 2, nkv, GROUP, hd), jnp.float32)
        pages = jnp.asarray([1, 0, 4], jnp.int32)  # window 1 -> null page
        offs = jnp.asarray([GROUP, 0, 0], jnp.int32)
        return kvc, upd, pages, offs

    def test_windows_land_and_rest_preserved(self):
        kvc, upd, pages, offs = self._case()
        before = np.asarray(kvc).copy()
        got, _ = pallas_commit_groups(
            kvc, upd, jnp.int32(1), pages, offs, interpret=True
        )
        after = np.asarray(got)
        np.testing.assert_array_equal(
            after[1, 1, :, :, GROUP : 2 * GROUP], np.asarray(upd[0])
        )
        np.testing.assert_array_equal(
            after[1, 4, :, :, :GROUP], np.asarray(upd[2])
        )
        # layer 0 untouched entirely; pages 2,3,5 of layer 1 untouched
        np.testing.assert_array_equal(after[0], before[0])
        for p in (2, 3, 5):
            np.testing.assert_array_equal(after[1, p], before[1, p])

    def test_quantized_scales(self):
        kvc, upd, pages, offs = self._case(seed=4)
        L, P, _, nkv, ps, hd = kvc.shape
        kv8 = jnp.zeros((L, P, 2, nkv, ps, hd), jnp.int8)
        sc = jnp.zeros((L, P, 2, nkv, ps), jnp.float32)
        upd8 = jnp.clip(jnp.round(upd * 10), -127, 127).astype(jnp.int8)
        su = jnp.abs(jax.random.normal(jax.random.key(9), (3, 2, nkv, GROUP)))
        got, gots = pallas_commit_groups(
            kv8, upd8, jnp.int32(0), pages, offs,
            kv_scale_cache=sc, scale_upd=su, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got[0, 4, :, :, :GROUP]), np.asarray(upd8[2])
        )
        np.testing.assert_array_equal(
            np.asarray(gots[0, 4, :, :, :GROUP]), np.asarray(su[2])
        )


class TestRowCommitKernel:
    def test_rows_land_and_rest_preserved(self):
        L, P, nkv, ps, hd, B = 3, 6, 2, 16, 32, 4
        ks = jax.random.split(jax.random.key(0), 3)
        kvc = jax.random.normal(ks[0], (L, P, 2, nkv, ps, hd), jnp.float32)
        k = jax.random.normal(ks[1], (B, nkv, hd), jnp.float32)
        v = jax.random.normal(ks[2], (B, nkv, hd), jnp.float32)
        slots = jnp.asarray([1 * ps + 3, 2 * ps + 8, 0, 4 * ps + 15], jnp.int32)
        before = np.asarray(kvc).copy()
        got, _ = pallas_row_commit(
            kvc, k, v, jnp.int32(1), slots, interpret=True
        )
        after = np.asarray(got)
        for b, s in enumerate(np.asarray(slots)):
            pg, off = s // ps, s % ps
            np.testing.assert_allclose(after[1, pg, 0, :, off], np.asarray(k[b]))
            np.testing.assert_allclose(after[1, pg, 1, :, off], np.asarray(v[b]))
        # other layers untouched; untouched rows of touched windows preserved
        np.testing.assert_array_equal(after[0], before[0])
        np.testing.assert_array_equal(after[2], before[2])
        np.testing.assert_array_equal(after[1, 1, 0, :, 0:3], before[1, 1, 0, :, 0:3])
        np.testing.assert_array_equal(after[1, 1, 0, :, 4:8], before[1, 1, 0, :, 4:8])
        np.testing.assert_array_equal(after[1, 3], before[1, 3])

    def test_quantized_row_roundtrip(self):
        L, P, nkv, ps, hd, B = 2, 6, 2, 16, 32, 3
        ks = jax.random.split(jax.random.key(1), 2)
        kvc = jnp.zeros((L, P, 2, nkv, ps, hd), jnp.int8)
        sc = jnp.zeros((L, P, 2, nkv, ps), jnp.float32)
        k = jax.random.normal(ks[0], (B, nkv, hd), jnp.float32)
        v = jax.random.normal(ks[1], (B, nkv, hd), jnp.float32)
        slots = jnp.asarray([1 * ps + 7, 3 * ps, 5 * ps + 9], jnp.int32)
        got, gots = pallas_row_commit(
            kvc, k, v, jnp.int32(0), slots, kv_scale=sc, interpret=True
        )
        gotn, gotsn = np.asarray(got), np.asarray(gots)
        for b, s in enumerate(np.asarray(slots)):
            pg, off = s // ps, s % ps
            deq_k = gotn[0, pg, 0, :, off].astype(np.float32) * gotsn[0, pg, 0, :, off][:, None]
            deq_v = gotn[0, pg, 1, :, off].astype(np.float32) * gotsn[0, pg, 1, :, off][:, None]
            assert np.abs(deq_k - np.asarray(k[b])).max() < 0.03
            assert np.abs(deq_v - np.asarray(v[b])).max() < 0.03

    def test_matches_write_kv_twin(self):
        """pallas_row_commit == models.qwen3._write_kv (the XLA scatter twin)
        on the same rows/slots — bf16 cache."""
        L, P, nkv, ps, hd, B = 2, 6, 2, 16, 32, 4
        ks = jax.random.split(jax.random.key(2), 3)
        kvc = jax.random.normal(ks[0], (L, P, 2, nkv, ps, hd), jnp.float32)
        k = jax.random.normal(ks[1], (B, nkv, hd), jnp.float32)
        v = jax.random.normal(ks[2], (B, nkv, hd), jnp.float32)
        slots = jnp.asarray([1 * ps + 3, 2 * ps + 8, 3 * ps + 15, 4 * ps], jnp.int32)
        got, _ = pallas_row_commit(kvc, k, v, jnp.int32(1), slots, interpret=True)
        ref, _ = qwen3._write_kv(kvc, None, k, v, slots, jnp.int32(1))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestRowsCommitAllKernel:
    """The deferred end-of-step all-layer commit
    (kv_commit.pallas_rows_commit_all) vs its XLA scatter twin
    (qwen3._write_kv_all_layers)."""

    def _case(self, seed=0):
        L, P, nkv, ps, hd, B = 3, 6, 2, 16, 32, 4
        ks = jax.random.split(jax.random.key(seed), 2)
        kvc = jax.random.normal(ks[0], (L, P, 2, nkv, ps, hd), jnp.float32)
        rows = jax.random.normal(ks[1], (L, B, 2, nkv, hd), jnp.float32)
        slots = jnp.asarray(
            [1 * ps + 3, 2 * ps + 8, 0, 4 * ps + 15], jnp.int32
        )
        return kvc, rows, slots

    @pytest.mark.parametrize("mode", ["fused", "batched", "naive"])
    def test_matches_xla_twin_bf16(self, mode):
        from nano_vllm_candle_tpu.kernels.kv_commit import (
            pallas_rows_commit_all,
        )

        kvc, rows, slots = self._case()
        got, _ = pallas_rows_commit_all(
            kvc, rows, slots, interpret=True,
            batched=mode != "naive", fused=mode == "fused",
        )
        ref, _ = qwen3._write_kv_all_layers(kvc, None, rows, slots)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # every layer's row landed (not just layer 0)
        after = np.asarray(got)
        for li in range(rows.shape[0]):
            s = int(np.asarray(slots)[0])
            np.testing.assert_allclose(
                after[li, s // 16, 0, :, s % 16], np.asarray(rows[li, 0, 0])
            )

    @pytest.mark.parametrize("mode", ["fused", "batched", "naive"])
    def test_matches_xla_twin_int8(self, mode):
        from nano_vllm_candle_tpu.kernels.kv_commit import (
            pallas_rows_commit_all,
        )

        kvc, rows, slots = self._case(seed=3)
        L, P, _, nkv, ps, hd = kvc.shape
        kv8 = jnp.zeros((L, P, 2, nkv, ps, hd), jnp.int8)
        sc = jnp.zeros((L, P, 2, nkv, ps), jnp.float32)
        got, gots = pallas_rows_commit_all(
            kv8, rows, slots, kv_scale=sc, interpret=True,
            batched=mode != "naive", fused=mode == "fused",
        )
        ref, refs = qwen3._write_kv_all_layers(kv8, sc, rows, slots)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        np.testing.assert_allclose(
            np.asarray(gots), np.asarray(refs), rtol=1e-6, atol=1e-7
        )

    def test_equivalent_to_per_layer_row_commits(self):
        """One all-layer call == L sequential pallas_row_commit calls."""
        from nano_vllm_candle_tpu.kernels.kv_commit import (
            pallas_rows_commit_all,
        )

        kvc, rows, slots = self._case(seed=5)
        got, _ = pallas_rows_commit_all(kvc, rows, slots, interpret=True)
        ref = kvc
        for li in range(rows.shape[0]):
            ref, _ = pallas_row_commit(
                ref, rows[li, :, 0], rows[li, :, 1], jnp.int32(li), slots,
                interpret=True,
            )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


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




class TestPrefixAttentionKernel:
    """Chunk-vs-prefix attention (chunked / prefix-cached prefill) vs the
    XLA twin, and the stats contract of the stream prefill kernels."""

    def _case(self, seed=0, quant=False):
        from nano_vllm_candle_tpu.ops.attention import prefix_attention

        L, P, nkv, ps, hd = 2, 8, 2, 16, 64
        T, g = 32, 2
        nq = nkv * g
        ks = jax.random.split(jax.random.key(seed), 2)
        q = jax.random.normal(ks[0], (T, nq, hd), jnp.float32)
        kvc = jax.random.normal(ks[1], (L, P, 2, nkv, ps, hd), jnp.float32)
        bt = jnp.asarray([1, 3, 5, 5], jnp.int32)  # padded with last page
        s = None
        if quant:
            kvc = jnp.clip(jnp.round(kvc * 20), -127, 127).astype(jnp.int8)
            s = jax.random.uniform(
                jax.random.key(9), (L, P, 2, nkv, ps), jnp.float32, 0.01, 0.1
            )
        return q, kvc, bt, s, prefix_attention

    @pytest.mark.parametrize("plen", [0, 1, 17, 48])
    def test_matches_xla_twin(self, plen):
        from nano_vllm_candle_tpu.kernels.flash_prefill import (
            pallas_prefix_attention,
        )

        q, kvc, bt, _, prefix_attention = self._case()
        scale = q.shape[-1] ** -0.5
        got_o, got_m, got_l = pallas_prefix_attention(
            q, kvc, bt, jnp.int32(plen), scale,
            layer_index=jnp.int32(1), block_q=32, interpret=True,
        )
        ref_o, ref_m, ref_l = prefix_attention(
            q, kvc[1], bt, jnp.int32(plen), scale
        )
        np.testing.assert_allclose(
            np.asarray(got_o), np.asarray(ref_o), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), rtol=2e-5, atol=2e-5)
        if plen == 0:
            np.testing.assert_array_equal(np.asarray(got_l), 0.0)

    def test_int8_matches_xla_twin(self):
        from nano_vllm_candle_tpu.kernels.flash_prefill import (
            pallas_prefix_attention,
        )

        q, kvc, bt, s, prefix_attention = self._case(seed=3, quant=True)
        scale = q.shape[-1] ** -0.5
        got_o, got_m, got_l = pallas_prefix_attention(
            q, kvc, bt, jnp.int32(30), scale, kv_scale=s,
            layer_index=jnp.int32(0), block_q=32, interpret=True,
        )
        ref_o, ref_m, ref_l = prefix_attention(
            q, kvc[0], bt, jnp.int32(30), scale, kv_scale=s[0]
        )
        np.testing.assert_allclose(
            np.asarray(got_o), np.asarray(ref_o), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), rtol=2e-5, atol=2e-5)

    def test_flash_prefill_stats_match_twin(self):
        q, k, v, seg, pos = make_packed_case([40, 20], 64, nq=8, nkv=4, hd=64)
        scale = q.shape[-1] ** -0.5
        ref_o, ref_m, ref_l = packed_prefill_attention(
            q, k, v, seg, pos, scale, return_stats=True
        )
        got_o, got_m, got_l = pallas_packed_prefill_attention(
            q, k, v, seg, pos, scale, block_q=32, block_k=32,
            interpret=True, return_stats=True,
        )
        real = np.asarray(seg) >= 0
        np.testing.assert_allclose(
            np.asarray(got_o)[real], np.asarray(ref_o)[real], rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_m)[real], np.asarray(ref_m)[real], rtol=2e-5,
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got_l)[real], np.asarray(ref_l)[real], rtol=2e-5,
            atol=2e-5,
        )

    def test_merge_parts_equals_joint_attention(self):
        """stream-part ⊕ prefix-part == attention over the concatenation —
        the exact invariant chunked prefill relies on."""
        from nano_vllm_candle_tpu.ops.attention import (
            merge_attention_parts, prefix_attention,
        )

        nkv, g, hd, ps = 2, 2, 32, 8
        nq = nkv * g
        T, plen = 16, 11
        ks = jax.random.split(jax.random.key(7), 6)
        q = jax.random.normal(ks[0], (T, nq, hd), jnp.float32)
        k_s = jax.random.normal(ks[1], (T, nkv, hd), jnp.float32)
        v_s = jax.random.normal(ks[2], (T, nkv, hd), jnp.float32)
        k_p = jax.random.normal(ks[3], (plen, nkv, hd), jnp.float32)
        v_p = jax.random.normal(ks[4], (plen, nkv, hd), jnp.float32)
        seg = jnp.zeros((T,), jnp.int32)
        pos = jnp.arange(plen, plen + T, dtype=jnp.int32)
        scale = hd ** -0.5

        o_s, m_s, l_s = packed_prefill_attention(
            q, k_s, v_s, seg, pos, scale, return_stats=True
        )
        # put the prefix into pages
        P, W = 3, 2
        kvc = np.zeros((P, 2, nkv, ps, hd), np.float32)
        for t in range(plen):
            kvc[1 + t // ps, 0, :, t % ps] = np.asarray(k_p[t])
            kvc[1 + t // ps, 1, :, t % ps] = np.asarray(v_p[t])
        o_p, m_p, l_p = prefix_attention(
            q, jnp.asarray(kvc), jnp.asarray([1, 2], jnp.int32),
            jnp.int32(plen), scale,
        )
        got = merge_attention_parts(o_s, m_s, l_s, o_p, m_p, l_p)

        # joint reference: concatenated keys, causal over the stream part
        k_all = jnp.concatenate([k_p, k_s], axis=0)
        v_all = jnp.concatenate([v_p, v_s], axis=0)
        seg_all = jnp.zeros((plen + T,), jnp.int32)
        pos_all = jnp.arange(plen + T, dtype=jnp.int32)
        q_pad = jnp.concatenate(
            [jnp.zeros((plen, nq, hd), jnp.float32), q], axis=0
        )
        ref = packed_prefill_attention(
            q_pad, k_all, v_all, seg_all, pos_all, scale
        )[plen:]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
