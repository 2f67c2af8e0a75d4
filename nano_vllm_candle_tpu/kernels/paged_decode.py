"""Pallas TPU paged-attention decode kernel.

Replaces the XLA gather fallback (``ops/attention.py:paged_decode_attention``,
which materializes every sequence's gathered KV in HBM) with a streaming
kernel: for each (sequence, page) grid step the Pallas pipeline DMAs exactly
one combined K+V page from HBM into VMEM — double-buffered ACROSS grid
steps, so page ``t+1`` streams while page ``t`` is folded into the
online-softmax accumulator (flash-attention style, f32 statistics). KV is
read once at HBM speed; nothing quadratic is ever materialized.

Round-2 design revisions, driven by measured per-grid-step scalar-core cost
(~0.2 us per operand index map; at bs64 x W6 x 28 layers the round-1 grid
burned ~4.5 ms/step in overhead alone, more than the KV stream itself):

- **One combined K+V operand** (``[L, P, 2, nkv, ps, hd]``,
  models/qwen3.KVCache): one DMA and one index map per page instead of two.
- **Trivial index maps**: the caller pads each block-table row by repeating
  its last valid page (inactive slots: page 0), so the per-step map is a
  bare table lookup — no clamp arithmetic. Pallas skips re-fetching a block
  whose index didn't change, so short sequences in a long-grid batch cost
  no extra bandwidth, and compute is skipped with ``pl.when``.
- **Packed q operand**: the query heads and the current token's k/v rows
  travel as one ``[B, nkv, g+2, hd]`` block (q at ``[:, :g]``, k at ``g``,
  v at ``g+1``) — one operand instead of three.
- **Current token folded from registers**: attention covers pages holding
  tokens ``[0, seq_len-1)`` plus the folded row, so the page commit
  (``kernels/kv_commit.pallas_row_commit``) happens *after* attention and
  needs no staging structure. This retires the round-1 group-commit ring
  (ring arrays, ring-tail attention, fused ring-commit kernel — measured
  1.4 ms/step of pure ring traffic at batch 64).
- **Large pages amortize what fixed cost remains**: production block size
  is 256 tokens — one ~0.5-1 MB contiguous DMA per page, grid = B x 1-2
  for typical decode depths.
- **Head-major pages and scales**: a fetched page is directly the per-head
  matmul operand, and INT8 per-vector scales broadcast over scores with no
  in-kernel transpose (a token-major scale transpose measured ~5x the whole
  kernel).
- **Native-dtype MXU**: q/k/v feed the MXU in their stored dtype (bf16 in
  production) with f32 accumulation. INT8 pages are cast (exact in bf16)
  and their scales fold into the small post-matmul tensors (k-scale into
  scores, v-scale into p) — bit-identical to the XLA twin.
- **GQA grouping**: scores are batched matmuls per KV head — K/V are never
  expanded (the reference had to emulate numpy.repeat semantics for this,
  ``/root/reference/src/models/qwen3.rs:236-256``).

Numerics follow the online-softmax recurrence; masking uses
``-0.7 * f32_max`` (never ``-inf``) and the final division guards l == 0
(inactive padding slots), matching the XLA reference twin at f32 statistics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    # scalar prefetch
    li_ref,  # [1] int32 layer index into the stacked cache
    seq_lens_ref,  # [B] int32 total context length INCLUDING the new token
    block_tables_ref,  # [B, W] int32, rows padded with their last valid page
    # blocks
    qn_ref,  # [1, nkv, g(+2), hd]: q heads (+ current k row + current v row)
    kv_ref,  # [1, 1, 2, nkv, ps, hd] combined page
    *rest,  # [s_ref,] o_ref, [mo_ref, lo_ref,] m_ref, l_ref, acc_ref
    scale: float,
    page_size: int,
    num_pages_per_seq: int,
    quantized: bool,
    fold_new: bool,
    return_stats: bool,
):
    if quantized:
        s_ref, *rest = rest
    if return_stats:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    w = pl.program_id(1)
    ps = page_size
    _, nkv, g2, hd = qn_ref.shape
    g = g2 - 2 if fold_new else g2
    nq = nkv * g
    seq_len = seq_lens_ref[b]
    # Tokens living in pages (the current token, when folded, is not).
    n_paged = seq_len - 1 if fold_new else seq_len

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(w * ps < n_paged)
    def _compute():
        q = qn_ref[0, :, :g]  # [nkv, g, hd] — native dtype into the MXU
        k = kv_ref[0, 0, 0]  # [nkv, ps, hd]
        v = kv_ref[0, 0, 1]
        ks = vs = None
        if quantized:
            cdt = q.dtype if q.dtype != jnp.int8 else jnp.bfloat16
            ks = s_ref[0, 0, 0]  # [nkv, ps] f32, head-major: direct broadcast
            vs = s_ref[0, 0, 1]
            k = k.astype(cdt)
            v = v.astype(cdt)

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [nkv, g, ps]
        if ks is not None:
            s = s * ks[:, None, :]

        token_idx = w * ps + jax.lax.broadcasted_iota(
            jnp.int32, (nkv, g, ps), 2
        )
        s = jnp.where(token_idx < n_paged, s, MASK_VALUE)
        s2 = s.reshape(nq, ps)

        m_prev = m_ref[:, :1]  # [nq, 1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s2, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s2 - m_next)  # [nq, ps] f32
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        p3 = p.reshape(nkv, g, ps)
        if vs is not None:
            p3 = p3 * vs[:, None, :]
        pv = jax.lax.dot_general(
            p3.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(nq, hd)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(w == num_pages_per_seq - 1)
    def _fold_new_and_finalize():
        # Fold the current token (exact activation-dtype row, no page round
        # trip), then normalize and emit.
        if fold_new:
            q = qn_ref[0, :, :g]
            k_new = qn_ref[0, :, g]  # [nkv, hd]
            v_new = qn_ref[0, :, g + 1]
            s_new = jnp.sum(
                q.astype(jnp.float32) * k_new.astype(jnp.float32)[:, None, :],
                axis=-1,
            ) * scale  # [nkv, g]
            s2 = s_new.reshape(nq, 1)
            active = seq_len > 0
            s2 = jnp.where(active, s2, MASK_VALUE)
            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_next = jnp.maximum(m_prev, s2)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s2 - m_next)
            p = jnp.where(active, p, 0.0)
            l = alpha * l_prev + p
            vb = jnp.broadcast_to(
                v_new.astype(jnp.float32)[:, None, :], (nkv, g, hd)
            ).reshape(nq, hd)
            acc = acc_ref[...] * alpha + p * vb
            m2 = m_next
        else:
            l = l_ref[:, :1]
            acc = acc_ref[...]
            m2 = m_ref[:, :1]

        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / safe_l).reshape(nkv, g, hd).astype(o_ref.dtype)
        if return_stats:
            mo_ref[0] = jnp.broadcast_to(m2, mo_ref.shape[1:])
            lo_ref[0] = jnp.broadcast_to(l, lo_ref.shape[1:])


# --------------------------------------------------------------------------
# Grouped manual-DMA kernel (round 3)
#
# The grid-per-page kernel above pays ~0.5 us of fixed pipeline/scalar cost
# per (sequence, page) grid step; at batch 64 that overhead alone was
# 3.6 ms/step (ps=64, W=4, 28 layers) — ~70x the pages' actual DMA time
# (profile_trace, round 3). This kernel restructures the loop: ONE grid
# step per SEQ_BLOCK(=8) sequences, with an in-kernel double-buffered
# manual-DMA loop over pages (pltpu.make_async_copy from the ANY-space
# cache into VMEM scratch) and the per-page compute batched over the
# group's sequences (one batched dot_general over [SB*nkv] instead of SB
# separate [g, hd] @ [hd, ps] issues — GQA's g=2-row matmuls waste the MXU
# individually). Per-sequence DMAs and the whole page iteration are
# scalar-guarded so exhausted/inactive sequences cost neither bandwidth
# nor compute.
# --------------------------------------------------------------------------

def _subpage_tail_supported(ps: int, kv_dtype) -> bool:
    """Whether the grouped walk can fetch a sequence's tail page at
    quarter-page granularity: each quarter must be at least one 32-row
    sublane tile (covers int8/bf16/f32 tiling). int8 pages need no extra
    care (garbage scratch is finite and masked out of the softmax);
    float pages additionally zero V's masked rows before p@V in-kernel —
    un-DMA'd float scratch could hold NaN bit patterns and 0*NaN would
    poison the accumulation (the round-4 reason this was int8-only)."""
    del kv_dtype
    return ps % 4 == 0 and (ps // 4) % 32 == 0


SEQ_BLOCK = 8  # sequences per grid step (grouped kernel)

#: Page-buffer slots of the grouped kernel = lookahead depth + 1. Round 3
#: ran double-buffered (one page of lookahead); the 16k A/B measured the
#: per-page stream at only ~0.3-0.45 of the DMA floor with shallow
#: lookahead, so the walk now keeps NSLOTS-1 pages in flight.
#: (fold_commit keeps 2 — its commit phase addresses kbuf slots by the
#: same parity formula, which stays valid for any NSLOTS, but its
#: prefetch-after-commit structure was only validated at depth 1.)
GROUPED_NSLOTS = 4


def _grouped_kernel(
    # scalar prefetch
    li_ref,  # [1] layer index
    seq_lens_ref,  # [B] int32 (including the current token)
    block_tables_ref,  # [B, W] int32, rows padded with their last valid page
    # operands
    qn_ref,  # [SB, nkv, g+2, hd] VMEM block (q + current k/v rows)
    kv_hbm,  # [L, P, 2, nkv, ps, hd] full cache, ANY memory space
    *rest,  # [s_hbm,] o_ref, [kv_out, s_out,] kbuf, [sbuf,] sems,
    #         [cbuf, pbuf, wsems,] m_ref, l_ref, acc_ref
    scale: float,
    page_size: int,
    num_pages_per_seq: int,
    chunk_pages: int,
    quantized: bool,
    fold_commit: bool = False,
):
    if quantized:
        s_hbm, *rest = rest
    if fold_commit:
        (o_ref, kv_out, s_out, kbuf, sbuf, sems, cbuf, pbuf, wsems,
         m_ref, l_ref, acc_ref) = rest
    elif quantized:
        o_ref, kbuf, sbuf, sems, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, kbuf, sems, m_ref, l_ref, acc_ref = rest
        sbuf = None
    i = pl.program_id(0)
    # Page-CHUNK grid dim (lifts the static-unroll W cap): chunk ``wc``
    # walks pages [wc*WC, (wc+1)*WC); softmax state persists in scratch
    # across chunks (wc is the fastest grid dim, so a group's chunks are
    # consecutive) and the fold/emit runs on the last chunk only.
    wc = pl.program_id(1)
    nWC = pl.num_programs(1)
    ps = page_size
    W = num_pages_per_seq  # FULL padded page count (parity/guard space)
    WC = chunk_pages
    SB, nkv, g2, hd = qn_ref.shape
    g = g2 - 2
    nq = nkv * g
    base = i * SB
    n_groups = pl.num_programs(0)

    lens = [seq_lens_ref[base + sb] for sb in range(SB)]  # scalar reads
    npaged = [l - 1 for l in lens]  # current token is folded from registers

    # fold_commit additionally fetches the CURRENT token's page (<=: the
    # page holding position npaged, possibly still empty) so the commit can
    # read-modify-write its 8-row window from VMEM.
    def fetch_wanted(w, length):
        n_p = length - 1
        return (w * ps <= n_p) if fold_commit else (w * ps < n_p)

    # Sub-page tail fetch (round 4): a sequence's LAST page is mostly empty
    # right after it opens (mean occupancy ~50%), and at the bench shape
    # (ps=256, mean context ~192) the full-page walk reads ~939 MB/step for
    # ~704 MB of live KV at bs64 — ~25% dead bytes. Fetch the tail page at
    # quarter-page granularity instead: ceil(live/QS) quarters via one DMA
    # whose static size is selected by scalar guards (Mosaic DMAs need
    # static shapes; only one branch fires). Interior pages keep the single
    # full-page DMA. The scale plane stays full-width — it is ~3% of the
    # page bytes and its minor (lane) dim cannot slice below 128. Round 5
    # extends this to FLOAT pages: int8 garbage scratch is finite and the
    # softmax masks it, while un-DMA'd float scratch could hold NaN bit
    # patterns — the compute loop zeroes V's masked rows before p@V for
    # float caches (see the sanitize select below).
    QS = ps // 4  # 64 tokens at ps=256; int8 sublane tile is 32 — aligned
    sub_page = (
        not fold_commit
        and _subpage_tail_supported(ps, kbuf.dtype)
    )

    # Buffer slots follow the GLOBAL page counter (i*W + w) so prefetching
    # across chunk/group boundaries keeps parity. NS buffer slots give
    # NS-1 pages of DMA lookahead (clamped to W: each grid step must issue
    # its successor's first pages or the successor's waits deadlock).
    NS = 2 if fold_commit else GROUPED_NSLOTS
    LOOK = min(NS - 1, W)

    def slot_of(w):
        return (i * W + w) % NS

    def start_dmas(grp, w, slot):
        """Issue the SB page DMAs of (group, page-index) into ``slot``.

        ``grp``/the scalar guards may reference the next group: the scalar-
        prefetched tables cover the whole batch, so cross-grid-step
        prefetch is just an index.
        """
        gbase = grp * SB
        for sb in range(SB):
            length = seq_lens_ref[gbase + sb]
            if sub_page:
                live = (length - 1) - w * ps  # live tokens in this page

                # Full page: interior pages AND tails in the last quarter.
                @pl.when(live > 3 * QS)
                def _():
                    page = block_tables_ref[gbase + sb, w]
                    pltpu.make_async_copy(
                        kv_hbm.at[li_ref[0], page],
                        kbuf.at[slot, sb],
                        sems.at[slot, sb, 0],
                    ).start()

                for q4 in (1, 2, 3):  # tail page: ceil(live/QS) quarters
                    @pl.when((live > (q4 - 1) * QS) & (live <= q4 * QS))
                    def _(q4=q4):
                        page = block_tables_ref[gbase + sb, w]
                        pltpu.make_async_copy(
                            kv_hbm.at[li_ref[0], page, :, :,
                                      pl.ds(0, q4 * QS), :],
                            kbuf.at[slot, sb, :, :, pl.ds(0, q4 * QS), :],
                            sems.at[slot, sb, 0],
                        ).start()

                if quantized:
                    @pl.when(live > 0)
                    def _():
                        page = block_tables_ref[gbase + sb, w]
                        pltpu.make_async_copy(
                            s_hbm.at[li_ref[0], page],
                            sbuf.at[slot, sb],
                            sems.at[slot, sb, 1],
                        ).start()
            else:
                @pl.when(fetch_wanted(w, length))
                def _():
                    page = block_tables_ref[gbase + sb, w]
                    pltpu.make_async_copy(
                        kv_hbm.at[li_ref[0], page],
                        kbuf.at[slot, sb],
                        sems.at[slot, sb, 0],
                    ).start()
                    if quantized:
                        pltpu.make_async_copy(
                            s_hbm.at[li_ref[0], page],
                            sbuf.at[slot, sb],
                            sems.at[slot, sb, 1],
                        ).start()

    def wait_dmas(slot, w):
        for sb in range(SB):
            if sub_page:
                live = (lens[sb] - 1) - w * ps

                @pl.when(live > 3 * QS)
                def _():
                    pltpu.make_async_copy(
                        kv_hbm.at[li_ref[0], 0], kbuf.at[slot, sb],
                        sems.at[slot, sb, 0],
                    ).wait()

                for q4 in (1, 2, 3):
                    @pl.when((live > (q4 - 1) * QS) & (live <= q4 * QS))
                    def _(q4=q4):
                        pltpu.make_async_copy(
                            kv_hbm.at[li_ref[0], 0, :, :,
                                      pl.ds(0, q4 * QS), :],
                            kbuf.at[slot, sb, :, :, pl.ds(0, q4 * QS), :],
                            sems.at[slot, sb, 0],
                        ).wait()

                if quantized:
                    @pl.when(live > 0)
                    def _():
                        pltpu.make_async_copy(
                            s_hbm.at[li_ref[0], 0], sbuf.at[slot, sb],
                            sems.at[slot, sb, 1],
                        ).wait()
            else:
                @pl.when(fetch_wanted(w, lens[sb]))
                def _():
                    pltpu.make_async_copy(
                        kv_hbm.at[li_ref[0], 0], kbuf.at[slot, sb],
                        sems.at[slot, sb, 0],
                    ).wait()
                    if quantized:
                        pltpu.make_async_copy(
                            s_hbm.at[li_ref[0], 0], sbuf.at[slot, sb],
                            sems.at[slot, sb, 1],
                        ).wait()

    @pl.when(wc == 0)
    def _init_stats():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_all = qn_ref[:, :, :g]  # [SB, nkv, g, hd]

    # Mosaic cannot reshape/broadcast small 1-D vectors built from scalars
    # (tpu.reshape 8x8 -> 64x1x1 is unsupported), so per-row scalar values
    # are materialized by a static chain of scalar-broadcast selects over a
    # row-index iota.
    def per_row_scalar(shape, row_dim, rows_per_sb, values, init):
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, row_dim)
        sb_of_row = rows // rows_per_sb
        out = jnp.full(shape, init, jnp.int32)
        for sb in range(SB):
            out = jnp.where(sb_of_row == sb, values[sb], out)
        return out

    @pl.when((i == 0) & (wc == 0))
    def _first():
        # Fill the whole lookahead pipeline for the very first grid step;
        # every later step's leading pages are prefetched by predecessors.
        for j in range(LOOK):
            start_dmas(0, j, slot_of(j))

    for w in range(WC):  # static unroll; per-sequence scalar DMA guards
        gw_t = wc * WC + w  # global page index (traced via wc)
        slot = slot_of(gw_t)
        if fold_commit:
            # Depth-1 pipeline, in-chunk only (single chunk asserted): the
            # commit phase reads kbuf at per-sequence dynamic slots, which
            # a deeper/cross-group prefetch would clobber; its prefetch
            # runs AFTER the commit instead.
            if w + 1 < WC:
                start_dmas(i, w + 1, slot_of(w + 1))
        else:
            # Keep LOOK pages in flight: issue the page LOOK ahead of this
            # one — in this group (possibly the next chunk) or, past the
            # table end, the NEXT group's early pages (the cross-grid-step
            # overlap the automatic pipeline had; without even depth-1 of
            # it, bs64 int4 measured 12.9k -> 12.1k tok/s in round 3).
            # Every page is issued exactly once: in-group by the iteration
            # LOOK behind it, or by the predecessor group's tail (LOOK is
            # clamped to W so the coverage never skips a group).
            tg = gw_t + LOOK
            tslot = slot_of(tg)

            @pl.when(tg < W)
            def _():
                start_dmas(i, tg, tslot)

            @pl.when((tg >= W) & (i + 1 < n_groups))
            def _():
                start_dmas(i + 1, tg - W, tslot)
        wait_dmas(slot, gw_t)

        # (SB, nkv) flattened into ONE batch dim: Mosaic's tpu.matmul
        # supports at most one batched dimension.
        k = kbuf[slot, :, 0].reshape(SB * nkv, ps, hd)  # cache dtype
        v = kbuf[slot, :, 1].reshape(SB * nkv, ps, hd)
        cdt = q_all.dtype
        if quantized:
            k = k.astype(cdt)
            v = v.astype(cdt)

        s = jax.lax.dot_general(
            q_all.reshape(SB * nkv, g, hd), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [SB*nkv, g, ps]
        if quantized:
            ks = sbuf[slot, :, 0].reshape(SB * nkv, ps)  # f32
            s = s * ks[:, None, :]

        token_idx = gw_t * ps + jax.lax.broadcasted_iota(
            jnp.int32, (SB * nkv, g, ps), 2
        )
        npg = per_row_scalar((SB * nkv, g, ps), 0, nkv, npaged, 0)
        mask = token_idx < npg
        s = jnp.where(mask, s, MASK_VALUE)
        if sub_page and not quantized:
            # Float pages with sub-page tail fetch: un-DMA'd tail-quarter
            # scratch may hold NaN bit patterns and 0*NaN in p@V would
            # poison the accumulator, so zero V's masked rows. (K needs no
            # sanitize: NaN scores are killed by the where above. int8
            # garbage is finite — masking alone suffices, no select paid.)
            vtok = gw_t * ps + jax.lax.broadcasted_iota(
                jnp.int32, (SB * nkv, ps, 1), 1
            )
            vnpg = per_row_scalar((SB * nkv, ps, 1), 0, nkv, npaged, 0)
            v = jnp.where(vtok < vnpg, v, jnp.zeros_like(v))
        s2 = s.reshape(SB * nq, ps)
        mask2 = mask.reshape(SB * nq, ps)
        # A sequence with no tokens in this page window contributes NOTHING:
        # its p row must be exactly zero (exp(MASK-MASK)=1 otherwise, the
        # all-masked-softmax trap), and its pv row must be zeroed AFTER the
        # dot (its un-DMA'd scratch page may hold NaNs; 0 x NaN = NaN). The
        # per-page kernel sidesteps both with pl.when — here the group
        # shares one compute, so the masks are explicit.
        row_npg = per_row_scalar((SB * nq, 1), 0, nq, npaged, 0)
        row_active = gw_t * ps < row_npg

        m_prev = m_ref[:, :1]  # [SB*nq, 1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s2, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.where(mask2, jnp.exp(s2 - m_next), 0.0)
        l_ref[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
        )
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)

        p4 = p.reshape(SB * nkv, g, ps)
        if quantized:
            vs = sbuf[slot, :, 1].reshape(SB * nkv, ps)
            p4 = p4 * vs[:, None, :]
        pv = jax.lax.dot_general(
            p4.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(SB * nq, hd)
        pv = jnp.where(row_active, pv, 0.0)
        acc_ref[...] = acc_ref[...] * alpha + pv

    # Fold the current token from registers, normalize, emit — on the
    # group's LAST page chunk only (earlier chunks just accumulate stats).
    @pl.when(wc == nWC - 1)
    def _fold_and_emit():
        q_f = q_all.astype(jnp.float32)
        k_new = qn_ref[:, :, g].astype(jnp.float32)  # [SB, nkv, hd]
        v_new = qn_ref[:, :, g + 1].astype(jnp.float32)
        s_new = jnp.sum(
            q_f * k_new[:, :, None, :], axis=-1
        ) * scale  # [SB,nkv,g]
        # active = seq_len > 0 <=> npaged > -1, via the same per-row select.
        row_npg = per_row_scalar((SB * nq, 1), 0, nq, npaged, -1)
        active = row_npg > -1  # [SB*nq, 1] bool
        s2 = jnp.where(active, s_new.reshape(SB * nq, 1), MASK_VALUE)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_next = jnp.maximum(m_prev, s2)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s2 - m_next)
        p = jnp.where(active, p, 0.0)
        l = alpha * l_prev + p
        vb = jnp.broadcast_to(v_new[:, :, None, :], (SB, nkv, g, hd))
        acc = acc_ref[...] * alpha + p * vb.reshape(SB * nq, hd)
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc / safe_l).reshape(SB, nkv, g, hd).astype(o_ref.dtype)

    if not fold_commit:
        return

    # ---- fused page commit (replaces kernels/kv_commit.pallas_row_commit
    # for this path — its separate (B,) grid measured 0.57 ms/step of
    # near-pure overhead at bs64). The current token's page is already in
    # kbuf (the <= fetch guard); RMW its 8-row window in VMEM and DMA the
    # window (+ the page's scale plane) back. Runs BEFORE the next-group
    # prefetch, which would clobber kbuf slots.
    rows = jnp.stack(
        [qn_ref[:, :, g], qn_ref[:, :, g + 1]], axis=1
    )  # [SB, 2, nkv, hd] activation dtype
    rf = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(rf), axis=-1)  # [SB, 2, nkv]
    qscale = jnp.where(amax > 0, amax / 127.0, 1.0)
    qrow = jnp.clip(jnp.round(rf / qscale[..., None]), -127, 127)

    G8 = 8  # kv_commit.GROUP: the f32-sublane-tile RMW window
    for sb in range(SB):
        @pl.when(lens[sb] > 0)
        def _commit(sb=sb):
            n_p = npaged[sb]  # position of the current token
            pw = n_p // ps
            pwc = jnp.minimum(pw, W - 1)
            page = block_tables_ref[base + sb, pwc]
            # Speculative overshoot past the table routes to the null page.
            page = jnp.where(pw < W, page, 0)
            slot_cur = (i * W + pwc) % 2
            w8 = (n_p % ps) // G8
            off_in = n_p % G8
            win = kbuf[slot_cur, sb, :, :, pl.ds(w8 * G8, G8), :]
            ridx = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, G8, hd), 2)
            ins = qrow[sb].astype(win.dtype)  # [2, nkv, hd]
            cbuf[sb] = jnp.where(ridx == off_in, ins[:, :, None, :], win)
            pltpu.make_async_copy(
                cbuf.at[sb],
                kv_out.at[li_ref[0], page, :, :, pl.ds(w8 * G8, G8), :],
                wsems.at[sb, 0],
            ).start()
            plane = sbuf[slot_cur, sb]  # [2, nkv, ps] f32
            col = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, ps), 2)
            pbuf[sb] = jnp.where(
                col == n_p % ps, qscale[sb][..., None], plane
            )
            pltpu.make_async_copy(
                pbuf.at[sb], s_out.at[li_ref[0], page], wsems.at[sb, 1]
            ).start()

    # Cross-group prefetch now that kbuf reads are done (vector reads
    # complete in program order; the write DMAs source from cbuf/pbuf).
    @pl.when(i + 1 < n_groups)
    def _():
        start_dmas(i + 1, 0, slot_of(W))

    for sb in range(SB):
        @pl.when(lens[sb] > 0)
        def _wait(sb=sb):
            pltpu.make_async_copy(
                cbuf.at[sb], kv_out.at[li_ref[0], 0, :, :, pl.ds(0, G8), :],
                wsems.at[sb, 0],
            ).wait()
            pltpu.make_async_copy(
                pbuf.at[sb], s_out.at[li_ref[0], 0], wsems.at[sb, 1]
            ).wait()


#: Pages per grid step of the grouped kernel's page walk (a static unroll
#: of SB DMA issues + one batched fold per page). Tables wider than this
#: walk MULTIPLE page-chunk grid steps with the softmax state persisting in
#: scratch — the round-3 hard cap (reject W > 16 outright) is lifted.
MAX_GROUPED_W = 16

#: Widest table the grouped kernel accepts via chunking (256 pages = 64k
#: tokens at ps=256); beyond this the per-page kernel's runtime grid wins
#: on compile time.
MAX_GROUPED_W_CHUNKED = 256


def grouped_supported(
    B: int, fold_new: bool, return_stats: bool, W: int = 1,
    kv_dtype=None, ps: int = 256,
) -> bool:
    """Route to the grouped kernel only where it measured FASTER: int8 OR
    bf16 pages at batch >= 16. Round 3 gated this to int8 (bf16 grouped
    lost: bs64 11.5k vs 11.6k per-page) but round 5's float sub-page tail
    fetch (quarter-page tail DMAs + NaN-safe V sanitize) flipped the
    verdict: bf16 bs64 13,266 vs 12,683 per-page (+4.6%), int8-weights/
    bf16-KV bs64 14,244 vs 13,517 (+5.4%), same-session A/B. Small
    batches keep the per-(seq,page) pipeline (bf16 bs8: 3,020 vs 2,887
    grouped, r3 — a single 8-row group can't amortize the grouped walk).
    Batches that aren't a SEQ_BLOCK multiple are padded with inactive
    rows by the caller (scalar-guarded: no DMA or compute), so only the
    B >= 16 perf floor remains. NVCT_GROUPED_BF16=0 restores the
    int8-only gate (A/B escape)."""
    import os

    kv_ok = kv_dtype == jnp.int8 or (
        os.environ.get("NVCT_GROUPED_BF16", "1") != "0"
        and kv_dtype == jnp.bfloat16
    )
    # A/B escape: lower the grouped batch floor (e.g. NVCT_GROUPED_MINB=8
    # routes a single-group bs8 batch through the grouped walk).
    min_b = int(os.environ.get("NVCT_GROUPED_MINB", "16"))
    return (
        fold_new and not return_stats
        and B >= min_b and W <= MAX_GROUPED_W_CHUNKED
        and kv_ok
        # The manual scale-plane DMA copies [2, nkv, ps] f32 blocks whose
        # minor dim must be 128-tile-aligned (Mosaic rejects ps=64:
        # "Slice shape along dimension 4 must be aligned to tiling (128)").
        and ps % 128 == 0
    )


def _grouped_call(
    qn, kv_cache, kv_scale, li, seq_lens, block_tables, scale, interpret,
    fold_commit=False,
):
    B, nkv, g2, hd = qn.shape
    g = g2 - 2
    L, P, _, _, ps, _ = kv_cache.shape
    W = block_tables.shape[1]
    SB = SEQ_BLOCK
    quantized = kv_scale is not None
    assert not fold_commit or quantized, "fold_commit requires int8 KV"
    # Page-chunk grid: the static page unroll covers WC pages per grid
    # step; longer tables walk multiple chunks with the softmax state
    # persisting in scratch. Pad the table width to a chunk multiple by
    # repeating each row's last page — the fetch guards (w*ps < seq_len-1)
    # never touch the padding.
    WC = min(W, MAX_GROUPED_W)
    if W % WC:
        padW = WC - W % WC
        block_tables = jnp.concatenate(
            [block_tables] + [block_tables[:, -1:]] * padW, axis=1
        )
        W = W + padW
    nWC = W // WC
    assert not fold_commit or nWC == 1, (
        "fold_commit requires a single page chunk (its commit phase reads "
        "the current token's page from this chunk's kbuf slots)"
    )

    def qn_map(i, wc, *_):
        return (i, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((SB, nkv, g2, hd), qn_map),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [qn, kv_cache]
    out_specs = pl.BlockSpec((SB, nkv, g, hd), qn_map)
    out_shape = jax.ShapeDtypeStruct((B, nkv, g, hd), qn.dtype)
    io_aliases = {}
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_scale)
    if fold_commit:
        out_specs = (
            out_specs,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
            jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype),
        )
        # operand index (after the 3 scalar-prefetch args): kv=4, scale=5
        io_aliases = {4: 1, 5: 2}
    NS = 2 if fold_commit else GROUPED_NSLOTS
    scratch = [
        pltpu.VMEM((NS, SB, 2, nkv, ps, hd), kv_cache.dtype),  # kbuf
    ]
    if quantized:
        scratch.append(pltpu.VMEM((NS, SB, 2, nkv, ps), jnp.float32))  # sbuf
    scratch.append(pltpu.SemaphoreType.DMA((NS, SB, 2)))
    if fold_commit:
        scratch += [
            pltpu.VMEM((SB, 2, nkv, 8, hd), kv_cache.dtype),  # cbuf
            pltpu.VMEM((SB, 2, nkv, ps), jnp.float32),  # pbuf
            pltpu.SemaphoreType.DMA((SB, 2)),  # wsems
        ]
    scratch += [
        pltpu.VMEM((SB * nkv * g, 128), jnp.float32),  # m
        pltpu.VMEM((SB * nkv * g, 128), jnp.float32),  # l
        pltpu.VMEM((SB * nkv * g, hd), jnp.float32),  # acc
    ]
    kernel = functools.partial(
        _grouped_kernel, scale=scale, page_size=ps, num_pages_per_seq=W,
        chunk_pages=WC, quantized=quantized, fold_commit=fold_commit,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B // SB, nWC),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(li, seq_lens, block_tables, *operands)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def pallas_paged_decode_commit(
    q: jax.Array,  # [B, nq, hd]
    kv_cache: jax.Array,  # [L, P, 2, nkv, ps, hd] int8
    block_tables: jax.Array,  # [B, W]
    seq_lens: jax.Array,  # [B] (including the current token)
    scale: float,
    new_k: jax.Array,  # [B, nkv, hd]
    new_v: jax.Array,
    *,
    kv_scale: jax.Array,  # [L, P, 2, nkv, ps] f32
    layer_index: jax.Array,
    interpret: bool = False,
):
    """Grouped decode attention WITH the page commit fused in: one kernel
    attends over pages [0, seq_len-1) + the register-folded current token
    AND inserts that token's quantized k/v row (+ scale column) into its
    page — replacing the separate ``pallas_row_commit`` call, whose (B,)
    grid measured 0.57 ms/step of near-pure overhead at bs64 (round-3
    trace). Returns ``(attn_out [B, nq, hd], kv_cache, kv_scale)`` with the
    caches updated in place (aliased ANY-space outputs).

    Only for the grouped regime (``grouped_supported``): int8 pages,
    B % SEQ_BLOCK == 0, B >= 16, trimmed W. The commit math is identical
    to ``pallas_row_commit`` (per-vector symmetric int8, true scale;
    null-page routing for speculative overshoot).
    """
    B, nq, hd = q.shape
    if B % SEQ_BLOCK:
        raise ValueError(
            f"fold_commit path needs B % {SEQ_BLOCK} == 0 (got {B}); the "
            "attention-only path pads instead"
        )
    L, P, _, nkv, ps, _ = kv_cache.shape
    g = nq // nkv
    qn = jnp.concatenate(
        [
            q.reshape(B, nkv, g, hd),
            new_k.reshape(B, nkv, 1, hd).astype(q.dtype),
            new_v.reshape(B, nkv, 1, hd).astype(q.dtype),
        ],
        axis=2,
    )
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)
    out, kv, kvs = _grouped_call(
        qn, kv_cache, kv_scale, li, seq_lens, block_tables, scale,
        interpret, fold_commit=True,
    )
    return out.reshape(B, nq, hd), kv, kvs


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "return_stats",
                              "force_grouped")
)
def pallas_paged_decode_attention(
    q: jax.Array,  # [B, nq, hd]
    kv_cache: jax.Array,  # [L, P, 2, nkv, ps, hd] (or rank 5: layer 0)
    block_tables: jax.Array,  # [B, W] int32, rows padded w/ last valid page
    seq_lens: jax.Array,  # [B] int32 total length INCLUDING the current token
    scale: float,
    new_k: jax.Array = None,  # [B, nkv, hd] current token's k (activation dtype)
    new_v: jax.Array = None,
    *,
    kv_scale: Optional[jax.Array] = None,  # [L, P, 2, nkv, ps] f32 (int8 KV)
    layer_index: Optional[jax.Array] = None,
    interpret: bool = False,
    return_stats: bool = False,
    force_grouped: bool = False,  # tests: exercise the grouped kernel
    #                               regardless of the perf-gate heuristics
):
    """Decode attention against one layer of the full stacked paged cache.

    Pages must hold tokens ``[0, seq_lens - 1)``; the current token's k/v
    arrive as ``new_k``/``new_v`` and are folded in-kernel, so the page
    commit (``kernels/kv_commit.pallas_row_commit``) happens *after*
    attention with no staging structure. Block-table rows must be padded by
    repeating their last valid page (inactive rows: all zeros) — the index
    maps do no clamping.

    Taking the stacked ``[L, ...]`` cache + a runtime ``layer_index`` (rather
    than a pre-sliced layer) lets the surrounding ``lax.scan`` keep the cache
    in its carry with zero slicing traffic — the layer choice happens inside
    the BlockSpec index map, so only the block-table-addressed pages of layer
    ``layer_index`` are ever DMA'd.

    INT8 caches pass ``kv_scale``; the scales fold into scores/weights in
    VMEM right after the page DMA, so the HBM read is genuinely half-width.
    """
    B, nq, hd = q.shape
    quantized = kv_scale is not None
    if kv_cache.ndim == 5:  # single-layer convenience form (tests)
        kv_cache = kv_cache[None]
        if quantized:
            kv_scale = kv_scale[None]
        layer_index = jnp.zeros((), jnp.int32)
    L, P, _, nkv, ps, _ = kv_cache.shape
    g = nq // nkv
    W = block_tables.shape[1]
    fold_new = new_k is not None
    if fold_new:
        qn = jnp.concatenate(
            [
                q.reshape(B, nkv, g, hd),
                new_k.reshape(B, nkv, 1, hd).astype(q.dtype),
                new_v.reshape(B, nkv, 1, hd).astype(q.dtype),
            ],
            axis=2,
        )  # [B, nkv, g+2, hd]
    else:
        # No fold: pages hold the full [0, seq_lens) context (the paged-
        # prefix part of chunked / prefix-cached prefill).
        qn = q.reshape(B, nkv, g, hd)
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)
    g2 = qn.shape[2]

    if force_grouped:
        # The flag bypasses only the PERF heuristics (kv dtype, batch
        # size); the constraints below are Mosaic-legality — a forced call
        # violating them would die at compile time on real TPU with an
        # obscure layout error, so fail loudly here instead. Interpret mode
        # has no Mosaic tiling rules, so tests may keep exercising small
        # shapes there.
        if not (fold_new and not return_stats):
            raise ValueError(
                "force_grouped needs fold_new (new_k/new_v) and "
                "return_stats=False"
            )
        ps_ = kv_cache.shape[-2]
        if not interpret and (W > MAX_GROUPED_W_CHUNKED or ps_ % 128 != 0):
            raise ValueError(
                f"force_grouped structural limits on TPU: W={W} must be <= "
                f"{MAX_GROUPED_W_CHUNKED} and page_size={ps_} a multiple of "
                "128 (the scale-plane DMA's minor-dim tiling)"
            )
    if (
        grouped_supported(B, fold_new, return_stats, W, kv_cache.dtype,
                          kv_cache.shape[-2])
        or force_grouped
    ):
        # Pad the batch to a SEQ_BLOCK multiple with inactive rows
        # (seq_len 0, null-page tables): every per-sequence DMA and the
        # whole compute row are scalar-guarded, so padding costs neither
        # bandwidth nor FLOPs.
        padB = (-B) % SEQ_BLOCK
        if padB:
            qn_c = jnp.concatenate(
                [qn, jnp.zeros((padB, *qn.shape[1:]), qn.dtype)], axis=0
            )
            sl_c = jnp.concatenate(
                [seq_lens, jnp.zeros((padB,), seq_lens.dtype)]
            )
            bt_c = jnp.concatenate(
                [block_tables,
                 jnp.zeros((padB, W), block_tables.dtype)], axis=0
            )
        else:
            qn_c, sl_c, bt_c = qn, seq_lens, block_tables
        out = _grouped_call(
            qn_c, kv_cache, kv_scale, li, sl_c, bt_c, scale, interpret,
        )
        return out[:B].reshape(B, nq, hd)

    def qn_map(b, w, *_):
        return (b, 0, 0, 0)

    def kv_map(b, w, li_ref, seq_lens_ref, block_tables_ref):
        return (li_ref[0], block_tables_ref[b, w], 0, 0, 0, 0)

    def s_map(b, w, li_ref, seq_lens_ref, block_tables_ref):
        return (li_ref[0], block_tables_ref[b, w], 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, nkv, g2, hd), qn_map),
        pl.BlockSpec((1, 1, 2, nkv, ps, hd), kv_map),
    ]
    operands = [qn, kv_cache]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, 2, nkv, ps), s_map))
        operands.append(kv_scale)

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=ps, num_pages_per_seq=W,
        quantized=quantized, fold_new=fold_new, return_stats=return_stats,
    )
    out_shape = jax.ShapeDtypeStruct((B, nkv, g, hd), q.dtype)
    out_specs = pl.BlockSpec((1, nkv, g, hd), qn_map)
    if return_stats:
        def stat_map(b, w, *_):
            return (b, 0, 0)

        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((B, nq, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, nq, 128), jnp.float32),
        )
        out_specs = (
            out_specs,
            pl.BlockSpec((1, nq, 128), stat_map),
            pl.BlockSpec((1, nq, 128), stat_map),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, W),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nq, 128), jnp.float32),  # m
            pltpu.VMEM((nq, 128), jnp.float32),  # l
            pltpu.VMEM((nq, hd), jnp.float32),  # acc
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(li, seq_lens, block_tables, *operands)
    if return_stats:
        out, m, l = res
        return out.reshape(B, nq, hd), m[:, :, 0], l[:, :, 0]
    return res.reshape(B, nq, hd)
