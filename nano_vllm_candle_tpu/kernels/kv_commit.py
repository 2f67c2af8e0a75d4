"""Pallas page-commit kernels: write KV rows/windows into the paged cache.

Single-token writes into the head-major page layout are sub-tile (a token is
one ps-row of a (8,128)(2,1)-tiled ``[ps, hd]`` plane). XLA lowers such
scatters to a serialized while-loop of select + full-cache
dynamic-update-slice (measured 3.6 ms/step at bs16 in round 1 — worse than
the attention itself). These kernels do the same writes as Pallas grids over
**aliased outputs**: the cache is an output whose BlockSpec index map points
each grid step at its target window, so the pipeline DMAs exactly the
window bytes and everything else in the cache is untouched.

Two entry points (see ``models/qwen3.KVCache`` for the combined layout):

- ``pallas_commit_groups`` — prefill: N aligned ``[2, nkv, GROUP, hd]``
  windows (the packed stream is padded per sequence to GROUP=8 rows;
  partial tails are garbage-padded inside the sequence's own page and
  masked by seq_len forever after). Pure writes, no read-modify-write.
- ``pallas_row_commit`` — decode: one ``[2, nkv, hd]`` token row per slot,
  inserted via an 8-row read-modify-write window (8 rows = the f32 sublane
  tile; an 8-aligned 8-row window is a legal Mosaic block for every cache
  dtype). Runs AFTER attention in the layer — the attention kernel folds
  the current token from registers (kernels/paged_decode.py), so no
  staging ring is needed.

Windows that should not commit target the null page 0 (by convention a
garbage page masked out of every read).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # prefill commit window rows == models.qwen3.GROUP


def _groups_kernel(li_ref, pages_ref, goffs_ref, upd_ref, kv_ref, o_ref):
    # kv_ref is the aliased full cache (untouched; aliasing alone preserves
    # every window this grid never addresses).
    o_ref[...] = upd_ref[...][None]


def _groups_scales_kernel(li_ref, pages_ref, goffs_ref, upd_ref, s_upd_ref,
                          kv_ref, s_in, o_ref, so_ref):
    n = pl.program_id(0)
    o_ref[...] = upd_ref[...][None]
    # Scale planes: Mosaic forbids a (.., nkv, G) block (last dim neither
    # 128-divisible nor full), so RMW the page's full [2, nkv, ps] plane
    # (~2 KB) and mask the window's columns in.
    _, _, _, nkv, ps = s_in.shape
    G = s_upd_ref.shape[-1]
    off = goffs_ref[n] * G
    plane = s_in[0, 0]  # [2, nkv, ps]
    col = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, ps), 2)
    # Place the G update columns at [off, off+G) via a one-hot matmul
    # (Mosaic has no dynamic_update_slice): M[i, c] = 1 iff c == off + i.
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (G, ps), 1)
        == off + jax.lax.broadcasted_iota(jnp.int32, (G, ps), 0)
    ).astype(jnp.float32)
    upd_full = jax.lax.dot(
        s_upd_ref[0].reshape(2 * nkv, G), onehot,
        preferred_element_type=jnp.float32,
    ).reshape(2, nkv, ps)
    so_ref[0, 0] = jnp.where((col >= off) & (col < off + G), upd_full, plane)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_commit_groups(
    kv_cache: jax.Array,  # [L, P, 2, nkv, ps, hd] (cache dtype)
    upd: jax.Array,  # [N, 2, nkv, GROUP, hd] (cache dtype / pre-quantized)
    li: jax.Array,  # scalar layer index
    pages: jax.Array,  # [N] int32 target page (0 = null/no-op)
    offs: jax.Array,  # [N] int32 GROUP-aligned token offset within the page
    kv_scale_cache: Optional[jax.Array] = None,  # [L, P, 2, nkv, ps] f32
    scale_upd: Optional[jax.Array] = None,  # [N, 2, nkv, GROUP] f32
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """In-place(-aliased) commit of N aligned KV windows; returns the updated
    cache (and scale plane when quantized)."""
    N, _, nkv, G, hd = upd.shape
    quantized = kv_scale_cache is not None

    def upd_map(n, li_ref, pages_ref, goffs_ref):
        return (n, 0, 0, 0, 0)

    def cache_map(n, li_ref, pages_ref, goffs_ref):
        return (li_ref[0], pages_ref[n], 0, 0, goffs_ref[n], 0)

    def supd_map(n, li_ref, pages_ref, goffs_ref):
        return (n, 0, 0, 0)

    def scache_map(n, li_ref, pages_ref, goffs_ref):
        return (li_ref[0], pages_ref[n], 0, 0, goffs_ref[n])

    ps = kv_cache.shape[-2]

    def splane_map(n, li_ref, pages_ref, goffs_ref):
        return (li_ref[0], pages_ref[n], 0, 0, 0)

    in_specs = [pl.BlockSpec((1, 2, nkv, G, hd), upd_map)]
    operands = [upd.astype(kv_cache.dtype)]
    out_specs = [pl.BlockSpec((1, 1, 2, nkv, G, hd), cache_map)]
    out_shapes = [jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)]
    aliased = [kv_cache]
    kernel = _groups_kernel
    if quantized:
        # Full-plane RMW spec (see _groups_scales_kernel): the plane rides
        # as an aliased input AND the output.
        splane_spec = pl.BlockSpec((1, 1, 2, nkv, ps), splane_map)
        in_specs.append(pl.BlockSpec((1, 2, nkv, G), supd_map))
        operands.append(scale_upd)
        out_specs.append(splane_spec)
        out_shapes.append(
            jax.ShapeDtypeStruct(kv_scale_cache.shape, kv_scale_cache.dtype)
        )
        aliased.append(kv_scale_cache)
        kernel = _groups_scales_kernel

    n_prefetch = 3
    # Aliased inputs come AFTER the update operands; the KV cache rides as
    # ANY (its windows are write-only), the scale plane with its RMW spec.
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if quantized:
        in_specs.append(splane_spec)
    input_output_aliases = {
        n_prefetch + len(operands) + i: i for i in range(len(aliased))
    }
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(N,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(li, jnp.int32), (1,)),
        pages.astype(jnp.int32),
        (offs // G).astype(jnp.int32),
        *operands,
        *aliased,
    )
    if quantized:
        return res[0], res[1]
    return res[0], None


#: In-flight slot-window DMAs of the batched all-layer commit kernel.
NBUF = 4

#: Scratch-byte ceiling for the FUSED all-layer commit (vs its 100 MB
#: vmem_limit, with headroom for Mosaic temporaries); above it the call
#: silently takes the per-layer batched kernel. At today's shapes (0.6B-32B,
#: int8 KV, bs<=64) the fused scratch is ~15-35 MB, far under the gate.
_FUSED_VMEM_BUDGET = 64 * 1024 * 1024

#: A/B escape (perf forensics): NVCT_COMMIT_FUSED=0 forces the per-layer
#: batched kernel so the fused all-layer commit can be measured by
#: difference on real configs without a code edit.
_FUSED_DEFAULT = os.environ.get("NVCT_COMMIT_FUSED", "1") != "0"


def _rows_fused_kernel(
    pages_ref, row8_ref, rowin_ref,
    rows_ref,  # [L, B, 2, nkv, hd] ALL layers' rows (whole-array VMEM block)
    kv_any,    # aliased full cache (ANY; present only for aliasing)
    *rest,
    quantized: bool,
    B: int,
):
    """Grid ``(1,)``: one in-kernel pipelined loop over the B slots where
    each window DMA spans ALL L layers at once — a slot's page index is
    the same for every layer, so ``kv[:, page, :, :, w8*G:(w8+1)*G, :]``
    is one strided descriptor (L chunks of one window each). This
    collapses the DMA issue count from L*B*4 (the per-layer ``(L,)`` grid:
    ~7k issues at L28/bs64, whose issue overhead dominated the kernel's
    ~2x-over-DMA-floor cost) to B*4."""
    if quantized:
        (s_any, kv_out, s_out, rbuf, obuf, prbuf, pobuf,
         rsem, wsem) = rest
    else:
        kv_out, rbuf, obuf, rsem, wsem = rest
    G = GROUP
    L, _, _, nkv, hd = rows_ref.shape
    ps = kv_out.shape[-2]

    def read_win(j, b):
        return pltpu.make_async_copy(
            kv_out.at[:, pages_ref[j], :, :, pl.ds(row8_ref[j] * G, G), :],
            rbuf.at[b], rsem.at[b, 0],
        )

    def write_win(j, b):
        return pltpu.make_async_copy(
            obuf.at[b],
            kv_out.at[:, pages_ref[j], :, :, pl.ds(row8_ref[j] * G, G), :],
            wsem.at[b, 0],
        )

    def read_plane(j, b):
        return pltpu.make_async_copy(
            s_out.at[:, pages_ref[j]], prbuf.at[b], rsem.at[b, 1])

    def write_plane(j, b):
        return pltpu.make_async_copy(
            pobuf.at[b], s_out.at[:, pages_ref[j]], wsem.at[b, 1])

    for j in range(min(NBUF, B)):
        read_win(j, j).start()
        if quantized:
            read_plane(j, j).start()

    for j in range(B):
        b = j % NBUF
        read_win(j, b).wait()
        if quantized:
            read_plane(j, b).wait()
        if j >= NBUF:  # free obuf[b]: write j-NBUF landed long ago
            write_win(j - NBUF, b).wait()
            if quantized:
                write_plane(j - NBUF, b).wait()
        row = rows_ref[:, j].astype(jnp.float32)  # [L, 2, nkv, hd]
        if quantized:
            amax = jnp.max(jnp.abs(row), axis=-1)  # [L, 2, nkv]
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            ins = jnp.clip(jnp.round(row / scale[..., None]), -127, 127)
            scol = row8_ref[j] * G + rowin_ref[j]
            col = jax.lax.broadcasted_iota(jnp.int32, (L, 2, nkv, ps), 3)
            pobuf[b] = jnp.where(
                col == scol, scale[..., None], prbuf[b]
            )
        else:
            ins = row
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 2, nkv, G, hd), 3)
        obuf[b] = jnp.where(
            ridx == rowin_ref[j], ins.astype(obuf.dtype)[:, :, :, None, :],
            rbuf[b],
        )
        write_win(j, b).start()
        if quantized:
            write_plane(j, b).start()
        nxt = j + NBUF
        if nxt < B:
            read_win(nxt, b).start()
            if quantized:
                read_plane(nxt, b).start()

    for j in range(max(0, B - NBUF), B):
        b = j % NBUF
        write_win(j, b).wait()
        if quantized:
            write_plane(j, b).wait()


def _rows_commit_all_fused(
    kv_cache, rows, pages, row8, rowin, kv_scale, interpret,
):
    L, P, _, nkv, ps, hd = kv_cache.shape
    B = rows.shape[1]
    G = GROUP
    quantized = kv_scale is not None

    def whole(*_):
        return (0, 0, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((L, B, 2, nkv, hd), whole),
        pl.BlockSpec(memory_space=pl.ANY),  # aliased cache
    ]
    operands = [rows, kv_cache]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shapes = [jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)]
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_scale)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(
            jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype))
    scratch = [
        pltpu.VMEM((NBUF, L, 2, nkv, G, hd), kv_cache.dtype),  # rbuf
        pltpu.VMEM((NBUF, L, 2, nkv, G, hd), kv_cache.dtype),  # obuf
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((NBUF, L, 2, nkv, ps), jnp.float32),  # prbuf
            pltpu.VMEM((NBUF, L, 2, nkv, ps), jnp.float32),  # pobuf
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((NBUF, 2)),  # rsem
        pltpu.SemaphoreType.DMA((NBUF, 2)),  # wsem
    ]
    n_prefetch = 3
    input_output_aliases = {n_prefetch + 1: 0}
    if quantized:
        input_output_aliases[n_prefetch + 2] = 1
    res = pl.pallas_call(
        functools.partial(_rows_fused_kernel, quantized=quantized, B=B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(1,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pages, row8, rowin, *operands)
    if quantized:
        return res[0], res[1]
    return res[0], None


def _rows_all_batched_kernel(
    pages_ref, row8_ref, rowin_ref,
    rows_ref,  # [1, B, 2, nkv, hd] this layer's rows (VMEM block)
    kv_any,    # aliased full cache (ANY; present only for aliasing)
    *rest,
    quantized: bool,
    B: int,
):
    """Grid ``(L,)``: commit ALL ``B`` slots' rows for one layer with an
    ``NBUF``-deep software pipeline of manual window DMAs — read window
    ``j+NBUF`` while computing ``j`` — instead of one grid step per
    ``(layer, slot)``. The per-grid-step scalar/index-map cost of the
    naive ``(L, B)`` grid (1792 steps at L28/bs64) measured ~0.6 ms/step;
    this runs L=28 steps with the window DMAs overlapped."""
    if quantized:
        (s_any, kv_out, s_out, rbuf, obuf, prbuf, pobuf,
         rsem, wsem) = rest
    else:
        kv_out, rbuf, obuf, rsem, wsem = rest
    li = pl.program_id(0)
    G = GROUP
    _, _, _, nkv, hd = rows_ref.shape
    ps = kv_out.shape[-2]

    def read_win(j, b):
        return pltpu.make_async_copy(
            kv_out.at[li, pages_ref[j], :, :, pl.ds(row8_ref[j] * G, G), :],
            rbuf.at[b], rsem.at[b, 0],
        )

    def write_win(j, b):
        return pltpu.make_async_copy(
            obuf.at[b],
            kv_out.at[li, pages_ref[j], :, :, pl.ds(row8_ref[j] * G, G), :],
            wsem.at[b, 0],
        )

    def read_plane(j, b):
        return pltpu.make_async_copy(
            s_out.at[li, pages_ref[j]], prbuf.at[b], rsem.at[b, 1])

    def write_plane(j, b):
        return pltpu.make_async_copy(
            pobuf.at[b], s_out.at[li, pages_ref[j]], wsem.at[b, 1])

    for j in range(min(NBUF, B)):
        read_win(j, j).start()
        if quantized:
            read_plane(j, j).start()

    for j in range(B):
        b = j % NBUF
        read_win(j, b).wait()
        if quantized:
            read_plane(j, b).wait()
        if j >= NBUF:  # free obuf[b]: write j-NBUF landed long ago
            write_win(j - NBUF, b).wait()
            if quantized:
                write_plane(j - NBUF, b).wait()
        row = rows_ref[0, j].astype(jnp.float32)  # [2, nkv, hd]
        if quantized:
            amax = jnp.max(jnp.abs(row), axis=-1)  # [2, nkv]
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            ins = jnp.clip(jnp.round(row / scale[..., None]), -127, 127)
            scol = row8_ref[j] * G + rowin_ref[j]
            col = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, ps), 2)
            pobuf[b] = jnp.where(
                col == scol, scale[..., None], prbuf[b]
            )
        else:
            ins = row
        ridx = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, G, hd), 2)
        obuf[b] = jnp.where(
            ridx == rowin_ref[j], ins.astype(obuf.dtype)[:, :, None, :],
            rbuf[b],
        )
        write_win(j, b).start()
        if quantized:
            write_plane(j, b).start()
        nxt = j + NBUF
        if nxt < B:
            read_win(nxt, b).start()
            if quantized:
                read_plane(nxt, b).start()

    for j in range(max(0, B - NBUF), B):
        b = j % NBUF
        write_win(j, b).wait()
        if quantized:
            write_plane(j, b).wait()


def _rows_commit_all_batched(
    kv_cache, rows, pages, row8, rowin, kv_scale, interpret,
):
    L, P, _, nkv, ps, hd = kv_cache.shape
    B = rows.shape[1]
    G = GROUP
    quantized = kv_scale is not None

    def rows_map(l, *_):
        return (l, 0, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, B, 2, nkv, hd), rows_map),
        pl.BlockSpec(memory_space=pl.ANY),  # aliased cache
    ]
    operands = [rows, kv_cache]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shapes = [jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)]
    scratch = []
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_scale)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(
            jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype))
    scratch += [
        pltpu.VMEM((NBUF, 2, nkv, G, hd), kv_cache.dtype),  # rbuf
        pltpu.VMEM((NBUF, 2, nkv, G, hd), kv_cache.dtype),  # obuf
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((NBUF, 2, nkv, ps), jnp.float32),  # prbuf
            pltpu.VMEM((NBUF, 2, nkv, ps), jnp.float32),  # pobuf
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((NBUF, 2)),  # rsem
        pltpu.SemaphoreType.DMA((NBUF, 2)),  # wsem
    ]
    n_prefetch = 3
    input_output_aliases = {n_prefetch + 1: 0}
    if quantized:
        input_output_aliases[n_prefetch + 2] = 1
    res = pl.pallas_call(
        functools.partial(
            _rows_all_batched_kernel, quantized=quantized, B=B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(L,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pages, row8, rowin, *operands)
    if quantized:
        return res[0], res[1]
    return res[0], None


def _rows_all_kernel(pages_ref, row8_ref, rowin_ref,
                     rows_ref, win_in, *rest, quantized: bool):
    """Grid ``(L, B)``: insert layer ``l`` / slot ``b``'s current-token row
    into its 8-row window (RMW). Same math as ``_row_kernel`` with the
    layer coming from the grid instead of a scalar arg."""
    if quantized:
        swin_in, win_out, swin_out = rest
    else:
        (win_out,) = rest
    b = pl.program_id(1)
    rowin = rowin_ref[b]
    _, _, _, nkv, G, hd = win_in.shape
    win = win_in[0, 0]  # [2, nkv, 8, hd]
    rows = rows_ref[...]  # [1, 1, 2, nkv, hd]
    if quantized:
        rf = rows[0, 0].astype(jnp.float32)  # [2, nkv, hd]
        amax = jnp.max(jnp.abs(rf), axis=-1)  # [2, nkv]
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        qrow = jnp.clip(jnp.round(rf / scale[..., None]), -127, 127)
        ins = qrow.astype(win.dtype)
        plane = swin_in[0, 0]  # [2, nkv, ps]
        ps_s = plane.shape[-1]
        scol = row8_ref[b] * G + rowin
        col = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, ps_s), 2)
        swin_out[0, 0] = jnp.where(col == scol, scale[..., None], plane)
    else:
        ins = rows[0, 0].astype(win.dtype)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, G, hd), 2)
    win_out[0, 0] = jnp.where(ridx == rowin, ins[:, :, None, :], win)


@functools.partial(
    jax.jit, static_argnames=("interpret", "batched", "fused"))
def pallas_rows_commit_all(
    kv_cache: jax.Array,  # [L, P, 2, nkv, ps, hd]
    rows: jax.Array,  # [L, B, 2, nkv, hd] all layers' current-token rows
    slot_mapping: jax.Array,  # [B] int32 flat slot (page*ps + off)
    kv_scale: Optional[jax.Array] = None,  # [L, P, 2, nkv, ps] f32
    *,
    interpret: bool = False,
    batched: bool = True,
    fused: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Commit EVERY layer's decode rows in one call — the deferred
    end-of-step commit replacing L per-layer ``pallas_row_commit``
    dispatches. INT8 caches quantize the row in-kernel (per-vector
    symmetric, true scale) and update the scale stripe the same way.
    Inactive slots target the null page 0 (concurrent null-page window
    DMAs may interleave; the null page holds garbage by convention).

    ``fused=True`` (default): grid ``(1,)``, one pipelined in-kernel loop
    over the B slots where each window DMA spans ALL L layers (a slot's
    page index is layer-invariant) — B*4 DMA issues total.
    ``fused=False, batched=True``: grid ``(L,)`` with the per-layer
    NBUF-deep pipeline (L*B*4 issues — the issue overhead measured ~2x
    the DMA floor at L28/bs64). ``batched=False``: the naive ``(L, B)``
    BlockSpec grid, kept as the parity baseline (~0.6 ms/step at
    L28/bs64)."""
    L, P, _, nkv, ps, hd = kv_cache.shape
    B = slot_mapping.shape[0]
    G = GROUP
    quantized = kv_scale is not None
    slot = slot_mapping.astype(jnp.int32)
    pages = slot // ps
    row8 = (slot % ps) // G
    rowin = slot % G
    if fused is None:
        fused = _FUSED_DEFAULT
        if fused and batched:
            # VMEM footprint gate (round-4 advisor), applied only to the
            # DEFAULT resolution — an explicit fused=True is a hard request
            # that should fail loudly at compile time, not silently
            # validate the wrong kernel (tests force paths this way). The
            # fused kernel's scratch (rbuf/obuf spanning ALL L layers per
            # slot window, + f32 scale planes, + the whole
            # [L, B, 2, nkv, hd] rows block) scales linearly with layer
            # count; a deeper model / bf16 cache at large L would exceed
            # the 100 MB vmem_limit — estimate the bytes and fall back to
            # the per-layer batched kernel instead.
            win_b = 2 * NBUF * L * 2 * nkv * G * hd * kv_cache.dtype.itemsize
            plane_b = 2 * NBUF * L * 2 * nkv * ps * 4 if quantized else 0
            rows_b = rows.size * rows.dtype.itemsize
            if win_b + plane_b + rows_b > _FUSED_VMEM_BUDGET:
                fused = False
    if fused and batched:
        return _rows_commit_all_fused(
            kv_cache, rows, pages, row8, rowin, kv_scale, interpret
        )
    if batched:
        return _rows_commit_all_batched(
            kv_cache, rows, pages, row8, rowin, kv_scale, interpret
        )

    def rows_map(l, b, *_):
        return (l, b, 0, 0, 0)

    def win_map(l, b, pages_ref, row8_ref, rowin_ref):
        return (l, pages_ref[b], 0, 0, row8_ref[b], 0)

    def swin_map(l, b, pages_ref, row8_ref, rowin_ref):
        return (l, pages_ref[b], 0, 0, 0)

    win_spec = pl.BlockSpec((1, 1, 2, nkv, G, hd), win_map)
    in_specs = [
        pl.BlockSpec((1, 1, 2, nkv, hd), rows_map),
        win_spec,  # RMW read of the target window (from the aliased buffer)
    ]
    operands = [rows, kv_cache]
    out_specs = [win_spec]
    out_shapes = [jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)]
    if quantized:
        swin_spec = pl.BlockSpec((1, 1, 2, nkv, ps), swin_map)
        in_specs.append(swin_spec)
        operands.append(kv_scale)
        out_specs.append(swin_spec)
        out_shapes.append(jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype))

    n_prefetch = 3
    input_output_aliases = {n_prefetch + 1: 0}
    if quantized:
        input_output_aliases[n_prefetch + 2] = 1
    res = pl.pallas_call(
        functools.partial(_rows_all_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(L, B),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pages,
        row8,
        rowin,
        *operands,
    )
    if quantized:
        return res[0], res[1]
    return res[0], None


def _row_kernel(li_ref, pages_ref, row8_ref, rowin_ref,
                rows_ref, win_in, *rest, quantized: bool):
    if quantized:
        swin_in, win_out, swin_out = rest
    else:
        (win_out,) = rest
    b = pl.program_id(0)
    rowin = rowin_ref[b]
    _, _, _, nkv, G, hd = win_in.shape
    win = win_in[0, 0]  # [2, nkv, 8, hd]
    rows = rows_ref[...]  # [1, 2, nkv, hd]
    if quantized:
        rf = rows[0].astype(jnp.float32)  # [2, nkv, hd]
        amax = jnp.max(jnp.abs(rf), axis=-1)  # [2, nkv]
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        qrow = jnp.clip(jnp.round(rf / scale[..., None]), -127, 127)
        ins = qrow.astype(win.dtype)
        # Full-plane RMW for the scales (a (.., nkv, G) block is not a
        # legal Mosaic window; the plane is ~2 KB).
        plane = swin_in[0, 0]  # [2, nkv, ps]
        ps_s = plane.shape[-1]
        scol = row8_ref[b] * G + rowin
        col = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, ps_s), 2)
        swin_out[0, 0] = jnp.where(col == scol, scale[..., None], plane)
    else:
        ins = rows[0].astype(win.dtype)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (2, nkv, G, hd), 2)
    win_out[0, 0] = jnp.where(ridx == rowin, ins[:, :, None, :], win)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_row_commit(
    kv_cache: jax.Array,  # [L, P, 2, nkv, ps, hd]
    k: jax.Array,  # [B, nkv, hd] current-token rows (activation dtype)
    v: jax.Array,
    li: jax.Array,  # scalar layer index
    slot_mapping: jax.Array,  # [B] int32 flat slot (page*ps + off)
    kv_scale: Optional[jax.Array] = None,  # [L, P, 2, nkv, ps] f32
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Insert each slot's current-token k/v row into its page via an 8-row
    read-modify-write window (one grid step per slot). INT8 caches quantize
    the row in-kernel (per-vector symmetric, true scale) and update the
    scale stripe the same way. Inactive slots target the null page 0."""
    L, P, _, nkv, ps, hd = kv_cache.shape
    B = k.shape[0]
    G = GROUP
    quantized = kv_scale is not None
    rows = jnp.stack([k, v], axis=1)  # [B, 2, nkv, hd]
    slot = slot_mapping.astype(jnp.int32)
    pages = slot // ps
    row8 = (slot % ps) // G  # window index along the ps axis (block units)
    rowin = slot % G  # row within the window

    def rows_map(b, *_):
        return (b, 0, 0, 0)

    def win_map(b, li_ref, pages_ref, row8_ref, rowin_ref):
        return (li_ref[0], pages_ref[b], 0, 0, row8_ref[b], 0)

    def swin_map(b, li_ref, pages_ref, row8_ref, rowin_ref):
        return (li_ref[0], pages_ref[b], 0, 0, 0)

    win_spec = pl.BlockSpec((1, 1, 2, nkv, G, hd), win_map)
    in_specs = [
        pl.BlockSpec((1, 2, nkv, hd), rows_map),
        win_spec,  # RMW read of the target window (from the aliased buffer)
    ]
    operands = [rows, kv_cache]
    out_specs = [win_spec]
    out_shapes = [jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)]
    if quantized:
        swin_spec = pl.BlockSpec((1, 1, 2, nkv, ps), swin_map)
        in_specs.append(swin_spec)
        operands.append(kv_scale)
        out_specs.append(swin_spec)
        out_shapes.append(jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype))

    n_prefetch = 4
    # The cache operands double as RMW inputs; alias them to the outputs.
    input_output_aliases = {n_prefetch + 1: 0}
    if quantized:
        input_output_aliases[n_prefetch + 2] = 1
    res = pl.pallas_call(
        functools.partial(_row_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(B,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.reshape(jnp.asarray(li, jnp.int32), (1,)),
        pages,
        row8,
        rowin,
        *operands,
    )
    if quantized:
        return res[0], res[1]
    return res[0], None
