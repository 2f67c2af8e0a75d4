"""Pallas TPU flash-attention kernel for packed multi-sequence prefill.

Replaces the XLA reference path (``ops/attention.py:packed_prefill_attention``,
which materializes [nkv, g, T, T] f32 scores in HBM — 64 MB/layer at T=1024)
with a tiled online-softmax kernel that keeps every score tile in VMEM.

Packed-segment insight: prompts are concatenated in order, so token index j >
i implies either same segment with position_j > position_i (causally masked)
or a *later* segment (segment-masked). Strictly-upper K tiles are therefore
fully masked and skipped exactly like plain causal flash attention — the
segment mask only matters inside the block-diagonal band.

GQA: the grid iterates over *query* heads with K/V blocks indexed by
``h // group`` in the BlockSpec index map, so K/V are never expanded in
memory (cf. the reference's emulated numpy.repeat,
``/root/reference/src/models/qwen3.rs:236-256``). Layout is heads-leading
``[h, T, hd]`` so every block's trailing two dims are (block, head_dim) —
Mosaic-tileable for any head_dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _prefill_kernel(
    seg_q_ref,  # [1, 1, Bq] int32 (this q tile's segment ids)
    pos_q_ref,  # [1, 1, Bq] int32
    seg_k_ref,  # [1, 1, Bk] int32 (this k tile's)
    pos_k_ref,  # [1, 1, Bk] int32
    q_ref,  # [1, Bq, hd]
    k_ref,  # [1, Bk, hd]
    v_ref,  # [1, Bk, hd]
    o_ref,  # [1, Bq, hd]
    m_scr,  # [Bq, 128] f32
    l_scr,  # [Bq, 128] f32
    acc_scr,  # [Bq, hd] f32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    num_k_tiles: int,
):
    qt = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Skip strictly-upper tiles (k tile entirely after the q tile).
    @pl.when(kt * block_k <= qt * block_q + block_q - 1)
    def _compute():
        q = q_ref[0]  # [Bq, hd]
        k = k_ref[0]  # [Bk, hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bq, Bk]

        seg_q = seg_q_ref[0, 0]  # [Bq]
        pos_q = pos_q_ref[0, 0]
        seg_k = seg_k_ref[0, 0]  # [Bk]
        pos_k = pos_k_ref[0, 0]
        mask = (
            (seg_q[:, None] == seg_k[None, :])
            & (pos_k[None, :] <= pos_q[:, None])
            & (seg_q[:, None] >= 0)
        )  # [Bq, Bk]
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        v = v_ref[0]  # [Bk, hd]
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(kt == num_k_tiles - 1)
    def _finalize():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def pallas_packed_prefill_attention(
    q: jax.Array,  # [T, nq, hd]
    k: jax.Array,  # [T, nkv, hd]
    v: jax.Array,  # [T, nkv, hd]
    seg_ids: jax.Array,  # [T] int32, -1 padding
    positions: jax.Array,  # [T] int32
    scale: float,
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    T, nq, hd = q.shape
    nkv = k.shape[1]
    g = nq // nkv
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    if T % block_q or T % block_k:
        raise ValueError(f"T={T} must be a multiple of block sizes")
    num_k_tiles = T // block_k

    # heads-leading layout so block trailing dims are (block, hd)
    qh = q.transpose(1, 0, 2)  # [nq, T, hd]
    kh = k.transpose(1, 0, 2)  # [nkv, T, hd]
    vh = v.transpose(1, 0, 2)
    grid = (nq, T // block_q, num_k_tiles)

    kernel = functools.partial(
        _prefill_kernel,
        scale=scale, block_q=block_q, block_k=block_k, num_k_tiles=num_k_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # seg/pos delivered per-tile via BlockSpec (arrays reshaped
                # [n_tiles, 1, block]): dynamic in-kernel lane slices of a
                # full [1, T] row need starts statically divisible by 128,
                # which small tiles can't prove.
                pl.BlockSpec((1, 1, block_q), lambda h, qt, kt: (qt, 0, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, qt, kt: (qt, 0, 0)),
                pl.BlockSpec((1, 1, block_k), lambda h, qt, kt: (kt, 0, 0)),
                pl.BlockSpec((1, 1, block_k), lambda h, qt, kt: (kt, 0, 0)),
                pl.BlockSpec((1, block_q, hd), lambda h, qt, kt: (h, qt, 0)),
                pl.BlockSpec(
                    (1, block_k, hd), lambda h, qt, kt, g=g: (h // g, kt, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, hd), lambda h, qt, kt, g=g: (h // g, kt, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, hd), lambda h, qt, kt: (h, qt, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nq, T, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        seg_ids.reshape(T // block_q, 1, block_q),
        positions.reshape(T // block_q, 1, block_q),
        seg_ids.reshape(T // block_k, 1, block_k),
        positions.reshape(T // block_k, 1, block_k),
        qh,
        kh,
        vh,
    )
    return out.transpose(1, 0, 2)
