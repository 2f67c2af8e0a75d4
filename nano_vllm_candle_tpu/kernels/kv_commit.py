"""Pallas group-commit kernel: write aligned KV groups into paged HBM.

The group-commit ring design (``models/qwen3``) turns every cache write into
an aligned ``[nkv, GROUP, hd]`` window at a GROUP-aligned page offset. XLA's
``lax.scatter`` lowers such windowed scatters to a serialized while-loop of
select + full-cache dynamic-update-slice (~measured 3.6 ms/step at bs16 —
worse than the attention itself). This kernel does the same write as a
Pallas grid over the N windows: the cache is an **aliased output** whose
BlockSpec index map points each grid step at its target window, so the
pipeline DMAs exactly ``N × nkv × GROUP × hd`` bytes and everything else in
the cache is untouched. Windows that should not commit this step target the
null page 0 (by convention a garbage page masked out of every read).

Used for both decode (N = batch slots, at most one window each per step)
and prefill (N = packed-stream groups).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _commit_kernel(li_ref, pages_ref, goffs_ref, kupd_ref, vupd_ref,
                   kc_ref, vc_ref, ko_ref, vo_ref):
    # kc_ref/vc_ref are the aliased full caches (untouched; aliasing alone
    # preserves every window this grid never addresses).
    ko_ref[...] = kupd_ref[...][None]
    vo_ref[...] = vupd_ref[...][None]


def _commit_scales_kernel(li_ref, pages_ref, goffs_ref,
                          kupd_ref, vupd_ref, ksu_ref, vsu_ref,
                          kc_ref, vc_ref, ksc_ref, vsc_ref,
                          ko_ref, vo_ref, kso_ref, vso_ref):
    ko_ref[...] = kupd_ref[...][None]
    vo_ref[...] = vupd_ref[...][None]
    kso_ref[...] = ksu_ref[...][None]
    vso_ref[...] = vsu_ref[...][None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_commit_groups(
    k_cache: jax.Array,  # [L, P, nkv, ps, hd]
    v_cache: jax.Array,
    k_upd: jax.Array,  # [N, nkv, GROUP, hd] (cache dtype)
    v_upd: jax.Array,
    li: jax.Array,  # scalar layer index
    pages: jax.Array,  # [N] int32 target page (0 = null/no-op)
    offs: jax.Array,  # [N] int32 GROUP-aligned offset within the page
    k_scale_cache: Optional[jax.Array] = None,  # [L, P, ps, nkv] f32
    v_scale_cache: Optional[jax.Array] = None,
    k_scale_upd: Optional[jax.Array] = None,  # [N, nkv, GROUP] f32
    v_scale_upd: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """In-place(-aliased) commit of N aligned KV windows; returns the updated
    caches (and scale planes when quantized)."""
    N, nkv, G, hd = k_upd.shape
    quantized = k_scale_cache is not None

    def upd_map(n, li_ref, pages_ref, goffs_ref):
        return (n, 0, 0, 0)

    def cache_map(n, li_ref, pages_ref, goffs_ref):
        return (li_ref[0], pages_ref[n], 0, goffs_ref[n], 0)

    def supd_map(n, li_ref, pages_ref, goffs_ref):
        return (n, 0, 0)

    def scache_map(n, li_ref, pages_ref, goffs_ref):
        # token-major scale plane [L, P, ps, nkv]: the (GROUP, nkv) window
        # sits at block-row goffs of the ps axis
        return (li_ref[0], pages_ref[n], goffs_ref[n], 0)

    upd_spec = pl.BlockSpec((1, nkv, G, hd), upd_map)
    cache_spec = pl.BlockSpec((1, 1, nkv, G, hd), cache_map)
    in_specs = [upd_spec, upd_spec]
    operands = [k_upd, v_upd]
    out_specs = [cache_spec, cache_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    aliased = [k_cache, v_cache]
    kernel = _commit_kernel
    if quantized:
        # Updates arrive [N, nkv, G]; stored planes are token-major, so the
        # window is (G, nkv) — trailing dims (G % 8 == 0, nkv == full dim)
        # are Mosaic-legal for any page size.
        supd_spec = pl.BlockSpec((1, G, nkv), supd_map)
        scache_spec = pl.BlockSpec((1, 1, G, nkv), scache_map)
        in_specs += [supd_spec, supd_spec]
        operands += [
            jnp.swapaxes(k_scale_upd, 1, 2),
            jnp.swapaxes(v_scale_upd, 1, 2),
        ]
        out_specs += [scache_spec, scache_spec]
        out_shapes += [
            jax.ShapeDtypeStruct(k_scale_cache.shape, k_scale_cache.dtype),
            jax.ShapeDtypeStruct(v_scale_cache.shape, v_scale_cache.dtype),
        ]
        aliased += [k_scale_cache, v_scale_cache]
        kernel = _commit_scales_kernel

    n_prefetch = 3  # li, pages, goffs
    n_upd = len(operands)
    return _call_aliased(
        kernel, n_prefetch, n_upd, in_specs, aliased, out_specs, out_shapes,
        (N,),
        (jnp.reshape(jnp.asarray(li, jnp.int32), (1,)),
         pages.astype(jnp.int32),
         (offs // G).astype(jnp.int32)),
        operands,
        interpret=interpret,
    )


def _ring_commit_kernel(
    li_ref, pages_ref, goffs_ref, rslot_ref,  # scalar prefetch
    new_k_ref, new_v_ref,  # [1, nkv, hd] updates
    ring_k_in, ring_v_in,  # [1, 1, GROUP+1, nkv, hd] aliased ring blocks
    kc_ref, vc_ref,  # ANY (aliased caches, untouched except our window)
    *rest,  # [ksc, vsc ANY,] ring_k/v_out, ko/vo [, kso/vso]
    quantized: bool,
):
    if quantized:
        _ksc, _vsc, ring_k_out, ring_v_out, ko_ref, vo_ref, *scale_refs = rest
    else:
        ring_k_out, ring_v_out, ko_ref, vo_ref = rest
        scale_refs = ()
    b = pl.program_id(0)
    rslot = rslot_ref[b]
    G1, nkv, hd = ring_k_in.shape[2:]
    G = G1 - 1
    row = jax.lax.broadcasted_iota(jnp.int32, (G1, 1, 1), 0)

    def upd(ring_in_ref, new_ref):
        ring = ring_in_ref[0, 0]  # [GROUP+1, nkv, hd]
        return jnp.where(row == rslot, new_ref[...], ring)

    uk = upd(ring_k_in, new_k_ref)
    uv = upd(ring_v_in, new_v_ref)
    ring_k_out[0, 0] = uk
    ring_v_out[0, 0] = uv
    win_k = jnp.swapaxes(uk[:G], 0, 1)  # [nkv, GROUP, hd]
    win_v = jnp.swapaxes(uv[:G], 0, 1)
    if quantized:
        kso_ref, vso_ref = scale_refs

        def quant(w):  # [nkv, GROUP, hd] -> int8 + scales [GROUP, nkv]
            wf = w.astype(jnp.float32)
            amax = jnp.max(jnp.abs(wf), axis=-1)  # [nkv, GROUP]
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            q = jnp.clip(
                jnp.round(wf / scale[..., None]), -127, 127
            )
            return q, jnp.swapaxes(scale, 0, 1)

        qk, sk = quant(win_k)
        qv, sv = quant(win_v)
        ko_ref[0, 0] = qk.astype(ko_ref.dtype)
        vo_ref[0, 0] = qv.astype(vo_ref.dtype)
        kso_ref[0, 0] = sk
        vso_ref[0, 0] = sv
    else:
        ko_ref[0, 0] = win_k.astype(ko_ref.dtype)
        vo_ref[0, 0] = win_v.astype(vo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_ring_commit(
    ring_k: jax.Array,  # [L, B, GROUP+1, nkv, hd] (activation dtype)
    ring_v: jax.Array,
    k_cache: jax.Array,  # [L, P, nkv, ps, hd]
    v_cache: jax.Array,
    new_k: jax.Array,  # [B, nkv, hd] current-token rows
    new_v: jax.Array,
    li: jax.Array,  # scalar layer index
    rslot: jax.Array,  # [B] ring row for the current token (GROUP = trash)
    pages: jax.Array,  # [B] commit target page (0 = null/no-op)
    offs: jax.Array,  # [B] GROUP-aligned in-page offset
    k_scale_cache: Optional[jax.Array] = None,  # [L, P, ps, nkv] f32
    v_scale_cache: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Fused decode KV write: stage the current token's k/v row into the ring
    AND commit the (possibly just-completed) GROUP window to its page, one
    grid step per slot.

    Replaces the XLA scatter ring write + separate commit kernel: the
    scatter alone measured 0.32 ms/step at bs8 (ablation, BASELINE.md);
    here the ring block rides VMEM once per (layer, slot), the current row
    is substituted with a vectorized select, and the page window (int8
    quantization included) is emitted from the same VMEM block. Ordering is
    exact: the committed window always contains the current token when its
    position completes the group (position n-1 with n % GROUP == 0).

    Returns ``(ring_k', ring_v', k_cache', v_cache'[, k_scales', v_scales'])``.
    """
    L, B, G1, nkv, hd = ring_k.shape
    G = G1 - 1
    quantized = k_scale_cache is not None

    def new_map(b, li_ref, pages_ref, goffs_ref, rslot_ref):
        return (b, 0, 0)

    def ring_map(b, li_ref, pages_ref, goffs_ref, rslot_ref):
        return (li_ref[0], b, 0, 0, 0)

    def page_map(b, li_ref, pages_ref, goffs_ref, rslot_ref):
        return (li_ref[0], pages_ref[b], 0, goffs_ref[b], 0)

    def spage_map(b, li_ref, pages_ref, goffs_ref, rslot_ref):
        return (li_ref[0], pages_ref[b], goffs_ref[b], 0)

    new_spec = pl.BlockSpec((1, nkv, hd), new_map)
    ring_spec = pl.BlockSpec((1, 1, G1, nkv, hd), ring_map)
    page_spec = pl.BlockSpec((1, 1, nkv, G, hd), page_map)

    in_specs = [new_spec, new_spec, ring_spec, ring_spec]
    operands = [new_k, new_v, ring_k, ring_v]
    # ring blocks are aliased via their own (read) specs; caches via ANY
    aliased = [k_cache, v_cache]
    out_specs = [ring_spec, ring_spec, page_spec, page_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(ring_k.shape, ring_k.dtype),
        jax.ShapeDtypeStruct(ring_v.shape, ring_v.dtype),
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    if quantized:
        spage_spec = pl.BlockSpec((1, 1, G, nkv), spage_map)
        aliased += [k_scale_cache, v_scale_cache]
        out_specs += [spage_spec, spage_spec]
        out_shapes += [
            jax.ShapeDtypeStruct(k_scale_cache.shape, k_scale_cache.dtype),
            jax.ShapeDtypeStruct(v_scale_cache.shape, v_scale_cache.dtype),
        ]

    n_prefetch = 4  # li, pages, goffs, rslot
    in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY) for _ in aliased]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(B,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[],
    )
    # Alias ring operands (indices 2,3 after the new_k/new_v updates) to
    # outputs 0,1; cache/scale ANY operands to outputs 2..; input indices
    # count scalar-prefetch args first.
    input_output_aliases = {n_prefetch + 2: 0, n_prefetch + 3: 1}
    for i in range(len(aliased)):
        input_output_aliases[n_prefetch + 4 + i] = 2 + i
    return pl.pallas_call(
        functools.partial(_ring_commit_kernel, quantized=quantized),
        grid_spec=grid_spec,
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
        rslot.astype(jnp.int32),
        *operands,
        *aliased,
    )


def _call_aliased(kernel, n_prefetch, n_upd, in_specs, aliased, out_specs,
                  out_shapes, grid, scalars, operands, *, interpret):
    in_specs = list(in_specs) + [
        pl.BlockSpec(memory_space=pl.ANY) for _ in aliased
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[],
    )
    # Aliased inputs come AFTER the update operands; map them to outputs.
    # pallas_call input indices count scalar-prefetch args first.
    input_output_aliases = {
        n_prefetch + n_upd + i: i for i in range(len(aliased))
    }
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=tuple("arbitrary" for _ in grid),
        ),
        interpret=interpret,
    )(*scalars, *operands, *aliased)
