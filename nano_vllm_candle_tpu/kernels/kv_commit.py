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
    in_specs = in_specs + [
        pl.BlockSpec(memory_space=pl.ANY) for _ in aliased
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(N,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[],
    )
    # Aliased inputs come AFTER the update operands; map them to outputs.
    # pallas_call input indices count scalar-prefetch args first.
    input_output_aliases = {
        n_prefetch + n_upd + i: i for i in range(len(aliased))
    }
    out = pl.pallas_call(
        kernel,
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
        *operands,
        *aliased,
    )
    return out
