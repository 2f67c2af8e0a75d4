"""Pallas TPU fused dequant+matmul kernel for INT8/INT4 weight-only linears.

SURVEY.md §7 hard part #2: the reference has no quantization at all (F32
everywhere, ``/root/reference/src/models/qwen3.rs:515-523``); BASELINE.json's
north star is INT4/INT8 weight-only decode at speed-of-light. Decode-time
linears are HBM-bandwidth-bound — the win is reading 1/4- or 1/2-width
weights and dequantizing *after* the HBM→VMEM DMA, inside the kernel.

Computes ``x[T, d_in] @ W`` where ``W`` is sub-channel quantized
(``layers/linear.py:quantize_weight``): ``q[G, gs, out]`` int8 (or planar
nibble-packed ``q4[G, gs/2, out]`` uint8) with per-(group, out-channel)
scales ``s[G, out]``.

Shape strategy — everything follows from keeping the weight stream
CONTIGUOUS (v5e HBM DMAs hit peak only on long unbroken runs):

- grid = ``(G,)``, one step per contraction group. The step's weight block
  ``q[g]`` = ``[gs, out]`` is a contiguous 1.5-6 MB slab (leading-axis
  slice), double-buffered by the Pallas pipeline. Two earlier revisions
  tiled the minor ``out`` axis — every DMA row broke into 512 B strided
  runs and the kernel capped at ~230 GB/s, 3x below XLA's grouped-dot.
- The f32 accumulator ``[T, out]`` lives in VMEM scratch across steps:
  ``acc += (x[:, g·gs:(g+1)·gs] @ w_int.astype(bf16)) * s[g]`` — the MXU
  runs on the int values cast in VMEM, and the group scale rides the f32
  partial sums (bit-identical semantics to the XLA twin, no bf16 dequant
  rounding).
- ``T`` is capped at MAX_T (decode batches): prefill quant matmuls are
  MXU-bound, which XLA's grouped-dot path already handles at peak.

INT4 blocks unpack with two static sublane slices (planar nibble layout,
``_pack_nibbles``) widened to int32 first: Mosaic cannot legalize int8
vector subtraction on packed narrow layouts.

The XLA twin is ``layers/linear.py:matmul``; tests validate both ways
(tests/test_kernels.py) and ``matmul(impl="pallas")`` dispatches here.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nano_vllm_candle_tpu.layers.linear import DECODE_MAX_T as MAX_T  # noqa: E402
# larger T (prefill buckets) routes to the XLA dequant-then-dense path; the
# bound is shared with layers/linear so the two dispatch layers cannot drift


def _norm_into_scratch(x_ref, res_ref, nw_ref, xn_ref, r_out_ref, eps):
    """Fused pre-norm (kernels' shared helper): residual-add + RMSNorm of
    the WHOLE [T, d_in] activation row into the ``xn_ref`` VMEM scratch,
    plus the new residual output — replicating ``ops/layernorm.rms_norm``
    numerics exactly (f32 add/reduce/scale, cast back). Runs once on the
    first grid step; later steps read slices of ``xn_ref``, so the separate
    XLA norm fusion (launch + [T, d_in] round trip per layer) disappears
    into the matmul's DMA shadow."""
    x32 = x_ref[...].astype(jnp.float32)
    if res_ref is not None:
        x32 = x32 + res_ref[...].astype(jnp.float32)
    r_out_ref[...] = x32.astype(r_out_ref.dtype)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    normed = normed * nw_ref[0].astype(jnp.float32)[None, :]
    xn_ref[...] = normed.astype(xn_ref.dtype)


def _kernel(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups: int, packed4: bool):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # [T, gs]
    # s block is the layer's FULL [G, out] scale plane (constant index map:
    # DMA'd once per call, not per group step); this group's row comes from
    # a dynamic sublane slice. A per-group (1, 1, out) block would need a
    # broadcast axis to satisfy Mosaic's block-divisibility rule, and that
    # axis gives the scale tensor a T(1,128) layout XLA pays strided-copy
    # tax on (measured on the [8, 1, 151936] lm_head scales at bs64).
    s_row = s_ref[0, pl.ds(g, 1)]  # [1, out]
    if packed4:
        # Unpack to UNSIGNED nibbles and let the matmul run on [0, 15]
        # values, correcting the -8 zero-point afterwards:
        #   dot(x, n - 8) == dot(x, n) - 8 * rowsum(x)
        # The rowsum is a [T, 1] column (vs two [gs/2, out] vector
        # subtractions per block) — measured 6% faster end-to-end at T=64
        # (round-3 microbench, variant C vs A). Widening to int32 first is
        # still required: Mosaic cannot legalize int8/uint8 vector ops on
        # packed narrow layouts.
        p = q_ref[0, 0].astype(jnp.int32)  # [gs/2, out], planar nibbles
        w = jnp.concatenate([p & 0xF, p >> 4], axis=0).astype(x.dtype)
        d = jnp.dot(x, w, preferred_element_type=jnp.float32)
        d -= 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += d * s_row
    else:
        w = q_ref[0, 0].astype(x.dtype)  # [gs, out], cast in VMEM
        acc_ref[...] += (
            jnp.dot(x, w, preferred_element_type=jnp.float32) * s_row
        )

    @pl.when(g == n_groups - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_norm(
    li_ref, x_ref, *rest, n_groups: int, packed4: bool, gs: int,
    has_res: bool, eps: float,
):
    """Fused-norm variant of ``_kernel``: takes the RAW [T, d_in] hidden
    (+ optional residual) and the norm weight, normalizes once into VMEM
    scratch on the first grid step, and contracts per-group slices of the
    scratch. Also emits the new residual (the layer's carry)."""
    if has_res:
        res_ref, nw_ref, q_ref, s_ref, o_ref, r_out_ref, acc_ref, xn_ref = rest
    else:
        nw_ref, q_ref, s_ref, o_ref, r_out_ref, acc_ref, xn_ref = rest
        res_ref = None
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        _norm_into_scratch(x_ref, res_ref, nw_ref, xn_ref, r_out_ref, eps)

    x = xn_ref[:, pl.ds(g * gs, gs)]  # [T, gs] normed slice
    s_row = s_ref[0, pl.ds(g, 1)]  # [1, out]
    if packed4:
        p = q_ref[0, 0].astype(jnp.int32)
        w = jnp.concatenate([p & 0xF, p >> 4], axis=0).astype(x.dtype)
        d = jnp.dot(x, w, preferred_element_type=jnp.float32)
        d -= 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += d * s_row
    else:
        w = q_ref[0, 0].astype(x.dtype)
        acc_ref[...] += (
            jnp.dot(x, w, preferred_element_type=jnp.float32) * s_row
        )

    @pl.when(g == n_groups - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _dense_kernel_acc(li_ref, x_ref, w_ref, o_ref, acc_ref, *, n_groups: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(g == n_groups - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _dense_kernel_tile(li_ref, x_ref, w_ref, o_ref):
    # transposed storage [out_tile, d_in]: full contraction per grid step,
    # each step owns one output tile — no accumulator carry.
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _dense_kernel_acc_norm(
    li_ref, x_ref, *rest, n_groups: int, gs: int, has_res: bool, eps: float
):
    if has_res:
        res_ref, nw_ref, w_ref, o_ref, r_out_ref, acc_ref, xn_ref = rest
    else:
        nw_ref, w_ref, o_ref, r_out_ref, acc_ref, xn_ref = rest
        res_ref = None
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        _norm_into_scratch(x_ref, res_ref, nw_ref, xn_ref, r_out_ref, eps)

    acc_ref[...] += jnp.dot(
        xn_ref[:, pl.ds(g * gs, gs)], w_ref[0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(g == n_groups - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _dense_kernel_tile_norm(
    li_ref, x_ref, *rest, has_res: bool, eps: float
):
    if has_res:
        res_ref, nw_ref, w_ref, o_ref, r_out_ref, xn_ref = rest
    else:
        nw_ref, w_ref, o_ref, r_out_ref, xn_ref = rest
        res_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        _norm_into_scratch(x_ref, res_ref, nw_ref, xn_ref, r_out_ref, eps)

    o_ref[...] = jax.lax.dot_general(
        xn_ref[...], w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _tile_of(n: int, want: int = 512) -> int:
    for t in (want, 256, 128):
        if n % t == 0:
            return t
    return n


def dense_supported(w: jax.Array, T: int) -> bool:
    """Whether the stacked plain-bf16 kernel can run this weight/batch."""
    return (
        w.ndim == 3 and T <= MAX_T
        and w.shape[-1] % 128 == 0 and w.shape[-2] % 128 == 0
    )


@functools.partial(
    jax.jit, static_argnames=("transposed", "interpret", "eps"))
def pallas_dense_matmul(
    x: jax.Array,  # [T, d_in]
    w: jax.Array,  # [L, d_in, out] or [L, out, d_in] (transposed)
    layer_index: jax.Array,
    *,
    transposed: bool = False,
    interpret: bool = False,
    norm_weight: jax.Array = None,  # [d_in] — fuse residual-add + RMSNorm
    residual: jax.Array = None,  # [T, d_in] (optional even with norm_weight)
    eps: float = 1e-6,
) -> jax.Array:
    """``x @ w[layer_index]`` for plain stacked decode weights.

    XLA's small-batch dense matmuls stream weights at only ~175–330 GB/s on
    v5e and degrade further as the batch grows (BASELINE.md machine
    calibration); this kernel holds ~33 us per 12.6 MB projection from
    batch 8 through 128 (the MXU weight-load floor + DMA), measured ~1.7x
    faster end-to-end at batch 64. Like ``pallas_quant_matmul``, the FULL
    ``[L, ...]`` stack is taken with the layer resolved in the BlockSpec
    index map so a ``lax.scan`` never materializes a sliced copy.

    Transposed ([L, out, d_in]) weights tile the output dim (contiguous
    leading-axis blocks, full contraction per step, no accumulator); normal
    ([L, d_in, out]) weights tile the contraction dim with an f32 VMEM
    accumulator.
    """
    T, d_in = x.shape
    L = w.shape[0]
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)
    fused_norm = norm_weight is not None
    has_res = residual is not None
    assert has_res is False or fused_norm, "residual requires norm_weight"
    whole_x = pl.BlockSpec((T, d_in), lambda *_: (0, 0))
    norm_ops, norm_specs = [], []
    if fused_norm:
        if has_res:
            norm_ops.append(residual)
            norm_specs.append(whole_x)
        norm_ops.append(norm_weight.reshape(1, d_in))
        norm_specs.append(pl.BlockSpec((1, d_in), lambda *_: (0, 0)))
    if transposed:
        out, d_in_w = w.shape[1], w.shape[2]
        assert d_in_w == d_in, (w.shape, x.shape)
        OT = _tile_of(out)
        in_specs = [whole_x] + norm_specs + [
            pl.BlockSpec((1, OT, d_in), lambda t, li_ref: (li_ref[0], t, 0)),
        ]
        out_specs = pl.BlockSpec((T, OT), lambda t, li_ref: (0, t))
        scratch = []
        if fused_norm:
            out_specs = (out_specs, whole_x)
            scratch = [pltpu.VMEM((T, d_in), x.dtype)]  # xn
            kernel = functools.partial(
                _dense_kernel_tile_norm, has_res=has_res, eps=eps)
        else:
            kernel = _dense_kernel_tile
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(out // OT,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
    else:
        d_in_w, out = w.shape[1], w.shape[2]
        assert d_in_w == d_in, (w.shape, x.shape)
        gs = _tile_of(d_in, 256)
        G = d_in // gs
        in_specs = norm_specs + [
            pl.BlockSpec((1, gs, out), lambda g, li_ref: (li_ref[0], g, 0)),
        ]
        out_specs = pl.BlockSpec((T, out), lambda g, li_ref: (0, 0))
        scratch = [pltpu.VMEM((T, out), jnp.float32)]  # acc
        if fused_norm:
            in_specs = [whole_x] + in_specs
            out_specs = (out_specs, whole_x)
            scratch.append(pltpu.VMEM((T, d_in), x.dtype))  # xn
            kernel = functools.partial(
                _dense_kernel_acc_norm, n_groups=G, gs=gs,
                has_res=has_res, eps=eps)
        else:
            in_specs = [
                pl.BlockSpec((T, gs), lambda g, li_ref: (0, g))
            ] + in_specs
            kernel = functools.partial(_dense_kernel_acc, n_groups=G)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
    out_shape = jax.ShapeDtypeStruct((T, out), x.dtype)
    if fused_norm:
        out_shape = (out_shape, jax.ShapeDtypeStruct((T, d_in), x.dtype))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(li, x, *norm_ops, w)


def supported(qw: Dict[str, jax.Array], T: int) -> bool:
    """Whether this kernel can run the given quantized weight and batch.

    Accepts the per-layer form (``q.ndim == 3``) and the stacked form
    (``q.ndim == 4`` with a leading layer axis, indexed by ``layer_index``).
    """
    q = qw.get("q4", qw.get("q"))
    return (
        q is not None and q.ndim in (3, 4) and q.shape[-1] % 128 == 0
        and T <= MAX_T
    )


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def pallas_quant_matmul(
    x: jax.Array,  # [T, d_in]
    qw: Dict[str, jax.Array],  # {"q"|"q4": [(L,)G,gs,out], "s": [(L,)G,out]}
    layer_index: jax.Array | None = None,  # required for stacked (4-dim) qw
    *,
    interpret: bool = False,
    norm_weight: jax.Array = None,  # [d_in] — fuse residual-add + RMSNorm
    residual: jax.Array = None,  # [T, d_in]
    eps: float = 1e-6,
) -> jax.Array:
    """``x @ dequant(qw)`` with the dequant fused into the weight stream.

    The stacked form takes the FULL ``[L, ...]`` weight stack plus a runtime
    ``layer_index`` resolved inside the BlockSpec index map (same pattern as
    ``paged_decode`` with the stacked KV cache): inside a ``lax.scan`` over
    layers, passing a sliced operand to a pallas call makes XLA materialize
    the slice as a full HBM copy first — profiled at 154 us/layer of pure
    copy against the kernel's 35 us — while BlockSpec-level indexing DMAs
    straight from the stack.
    """
    packed4 = "q4" in qw
    q = qw["q4"] if packed4 else qw["q"]
    s = qw["s"]
    if q.ndim == 3:  # single-layer convenience form
        q = q[None]
        s = s[None]
        layer_index = jnp.zeros((), jnp.int32)
    assert layer_index is not None, "stacked quantized weights need layer_index"
    L, G, rows, out = q.shape
    gs = rows * 2 if packed4 else rows
    T, d_in = x.shape
    assert d_in == G * gs, f"x in-dim {d_in} != G*gs {G * gs}"
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)

    flops = 2 * T * d_in * out
    bytes_accessed = (
        x.size * x.dtype.itemsize + q.size // L + s.size // L * 4
        + T * out * x.dtype.itemsize
    )
    fused_norm = norm_weight is not None
    has_res = residual is not None
    assert not has_res or fused_norm, "residual requires norm_weight"
    weight_specs = [
        pl.BlockSpec((1, 1, rows, out), lambda g, li_ref: (li_ref[0], g, 0, 0)),
        # scales [L, G, out]: the layer's full plane with a CONSTANT
        # index map (Pallas skips the re-DMA on unchanged blocks), the
        # kernel slices its group's row. See _kernel for why not a
        # per-group block.
        pl.BlockSpec((1, G, out), lambda g, li_ref: (li_ref[0], 0, 0)),
    ]
    out_specs = pl.BlockSpec((T, out), lambda g, li_ref: (0, 0))
    out_shape = jax.ShapeDtypeStruct((T, out), x.dtype)
    scratch = [pltpu.VMEM((T, out), jnp.float32)]  # acc
    if fused_norm:
        whole_x = pl.BlockSpec((T, d_in), lambda *_: (0, 0))
        in_specs = [whole_x]
        operands = [x]
        if has_res:
            in_specs.append(whole_x)
            operands.append(residual)
        in_specs.append(pl.BlockSpec((1, d_in), lambda *_: (0, 0)))
        operands.append(norm_weight.reshape(1, d_in))
        in_specs += weight_specs
        operands += [q, s]
        out_specs = (out_specs, whole_x)
        out_shape = (out_shape, jax.ShapeDtypeStruct((T, d_in), x.dtype))
        scratch.append(pltpu.VMEM((T, d_in), x.dtype))  # xn
        kernel = functools.partial(
            _kernel_norm, n_groups=G, packed4=packed4, gs=gs,
            has_res=has_res, eps=eps)
    else:
        in_specs = [
            pl.BlockSpec((T, gs), lambda g, li_ref: (0, g))
        ] + weight_specs
        operands = [x, q, s]
        kernel = functools.partial(_kernel, n_groups=G, packed4=packed4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(li, *operands)
