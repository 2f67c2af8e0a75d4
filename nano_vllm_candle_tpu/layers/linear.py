"""Linear projections: plain bf16 and INT8/INT4 weight-only quantized.

Mapping from the reference's linear variants (``/root/reference/src/layers/
linear.rs``) to this TPU-native design:

| reference (linear.rs)          | here                                      |
|--------------------------------|-------------------------------------------|
| ``ReplicatedLinear`` 26-46     | plain array + ``P(None, None)``           |
| ``ColumnParallelLinear`` 48-90 | out-dim ``P(None, "tp")`` (mesh.py)       |
| ``MergedColumnParallel`` 92-119| separate gate/up arrays (loader.py note)  |
| ``QKVParallelLinear`` 121-175  | separate q/k/v arrays, same specs         |
| ``RowParallelLinear`` 177-223  | in-dim ``P("tp", None)`` + GSPMD psum     |

Quantization (the BASELINE.json north star the reference never had):
**weight-only sub-channel quantization** — weights are quantized along the
contraction (input) dim in groups of ``group_size`` (default 128 = one MXU
lane tile), symmetric, one scale per (group, out-channel):

    w[in, out] -> q[G, gs, out] int8/int4,  s[G, out] f32-ish

The matmul contracts per group in the integer domain and applies scales on
the [T, G, out] partials — so the MXU runs on int8/int4 operands (2-4x its
bf16 MACs/s) and dequantization collapses into the reduction epilogue. XLA
fuses this shape well; a hand-tuned Pallas twin lives in
``kernels/quant_matmul.py`` for the cases XLA leaves on the table.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp

WeightLike = Union[jax.Array, Dict[str, jax.Array]]

# Largest token count treated as a DECODE-shaped matmul (grouped exact-scale
# quant path / pallas stacked kernels); anything larger is prefill-shaped and
# takes the dequant-then-dense MXU path below. This is intentionally the
# same bound as kernels/quant_matmul.MAX_T (which imports it): a decode
# batch can only exceed it if max_num_seqs > 256 on one chip, at which point
# the dense path is a deliberate fallback (it materializes the dequantized
# weight per step — correct, but a bandwidth cliff; prefer dp sharding).
DECODE_MAX_T = 256

# Projections whose PLAIN (bf16) weights are stored transposed, i.e.
# ``[out, in]`` with the contraction on the LAST axis. Measured on v5e
# (decode shapes, [16, in] activations): contracting the minor/lane axis of
# the weight reads q/k/v ~20% and down_proj ~40% faster than the ``[in,
# out]`` orientation; gate/up/o_proj prefer ``[in, out]``. Torch checkpoints
# store ``[out, in]`` natively, so the loader simply skips the transpose for
# these. Quantized weights always use the ``[G, gs, out]`` group layout
# regardless (quantize_qwen3_params restores ``[in, out]`` first).
# ``qkv_proj`` is the fused q/k/v stack (fuse_qwen3_params), concatenated
# along the transposed out axis.
TRANSPOSED_PROJS = ("q_proj", "k_proj", "v_proj", "down_proj", "qkv_proj")


def QuantizedWeight(q: jax.Array, s: jax.Array, *, packed4: bool = False) -> Dict[str, jax.Array]:
    """A quantized weight is a plain dict pytree (scan/shard friendly).

    int8: ``{"q": int8 [..., G, gs, out], "s": f32 [..., G, out]}``.
    int4: ``{"q4": uint8 [..., G, gs/2, out], "s": ...}`` — two offset-coded
    nibbles per byte along the group axis. (Native ``jnp.int4`` arrays crash
    the axon TPU transfer path, and nibble-packing is the portable layout
    anyway: HBM reads are true 4-bit, unpack is VPU work fused ahead of the
    MXU.)

    The scales deliberately carry NO broadcast axis between G and out: a
    size-1 sublane dim forces XLA into a T(1,128) tiling whose strided
    copies measured ~2.4 ms/step on the [8, 1, 151936] lm_head scale plane
    at bs64 — consumers insert the broadcast axis at use sites instead.
    """
    return {("q4" if packed4 else "q"): q, "s": s}


def is_quantized(w: WeightLike) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w)


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """int values in [-8, 7], shape [..., gs, out] -> uint8 [..., gs/2, out].

    **Planar** packing: the low nibble holds group element ``i``, the high
    nibble element ``i + gs/2`` (the group's second half), NOT adjacent
    elements. This keeps each nibble plane a contiguous sublane run, so the
    Pallas dequant-matmul kernel (``kernels/quant_matmul.py``) splits the
    activation block with two static slices and never pays a sublane
    interleave/relayout.
    """
    n = (q + 8).astype(jnp.uint8)  # [1, 15] (0 unused: qmax 7 -> min -7+8=1)
    *lead, gs, out = n.shape
    low = n[..., : gs // 2, :]
    high = n[..., gs // 2 :, :]
    return (low | (high << 4)).astype(jnp.uint8)


def _unpack_nibbles(p: jax.Array) -> jax.Array:
    """uint8 [..., gs/2, out] -> int8 [..., gs, out] (inverse of pack)."""
    low = (p & 0xF).astype(jnp.int8) - 8
    high = (p >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([low, high], axis=-2)


def quantize_weight(
    w: jax.Array, bits: str = "int8", group_size: int = 128
) -> Dict[str, jax.Array]:
    """Symmetric sub-channel quantization of ``w[..., in, out]`` along the
    input dim. Leading axes (e.g. the stacked-layer axis) are preserved.

    Stacked weights quantize one leading slice at a time (``lax.map``):
    quantizing holds ~3x the slice in f32 temporaries, and doing the whole
    stack at once OOMs a 16 GB chip on 4B+ MLP stacks.
    """
    *lead, d_in, d_out = w.shape
    group_size = min(group_size, d_in)
    if d_in % group_size != 0:
        raise ValueError(f"in dim {d_in} not divisible by group_size {group_size}")
    G = d_in // group_size
    qmax = 127.0 if bits == "int8" else 7.0

    def quant_2d(w2):
        wf = w2.astype(jnp.float32).reshape(G, group_size, d_out)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [G, 1, out]
        scale = jnp.where(amax > 0, amax / qmax, 1.0)
        q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
        if bits == "int4":
            q = _pack_nibbles(q)
        return q, scale[:, 0, :].astype(jnp.float32)  # [G, out]

    if lead:
        flat = w.reshape(-1, d_in, d_out)
        q, s = jax.lax.map(quant_2d, flat)
        q = q.reshape(*lead, *q.shape[1:])
        s = s.reshape(*lead, G, d_out)
    else:
        q, s = quant_2d(w)
    return QuantizedWeight(q, s, packed4=(bits == "int4"))


def _int_values(w: Dict[str, jax.Array]) -> jax.Array:
    return _unpack_nibbles(w["q4"]) if "q4" in w else w["q"]


def dequantize_weight(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    q, s = _int_values(qw), qw["s"]
    *lead, G, gs, out = q.shape
    return (
        (q.astype(jnp.float32) * s[..., :, None, :])
        .reshape(*lead, G * gs, out).astype(dtype)
    )


def matmul(
    x: jax.Array,
    w: WeightLike,
    impl: str = "xla",
    layer_index: Optional[jax.Array] = None,
    transposed: bool = False,
    interpret: bool = False,
    pre_norm: Optional[tuple] = None,  # (residual|None, norm_weight, eps)
) -> jax.Array:
    """``x[T, in] @ w`` for plain or quantized weights.

    ``transposed=True`` means a plain weight is stored ``[out, in]`` and the
    contraction runs over its last axis (see ``TRANSPOSED_PROJS``); it is
    ignored for quantized weights, whose group layout fixes the orientation.

    Quantized path: per-group integer matmuls with the scale applied on the
    group partial sums — dequant never materializes the full bf16 weight.
    The int->compute dtype conversion (and int4 unpack) happens in VMEM,
    after the shrunken HBM read.

    ``impl="pallas"`` routes quantized weights through the hand-tuned fused
    dequant-matmul kernel and small-batch plain weights through the stacked
    dense kernel (``kernels/quant_matmul.py``) on supported shapes — XLA's
    own dense matmul streams weights at a fraction of the achievable rate
    at decode batch sizes (BASELINE.md machine calibration) and stays the
    prefill/fallback path.

    Weights (plain or quantized) may be the FULL layer stack (leading ``L``
    axis) with ``layer_index`` selecting the layer — mandatory for the
    pallas paths inside ``lax.scan`` (a pre-sliced pallas operand costs a
    full-weight HBM copy; the kernels index the stack in their BlockSpecs
    instead).

    ``pre_norm=(residual, norm_weight, eps)`` fuses the layer's
    residual-add + RMSNorm into the matmul and changes the return to
    ``(out, new_residual)``: on the pallas decode paths the norm runs in
    VMEM scratch inside the kernel (one fewer XLA fusion launch and
    [T, d_in] round trip per projection per layer); every other path
    falls back to ``ops.layernorm.rms_norm`` followed by the plain matmul
    — identical numerics either way.
    """
    if pre_norm is not None:
        residual, norm_weight, eps = pre_norm
        T = x.shape[0]
        from nano_vllm_candle_tpu.kernels import quant_matmul

        if impl == "pallas" and is_quantized(w) and quant_matmul.supported(w, T):
            return quant_matmul.pallas_quant_matmul(
                x, w, layer_index, interpret=interpret,
                norm_weight=norm_weight, residual=residual, eps=eps,
            )
        if (
            impl == "pallas" and not is_quantized(w)
            and isinstance(w, jax.Array) and w.ndim == 3
            and quant_matmul.dense_supported(w, T)
        ):
            return quant_matmul.pallas_dense_matmul(
                x, w, layer_index, transposed=transposed, interpret=interpret,
                norm_weight=norm_weight, residual=residual, eps=eps,
            )
        from nano_vllm_candle_tpu.ops.layernorm import rms_norm

        normed, new_residual = rms_norm(x, norm_weight, eps, residual)
        return (
            matmul(normed, w, impl, layer_index, transposed, interpret),
            new_residual,
        )
    if not is_quantized(w):
        if w.ndim == 3:  # stacked [L, ...] plain weights
            assert layer_index is not None, "stacked plain weights need layer_index"
            from nano_vllm_candle_tpu.kernels import quant_matmul

            if impl == "pallas" and quant_matmul.dense_supported(w, x.shape[0]):
                return quant_matmul.pallas_dense_matmul(
                    x, w, layer_index, transposed=transposed, interpret=interpret
                )
            w = jax.lax.dynamic_index_in_dim(w, layer_index, 0, keepdims=False)
        if transposed:
            return jax.lax.dot_general(
                x, w, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=x.dtype,
            )
        return x @ w
    if impl == "pallas":
        from nano_vllm_candle_tpu.kernels import quant_matmul

        if quant_matmul.supported(w, x.shape[0]):
            return quant_matmul.pallas_quant_matmul(
                x, w, layer_index, interpret=interpret
            )
    q, s = _int_values(w), w["s"]  # [(L,) G, gs, out], [(L,) G, out]
    if q.ndim == 4:  # stacked: slice this layer (XLA fuses it into the dot)
        assert layer_index is not None, "stacked quantized weights need layer_index"
        q = jax.lax.dynamic_index_in_dim(q, layer_index, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, layer_index, 0, keepdims=False)
    G, gs, out = q.shape
    T = x.shape[0]
    if T > DECODE_MAX_T:
        # Prefill-sized T: the grouped dot's [G, T, out] f32 partial dwarfs
        # the weight itself (measured 2.9 s TTFT for a 2048-token quantized
        # prefill vs 0.04 s bf16); dequantize to a [in, out] compute-dtype
        # weight and run one dense MXU matmul instead — prefill is
        # FLOP-bound, the dequant is noise. Decode batches (T <= 256) keep
        # the exact-scale grouped path / the fused Pallas kernel.
        wd = (
            (q.astype(jnp.float32) * s[:, None, :])
            .reshape(G * gs, out).astype(x.dtype)
        )
        # (Round-3 note: an optimization_barrier here — forcing wd to
        # materialize before the dot — was measured STRICTLY WORSE: int4
        # bs64 warm TTFT 1.03s -> 16.5s. XLA's fused dequant-into-dot is
        # the right schedule; leave it alone.)
        return x @ wd
    xg = x.reshape(T, G, gs)
    # partial[G, T, out] = sum_gs x[T, G, gs] * q[G, gs, out]
    partial = jax.lax.dot_general(
        xg, q.astype(x.dtype),
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32,
    )
    scaled = partial * s[:, None, :]  # broadcast over T
    return jnp.sum(scaled, axis=0).astype(x.dtype)


_QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    # fused forms (fuse_qwen3_params) — present instead of their parts
    "qkv_proj", "gate_up_proj",
)


def quantize_lm_head(
    params: Dict[str, Any], bits: str = "int8", group_size: int = 128,
    pad_vocab_to: int = 1,
) -> Dict[str, Any]:
    """Quantize ONLY the logits matmul's weight (EngineConfig.lm_head_dtype).

    The lm_head read is a first-order decode cost, not a rounding error:
    at 0.6B the tied 311 MB bf16 table re-read every step is ~20% of the
    per-step device budget (0.391 ms at bs8, BASELINE.md), and at 8B the
    untied 1.24 GB head dwarfs the int4 decoder weights. Tied models keep
    ``embed_tokens`` bf16 for the (tiny) gather and gain a quantized
    ``lm_head`` entry built from its transpose; untied models quantize
    ``lm_head`` in place (freeing the bf16 copy). Gated by argmax-parity
    and engine-path Δppl tests (tests/test_quant.py, tests/test_evals.py).

    ``pad_vocab_to``: pad the vocab (out) axis to this multiple BEFORE
    quantizing — under a tp mesh the head shards its vocab axis, and the
    fused-matmul island needs every LOCAL shard 128-lane aligned, so the
    runner passes ``tp * 128``. Pad columns quantize to q=0/s=1 (logit 0)
    and ``models/qwen3.compute_logits`` masks them to -inf before sampling.
    """
    out = dict(params)
    if "lm_head" in params:
        if is_quantized(params["lm_head"]):
            return out
        w = params["lm_head"]  # [H, V]
    else:
        w = jnp.swapaxes(params["embed_tokens"], 0, 1)  # [H, V]
    V = w.shape[-1]
    Vp = -(-V // pad_vocab_to) * pad_vocab_to
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))
    out["lm_head"] = quantize_weight(w, bits=bits, group_size=group_size)
    return out


def quantize_qwen3_params(
    params: Dict[str, Any], bits: str = "int8", group_size: int = 128
) -> Dict[str, Any]:
    """Quantize every decoder projection. Embeddings and norms stay bf16
    (the gather/norm reads are tiny); the lm_head is quantized SEPARATELY
    by ``quantize_lm_head`` (EngineConfig.lm_head_dtype) because its 311
    MB-1.24 GB per-step re-read is a first-order decode cost — see that
    function's docstring."""
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in _QUANT_TARGETS:
        if name not in params["layers"]:
            continue  # fused/unfused alternatives
        w = params["layers"][name]
        if is_quantized(w):
            continue
        if name in TRANSPOSED_PROJS:  # stored [L, out, in] -> [L, in, out]
            w = jnp.swapaxes(w, -1, -2)
        out["layers"][name] = quantize_weight(w, bits=bits, group_size=group_size)
    return out


def fuse_qwen3_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse q/k/v -> ``qkv_proj`` and gate/up -> ``gate_up_proj``.

    The reference fuses exactly these at load time
    (``/root/reference/src/models/qwen3.rs:171`` q/k/v into the
    ``QKVParallelLinear`` weight; ``qwen3.rs:310`` gate/up); here the payoff
    is TPU-shaped: one kernel dispatch streaming one contiguous weight slab
    instead of 2-3 (fewer Pallas pipeline spin-ups per decode layer — the
    weight stream never pauses between q, k and v), and the activation is
    read from VMEM once per fused group.

    Works on plain stacks (q/k/v are TRANSPOSED ``[L, out, in]`` — concat on
    the out axis; gate/up are ``[L, in, out]``) and on quantized dicts
    (concat ``q``/``q4``/``s`` along their out axis). Single-mesh only: a
    contiguous tp split of a fused out axis would mix q/k/v segments, so the
    runner fuses only when ``mesh is None``.
    """
    layers = dict(params["layers"])

    def cat(names, axis_plain):
        ws = [layers.pop(n) for n in names]
        if is_quantized(ws[0]):
            keys = ws[0].keys()
            return {k: jnp.concatenate([w[k] for w in ws], axis=-1) for k in keys}
        return jnp.concatenate(ws, axis=axis_plain)

    if "q_proj" in layers:
        layers["qkv_proj"] = cat(("q_proj", "k_proj", "v_proj"), 1)
    if "gate_proj" in layers:
        layers["gate_up_proj"] = cat(("gate_proj", "up_proj"), 2)
    out = dict(params)
    out["layers"] = layers
    return out
