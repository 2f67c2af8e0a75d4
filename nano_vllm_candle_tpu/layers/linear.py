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

    w[in, out] -> q[G, gs, out] int8/int4,  s[G, 1, out] f32-ish

The matmul contracts per group in the integer domain and applies scales on
the [T, G, out] partials — so the MXU runs on int8/int4 operands (2-4x its
bf16 MACs/s) and dequantization collapses into the reduction epilogue. XLA
fuses this shape well; a hand-tuned Pallas twin lives in
``kernels/quant_matmul.py`` for the cases XLA leaves on the table.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

WeightLike = Union[jax.Array, Dict[str, jax.Array]]


def QuantizedWeight(q: jax.Array, s: jax.Array, *, packed4: bool = False) -> Dict[str, jax.Array]:
    """A quantized weight is a plain dict pytree (scan/shard friendly).

    int8: ``{"q": int8 [..., G, gs, out], "s": f32 [..., G, 1, out]}``.
    int4: ``{"q4": uint8 [..., G, gs/2, out], "s": ...}`` — two offset-coded
    nibbles per byte along the group axis. (Native ``jnp.int4`` arrays crash
    the axon TPU transfer path, and nibble-packing is the portable layout
    anyway: HBM reads are true 4-bit, unpack is VPU work fused ahead of the
    MXU.)
    """
    return {("q4" if packed4 else "q"): q, "s": s}


def is_quantized(w: WeightLike) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w)


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """int values in [-8, 7], shape [..., gs, out] -> uint8 [..., gs/2, out]."""
    n = (q + 8).astype(jnp.uint8)  # [1, 15] (0 unused: qmax 7 -> min -7+8=1)
    *lead, gs, out = n.shape
    pairs = n.reshape(*lead, gs // 2, 2, out)
    return (pairs[..., 0, :] | (pairs[..., 1, :] << 4)).astype(jnp.uint8)


def _unpack_nibbles(p: jax.Array) -> jax.Array:
    """uint8 [..., gs/2, out] -> int8 [..., gs, out] (inverse of pack)."""
    low = (p & 0xF).astype(jnp.int8) - 8
    high = (p >> 4).astype(jnp.int8) - 8
    stacked = jnp.stack([low, high], axis=-2)  # [..., gs/2, 2, out]
    *lead, half, _, out = stacked.shape
    return stacked.reshape(*lead, half * 2, out)


def quantize_weight(
    w: jax.Array, bits: str = "int8", group_size: int = 128
) -> Dict[str, jax.Array]:
    """Symmetric sub-channel quantization of ``w[..., in, out]`` along the
    input dim. Leading axes (e.g. the stacked-layer axis) are preserved."""
    *lead, d_in, d_out = w.shape
    group_size = min(group_size, d_in)
    if d_in % group_size != 0:
        raise ValueError(f"in dim {d_in} not divisible by group_size {group_size}")
    G = d_in // group_size
    wf = w.astype(jnp.float32).reshape(*lead, G, group_size, d_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., G, 1, out]
    qmax = 127.0 if bits == "int8" else 7.0
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    s = scale.astype(jnp.float32)
    if bits == "int4":
        return QuantizedWeight(_pack_nibbles(q), s, packed4=True)
    return QuantizedWeight(q, s)


def _int_values(w: Dict[str, jax.Array]) -> jax.Array:
    return _unpack_nibbles(w["q4"]) if "q4" in w else w["q"]


def dequantize_weight(qw: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    q, s = _int_values(qw), qw["s"]
    *lead, G, gs, out = q.shape
    return (q.astype(jnp.float32) * s).reshape(*lead, G * gs, out).astype(dtype)


def matmul(x: jax.Array, w: WeightLike) -> jax.Array:
    """``x[T, in] @ w`` for plain or quantized weights.

    Quantized path: per-group integer matmuls with the scale applied on the
    group partial sums — dequant never materializes the full bf16 weight.
    The int->compute dtype conversion (and int4 unpack) happens in VMEM,
    after the shrunken HBM read.
    """
    if not is_quantized(w):
        return x @ w
    q, s = _int_values(w), w["s"]  # [G, gs, out], [G, 1, out]
    G, gs, out = q.shape
    T = x.shape[0]
    xg = x.reshape(T, G, gs)
    # partial[G, T, out] = sum_gs x[T, G, gs] * q[G, gs, out]
    partial = jax.lax.dot_general(
        xg, q.astype(x.dtype),
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32,
    )
    scaled = partial * s  # [G, 1, out] broadcasts over T
    return jnp.sum(scaled, axis=0).astype(x.dtype)


_QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
)


def quantize_qwen3_params(
    params: Dict[str, Any], bits: str = "int8", group_size: int = 128
) -> Dict[str, Any]:
    """Quantize every decoder projection; embeddings, norms and lm_head stay
    bf16 (tiny fraction of bytes; the lm_head matmul runs once per step)."""
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in _QUANT_TARGETS:
        out["layers"][name] = quantize_weight(
            params["layers"][name], bits=bits, group_size=group_size
        )
    return out
