"""RMSNorm with the nano-vllm fused-residual contract.

Mirrors the reference semantics (``/root/reference/src/layers/layernorm.rs:44-60``):
``forward(x, residual) -> (normed, new_residual)`` where
``new_residual = x + residual`` and the norm is computed over ``new_residual``
in float32 then cast back to the input dtype. Threading the residual through
the norm lets XLA fuse the residual add, the reduction, and the scale into a
single HBM pass — the same reason the reference fuses them on CUDA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    residual: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """RMS-normalize ``x`` (optionally after adding ``residual``).

    Args:
      x: ``[..., H]`` activations.
      weight: ``[H]`` scale.
      eps: numerical epsilon (``layernorm.rs:14`` default 1e-6).
      residual: optional ``[..., H]`` residual to add before normalizing.

    Returns:
      ``(normed, new_residual)`` — both in ``x.dtype``. ``new_residual`` is
      ``x + residual`` (or ``x`` when residual is None), the value the next
      layer threads forward (``qwen3.rs:374-399`` residual contract).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if residual is not None:
        x32 = x32 + residual.astype(jnp.float32)
    new_residual = x32.astype(orig_dtype)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    normed = normed * weight.astype(jnp.float32)
    return normed.astype(orig_dtype), new_residual


def head_rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-head RMSNorm over the last (head_dim) axis, no residual.

    Qwen3 applies this to q and k per head *before* RoPE
    (``/root/reference/src/models/qwen3.rs:224-232``).

    Args:
      x: ``[..., num_heads, head_dim]``.
      weight: ``[head_dim]``.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return normed.astype(orig_dtype)
