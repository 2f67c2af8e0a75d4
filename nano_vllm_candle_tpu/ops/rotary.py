"""Rotary position embeddings from explicit per-token positions.

The reference rebuilds cos/sin on host for positions ``0..t`` on every call
(``/root/reference/src/layers/rotary_embedding.rs:56-80``) — only valid
because it recomputes the whole sequence each step. A KV-cached TPU design
instead precomputes one ``[max_pos, head_dim/2]`` table at model build time
and gathers rows by per-token position ids inside jit, so prefill and decode
share a single code path and the table never leaves HBM.

Rotation convention: half-split ("neox-style"), matching the reference's
``apply_rotary`` (``rotary_embedding.rs:82-91``) and HF Qwen3's
``rotate_half``:
``out = [x1*cos - x2*sin, x2*cos + x1*sin]`` for ``x = [x1, x2]``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def build_rope_table(
    head_dim: int,
    max_position: int,
    theta: float = 1_000_000.0,
) -> Tuple[jax.Array, jax.Array]:
    """Precompute ``(cos, sin)`` each of shape ``[max_position, head_dim//2]``.

    ``inv_freq = theta ** (-2i/head_dim)`` as in ``rotary_embedding.rs:56-66``.
    Kept in float32; cast happens at application time.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    pos = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # [max_position, half]
    return jnp.cos(freqs), jnp.sin(freqs)


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """Compute ``(cos, sin)`` of shape ``[T, head_dim//2]`` directly from
    positions, on device.

    Cheaper than a precomputed table on TPU: XLA lowers a gather from a
    ``[max_pos, half]`` table into full-table dynamic slices (profiled at
    ~21 MB of HBM traffic *per decode step*), while computing the few
    ``T x half`` transcendentals on the VPU is effectively free.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope_positions(
    q: jax.Array,
    k: jax.Array,
    positions: jax.Array,
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """Rotate q ``[T, nq, hd]`` / k ``[T, nkv, hd]`` by per-token positions,
    computing cos/sin on the fly (see :func:`rope_cos_sin`)."""
    cos, sin = rope_cos_sin(positions, q.shape[-1], theta)
    cos = cos[:, None, :]
    sin = sin[:, None, :]

    def rotate(x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        x1, x2 = jnp.split(x32, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        return out.astype(x.dtype)

    return rotate(q), rotate(k)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    positions: jax.Array,
    cos_table: jax.Array,
    sin_table: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Rotate q and k by their positions.

    Args:
      q: ``[T, num_q_heads, head_dim]``.
      k: ``[T, num_kv_heads, head_dim]``.
      positions: ``[T]`` int32 absolute positions.
      cos_table/sin_table: ``[max_position, head_dim//2]`` from
        :func:`build_rope_table`.
    """
    cos = cos_table[positions][:, None, :]  # [T, 1, half] f32
    sin = sin_table[positions][:, None, :]

    def rotate(x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        x1, x2 = jnp.split(x32, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        return out.astype(x.dtype)

    return rotate(q), rotate(k)
