"""SwiGLU activation (SiLU-and-mul).

Mirrors ``/root/reference/src/layers/activation.rs:4-18``: chunk the last dim
in two, ``silu(gate) * up``. XLA fuses this elementwise op into the
surrounding matmuls on TPU, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """``silu(gate_up[..., :d]) * gate_up[..., d:]`` with ``d = last_dim/2``."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up
