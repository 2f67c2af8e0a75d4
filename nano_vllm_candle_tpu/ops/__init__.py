"""Compute ops: norms, rotary, activations, attention, sampling.

Pure functional JAX, jit-friendly (static shapes, no Python control flow on
traced values). The reference's equivalents live in
``/root/reference/src/layers/`` — see each module's docstring for the mapping.
"""

from nano_vllm_candle_tpu.ops.layernorm import rms_norm, head_rms_norm
from nano_vllm_candle_tpu.ops.activation import silu_and_mul
from nano_vllm_candle_tpu.ops.rotary import build_rope_table, apply_rope
from nano_vllm_candle_tpu.ops.attention import (
    packed_prefill_attention,
    paged_decode_attention,
)
from nano_vllm_candle_tpu.ops.sampling import sample_tokens

__all__ = [
    "rms_norm",
    "head_rms_norm",
    "silu_and_mul",
    "build_rope_table",
    "apply_rope",
    "packed_prefill_attention",
    "paged_decode_attention",
    "sample_tokens",
]
