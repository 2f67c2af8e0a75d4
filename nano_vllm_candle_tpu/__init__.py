"""nano-vllm-candle-tpu: a TPU-native continuous-batching LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
nano-vllm-candle project (vLLM-style scheduler + paged KV cache + Qwen3 model,
see /root/reference/src/lib.rs:1-5 for the reference's module surface):

- ``engine``   — continuous-batching control plane (LLMEngine / Scheduler /
  BlockManager / Sequence), host-side Python like the reference's host-side Rust.
- ``models``   — Qwen3 decoder forward passes as jit-compiled functional JAX,
  with a paged KV cache resident on device.
- ``ops``      — RMSNorm / rotary / activation / attention / sampling ops.
- ``kernels``  — Pallas TPU kernels for the hot paths (paged attention, fused
  dequant matmul).
- ``parallel`` — jax.sharding Mesh plans: real tensor parallelism (the
  reference's linear.rs sharding scaffolding, plus the collectives it lacks).
"""

from nano_vllm_candle_tpu.sampling_params import SamplingParams
from nano_vllm_candle_tpu.config import Qwen3Config, EngineConfig
from nano_vllm_candle_tpu.engine.sequence import Sequence, SequenceStatus
from nano_vllm_candle_tpu.engine.block_manager import BlockManager, BlockManagerConfig
from nano_vllm_candle_tpu.engine.scheduler import Scheduler, SchedulerConfig
from nano_vllm_candle_tpu.engine.llm_engine import (
    LLMEngine,
    GenerationOutput,
    StepOutput,
    DummyModelRunner,
)


def __getattr__(name):  # lazy: LLM pulls in jax/models at import time
    if name == "LLM":
        from nano_vllm_candle_tpu.llm import LLM

        return LLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__version__ = "0.1.0"

__all__ = [
    "LLM",
    "SamplingParams",
    "Qwen3Config",
    "EngineConfig",
    "Sequence",
    "SequenceStatus",
    "BlockManager",
    "BlockManagerConfig",
    "Scheduler",
    "SchedulerConfig",
    "LLMEngine",
    "GenerationOutput",
    "StepOutput",
    "DummyModelRunner",
]
