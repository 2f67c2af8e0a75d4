"""Linear-layer machinery: quantized weights and the parallel-linear mapping.

The reference's ``src/layers/linear.rs`` defines five linear variants
(Replicated / ColumnParallel / MergedColumn / QKVParallel / RowParallel,
``linear.rs:22-223``) whose *sharding* behavior lives here as PartitionSpecs
(``parallel/mesh.py``) and whose *compute* behavior — including INT8/INT4
weight-only quantization — lives in ``layers/linear.py``.
"""

from nano_vllm_candle_tpu.layers.linear import (
    QuantizedWeight,
    matmul,
    quantize_weight,
    quantize_qwen3_params,
)

__all__ = ["QuantizedWeight", "matmul", "quantize_weight", "quantize_qwen3_params"]
