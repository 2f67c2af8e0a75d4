"""Pallas TPU kernels for the hot paths.

- ``paged_decode``  — paged-attention decode (block-table KV gather via async
  DMA + online softmax), replacing the XLA gather fallback in
  ``ops/attention.py``.
- ``flash_prefill`` — flash-style blockwise prefill with segment masking.
- ``quant_matmul``  — fused weight-dequant (INT8/INT4) matmul.

Each kernel has an XLA reference twin it is numerically validated against in
``tests/``; the model runner selects kernels per backend.
"""
