"""Pallas TPU kernels for the hot paths.

- ``paged_decode``  — paged-attention decode (block-table KV gather via async
  DMA + online softmax), replacing the XLA gather fallback in
  ``ops/attention.py``.
- ``flash_prefill`` — flash-style blockwise prefill with segment masking.
- ``quant_matmul``  — fused weight-dequant (INT8/INT4) matmul.

Each kernel has an XLA reference twin it is numerically validated against in
``tests/``; the model runner selects kernels per backend.
"""


def interpret_default() -> bool:
    """Whether Pallas calls should run in interpret mode: True off-TPU (CPU
    test meshes, ``dryrun_multichip``), False on real hardware. Evaluated at
    trace time so the same model code serves both."""
    import jax

    return jax.default_backend() == "cpu"
