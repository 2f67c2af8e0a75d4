"""Parallelism: device meshes, sharding plans, multi-host init.

The reference's tensor parallelism is load-time weight slicing with **no
collectives** (``/root/reference/src/tp.rs:21-31``,
``src/layers/linear.rs:184-198`` — RowParallel forward lacks its all-reduce,
so TP>1 is numerically wrong there; SURVEY.md §2.6). Here TP is real:
``jax.sharding`` NamedShardings over a Mesh, with GSPMD inserting the
psum/all-gather collectives over ICI.
"""

from nano_vllm_candle_tpu.parallel.mesh import (
    make_mesh,
    qwen3_param_pspecs,
    kv_cache_pspec,
    shard_params,
    shard_kv_cache,
)
from nano_vllm_candle_tpu.parallel.distributed import (
    initialize,
    make_hybrid_mesh,
)

__all__ = [
    "make_mesh",
    "qwen3_param_pspecs",
    "kv_cache_pspec",
    "shard_params",
    "shard_kv_cache",
    "initialize",
    "make_hybrid_mesh",
]
