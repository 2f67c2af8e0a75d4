import time, jax, jax.numpy as jnp
from nano_vllm_candle_tpu.kernels.flash_prefill import pallas_prefix_attention
T, nq, nkv, hd, ps, P, W = 4096, 16, 8, 128, 256, 261, 65
q = jnp.zeros((T, nq, hd), jnp.bfloat16)
kv = jnp.zeros((28, P, 2, nkv, ps, hd), jnp.int8)
kvs = jnp.zeros((28, P, 2, nkv, ps), jnp.float32)
bt = jnp.ones((W,), jnp.int32)
t0 = time.perf_counter()
o, m, l = pallas_prefix_attention(q, kv, bt, jnp.int32(12160), 0.088, kv_scale=kvs, layer_index=jnp.int32(0))
o.block_until_ready()
print(f"new prefix kernel compile+exec ok in {time.perf_counter()-t0:.1f}s")
import numpy as np
t0 = time.perf_counter()
for _ in range(20):
    o, m, l = pallas_prefix_attention(q, kv, bt, jnp.int32(12160), 0.088, kv_scale=kvs, layer_index=jnp.int32(0))
o.block_until_ready()
print(f"per-call (12k prefix, 4k chunk, 1 layer): {(time.perf_counter()-t0)/20*1e3:.2f} ms")
