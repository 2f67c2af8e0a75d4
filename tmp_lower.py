import time, jax, jax.numpy as jnp, numpy as np
from nano_vllm_candle_tpu.kernels.paged_decode import pallas_paged_decode_attention, grouped_supported
B, nq, nkv, hd, ps, P, W = 64, 16, 8, 128, 256, 321, 2
q = jnp.zeros((B, nq, hd), jnp.bfloat16)
kv = jnp.zeros((28, P, 2, nkv, ps, hd), jnp.int8)
kvs = jnp.zeros((28, P, 2, nkv, ps), jnp.float32)
bt = jnp.ones((B, W), jnp.int32)
sl = jnp.full((B,), 130, jnp.int32)
nk = jnp.zeros((B, nkv, hd), jnp.bfloat16)
assert grouped_supported(B, True, False, W)
f = jax.jit(lambda *a: pallas_paged_decode_attention(*a, kv_scale=kvs, layer_index=jnp.int32(0)), static_argnums=(4,))
t0=time.perf_counter()
lo = f.lower(q, kv, bt, sl, 0.088, nk, nk)
c = lo.compile()
print(f"grouped int8KV lower+compile ok in {time.perf_counter()-t0:.1f}s")
r = f(q, kv, bt, sl, 0.088, nk, nk); r.block_until_ready()
print("exec ok", r.shape, r.dtype)
# bf16 cache too
kvb = jnp.zeros((28, P, 2, nkv, ps, hd), jnp.bfloat16)
g = jax.jit(lambda *a: pallas_paged_decode_attention(*a, layer_index=jnp.int32(0)), static_argnums=(4,))
r2 = g(q, kvb, bt, sl, 0.088, nk, nk); r2.block_until_ready()
print("bf16 exec ok")
