"""Dense-path ablation on the real chip (dev tool).

Isolates the decode-step dense forward cost: pure matmul streaming with the
model's exact weight shapes/orientations vs. the full per-layer stack
(norms, rope, ring writes) minus attention/logits. Identifies whether the
gap to HBM speed-of-light is matmul layout or per-layer overhead.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from nano_vllm_candle_tpu.config import Qwen3Config
from nano_vllm_candle_tpu.models import qwen3


def timeit(fn, *args, reps=5, K=64):
    # np.asarray, not block_until_ready: over the tunneled chip the latter
    # returns before execution finishes; only a D2H fetch truly syncs.
    out = np.asarray(jax.tree.leaves(fn(*args))[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(jax.tree.leaves(fn(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()
    cfg = Qwen3Config.qwen3_0_6b()
    B, K = args.batch, args.steps
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Q, KV = cfg.q_size, cfg.kv_size
    params = qwen3.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    lw = params["layers"]

    layer_bytes = sum(
        np.prod(s) * 2
        for s in [(Q, H), (KV, H), (KV, H), (Q, H), (H, I), (H, I), (I, H)]
    )
    bw = 819e9
    print(f"# per-layer proj bytes {layer_bytes/1e6:.1f}MB; all-layer SoL "
          f"{L*layer_bytes/bw*1e3:.3f} ms")

    x0 = jnp.zeros((B, H), jnp.bfloat16)

    # --- 1. pure matmul chain, exact model orientations ----------------------
    @jax.jit
    def mm_chain(lw, x0):
        def step(x, _):
            def layer(x, w):
                q = x @ w["q_proj"].T
                k = x @ w["k_proj"].T
                v = x @ w["v_proj"].T
                a = (q + k.repeat(Q // KV, -1) + v.repeat(Q // KV, -1))
                h = (a @ w["o_proj"]).astype(jnp.bfloat16)
                g = h @ w["gate_proj"]
                u = h @ w["up_proj"]
                o = ((g * u) @ w["down_proj"].T).astype(jnp.bfloat16)
                return o, ()
            w = {k: lw[k] for k in ("q_proj", "k_proj", "v_proj", "o_proj",
                                    "gate_proj", "up_proj", "down_proj")}
            x, _ = jax.lax.scan(layer, x, w)
            return x, ()
        x, _ = jax.lax.scan(step, x0, jnp.arange(K))
        return x

    t = timeit(mm_chain, lw, x0, K=K)
    print(f"matmul chain (scan over L)        {t*1e3:7.3f} ms/step  "
          f"({L*layer_bytes/bw*1e3:.3f} SoL)")

    # --- 2. same but unrolled over layers (no scan) ---------------------------
    @jax.jit
    def mm_unrolled(lw, x0):
        def step(x, _):
            for l in range(L):
                q = x @ lw["q_proj"][l].T
                k = x @ lw["k_proj"][l].T
                v = x @ lw["v_proj"][l].T
                a = (q + k.repeat(Q // KV, -1) + v.repeat(Q // KV, -1))
                h = (a @ lw["o_proj"][l]).astype(jnp.bfloat16)
                g = h @ lw["gate_proj"][l]
                u = h @ lw["up_proj"][l]
                x = ((g * u) @ lw["down_proj"][l].T).astype(jnp.bfloat16)
            return x, ()
        x, _ = jax.lax.scan(step, x0, jnp.arange(K))
        return x

    t = timeit(mm_unrolled, lw, x0, K=K)
    print(f"matmul chain (unrolled layers)    {t*1e3:7.3f} ms/step")

    # --- 3. fused qkv / gate-up (fewer, bigger matmuls) -----------------------
    qkv_w = jnp.concatenate([lw["q_proj"], lw["k_proj"], lw["v_proj"]], axis=1)
    gu_w = jnp.concatenate([lw["gate_proj"], lw["up_proj"]], axis=2)

    @jax.jit
    def mm_fused(qkv_w, gu_w, o_w, d_w, x0):
        def step(x, _):
            def layer(x, w):
                qkv = x @ w["qkv"].T
                q = qkv[:, :Q]
                h = (q @ w["o"]).astype(jnp.bfloat16)
                gu = h @ w["gu"]
                o = ((gu[:, :I] * gu[:, I:]) @ w["d"].T).astype(jnp.bfloat16)
                return o, ()
            x, _ = jax.lax.scan(layer, x, {"qkv": qkv_w, "o": o_w, "gu": gu_w, "d": d_w})
            return x, ()
        x, _ = jax.lax.scan(step, x0, jnp.arange(K))
        return x

    t = timeit(mm_fused, qkv_w, gu_w, lw["o_proj"], lw["down_proj"], x0, K=K)
    print(f"matmul chain (fused qkv+gateup)   {t*1e3:7.3f} ms/step")

    # --- 4. fused chain through the pallas stacked dense kernel --------------
    from nano_vllm_candle_tpu.layers.linear import matmul

    @jax.jit
    def mm_fused_pallas(qkv_w, gu_w, o_w, d_w, x0):
        def step(x, _):
            def layer(x, li):
                qkv = matmul(x, qkv_w, "pallas", li, transposed=True)
                q = qkv[:, :Q]
                h = matmul(q, o_w, "pallas", li).astype(jnp.bfloat16)
                gu = matmul(h, gu_w, "pallas", li)
                o = matmul(
                    (gu[:, :I] * gu[:, I:]).astype(jnp.bfloat16),
                    d_w, "pallas", li, transposed=True,
                ).astype(jnp.bfloat16)
                return o, ()
            x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return x, ()
        x, _ = jax.lax.scan(step, x0, jnp.arange(K))
        return x

    t = timeit(mm_fused_pallas, qkv_w, gu_w, lw["o_proj"], lw["down_proj"], x0, K=K)
    print(f"matmul chain (fused, pallas)      {t*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
