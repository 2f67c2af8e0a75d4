"""Quantized dense-path ablation on the real chip (dev tool).

Times a decode-shaped scan over layers of the 7 projection matmuls in
isolation — pallas fused dequant kernel vs XLA grouped-dot twin vs plain
bf16 — to locate the quant path's gap to HBM speed-of-light.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from nano_vllm_candle_tpu.config import Qwen3Config
from nano_vllm_candle_tpu.layers.linear import matmul, quantize_qwen3_params
from nano_vllm_candle_tpu.models import qwen3

PROJS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--bits", default="int4", choices=["int8", "int4"])
    args = ap.parse_args()
    cfg = Qwen3Config.qwen3_0_6b()
    B, K = args.batch, args.steps
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Q, KV = cfg.q_size, cfg.kv_size
    params = qwen3.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    qparams = quantize_qwen3_params(params, bits=args.bits)
    qlw = qparams["layers"]
    lw = params["layers"]
    in_dims = {"q_proj": H, "k_proj": H, "v_proj": H, "o_proj": Q,
               "gate_proj": H, "up_proj": H, "down_proj": I}

    wbits = 4 if args.bits == "int4" else 8
    layer_bytes = sum(
        in_dims[n] * o * wbits // 8 + (in_dims[n] // 128) * o * 4
        for n, o in [("q_proj", Q), ("k_proj", KV), ("v_proj", KV),
                     ("o_proj", H), ("gate_proj", I), ("up_proj", I),
                     ("down_proj", H)]
    )
    bw = 819e9
    print(f"# per-layer quant bytes {layer_bytes/1e6:.1f}MB; "
          f"all-layer SoL {L*layer_bytes/bw*1e3:.3f} ms")

    x0 = jax.random.normal(jax.random.key(1), (B, H), jnp.bfloat16)

    def make(impl, plain):
        @jax.jit
        def run(w, x0):
            def step(x, _):
                def layer(x, li):
                    outs = []
                    for name in PROJS:
                        xin = jnp.tile(x, (1, in_dims[name] // H))
                        if plain:
                            t = name in ("q_proj", "k_proj", "v_proj", "down_proj")
                            wl = jax.lax.dynamic_index_in_dim(
                                w[name], li, 0, keepdims=False)
                            y = matmul(xin, wl, "xla", transposed=t)
                        else:
                            y = matmul(xin, w[name], impl, li)
                        outs.append(y[:, :H].astype(jnp.float32))
                    x = sum(outs).astype(jnp.bfloat16)
                    return x / (1e-6 + jnp.abs(x).max()), None

                x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
                return x, None
            x, _ = jax.lax.scan(step, x0, jnp.arange(K))
            return x
        return run

    def bench(label, impl, weights, plain=False):
        run = make(impl, plain)
        np.asarray(run(weights, x0))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(weights, x0))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s} {best/K*1e3:7.3f} ms/step")

    qw = {n: qlw[n] for n in PROJS}
    pw = {n: lw[n] for n in PROJS}
    bench(f"pallas {args.bits}", "pallas", qw)
    bench(f"xla    {args.bits}", "xla", qw)
    bench("bf16 plain", "xla", pw, plain=True)


if __name__ == "__main__":
    main()
