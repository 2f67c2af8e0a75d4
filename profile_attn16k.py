"""A/B the decode-attention kernels at long-context shapes (dev tool).

The grouped kernel's page-chunk grid (round 4) lifts its W cap; this
measures grouped (B padded to SEQ_BLOCK, chunked walk) vs the per-page
kernel at the 16k-context serving shape (bs4, W=64 int8 pages) — the data
that decides ``grouped_supported``'s long-context gate. Round-4 verdict:
grouped measured 1.5-1.7x SLOWER than per-page at bs4/W=64, so the gate
keeps long-context decode on the per-page kernel.

CAVEAT: absolute per-call times from this harness run well above the
engine's traced per-layer attention cost (the fori-loop dependency chain
serializes calls without the surrounding layer compute the real schedule
overlaps DMAs under); trust the RELATIVE grouped/per-page ratio, not the
GB/s column, and take end-to-end numbers from bench.py.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nano_vllm_candle_tpu.utils.jax_cache import enable_compilation_cache
    from nano_vllm_candle_tpu.utils.warmup import warm_transfer_async

    enable_compilation_cache()
    warm_transfer_async()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=16384)
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=56, help="kernel calls per"
                    " dispatch (~2 steps of a 28-layer model)")
    args = ap.parse_args()

    from nano_vllm_candle_tpu.kernels.paged_decode import (
        pallas_paged_decode_attention,
    )

    B, SL, ps = args.batch, args.seq_len, args.page_size
    nkv, nq, hd = 8, 16, 128
    W = -(-SL // ps)
    P = 1 + B * W
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (B, nq, hd), jnp.bfloat16)
    kv = jnp.clip(
        jax.random.normal(ks[1], (1, P, 2, nkv, ps, hd)) * 30, -127, 127
    ).astype(jnp.int8)
    s = jax.random.uniform(ks[2], (1, P, 2, nkv, ps), jnp.float32, 0.01, 0.1)
    nk = jax.random.normal(ks[3], (B, nkv, hd), jnp.bfloat16)
    nv = jax.random.normal(ks[3], (B, nkv, hd), jnp.bfloat16)
    bt = jnp.asarray(
        np.arange(1, P).reshape(B, W), jnp.int32
    )
    sl = jnp.full((B,), SL, jnp.int32)
    li = jnp.zeros((), jnp.int32)
    scale = hd**-0.5

    kv_bytes = B * W * ps * 2 * nkv * hd  # int8
    print(f"# B={B} SL={SL} W={W} ps={ps}: KV read {kv_bytes/1e6:.0f} MB "
          f"per call; DMA floor {kv_bytes/669e9*1e3:.3f} ms")

    def bench(force, label):
        @jax.jit
        def run(q, kv, s, bt, sl, nk, nv):
            def body(i, acc):
                o = pallas_paged_decode_attention(
                    q, kv, bt, sl, scale, nk, nv, kv_scale=s,
                    layer_index=li, force_grouped=force,
                )
                return acc + o.astype(jnp.float32)

            return jax.lax.fori_loop(
                0, args.iters, body, jnp.zeros((B, nq, hd), jnp.float32)
            )

        out = run(q, kv, s, bt, sl, nk, nv)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(q, kv, s, bt, sl, nk, nv))
            best = min(best, time.perf_counter() - t0)
        per_call = best / args.iters
        print(f"{label:24s} {per_call*1e3:8.3f} ms/call "
              f"({kv_bytes/per_call/1e9:6.0f} GB/s effective)")
        return out, per_call

    o_pp, t_pp = bench(False, "per-page kernel")
    o_g, t_g = bench(True, "grouped (chunked, padded)")
    d = np.abs(np.asarray(o_g) - np.asarray(o_pp)).max() / args.iters
    print(f"# max |delta|/call between impls: {d:.5f}")
    print(f"# grouped/per-page: {t_g/t_pp:.3f}x")


if __name__ == "__main__":
    main()
