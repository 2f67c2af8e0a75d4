"""Decode-step cost breakdown on the real chip (dev tool, not shipped API).

Over the tunneled chip per-dispatch timing lies, so each variant runs K
steps inside ONE jitted lax.scan (donated cache, like the engine's decode
burst) and we time the whole dispatch incl. fetching a tiny result.
Component costs come from ablation differences.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from nano_vllm_candle_tpu.config import Qwen3Config
from nano_vllm_candle_tpu.models import qwen3
from nano_vllm_candle_tpu.ops.sampling import sample_tokens


def main():
    from nano_vllm_candle_tpu.utils.jax_cache import enable_compilation_cache
    from nano_vllm_candle_tpu.utils.warmup import warm_transfer_async

    enable_compilation_cache()
    warm_transfer_async()  # overlap the minutes-long first-D2H handshake
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=200)
    ap.add_argument("--attn", default="pallas", choices=["pallas", "xla"])
    ap.add_argument(
        "--ablate", default="",
        help="comma-separated decode-layer stages to SKIP (cost-by-"
             f"difference forensics): any of {qwen3._ABLATABLE}",
    )
    ap.add_argument("--only-full", action="store_true",
                    help="measure only the full step (fast ablation runs)")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse qkv / gate_up stacks (fuse_qwen3_params)")
    ap.add_argument("--quantization", choices=["int8", "int4"])
    ap.add_argument("--kv-cache-dtype", default="bfloat16",
                    choices=["bfloat16", "int8"])
    args = ap.parse_args()
    if args.ablate:
        qwen3.ABLATE = frozenset(args.ablate.split(","))
        bad = qwen3.ABLATE - set(qwen3._ABLATABLE)
        assert not bad, f"unknown ablate stages {bad}"
        print(f"# ABLATING {sorted(qwen3.ABLATE)}")

    cfg = Qwen3Config.qwen3_0_6b()
    B, ps, K = args.batch, args.page_size, args.steps
    SL = args.seq_len
    W = -(-(SL + K + 1) // ps)
    P = 1 + B * W
    params = qwen3.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    if args.quantization:
        from nano_vllm_candle_tpu.layers.linear import quantize_qwen3_params

        params = quantize_qwen3_params(params, bits=args.quantization)
    if args.fuse:
        from nano_vllm_candle_tpu.layers.linear import fuse_qwen3_params

        params = fuse_qwen3_params(params)
    bt = np.zeros((B, W), np.int32)
    for i in range(B):
        bt[i] = 1 + i * W + np.arange(W)
    bt = jnp.asarray(bt)
    start_len = jnp.full((B,), SL, jnp.int32)

    def make_step(sl_override, do_logits, attn_impl):
        # params/bt/start_len MUST be jit ARGS, not closure constants: closure
        # device arrays get embedded as HLO literals (1.2 GB of weights →
        # unbounded compile time).
        def body_outer(prm, bt_a, sl_a, carry, i):
            kv, tok = carry
            pos = sl_a - 1 + i
            seq_lens = (
                jnp.full((B,), sl_override, jnp.int32)
                if sl_override else sl_a + i
            )
            page = jnp.take_along_axis(bt_a, (pos // ps)[:, None], axis=1)[:, 0]
            slot = page * ps + pos % ps
            batch = qwen3.DecodeBatch(
                token_ids=tok, positions=pos, slot_mapping=slot,
                block_tables=bt_a, seq_lens=seq_lens,
            )
            hidden, kv = qwen3.forward(
                prm, kv, batch, config=cfg, mode="decode",
                attn_impl=attn_impl)
            if do_logits:
                logits = qwen3.compute_logits(prm, hidden)
                tok = sample_tokens(
                    jax.random.fold_in(jax.random.key(0), i), logits,
                    jnp.zeros((B,)), jnp.zeros((B,), jnp.int32), jnp.ones((B,)),
                    max_top_k=64, use_top_k=False, use_top_p=False)
            else:
                tok = hidden[:, :1].astype(jnp.int32)[:, 0] % cfg.vocab_size
            return (kv, tok), ()

        @jax.jit
        def run(prm, bt_a, sl_a, kv, tok):
            (kv, tok), _ = jax.lax.scan(
                lambda c, i: body_outer(prm, bt_a, sl_a, c, i),
                (kv, tok), jnp.arange(K, dtype=jnp.int32))
            return kv, tok
        return run

    kv_dtype = jnp.int8 if args.kv_cache_dtype == "int8" else jnp.bfloat16

    def bench(run, label, reps=5):
        print(f"# compiling {label} ...", flush=True)
        kv = qwen3.init_kv_cache(cfg, P, ps, kv_dtype)
        tok = jnp.zeros((B,), jnp.int32)
        kv, t = run(params, bt, start_len, kv, tok)
        np.asarray(t)  # force round trip
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            kv, t = run(params, bt, start_len, kv, tok)
            np.asarray(t)
            best = min(best, time.perf_counter() - t0)
        per_step = best / K
        print(f"{label:34s} {per_step*1e3:7.3f} ms/step  {B/per_step:9,.0f} tok/s")
        return per_step

    bw = 819e9
    pbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    lm_bytes = cfg.vocab_size * cfg.hidden_size * 2
    kv_bytes = 2 * cfg.num_hidden_layers * B * (SL + K // 2) * cfg.num_key_value_heads * cfg.head_dim * 2
    print(f"# B={B} K={K} ps={ps} SL={SL} params={pbytes/1e6:.0f}MB "
          f"lm_head={lm_bytes/1e6:.0f}MB kv_read={kv_bytes/1e6:.0f}MB/step")
    print(f"# SoL full step: {(pbytes + kv_bytes)/bw*1e3:.3f} ms "
          f"({B*bw/(pbytes+kv_bytes):,.0f} tok/s)")

    t_full = bench(make_step(0, True, args.attn), f"full ({args.attn})")
    if args.only_full:
        return
    t_noattn = bench(make_step(1, True, args.attn), "attn @ seq_len=1")
    t_nolog = bench(
        make_step(0, False, args.attn), f"no logits/sample ({args.attn})")
    other = "xla" if args.attn == "pallas" else "pallas"
    bench(make_step(0, True, other), f"full ({other})")
    print(f"attention KV stream ~{(t_full - t_noattn)*1e3:7.3f} ms  (SoL KV read {kv_bytes/bw*1e3:.3f} ms)")
    print(f"logits+sample       ~{(t_full - t_nolog)*1e3:7.3f} ms  (SoL lm_head {lm_bytes/bw*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
