"""Benchmark harness. Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

The reference publishes no numbers (``/root/reference/README.md:96-104``
documents only a benchmark command; SURVEY.md §6), so ``vs_baseline`` is the
fraction of the hardware **speed-of-light** decode rate: batched decode is
HBM-bandwidth-bound, so SOL tok/s = batch * HBM_BW / bytes_read_per_step
(weights + lm_head + KV read). Values > 1 are impossible; ~0.5+ is a healthy
serving engine. This is a stricter bar than the reference's self-reported
tok/s and is measurable on any chip.

Default config: Qwen3-0.6B shapes, bf16, random-init weights (no checkpoints
in this environment; perf is weight-value-independent), continuous batching
of 8 sequences, 128-token prompts, 128 decode steps on 1 chip.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


HBM_BW_BY_PLATFORM = {
    # bytes/s; conservative spec sheet numbers
    "tpu v5 lite": 819e9,   # v5e
    "tpu v5": 819e9,
    "tpu v4": 1228e9,
    "tpu v6 lite": 1640e9,  # v6e / trillium
    "cpu": 50e9,
}


def detect_bw(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in HBM_BW_BY_PLATFORM.items():
        if key in kind:
            return bw
    return HBM_BW_BY_PLATFORM["cpu"]


def param_bytes(params) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="0.6b", choices=["0.6b", "4b", "8b", "tiny"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--prompt-len", type=int, default=128)
    parser.add_argument("--decode-steps", type=int, default=128)
    parser.add_argument("--block-size", type=int, default=256,
                        help="KV page size in tokens (bigger pages = bigger "
                             "attention DMAs, fewer grid steps; 256 measured "
                             "best on v5e — the decode kernel's per-grid-step "
                             "fixed cost dominates below that)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel size (requires >= tp*dp real "
                             "chips; shards heads/ffn/vocab over ICI)")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel size (shards request slots; "
                             "crosses hosts/DCN in multi-process runs)")
    parser.add_argument("--quantization", choices=["int8", "int4"],
                        help="weight-only quantization (BASELINE configs 2-4)")
    parser.add_argument("--kv-cache-dtype", default=None,
                        choices=["bfloat16", "int8"])
    parser.add_argument("--tiny", action="store_true", help="tiny model on CPU (smoke)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.tiny:
        args.model = "tiny"

    import jax

    if args.cpu or args.model == "tiny":
        jax.config.update("jax_platforms", "cpu")

    # Fire the one-time tunneled-device D2H handshake NOW so it overlaps
    # init + compile. On the axon relay this reverse-channel establishment
    # measures 280-560s in a fresh process (utils/warmup.py) — it is
    # environment plumbing, not engine work, and round 2's "562.7s prefill
    # compile" was exactly this stall landing inside the first step's
    # device_get (true prefill compile: 4.3s cold, measured by AOT
    # lower+compile with a fresh compilation cache).
    from nano_vllm_candle_tpu.utils.warmup import warm_transfer_async, wait_warm

    warm_transfer_async()

    import jax.numpy as jnp
    import numpy as np

    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    cfg = {
        "0.6b": Qwen3Config.qwen3_0_6b,
        "4b": Qwen3Config.qwen3_4b,
        "8b": Qwen3Config.qwen3_8b,
        "tiny": Qwen3Config.tiny,
    }[args.model]()

    B = args.batch
    prompt_len = args.prompt_len if args.model != "tiny" else 16
    decode_steps = args.decode_steps if args.model != "tiny" else 16
    block_size = args.block_size if args.model != "tiny" else 16
    max_len = prompt_len + decode_steps + block_size
    blocks_per_seq = -(-max_len // block_size)
    num_blocks = 1 + B * blocks_per_seq

    dtype = "bfloat16" if args.model != "tiny" else "float32"
    kv_dtype = args.kv_cache_dtype or dtype
    eng = EngineConfig(
        max_num_seqs=B,
        max_num_batched_tokens=max(4096, B * prompt_len),
        num_kvcache_blocks=num_blocks,
        kvcache_block_size=block_size,
        max_model_len=max_len,
        dtype=dtype,
        kv_cache_dtype=kv_dtype,
        quantization=args.quantization,
        enable_prefix_caching=False,  # distinct prompts; keep bench honest
        use_pallas_kernels=True,
    )
    mesh = None
    n_chips = args.tp * args.dp
    if n_chips > 1:
        # Scaling harness (BASELINE configs 4-5). On a multi-chip host this
        # shards for real; tok/s/chip = value / n_chips. Multi-host runs
        # launch one process per host (parallel/distributed.initialize) —
        # each reports the same global tok/s.
        from nano_vllm_candle_tpu.parallel.distributed import (
            initialize, make_hybrid_mesh,
        )

        initialize()
        mesh = make_hybrid_mesh(tp=args.tp, dp=args.dp)
        eng.tp_size, eng.dp_size = args.tp, args.dp
    t0 = time.perf_counter()
    llm = LLM(config=cfg, engine_config=eng, mesh=mesh)
    print(f"# init {time.perf_counter()-t0:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(10, cfg.vocab_size - 10, prompt_len))) for _ in range(B)]
    sp = SamplingParams(temperature=0.0, max_tokens=decode_steps, ignore_eos=True)

    # --- wait out the D2H handshake before timing anything --------------------
    # The first device->host fetch of a process stalls minutes on the
    # tunneled chip (see warm_transfer_async above). It was issued in the
    # background before weight init; block here so the compile/TTFT numbers
    # below measure the engine, not the tunnel.
    t0 = time.perf_counter()
    wait_warm()
    handshake_s = time.perf_counter() - t0
    print(f"# d2h handshake drain {handshake_s:.1f}s (env plumbing, "
          "overlapped with init; excluded from compile/TTFT)", file=sys.stderr)

    # --- warmup: compile prefill + decode ------------------------------------
    t0 = time.perf_counter()
    for p in prompts:
        llm.add_request(p, sp)
    out = llm.step()  # prefill (compiles)
    assert out.is_prefill
    prefill_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    # finish warmup generation on the pipelined path (compiles both the
    # chained and unchained decode variants)
    llm.engine.run_until_done()
    decode_compile_s = time.perf_counter() - t0
    print(
        f"# compile: prefill {prefill_compile_s:.1f}s decode {decode_compile_s:.1f}s",
        file=sys.stderr,
    )

    # --- timed run -----------------------------------------------------------
    for p in prompts:
        llm.add_request(p, sp)
    t_prefill0 = time.perf_counter()
    out = llm.step()
    ttft_s = time.perf_counter() - t_prefill0
    assert out.is_prefill

    # decode runs the 2-deep pipelined driver (the serving path `generate`
    # uses): burst t+1 is dispatched before burst t's tokens are fetched, so
    # the tunnel round trip never stalls the chip.
    decode_before = llm.engine.metrics["decode_tokens"]
    t0 = time.perf_counter()
    llm.engine.run_until_done()
    decode_s = time.perf_counter() - t0
    n_decode = llm.engine.metrics["decode_tokens"] - decode_before
    tok_s = n_decode / decode_s

    # --- speed-of-light estimate ---------------------------------------------
    pbytes = param_bytes(llm.model_runner.params)
    # per decode step: read all weights once + tied lm_head again for logits
    itemsize = jnp.dtype(dtype).itemsize
    kv_itemsize = 1 if kv_dtype == "int8" else itemsize
    logit_bytes = cfg.vocab_size * cfg.hidden_size * itemsize
    kv_bytes_per_seq = (
        2 * cfg.num_hidden_layers * cfg.num_key_value_heads * cfg.head_dim
        * (prompt_len + decode_steps // 2) * kv_itemsize
    )
    step_bytes = pbytes + (logit_bytes if cfg.tie_word_embeddings else 0) + B * kv_bytes_per_seq
    bw = detect_bw(jax.devices()[0])
    sol_tok_s = B * bw / step_bytes

    wtag = args.quantization or dtype
    kvtag = "_kvint8" if kv_dtype == "int8" else ""
    chiptag = f"{n_chips}chip" if n_chips > 1 else "1chip"
    result = {
        "metric": f"decode_tok_s_qwen3_{args.model}_{wtag}{kvtag}_bs{B}_{chiptag}",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / sol_tok_s, 4),
        "extra": {
            "ttft_p50_s": round(ttft_s, 4),
            "prefill_compile_s": round(prefill_compile_s, 2),
            "decode_compile_s": round(decode_compile_s, 2),
            "d2h_handshake_s": round(handshake_s, 1),
            "sol_tok_s": round(sol_tok_s, 1),
            "prompt_len": prompt_len,
            "decode_steps": decode_steps,
            "device": str(jax.devices()[0]),
            "param_bytes": pbytes,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
