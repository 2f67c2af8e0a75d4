"""Command-line interface.

Mirrors the reference CLI (``/root/reference/src/main.rs:84-112``): prompt,
temperature (default 0.6), max_tokens (default 256), ignore_eos, log level,
device — plus TPU-native flags (tp size, quantization, random-init model
presets for checkpoint-free runs). Reports the same exit stats the reference
prints (``main.rs:238-252``): token counts, wall time, throughput.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nano-vllm-candle-tpu",
        description="TPU-native LLM inference engine (JAX/XLA/Pallas)",
    )
    p.add_argument("--model", help="HF model directory (config.json + safetensors + tokenizer.json)")
    p.add_argument("--preset", choices=["tiny", "0.6b", "4b", "8b", "32b"],
                   help="random-init model preset (no checkpoint needed)")
    p.add_argument("-p", "--prompt", required=True, help="prompt text")
    p.add_argument("-T", "--temperature", type=float, default=0.6)
    p.add_argument("-m", "--max-tokens", type=int, default=256)
    p.add_argument("--top-k", type=int, default=0,
                   help="top-k sampling (0 disables). Compiled on-device "
                        "bound: --max-top-k")
    p.add_argument("--max-top-k", type=int, default=64,
                   help="static compile-time bound for top-k "
                        "(EngineConfig.max_top_k); requests with "
                        "top_k > max_top_k are rejected")
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--ignore-eos", action="store_true")
    p.add_argument("--no-chat-template", action="store_true")
    p.add_argument("-l", "--log-level", default="info",
                   choices=["error", "warn", "info", "debug", "trace"])
    p.add_argument("-d", "--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel size (shards request slots over the "
                        "mesh's dp axis; crosses hosts in multi-process runs)")
    p.add_argument("--no-dp-shard-kv", action="store_true",
                   help="replicate the KV cache over dp instead of sharding "
                        "its page axis (EngineConfig.dp_shard_kv; sharding "
                        "is the default — rank-local pages, zero per-step "
                        "dp collectives, dp x the cache capacity)")
    # Multi-host serving (SURVEY.md §5.8): one CLI process per host, all
    # pointed at rank 0's coordinator — the same jax.distributed runtime the
    # scaling harness uses (bench.py --scaling-worker), now reachable from
    # the production entry point.
    p.add_argument("--nprocs", type=int, default=1,
                   help="total processes (hosts) in the serving job")
    p.add_argument("--rank", type=int, default=0,
                   help="this process's rank in [0, nprocs)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="rank 0's coordinator address (required when "
                        "nprocs > 1)")
    p.add_argument("--max-num-seqs", type=int, default=8)
    p.add_argument("--max-model-len", type=int, default=4096)
    def _positive_int(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError(f"must be >= 1, got {n}")
        return n

    p.add_argument("--kv-blocks", type=_positive_int, default=None,
                   help="KV cache pages (default: a 65536-TOKEN pool, i.e. "
                        "65536/block-size pages — the pool is pages x "
                        "block-size tokens, so a fixed page count would "
                        "quadruple HBM use when the page size grows)")
    p.add_argument("--block-size", type=int, default=256,
                   help="KV page size in tokens (round-3 sweep: 64/128/256 "
                        "within noise at bs8; 256 = fewest grid steps)")
    p.add_argument("--quantization", choices=["int8", "int4"],
                   help="weight-only quantization (on-the-fly at load)")
    p.add_argument("--kv-cache-dtype", default=None, choices=["bfloat16", "int8"],
                   help="paged KV cache dtype (int8 halves KV bandwidth)")
    p.add_argument("--profile", metavar="DIR",
                   help="write a jax.profiler trace of generation to DIR "
                        "(view with xprof/tensorboard)")
    p.add_argument("--tokens-out", metavar="PATH",
                   help="also write the completion token ids to PATH as JSON "
                        "(machine-readable channel; stdout can interleave "
                        "with backend transport logs in multi-process runs)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    level = {"error": logging.ERROR, "warn": logging.WARNING, "info": logging.INFO,
             "debug": logging.DEBUG, "trace": logging.DEBUG}[args.log_level]
    logging.basicConfig(level=level, format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    logger = logging.getLogger("nano_vllm_candle_tpu.cli")

    if args.nprocs > 1 and not args.coordinator:
        print("error: --nprocs > 1 requires --coordinator HOST:PORT",
              file=sys.stderr)
        return 2
    if not (0 <= args.rank < args.nprocs):
        print(f"error: --rank {args.rank} outside [0, {args.nprocs})",
              file=sys.stderr)
        return 2

    if args.tp * args.dp > 1 and args.device != "cpu":
        # Before first backend use: async-collective fusion + latency-hiding
        # scheduler so tp/dp collectives overlap compute (SURVEY.md §5.8).
        # TPU-only: the CPU XLA client dies on unknown --xla_tpu_* flags.
        from nano_vllm_candle_tpu.parallel.distributed import (
            apply_collective_overlap_flags,
        )

        apply_collective_overlap_flags()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.nprocs > 1:
        # Join the multi-host process group BEFORE any device use: after
        # this, jax.devices() spans the whole job and the hybrid mesh below
        # can lay dp across the process (DCN) boundary. Every rank must be
        # launched with identical engine flags (SPMD determinism contract,
        # parallel/distributed.py).
        from nano_vllm_candle_tpu.parallel import distributed

        distributed.initialize(args.coordinator, args.nprocs, args.rank)

    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.parallel.distributed import make_hybrid_mesh
    from nano_vllm_candle_tpu.sampling_params import SamplingParams
    from nano_vllm_candle_tpu.utils.tokenizer import apply_chat_template, load_tokenizer

    if not args.model and not args.preset:
        print("error: need --model DIR or --preset NAME", file=sys.stderr)
        return 2

    config = None
    if args.preset:
        config = {
            "tiny": Qwen3Config.tiny,
            "0.6b": Qwen3Config.qwen3_0_6b,
            "4b": Qwen3Config.qwen3_4b,
            "8b": Qwen3Config.qwen3_8b,
            "32b": Qwen3Config.qwen3_32b,
        }[args.preset]()

    engine_config = EngineConfig(
        max_num_seqs=args.max_num_seqs,
        num_kvcache_blocks=-(-(
            args.kv_blocks if args.kv_blocks is not None
            else max(2, 65536 // args.block_size)
        ) // max(1, args.dp)) * max(1, args.dp),  # dp-divisible (sharded KV)
        kvcache_block_size=args.block_size,
        max_model_len=args.max_model_len,
        tp_size=args.tp,
        dp_size=args.dp,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype or "bfloat16",
        max_top_k=max(args.max_top_k, args.top_k),
        dp_shard_kv=not args.no_dp_shard_kv,
    )
    mesh = (
        make_hybrid_mesh(tp=args.tp, dp=args.dp)
        if args.tp * args.dp > 1 else None
    )

    logger.info("loading model (model=%s preset=%s tp=%d)", args.model, args.preset, args.tp)
    t0 = time.perf_counter()
    llm = LLM(args.model, config=config, engine_config=engine_config, mesh=mesh)
    logger.info("model ready in %.1fs on %s", time.perf_counter() - t0, jax.devices()[0])

    tokenizer = load_tokenizer(args.model)
    text = args.prompt if args.no_chat_template else apply_chat_template(args.prompt)
    token_ids = tokenizer.encode(text)
    if llm.config.bos_token_id is not None:
        # Unconditional BOS prepend, reference parity (main.rs:206-207).
        token_ids = [llm.config.bos_token_id] + token_ids

    sp = SamplingParams(
        temperature=args.temperature,
        max_tokens=args.max_tokens,
        ignore_eos=args.ignore_eos,
        top_k=args.top_k,
        top_p=args.top_p,
    )
    t0 = time.perf_counter()
    if args.profile:
        with jax.profiler.trace(args.profile):
            outputs = llm.generate([token_ids], sp)
        logger.info("profiler trace written to %s", args.profile)
    else:
        outputs = llm.generate([token_ids], sp)
    elapsed = time.perf_counter() - t0

    completion = outputs[0].token_ids
    if args.tokens_out:
        import json

        with open(args.tokens_out, "w") as f:
            json.dump(list(map(int, completion)), f)
    print(tokenizer.decode(completion))
    total = len(token_ids) + len(completion)
    print(
        f"\n--- prompt: {len(token_ids)} tok, generated: {len(completion)} tok, "
        f"total: {total} tok\n--- Time: {elapsed:.2f}s, "
        f"Throughput: {len(completion) / elapsed:.2f}tok/s",
        file=sys.stderr,
    )
    logger.debug("engine metrics: %s", llm.engine.metrics)
    return 0


if __name__ == "__main__":
    sys.exit(main())
