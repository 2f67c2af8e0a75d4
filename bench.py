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


def _scaling_engine(args, mesh, B):
    """Build the scaling-measurement engine (shared by worker + baseline)."""
    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM

    cfg = {
        "0.6b": Qwen3Config.qwen3_0_6b,
        "4b": Qwen3Config.qwen3_4b,
        "8b": Qwen3Config.qwen3_8b,
        "small": Qwen3Config.small,
        "tiny": Qwen3Config.tiny,
    }[args.model]()
    cpu_sized = args.model in ("tiny", "small")
    dp = max(1, args.dp)
    prompt_len = 16 if cpu_sized else args.prompt_len
    decode_steps = (16 if args.model == "tiny" else 64) if cpu_sized else args.decode_steps
    block_size = 16 if cpu_sized else args.block_size
    max_len = prompt_len + decode_steps + block_size
    eng = EngineConfig(
        max_num_seqs=B,
        max_num_batched_tokens=max(4096, B * prompt_len),
        # One null page per dp rank (dp-sharded cache) + per-seq needs;
        # B % dp == 0 keeps the total dp-divisible.
        num_kvcache_blocks=dp + B * (-(-max_len // block_size)),
        kvcache_block_size=block_size,
        max_model_len=max_len,
        dtype="float32" if cpu_sized else "bfloat16",
        enable_prefix_caching=False,
        use_pallas_kernels=not cpu_sized,
        attn_impl="xla" if cpu_sized else None,
        fuse_projections=mesh is None,
    )
    return LLM(config=cfg, engine_config=eng, mesh=mesh), prompt_len, decode_steps


#: Per-replica decode batch in the scaling harness (weak scaling: global
#: batch = N x this).
SCALING_BATCH_PER_REPLICA = 8


def scaling_worker(args) -> None:
    """One process of the scaling measurement (also the dp=1 baseline).

    Every rank runs the identical request stream (the SPMD-determinism
    contract, parallel/distributed.py) and reports global decode tok/s plus
    a per-step overhead breakdown. The dp=1 baseline runs under the SAME
    runtime (jax.distributed initialized, 1-device mesh) so the efficiency
    ratio isolates coordination cost, not code-path differences.
    """
    import json as _json
    import os

    import jax

    if args.cpu or args.model in ("tiny", "small"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nano_vllm_candle_tpu.parallel import distributed
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    nprocs, rank = args.scaling_nprocs, args.scaling_rank
    dp = args.dp
    coord = args.scaling_coordinator or f"127.0.0.1:{args.scaling_port}"
    # Initialize even for nprocs=1: the baseline must pay the same runtime
    # (distributed client, global-array device_puts) as the dp=N ranks.
    distributed.initialize(coord, nprocs, rank)
    if os.environ.get("NVCT_ABLATE"):
        # Perf forensics (models/qwen3.ABLATE): skip named stages so their
        # coordination cost can be measured by difference. Numerics are
        # wrong under ablation — never set in real runs. (Imported only
        # after distributed.initialize: importing the model package touches
        # the backend.)
        from nano_vllm_candle_tpu.models import qwen3 as _q

        _q.ABLATE = frozenset(os.environ["NVCT_ABLATE"].split(","))
    mesh = distributed.make_hybrid_mesh(tp=args.tp, dp=dp)
    B = SCALING_BATCH_PER_REPLICA * dp
    llm, prompt_len, decode_steps = _scaling_engine(args, mesh, B)
    cfgv = llm.config.vocab_size
    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(3, cfgv - 3, prompt_len)))
               for _ in range(B)]
    sp = SamplingParams(temperature=0.0, max_tokens=decode_steps,
                        ignore_eos=True)
    for p in prompts:  # warmup/compile round
        llm.add_request(p, sp)
    llm.engine.run_until_done()
    for p in prompts:  # timed round
        llm.add_request(p, sp)
    out = llm.step()
    assert out.is_prefill
    before = llm.engine.metrics["decode_tokens"]
    t0 = time.perf_counter()
    llm.engine.run_until_done()
    dt = time.perf_counter() - t0
    n_tokens = llm.engine.metrics["decode_tokens"] - before
    tok_s = n_tokens / dt
    n_steps = max(1, n_tokens // B)
    res = {"rank": rank, "nprocs": nprocs, "dp": dp, "tp": args.tp,
           "batch": B, "tok_s": round(tok_s, 2),
           "step_ms": round(1e3 * dt / n_steps, 3),
           "decode_steps": int(n_steps)}
    with open(os.path.join(args.scaling_outdir, f"rank{rank}.json"), "w") as f:
        _json.dump(res, f)


def run_scaling(args) -> None:
    """Scaling-efficiency harness (BASELINE config 5's shape, SURVEY §5.8).

    Measures weak scaling dp=1 -> dp=N where each dp replica is its OWN OS
    process joined via ``jax.distributed`` (Gloo over loopback on CPU — the
    same runtime a multi-host TPU slice uses, minus the ICI). The workload
    is sized so per-step compute dominates coordination (``--model small``:
    ~30M params, batch 8/replica, step >= ~10ms on CPU) — a smoke whose
    expected value is noise can't catch regressions.

    This orchestrator spawns ALL N ranks on the LOCAL machine (CPU harness
    smoke; CPU "chips" share the machine, so efficiency is a RUNTIME
    statement, not a hardware one). On a real N-host slice, run ONE WORKER
    PER HOST instead — the BASELINE config 5 measurement:

        # host i of N:
        python bench.py --scaling-worker --scaling-nprocs N \
            --scaling-rank i --scaling-coordinator host0:9999 \
            --dp N --tp <chips/host> --scaling-outdir /tmp/scale
        # dp=1 baseline (any one host): same, with --scaling-nprocs 1 --dp 1
        # efficiency = rank0 tok_s / (N x baseline tok_s)

        # CPU smoke (this function): python bench.py --scaling 2 --model small --cpu
    """
    import json as _json
    import os
    import socket
    import subprocess
    import tempfile

    N = args.scaling
    outdir = tempfile.mkdtemp(prefix="nvct_scaling_")

    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = (
        os.path.dirname(os.path.abspath(__file__)) + os.pathsep
        + env_base.get("PYTHONPATH", "")
    )
    if args.cpu or args.model in ("tiny", "small"):
        env_base["XLA_FLAGS"] = (
            env_base.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1"
        ).strip()

    # Pin each worker to its own core on the local-machine smoke: Gloo
    # collectives busy-wait, and an unpinned waiting rank would burn the
    # core its peer needs for compute — measured 3x step-time inflation on
    # a 2-core box. On a real multi-host run every rank owns its machine.
    ncores = os.cpu_count() or 1
    pin = args.cpu or args.model in ("tiny", "small")

    def spawn(rank, nprocs, dp, port, outsub, cpu_id=None):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--scaling-worker", "--scaling-nprocs", str(nprocs),
            "--scaling-rank", str(rank), "--scaling-port", str(port),
            "--scaling-outdir", outsub, "--dp", str(dp),
            "--tp", str(args.tp), "--model", args.model,
            "--prompt-len", str(args.prompt_len),
            "--decode-steps", str(args.decode_steps),
            "--block-size", str(args.block_size),
        ] + (["--cpu"] if args.cpu else [])
        if pin and cpu_id is not None:
            cmd = ["taskset", "-c", str(cpu_id % ncores)] + cmd
        return subprocess.Popen(cmd, env=env_base, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    def communicate_all(procs, logs):
        try:
            for i, pr in enumerate(procs):
                logs[i] = pr.communicate(timeout=1200)[0]
        except subprocess.TimeoutExpired:
            for pr in procs:
                if pr.poll() is None:
                    pr.kill()
                    pr.wait()
            raise RuntimeError(
                "scaling round timed out; partial logs:\n" + "\n".join(logs)
            )

    def pick_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    def run_coordinated(nprocs, dp):
        """One coordinator round; retries on coordinator-port races (the
        bind/close pick is TOCTOU — another process can claim the port
        before rank 0 binds it)."""
        last_logs = []
        for _attempt in range(3):
            port = pick_port()
            procs = [spawn(r, nprocs, dp, port, outdir, cpu_id=r)
                     for r in range(nprocs)]
            logs = [""] * nprocs
            communicate_all(procs, logs)
            if all(pr.returncode == 0 for pr in procs):
                return _json.load(
                    open(os.path.join(outdir, "rank0.json")))
            last_logs = [
                f"rank{i} rc={pr.returncode}:\n{log[-2000:]}"
                for i, (pr, log) in enumerate(zip(procs, logs))
                if pr.returncode != 0
            ]
            bindy = any("bind" in log.lower() or "address" in log.lower()
                        for log in logs)
            if not bindy:
                break
        raise RuntimeError(
            f"scaling workers failed (nprocs={nprocs}):\n"
            + "\n".join(last_logs)
        )

    def run_independent_baseline():
        """N CONCURRENT single-replica processes, no coordination: the
        weak-scaling baseline that cancels machine contention out of the
        efficiency ratio on a shared box (N ranks inevitably share cores
        with each other there; on a real slice each host is dedicated and
        this baseline equals N x a solo run)."""
        subs = []
        procs = []
        for i in range(N):
            sub = os.path.join(outdir, f"base{i}")
            os.makedirs(sub, exist_ok=True)
            subs.append(sub)
            procs.append(spawn(0, 1, 1, pick_port(), sub, cpu_id=i))
        logs = [""] * N
        communicate_all(procs, logs)
        for i, (pr, log) in enumerate(zip(procs, logs)):
            if pr.returncode != 0:
                raise RuntimeError(
                    f"baseline worker {i} failed:\n{log[-2000:]}")
        return [_json.load(open(os.path.join(s, "rank0.json")))
                for s in subs]

    bases = run_independent_baseline()
    multi = run_coordinated(N, N)

    base_sum = sum(b["tok_s"] for b in bases)
    base_step = sum(b["step_ms"] for b in bases) / N
    eff = multi["tok_s"] / base_sum
    overhead_ms = multi["step_ms"] - base_step
    tag = "cpu" if (args.cpu or args.model in ("tiny", "small")) else "tpu"
    result = {
        "metric": f"scaling_efficiency_dp{N}_{N}proc_{tag}_{args.model}",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff, 4),
        "extra": {
            "baseline_tok_s_sum": round(base_sum, 2),
            "baseline_step_ms_mean": round(base_step, 3),
            f"dp{N}_tok_s_global": multi["tok_s"],
            f"dp{N}_step_ms": multi["step_ms"],
            "coordination_overhead_ms_per_step": round(overhead_ms, 3),
            "batch_per_replica": SCALING_BATCH_PER_REPLICA,
            "processes": N,
            "core_pinned": pin,
            "note": ("weak scaling vs N concurrent INDEPENDENT replicas "
                     "(same runtime, no coordination) — the ratio isolates "
                     "the distributed runtime's coordination cost; on a "
                     "real N-host slice each worker owns its host "
                     "(BASELINE config 5)"),
        },
    }
    print(json.dumps(result))
    floor = args.scaling_floor
    if eff < floor:
        print(f"# FAIL: scaling efficiency {eff:.3f} < floor {floor} "
              "(regression gate)", file=sys.stderr)
        sys.exit(1)


def run_prefix_cache_bench(args) -> None:
    """Measure the prefix cache's WIN, not just its correctness (round-3
    review item #10): B prompts sharing a block-aligned common prefix,
    TTFT and ``prefix_cached_tokens`` with the cache warm vs the cold
    first pass. The block-sharing machinery (engine/block_manager.py
    rolling-hash prefix reuse) had correctness tests but no measured
    benefit until this row.
    """
    import jax

    from nano_vllm_candle_tpu.utils.warmup import warm_transfer_async, wait_warm

    if args.cpu or args.model in ("tiny", "small"):
        jax.config.update("jax_platforms", "cpu")
    warm_transfer_async()
    import numpy as np

    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    cfg = {
        "0.6b": Qwen3Config.qwen3_0_6b,
        "4b": Qwen3Config.qwen3_4b,
        "8b": Qwen3Config.qwen3_8b,
        "small": Qwen3Config.small,
        "tiny": Qwen3Config.tiny,
    }[args.model]()
    B = args.batch
    block_size = args.block_size if args.model not in ("tiny",) else 16
    share = args.prefix_share
    if share % block_size:
        share = (share // block_size) * block_size
        print(f"# prefix share rounded down to {share} (block-aligned; only "
              "FULL blocks are hash-shareable)", file=sys.stderr)
    tail = max(block_size // 2, 64) if args.model != "tiny" else 8
    prompt_len = share + tail
    decode_steps = 16
    max_len = prompt_len + decode_steps + block_size
    blocks_per_seq = -(-max_len // block_size)
    eng = EngineConfig(
        max_num_seqs=B,
        max_num_batched_tokens=max(4096, prompt_len + block_size),
        num_kvcache_blocks=1 + (B + 1) * blocks_per_seq,
        kvcache_block_size=block_size,
        max_model_len=max_len,
        dtype="bfloat16" if args.model != "tiny" else "float32",
        kv_cache_dtype=args.kv_cache_dtype or (
            "bfloat16" if args.model != "tiny" else "float32"),
        quantization=args.quantization,
        enable_prefix_caching=True,
        use_pallas_kernels=args.model != "tiny",
        attn_impl="xla" if args.model == "tiny" else None,
    )
    llm = LLM(config=cfg, engine_config=eng)
    wait_warm()
    rng = np.random.default_rng(0)
    shared = list(map(int, rng.integers(10, cfg.vocab_size - 10, share)))
    sp = SamplingParams(temperature=0.0, max_tokens=decode_steps,
                        ignore_eos=True)

    def fresh_prompt():
        return shared + list(map(
            int, rng.integers(10, cfg.vocab_size - 10, tail)))

    # Warmup/compile with UNRELATED prompts (no shared prefix) so the cold
    # TTFT below measures prefill work, not compilation.
    warm = [list(map(int, rng.integers(10, cfg.vocab_size - 10, prompt_len)))]
    llm.add_request(warm[0], sp)
    llm.step()
    llm.engine.run_until_done()
    llm.add_request(warm[0][:-1] + [11], sp)  # relayout round (bench.py note)
    llm.step()
    llm.engine.run_until_done()

    # COLD: first shared-prefix prompt pays the full prefill.
    cold_before = llm.engine.metrics["prefix_cached_tokens"]
    llm.add_request(fresh_prompt(), sp)
    t0 = time.perf_counter()
    out = llm.step()
    ttft_cold = time.perf_counter() - t0
    assert out.is_prefill
    llm.engine.run_until_done()
    cold_hits = llm.engine.metrics["prefix_cached_tokens"] - cold_before

    # WARM: fresh requests re-using the shared prefix from the hash cache.
    warm_ttfts = []
    warm_before = llm.engine.metrics["prefix_cached_tokens"]
    n_warm = 0
    for _ in range(max(1, B - 1)):
        llm.add_request(fresh_prompt(), sp)
        n_warm += 1
    while llm.engine.scheduler.waiting:
        t0 = time.perf_counter()
        out = llm.step()
        if out.is_prefill:
            warm_ttfts.append(time.perf_counter() - t0)
    llm.engine.run_until_done()
    warm_hits = llm.engine.metrics["prefix_cached_tokens"] - warm_before

    ttft_warm = sorted(warm_ttfts)[len(warm_ttfts) // 2]
    hit_rate = warm_hits / max(1, n_warm * prompt_len)
    result = {
        "metric": f"prefix_cache_ttft_speedup_{args.model}_share{share}",
        "value": round(ttft_cold / ttft_warm, 3),
        "unit": "x",
        "vs_baseline": round(ttft_cold / ttft_warm, 3),
        "extra": {
            "ttft_cold_s": round(ttft_cold, 4),
            "ttft_warm_p50_s": round(ttft_warm, 4),
            "shared_prefix_tokens": share,
            "prompt_len": prompt_len,
            "warm_requests": n_warm,
            "prefix_cached_tokens": int(warm_hits),
            "prefix_hit_rate_of_prompt": round(hit_rate, 4),
            "cold_cached_tokens": int(cold_hits),
        },
    }
    print(json.dumps(result))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="0.6b",
                        choices=["0.6b", "4b", "8b", "small", "tiny"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--prompt-len", type=int, default=128)
    parser.add_argument("--decode-steps", type=int, default=128)
    parser.add_argument("--max-batched-tokens", type=int, default=None,
                        help="prefill token budget per step (default: fits "
                             "all prompts in one packed prefill). Set to "
                             "e.g. 4096 for long prompts so prefill runs "
                             "CHUNKED (paged-prefix attention) instead of "
                             "packing one enormous quadratic stream")
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
    parser.add_argument("--lm-head-dtype", default="int8",
                        choices=["bfloat16", "int8", "int4"],
                        help="logits-matmul weight dtype (EngineConfig."
                             "lm_head_dtype); int8 default halves the "
                             "per-step head re-read")
    parser.add_argument("--decode-burst", type=int, default=16,
                        help="decode steps per dispatch (on-device scan)")
    parser.add_argument("--pipeline-depth", type=int, default=3,
                        help="in-flight chained decode bursts")
    parser.add_argument("--repeat", type=int, default=3,
                        help="timed generation rounds; the headline value "
                             "is their mean and extra carries min/max so "
                             "round-over-round deltas are distinguishable "
                             "from tunnel variance (default 3 — the "
                             "BASELINE.md measurement protocol; a single "
                             "round is hostage to tunnel weather)")
    parser.add_argument("--tiny", action="store_true", help="tiny model on CPU (smoke)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--prefix-share", type=int, default=0, metavar="S",
                        help="measure the prefix cache: B prompts sharing "
                             "an S-token block-aligned prefix; prints a "
                             "TTFT-speedup JSON line (cold vs hash-cache "
                             "warm) with the prefix_cached_tokens hit rate")
    parser.add_argument("--stagger", action="store_true",
                        help="add a second wave of B requests AFTER decode "
                             "starts, so prefills dispatch into the pipeline "
                             "behind in-flight bursts (mixed prefill/decode "
                             "batching, BASELINE config 3)")
    # scaling harness (run_scaling / scaling_worker docstrings)
    parser.add_argument("--scaling", type=int, metavar="N",
                        help="measure dp=1 vs dp=N across N OS processes "
                             "(jax.distributed); prints a scaling-efficiency "
                             "JSON line")
    parser.add_argument("--scaling-floor", type=float, default=0.8,
                        help="fail (exit 1) when measured scaling efficiency "
                             "is below this — the regression gate (raised "
                             "0.6 -> 0.8 in round 5: the dp-sharded KV "
                             "cache removed the per-step commit all-gather "
                             "and the dp=2 CPU proxy measures 0.94)")
    parser.add_argument("--scaling-worker", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--scaling-nprocs", type=int, default=1,
                        help=argparse.SUPPRESS)
    parser.add_argument("--scaling-rank", type=int, default=0,
                        help=argparse.SUPPRESS)
    parser.add_argument("--scaling-port", type=int, default=0,
                        help=argparse.SUPPRESS)
    parser.add_argument("--scaling-outdir", default="",
                        help=argparse.SUPPRESS)
    parser.add_argument("--scaling-coordinator", default=None,
                        help="HOST:PORT of rank 0's coordinator for "
                             "multi-host --scaling-worker runs (see "
                             "run_scaling docstring)")
    args = parser.parse_args()
    if args.tiny:
        args.model = "tiny"
    if args.scaling_worker:
        return scaling_worker(args)
    if args.scaling:
        return run_scaling(args)
    if args.prefix_share:
        return run_prefix_cache_bench(args)

    if args.tp * args.dp > 1 and not (args.cpu or args.model in ("tiny", "small")):
        # Must precede the first backend use: XLA reads the env at init.
        # TPU-only: the CPU XLA client aborts on unknown --xla_tpu_* flags.
        from nano_vllm_candle_tpu.parallel.distributed import (
            apply_collective_overlap_flags,
        )

        apply_collective_overlap_flags()

    import jax

    if args.cpu or args.model in ("tiny", "small"):
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

    # Persistent-compile-cache diagnostics: the prefill/decode "compile"
    # wall times below are CACHE-SENSITIVE (measured on this config: cold
    # 15.5s/10.8s, warm 2.4s/3.0s — round-4's apparent 2.5-3.7x compile
    # regression was a cold cache, not XLA). Counting new cache entries
    # distinguishes the two in the artifact itself.
    import os as _os

    from nano_vllm_candle_tpu.utils.jax_cache import _DEFAULT_DIR as _CACHE_DIR

    def _cache_entries():
        try:
            return len(_os.listdir(_CACHE_DIR))
        except OSError:
            return 0

    cache_before = _cache_entries()

    import jax.numpy as jnp
    import numpy as np

    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    cfg = {
        "0.6b": Qwen3Config.qwen3_0_6b,
        "4b": Qwen3Config.qwen3_4b,
        "8b": Qwen3Config.qwen3_8b,
        "small": Qwen3Config.small,
        "tiny": Qwen3Config.tiny,
    }[args.model]()

    B = args.batch
    prompt_len = args.prompt_len if args.model != "tiny" else 16
    decode_steps = args.decode_steps if args.model != "tiny" else 16
    block_size = args.block_size if args.model != "tiny" else 16
    max_len = prompt_len + decode_steps + block_size
    blocks_per_seq = -(-max_len // block_size)
    # One null page per dp rank (dp-sharded KV cache); B % dp == 0 keeps
    # the per-seq pages dp-divisible too.
    num_blocks = max(1, args.dp) + B * blocks_per_seq

    dtype = "bfloat16" if args.model != "tiny" else "float32"
    kv_dtype = args.kv_cache_dtype or dtype
    eng = EngineConfig(
        max_num_seqs=B,
        max_num_batched_tokens=(
            args.max_batched_tokens or max(4096, B * prompt_len)
        ),
        num_kvcache_blocks=num_blocks,
        kvcache_block_size=block_size,
        max_model_len=max_len,
        dtype=dtype,
        kv_cache_dtype=kv_dtype,
        quantization=args.quantization,
        lm_head_dtype=args.lm_head_dtype,
        enable_prefix_caching=False,  # distinct prompts; keep bench honest
        use_pallas_kernels=True,
        decode_burst=args.decode_burst,
        pipeline_depth=args.pipeline_depth,
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
    # Second warmup round: the first post-decode prefill recompiles ONCE
    # (the decode jit returns the donated KV cache in its own layout, and
    # the jit cache is layout-keyed — measured: int8 bs16 prefill 1.75s /
    # 2.97s / 0.06s across rounds 0/1/2). Serving processes hit steady
    # state here, so TTFT below measures the engine, not that one-time
    # layout specialization.
    t0 = time.perf_counter()
    for p in prompts:
        llm.add_request(p, sp)
    llm.step()
    llm.engine.run_until_done()
    relayout_s = time.perf_counter() - t0
    print(
        f"# compile: prefill {prefill_compile_s:.1f}s decode "
        f"{decode_compile_s:.1f}s relayout-round {relayout_s:.1f}s",
        file=sys.stderr,
    )

    # --- timed run -----------------------------------------------------------
    for p in prompts:
        llm.add_request(p, sp)
    t_prefill0 = time.perf_counter()
    out = llm.step()
    ttft_s = time.perf_counter() - t_prefill0
    assert out.is_prefill
    # Long prompts prefill in CHUNKS (multiple steps); drain the remaining
    # chunks BEFORE the decode clock starts or "decode tok/s" silently
    # includes prefill work (a 16k-prompt run measured 63 tok/s that was
    # really ~30s of chunk steps inside the decode window).
    prefill_s = ttft_s
    while llm.engine.scheduler.waiting or any(
        s.num_computed_tokens < len(s) - 1
        for s in llm.engine.scheduler.running
    ):
        t0 = time.perf_counter()
        step = llm.step()
        if not step.is_prefill:
            break
        prefill_s += time.perf_counter() - t0
    if prefill_s > ttft_s:
        print(f"# chunked prefill total {prefill_s:.2f}s "
              f"(TTFT = first chunk {ttft_s:.2f}s)", file=sys.stderr)

    # decode runs the 2-deep pipelined driver (the serving path `generate`
    # uses): burst t+1 is dispatched before burst t's tokens are fetched, so
    # the tunnel round trip never stalls the chip.
    if args.stagger:
        # Second wave arrives while wave 1 decodes: run_until_done admits
        # these prefills INTO the pipeline behind the in-flight bursts
        # (mixed prefill/decode batching). Throughput counts both waves'
        # decode tokens over the whole mixed window. Wave-2 slots only free
        # up as wave-1 sequences finish, so admission interleaves too.
        for p in prompts:
            llm.add_request(p, sp)
    decode_before = llm.engine.metrics["decode_tokens"]
    t0 = time.perf_counter()
    llm.engine.run_until_done()
    decode_s = time.perf_counter() - t0
    n_decode = llm.engine.metrics["decode_tokens"] - decode_before
    tok_s = n_decode / decode_s

    # Repeat rounds (--repeat): re-run the whole timed generation so the
    # headline can be quoted mean +- spread — round-over-round deltas must
    # be distinguishable from tunnel weather (round-3 review item #9).
    round_tok_s = [tok_s]
    for _ in range(max(0, args.repeat - 1)):
        for p in prompts:
            llm.add_request(p, sp)
        llm.step()
        while llm.engine.scheduler.waiting or any(
            s.num_computed_tokens < len(s) - 1
            for s in llm.engine.scheduler.running
        ):
            if not llm.step().is_prefill:
                break
        if args.stagger:
            # Every round must carry the same second wave as round 1 or
            # the rounds measure different workloads (rounds 2+ used to be
            # pure-decode, inflating the mixed config's apparent spread).
            for p in prompts:
                llm.add_request(p, sp)
        before = llm.engine.metrics["decode_tokens"]
        t0 = time.perf_counter()
        llm.engine.run_until_done()
        dt = time.perf_counter() - t0
        round_tok_s.append(
            (llm.engine.metrics["decode_tokens"] - before) / dt
        )
    tok_s = sum(round_tok_s) / len(round_tok_s)

    # --- speed-of-light estimate ---------------------------------------------
    # What a decode step actually READS from HBM: the decoder weights, the
    # logits weight (int8 head dict when lm_head_dtype=int8; the tied bf16
    # table otherwise), and each sequence's KV. The embedding table itself
    # is only gathered (B rows) when a separate logits head exists.
    runner_params = llm.model_runner.params

    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

    pbytes = param_bytes(runner_params)
    embed_bytes = tree_bytes(runner_params["embed_tokens"])
    head_bytes = (
        tree_bytes(runner_params["lm_head"])
        if "lm_head" in runner_params else embed_bytes  # tied bf16 re-read
    )
    decoder_bytes = pbytes - embed_bytes - (
        tree_bytes(runner_params["lm_head"]) if "lm_head" in runner_params
        else 0
    )
    itemsize = jnp.dtype(dtype).itemsize
    kv_itemsize = 1 if kv_dtype == "int8" else itemsize
    kv_bytes_per_seq = (
        2 * cfg.num_hidden_layers * cfg.num_key_value_heads * cfg.head_dim
        * (prompt_len + decode_steps // 2) * kv_itemsize
    )
    step_bytes = decoder_bytes + head_bytes + B * kv_bytes_per_seq
    bw = detect_bw(jax.devices()[0])
    sol_tok_s = B * bw / step_bytes

    # --- practical ceiling (round-3 review item #8) --------------------------
    # The spec-sheet SOL above divides by 819 GB/s as if decode were purely
    # HBM-bound; BASELINE.md's measured machine laws say otherwise once
    # weights are int8/int4: dense time is pinned by the MXU weight-stream
    # floor (~2.34 us per M weight VALUES at batch <= ~128, identical for
    # bf16/int8), DMA tops out at ~669 GB/s (82% of spec), and sampling/
    # fusion fixed costs are real. vs_practical_ceiling reports the same
    # measurement against that model, so progress toward "done" is visible
    # for configs whose spec-SOL ratio is physically unreachable.
    DMA_BW = 669e9
    # 2.34 us per 1e6 weight values, CALIBRATED at 0.6B shapes (H=1024,
    # [16,1024]@[1024,6144] microbench). Bigger matmuls amortize the MXU
    # weight-load pipeline ("8B shapes escape the floor", BASELINE.md r2),
    # so the floor is scaled by min(1, 1024/H) — without this the model
    # claimed 8B int4 could not exceed 900 tok/s while the engine measured
    # 1,718.
    MXU_S_PER_VALUE = 2.34e-12 * min(1.0, 1024 / cfg.hidden_size)
    decoder_values = sum(
        x.size * (2 if x.dtype == jnp.uint8 else 1)  # packed int4 nibbles
        for name, sub in runner_params["layers"].items()
        for x in jax.tree.leaves(sub)
        if x.ndim >= 3  # projections; skip norms
    )
    dense_s = max(decoder_values * MXU_S_PER_VALUE, decoder_bytes / DMA_BW)
    head_s = head_bytes / DMA_BW
    kv_s = B * kv_bytes_per_seq / DMA_BW
    # argmax/sampling + small fusions, calibrated from round-3/4 traces
    # (~0.074 ms at bs8, ~0.24 ms at bs64 on v5e)
    fixed_s = (0.05 + 0.003 * B) * 1e-3
    practical_tok_s = B / (dense_s + head_s + kv_s + fixed_s)

    wtag = args.quantization or dtype
    kvtag = "_kvint8" if kv_dtype == "int8" else ""
    kvtag += "_mixed" if args.stagger else ""
    chiptag = f"{n_chips}chip" if n_chips > 1 else "1chip"
    result = {
        "metric": f"decode_tok_s_qwen3_{args.model}_{wtag}{kvtag}_bs{B}_{chiptag}",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / sol_tok_s, 4),
        "extra": {
            "vs_practical_ceiling": round(tok_s / practical_tok_s, 4),
            "practical_tok_s": round(practical_tok_s, 1),
            "ttft_p50_s": round(ttft_s, 4),
            "prefill_compile_s": round(prefill_compile_s, 2),
            "decode_compile_s": round(decode_compile_s, 2),
            "compile_cache_new_entries": _cache_entries() - cache_before,
            "d2h_handshake_s": round(handshake_s, 1),
            "sol_tok_s": round(sol_tok_s, 1),
            "tok_s_rounds": [round(x, 1) for x in round_tok_s],
            "tok_s_min": round(min(round_tok_s), 1),
            "tok_s_max": round(max(round_tok_s), 1),
            "prompt_len": prompt_len,
            "decode_steps": decode_steps,
            "device": str(jax.devices()[0]),
            "param_bytes": pbytes,
        },
    }
    if args.stagger:
        result["extra"]["note"] = (
            "mixed prefill/decode waves: tok/s counts decode tokens over a "
            "window that also carries wave-2 prefill work, so SOL/practical "
            "ratios (pure-decode models) understate this config"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
