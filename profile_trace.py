"""Capture a device trace of the bench decode loop and print per-op totals.

Reuses the exact engine path (same jits as bench.py, so the persistent
compilation cache applies) and aggregates XLA op time from the xplane.
"""

from __future__ import annotations

import argparse
import glob
import time


def parse_xplane(xplane_path: str, top: int = 25) -> None:
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane_path)
    totals: dict[str, float] = {}
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname and "xla" not in lname:
                continue
            for ev in line.events:
                name = ev.name
                totals[name] = totals.get(name, 0.0) + ev.duration_ns / 1e6
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = sum(v for _, v in items)
    print(f"# total device op time {tot:.2f} ms across {len(items)} op names")
    for name, ms in items[:top]:
        print(f"{ms:9.3f} ms  {100*ms/tot:5.1f}%  {name[:110]}")


def parse_gaps(xplane_path: str, top: int = 20, min_gap_us: float = 2.0) -> None:
    """Busy-vs-span per device trace line + the top idle gaps between ops.

    The op-duration totals above systematically understate wall time when
    the device idles BETWEEN ops (pallas spin-up, scalar-core sequencing,
    sync waits). This reports, per TPU op line: span (first-start to
    last-end), busy (union of op intervals), idle = span - busy, and
    aggregates idle time by the (prev_op -> next_op) pair so the bubble's
    location in the program is visible.
    """
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane_path)
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            evs = sorted(
                ((ev.start_ns, ev.start_ns + ev.duration_ns, ev.name)
                 for ev in line.events),
                key=lambda t: t[0],
            )
            if len(evs) < 10:
                continue
            span = (evs[-1][1] - evs[0][0]) / 1e6
            # union busy time + gap attribution
            busy = 0.0
            cur_s, cur_e, cur_n = evs[0]
            gaps: dict[str, float] = {}
            gap_counts: dict[str, int] = {}
            for s, e, n in evs[1:]:
                if s > cur_e:
                    g = (s - cur_e) / 1e6
                    if g * 1e3 >= min_gap_us:
                        key = f"{cur_n[:45]} -> {n[:45]}"
                        gaps[key] = gaps.get(key, 0.0) + g
                        gap_counts[key] = gap_counts.get(key, 0) + 1
                    busy += (cur_e - cur_s) / 1e6
                    cur_s, cur_e, cur_n = s, e, n
                else:
                    cur_e = max(cur_e, e)
                    cur_n = n if e >= cur_e else cur_n
            busy += (cur_e - cur_s) / 1e6
            print(
                f"\n## line '{line.name}' ({plane.name[:40]}): span "
                f"{span:.2f} ms, busy {busy:.2f} ms, idle "
                f"{span - busy:.2f} ms ({100 * (span - busy) / max(span, 1e-9):.1f}%)"
            )
            for key, ms in sorted(gaps.items(), key=lambda kv: -kv[1])[:top]:
                c = gap_counts[key]
                print(f"  {ms:8.3f} ms  n={c:5d}  avg {1e3 * ms / c:6.1f} us  {key}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6, help="decode engine steps to trace")
    ap.add_argument("--prefill", action="store_true",
                    help="trace a warm prefill step instead of decode")
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-batched-tokens", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quantization", choices=["int8", "int4"])
    ap.add_argument("--kv-cache-dtype", default=None)
    ap.add_argument("--parse-only")
    ap.add_argument("--gaps", action="store_true",
                    help="also report device idle gaps between ops "
                         "(busy-vs-span per trace line)")
    ap.add_argument("--pipelined", action="store_true",
                    help="trace the pipelined run_until_done decode path "
                         "(chained bursts) instead of unpipelined llm.step()")
    ap.add_argument("--decode-burst", type=int, default=16)
    ap.add_argument("--pipeline-depth", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/jax-trace")
    args = ap.parse_args()
    if args.parse_only:
        parse_xplane(args.parse_only)
        if args.gaps:
            parse_gaps(args.parse_only)
        return

    import jax
    import numpy as np

    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    cfg = Qwen3Config.qwen3_0_6b()
    B, prompt_len, block_size = args.batch, args.prompt_len, args.block_size
    decode_steps = 128
    max_len = prompt_len + decode_steps + block_size
    blocks_per_seq = -(-max_len // block_size)
    eng = EngineConfig(
        max_num_seqs=B,
        max_num_batched_tokens=(args.max_batched_tokens or max(4096, B * prompt_len)),
        num_kvcache_blocks=1 + B * blocks_per_seq,
        kvcache_block_size=block_size,
        max_model_len=max_len,
        dtype="bfloat16",
        kv_cache_dtype=args.kv_cache_dtype or "bfloat16",
        quantization=args.quantization,
        enable_prefix_caching=False,
        use_pallas_kernels=True,
        decode_burst=args.decode_burst,
        pipeline_depth=args.pipeline_depth,
    )
    llm = LLM(config=cfg, engine_config=eng)
    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(10, cfg.vocab_size - 10, prompt_len)))
               for _ in range(B)]
    sp = SamplingParams(temperature=0.0, max_tokens=decode_steps, ignore_eos=True)
    for p in prompts:
        llm.add_request(p, sp)
    t0 = time.perf_counter()
    llm.step()  # prefill (compile)
    print(f"# first prefill (incl. compile) {time.perf_counter()-t0:.2f}s")
    if args.prefill:
        llm.engine.run_until_done()  # drain round 1
        for p in prompts:
            llm.add_request(p, sp)
        t0 = time.perf_counter()
        with jax.profiler.trace(args.outdir):
            out = llm.step()  # warm prefill
        assert out.is_prefill
        print(f"# traced warm prefill in {time.perf_counter()-t0:.2f}s")
    elif args.pipelined:
        # Steady-state pipelined decode (the bench/serving path): warm one
        # full generation round, re-add requests, step past the prefill,
        # then trace run_until_done's chained-burst steady state.
        llm.engine.run_until_done()
        for p in prompts:
            llm.add_request(p, sp)
        llm.step()
        llm.engine.run_until_done()  # relayout round (see bench.py)
        for p in prompts:
            llm.add_request(p, sp)
        llm.step()
        t0 = time.perf_counter()
        n0 = llm.engine.metrics["decode_tokens"]
        with jax.profiler.trace(args.outdir):
            llm.engine.run_until_done()
        dt = time.perf_counter() - t0
        n = llm.engine.metrics["decode_tokens"] - n0
        print(f"# traced pipelined decode: {n} tokens in {dt:.2f}s "
              f"({n/dt:,.0f} tok/s, {1e3*dt*B/max(n,1):.3f} ms/step)")
    else:
        for _ in range(3):
            llm.step()  # decode warm
        t0 = time.perf_counter()
        with jax.profiler.trace(args.outdir):
            for _ in range(args.steps):
                llm.step()
        print(f"# traced {args.steps} engine steps in {time.perf_counter()-t0:.2f}s")
    paths = sorted(glob.glob(args.outdir + "/**/*.xplane.pb", recursive=True))
    print("# xplane:", paths[-1] if paths else "NONE")
    if paths:
        parse_xplane(paths[-1])
        if args.gaps:
            parse_gaps(paths[-1])


if __name__ == "__main__":
    main()
