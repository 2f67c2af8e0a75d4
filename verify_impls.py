"""On-chip cross-impl generation check (dev tool).

Runs the same prompts through the engine under attn_impl="pallas" and
attn_impl="xla" (direct-write cache, the numerics reference) on the real
chip and asserts identical greedy generations. The CPU test suite validates
every kernel in interpret mode; this validates the composed serving path on
hardware, where tiling/aliasing bugs actually bite.
"""

from __future__ import annotations

import argparse

import numpy as np


def run(attn_impl: str, quant, kv_dtype: str, prompts, steps: int):
    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    cfg = Qwen3Config.qwen3_0_6b()
    eng = EngineConfig(
        max_num_seqs=len(prompts),
        num_kvcache_blocks=64,
        kvcache_block_size=64,
        max_model_len=1024,
        attn_impl=attn_impl,
        quantization=quant,
        kv_cache_dtype=kv_dtype,
        enable_prefix_caching=False,
    )
    llm = LLM(config=cfg, engine_config=eng)
    sp = SamplingParams(temperature=0.0, max_tokens=steps, ignore_eos=True)
    outs = llm.generate(prompts, sp)
    return [o.token_ids for o in outs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--quantization", choices=["int8", "int4"])
    ap.add_argument("--kv-cache-dtype", default="bfloat16",
                    choices=["bfloat16", "int8"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # lengths straddle GROUP boundaries (group-commit edge cases)
    prompts = [
        list(map(int, rng.integers(10, 151000, n))) for n in (31, 32, 33, 70)
    ]
    ref = run("xla", args.quantization, args.kv_cache_dtype, prompts, args.steps)
    got = run("pallas", args.quantization, args.kv_cache_dtype, prompts, args.steps)
    ok = True
    for i, (r, g) in enumerate(zip(ref, got)):
        match = "OK" if r == g else "MISMATCH"
        ok &= r == g
        print(f"seq {i}: {match}  xla={r[:8]}...  pallas={g[:8]}...")
    if not ok:
        raise SystemExit("pallas generations diverge from xla reference")
    print("all generations match")


if __name__ == "__main__":
    main()
