"""Perplexity evaluation harness (WikiText-2-style sliding window).

The BASELINE.json accuracy gate is WikiText-2 Δppl <= 0.1 between bf16 and
quantized configs at the same bit width. This environment ships neither the
dataset nor a real checkpoint (zero egress), so the harness takes any text
file + model dir and computes token-level perplexity with a strided sliding
window; the gate is asserted by ``compare_quantization`` when run somewhere
with the artifacts present.

Usage:
    python -m evals.ppl --model /path/to/Qwen3-0.6B --text wikitext2_test.txt
    python -m evals.ppl --model ... --text ... --compare int8
"""

from __future__ import annotations

import argparse
import math
import sys
from typing import Iterable, List, Optional


def token_nll(params, config, token_ids: List[int], *, window: int = 2048,
              stride: int = 1024) -> float:
    """Mean negative log-likelihood per predicted token, strided sliding
    window (the standard HF perplexity recipe: each token scored with at
    least ``window - stride`` context)."""
    import jax
    import jax.numpy as jnp

    from nano_vllm_candle_tpu.models import qwen3

    total_nll = 0.0
    total_tok = 0
    n = len(token_ids)
    prev_end = 0
    for start in range(0, n, stride):
        end = min(start + window, n)
        chunk = jnp.asarray(token_ids[start:end], jnp.int32)
        logits = qwen3.forward_full(params, chunk, config=config)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # score positions whose targets were not already scored
        first_target = max(prev_end, start + 1)
        lo = first_target - start  # target index within chunk
        targets = chunk[lo:]
        rows = jnp.arange(lo - 1, end - start - 1)
        nll = -logp[rows, targets]
        total_nll += float(nll.sum())
        total_tok += int(nll.shape[0])
        prev_end = end
        if end == n:
            break
    return total_nll / max(total_tok, 1)


def perplexity(params, config, token_ids: List[int], **kw) -> float:
    return math.exp(token_nll(params, config, token_ids, **kw))


def compare_quantization(model_dir: str, text_path: str, bits: str,
                         group_size: int = 128, limit_tokens: Optional[int] = None,
                         max_delta: float = 0.1) -> dict:
    """bf16 vs quantized perplexity; returns the Δppl gate verdict."""
    import jax.numpy as jnp

    from nano_vllm_candle_tpu.config import Qwen3Config
    from nano_vllm_candle_tpu.layers.linear import quantize_qwen3_params
    from nano_vllm_candle_tpu.utils.loader import load_qwen3_params
    from nano_vllm_candle_tpu.utils.tokenizer import load_tokenizer

    config = Qwen3Config.from_hf_dir(model_dir)
    params = load_qwen3_params(model_dir, config, dtype=jnp.bfloat16)
    tokenizer = load_tokenizer(model_dir)
    text = open(text_path).read()
    token_ids = tokenizer.encode(text)
    if limit_tokens:
        token_ids = token_ids[:limit_tokens]

    ppl_bf16 = perplexity(params, config, token_ids)
    qparams = quantize_qwen3_params(params, bits=bits, group_size=group_size)
    ppl_q = perplexity(qparams, config, token_ids)
    delta = ppl_q - ppl_bf16
    return {
        "ppl_bf16": ppl_bf16,
        f"ppl_{bits}": ppl_q,
        "delta": delta,
        "gate_max_delta": max_delta,
        "pass": delta <= max_delta,
        "num_tokens": len(token_ids),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--compare", choices=["int8", "int4"])
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--limit-tokens", type=int)
    p.add_argument("--window", type=int, default=2048)
    args = p.parse_args()

    if args.compare:
        result = compare_quantization(
            args.model, args.text, args.compare,
            group_size=args.group_size, limit_tokens=args.limit_tokens,
        )
        print(result)
        return 0 if result["pass"] else 1

    import jax.numpy as jnp

    from nano_vllm_candle_tpu.config import Qwen3Config
    from nano_vllm_candle_tpu.utils.loader import load_qwen3_params
    from nano_vllm_candle_tpu.utils.tokenizer import load_tokenizer

    config = Qwen3Config.from_hf_dir(args.model)
    params = load_qwen3_params(args.model, config, dtype=jnp.bfloat16)
    tok = load_tokenizer(args.model)
    ids = tok.encode(open(args.text).read())
    if args.limit_tokens:
        ids = ids[: args.limit_tokens]
    print({"ppl": perplexity(params, config, ids, window=args.window)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
