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


def engine_path_nll(llm, token_ids: List[int], *, chunk: int = 256,
                    decode_tail: int = 32) -> float:
    """Mean NLL per predicted token scored through the SERVED stack.

    ``token_nll`` above scores through ``forward_full`` — the XLA
    full-recompute path with no paged cache. This variant instead drives
    the same forward functions the engine serves with (round-3 review,
    missing #2): **chunked prefill** (packed segment attention + paged-
    prefix attention over committed pages, GROUP page commits, INT8 KV
    quantization when configured) for the body of the text, and
    **teacher-forced paged decode steps** (current-token fold + deferred
    all-layer commit) for the last ``decode_tail`` tokens — using the
    ``llm``'s own params (weight/lm_head quantization exactly as served),
    attention impl and KV-cache dtype. The Δppl gate asserted on this
    number therefore covers int8-KV and kernel numerics, not just the
    weight-quant math (the reference's analog: its golden-activation
    integration tests exercised its one serving forward,
    ``/root/reference/tests/layer_test.rs:205-314``).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nano_vllm_candle_tpu.models import qwen3

    runner = llm.model_runner
    config, params = llm.config, runner.params
    attn_impl = runner.attn_impl
    logits_impl = getattr(runner, "_logits_impl", "xla")
    ps = runner.block_size
    G = qwen3.GROUP
    n = len(token_ids)
    if n < 2:
        raise ValueError("need at least 2 tokens to score")
    split = max(1, n - decode_tail)
    W = -(-n // ps)
    kv = qwen3.init_kv_cache(
        config, 1 + W, ps, jnp.dtype(llm.engine_config.kv_cache_dtype)
    )
    block_table = jnp.arange(1, 1 + W, dtype=jnp.int32)  # page 0 = null

    total_nll, total_tok = 0.0, 0

    def score(logp_rows, first_pos, count):
        """logp_rows[i] predicts token_ids[first_pos + i + 1]."""
        nonlocal total_nll, total_tok
        targets = np.asarray(token_ids[first_pos + 1 : first_pos + 1 + count])
        lp = np.asarray(logp_rows)[np.arange(count), targets]
        total_nll += float(-lp.sum())
        total_tok += count

    # --- chunked prefill over [0, split), scoring ALL positions ----------
    pos0 = 0
    while pos0 < split:
        end = min(pos0 + chunk, split)
        L = end - pos0
        Tpad = -(-L // G) * G
        tok = np.zeros((Tpad,), np.int32)
        tok[:L] = token_ids[pos0:end]
        positions = np.zeros((Tpad,), np.int32)
        positions[:L] = np.arange(pos0, end)
        seg = np.full((Tpad,), -1, np.int32)
        seg[:L] = 0
        idxs = np.arange(pos0, pos0 + Tpad)
        slots = ((1 + idxs // ps) * ps + idxs % ps).astype(np.int32)
        batch = qwen3.PrefillBatch(
            token_ids=jnp.asarray(tok),
            positions=jnp.asarray(positions),
            seg_ids=jnp.asarray(seg),
            slot_mapping=jnp.asarray(slots),
            logits_indices=jnp.arange(Tpad, dtype=jnp.int32),
            block_table=(block_table if pos0 > 0 else None),
            prefix_len=(jnp.asarray(pos0, jnp.int32) if pos0 > 0 else None),
        )
        hidden, kv = qwen3.forward(
            params, kv, batch, config=config, mode="prefill",
            attn_impl=attn_impl,
        )
        logits = qwen3.compute_logits(params, hidden, impl=logits_impl)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # position p's row predicts token p+1; the chunk's last position
        # scores the first decode-tail target too.
        n_targets = min(end, n - 1) - pos0
        score(logp[:n_targets], pos0, n_targets)
        pos0 = end

    # --- teacher-forced paged decode over [split, n-1) -------------------
    for p in range(split, n - 1):
        page = 1 + p // ps
        slot = page * ps + p % ps
        batch = qwen3.DecodeBatch(
            token_ids=jnp.asarray([token_ids[p]], jnp.int32),
            positions=jnp.asarray([p], jnp.int32),
            slot_mapping=jnp.asarray([slot], jnp.int32),
            block_tables=block_table[None, :],
            seq_lens=jnp.asarray([p + 1], jnp.int32),
        )
        hidden, kv = qwen3.forward(
            params, kv, batch, config=config, mode="decode",
            attn_impl=attn_impl,
        )
        logits = qwen3.compute_logits(params, hidden, impl=logits_impl)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        score(logp[:1], p, 1)

    return total_nll / max(total_tok, 1)


def engine_path_perplexity(llm, token_ids: List[int], **kw) -> float:
    return math.exp(engine_path_nll(llm, token_ids, **kw))


def compare_engine_vs_full(config, params, token_ids: List[int],
                           engine_kwargs: Optional[dict] = None,
                           max_delta: float = 0.1,
                           chunk: int = 256, decode_tail: int = 32) -> dict:
    """Δppl gate THROUGH the served stack: perplexity via the engine path
    (paged cache, chunked prefill, decode kernels, any configured
    weight/KV/lm_head quantization) vs the bf16 full-recompute reference
    (``forward_full``) on the same tokens."""
    from nano_vllm_candle_tpu.config import EngineConfig
    from nano_vllm_candle_tpu.llm import LLM

    ppl_full = perplexity(params, config, token_ids)
    llm = LLM(config=config, params=params,
              engine_config=EngineConfig(**(engine_kwargs or {})))
    ppl_engine = engine_path_perplexity(
        llm, token_ids, chunk=chunk, decode_tail=decode_tail
    )
    delta = ppl_engine - ppl_full
    return {
        "ppl_full_recompute": ppl_full,
        "ppl_engine_path": ppl_engine,
        "delta": delta,
        # exp() amplifies absolute ppl deltas at the high perplexities of
        # random-init models (ppl ~vocab_size); the relative form is the
        # scale-free number to eyeball alongside the BASELINE.json gate.
        "delta_relative": delta / ppl_full,
        "gate_max_delta": max_delta,
        "pass": abs(delta) <= max_delta,
        "num_tokens": len(token_ids),
    }


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
