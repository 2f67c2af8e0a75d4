"""Offline quantization CLI: bf16 HF checkpoint -> INT8/INT4 artifact.

    python -m nano_vllm_candle_tpu.quantize --model /path/Qwen3-8B \\
        --bits int4 --out /path/Qwen3-8B-int4

The artifact (``quantized.safetensors`` + ``quant_config.json`` +
``config.json``) then loads directly via ``LLM(model_dir=out)`` — an
INT4 serve never materializes bf16 weights (SURVEY.md §5.4 rebuild note;
replaces the reference's mmap-F32-only path,
``/root/reference/src/models/qwen3.rs:515-523``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nano-vllm-candle-tpu quantize")
    p.add_argument("--model", required=True, help="bf16 HF checkpoint dir")
    p.add_argument("--out", required=True, help="artifact output dir")
    p.add_argument("--bits", default="int4", choices=["int8", "int4"])
    p.add_argument("--group-size", type=int, default=128)
    args = p.parse_args(argv)

    from nano_vllm_candle_tpu.utils.loader import save_quantized_checkpoint

    out = save_quantized_checkpoint(
        args.model, args.out, bits=args.bits, group_size=args.group_size
    )
    print(f"quantized artifact written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
