"""Tokenizer loading, chat templating, and a byte-level fallback.

Mirrors the reference CLI's tokenizer path (``/root/reference/src/main.rs:
137-159``): HF ``tokenizer.json`` via the ``tokenizers`` crate/lib, the
hardcoded Qwen chat template, and a byte-level fallback when no tokenizer
file exists (ours is handy for random-weight benchmarking).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

logger = logging.getLogger(__name__)

# The reference hardcodes this Qwen template (main.rs:141-151).
QWEN_CHAT_TEMPLATE = "<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"


class ByteTokenizer:
    """Byte-level fallback (main.rs:152-159): token id = byte value."""

    vocab_size = 256

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: List[int]) -> str:
        return bytes(i % 256 for i in ids).decode("utf-8", errors="replace")


class HFTokenizer:
    def __init__(self, path: str) -> None:
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=True)


def load_tokenizer(model_dir: Optional[str]):
    if model_dir:
        path = os.path.join(model_dir, "tokenizer.json")
        if os.path.exists(path):
            return HFTokenizer(path)
        logger.warning("no tokenizer.json in %s; using byte-level fallback", model_dir)
    return ByteTokenizer()


def apply_chat_template(prompt: str) -> str:
    return QWEN_CHAT_TEMPLATE.format(prompt=prompt)
