"""ctypes bindings for the C++ runtime (csrc/libnvct_runtime.so).

``NativeBlockManager`` is a drop-in replacement for the pure-Python
``BlockManager`` (same method surface, same semantics — property-tested
against it in tests/test_native.py). The shared library is built on demand
with the in-image g++ (no pybind11 available; plain C ABI + ctypes per the
environment constraints).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

from nano_vllm_candle_tpu.engine.block_manager import BlockManagerConfig
from nano_vllm_candle_tpu.engine.sequence import Sequence

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libnvct_runtime.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_CSRC, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception as e:
        logger.warning("native runtime build failed: %s", e)
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "block_manager.cpp")
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("could not load native runtime: %s", e)
        return None
    lib.bm_create.restype = ctypes.c_void_p
    lib.bm_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.bm_destroy.argtypes = [ctypes.c_void_p]
    lib.bm_num_free.restype = ctypes.c_int
    lib.bm_num_free.argtypes = [ctypes.c_void_p]
    lib.bm_can_allocate.restype = ctypes.c_int
    lib.bm_can_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.bm_num_free_rank.restype = ctypes.c_int
    lib.bm_num_free_rank.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bm_allocate.restype = ctypes.c_int
    lib.bm_allocate.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.bm_table_len.restype = ctypes.c_int
    lib.bm_table_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.bm_get_table.restype = ctypes.c_int
    lib.bm_get_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.bm_can_extend.restype = ctypes.c_int
    lib.bm_can_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.bm_extend.restype = ctypes.c_int
    lib.bm_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.bm_finalize_full_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    lib.bm_deallocate.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return lib


def _tokens_ptr(token_ids: List[int]):
    arr = np.asarray(token_ids, dtype=np.int64)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeBlockManager:
    """C++-backed block manager with the Python ``BlockManager`` interface."""

    def __init__(self, config: BlockManagerConfig) -> None:
        lib = load_library()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.block_size = config.block_size
        self.num_blocks = config.num_blocks
        self.enable_prefix_caching = config.enable_prefix_caching
        self.dp_ranks = max(1, config.dp_ranks)
        if config.num_blocks % self.dp_ranks:
            raise ValueError(
                f"num_blocks={config.num_blocks} not divisible by "
                f"dp_ranks={self.dp_ranks} (the page axis shards over dp)"
            )
        self.blocks_per_rank = config.num_blocks // self.dp_ranks
        self._h = lib.bm_create(
            config.num_blocks, config.block_size,
            int(config.enable_prefix_caching), self.dp_ranks,
        )
        if not self._h:
            raise RuntimeError("bm_create failed")

    def __del__(self) -> None:
        if getattr(self, "_h", None):
            self._lib.bm_destroy(self._h)
            self._h = None

    # -- interface parity with engine/block_manager.py ------------------------

    @property
    def num_free_blocks(self) -> int:
        return self._lib.bm_num_free(self._h)

    @property
    def num_null_blocks(self) -> int:
        """Reserved null pages (one per dp rank)."""
        return self.dp_ranks

    def num_free_blocks_rank(self, rank: int) -> int:
        return self._lib.bm_num_free_rank(self._h, rank)

    @staticmethod
    def _rank_of_seq(seq: Sequence) -> int:
        return getattr(seq, "home_rank", 0)

    def can_allocate(self, seq: Sequence) -> bool:
        return bool(self._lib.bm_can_allocate(
            self._h, len(seq.token_ids), self._rank_of_seq(seq)))

    def allocate(self, seq: Sequence) -> None:
        assert not seq.block_table, "sequence already allocated"
        arr, ptr = _tokens_ptr(seq.token_ids)
        cached = self._lib.bm_allocate(
            self._h, seq.seq_id, ptr, len(arr), self._rank_of_seq(seq))
        if cached < 0:
            raise RuntimeError("out of KV cache blocks")
        seq.num_cached_tokens = cached
        self._sync_table(seq)

    def can_append(self, seq: Sequence) -> bool:
        return self.can_extend(seq, 1)

    def can_extend(self, seq: Sequence, n_tokens: int) -> bool:
        return bool(
            self._lib.bm_can_extend(self._h, seq.seq_id, len(seq.token_ids), n_tokens)
        )

    def can_extend_batch(self, seqs: List[Sequence], n_tokens: int) -> bool:
        """Aggregate-need check (see BlockManager.can_extend_batch): the
        per-seq need is host-computable from the mirrored block table,
        checked per home rank (ranks own disjoint page pools)."""
        bs = self.block_size
        need = [0] * self.dp_ranks
        for seq in seqs:
            blocks = -(-(len(seq.token_ids) - 1 + n_tokens) // bs)
            need[self._rank_of_seq(seq)] += max(
                0, blocks - len(seq.block_table))
        return all(
            self._lib.bm_num_free_rank(self._h, r) >= need[r]
            for r in range(self.dp_ranks)
        )

    def may_append(self, seq: Sequence) -> None:
        self.extend(seq, 1)

    def extend(self, seq: Sequence, n_tokens: int) -> None:
        added = self._lib.bm_extend(self._h, seq.seq_id, len(seq.token_ids), n_tokens)
        if added < 0:
            raise RuntimeError("out of KV cache blocks")
        if added:
            self._sync_table(seq)

    def finalize_full_blocks(self, seq: Sequence) -> None:
        arr, ptr = _tokens_ptr(seq.token_ids)
        self._lib.bm_finalize_full_blocks(self._h, seq.seq_id, ptr, len(arr))

    def deallocate(self, seq: Sequence) -> None:
        self._lib.bm_deallocate(self._h, seq.seq_id)
        seq.block_table = []
        seq.num_cached_tokens = 0

    def slot_for(self, seq: Sequence, token_idx: int) -> int:
        block = seq.block_table[token_idx // self.block_size]
        return block * self.block_size + token_idx % self.block_size

    def _sync_table(self, seq: Sequence) -> None:
        n = self._lib.bm_table_len(self._h, seq.seq_id)
        buf = (ctypes.c_int * n)()
        got = self._lib.bm_get_table(self._h, seq.seq_id, buf, n)
        seq.block_table = list(buf[:got])
