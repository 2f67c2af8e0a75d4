"""Paged KV-cache block manager — the real implementation.

The reference ships a stub with this exact public API and a comment promising
"an optimized implementation later" (``/root/reference/src/engine/
block_manager.rs:24-29``; ``can_allocate``/``can_append`` constant-true at
64-66/89-91, ``may_append`` a no-op at 98). This module delivers what that
API promises, modeled on nano-vllm/vLLM semantics:

- a **free list** of physical blocks with **reference counts** (blocks are
  shared across sequences on prefix hits);
- **prefix caching**: full blocks are content-addressed by a rolling hash of
  all tokens up to and including the block; a newly-admitted sequence reuses
  matching cached blocks and records ``num_cached_tokens`` so prefill can
  skip them (the reference's unused ``ahash`` dependency hints at exactly
  this design, ``Cargo.toml:19-20``);
- freed blocks keep their hash and stay reusable until recycled (freed list
  doubles as an LRU eviction queue).

Physical **block 0 is reserved as the null page**: padding tokens scatter
their (garbage) KV writes there, and padded block-table entries read from it
(masked out of the softmax), keeping all device gathers/scatters
unconditional. A pluggable C++ implementation with the same interface lives
in ``csrc/`` for large block counts.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, Dict, List, Optional, Tuple

from nano_vllm_candle_tpu.engine.sequence import Sequence

NULL_BLOCK = 0


@dataclasses.dataclass
class BlockManagerConfig:
    """Mirrors ``block_manager.rs:3-22`` (num_blocks / block_size)."""

    num_blocks: int = 0
    block_size: int = 256
    enable_prefix_caching: bool = True


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int) -> None:
        self.block_id = block_id
        self.ref_count = 0
        self.hash: Optional[int] = None
        self.token_ids: List[int] = []

    def reset(self) -> None:
        self.ref_count = 1
        self.hash = None
        self.token_ids = []


def _block_hash(prefix_hash: int, token_ids: Tuple[int, ...]) -> int:
    """Rolling content hash: identifies a full block by its tokens *and* its
    prefix, so equal hashes imply equal KV contents."""
    return hash((prefix_hash, token_ids))


class BlockManager:
    def __init__(self, config: BlockManagerConfig) -> None:
        self.block_size = config.block_size
        self.num_blocks = config.num_blocks
        self.enable_prefix_caching = config.enable_prefix_caching
        self.blocks: List[Block] = [Block(i) for i in range(config.num_blocks)]
        # Block 0 is the null page — never allocated.
        self.free_blocks: Deque[int] = deque(range(1, config.num_blocks))
        self.hash_to_block: Dict[int, int] = {}

    # -- capacity queries (block_manager.rs:64-66,89-91, made real) ---------

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_blocks)

    def can_allocate(self, seq: Sequence) -> bool:
        """Admission check for prefill. Conservative: ignores prefix hits, so
        an admitted sequence can always be fully allocated."""
        return seq.num_blocks <= self.num_free_blocks

    def _blocks_needed(self, seq: Sequence, n_tokens: int) -> int:
        """Additional blocks required before the next ``n_tokens`` decode
        steps run: the coming steps write KV for token indices
        ``len-1 .. len-2+n``, so the table must cover ``len-1+n`` tokens."""
        needed = -(-(len(seq.token_ids) - 1 + n_tokens) // self.block_size)
        return max(0, needed - len(seq.block_table))

    def can_append(self, seq: Sequence) -> bool:
        return self.can_extend(seq, 1)

    def can_extend(self, seq: Sequence, n_tokens: int) -> bool:
        return self.num_free_blocks >= self._blocks_needed(seq, n_tokens)

    def can_extend_batch(self, seqs: List[Sequence], n_tokens: int) -> bool:
        """Whether ALL of ``seqs`` can extend by ``n_tokens`` together.

        Per-sequence ``can_extend`` checks are not composable — each extend
        consumes shared free blocks, so seq A passing its check can starve
        seq B mid-batch. The aggregate need must be checked up front.
        """
        return self.num_free_blocks >= sum(
            self._blocks_needed(s, n_tokens) for s in seqs
        )

    # -- allocation ----------------------------------------------------------

    def _take_free_block(self) -> Block:
        if not self.free_blocks:
            raise RuntimeError("out of KV cache blocks")
        block = self.blocks[self.free_blocks.popleft()]
        # Evict any stale prefix-cache entry pointing at this block.
        if block.hash is not None and self.hash_to_block.get(block.hash) == block.block_id:
            del self.hash_to_block[block.hash]
        block.reset()
        return block

    def allocate(self, seq: Sequence) -> None:
        """Build ``seq.block_table`` for the whole prompt, reusing cached
        full blocks where the rolling hash (and tokens, vs collisions)
        match. Sets ``seq.num_cached_tokens`` to the reused span."""
        assert not seq.block_table, "sequence already allocated"
        prefix_hash = 0
        cache_hit = self.enable_prefix_caching
        num_cached = 0
        for i in range(seq.num_blocks):
            tokens = tuple(seq.block(i))
            is_full = len(tokens) == self.block_size
            h = _block_hash(prefix_hash, tokens) if is_full else None
            if h is not None:
                prefix_hash = h

            reused = None
            if cache_hit and h is not None:
                cand = self.hash_to_block.get(h)
                if cand is not None and self.blocks[cand].token_ids == list(tokens):
                    reused = self.blocks[cand]
            if reused is not None:
                if reused.ref_count == 0:
                    self.free_blocks.remove(reused.block_id)
                reused.ref_count += 1
                seq.block_table.append(reused.block_id)
                num_cached += self.block_size
                continue

            cache_hit = False  # prefix broken: later blocks can't hit
            block = self._take_free_block()
            block.token_ids = list(tokens)
            if h is not None and self.enable_prefix_caching:
                block.hash = h
                self.hash_to_block[h] = block.block_id
            seq.block_table.append(block.block_id)
        seq.num_cached_tokens = num_cached

    def may_append(self, seq: Sequence) -> None:
        """Grow the block table before one decode step. Replaces the
        reference no-op (``block_manager.rs:98``)."""
        self.extend(seq, 1)

    def extend(self, seq: Sequence, n_tokens: int) -> None:
        """Grow the block table to cover the next ``n_tokens`` decode steps
        (multi-step decode pre-allocates its whole burst)."""
        for _ in range(self._blocks_needed(seq, n_tokens)):
            seq.block_table.append(self._take_free_block().block_id)

    def finalize_full_blocks(self, seq: Sequence) -> None:
        """Content-hash blocks that decode has filled, making them
        prefix-shareable. Called after tokens are appended (their values are
        only known then)."""
        if not self.enable_prefix_caching:
            return
        num_full = len(seq.token_ids) // self.block_size
        prefix_hash = 0
        for i in range(min(num_full, len(seq.block_table))):
            block = self.blocks[seq.block_table[i]]
            if block.hash is None:
                if block.ref_count == 1:
                    tokens = tuple(seq.block(i))
                    block.token_ids = list(tokens)
                    block.hash = _block_hash(prefix_hash, tokens)
                    self.hash_to_block.setdefault(block.hash, block.block_id)
                    prefix_hash = block.hash
                else:
                    # Shared-but-unhashed cannot happen (only hashed blocks
                    # are ever shared); stop to be safe.
                    break
            else:
                prefix_hash = block.hash

    def _prefix_hash_for(self, seq: Sequence, block_idx: int) -> int:
        h = 0
        for i in range(block_idx):
            h = _block_hash(h, tuple(seq.block(i)))
        return h

    def deallocate(self, seq: Sequence) -> None:
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            assert block.ref_count >= 0
            if block.ref_count == 0:
                # Keep hash for reuse; recycle in freed order (LRU eviction).
                self.free_blocks.append(block_id)
        seq.block_table = []
        seq.num_cached_tokens = 0

    # -- device-side addressing ----------------------------------------------

    def slot_for(self, seq: Sequence, token_idx: int) -> int:
        """Flat cache slot (physical_block * block_size + offset) of a
        logical token index."""
        block = seq.block_table[token_idx // self.block_size]
        return block * self.block_size + token_idx % self.block_size
