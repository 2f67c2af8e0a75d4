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
    """Mirrors ``block_manager.rs:3-22`` (num_blocks / block_size).

    ``dp_ranks > 1`` partitions the physical page space into dp equal
    ranges (the device-side cache shards its page axis over the mesh's dp
    axis, ``parallel/spmd.py``): rank ``r`` owns pages ``[r*P/dp,
    (r+1)*P/dp)``, the FIRST page of each range is that rank's reserved
    null page, and a sequence's pages are drawn from its home rank's range
    only — so decode attention and KV commits never touch another rank's
    shard and the per-step dp all-gather of commit rows disappears.
    """

    num_blocks: int = 0
    block_size: int = 256
    enable_prefix_caching: bool = True
    dp_ranks: int = 1


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
        self.dp_ranks = max(1, config.dp_ranks)
        if config.num_blocks % self.dp_ranks:
            raise ValueError(
                f"num_blocks={config.num_blocks} not divisible by "
                f"dp_ranks={self.dp_ranks} (the page axis shards over dp)"
            )
        self.blocks_per_rank = config.num_blocks // self.dp_ranks
        self.blocks: List[Block] = [Block(i) for i in range(config.num_blocks)]
        # The first page of each rank's range is that rank's reserved null
        # page (page 0 for dp_ranks == 1) — never allocated: padding tokens
        # scatter there, and the shard_map islands redirect out-of-range
        # writes to LOCAL page 0 = the owning rank's null.
        self.free_by_rank: List[Deque[int]] = [
            deque(range(r * self.blocks_per_rank + 1,
                        (r + 1) * self.blocks_per_rank))
            for r in range(self.dp_ranks)
        ]
        # Prefix-cache map keyed (home_rank, hash): a cached block is only
        # reusable by sequences homed on the rank that owns its page range.
        self.hash_to_block: Dict[Tuple[int, int], int] = {}

    # -- capacity queries (block_manager.rs:64-66,89-91, made real) ---------

    @property
    def num_free_blocks(self) -> int:
        return sum(len(q) for q in self.free_by_rank)

    @property
    def free_blocks(self) -> List[int]:
        """Flat view of every rank's free list (inspection/tests)."""
        return [b for q in self.free_by_rank for b in q]

    def num_free_blocks_rank(self, rank: int) -> int:
        return len(self.free_by_rank[rank])

    @property
    def num_null_blocks(self) -> int:
        """Reserved null pages (one per dp rank)."""
        return self.dp_ranks

    def _rank_of_seq(self, seq: Sequence) -> int:
        return getattr(seq, "home_rank", 0)

    def can_allocate(self, seq: Sequence) -> bool:
        """Admission check for prefill. Conservative: ignores prefix hits, so
        an admitted sequence can always be fully allocated."""
        return seq.num_blocks <= len(self.free_by_rank[self._rank_of_seq(seq)])

    def _blocks_needed(self, seq: Sequence, n_tokens: int) -> int:
        """Additional blocks required before the next ``n_tokens`` decode
        steps run: the coming steps write KV for token indices
        ``len-1 .. len-2+n``, so the table must cover ``len-1+n`` tokens."""
        needed = -(-(len(seq.token_ids) - 1 + n_tokens) // self.block_size)
        return max(0, needed - len(seq.block_table))

    def can_append(self, seq: Sequence) -> bool:
        return self.can_extend(seq, 1)

    def can_extend(self, seq: Sequence, n_tokens: int) -> bool:
        return (
            len(self.free_by_rank[self._rank_of_seq(seq)])
            >= self._blocks_needed(seq, n_tokens)
        )

    def can_extend_batch(self, seqs: List[Sequence], n_tokens: int) -> bool:
        """Whether ALL of ``seqs`` can extend by ``n_tokens`` together.

        Per-sequence ``can_extend`` checks are not composable — each extend
        consumes shared free blocks, so seq A passing its check can starve
        seq B mid-batch. The aggregate need must be checked up front,
        per home rank (ranks own disjoint page pools).
        """
        need = [0] * self.dp_ranks
        for s in seqs:
            need[self._rank_of_seq(s)] += self._blocks_needed(s, n_tokens)
        return all(
            len(self.free_by_rank[r]) >= need[r]
            for r in range(self.dp_ranks)
        )

    # -- allocation ----------------------------------------------------------

    def _take_free_block(self, rank: int) -> Block:
        free = self.free_by_rank[rank]
        if not free:
            raise RuntimeError("out of KV cache blocks")
        block = self.blocks[free.popleft()]
        # Evict any stale prefix-cache entry pointing at this block.
        if block.hash is not None and self.hash_to_block.get(
            (rank, block.hash)
        ) == block.block_id:
            del self.hash_to_block[(rank, block.hash)]
        block.reset()
        return block

    def allocate(self, seq: Sequence) -> None:
        """Build ``seq.block_table`` for the whole prompt, reusing cached
        full blocks where the rolling hash (and tokens, vs collisions)
        match. Sets ``seq.num_cached_tokens`` to the reused span."""
        assert not seq.block_table, "sequence already allocated"
        rank = self._rank_of_seq(seq)
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
                cand = self.hash_to_block.get((rank, h))
                if cand is not None and self.blocks[cand].token_ids == list(tokens):
                    reused = self.blocks[cand]
            if reused is not None:
                if reused.ref_count == 0:
                    self.free_by_rank[rank].remove(reused.block_id)
                reused.ref_count += 1
                seq.block_table.append(reused.block_id)
                num_cached += self.block_size
                continue

            cache_hit = False  # prefix broken: later blocks can't hit
            block = self._take_free_block(rank)
            block.token_ids = list(tokens)
            if h is not None and self.enable_prefix_caching:
                block.hash = h
                self.hash_to_block[(rank, h)] = block.block_id
            seq.block_table.append(block.block_id)
        seq.num_cached_tokens = num_cached

    def may_append(self, seq: Sequence) -> None:
        """Grow the block table before one decode step. Replaces the
        reference no-op (``block_manager.rs:98``)."""
        self.extend(seq, 1)

    def extend(self, seq: Sequence, n_tokens: int) -> None:
        """Grow the block table to cover the next ``n_tokens`` decode steps
        (multi-step decode pre-allocates its whole burst)."""
        rank = self._rank_of_seq(seq)
        for _ in range(self._blocks_needed(seq, n_tokens)):
            seq.block_table.append(self._take_free_block(rank).block_id)

    def finalize_full_blocks(self, seq: Sequence) -> None:
        """Content-hash blocks that decode has filled, making them
        prefix-shareable. Called after tokens are appended (their values are
        only known then)."""
        if not self.enable_prefix_caching:
            return
        rank = self._rank_of_seq(seq)
        num_full = len(seq.token_ids) // self.block_size
        prefix_hash = 0
        for i in range(min(num_full, len(seq.block_table))):
            block = self.blocks[seq.block_table[i]]
            if block.hash is None:
                if block.ref_count == 1:
                    tokens = tuple(seq.block(i))
                    block.token_ids = list(tokens)
                    block.hash = _block_hash(prefix_hash, tokens)
                    self.hash_to_block.setdefault(
                        (rank, block.hash), block.block_id)
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
                # A page returns to the rank range it belongs to.
                self.free_by_rank[block_id // self.blocks_per_rank].append(
                    block_id)
        seq.block_table = []
        seq.num_cached_tokens = 0

    # -- device-side addressing ----------------------------------------------

    def slot_for(self, seq: Sequence, token_idx: int) -> int:
        """Flat cache slot (physical_block * block_size + offset) of a
        logical token index."""
        block = seq.block_table[token_idx // self.block_size]
        return block * self.block_size + token_idx % self.block_size
