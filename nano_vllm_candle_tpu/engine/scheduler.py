"""vLLM-style two-phase scheduler (prefill-first, then decode w/ preemption).

Re-implements the reference's policy (``/root/reference/src/engine/
scheduler.rs:106-249``) against the *real* block manager, with its two latent
bugs fixed (SURVEY.md §2.7):

- token-budget accounting uses the true uncached token count (the reference's
  stub set ``num_cached_tokens = len`` making the budget a per-sequence
  limit only, ``block_manager.rs:76`` + ``scheduler.rs:134-138``);
- an all-preempted decode round returns an empty batch instead of panicking
  (``scheduler.rs:175-178`` asserts).
"""

from __future__ import annotations

import dataclasses
import logging
from collections import deque
from typing import Deque, List, Optional, Tuple

from nano_vllm_candle_tpu.engine.block_manager import BlockManager, BlockManagerConfig
from nano_vllm_candle_tpu.engine.sequence import Sequence, SequenceStatus

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SchedulerConfig:
    """Mirrors ``scheduler.rs:10-56`` fields & builder surface; the
    max_num_seqs default moves 1 → 8 (continuous batching is the point)."""

    max_num_seqs: int = 8
    max_num_batched_tokens: int = 4096
    eos: int = 0
    num_kvcache_blocks: int = 512
    kvcache_block_size: int = 256
    enable_prefix_caching: bool = True
    # Decode steps executed per schedule round in ONE device dispatch
    # (multi-step decode; sampled tokens feed forward on device). 1 =
    # reference-style single-step scheduling.
    decode_burst: int = 1
    # Use the C++ block manager (csrc/) when buildable; falls back to Python.
    native_block_manager: bool = True

    def with_max_num_seqs(self, n: int) -> "SchedulerConfig":
        return dataclasses.replace(self, max_num_seqs=n)

    def with_max_num_batched_tokens(self, n: int) -> "SchedulerConfig":
        return dataclasses.replace(self, max_num_batched_tokens=n)

    def with_eos(self, eos: int) -> "SchedulerConfig":
        return dataclasses.replace(self, eos=eos)

    def with_kvcache(self, num_blocks: int, block_size: int) -> "SchedulerConfig":
        return dataclasses.replace(
            self, num_kvcache_blocks=num_blocks, kvcache_block_size=block_size
        )


class Scheduler:
    def __init__(self, config: SchedulerConfig) -> None:
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        bm_config = BlockManagerConfig(
            num_blocks=config.num_kvcache_blocks,
            block_size=config.kvcache_block_size,
            enable_prefix_caching=config.enable_prefix_caching,
        )
        self.block_manager = None
        if config.native_block_manager:
            try:
                from nano_vllm_candle_tpu.engine.native import NativeBlockManager

                self.block_manager = NativeBlockManager(bm_config)
                logger.debug("using native (C++) block manager")
            except Exception as e:
                logger.warning("native block manager unavailable (%s); using Python", e)
        if self.block_manager is None:
            self.block_manager = BlockManager(bm_config)
        self.block_size = config.kvcache_block_size
        self.decode_burst = max(1, config.decode_burst)
        self.waiting: Deque[Sequence] = deque()
        self.running: Deque[Sequence] = deque()
        # step metrics (SURVEY.md §5.5 rebuild note)
        self.num_preemptions = 0

    # -- queue management ----------------------------------------------------

    def add(self, seq: Sequence) -> None:
        seq.block_size = self.block_size
        self.waiting.append(seq)

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    # -- scheduling (scheduler.rs:106-111) -----------------------------------

    def schedule(self) -> Tuple[List[Sequence], bool]:
        """Returns ``(seqs, is_prefill)``. Prefill admission has priority;
        otherwise one decode token per running sequence."""
        prefill = self._try_schedule_prefill()
        if prefill:
            return prefill, True
        return self._schedule_decode(), False

    def _try_schedule_prefill(self) -> List[Sequence]:
        """Admission from ``waiting`` bounded by seq cap, token budget and
        block availability (scheduler.rs:113-157)."""
        scheduled: List[Sequence] = []
        num_batched_tokens = 0
        while self.waiting:
            seq = self.waiting[0]
            if len(self.running) + len(scheduled) >= self.max_num_seqs:
                break
            # Conservative pre-admission estimate (real cached count is known
            # only after allocate() runs the prefix matcher).
            if num_batched_tokens + len(seq) > self.max_num_batched_tokens:
                break
            if not self.block_manager.can_allocate(seq):
                break
            self.waiting.popleft()
            self.block_manager.allocate(seq)
            if seq.num_cached_tokens >= len(seq):
                # Whole prompt was a prefix hit: the last token must still be
                # processed to produce logits to sample from.
                seq.num_cached_tokens = len(seq) - 1
            # Budget counts the full prompt: the runner currently recomputes
            # cached-prefix tokens too (prefix hits dedup KV *memory*; the
            # compute skip lands with cached-prefix prefill attention).
            num_batched_tokens += len(seq)
            seq.status = SequenceStatus.RUNNING
            scheduled.append(seq)
            logger.debug(
                "prefill admit seq=%d len=%d cached=%d batched=%d",
                seq.seq_id, len(seq), seq.num_cached_tokens, num_batched_tokens,
            )
        self.running.extend(scheduled)
        return scheduled

    def _schedule_decode(self) -> List[Sequence]:
        """Up to ``decode_burst`` tokens per running sequence; preempt from
        the back when blocks run out (scheduler.rs:159-186, preemption
        200-211). The whole burst's blocks are pre-allocated so the device
        can run the burst without host round trips."""
        K = self.decode_burst
        scheduled: List[Sequence] = []
        i = 0
        while i < len(self.running):
            seq = self.running[i]
            preempted_self = False
            while not self.block_manager.can_extend(seq, K):
                victim = self.running[-1]
                if victim is seq:
                    self._preempt(seq)
                    preempted_self = True
                    break
                self.running.pop()
                self._preempt(victim)
            if preempted_self:
                continue  # self was removed; index i now points at next seq
            self.block_manager.extend(seq, K)
            scheduled.append(seq)
            i += 1
        return scheduled

    def _preempt(self, seq: Sequence) -> None:
        """Return a sequence to the waiting queue, releasing its blocks
        (scheduler.rs:200-211). Its generated tokens are kept; the next
        prefill re-processes prompt+completion (prefix cache softens this)."""
        self.num_preemptions += 1
        logger.debug("preempt seq=%d len=%d", seq.seq_id, len(seq))
        try:
            self.running.remove(seq)
        except ValueError:
            pass
        self.block_manager.deallocate(seq)
        seq.status = SequenceStatus.WAITING
        self.waiting.appendleft(seq)

    # -- post-processing (scheduler.rs:213-249) ------------------------------

    def post_process(self, seqs: List[Sequence], token_ids: List[List[int]]) -> int:
        """Append each sequence's new token(s); finish on EOS/max_tokens.

        ``token_ids[i]`` holds 1 token (prefill / single-step decode) or up
        to ``decode_burst`` tokens. Tokens past a finish condition are
        discarded (the device ran the full burst speculatively; their KV
        landed in blocks freed here). Returns the number of accepted tokens.
        """
        assert len(seqs) == len(token_ids)
        accepted = 0
        for seq, tokens in zip(seqs, token_ids):
            if seq.is_finished:
                # Pipelined decode: a chained burst was dispatched before this
                # sequence's finish was known; its speculative tokens (and KV
                # writes into since-freed blocks) are discarded. Freed blocks
                # are safe to reuse concurrently: reads are seq_len-masked and
                # later writes win device ordering.
                continue
            hit_eos = hit_cap = False
            for token_id in tokens:
                seq.append_token(token_id)
                accepted += 1
                hit_eos = (not seq.ignore_eos) and token_id == self.eos
                hit_cap = seq.num_completion_tokens >= seq.max_tokens
                if hit_eos or hit_cap:
                    break
            if hit_eos or hit_cap:
                seq.status = SequenceStatus.FINISHED
                self.block_manager.deallocate(seq)
                try:
                    self.running.remove(seq)
                except ValueError:
                    pass
                logger.debug(
                    "finish seq=%d reason=%s completion=%d",
                    seq.seq_id, "eos" if hit_eos else "max_tokens",
                    seq.num_completion_tokens,
                )
            else:
                self.block_manager.finalize_full_blocks(seq)
        return accepted
