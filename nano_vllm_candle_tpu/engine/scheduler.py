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
    # The runner pads each prefill sequence to a multiple of this granularity
    # (the model's cache-commit GROUP); admission budgets must count padded
    # lengths or the runner's bucket lookup can overflow mid-serve.
    prefill_granularity: int = 1
    # Hard cap on prompt+completion length (0 = unlimited). Sequences are
    # finished with reason "length" when they reach it, so the runner's
    # per-sequence block table can never overflow.
    max_model_len: int = 0
    # Decode steps executed per schedule round in ONE device dispatch
    # (multi-step decode; sampled tokens feed forward on device). 1 =
    # reference-style single-step scheduling.
    decode_burst: int = 1
    # Use the C++ block manager (csrc/) when buildable; falls back to Python.
    native_block_manager: bool = True
    # Data-parallel ranks owning disjoint KV page ranges (dp-sharded cache,
    # parallel/spmd.py). 1 = single shared page pool. When > 1, a sequence's
    # pages are allocated from its home rank's range (home rank = pinned
    # slot // (max_num_seqs / dp_ranks)) so decode attention and commits
    # never touch another rank's shard.
    dp_ranks: int = 1

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
            dp_ranks=config.dp_ranks,
        )
        self.dp_ranks = max(1, config.dp_ranks)
        if self.max_num_seqs % self.dp_ranks:
            raise ValueError("max_num_seqs must be divisible by dp_ranks")
        self.slots_per_rank = self.max_num_seqs // self.dp_ranks
        # Pinned decode slots: popped smallest-first (deterministic across
        # SPMD ranks), returned on finish/preemption.
        self.free_slots: List[int] = list(range(self.max_num_seqs))
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
        self.prefill_granularity = max(1, config.prefill_granularity)
        self.max_model_len = config.max_model_len
        self.waiting: Deque[Sequence] = deque()
        self.running: Deque[Sequence] = deque()
        # Sequences finished outside a step (admission rejects, degraded
        # errors); the engine drains this each step to surface their outputs.
        self.rejected: List[Sequence] = []
        # step metrics (SURVEY.md §5.5 rebuild note)
        self.num_preemptions = 0

    # -- queue management ----------------------------------------------------

    def _padded_len(self, seq: Sequence) -> int:
        """Prefill token cost of a sequence after the runner's GROUP padding
        (model_runner._build_prefill_tokens pads each sequence to a multiple
        of the cache-commit granularity)."""
        g = self.prefill_granularity
        return -(-len(seq) // g) * g

    def _admission_error(self, seq: Sequence) -> Optional[str]:
        """Why this sequence can NEVER be scheduled (None if it can).

        Prompts longer than the token budget are NOT errors — chunked
        prefill processes them across steps."""
        # One null page is reserved per dp rank (block 0 for dp=1); a
        # sequence's pages all come from its home rank's range.
        bm = self.block_manager
        usable_blocks = getattr(bm, "blocks_per_rank", bm.num_blocks) - 1
        if seq.num_blocks > usable_blocks:
            return (
                f"prompt needs {seq.num_blocks} KV blocks > "
                f"{usable_blocks} total"
            )
        if self.max_model_len and len(seq) > self.max_model_len:
            return (
                f"prompt of {len(seq)} tokens exceeds max_model_len="
                f"{self.max_model_len}"
            )
        return None

    def add(self, seq: Sequence) -> bool:
        """Enqueue a request; returns False (and finishes the sequence with
        an error) if it can never be scheduled — the reference-parity
        alternative to livelocking on an oversized prompt."""
        seq.block_size = self.block_size
        err = self._admission_error(seq)
        if err is not None:
            self.force_finish(seq, error=err)
            return False
        self.waiting.append(seq)
        return True

    def force_finish(self, seq: Sequence, *, error: Optional[str] = None) -> None:
        """Finish a sequence out-of-band (admission reject or runner error),
        emitting EOS as its next token the way the reference degrades
        failures (``llm_engine.rs:154-175``) so output shapes stay uniform.
        """
        if seq.is_finished:
            return
        if error is not None:
            seq.error = error
            logger.error("seq=%d force-finished: %s", seq.seq_id, error)
        seq.append_token(self.eos)
        seq.status = SequenceStatus.FINISHED
        self._release_slot(seq)
        self.block_manager.deallocate(seq)
        for q in (self.running, self.waiting):
            try:
                q.remove(seq)
            except ValueError:
                pass
        self.rejected.append(seq)

    def drain_finished_out_of_band(self) -> List[Sequence]:
        out, self.rejected = self.rejected, []
        return out

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    def _assign_slot(self, seq: Sequence) -> bool:
        """Pin a decode slot (batch row) at admission. The slot determines
        the sequence's dp home rank — under a dp-sharded KV cache its pages
        must come from that rank's range, so the slot must be fixed BEFORE
        allocation and held until finish/preemption.

        Among free slots, prefer the smallest one whose home rank's page
        pool can hold the prompt (dp_ranks > 1: a pinned-smallest policy
        would head-of-line-block admission behind one exhausted rank while
        other ranks sit idle with free pages); fall back to the smallest
        free slot. Both tie-breaks are deterministic across SPMD ranks
        (identical scheduler state everywhere)."""
        if seq.slot is not None:
            return True
        if not self.free_slots:
            return False
        self.free_slots.sort()
        pick = None
        if self.dp_ranks > 1:
            bm = self.block_manager
            for s in self.free_slots:
                r = s // self.slots_per_rank
                if bm.num_free_blocks_rank(r) >= seq.num_blocks:
                    pick = s
                    break
        if pick is None:
            pick = self.free_slots[0]
        self.free_slots.remove(pick)
        seq.slot = pick
        seq.home_rank = seq.slot // self.slots_per_rank
        return True

    def _release_slot(self, seq: Sequence) -> None:
        if seq.slot is not None:
            self.free_slots.append(seq.slot)
            seq.slot = None
            seq.home_rank = 0

    # -- scheduling (scheduler.rs:106-111) -----------------------------------

    def schedule(self) -> Tuple[List[Sequence], bool]:
        """Returns ``(seqs, is_prefill)``. Prefill admission has priority;
        otherwise one decode token per running sequence."""
        prefill = self._try_schedule_prefill()
        if prefill:
            return prefill, True
        return self._schedule_decode(), False

    def try_schedule_prefill(self) -> List[Sequence]:
        """Prefill-only admission (the engine's in-flight-prefill path slots
        a prefill behind in-flight decode bursts)."""
        return self._try_schedule_prefill()

    def _try_schedule_prefill(self) -> List[Sequence]:
        """Admission from ``waiting`` bounded by seq cap, token budget and
        block availability (scheduler.rs:113-157), widened with chunked
        prefill and the prefix-cache compute skip.

        Every scheduled sequence gets ``prefill_target`` — the end of the
        span the runner must process this step, starting from
        ``num_computed_tokens``. Invariants the runner relies on:

        - a step either batches only fresh spans (num_computed == 0) or
          processes exactly ONE continuation/prefix sequence (the paged-
          prefix attention is a single-sequence kernel);
        - chunk boundaries are GROUP-aligned (page-commit windows must not
          straddle chunks), except the final chunk;
        - the sum of GROUP-padded span lengths fits the token budget (the
          runner's bucket lookup can't overflow).

        Budgets count GROUP-padded span lengths — exactly what the runner
        packs into the prefill bucket.
        """
        scheduled: List[Sequence] = []
        budget = self.max_num_batched_tokens
        g = self.prefill_granularity
        while self.waiting and budget >= g:
            seq = self.waiting[0]
            # A head that can NEVER be scheduled is finished with an error
            # instead of blocking the queue forever.
            err = self._admission_error(seq)
            if err is not None:
                self.waiting.popleft()
                self.force_finish(seq, error=err)
                continue
            if len(self.running) + len(scheduled) >= self.max_num_seqs:
                break
            is_new = not seq.block_table
            if is_new:
                # Slot BEFORE allocation: the slot fixes the home rank whose
                # page range the allocation must draw from (dp-sharded KV).
                if not self._assign_slot(seq):
                    break
                if not self.block_manager.can_allocate(seq):
                    self._release_slot(seq)
                    break
                self.block_manager.allocate(seq)
                if seq.num_cached_tokens >= len(seq):
                    # Whole prompt was a prefix hit: the last token must
                    # still be processed to produce logits to sample from,
                    # and its last GROUP window recommitted with it.
                    seq.num_cached_tokens = (
                        (len(seq) - 1) // g
                    ) * g
                # Prefix-cache COMPUTE skip: attention/FFN run only for the
                # uncached suffix; the cached prefix is read from its pages.
                seq.num_computed_tokens = seq.num_cached_tokens

            if seq.num_computed_tokens > 0 and scheduled:
                # Continuation / prefix sequence: single-sequence step.
                break
            remaining = len(seq) - seq.num_computed_tokens
            padded_rem = -(-remaining // g) * g
            if padded_rem <= budget:
                take = remaining  # completes this step
            else:
                take = (budget // g) * g  # partial, GROUP-aligned
                if take <= 0 or scheduled:
                    break  # give it a full budget next round
            seq.prefill_target = seq.num_computed_tokens + take
            budget -= -(-take // g) * g
            self.waiting.popleft()
            scheduled.append(seq)
            if seq.prefill_target < len(seq):
                # Partial chunk: stays at the head of the queue, keeps its
                # blocks; later admissions can't leapfrog it.
                self.waiting.appendleft(seq)
                logger.debug(
                    "prefill chunk seq=%d span=[%d,%d) of %d",
                    seq.seq_id, seq.num_computed_tokens, seq.prefill_target,
                    len(seq),
                )
                break
            seq.status = SequenceStatus.RUNNING
            logger.debug(
                "prefill admit seq=%d len=%d cached=%d computed=%d",
                seq.seq_id, len(seq), seq.num_cached_tokens,
                seq.num_computed_tokens,
            )
            if seq.num_computed_tokens > 0:
                break  # single-sequence step (paged-prefix attention)
        self.running.extend(
            s for s in scheduled if s.status == SequenceStatus.RUNNING
        )
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
            n = self.extend_room(seq, K)
            preempted_self = False
            while not self.block_manager.can_extend(seq, n):
                # Preempting a victim homed on ANOTHER dp rank frees pages
                # in the wrong pool (per-rank page ranges) — pick the
                # last-scheduled victim on the starved sequence's OWN rank.
                victim = next(
                    (v for v in reversed(self.running)
                     if v.home_rank == seq.home_rank),
                    seq,
                )
                if victim is seq:
                    self._preempt(seq)
                    preempted_self = True
                    break
                self.running.remove(victim)
                self._preempt(victim)
            if preempted_self:
                continue  # self was removed; index i now points at next seq
            self.block_manager.extend(seq, n)
            scheduled.append(seq)
            i += 1
        return scheduled

    def extend_room(self, seq: Sequence, n_tokens: int) -> int:
        """Clamp a burst's block pre-allocation to ``max_model_len``: the
        device still runs the full burst, but tokens past the cap are
        discarded by post_process and their KV writes are routed to the null
        page, so blocks past the cap must never be allocated (the runner's
        per-sequence table is exactly ``max_model_len`` blocks wide)."""
        if not self.max_model_len:
            return n_tokens
        return max(0, min(n_tokens, self.max_model_len - len(seq) + 1))

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
        self._release_slot(seq)
        self.block_manager.deallocate(seq)
        seq.num_computed_tokens = 0  # KV freed; re-prefill from scratch
        seq.prefill_target = 0
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
            if seq.prefill_target and seq.prefill_target < len(seq):
                # Partial prefill chunk: record progress, discard the
                # (speculatively sampled) token, stay in the waiting queue.
                seq.num_computed_tokens = seq.prefill_target
                seq.prefill_target = 0
                continue
            if seq.prefill_target:
                seq.num_computed_tokens = len(seq)
                seq.prefill_target = 0
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
                hit_cap = seq.num_completion_tokens >= seq.max_tokens or (
                    self.max_model_len > 0 and len(seq) >= self.max_model_len
                )
                if hit_eos or hit_cap:
                    break
            if hit_eos or hit_cap:
                seq.status = SequenceStatus.FINISHED
                self._release_slot(seq)
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
