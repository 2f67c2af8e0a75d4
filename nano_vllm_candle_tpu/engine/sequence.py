"""Per-request sequence state.

Mirrors ``/root/reference/src/engine/sequence.rs``: global atomic sequence
ids (``sequence.rs:5,32``), Waiting/Running/Finished status (7-12), token
storage with a prompt/completion split (65-71), block-table bookkeeping with
the same block math (77-91), and sampling fields copied from
``SamplingParams`` (43-45).
"""

from __future__ import annotations

import enum
import itertools
from typing import List, Sequence as Seq

from nano_vllm_candle_tpu.sampling_params import SamplingParams

_seq_counter = itertools.count()


class SequenceStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"


class Sequence:
    def __init__(
        self,
        token_ids: Seq[int],
        sampling_params: SamplingParams,
        block_size: int = 256,
    ) -> None:
        if not token_ids:
            raise ValueError("prompt must contain at least one token")
        self.seq_id: int = next(_seq_counter)
        self.block_size = block_size
        self.block_table: List[int] = []
        # Pinned decode slot (batch row), assigned at admission and held
        # until finish/preemption. Pinning makes a sequence's row — and
        # therefore its dp shard under a (dp, tp) mesh — stable for its
        # whole life, the invariant that lets the KV cache shard its page
        # axis over dp (each rank owns its slots' pages; no commit
        # all-gather). ``home_rank`` = slot // (max_num_seqs / dp).
        self.slot: "int | None" = None
        self.home_rank: int = 0
        self.status = SequenceStatus.WAITING
        self.token_ids: List[int] = list(token_ids)
        self.last_token: int = self.token_ids[-1] if self.token_ids else 0
        self.num_prompt_tokens: int = len(self.token_ids)
        # Tokens whose KV already sits in cache blocks (prefix-cache hits /
        # resumed prefill). The reference sets this in its stub allocate
        # (block_manager.rs:76) — incorrectly to seq.len(); here it is real.
        self.num_cached_tokens: int = 0
        # Prompt tokens whose KV is committed AND whose attention has been
        # computed (chunked prefill resumes here; prefix-cache hits start it
        # at num_cached_tokens — the compute skip).
        self.num_computed_tokens: int = 0
        # End of the prefill span scheduled this step (set by the scheduler;
        # == len(seq) for a completing prefill, less for a partial chunk).
        self.prefill_target: int = 0
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos
        self.top_k = sampling_params.top_k
        self.top_p = sampling_params.top_p
        # Failure degradation (reference parity: forward errors emit EOS and
        # finish the request instead of crashing the engine,
        # llm_engine.rs:154-175). Set when the sequence was finished because
        # of an error (runner failure / unschedulable request).
        self.error: "str | None" = None

    def __len__(self) -> int:
        return len(self.token_ids)

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return len(self.token_ids) - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> List[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> List[int]:
        return self.token_ids[self.num_prompt_tokens :]

    @property
    def num_blocks(self) -> int:
        """ceil(len / block_size) — sequence.rs:77-79."""
        return -(-len(self.token_ids) // self.block_size)

    @property
    def last_block_num_tokens(self) -> int:
        """Tokens in the final (possibly partial) block — sequence.rs:81-83."""
        return len(self.token_ids) - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> List[int]:
        """Token ids of logical block ``i`` — sequence.rs:85-91."""
        if not 0 <= i < self.num_blocks:
            raise IndexError(f"block {i} out of range for {self.num_blocks} blocks")
        return self.token_ids[i * self.block_size : (i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)
        self.last_token = token_id

    def __repr__(self) -> str:
        return (
            f"Sequence(id={self.seq_id}, status={self.status.value}, "
            f"len={len(self)}, prompt={self.num_prompt_tokens}, "
            f"blocks={len(self.block_table)})"
        )
