"""Generic continuous-batching engine driver.

Mirrors ``/root/reference/src/engine/llm_engine.rs``: a model-agnostic
``LLMEngine`` generic over a one-method ``ModelRunner`` seam
(``llm_engine.rs:16-18``), with ``add_request`` / ``step`` / ``is_finished``
/ ``generate`` (228-325), ``StepOutput``'s signed token-count convention
(253-257: positive = prefill tokens, negative = decode batch size), and the
``DummyModelRunner`` fake (20-33) that lets the whole control plane be
tested without a model.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional, Protocol, Sequence as Seq, Tuple

from nano_vllm_candle_tpu.engine.scheduler import Scheduler
from nano_vllm_candle_tpu.engine.sequence import Sequence
from nano_vllm_candle_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class ModelRunner(Protocol):
    """One-method abstraction decoupling engine from model
    (``llm_engine.rs:16-18``), widened for multi-step decode."""

    def run(self, seqs: List[Sequence], is_prefill: bool) -> List[List[int]]:
        """Return the next token id(s) for each scheduled sequence — one for
        prefill, up to ``decode_burst`` for decode."""
        ...


class DummyModelRunner:
    """Test fake: next token = last_token + 1 (``llm_engine.rs:20-33``)."""

    def __init__(self, burst: int = 1) -> None:
        self.burst = burst

    def run(self, seqs: List[Sequence], is_prefill: bool) -> List[List[int]]:
        k = 1 if is_prefill else self.burst
        return [
            [seq.last_token + 1 + i for i in range(k)] for seq in seqs
        ]


@dataclasses.dataclass
class GenerationOutput:
    """Per-request result (``llm_engine.rs:191-212``)."""

    seq_id: int
    token_ids: List[int]
    text: Optional[str] = None
    # Set when the request was finished by failure degradation (runner error
    # or unschedulable prompt) rather than EOS/max_tokens — the
    # reference-parity posture of emitting EOS and carrying on
    # (``llm_engine.rs:154-175``).
    error: Optional[str] = None

    def with_text(self, text: str) -> "GenerationOutput":
        return dataclasses.replace(self, text=text)


@dataclasses.dataclass
class StepOutput:
    """One engine step's results (``llm_engine.rs:328-333``)."""

    outputs: List[Tuple[int, List[int]]]  # (seq_id, completion_token_ids)
    is_prefill: bool
    # positive = prefill tokens processed; negative = decode batch size
    # (llm_engine.rs:253-257 sign convention)
    num_tokens: int


class LLMEngine:
    def __init__(
        self,
        scheduler: Scheduler,
        model_runner: ModelRunner,
        max_top_k: Optional[int] = None,
    ) -> None:
        logger.info("LLMEngine::new")
        self.scheduler = scheduler
        self.model_runner = model_runner
        # Admission bound for top_k (see add_request). Explicit arg wins;
        # else read the runner's engine_config. A runner with neither gets
        # one warning instead of a silently-skipped check (a non-standard
        # runner may truncate top_k on device without ever telling the user).
        if max_top_k is None:
            eng = getattr(model_runner, "engine_config", None)
            max_top_k = getattr(eng, "max_top_k", None)
        self.max_top_k = max_top_k
        self._warned_no_top_k_bound = False
        # observability (SURVEY.md §5.5): rolling per-step metrics
        self.metrics: Dict[str, float] = {
            "steps": 0,
            "prefill_tokens": 0,
            "decode_tokens": 0,
            "preemptions": 0,
            "prefix_cached_tokens": 0,  # prompt tokens skipped via prefix hits
            "kv_blocks_in_use": 0,      # gauge (excludes the null page)
            "runner_errors": 0,         # sequences finished by degradation
        }

    def add_request(
        self, token_ids: Seq[int], sampling_params: SamplingParams
    ) -> int:
        # top_k is compiled into a static on-device bound
        # (EngineConfig.max_top_k / ops.sampling._apply_top_k); a request
        # beyond it would be SILENTLY truncated, so reject it at the
        # boundary instead.
        if self.max_top_k is not None and sampling_params.top_k > self.max_top_k:
            raise ValueError(
                f"top_k={sampling_params.top_k} exceeds the engine's "
                f"compiled bound max_top_k={self.max_top_k} "
                "(raise EngineConfig.max_top_k to allow it)"
            )
        if (self.max_top_k is None and sampling_params.top_k > 0
                and not self._warned_no_top_k_bound):
            logger.warning(
                "model runner exposes no engine_config.max_top_k; top_k "
                "requests cannot be validated against the compiled bound "
                "(pass max_top_k= to LLMEngine to enable the check)"
            )
            self._warned_no_top_k_bound = True
        seq = Sequence(token_ids, sampling_params)
        logger.debug(
            "LLMEngine::add_request seq_id=%d prompt_len=%d max_tokens=%d",
            seq.seq_id, len(token_ids), sampling_params.max_tokens,
        )
        self.scheduler.add(seq)
        return seq.seq_id

    def _degrade(self, seqs: List[Sequence], exc: Exception) -> None:
        """Per-request failure degradation (``llm_engine.rs:154-175``): a
        runner error finishes the affected batch with EOS + error instead of
        crashing the serving process."""
        logger.error("model runner failed; degrading %d seqs: %s", len(seqs), exc)
        self.metrics["runner_errors"] += len(seqs)
        for seq in seqs:
            self.scheduler.force_finish(seq, error=str(exc))

    def step(self) -> StepOutput:
        # Surface out-of-band finishes (admission rejects, degraded errors).
        oob = self.scheduler.drain_finished_out_of_band()
        if oob:
            return StepOutput(
                outputs=[(s.seq_id, list(s.completion_token_ids)) for s in oob],
                is_prefill=False,
                num_tokens=0,
            )
        seqs, is_prefill = self.scheduler.schedule()
        if not seqs:
            # All running sequences were preempted this round (impossible in
            # the reference only because its can_append is constant true).
            return StepOutput(outputs=[], is_prefill=False, num_tokens=0)
        chunk_tokens = cached = 0
        if is_prefill:
            # Captured before post_process advances num_computed_tokens.
            chunk_tokens = sum(
                s.prefill_target - s.num_computed_tokens for s in seqs
            )
            cached = sum(
                s.num_cached_tokens for s in seqs
                if s.num_computed_tokens == s.num_cached_tokens
            )
        try:
            token_ids = self.model_runner.run(seqs, is_prefill)
            accepted = self.scheduler.post_process(seqs, token_ids)
        except Exception as e:  # degradation, not crash (llm_engine.rs:154-175)
            self._degrade(seqs, e)
            accepted = 0
        self.scheduler.drain_finished_out_of_band()

        outputs = [
            (seq.seq_id, list(seq.completion_token_ids))
            for seq in seqs
            if seq.is_finished
        ]
        num_tokens = chunk_tokens if is_prefill else -accepted

        self.metrics["steps"] += 1
        if is_prefill:
            self.metrics["prefill_tokens"] += chunk_tokens
            self.metrics["prefix_cached_tokens"] += cached
        else:
            self.metrics["decode_tokens"] += accepted
        self.metrics["preemptions"] = self.scheduler.num_preemptions
        bm = self.scheduler.block_manager
        self.metrics["kv_blocks_in_use"] = (
            bm.num_blocks - getattr(bm, "num_null_blocks", 1)
            - bm.num_free_blocks
        )
        return StepOutput(outputs=outputs, is_prefill=is_prefill, num_tokens=num_tokens)

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    def generate(
        self,
        prompts: Seq[Seq[int]],
        sampling_params: SamplingParams | Seq[SamplingParams],
    ) -> List[GenerationOutput]:
        """Run all prompts to completion (``llm_engine.rs:270-325``).

        When the runner supports chained dispatch, decode runs as a 2-deep
        pipeline: burst t+1 is dispatched (continuing from burst t's
        on-device tokens) *before* burst t's results are fetched, so the
        device never idles on host round trips.
        """
        if isinstance(sampling_params, SamplingParams):
            params_list: List[SamplingParams] = [sampling_params] * len(prompts)
        else:
            params_list = list(sampling_params)
        seq_ids = [
            self.add_request(p, sp) for p, sp in zip(prompts, params_list)
        ]
        want = set(seq_ids)
        collected: Dict[int, Tuple[List[int], Optional[str]]] = {}

        def collect(seqs) -> None:
            for seq in seqs:
                if seq.is_finished and seq.seq_id in want:
                    collected[seq.seq_id] = (
                        list(seq.completion_token_ids), seq.error
                    )

        self.run_until_done(collect)
        return [
            GenerationOutput(
                seq_id=sid,
                token_ids=collected.get(sid, ([], None))[0],
                error=collected.get(sid, ([], None))[1],
            )
            for sid in seq_ids
        ]

    def run_until_done(self, collect=None) -> None:
        """Drive schedule→forward→postprocess until every request finishes,
        with a device pipeline when the runner supports it:

        - decode runs as a chained pipeline: up to ``pipeline_depth`` bursts
          in flight, each continuing from the previous burst's on-device
          tokens, so neither the dispatch nor the device→host fetch round
          trip ever stalls the chip;
        - **mixed prefill/decode batching**: when requests are waiting, a
          prefill (or prefill chunk) is dispatched INTO the pipeline behind
          the in-flight decode bursts instead of draining them — the chip
          runs bursts and prefill back to back with no host round trip in
          between, and the newly prefilled sequences join the next burst.
          (Static-shape jits preclude literally mixing prefill tokens and
          decode slots in one dispatch; overlapping the dispatches achieves
          the same device utilization, the property BASELINE config 3 is
          after.)

        Callable from any engine state; ``bench.py`` uses it after timing
        the prefill step separately."""
        from collections import deque

        pipelined = getattr(self.model_runner, "supports_chaining", False)
        depth = max(1, getattr(self.model_runner, "pipeline_depth", 2))
        pending: deque = deque()  # ("decode"|"prefill", seqs, fut, ...) FIFO
        oob = self.scheduler.drain_finished_out_of_band()  # add-time rejects
        if oob and collect is not None:
            collect(oob)

        def prefill_meta(seqs):
            chunk_tokens = sum(
                s.prefill_target - s.num_computed_tokens for s in seqs
            )
            cached = sum(
                s.num_cached_tokens for s in seqs
                if s.num_computed_tokens == s.num_cached_tokens
            )
            return chunk_tokens, cached

        while not self.is_finished() or pending:
            oob = self.scheduler.drain_finished_out_of_band()
            if oob and collect is not None:
                collect(oob)
            if not pending:
                seqs, is_prefill = self.scheduler.schedule()
                if not seqs:
                    if self.scheduler.waiting and not self.scheduler.running:
                        # Nothing is running yet the head of the queue cannot
                        # be admitted with every block free: it never will be.
                        self.scheduler.force_finish(
                            self.scheduler.waiting[0],
                            error="request can never be scheduled "
                            "(insufficient KV blocks even when idle)",
                        )
                    continue
                if not pipelined:
                    chunk_tokens = cached = 0
                    if is_prefill:
                        chunk_tokens, cached = prefill_meta(seqs)
                    try:
                        tokens = self.model_runner.run(seqs, is_prefill)
                        accepted = self.scheduler.post_process(seqs, tokens)
                    except Exception as e:
                        self._degrade(seqs, e)
                        accepted = 0
                    self._account(is_prefill, seqs, accepted,
                                  chunk_tokens, cached)
                    if collect is not None:
                        collect(seqs)
                    continue
                try:
                    if is_prefill:
                        chunk_tokens, cached = prefill_meta(seqs)
                        pending.append((
                            "prefill", seqs,
                            self.model_runner.dispatch_prefill(seqs),
                            chunk_tokens, cached,
                        ))
                    else:
                        pending.append((
                            "decode", seqs,
                            self.model_runner.dispatch_decode(
                                seqs, chained=False),
                        ))
                except Exception as e:
                    self._degrade(seqs, e)
                    if collect is not None:
                        collect(seqs)
                    continue

            # Keep the device fed BEFORE fetching, so it always has queued
            # work while the host blocks on the oldest result.
            K = self.scheduler.decode_burst
            bm = self.scheduler.block_manager

            # 1) In-flight prefill: if requests are waiting and no prefill
            #    is already queued, slot one in behind the current bursts.
            if (
                self.scheduler.waiting
                and not any(e[0] == "prefill" for e in pending)
                and len(pending) < depth + 1
            ):
                p_seqs = self.scheduler.try_schedule_prefill()
                if p_seqs:
                    chunk_tokens, cached = prefill_meta(p_seqs)
                    try:
                        pending.append((
                            "prefill", p_seqs,
                            self.model_runner.dispatch_prefill(p_seqs),
                            chunk_tokens, cached,
                        ))
                    except Exception as e:
                        self._degrade(p_seqs, e)

            # 2) Top up the decode chain (only counting decode bursts).
            decode_entries = [e for e in pending if e[0] == "decode"]
            if decode_entries:
                seqs_p = decode_entries[-1][1]
                chain_set = set(id(s) for s in seqs_p)
                while len(decode_entries) < depth:
                    # Sequences that finished during an already-fetched burst
                    # still occupy rows (their chained tokens are discarded);
                    # only live ones need blocks or justify another burst.
                    active = [s for s in seqs_p if not s.is_finished]
                    ahead = len(decode_entries) * K  # tokens in flight
                    mml = self.scheduler.max_model_len
                    # Newly prefilled sequences aren't in the chain's slot
                    # set: stop chaining so the next fresh burst includes
                    # them (no starvation behind a long chain).
                    newcomers = any(
                        id(s) not in chain_set for s in self.scheduler.running
                    )
                    can_chain = (
                        bool(active)
                        and not newcomers
                        and bm.can_extend_batch(active, ahead + K)
                        and any(
                            seq.max_tokens - seq.num_completion_tokens > ahead
                            and (not mml or len(seq) + ahead < mml)
                            for seq in active
                        )
                    )
                    if not can_chain:
                        break
                    for seq in active:
                        bm.extend(
                            seq, self.scheduler.extend_room(seq, ahead + K)
                        )
                    try:
                        entry = (
                            "decode", seqs_p,
                            self.model_runner.dispatch_decode(
                                seqs_p, chained=True,
                                inflight=len(decode_entries)),
                        )
                    except Exception as e:
                        self._degrade(seqs_p, e)
                        break
                    pending.append(entry)
                    decode_entries.append(entry)

            entry = pending.popleft()
            if entry[0] == "prefill":
                _, seqs_f, fut, chunk_tokens, cached = entry
                try:
                    tokens = self.model_runner.fetch_prefill(fut)
                    accepted = self.scheduler.post_process(seqs_f, tokens)
                except Exception as e:
                    self._degrade(seqs_f, e)
                    accepted = 0
                self._account(True, seqs_f, accepted, chunk_tokens, cached)
            else:
                _, seqs_f, fut = entry
                try:
                    tokens = self.model_runner.fetch_decode(fut)
                    accepted = self.scheduler.post_process(seqs_f, tokens)
                except Exception as e:
                    self._degrade(seqs_f, e)
                    # later bursts chain from the failed state
                    pending = deque(e for e in pending if e[0] != "decode")
                    accepted = 0
                self._account(False, seqs_f, accepted)
            if collect is not None:
                collect(seqs_f)

    def _account(self, is_prefill: bool, seqs, accepted: int,
                 chunk_tokens: int = 0, cached: int = 0) -> None:
        self.metrics["steps"] += 1
        if is_prefill:
            self.metrics["prefill_tokens"] += chunk_tokens
            self.metrics["prefix_cached_tokens"] += cached
        else:
            self.metrics["decode_tokens"] += accepted
        self.metrics["preemptions"] = self.scheduler.num_preemptions
        bm = self.scheduler.block_manager
        self.metrics["kv_blocks_in_use"] = (
            bm.num_blocks - getattr(bm, "num_null_blocks", 1)
            - bm.num_free_blocks
        )
