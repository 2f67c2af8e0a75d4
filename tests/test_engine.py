"""Control-plane tests: Sequence, BlockManager, Scheduler, LLMEngine.

Covers the reference's inline tests (``block_manager.rs:101-119``,
``sampling_params.rs:48-77``) plus what the reference *couldn't* test because
its block manager was a stub: real allocation, prefix-cache sharing, block
exhaustion and preemption (SURVEY.md §4 implications).
"""

import pytest

from nano_vllm_candle_tpu.engine.block_manager import (
    BlockManager,
    BlockManagerConfig,
    NULL_BLOCK,
)
from nano_vllm_candle_tpu.engine.llm_engine import (
    DummyModelRunner,
    LLMEngine,
    StepOutput,
)
from nano_vllm_candle_tpu.engine.scheduler import Scheduler, SchedulerConfig
from nano_vllm_candle_tpu.engine.sequence import Sequence, SequenceStatus
from nano_vllm_candle_tpu.sampling_params import SamplingParams


def make_seq(tokens, block_size=4, **kw):
    sp = SamplingParams(**kw) if kw else SamplingParams()
    return Sequence(tokens, sp, block_size=block_size)


class TestSamplingParams:
    def test_defaults(self):
        sp = SamplingParams()
        assert sp.temperature == 1.0 and sp.max_tokens == 64 and not sp.ignore_eos

    def test_builder_chain(self):
        sp = (
            SamplingParams()
            .with_temperature(0.6)
            .with_max_tokens(128)
            .with_ignore_eos(True)
        )
        assert (sp.temperature, sp.max_tokens, sp.ignore_eos) == (0.6, 128, True)

    def test_zero_positive_temperature_rejected(self):
        with pytest.raises(ValueError):
            SamplingParams(temperature=1e-12)

    def test_greedy_allowed(self):
        assert SamplingParams(temperature=0.0).is_greedy


class TestSequence:
    def test_block_math(self):
        seq = make_seq(list(range(10)), block_size=4)
        assert seq.num_blocks == 3
        assert seq.last_block_num_tokens == 2
        assert seq.block(0) == [0, 1, 2, 3]
        assert seq.block(2) == [8, 9]

    def test_prompt_completion_split(self):
        seq = make_seq([1, 2, 3])
        seq.append_token(7)
        seq.append_token(8)
        assert seq.prompt_token_ids == [1, 2, 3]
        assert seq.completion_token_ids == [7, 8]
        assert seq.last_token == 8
        assert seq.num_completion_tokens == 2

    def test_unique_ids(self):
        a, b = make_seq([1]), make_seq([1])
        assert a.seq_id != b.seq_id


class TestBlockManager:
    def bm(self, num_blocks=8, block_size=4, prefix=True):
        return BlockManager(
            BlockManagerConfig(num_blocks, block_size, enable_prefix_caching=prefix)
        )

    def test_block_zero_reserved(self):
        bm = self.bm()
        assert NULL_BLOCK not in bm.free_blocks
        assert bm.num_free_blocks == 7

    def test_allocate_deallocate_roundtrip(self):
        bm = self.bm()
        seq = make_seq(list(range(10)), block_size=4)
        assert bm.can_allocate(seq)
        bm.allocate(seq)
        assert len(seq.block_table) == 3
        assert bm.num_free_blocks == 4
        bm.deallocate(seq)
        assert bm.num_free_blocks == 7
        assert seq.block_table == []

    def test_cannot_allocate_when_full(self):
        bm = self.bm(num_blocks=3, block_size=4)  # 2 usable
        seq = make_seq(list(range(12)), block_size=4)  # needs 3
        assert not bm.can_allocate(seq)

    def test_prefix_cache_shares_full_blocks(self):
        bm = self.bm()
        a = make_seq(list(range(8)), block_size=4)  # 2 full blocks
        bm.allocate(a)
        b = make_seq(list(range(8)) + [99], block_size=4)  # same prefix + 1
        bm.allocate(b)
        assert b.block_table[:2] == a.block_table[:2]
        assert b.num_cached_tokens == 8
        # Shared blocks have refcount 2
        for bid in a.block_table[:2]:
            assert bm.blocks[bid].ref_count == 2
        bm.deallocate(a)
        # Still held by b
        for bid in b.block_table[:2]:
            assert bm.blocks[bid].ref_count == 1
        bm.deallocate(b)
        assert bm.num_free_blocks == 7

    def test_prefix_cache_hit_after_free(self):
        """Freed blocks keep their hash and can be re-claimed."""
        bm = self.bm()
        a = make_seq(list(range(8)), block_size=4)
        bm.allocate(a)
        table = list(a.block_table)
        bm.deallocate(a)
        b = make_seq(list(range(8)), block_size=4)
        bm.allocate(b)
        assert b.block_table == table
        assert b.num_cached_tokens == 8

    def test_partial_block_never_cached(self):
        bm = self.bm()
        a = make_seq([1, 2], block_size=4)
        bm.allocate(a)
        b = make_seq([1, 2], block_size=4)
        bm.allocate(b)
        assert a.block_table != b.block_table
        assert b.num_cached_tokens == 0

    def test_no_prefix_caching_mode(self):
        bm = self.bm(prefix=False)
        a = make_seq(list(range(8)), block_size=4)
        bm.allocate(a)
        b = make_seq(list(range(8)), block_size=4)
        bm.allocate(b)
        assert a.block_table != b.block_table

    def test_can_append_and_may_append(self):
        bm = self.bm(num_blocks=4, block_size=4)
        seq = make_seq([1, 2, 3], block_size=4)
        bm.allocate(seq)
        # decode appends token 4 (index 3, fits block 0)
        seq.append_token(4)
        assert bm.can_append(seq)
        bm.may_append(seq)
        assert len(seq.block_table) == 1
        # next token (index 4) starts block 1
        seq.append_token(5)
        assert bm.can_append(seq)
        bm.may_append(seq)
        assert len(seq.block_table) == 2

    def test_decode_filled_block_becomes_shareable(self):
        bm = self.bm(block_size=4)
        seq = make_seq([1, 2, 3], block_size=4)
        bm.allocate(seq)
        seq.append_token(4)  # block 0 now content-complete
        bm.finalize_full_blocks(seq)  # post_process hook
        b0 = bm.blocks[seq.block_table[0]]
        assert b0.hash is not None
        # A new sequence with the same 4-token prefix shares block 0.
        other = make_seq([1, 2, 3, 4, 9], block_size=4)
        bm.allocate(other)
        assert other.block_table[0] == seq.block_table[0]
        assert other.num_cached_tokens == 4

    def test_slot_for(self):
        bm = self.bm(block_size=4)
        seq = make_seq(list(range(6)), block_size=4)
        bm.allocate(seq)
        b0, b1 = seq.block_table
        assert bm.slot_for(seq, 0) == b0 * 4
        assert bm.slot_for(seq, 5) == b1 * 4 + 1

    def test_exhaustion_raises(self):
        bm = self.bm(num_blocks=2, block_size=4)  # 1 usable
        a = make_seq(list(range(4)), block_size=4)
        bm.allocate(a)
        b = make_seq([9, 9, 9, 9], block_size=4)
        assert not bm.can_allocate(b)
        with pytest.raises(RuntimeError):
            bm.allocate(b)


class TestScheduler:
    def sched(self, **kw):
        defaults = dict(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            eos=0,
            num_kvcache_blocks=16,
            kvcache_block_size=4,
        )
        defaults.update(kw)
        return Scheduler(SchedulerConfig(**defaults))

    def test_prefill_then_decode(self):
        s = self.sched()
        seq = make_seq([1, 2, 3], block_size=4)
        s.add(seq)
        batch, is_prefill = s.schedule()
        assert is_prefill and batch == [seq]
        assert seq.status == SequenceStatus.RUNNING
        s.post_process(batch, [[42]])
        batch, is_prefill = s.schedule()
        assert not is_prefill and batch == [seq]

    def test_max_num_seqs_cap(self):
        s = self.sched(max_num_seqs=2)
        seqs = [make_seq([i], block_size=4) for i in range(4)]
        for q in seqs:
            s.add(q)
        batch, is_prefill = s.schedule()
        assert is_prefill and len(batch) == 2

    def test_token_budget_cap(self):
        """The budget must accumulate across admitted sequences — the
        reference bug made it per-sequence only (SURVEY.md §2.7)."""
        s = self.sched(max_num_batched_tokens=10)
        a = make_seq(list(range(6)), block_size=4)
        b = make_seq(list(range(6)), block_size=4)
        s.add(a)
        s.add(b)
        batch, _ = s.schedule()
        assert batch == [a]  # 6 + 6 > 10

    def test_eos_finishes(self):
        s = self.sched()
        seq = make_seq([1, 2], block_size=4)
        s.add(seq)
        batch, _ = s.schedule()
        s.post_process(batch, [[0]])  # eos = 0
        assert seq.is_finished
        assert s.is_finished()

    def test_ignore_eos_runs_to_max_tokens(self):
        s = self.sched()
        seq = make_seq([1, 2], block_size=4, ignore_eos=True, max_tokens=3)
        s.add(seq)
        batch, _ = s.schedule()
        s.post_process(batch, [[0]])
        assert not seq.is_finished
        for _ in range(2):
            batch, _ = s.schedule()
            s.post_process(batch, [[0]])
        assert seq.is_finished

    def test_preemption_on_block_exhaustion(self):
        """Impossible to test in the reference (can_append constant true)."""
        s = self.sched(num_kvcache_blocks=3, kvcache_block_size=2, max_num_seqs=2)
        # 2 usable blocks. Two 2-token prompts -> 1 block each.
        a = make_seq([1, 2], block_size=2)
        b = make_seq([3, 4], block_size=2)
        s.add(a)
        s.add(b)
        batch, is_prefill = s.schedule()
        assert is_prefill and len(batch) == 2
        s.post_process(batch, [[5], [6]])  # each now needs a 2nd block next step
        batch, is_prefill = s.schedule()
        assert not is_prefill
        # Only one can get a new block; the other (b, lowest priority) is preempted.
        assert batch == [a]
        assert b.status == SequenceStatus.WAITING
        assert s.num_preemptions == 1

    def test_all_preempted_returns_empty(self):
        """The reference would assert/panic here (scheduler.rs:175-178)."""
        s = self.sched(num_kvcache_blocks=2, kvcache_block_size=2, max_num_seqs=1)
        a = make_seq([1, 2], block_size=2)
        s.add(a)
        batch, _ = s.schedule()
        s.post_process(batch, [[5]])  # needs new block; none free
        batch, is_prefill = s.schedule()
        assert batch == []  # a preempted itself back to waiting
        assert a.status == SequenceStatus.WAITING


class TestLLMEngineWithDummyRunner:
    def engine(self, **kw):
        defaults = dict(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            eos=100,
            num_kvcache_blocks=32,
            kvcache_block_size=4,
        )
        defaults.update(kw)
        return LLMEngine(Scheduler(SchedulerConfig(**defaults)), DummyModelRunner())

    def test_generate_counts_up(self):
        eng = self.engine()
        out = eng.generate([[1, 2, 3]], SamplingParams(max_tokens=4, ignore_eos=True))
        assert len(out) == 1
        assert out[0].token_ids == [4, 5, 6, 7]  # last_token + 1 each step

    def test_eos_stops(self):
        eng = self.engine()
        # last token 99 -> dummy emits 100 == eos immediately
        out = eng.generate([[99]], SamplingParams(max_tokens=8))
        assert out[0].token_ids == [100]

    def test_multiple_prompts(self):
        eng = self.engine()
        out = eng.generate(
            [[10], [20], [30]], SamplingParams(max_tokens=2, ignore_eos=True)
        )
        assert [o.token_ids for o in out] == [[11, 12], [21, 22], [31, 32]]

    def test_step_output_sign_convention(self):
        eng = self.engine()
        eng.add_request([1, 2, 3], SamplingParams(max_tokens=4, ignore_eos=True))
        step = eng.step()
        assert step.is_prefill and step.num_tokens == 3
        step = eng.step()
        assert not step.is_prefill and step.num_tokens == -1

    def test_metrics(self):
        eng = self.engine()
        eng.generate([[1, 2]], SamplingParams(max_tokens=3, ignore_eos=True))
        assert eng.metrics["prefill_tokens"] == 2
        assert eng.metrics["decode_tokens"] == 2  # 3 tokens: 1 prefill-sampled + 2 decode


class TestRobustness:
    """Round-2 robustness regressions: oversized-prompt rejection,
    GROUP-padded admission budget, and per-request failure degradation
    (reference posture: ``llm_engine.rs:154-175``)."""

    def engine(self, runner=None, **kw):
        defaults = dict(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            eos=100,
            num_kvcache_blocks=32,
            kvcache_block_size=4,
        )
        defaults.update(kw)
        return LLMEngine(
            Scheduler(SchedulerConfig(**defaults)), runner or DummyModelRunner()
        )

    def test_long_prompt_chunks_and_completes(self):
        """A prompt longer than max_num_batched_tokens is processed in
        chunks (round-2 chunked prefill) instead of rejected/livelocked."""
        eng = self.engine()  # budget 64
        out = eng.generate(
            [list(range(1, 101))], SamplingParams(max_tokens=4, ignore_eos=True)
        )
        assert out[0].error is None
        assert out[0].token_ids == [101, 102, 103, 104]
        assert eng.metrics["prefill_tokens"] == 100  # every token computed once
        assert eng.is_finished()

    def test_prompt_needing_more_blocks_than_exist_rejected(self):
        eng = self.engine(num_kvcache_blocks=3, max_num_batched_tokens=1024)
        # 2 usable blocks of 4 -> an 18-token prompt needs 5 blocks.
        out = eng.generate([list(range(18))], SamplingParams(max_tokens=4))
        assert out[0].error is not None and "KV blocks" in out[0].error

    def test_good_requests_survive_alongside_rejected(self):
        eng = self.engine(num_kvcache_blocks=8)  # 7 usable blocks of 4
        outs = eng.generate(
            [[10], list(range(40)), [20]],  # middle needs 10 blocks > 7
            SamplingParams(max_tokens=2, ignore_eos=True),
        )
        assert outs[0].token_ids == [11, 12] and outs[0].error is None
        assert outs[1].error is not None and "KV blocks" in outs[1].error
        assert outs[2].token_ids == [21, 22] and outs[2].error is None

    def test_group_padded_budget_admission(self):
        """9 x 454-token prompts with granularity 32: raw sum 4086 <= 4096
        but padded sum 4320 > 4096 — counting raw lengths would overflow the
        runner's largest bucket mid-serve (round-1 crash). The 9th prompt
        must wait (a partial chunk is only scheduled alone)."""
        s = Scheduler(SchedulerConfig(
            max_num_seqs=16,
            max_num_batched_tokens=4096,
            num_kvcache_blocks=2048,
            kvcache_block_size=32,
            prefill_granularity=32,
        ))
        for i in range(9):
            # distinct prompts (identical ones would prefix-hit each other
            # and legitimately take the single-sequence compute-skip path)
            s.add(make_seq(list(range(i * 1000, i * 1000 + 454)), block_size=32))
        batch, is_prefill = s.schedule()
        assert is_prefill and len(batch) == 8  # 8 x 480 = 3840; 9th busts it
        assert sum(-(-len(q) // 32) * 32 for q in batch) <= 4096

    def test_runner_error_degrades_to_eos(self):
        class FailingRunner:
            def run(self, seqs, is_prefill):
                raise RuntimeError("XLA exploded")

        eng = self.engine(runner=FailingRunner())
        out = eng.generate([[1, 2, 3]], SamplingParams(max_tokens=4))
        assert out[0].error == "XLA exploded"
        assert out[0].token_ids == [100]  # EOS emitted, engine alive
        assert eng.is_finished()
        # Degradation is OBSERVABLE: the dryrun/driver checks key off this
        # metric, so a silent-EOS failure cannot masquerade as success.
        assert eng.metrics["runner_errors"] == 1

    def test_runner_errors_metric_counts_degraded_seqs(self):
        class FailingRunner:
            def run(self, seqs, is_prefill):
                raise RuntimeError("boom")

        eng = self.engine(runner=FailingRunner())
        out = eng.generate(
            [[1, 2], [3, 4], [5, 6]], SamplingParams(max_tokens=4)
        )
        assert all(o.error == "boom" for o in out)
        assert eng.metrics["runner_errors"] == 3

    def test_top_k_beyond_compiled_bound_rejected(self):
        class Cfg:
            max_top_k = 64

        class BoundedRunner(DummyModelRunner):
            engine_config = Cfg()

        eng = self.engine(runner=BoundedRunner())
        with pytest.raises(ValueError, match="max_top_k"):
            eng.add_request([1, 2, 3], SamplingParams(top_k=500))
        # at the bound is fine
        eng.add_request([1, 2, 3], SamplingParams(top_k=64))

    def test_runner_error_then_engine_still_serves(self):
        class FlakyRunner:
            def __init__(self):
                self.calls = 0

            def run(self, seqs, is_prefill):
                self.calls += 1
                if self.calls == 1:
                    raise RuntimeError("transient")
                k = 1
                return [[seq.last_token + 1 + i for i in range(k)] for seq in seqs]

        eng = self.engine(runner=FlakyRunner())
        bad = eng.generate([[1]], SamplingParams(max_tokens=2, ignore_eos=True))
        assert bad[0].error == "transient"
        good = eng.generate([[5]], SamplingParams(max_tokens=2, ignore_eos=True))
        assert good[0].error is None and good[0].token_ids == [6, 7]

    def test_step_surfaces_rejects(self):
        eng = self.engine(num_kvcache_blocks=4)
        eng.add_request(list(range(100)), SamplingParams(max_tokens=2))
        step = eng.step()
        assert len(step.outputs) == 1
        sid, tokens = step.outputs[0]
        assert tokens == [100]
        assert eng.is_finished()

    def test_max_model_len_finishes_sequence(self):
        eng = self.engine(max_model_len=6)
        out = eng.generate([[1, 2, 3]], SamplingParams(max_tokens=50, ignore_eos=True))
        assert out[0].error is None
        assert len(out[0].token_ids) == 3  # 3 prompt + 3 completion = 6
