"""C++ block manager ≡ Python block manager (property test).

Random interleavings of allocate / extend / finalize / deallocate over
shared-prefix prompts must produce identical block tables, cache-hit counts
and free-block counts in both implementations.
"""

import numpy as np
import pytest

from nano_vllm_candle_tpu.engine.block_manager import BlockManager, BlockManagerConfig
from nano_vllm_candle_tpu.engine.sequence import Sequence
from nano_vllm_candle_tpu.sampling_params import SamplingParams

native = pytest.importorskip("nano_vllm_candle_tpu.engine.native")

if native.load_library() is None:
    pytest.skip("native runtime not buildable", allow_module_level=True)


def make_seq(tokens, block_size):
    return Sequence(tokens, SamplingParams(), block_size=block_size)


def make_pair(num_blocks=32, block_size=4, prefix=True, dp_ranks=1):
    cfg = BlockManagerConfig(num_blocks, block_size,
                             enable_prefix_caching=prefix, dp_ranks=dp_ranks)
    return BlockManager(cfg), native.NativeBlockManager(cfg)


class TestNativeBlockManagerParity:
    def test_allocate_roundtrip(self):
        py, cpp = make_pair()
        for impl in (py, cpp):
            seq = make_seq(list(range(10)), 4)
            impl.allocate(seq)
            assert len(seq.block_table) == 3
            assert seq.num_cached_tokens == 0
            impl.deallocate(seq)
            assert impl.num_free_blocks == 31

    def test_prefix_sharing_matches(self):
        py, cpp = make_pair()
        results = []
        for impl in (py, cpp):
            a = make_seq(list(range(8)), 4)
            impl.allocate(a)
            b = make_seq(list(range(8)) + [99], 4)
            impl.allocate(b)
            results.append((a.block_table, b.block_table, b.num_cached_tokens,
                            impl.num_free_blocks))
        assert results[0] == results[1]

    def test_extend_and_finalize_matches(self):
        py, cpp = make_pair()
        results = []
        for impl in (py, cpp):
            seq = make_seq([1, 2, 3], 4)
            impl.allocate(seq)
            seq.append_token(4)
            impl.extend(seq, 4)  # covers tokens idx 3..6
            impl.finalize_full_blocks(seq)
            # new seq sharing the 4-token full block
            other = make_seq([1, 2, 3, 4, 50], 4)
            impl.allocate(other)
            results.append((
                len(seq.block_table), other.block_table[0] == seq.block_table[0],
                other.num_cached_tokens, impl.num_free_blocks,
            ))
        assert results[0] == results[1]

    @pytest.mark.parametrize("seed,dp_ranks", [(0, 1), (1, 1), (2, 1), (3, 1),
                                               (4, 2), (5, 2), (6, 3)])
    def test_random_interleaving_parity(self, seed, dp_ranks):
        rng = np.random.default_rng(seed)
        py, cpp = make_pair(num_blocks=24, block_size=4, dp_ranks=dp_ranks)
        live_py, live_cpp = [], []
        for step in range(120):
            op = rng.integers(0, 4)
            if op == 0:  # allocate a (possibly shared-prefix) prompt
                L = int(rng.integers(1, 14))
                shared = bool(rng.integers(0, 2))
                prompt = ([7, 7, 7, 7] * 3)[:L] if shared else list(
                    map(int, rng.integers(0, 50, L))
                )
                sa = make_seq(list(prompt), 4)
                sb = make_seq(list(prompt), 4)
                sb.seq_id = sa.seq_id + 100000  # distinct ids per impl instance
                # dp-sharded cache: pages come from the home rank's range
                sa.home_rank = sb.home_rank = int(rng.integers(0, dp_ranks))
                if py.can_allocate(sa) and cpp.can_allocate(sb):
                    py.allocate(sa)
                    cpp.allocate(sb)
                    assert sa.block_table == sb.block_table, step
                    assert sa.num_cached_tokens == sb.num_cached_tokens, step
                    live_py.append(sa)
                    live_cpp.append(sb)
            elif op == 1 and live_py:  # decode burst: append + extend
                i = int(rng.integers(0, len(live_py)))
                k = int(rng.integers(1, 6))
                sa, sb = live_py[i], live_cpp[i]
                if py.can_extend(sa, k) and cpp.can_extend(sb, k):
                    py.extend(sa, k)
                    cpp.extend(sb, k)
                    for _ in range(k):
                        t = int(rng.integers(0, 50))
                        sa.append_token(t)
                        sb.append_token(t)
                    py.finalize_full_blocks(sa)
                    cpp.finalize_full_blocks(sb)
                    assert sa.block_table == sb.block_table, step
            elif op == 2 and live_py:  # deallocate
                i = int(rng.integers(0, len(live_py)))
                py.deallocate(live_py.pop(i))
                cpp.deallocate(live_cpp.pop(i))
            assert py.num_free_blocks == cpp.num_free_blocks, step
