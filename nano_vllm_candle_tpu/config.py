"""Model and engine configuration.

``Qwen3Config`` mirrors the reference's HF ``config.json`` loader
(``/root/reference/src/models/qwen3.rs:36-101``): serde-style field parse with
the same derived defaults (``head_dim = hidden // heads`` fallback,
``rope_theta`` default 1e6). Unlike the reference's hardcoded
``qwen3_0_6b()`` placeholder (``qwen3.rs:56-74``, which does not match the
real checkpoint — see SURVEY.md §2.7), our named presets carry the real
published shapes so random-init benchmarking is representative.

``EngineConfig`` collects what the reference spreads across
``SchedulerConfig`` (``/root/reference/src/engine/scheduler.rs:10-56``) and
``BlockManagerConfig`` (``/root/reference/src/engine/block_manager.rs:3-22``),
plus the TPU-specific compilation knobs (prefill token buckets, dtypes, mesh
axes) that the reference does not need because it re-traces eagerly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    """Qwen3 decoder hyperparameters (HF ``config.json`` schema).

    Frozen/hashable so it can be a jit static argument.
    """

    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: Optional[int] = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 40960
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    bos_token_id: int = 151643
    eos_token_id: int = 151645

    def __post_init__(self) -> None:
        if self.head_dim is None:
            object.__setattr__(self, "head_dim", self.hidden_size // self.num_attention_heads)
        if self.num_attention_heads % self.num_key_value_heads != 0:
            raise ValueError("num_attention_heads must be divisible by num_key_value_heads")

    @property
    def num_q_per_kv(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def q_size(self) -> int:
        return self.num_attention_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_key_value_heads * self.head_dim

    @classmethod
    def from_hf_dir(cls, model_dir: str) -> "Qwen3Config":
        """Parse an HF model directory's ``config.json``.

        Mirrors ``Qwen3Config::from_hf_dir`` (``qwen3.rs:77-101``) including
        its derivation rules; unknown fields are ignored.
        """
        path = os.path.join(model_dir, "config.json")
        with open(path) as f:
            raw = json.load(f)
        return cls.from_hf_dict(raw)

    @classmethod
    def from_hf_dict(cls, raw: dict) -> "Qwen3Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        # HF sometimes encodes eos_token_id as a list; the engine wants one id.
        eos = kwargs.get("eos_token_id")
        if isinstance(eos, (list, tuple)):
            kwargs["eos_token_id"] = int(eos[0])
        return cls(**kwargs)

    # -- named presets (real published shapes, for checkpoint-free benches) --

    @classmethod
    def qwen3_0_6b(cls) -> "Qwen3Config":
        return cls()  # defaults above are the real Qwen3-0.6B shapes

    @classmethod
    def qwen3_4b(cls) -> "Qwen3Config":
        return cls(
            hidden_size=2560,
            intermediate_size=9728,
            num_hidden_layers=36,
            num_attention_heads=32,
            num_key_value_heads=8,
            head_dim=128,
            tie_word_embeddings=True,
        )

    @classmethod
    def qwen3_8b(cls) -> "Qwen3Config":
        return cls(
            hidden_size=4096,
            intermediate_size=12288,
            num_hidden_layers=36,
            num_attention_heads=32,
            num_key_value_heads=8,
            head_dim=128,
            tie_word_embeddings=False,
        )

    @classmethod
    def qwen3_32b(cls) -> "Qwen3Config":
        return cls(
            hidden_size=5120,
            intermediate_size=25600,
            num_hidden_layers=64,
            num_attention_heads=64,
            num_key_value_heads=8,
            head_dim=128,
            tie_word_embeddings=False,
        )

    @classmethod
    def small(cls) -> "Qwen3Config":
        """A ~30M-parameter model-shaped config for scaling smokes: big
        enough that a CPU decode step costs ~10ms (so per-step compute
        dominates Gloo coordination in multi-process CPU runs — the
        property that makes a measured scaling efficiency meaningful),
        small enough to init in seconds."""
        return cls(
            vocab_size=4096,
            hidden_size=512,
            intermediate_size=1536,
            num_hidden_layers=8,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=64,
            max_position_embeddings=2048,
            tie_word_embeddings=True,
            bos_token_id=1,
            eos_token_id=2,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Qwen3Config":
        """A tiny config for tests (model-shaped, runs anywhere in ms)."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=512,
            tie_word_embeddings=False,
            bos_token_id=1,
            eos_token_id=2,
        )


DEFAULT_PREFILL_BUCKETS: tuple[int, ...] = (64, 128, 256, 512, 1024, 2048, 4096)


@dataclasses.dataclass
class EngineConfig:
    """Engine-wide runtime configuration.

    Scheduler fields mirror ``SchedulerConfig``
    (``scheduler.rs:19-29``: defaults max_num_seqs=1 there; we default to a
    batch-friendly 8) and the KV-cache fields mirror ``BlockManagerConfig``
    (``block_manager.rs:9-15``; block_size default 256 matches theirs AND
    the round-3 sweep on the current kernels — bf16 bs8 decode: 2,988 @64 /
    2,948 @128 / 3,023 @256 tok/s, within ±2.5% run variance, with 256
    giving the fewest per-page grid steps and biggest DMAs; bench.py uses
    the same default).
    """

    # scheduling
    max_num_seqs: int = 8
    max_num_batched_tokens: int = 4096
    # paged KV cache
    # 256 pages x 256 tokens = the same 65536-token pool (and ~7.5 GB of
    # bf16 0.6B KV) as the old 512x128 default — the pool scales with
    # pages x page_size, so page-size changes must rebalance the count.
    num_kvcache_blocks: int = 256
    kvcache_block_size: int = 256
    max_blocks_per_seq: Optional[int] = None  # default: max_model_len / block_size
    enable_prefix_caching: bool = True
    native_block_manager: bool = True  # C++ allocator (csrc/), Python fallback
    # model execution
    max_model_len: int = 4096
    dtype: str = "bfloat16"  # parameter/activation dtype
    kv_cache_dtype: str = "bfloat16"  # or "int8"
    quantization: Optional[str] = None  # None | "int8" | "int4" (weight-only)
    quant_group_size: int = 128  # sub-channel group along the contraction dim
    # Logits-matmul weight dtype ("bfloat16" | "int8" | "int4"). The
    # lm_head re-read is a first-order decode cost (311 MB/step tied at
    # 0.6B = ~20% of the bs8 device budget; 1.24 GB/step untied at 8B) —
    # int8 halves it and is the default (argmax-parity and Δppl gated,
    # tests/test_quant.py / tests/test_evals.py). int4 quarters the read
    # for another ~2% end-to-end but perturbs logits more; opt-in, gated
    # by the same Δppl harness.
    lm_head_dtype: str = "int8"
    prefill_buckets: Sequence[int] = DEFAULT_PREFILL_BUCKETS
    use_pallas_kernels: bool = True  # pallas kernels on TPU, XLA fallback elsewhere
    # Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj stacks (the
    # reference's load-time fusion, qwen3.rs:171,310): one weight stream +
    # one dispatch per fused group. Applied only when mesh is None (a
    # contiguous tp split of a fused axis would mix segments).
    fuse_projections: bool = True
    # Explicit attention impl override: "pallas" (streaming kernels +
    # fold-the-current-token commit-after-attention), "xla" (direct
    # per-token cache writes, the CPU-testable numerics reference).
    # None = auto (pallas on TPU).
    attn_impl: Optional[str] = None
    # parallelism (mesh axes); tp shards heads/ffn, dp shards request slots
    tp_size: int = 1
    dp_size: int = 1
    # Shard the KV cache's PAGE axis over dp (parallel/spmd.py): each dp
    # rank owns the pages of its pinned request slots, so decode attention
    # reads and KV commits are rank-local — no per-step all-gather of
    # commit rows (measured ~40% of the dp coordination overhead) and no
    # per-replica cache duplication (an 8B int4 bs64 cache replicated over
    # dp caps the batch a dp mesh can hold). Requires num_kvcache_blocks
    # divisible by dp; one null page is reserved per rank. Disable to fall
    # back to the dp-replicated cache (every rank commits every slot).
    dp_shard_kv: bool = True
    # Apply the XLA collective/compute-overlap flags
    # (parallel/distributed.COLLECTIVE_OVERLAP_XLA_FLAGS) before the first
    # backend use of a multi-chip run: async collective fusion + the
    # latency-hiding scheduler, the mechanism for BASELINE config 5's >=85%
    # 2-host scaling target. Harmless no-ops for single-device programs.
    collective_overlap: bool = True
    # Decode steps per dispatch (multi-step decode; sampled tokens feed
    # forward on device). Amortizes host<->device round trips; finished
    # sequences overshoot by < decode_burst discarded tokens.
    decode_burst: int = 16
    # In-flight decode bursts (chained on device). Depth 2 hides dispatch
    # latency; depth 3 also hides the device->host result transfer (each is
    # ~a full RTT on a tunneled/remote chip). Extra depth costs one burst of
    # pre-allocated KV blocks and potential overshoot per finished sequence.
    pipeline_depth: int = 3
    # sampling compilation
    max_top_k: int = 64  # static bound for the on-device top-k mask
    # reproducibility
    seed: int = 0

    def __post_init__(self) -> None:
        if self.max_blocks_per_seq is None:
            self.max_blocks_per_seq = -(-self.max_model_len // self.kvcache_block_size)
        buckets = sorted(set(int(b) for b in self.prefill_buckets))
        buckets = [b for b in buckets if b <= self.max_num_batched_tokens]
        if not buckets or buckets[-1] < self.max_num_batched_tokens:
            buckets.append(self.max_num_batched_tokens)
        self.prefill_buckets = tuple(buckets)
        if self.max_num_seqs < 1:
            raise ValueError("max_num_seqs must be >= 1")
