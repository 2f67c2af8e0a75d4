"""JAX model runner: jit-compiled prefill/decode steps over the paged cache.

Implements the reference's ``ModelRunner`` seam
(``/root/reference/src/engine/llm_engine.rs:16-18``) the TPU-native way. The
reference's ``Qwen3ModelRunner`` re-runs the whole prompt+completion through
the model every step with per-step host padding (``llm_engine.rs:60-95``) and
samples on host (97-133). Here instead (SURVEY.md §7 inversions):

- **Fixed shapes for jit**: prefill packs all scheduled prompts into one
  token stream padded to a bucket length (compile count = #buckets); decode
  is a single ``[max_num_seqs]``-shaped step with inactive-slot masking.
  No recompilation storms from dynamic batch shapes.
- **State lives on device**: the paged KV cache is a donated jit argument,
  updated in place; only token ids (ints) cross the host boundary each step.
- **Sampling on device** (``ops/sampling.py``): greedy/temperature/top-k/
  top-p over the last-position logits only.

The ``DummyModelRunner`` twin for control-plane tests lives in
``llm_engine.py``.
"""

from __future__ import annotations

import bisect
import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
from nano_vllm_candle_tpu.engine.block_manager import BlockManager
from nano_vllm_candle_tpu.engine.sequence import Sequence
from nano_vllm_candle_tpu.models import qwen3
from nano_vllm_candle_tpu.ops.sampling import sample_tokens

logger = logging.getLogger(__name__)


class JaxModelRunner:
    """Runs a Qwen3 model under jit with a resident paged KV cache."""

    def __init__(
        self,
        params: Any,
        config: Qwen3Config,
        engine_config: EngineConfig,
        mesh: Optional[jax.sharding.Mesh] = None,
        block_manager: Optional[BlockManager] = None,
        attn_impl: Optional[str] = None,
    ) -> None:
        self.config = config
        self.engine_config = engine_config
        self.mesh = mesh
        self.params = params
        self.block_manager = block_manager  # set later by the engine builder
        if attn_impl is None:
            on_tpu = jax.devices()[0].platform != "cpu"
            attn_impl = "pallas" if (engine_config.use_pallas_kernels and on_tpu) else "xla"
        self.attn_impl = attn_impl
        # The quantized lm_head (EngineConfig.lm_head_dtype) rides the
        # fused dequant-matmul kernel on the pallas path; under a mesh it
        # runs as a vocab-sharded shard_map island
        # (parallel/spmd.sharded_logits_matmul) — the head's vocab axis is
        # padded to tp*128 at quantization time so every local shard keeps
        # the kernel's lane alignment.
        self._logits_impl = "pallas" if attn_impl == "pallas" else "xla"
        from nano_vllm_candle_tpu.kernels import interpret_default

        self._interpret = interpret_default()
        if engine_config.kvcache_block_size % qwen3.GROUP:
            raise ValueError(
                f"kvcache_block_size must be a multiple of {qwen3.GROUP} "
                "(page-commit window granularity)"
            )

        kv_dtype = jnp.dtype(engine_config.kv_cache_dtype)
        self.kv_cache = qwen3.init_kv_cache(
            config,
            engine_config.num_kvcache_blocks,
            engine_config.kvcache_block_size,
            kv_dtype,
        )
        if mesh is None and engine_config.fuse_projections:
            from nano_vllm_candle_tpu.layers.linear import fuse_qwen3_params

            self.params = fuse_qwen3_params(self.params)
        # dp-sharded KV cache (EngineConfig.dp_shard_kv): page axis over dp
        # — same derivation as the control plane's (llm.py -> SchedulerConfig
        # dp_ranks), which partitions the page pools to match.
        self.dp_shard_kv = (
            mesh is not None and engine_config.dp_shard_kv
            and mesh.shape["dp"] > 1
        )
        if mesh is not None:
            from nano_vllm_candle_tpu.parallel.mesh import (
                shard_kv_cache,
                shard_params,
                validate_tp,
            )

            validate_tp(config, mesh.shape["tp"])
            if engine_config.max_num_seqs % mesh.shape["dp"] != 0:
                raise ValueError("max_num_seqs must be divisible by dp")
            if (self.dp_shard_kv
                    and engine_config.num_kvcache_blocks % mesh.shape["dp"]):
                raise ValueError(
                    "num_kvcache_blocks must be divisible by dp for the "
                    "dp-sharded KV cache (set dp_shard_kv=False to replicate)"
                )
            self.params = shard_params(params, mesh, config)
            self.kv_cache = shard_kv_cache(
                self.kv_cache, mesh, dp_shard=self.dp_shard_kv)
        self.block_size = engine_config.kvcache_block_size
        self.max_num_seqs = engine_config.max_num_seqs
        self.max_blocks_per_seq = engine_config.max_blocks_per_seq
        self.decode_burst = max(1, engine_config.decode_burst)
        self.buckets = list(engine_config.prefill_buckets)
        # The PRNG seed crosses the boundary as a plain uint32 (globally
        # replicated under a mesh); the typed key is derived inside jit. A
        # host-local typed key cannot feed a global-mesh jit in
        # multi-controller runs.
        self._key = self._put(np.uint32(engine_config.seed))
        self._step_counter = 0

        self._prefill_jit = jax.jit(
            self._prefill_step,
            static_argnames=("use_top_k", "use_top_p", "greedy_only", "band"),
            donate_argnames=("kv_cache",),
        )
        self._decode_jit = jax.jit(
            self._decode_step,
            static_argnames=("chained", "use_top_k", "use_top_p", "greedy_only"),
            donate_argnames=("kv_cache",),
        )
        # last dispatched burst's [K, B] token output (device) for chaining
        self._chain_tokens = None

    # -- jitted step functions ------------------------------------------------
    #
    # Host→device traffic is packed into two arrays per step (one int32, one
    # f32): over the single-chip tunnel every small transfer is a round trip,
    # and unpacking inside jit is free. The NamedTuple batch views are
    # reconstructed on device.

    def _prefill_step(
        self,
        params,
        kv_cache,
        seed,  # uint32 rng seed passed as arg (NOT a closure: closure
        #       constants get embedded in the lowered HLO, which forces a
        #       device->host fetch during *lowering* — and the first D2H of
        #       a process stalls minutes on the tunneled chip; see
        #       utils/warmup). The typed key is derived inside jit so
        #       multi-host processes can feed a replicated plain scalar.
        tok_i32,  # [T, 4]: token_ids, positions, seg_ids, slot_mapping
        seq_i32,  # [B, 2]: logits_indices, top_k
        seq_f32,  # [B, 2]: temperature, top_p
        step,
        chunk,  # None | (block_table [W], prefix_len [1]) — chunked mode
        *,
        use_top_k: bool,
        use_top_p: bool,
        greedy_only: bool,
        band: Optional[int] = None,
    ):
        batch = qwen3.PrefillBatch(
            token_ids=tok_i32[:, 0],
            positions=tok_i32[:, 1],
            seg_ids=tok_i32[:, 2],
            slot_mapping=tok_i32[:, 3],
            logits_indices=seq_i32[:, 0],
            block_table=None if chunk is None else chunk[0],
            prefix_len=None if chunk is None else chunk[1][0],
        )
        hidden, kv_cache = qwen3.forward(
            params, kv_cache, batch,
            config=self.config, mode="prefill", attn_impl=self.attn_impl,
            mesh=self.mesh, dp_shard=self.dp_shard_kv, prefill_band=band,
        )
        logits = qwen3.compute_logits(
            params, hidden, impl=self._logits_impl, mesh=self.mesh,
            batch_sharded=False, interpret=self._interpret)
        rng = jax.random.fold_in(jax.random.key(seed), step)
        tokens = sample_tokens(
            rng, logits, seq_f32[:, 0], seq_i32[:, 1], seq_f32[:, 1],
            max_top_k=self.engine_config.max_top_k,
            use_top_k=use_top_k, use_top_p=use_top_p,
            greedy_only=greedy_only,
        )
        return self._replicate_out(tokens), kv_cache

    def _replicate_out(self, tokens):
        """Constrain sampled tokens to a fully-replicated layout so every
        host can ``device_get`` them (the dp-sharded batch would otherwise
        leave each host holding only its own slots). Tokens are a few bytes;
        the all-gather is noise and each host's scheduler needs all of them
        for the SPMD-determinism contract."""
        if self.mesh is None:
            return tokens
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            tokens, NamedSharding(self.mesh, P())
        )

    def _decode_step(
        self,
        params,
        kv_cache,
        seed,  # uint32 rng seed as arg, not closure (see _prefill_step)
        seq_i32,  # [B, 5 + W]: token, position, slot, seq_len, top_k, block_table...
        seq_f32,  # [B, 2]: temperature, top_p
        prev_tokens,  # [B] device tokens from the previous burst (chained mode)
        step,
        *,
        chained: bool,
        use_top_k: bool,
        use_top_p: bool,
        greedy_only: bool,
    ):
        """Multi-step decode: ``decode_burst`` forward+sample steps in one
        dispatch, sampled tokens feeding the next step **on device**. Over a
        tunneled/remote chip this amortizes the per-dispatch round trip K×;
        the scheduler pre-allocates every burst's blocks (scheduler.py
        ``_schedule_decode``).

        ``chained=True`` starts from ``prev_tokens`` (the previous burst's
        on-device output) instead of host-provided tokens, letting the engine
        dispatch burst t+1 before burst t's results reach the host — the
        2-deep pipeline that hides dispatch/fetch latency entirely.
        """
        K = self.decode_burst
        bs = self.block_size
        start_tokens = prev_tokens if chained else seq_i32[:, 0]
        start_pos = seq_i32[:, 1]
        start_len = seq_i32[:, 3]
        top_k = seq_i32[:, 4]
        block_tables = seq_i32[:, 5:]
        active = start_len > 0
        burst_rng = jax.random.fold_in(jax.random.key(seed), step)

        def body(carry, i):
            kv_cache, tokens = carry
            pos = jnp.where(active, start_pos + i, 0)
            seq_lens = jnp.where(active, start_len + i, 0)
            # Speculative burst tokens past max_model_len have no table entry;
            # route their KV writes to the null page (block 0) — they are
            # discarded by post_process, and the page clamp keeps the gather
            # in bounds.
            W = block_tables.shape[1]
            pidx = jnp.minimum(pos // bs, W - 1)
            page = jnp.take_along_axis(block_tables, pidx[:, None], axis=1)[:, 0]
            page = jnp.where(pos // bs < W, page, 0)
            slot = page * bs + pos % bs
            batch = qwen3.DecodeBatch(
                token_ids=tokens,
                positions=pos,
                slot_mapping=slot,
                block_tables=block_tables,
                seq_lens=seq_lens,
            )
            hidden, kv_cache = qwen3.forward(
                params, kv_cache, batch,
                config=self.config, mode="decode", attn_impl=self.attn_impl,
                mesh=self.mesh, dp_shard=self.dp_shard_kv,
            )
            logits = qwen3.compute_logits(
                params, hidden, impl=self._logits_impl, mesh=self.mesh,
                batch_sharded=True, interpret=self._interpret)
            rng = jax.random.fold_in(burst_rng, i)
            new_tokens = sample_tokens(
                rng, logits, seq_f32[:, 0], top_k, seq_f32[:, 1],
                max_top_k=self.engine_config.max_top_k,
                use_top_k=use_top_k, use_top_p=use_top_p,
                greedy_only=greedy_only,
            )
            return (kv_cache, new_tokens), new_tokens

        (kv_cache, _), all_tokens = jax.lax.scan(
            body, (kv_cache, start_tokens), jnp.arange(K, dtype=jnp.int32)
        )
        return self._replicate_out(all_tokens), kv_cache  # [K, B]

    # -- host-side batch assembly ---------------------------------------------

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        if i == len(self.buckets):
            raise ValueError(
                f"prefill of {n} tokens exceeds the largest bucket "
                f"{self.buckets[-1]} (max_num_batched_tokens)"
            )
        return self.buckets[i]

    def _seq_arrays(self, seqs: List[Sequence], *, decode: bool, pos_offset: int = 0):
        """Per-slot packed arrays. Decode: int32 [B, 5+W] + f32 [B, 2];
        prefill: int32 [B, 2] (logits_idx, top_k) + f32 [B, 2].

        ``pos_offset``: for chained bursts the host state is stale by exactly
        one in-flight burst; positions/lengths are advanced by that offset.
        """
        bm = self.block_manager
        B = self.max_num_seqs
        W = self.max_blocks_per_seq
        if decode and seqs:
            # Slice the block-table width to the pages this burst actually
            # TOUCHES, bucketed to powers of two: the decode kernel's grid
            # is (B, W), and every unused column costs a real grid step
            # (~0.5 us of scalar work x B x 28 layers). A sequence's table
            # may hold more blocks than the burst reaches (pre-allocation
            # for burst overshoot); the last position this burst writes is
            # L + K - 2, bounding both its reads and its slot pages. Each
            # bucket is one extra jit specialization.
            K = self.decode_burst
            bs = self.block_size
            need = 1
            for s in seqs:
                if len(s.block_table) > W:
                    raise ValueError(
                        f"sequence needs {len(s.block_table)} blocks > "
                        f"max_blocks_per_seq={W}; raise max_model_len"
                    )
                L = len(s) + pos_offset
                touched = (L + K - 2) // bs + 1
                need = max(need, min(len(s.block_table), touched))
            W_b = 1
            while W_b < need:
                W_b *= 2
            W = min(W_b, W)
        seq_f32 = np.zeros((B, 2), np.float32)
        seq_f32[:, 1] = 1.0  # top_p disabled for padding slots
        # Rows are indexed by each sequence's PINNED slot (assigned at
        # admission, engine/scheduler._assign_slot), not list position: a
        # stable row means a stable dp shard, the invariant behind the
        # dp-sharded KV cache (a sequence's pages live on its home rank).
        if decode:
            seq_i32 = np.zeros((B, 5 + W), np.int32)
            for seq in seqs:
                i = seq.slot
                L = len(seq) + pos_offset
                nb = min(len(seq.block_table), W)  # untouched tail sliced off
                seq_i32[i, 0] = seq.last_token
                seq_i32[i, 1] = L - 1
                seq_i32[i, 3] = L
                seq_i32[i, 4] = seq.top_k
                seq_i32[i, 5 : 5 + nb] = seq.block_table[:nb]
                # Pad the row by repeating the last touched page: the decode
                # kernel's index maps are bare table lookups (no clamping),
                # and a repeated index makes Pallas skip the redundant DMA.
                if nb:
                    seq_i32[i, 5 + nb :] = seq.block_table[nb - 1]
                seq_f32[i, 0] = seq.temperature
                seq_f32[i, 1] = seq.top_p
        else:
            seq_i32 = np.zeros((B, 2), np.int32)
            for seq in seqs:
                seq_i32[seq.slot, 1] = seq.top_k
                seq_f32[seq.slot, 0] = seq.temperature
                seq_f32[seq.slot, 1] = seq.top_p
        use_top_k = bool((seq_i32[:, 4 if decode else 1] > 0).any())
        use_top_p = bool((seq_f32[:, 1] < 1.0).any())
        # Padding slots carry temperature 0, so all-zero means every REAL
        # request is greedy -> compile the argmax-only sampler.
        greedy_only = bool((seq_f32[:, 0] == 0.0).all())
        return seq_i32, seq_f32, use_top_k, use_top_p, greedy_only

    def _build_prefill_tokens(self, seqs: List[Sequence], seq_i32: np.ndarray):
        """Packed token stream int32 [T, 4] (token, position, seg, slot);
        fills logits_indices into seq_i32[:, 0].

        Each sequence is padded to a multiple of GROUP so page-commit
        windows never straddle sequences and window starts stay
        GROUP-aligned within a page. A sequence's trailing padding rows are
        garbage-committed into its own last page (masked by seq_len forever
        after); inter-sequence padding keeps seg -1 / slot 0 and commits to
        the null page.
        """
        G = qwen3.GROUP

        def span(seq):
            start = seq.num_computed_tokens
            end = seq.prefill_target or len(seq)
            return start, end

        total = sum(-(-(span(s)[1] - span(s)[0]) // G) * G for s in seqs)
        T = self._bucket(total)
        tok_i32 = np.zeros((T, 4), np.int32)
        tok_i32[:, 2] = -1  # seg_id padding
        t = 0
        for i, seq in enumerate(seqs):
            start, end = span(seq)
            L = end - start
            tok_i32[t : t + L, 0] = seq.token_ids[start:end]
            tok_i32[t : t + L, 1] = np.arange(start, end)
            tok_i32[t : t + L, 2] = i
            bs = self.block_size
            table = np.asarray(seq.block_table, np.int64)
            idx = np.arange(start, end)
            tok_i32[t : t + L, 3] = table[idx // bs] * bs + idx % bs
            seq_i32[seq.slot, 0] = t + L - 1  # sampling row = pinned slot
            t += -(-L // G) * G  # advance past the sequence's GROUP padding
        return tok_i32

    def _put(self, x, spec=None):
        """Place a host array on device. Under a mesh, EVERY input must be a
        global array with an explicit sharding — in multi-controller runs
        (jax.process_count() > 1) a bare ``jnp.asarray`` creates a
        process-local array that cannot feed a global-mesh jit. ``spec``
        None = fully replicated (every host passes identical values, the
        SPMD-determinism contract of parallel/distributed.py)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            np.asarray(x), NamedSharding(self.mesh, spec if spec is not None else P())
        )

    def _dp_spec(self):
        from jax.sharding import PartitionSpec as P

        return P("dp", None)

    # -- the ModelRunner interface (llm_engine.rs:16-18) ----------------------

    def run(self, seqs: List[Sequence], is_prefill: bool) -> List[List[int]]:
        assert self.block_manager is not None, "runner not bound to a scheduler"
        B = self.max_num_seqs
        if len(seqs) > B:
            raise ValueError(f"{len(seqs)} scheduled seqs > max_num_seqs={B}")
        if not is_prefill:
            return self.fetch_decode(self.dispatch_decode(seqs, chained=False))
        return self.fetch_prefill(self.dispatch_prefill(seqs))

    def dispatch_prefill(self, seqs: List[Sequence]):
        """Dispatch one prefill step without waiting for results, so the
        engine can keep decode bursts in flight behind it (mixed
        prefill/decode batching, device-level: the chip runs the prefill
        and the queued bursts back to back with no host round trip)."""
        step = self._put(np.int32(self._step_counter))
        self._step_counter += 1
        seq_i32, seq_f32, use_top_k, use_top_p, greedy_only = \
            self._seq_arrays(seqs, decode=False)
        tok_i32 = self._build_prefill_tokens(seqs, seq_i32)
        chunk = None
        if seqs[0].num_computed_tokens > 0:
            # Chunked / prefix-cached prefill: single sequence (scheduler
            # invariant) whose committed prefix is read from its pages.
            assert len(seqs) == 1
            W = self.max_blocks_per_seq
            bt = np.zeros((W,), np.int32)
            nb = len(seqs[0].block_table)
            bt[:nb] = seqs[0].block_table
            if nb:
                bt[nb:] = seqs[0].block_table[-1]
            chunk = (
                self._put(bt),
                self._put(np.asarray([seqs[0].num_computed_tokens], np.int32)),
            )
        # Static causal-band width for the packed flash kernel: computed
        # from the exact stream just packed (the host knows the layout),
        # bucketed to a power of two so jit variants stay bounded. The k
        # grid then walks only each q tile's band — at 64 packed 128-token
        # prompts the full (nq, Tq, Tk) grid ran 16,384 steps/layer of
        # which ~97% were skipped-but-paid (~5 ms/layer of grid overhead).
        band = None
        if self.attn_impl == "pallas":
            from nano_vllm_candle_tpu.kernels.flash_prefill import (
                host_band_tiles,
            )

            band = host_band_tiles(tok_i32[:, 2], tok_i32.shape[0])
        tokens, self.kv_cache = self._prefill_jit(
            self.params, self.kv_cache, self._key,
            self._put(tok_i32),
            self._put(seq_i32, self._dp_spec() if self.mesh else None),
            self._put(seq_f32, self._dp_spec() if self.mesh else None),
            step, chunk, use_top_k=use_top_k, use_top_p=use_top_p,
            greedy_only=greedy_only, band=band,
        )
        try:
            tokens.copy_to_host_async()
        except Exception:
            pass
        return (tokens, [s.slot for s in seqs])

    def fetch_prefill(self, fut) -> List[List[int]]:
        tokens, slots = fut
        host_tokens = np.asarray(jax.device_get(tokens))  # [B]
        return [[int(host_tokens[s])] for s in slots]

    # -- pipelined decode (dispatch bursts t+1.. before fetching t) -----------

    supports_chaining = True

    @property
    def pipeline_depth(self) -> int:
        return self.engine_config.pipeline_depth

    def dispatch_decode(self, seqs: List[Sequence], *, chained: bool,
                        inflight: int = 1):
        """Dispatch one decode burst without waiting for results. In chained
        mode the burst's initial tokens are the previous burst's on-device
        output, and host-side positions/lengths are advanced by the
        ``inflight`` bursts already dispatched but not yet fetched (the
        engine's pipeline depth minus one at steady state)."""
        assert self.block_manager is not None
        step = self._put(np.int32(self._step_counter))
        self._step_counter += 1
        offset = self.decode_burst * inflight if chained else 0
        seq_i32, seq_f32, use_top_k, use_top_p, greedy_only = self._seq_arrays(
            seqs, decode=True, pos_offset=offset
        )
        if chained:
            prev = self._chain_tokens[-1]
        else:
            prev = self._put(np.zeros((self.max_num_seqs,), np.int32))
        tokens, self.kv_cache = self._decode_jit(
            self.params, self.kv_cache, self._key,
            self._put(seq_i32, self._dp_spec() if self.mesh else None),
            self._put(seq_f32, self._dp_spec() if self.mesh else None),
            prev, step, chained=chained, use_top_k=use_top_k, use_top_p=use_top_p,
            greedy_only=greedy_only,
        )
        self._chain_tokens = tokens
        try:
            tokens.copy_to_host_async()
        except Exception:
            pass
        return (tokens, [s.slot for s in seqs])

    def fetch_decode(self, fut) -> List[List[int]]:
        tokens, slots = fut
        host_tokens = np.asarray(jax.device_get(tokens))  # [K, B]
        return [
            [int(host_tokens[k, s]) for k in range(host_tokens.shape[0])]
            for s in slots
        ]
