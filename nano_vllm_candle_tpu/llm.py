"""High-level ``LLM`` facade: one-call engine assembly.

Mirrors the reference's documented library-embedding path
(``/root/reference/README.md:66-94`` / SURVEY.md §3.4): Device →
SchedulerConfig → Scheduler → ModelRunner → LLMEngine, collapsed into a
single constructor. Accepts either an HF model directory (config + weights)
or an explicit ``(config, params)`` pair (random-init benchmarking).
"""

from __future__ import annotations

import logging
from typing import Any, List, Optional, Sequence as Seq

import jax
import jax.numpy as jnp

from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
from nano_vllm_candle_tpu.engine.llm_engine import GenerationOutput, LLMEngine
from nano_vllm_candle_tpu.engine.model_runner import JaxModelRunner
from nano_vllm_candle_tpu.engine.scheduler import Scheduler, SchedulerConfig
from nano_vllm_candle_tpu.models import qwen3
from nano_vllm_candle_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class LLM:
    def __init__(
        self,
        model_dir: Optional[str] = None,
        *,
        config: Optional[Qwen3Config] = None,
        params: Any = None,
        engine_config: Optional[EngineConfig] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        from nano_vllm_candle_tpu.utils.jax_cache import enable_compilation_cache
        from nano_vllm_candle_tpu.utils.warmup import warm_transfer_async

        enable_compilation_cache()
        warm_transfer_async()
        if engine_config is None:
            engine_config = EngineConfig()
        if (
            mesh is not None and engine_config.collective_overlap
            and any(d.platform != "cpu" for d in mesh.devices.flat)
        ):
            # Best effort at this point: XLA_FLAGS is authoritative only
            # before the first backend use, so the CLI/bench entry points
            # apply it earlier; this covers library embedders who build the
            # mesh before the engine (idempotent either way). TPU-only: the
            # CPU XLA client aborts on unknown --xla_tpu_* flags.
            from nano_vllm_candle_tpu.parallel.distributed import (
                apply_collective_overlap_flags,
            )

            apply_collective_overlap_flags()
        if model_dir is not None:
            if config is None:
                config = Qwen3Config.from_hf_dir(model_dir)
            if params is None:
                from nano_vllm_candle_tpu.utils.loader import load_qwen3_params

                # mesh: each tensor lands pre-sharded (never a replicated
                # copy in one chip's HBM); quantized artifacts load directly.
                params = load_qwen3_params(
                    model_dir, config, dtype=jnp.dtype(engine_config.dtype),
                    mesh=mesh,
                )
        if config is None:
            raise ValueError("need model_dir or config")
        if params is None:
            logger.info("no weights given: random-initializing %s", config)
            if engine_config.quantization is not None:
                # Init + quantize on HOST: an 8B bf16 random-init (~16.4 GB)
                # would not fit one v5e chip's HBM before quantization — only
                # the quantized pytree ships to the device (the random-init
                # twin of the offline-artifact path, utils/loader
                # save_quantized_checkpoint / SURVEY.md §5.4).
                with jax.default_device(jax.devices("cpu")[0]):
                    params = qwen3.init_params(
                        config, jax.random.key(engine_config.seed),
                        dtype=jnp.dtype(engine_config.dtype),
                    )
            else:
                params = qwen3.init_params(
                    config, jax.random.key(engine_config.seed),
                    dtype=jnp.dtype(engine_config.dtype),
                )
        if engine_config.lm_head_dtype not in ("bfloat16", "int8", "int4"):
            raise ValueError(
                f"lm_head_dtype must be bfloat16, int8 or int4, got "
                f"{engine_config.lm_head_dtype!r}"
            )
        if engine_config.quantization is not None:
            from nano_vllm_candle_tpu.layers.linear import quantize_qwen3_params

            logger.info("quantizing weights to %s", engine_config.quantization)
            def _leaf_on_host(x) -> bool:
                devs = getattr(x, "devices", None)
                if devs is None:  # numpy / plain host array
                    return True
                return any(d.platform == "cpu" for d in devs())

            on_host = any(_leaf_on_host(x) for x in jax.tree.leaves(params))
            if on_host:
                with jax.default_device(jax.devices("cpu")[0]):
                    params = quantize_qwen3_params(
                        params,
                        bits=engine_config.quantization,
                        group_size=engine_config.quant_group_size,
                    )
                dev = jax.devices()[0]
                if mesh is None and dev.platform != "cpu":
                    params = jax.device_put(params, dev)
            else:
                params = quantize_qwen3_params(
                    params,
                    bits=engine_config.quantization,
                    group_size=engine_config.quant_group_size,
                )

        if engine_config.lm_head_dtype in ("int8", "int4"):
            from nano_vllm_candle_tpu.layers.linear import quantize_lm_head

            # Under a tp mesh the head's vocab axis is sharded; pad it to
            # tp*128 so every local shard stays 128-lane aligned for the
            # fused-matmul island (spmd.sharded_logits_matmul). Pad columns
            # are masked to -inf by compute_logits.
            pad = 128 * mesh.shape["tp"] if mesh is not None else 1
            params = quantize_lm_head(
                params, bits=engine_config.lm_head_dtype,
                group_size=engine_config.quant_group_size,
                pad_vocab_to=pad,
            )

        self.config = config
        self.engine_config = engine_config
        # dp-sharded KV cache (EngineConfig.dp_shard_kv): the control plane
        # partitions the page space per dp rank so device commits/reads stay
        # rank-local. The runner derives the same flag from the same inputs.
        dp_ranks = (
            mesh.shape["dp"]
            if mesh is not None and engine_config.dp_shard_kv
            and mesh.shape["dp"] > 1 else 1
        )
        scheduler = Scheduler(
            SchedulerConfig(
                max_num_seqs=engine_config.max_num_seqs,
                max_num_batched_tokens=engine_config.max_num_batched_tokens,
                eos=config.eos_token_id,
                num_kvcache_blocks=engine_config.num_kvcache_blocks,
                kvcache_block_size=engine_config.kvcache_block_size,
                enable_prefix_caching=engine_config.enable_prefix_caching,
                decode_burst=engine_config.decode_burst,
                native_block_manager=engine_config.native_block_manager,
                prefill_granularity=qwen3.GROUP,
                max_model_len=engine_config.max_model_len,
                dp_ranks=dp_ranks,
            )
        )
        self.model_runner = JaxModelRunner(
            params, config, engine_config, mesh=mesh,
            block_manager=scheduler.block_manager,
            attn_impl=engine_config.attn_impl,
        )
        self.engine = LLMEngine(scheduler, self.model_runner)

    # -- thin engine passthroughs --------------------------------------------

    def add_request(self, token_ids: Seq[int], sampling_params: SamplingParams) -> int:
        return self.engine.add_request(token_ids, sampling_params)

    def step(self):
        return self.engine.step()

    def is_finished(self) -> bool:
        return self.engine.is_finished()

    def generate(
        self,
        prompts: Seq[Seq[int]],
        sampling_params: SamplingParams | Seq[SamplingParams],
    ) -> List[GenerationOutput]:
        return self.engine.generate(prompts, sampling_params)
