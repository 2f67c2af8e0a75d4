"""Worker process for tests/test_multihost.py.

Runs ONE engine replica as one controller of a multi-process JAX group over
CPU devices (the TPU-native analog of a per-host serving process,
parallel/distributed.py). Launched as:

    python tests/multihost_worker.py PORT NPROCS RANK OUTDIR

with ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` in the
environment so each process contributes N virtual CPU devices. Every rank
runs the *same* request stream through its own engine (SPMD determinism,
SURVEY.md §5.2): the test asserts all ranks produced identical scheduler
decisions and identical tokens.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    port, nprocs, rank, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nano_vllm_candle_tpu.parallel import distributed

    distributed.initialize(f"127.0.0.1:{port}", nprocs, rank)
    assert jax.process_count() == nprocs, jax.process_count()

    from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
    from nano_vllm_candle_tpu.llm import LLM
    from nano_vllm_candle_tpu.sampling_params import SamplingParams

    # dp spans the two processes (DCN axis), tp stays within each process's
    # devices (ICI axis) — the production hybrid-mesh shape.
    mesh = distributed.make_hybrid_mesh(tp=2, dp=2)
    cfg = Qwen3Config.tiny()
    ec = EngineConfig(
        max_num_seqs=4,
        max_num_batched_tokens=256,
        num_kvcache_blocks=32,
        kvcache_block_size=32,
        max_model_len=256,
        dtype="float32",
        use_pallas_kernels=False,
        attn_impl="xla",
        decode_burst=4,
        pipeline_depth=2,
        seed=7,
        fuse_projections=False,
    )
    llm = LLM(config=cfg, engine_config=ec, mesh=mesh)

    prompts = [[3 + i, 5, 7, 11, 13] for i in range(3)]
    sp = SamplingParams(temperature=0.7, max_tokens=8, ignore_eos=True)

    # Step the prefill by hand first so the scheduler's decisions (slot
    # order, block tables) can be captured before blocks are freed.
    for p in prompts:
        llm.add_request(p, sp)
    out = llm.step()
    assert out.is_prefill
    sched = llm.engine.scheduler
    prefill_decisions = [
        [int(s.seq_id), list(map(int, s.block_table))] for s in sched.running
    ]

    collected = {}

    def collect(seqs):
        for s in seqs:
            if s.is_finished:
                collected[int(s.seq_id)] = list(map(int, s.completion_token_ids))

    llm.engine.run_until_done(collect)

    rec = {
        "rank": rank,
        "nprocs": nprocs,
        "global_devices": jax.device_count(),
        "prefill_decisions": prefill_decisions,
        "tokens": [collected[k] for k in sorted(collected)],
        "decode_tokens": int(llm.engine.metrics["decode_tokens"]),
    }
    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump(rec, f)
    print(f"rank {rank} done", flush=True)


if __name__ == "__main__":
    main()
