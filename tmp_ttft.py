import time, sys, logging
import jax
jax.config.update("jax_log_compiles", True)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
logging.getLogger("jax").setLevel(logging.WARNING)
import numpy as np
from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
from nano_vllm_candle_tpu.llm import LLM
from nano_vllm_candle_tpu.sampling_params import SamplingParams
cfg = Qwen3Config.qwen3_0_6b()
B, prompt_len, bsz = 16, 128, 256
max_len = prompt_len + 128 + bsz
eng = EngineConfig(max_num_seqs=B, max_num_batched_tokens=4096,
    num_kvcache_blocks=1 + B * (-(-max_len // bsz)), kvcache_block_size=bsz,
    max_model_len=max_len, dtype="bfloat16", quantization="int8",
    enable_prefix_caching=False, use_pallas_kernels=True)
llm = LLM(config=cfg, engine_config=eng)
rng = np.random.default_rng(0)
prompts = [list(map(int, rng.integers(10, cfg.vocab_size-10, prompt_len))) for _ in range(B)]
sp = SamplingParams(temperature=0.0, max_tokens=128, ignore_eos=True)
for rnd in range(3):
    for p in prompts: llm.add_request(p, sp)
    t0 = time.perf_counter()
    out = llm.step()
    print(f"round {rnd}: prefill step {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    llm.engine.run_until_done()
    print(f"round {rnd}: decode drain {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)
