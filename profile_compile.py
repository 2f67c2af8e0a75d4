"""AOT lower/compile timing for the prefill step (dev tool).

Reproduces the bench prefill config and times lower/compile of the prefill
jit with individual pieces toggled. Fresh compile cache every run.
"""
import argparse
import os
import sys
import tempfile
import time

p = argparse.ArgumentParser()
p.add_argument("--attn", default="pallas", choices=["pallas", "xla"])
p.add_argument("--ablate", default="", help="comma list: commit,norms,qknorm,rope")
p.add_argument("--block-size", type=int, default=256)
p.add_argument("--bucket", type=int, default=1024)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

os.environ["NVCT_JAX_CACHE"] = tempfile.mkdtemp(prefix="nvct_bisect_")
if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from nano_vllm_candle_tpu.config import EngineConfig, Qwen3Config
from nano_vllm_candle_tpu.engine.model_runner import JaxModelRunner
from nano_vllm_candle_tpu.engine.block_manager import BlockManager
from nano_vllm_candle_tpu.models import qwen3

if args.ablate:
    qwen3.ABLATE = frozenset(args.ablate.split(","))

cfg = Qwen3Config.qwen3_0_6b()
B = args.batch
prompt_len = 128
block_size = args.block_size
max_len = prompt_len + 128 + block_size
num_blocks = 1 + B * (-(-max_len // block_size))
eng = EngineConfig(
    max_num_seqs=B,
    max_num_batched_tokens=max(4096, B * prompt_len),
    num_kvcache_blocks=num_blocks,
    kvcache_block_size=block_size,
    max_model_len=max_len,
    dtype="bfloat16",
    enable_prefix_caching=False,
    use_pallas_kernels=True,
)

t0 = time.perf_counter()
params = qwen3.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
runner = JaxModelRunner(params, cfg, eng, attn_impl=args.attn)
print(f"init {time.perf_counter()-t0:.1f}s on {jax.devices()[0]}", file=sys.stderr)

T = args.bucket
W = runner.max_blocks_per_seq
tok_i32 = np.zeros((T, 4), np.int32)
tok_i32[:, 2] = -1
per = prompt_len
for i in range(B):
    t = i * per
    tok_i32[t : t + per, 0] = 5
    tok_i32[t : t + per, 1] = np.arange(per)
    tok_i32[t : t + per, 2] = i
    tok_i32[t : t + per, 3] = (1 + i) * block_size + np.arange(per) % block_size
seq_i32 = np.zeros((B, 2), np.int32)
seq_i32[:, 0] = np.arange(B) * per + per - 1
seq_f32 = np.ones((B, 2), np.float32)

jargs = (
    runner.params, runner.kv_cache, runner._key,
    jnp.asarray(tok_i32), jnp.asarray(seq_i32), jnp.asarray(seq_f32),
    jnp.asarray(np.int32(0)), None,
)
t0 = time.perf_counter()
lowered = runner._prefill_jit.lower(*jargs, use_top_k=False, use_top_p=False)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"RESULT attn={args.attn} ablate={args.ablate or '-'} bucket={T} "
      f"bs={block_size}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s",
      file=sys.stderr)
print(f"{t2-t1:.1f}")
