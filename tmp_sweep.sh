#!/bin/bash
# Sequential measurement sweep (one chip process at a time).
cd /root/repo
log=/tmp/sweep_r3.jsonl
: > $log
run() {
  echo "### $*" >> $log
  timeout 1500 python bench.py "$@" 2>/tmp/sweep_last.err | tail -1 >> $log
  grep -E "compile:|handshake" /tmp/sweep_last.err | sed 's/^/# /' >> $log
}
run --batch 8                                                   # bf16 regression check (grouped kernel at B=8)
run --batch 16 --quantization int8                              # config 2 TTFT refresh
run --batch 16 --quantization int4 --kv-cache-dtype int8        # TTFT refresh
run --batch 64 --quantization int8                              # int8 bs64 w/ new kernels
run --model 4b --batch 16 --quantization int4 --kv-cache-dtype int8 --stagger   # BASELINE config 3 (mixed)
run --batch 8 --block-size 64                                   # page-size story
run --batch 8 --block-size 128
run --batch 4 --prompt-len 16256 --decode-steps 128 --kv-cache-dtype int8 --max-batched-tokens 4096  # long context 16k (chunked prefill)
echo DONE >> $log
