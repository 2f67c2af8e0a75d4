#!/bin/bash
cd /root/repo
log=/tmp/sweep2_r3.jsonl
: > $log
run() {
  echo "### $*" >> $log
  timeout 1500 python bench.py "$@" 2>/tmp/sweep2_last_$1.err | tail -1 >> $log
  grep -E "compile:|handshake|degrading" /tmp/sweep2_last_$1.err | head -4 | sed 's/^/# /' >> $log
}
run --batch 16 --quantization int8                 # TTFT after the barrier fix
run --batch 8                                      # clean bf16 bs8 (driver config)
run --batch 4 --prompt-len 16256 --decode-steps 128 --kv-cache-dtype int8 --max-batched-tokens 4096  # long context retry
run --batch 64 --quantization int4 --kv-cache-dtype int8   # headline re-check post flash/linear edits
echo DONE >> $log
