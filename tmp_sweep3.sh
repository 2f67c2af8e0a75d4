#!/bin/bash
cd /root/repo
log=/tmp/sweep3_r3.jsonl
: > $log
run() {
  name=$(echo "$*" | tr ' /' '__')
  echo "### $*" >> $log
  timeout 2400 python bench.py "$@" 2>"/tmp/s3_${name}.err" | tail -1 >> $log
  grep -E "compile:|handshake|degrading|chunked prefill" "/tmp/s3_${name}.err" | head -4 | sed 's/^/# /' >> $log
}
run --batch 8
run --batch 16 --quantization int8
run --batch 64 --quantization int4 --kv-cache-dtype int8
run --batch 4 --prompt-len 16256 --decode-steps 128 --kv-cache-dtype int8 --max-batched-tokens 4096
run --model 4b --batch 16 --quantization int4 --kv-cache-dtype int8 --stagger
run --model 8b --batch 16 --quantization int4 --kv-cache-dtype int8
echo DONE >> $log
