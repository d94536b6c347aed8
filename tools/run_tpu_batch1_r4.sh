#!/bin/bash
# Round-4 TPU batch 1: re-capture the perf record (r3 verdict #1) + the
# bf16-BN-stats probe (#3). ONE serial process so TPU experiments never
# contend for the single chip (CLAUDE.md).
# Launch: cd /root/repo && nohup setsid bash tools/run_tpu_batch1_r4.sh \
#            > /tmp/tpu_batch1_r4.log 2>&1 < /dev/null &
set -u
cd /root/repo
OUT=experiments/r4_tpu/batch1
mkdir -p "$OUT"

echo "=== bench default $(date -u +%H:%M:%S) ==="
python bench.py            | tee "$OUT/bench_default.json"
echo "=== bench joint $(date -u +%H:%M:%S) ==="
python bench.py joint      | tee "$OUT/bench_joint.json"
echo "=== bench hostfed $(date -u +%H:%M:%S) ==="
python bench.py hostfed    | tee "$OUT/bench_hostfed.json"
echo "=== bench joint_hostfed $(date -u +%H:%M:%S) ==="
python bench.py joint_hostfed | tee "$OUT/bench_joint_hostfed.json"
echo "=== perf probe r4 (bf16 BN stats) $(date -u +%H:%M:%S) ==="
python tools/perf_probe_r4.py | tee "$OUT/perf_probe_r4.jsonl"
echo "TPU_BATCH1_R4 DONE $(date -u +%H:%M:%S)"
