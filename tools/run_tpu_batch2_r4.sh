#!/bin/bash
# Round-4 TPU batch 2: quality runs (serial — one chip).
#   1. Butterfly200 --use_CNN (VERDICT #7) — shortest, runs first so the
#      concurrent CPU batch has time to produce the warm-start table
#   2. warm-started ETHEC flagship @4 img/leaf (VERDICT #4, consumes the
#      label-only table from run_cpu_batch_r4.py; waits up to 3 h for it)
#   3. ETHEC flagship @8 img/leaf (third scaling point; longest, runs last)
# Launch: cd /root/repo && nohup setsid bash tools/run_tpu_batch2_r4.sh \
#            > /tmp/tpu_batch2_r4.log 2>&1 < /dev/null &
set -u
cd /root/repo
WARM=experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model

echo "=== b200 use_CNN $(date -u +%H:%M:%S) ==="
python tools/quality_b200_cnn.py 40 4
echo "=== flagship warm@4 $(date -u +%H:%M:%S) ==="
for _ in $(seq 36); do
  [ -e "$WARM" ] && break
  echo "waiting for warm ckpt ($WARM) $(date -u +%H:%M:%S)"; sleep 300
done
if [ -e "$WARM" ]; then
  python tools/quality_cnn_flagship.py 40 4 "$WARM"
else
  echo "WARM CKPT MISSING ($WARM) after 3h — skipping warm run"
fi
echo "=== flagship @8 img/leaf $(date -u +%H:%M:%S) ==="
python tools/quality_cnn_flagship.py 40 8
echo "TPU_BATCH2_R4 DONE $(date -u +%H:%M:%S)"
