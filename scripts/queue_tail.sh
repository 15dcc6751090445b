#!/bin/bash
# Campaign tail:
# 1. resume ShuffleNet-g4 for the cosine endgame its wedged run missed
# 2. SqueezeNet retry (first attempt wedged before epoch 1)
# 3. MobileNet-v1 retrain with label smoothing (first pass: 73.92 vs 74.39)
# 4. idle-chip test-protocol rebench of every RESULT json
# 5. random-search tuning demo (if time remains before the 06:15 cutoff)
set -u
cd "$(dirname "$0")/.."
LOG=data/output
DEADLINE=$(date -u -d "2026-08-17 06:15" +%s)

left() { echo $(( DEADLINE - $(date -u +%s) )); }

for p in $(cat /tmp/queue_wait_pids 2>/dev/null); do
  echo "=== tail: waiting for running job pid $p $(date -u +%H:%M:%S) ==="
  while kill -0 "$p" 2>/dev/null; do sleep 30; done
done
echo "=== tail: chip free $(date -u +%H:%M:%S) ==="

if [ ! -e "$LOG/RESULT-cinic-squeezenet-1.1-r2.json" ] && [ "$(left)" -gt 2400 ]; then
  echo "=== tail: squeezenet retry $(date -u +%H:%M:%S) ==="
  python scripts/train_cinic.py --arch squeezenet --kind 1.1 \
    --epochs 100 --lr 0.1 --dropout 0.5 --tag r2 \
    --results "$LOG/RESULT-cinic-squeezenet-1.1-r2.json" \
    > "$LOG/train_squeezenet_1.1_r2.log" 2>&1
  echo "=== tail: squeezenet rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ "$(left)" -gt 3000 ]; then
  echo "=== tail: mobilenet_v1 r2b $(date -u +%H:%M:%S) ==="
  python scripts/train_cinic.py --arch mobilenet_v1 --kind standard \
    --epochs 130 --lr 0.25 --nesterov --label-smoothing 0.1 --tag r2b \
    --results "$LOG/RESULT-cinic-mobilenet_v1-standard-r2b.json" \
    > "$LOG/train_mobilenet_v1_standard_r2b.log" 2>&1
  echo "=== tail: mobilenet r2b rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ ! -e "$LOG/RESULT-cinic-shufflenet_v1-g4-r2.json" ] && [ "$(left)" -gt 1500 ]; then
  echo "=== tail: shufflenet resume $(date -u +%H:%M:%S) ==="
  CKPT=$(ls -t "$LOG"/ShuffleNetV1g4-*-best_score.ckpt.npz 2>/dev/null | head -1)
  [ -n "$CKPT" ] && python scripts/resume_cinic.py --checkpoint "$CKPT" \
    --arch shufflenet_v1 --epochs-more 15 \
    --results "$LOG/RESULT-cinic-shufflenet_v1-g4-r2.json" \
    > "$LOG/train_shufflenet_v1_g4_r2_resume.log" 2>&1
  echo "=== tail: shufflenet rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== tail: rebench $(date -u +%H:%M:%S) ==="
  python scripts/rebench_test.py > "$LOG/rebench.log" 2>&1
  echo "=== tail: rebench rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ "$(left)" -gt 2400 ]; then
  echo "=== tail: tune demo $(date -u +%H:%M:%S) ==="
  python scripts/tune_cinic.py --arch resnet --kind 18 --samples 6 \
    --epochs 12 > "$LOG/tune_demo.log" 2>&1
  echo "=== tail: tune rc=$? $(date -u +%H:%M:%S) ==="
fi
echo "TAIL_DONE $(date -u +%H:%M:%S)"
