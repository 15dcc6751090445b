#!/bin/bash
# Final campaign tail: shufflenet resume -> mobilenet r2b finish ->
# rebench -> tune demo if time. 3-min pause up front for grant recovery.
set -u
cd "$(dirname "$0")/.."
LOG=data/output
DEADLINE=$(date -u -d "2026-08-17 06:15" +%s)
left() { echo $(( DEADLINE - $(date -u +%s) )); }

sleep 180  # let the TPU grant recover from the killed process

if [ ! -e "$LOG/RESULT-cinic-shufflenet_v1-g4-r2.json" ] && [ "$(left)" -gt 1200 ]; then
  echo "=== tail2: shufflenet resume $(date -u +%H:%M:%S) ==="
  CKPT=$(ls -t "$LOG"/ShuffleNetV1g4-*-best_score.ckpt.npz 2>/dev/null | head -1)
  [ -n "$CKPT" ] && python scripts/resume_cinic.py --checkpoint "$CKPT" \
    --arch shufflenet_v1 --epochs-more 15 \
    --results "$LOG/RESULT-cinic-shufflenet_v1-g4-r2.json" \
    > "$LOG/train_shufflenet_v1_g4_r2_resume.log" 2>&1
  echo "=== tail2: shufflenet rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ ! -e "$LOG/RESULT-cinic-mobilenet_v1-standard-r2b.json" ] && [ "$(left)" -gt 900 ]; then
  echo "=== tail2: mobilenet r2b finish $(date -u +%H:%M:%S) ==="
  CKPT=$(ls -t "$LOG"/MobileNetV1standard-*-best_score.ckpt.npz 2>/dev/null | head -1)
  [ -n "$CKPT" ] && python scripts/resume_cinic.py --checkpoint "$CKPT" \
    --arch mobilenet_v1 --epochs-more 2 --tag r2b \
    --results "$LOG/RESULT-cinic-mobilenet_v1-standard-r2b.json" \
    > "$LOG/train_mobilenet_v1_standard_r2b_finish.log" 2>&1
  echo "=== tail2: mobilenet rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ "$(left)" -gt 600 ]; then
  echo "=== tail2: rebench $(date -u +%H:%M:%S) ==="
  python scripts/rebench_test.py > "$LOG/rebench.log" 2>&1
  echo "=== tail2: rebench rc=$? $(date -u +%H:%M:%S) ==="
fi

if [ "$(left)" -gt 2100 ]; then
  echo "=== tail2: tune demo $(date -u +%H:%M:%S) ==="
  python scripts/tune_cinic.py --arch resnet --kind 18 --samples 6 \
    --epochs 12 > "$LOG/tune_demo.log" 2>&1
  echo "=== tail2: tune rc=$? $(date -u +%H:%M:%S) ==="
fi
echo "TAIL_DONE $(date -u +%H:%M:%S)"
