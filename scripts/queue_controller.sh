#!/bin/bash
# Deadline-aware CINIC-10 accuracy campaign controller (round 2, v3).
#
# Trains every reference benchmark config (BASELINE.md table) that does
# not already have a RESULT json, sequentially on the single chip, sizing
# each schedule to what fits before DEADLINE. One TPU process at a time:
# WAIT_PIDS (in /tmp/queue_wait_pids) are polled to completion first.
# Touch /tmp/queue_hold to pause launching the next job; rm to resume.
set -u
cd "$(dirname "$0")/.."
LOG=data/output
mkdir -p "$LOG"
# Round wall-clock ends ~07:40 UTC 2026-08-17; stop all TPU work by 06:15.
DEADLINE=$(date -u -d "2026-08-17 06:15" +%s)

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }
hold_gate() { while [ -e /tmp/queue_hold ]; do sleep 20; done; }

run_cfg() {
  local arch=$1 kind=$2 maxep=$3 lr=$4 est=$5 tag=$6; shift 6
  local result="$LOG/RESULT-cinic-$arch-$kind-$tag.json"
  if [ -e "$result" ]; then
    echo "=== skip $arch-$kind ($tag): RESULT exists ==="
    return
  fi
  hold_gate
  local now remain fit ep
  now=$(date -u +%s)
  remain=$(( DEADLINE - now ))
  fit=$(( (remain - 600) / est ))   # 600 s for compile + test protocol
  ep=$maxep
  [ "$fit" -lt "$ep" ] && ep=$fit
  if [ "$ep" -lt 40 ]; then
    echo "=== skip $arch-$kind: only $fit epochs fit ($(date -u +%H:%M:%S)) ==="
    return
  fi
  echo "=== queue: $arch-$kind ${ep}ep lr=$lr $(date -u +%H:%M:%S) ==="
  python scripts/train_cinic.py --arch "$arch" --kind "$kind" \
    --epochs "$ep" --lr "$lr" --tag "$tag" \
    --results "$result" "$@" \
    > "$LOG/train_${arch}_${kind}_${tag}.log" 2>&1
  echo "=== done: $arch-$kind rc=$? $(date -u +%H:%M:%S) ==="
}

for p in $(cat /tmp/queue_wait_pids 2>/dev/null); do
  echo "=== waiting for running job pid $p $(date -u +%H:%M:%S) ==="
  wait_pid "$p"
done
echo "=== chip free $(date -u +%H:%M:%S) ==="

# Reference targets (BASELINE.md): ResNet-26 74.81, MobileNet-v1 74.39,
# SEResNet-26 74.08, SKResNet-26 74.96, DenseNet-121 74.08,
# SqueezeNet-1.1 71.38, InceptionNet-v1 72.95, VGG-11 72.87,
# ShuffleNet-g4 66.16.
run_cfg sk_resnet 26 100 0.2 26 r2
run_cfg densenet 121 100 0.2 32 r2
run_cfg squeezenet 1.1 100 0.1 12 r2 --dropout 0.5
run_cfg inceptionnet_v1 standard 100 0.2 16 r2
run_cfg vggnet 11 100 0.05 16 r2 --dropout 0.5
run_cfg shufflenet_v1 g4 100 0.2 16 r2
# retrain pass for anything that landed below reference parity
run_cfg mobilenet_v1 standard 140 0.25 14 r2b --nesterov
echo "QUEUE_DONE $(date -u +%H:%M:%S)"
