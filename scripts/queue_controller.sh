#!/bin/bash
# Deadline-aware CINIC-10 accuracy campaign controller (round 2).
#
# With the device-resident dataset path (epochs ~10-25 s instead of ~100 s)
# the full 9-config reference benchmark table (BASELINE.md) fits in one
# night: each config trains SGD+momentum / cosine+warmup / crop+flip
# augmentation from scratch, then runs the timed test protocol.
#
# The controller sizes each schedule to what fits before DEADLINE so no
# TPU process is alive when the driver's bench runs. Touch /tmp/queue_hold
# to pause launching the next job; rm it to resume.
set -u
cd "$(dirname "$0")/.."
LOG=data/output
mkdir -p "$LOG"
# Round wall-clock ends ~07:40 UTC 2026-08-17; stop all TPU work by 06:15.
DEADLINE=$(date -u -d "2026-08-17 06:15" +%s)

hold_gate() { while [ -e /tmp/queue_hold ]; do sleep 20; done; }

run_cfg() {
  local arch=$1 kind=$2 maxep=$3 lr=$4 est=$5; shift 5  # est: sec/epoch
  hold_gate
  local now remain fit ep
  now=$(date -u +%s)
  remain=$(( DEADLINE - now ))
  fit=$(( (remain - 600) / est ))   # 600 s for compile + decode + test
  ep=$maxep
  [ "$fit" -lt "$ep" ] && ep=$fit
  if [ "$ep" -lt 40 ]; then
    echo "=== skip $arch-$kind: only $fit epochs fit ($(date -u +%H:%M:%S)) ==="
    return
  fi
  echo "=== queue: $arch-$kind ${ep}ep lr=$lr $(date -u +%H:%M:%S) ==="
  python scripts/train_cinic.py --arch "$arch" --kind "$kind" \
    --epochs "$ep" --lr "$lr" --tag r2 \
    --results "$LOG/RESULT-cinic-$arch-$kind-r2.json" "$@" \
    > "$LOG/train_${arch}_${kind}_r2.log" 2>&1
  echo "=== done: $arch-$kind rc=$? $(date -u +%H:%M:%S) ==="
}

# Reference targets (BASELINE.md): ResNet-26 74.81, MobileNet-v1 74.39,
# SEResNet-26 74.08, SqueezeNet-1.1 71.38, SKResNet-26 74.96,
# DenseNet-121 74.08, InceptionNet-v1 72.95, VGG-11 72.87,
# ShuffleNet-g4 66.16. Ordered by parity value; the cheap/easy targets
# last so they absorb any schedule trim.
run_cfg resnet 26 120 0.2 16
run_cfg mobilenet_v1 standard 100 0.2 14
run_cfg se_resnet 26 100 0.2 18
run_cfg sk_resnet 26 100 0.2 26
run_cfg densenet 121 100 0.2 32
run_cfg squeezenet 1.1 100 0.1 12 --dropout 0.5
run_cfg inceptionnet_v1 standard 100 0.2 16
run_cfg vggnet 11 100 0.05 16 --dropout 0.5
run_cfg shufflenet_v1 g4 100 0.2 16
echo "QUEUE_DONE $(date -u +%H:%M:%S)"
