#!/bin/bash
# CINIC-10 accuracy-parity campaign (VERDICT r1 next-steps #3 and #7):
# four reference configs trained sequentially on the single chip.
# Reference targets (BASELINE.md): ResNet-26 74.81, MobileNet-v1 74.39,
# SqueezeNet-1.1 71.38, SEResNet-26 74.08.
set -u
cd "$(dirname "$0")/.."
LOG=data/output
mkdir -p "$LOG"

run() {
  local arch=$1 kind=$2 epochs=$3 lr=$4; shift 4
  echo "=== queue: $arch-$kind ${epochs}ep lr=$lr $(date -u +%H:%M:%S) ==="
  python scripts/train_cinic.py --arch "$arch" --kind "$kind" \
    --epochs "$epochs" --lr "$lr" --tag r2 \
    --results "$LOG/RESULT-cinic-$arch-$kind-r2.json" "$@" \
    > "$LOG/train_${arch}_${kind}_r2.log" 2>&1
  echo "=== done: $arch-$kind rc=$? $(date -u +%H:%M:%S) ==="
}

run resnet 26 120 0.2
run mobilenet_v1 standard 100 0.2
run squeezenet 1.1 100 0.1
run se_resnet 26 100 0.2
echo "QUEUE_DONE"
