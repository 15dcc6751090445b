#!/bin/bash
# Deadline-aware CINIC-10 accuracy campaign controller (round 2).
#
# Replaces the fixed train_queue.sh: launches the remaining parity configs
# sequentially on the single chip, sizing each schedule to what fits before
# DEADLINE so no TPU process is alive when the driver's bench runs.
#
# Coordination: touch /tmp/queue_hold to pause launching the next job (the
# running job is never interrupted); rm it to resume. The controller writes
# its progress to data/output/queue_ctl.log.
set -u
cd "$(dirname "$0")/.."
LOG=data/output
mkdir -p "$LOG"
# Round wall-clock ends ~07:40 UTC 2026-08-17; stop all TPU work by 06:30.
DEADLINE=$(date -u -d "2026-08-17 06:30" +%s)

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }
hold_gate() { while [ -e /tmp/queue_hold ]; do sleep 20; done; }

run_cfg() {
  local arch=$1 kind=$2 maxep=$3 lr=$4 est=$5  # est: conservative sec/epoch
  hold_gate
  local now remain fit ep
  now=$(date -u +%s)
  remain=$(( DEADLINE - now ))
  fit=$(( (remain - 900) / est ))   # 900 s for compile + timed test protocol
  ep=$maxep
  [ "$fit" -lt "$ep" ] && ep=$fit
  if [ "$ep" -lt 40 ]; then
    echo "=== skip $arch-$kind: only $fit epochs fit ($(date -u +%H:%M:%S)) ==="
    return
  fi
  echo "=== queue: $arch-$kind ${ep}ep lr=$lr $(date -u +%H:%M:%S) ==="
  python scripts/train_cinic.py --arch "$arch" --kind "$kind" \
    --epochs "$ep" --lr "$lr" --tag r2 \
    --results "$LOG/RESULT-cinic-$arch-$kind-r2.json" \
    > "$LOG/train_${arch}_${kind}_r2.log" 2>&1
  echo "=== done: $arch-$kind rc=$? $(date -u +%H:%M:%S) ==="
}

# Wait for the already-running resnet-26 job before starting anything.
RN_PID=$(cat /tmp/rn26.pid 2>/dev/null || true)
if [ -n "${RN_PID:-}" ]; then
  echo "=== waiting for resnet-26 (pid $RN_PID) $(date -u +%H:%M:%S) ==="
  wait_pid "$RN_PID"
  echo "=== resnet-26 finished $(date -u +%H:%M:%S) ==="
fi

# Order by parity value: the two 74-point targets first, SqueezeNet (71.38,
# the easiest target) last so it absorbs any schedule trim.
run_cfg mobilenet_v1 standard 100 0.2 100
run_cfg se_resnet 26 100 0.2 110
run_cfg squeezenet 1.1 100 0.1 90
echo "QUEUE_DONE $(date -u +%H:%M:%S)"
