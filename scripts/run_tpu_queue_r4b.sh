#!/usr/bin/env bash
# Round-4 second measurement queue: the knobs built/fixed after the
# first r4 queue ran (train_hoist, compact wire, serving device-cache,
# canvas-ROI schedule sweep, fixed prof_train) plus the decode_pallas
# re-run whose stderr the first queue lost. Single-flight (CLAUDE.md);
# per-tag stderr is KEPT at /tmp/tpu_queue_err_<tag>.log (the r4 run
# overwrote one shared file, losing the decode_pallas failure).
# Usage: bash scripts/run_tpu_queue_r4b.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r4b.jsonl}"

probe() {
  python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
except OSError:
    sys.exit(1)
EOF
}

chip_ok() {  # tiny device op in a disposable subprocess, bounded
  timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(jnp.sum(x)) == 64.0
print("chip ok:", jax.devices()[0].platform)
EOF
}

run() {  # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  if grep -q "\"tag\": \"$tag\", \"done\": true" "$OUT" 2>/dev/null; then
    echo "=== $tag (done in $OUT, skipping) ==="
    return 0
  fi
  if ! probe; then
    echo "{\"tag\": \"$tag\", \"skipped\": \"relay down\"}" >> "$OUT"
    return 1
  fi
  echo "=== $tag ==="
  timeout "$to" "$@" 2>"/tmp/tpu_queue_err_$tag.log" \
      | while IFS= read -r l; do
    case "$l" in
      \{*) echo "{\"tag\": \"$tag\", \"row\": $l}" >> "$OUT"; echo "$l";;
      *) echo "$l";;
    esac
  done
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"tag\": \"$tag\", \"exit\": $rc}" >> "$OUT"
    echo "--- $tag stderr tail ---"
    tail -5 "/tmp/tpu_queue_err_$tag.log"
    if [ "$rc" -eq 124 ] && ! chip_ok; then
      echo "{\"tag\": \"$tag\", \"aborted\": \"chip wedged after timeout; queue stopped\"}" >> "$OUT"
      echo "chip wedged after $tag — aborting queue"
      exit 3
    fi
  else
    echo "{\"tag\": \"$tag\", \"done\": true}" >> "$OUT"
  fi
}

# 1. canvas-ROI schedule sweep (VERDICT item 2: roi_align 7x over its
#    1.8 ms floor is grid-step latency; group now decouples from code
#    size via the in-kernel fori_loop). Process-fresh per point.
run roi_g16u8 1800 python scripts/bench_roi.py --only canvas --batch 8 --group 16 --unroll 8
run roi_g32u8 1800 python scripts/bench_roi.py --only canvas --batch 8 --group 32 --unroll 8
run roi_g64u8 1800 python scripts/bench_roi.py --only canvas --batch 8 --group 64 --unroll 8
run roi_g32u4 1800 python scripts/bench_roi.py --only canvas --batch 8 --group 32 --unroll 4
# 2. train_hoist A/B (scan-serial-latency lever; VERDICT item 6)
run train_hoist_b64  2400 python scripts/bench_train.py --hoist
run train_hoist_b128 2400 python scripts/bench_train.py --batch 128 --hoist
# 3. fixed train profile (the r4 capture was forward-only: XLA DCE'd
#    the backward when only the loss was returned)
run prof_train 2400 python scripts/profile_capture.py --target train
# 4. e2e wire A/B (VERDICT item 5: 91 pairs/s was H2D-bound; compact
#    wire ships 2.3x fewer bytes)
run e2e 2400 python scripts/bench_e2e.py --wire both
# 5. serving under load with the device-resident sample cache + on-
#    device batch assembly (first r4 run: coalesce lost 2.9x to
#    single-flight on feature re-upload)
run serving_load 3600 python scripts/bench_serving_load.py --clients 16
# 6. decode_pallas re-run (first run exit 1, stderr lost)
run decode_pallas 3600 python scripts/bench_decode_sweep.py --kernel pallas --batches 64,128
# 7. on-chip learning curve: flagship dims, synthetic corpus, monotone
#    loss descent for STATUS (VERDICT item 4's on-chip half)
run learn_curve 3600 python -m ekaid_tpu.train.train --synthetic --workdir /tmp/r4_learn --max_iter 400 --snapshot_interval 400 --eval_batches 2
# 8. headline + driver-cache pre-population
run bench 2400 python bench.py

echo "queue done -> $OUT"
