#!/usr/bin/env bash
# Round-4 on-chip measurement queue — the round-3 agenda that the relay
# outage stranded (VERDICT r3 item 1), re-ordered by judge priority so
# the highest-value rows land first if the window closes mid-queue.
# Single-flight (CLAUDE.md): each job runs alone with a generous
# timeout; results append to $OUT as JSON lines with a tag field.
# Stale r3 entries (kron pooling, group>8) are pruned: kron is
# hardware-rejected (Mosaic lane-merging reshape, dd5ee30) and group>8
# hits the remote-compile pathology (ops/pallas_roi.py docstring).
# Usage: bash scripts/run_tpu_queue_r4.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r4.jsonl}"

probe() {
  python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
except OSError:
    sys.exit(1)
EOF
}

run() {  # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  # resumable: only a DONE marker (written on exit 0) caches a job —
  # a multi-row sweep that printed some rows then crashed/timed out
  # must re-run in the next relay window, not be skipped forever
  if grep -q "\"tag\": \"$tag\", \"done\": true" "$OUT" 2>/dev/null; then
    echo "=== $tag (done in $OUT, skipping) ==="
    return 0
  fi
  if ! probe; then
    echo "{\"tag\": \"$tag\", \"skipped\": \"relay down\"}" >> "$OUT"
    return 1
  fi
  echo "=== $tag ==="
  timeout "$to" "$@" 2>/tmp/tpu_queue_err.log | while IFS= read -r l; do
    case "$l" in
      \{*) echo "{\"tag\": \"$tag\", \"row\": $l}" >> "$OUT"; echo "$l";;
      *) echo "$l";;
    esac
  done
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"tag\": \"$tag\", \"exit\": $rc}" >> "$OUT"
    # a timeout kill (rc 124) terminated a TPU process mid-claim — the
    # one thing that can wedge the chip (CLAUDE.md). Probe before
    # burning every remaining job's timeout against a dead device.
    if [ "$rc" -eq 124 ] && ! chip_ok; then
      echo "{\"tag\": \"$tag\", \"aborted\": \"chip wedged after timeout; queue stopped, remaining jobs left for the next window\"}" >> "$OUT"
      echo "chip wedged after $tag — aborting queue"
      exit 3
    fi
  else
    echo "{\"tag\": \"$tag\", \"done\": true}" >> "$OUT"
  fi
}

chip_ok() {  # tiny device op in a disposable subprocess, bounded
  timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(jnp.sum(x)) == 64.0
print("chip ok:", jax.devices()[0].platform)
EOF
}

# ---- priority order: VERDICT r4 items 1-3, 6, 8 ----------------------
# 1. s2d stem A/B (extraction weak #1; decides detector.s2d_stem)
run ext_stages_s2d 2400 python scripts/bench_extract_stages.py --batch 8 --s2d
# 2. extract profile (localizes the 2.6x-over-roofline gap)
run prof_extract   2400 python scripts/profile_capture.py --target extract
# 3. monolithic Pallas decode A/B (f32 exactness gate first, then bf16
#    timing at eval-parity 64 and serving 128)
run decode_pallas  3600 python scripts/bench_decode_sweep.py --kernel pallas --batches 64,128
# 4. train batch lever + bucketing (weak #3: 21.2% MFU, scan-latency)
run train_b128     2400 python scripts/bench_train.py --batch 128
run train_bucket48 2400 python scripts/bench_train.py --buckets 48
run prof_train     2400 python scripts/profile_capture.py --target train
# 5. serving under load + artifact startup (VERDICT item 8)
run serving_load   3600 python scripts/bench_serving_load.py --clients 16
run artifact       3600 python scripts/bench_artifact.py
# 6. decode profile + extraction sweep with winning knobs
run prof_decode    2400 python scripts/profile_capture.py --target decode
run ext_sweep      2400 python scripts/bench_extract_sweep.py --batches 8,16
# 6b. end-to-end eval rate (loader+decode+detokenize overlapped) —
#     VERDICT r4 item 5; also a bench.py field
run e2e            2400 python scripts/bench_e2e.py
# 7. headline — also pre-populates the persistent compile cache
#    (b64 + extract + b128) for the driver's round-end bench.py run
run bench          2400 python bench.py

echo "queue done -> $OUT"
