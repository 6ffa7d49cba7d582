#!/usr/bin/env bash
# Round-3 on-chip measurement queue — run when the axon relay is live.
# Single-flight (CLAUDE.md): each job runs alone with a generous
# timeout; results append to $OUT as JSON lines with a tag field.
# Usage: bash scripts/run_tpu_queue.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_results.jsonl}"

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
  timeout 180 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(jnp.sum(x)) == 64.0
print("chip ok:", jax.devices()[0].platform)
EOF
}

# 1. canvas ROIAlign: kron pooling + group sweep (1000 ROIs, b1 + b8)
run roi_base      1200 python scripts/bench_roi.py --only canvas
run roi_kron      1200 python scripts/bench_roi.py --only canvas --pooling kron
run roi_g16       1200 python scripts/bench_roi.py --only canvas --group 16
run roi_kron_g16  1200 python scripts/bench_roi.py --only canvas --pooling kron --group 16
run roi_g32       1200 python scripts/bench_roi.py --only canvas --group 32
run roi_kron_g32  1200 python scripts/bench_roi.py --only canvas --pooling kron --group 32
run roi_b8_base   1800 python scripts/bench_roi.py --only canvas --batch 8
run roi_b8_best   1800 python scripts/bench_roi.py --only canvas --batch 8 --pooling kron
# 2. extraction stages: s2d stem A/B (also re-baselines post-kron)
run ext_stages      2400 python scripts/bench_extract_stages.py --batch 8
run ext_stages_s2d  2400 python scripts/bench_extract_stages.py --batch 8 --s2d
# 3. extraction sweep with the winning knobs (edit flags per 1/2)
run ext_sweep     2400 python scripts/bench_extract_sweep.py --batches 8,16
# 3b. train batch lever (b64 is 21% MFU and scan-latency-bound; decode
#     showed b128 = +44% throughput — measure the train-side analogue)
run train_b128   2400 python scripts/bench_train.py --batch 128
# 3c. answer-length bucketing: 48-step scan vs the 90-step baseline
#     (loss/grad-identical under the mask, test_model.py; real MIMIC
#     answers are mostly far shorter than 90)
run train_bucket48 2400 python scripts/bench_train.py --buckets 48
# 4. profiles (trace dirs under /tmp/ekaid_traces)
run prof_extract  2400 python scripts/profile_capture.py --target extract
run prof_train    2400 python scripts/profile_capture.py --target train
run prof_decode   2400 python scripts/profile_capture.py --target decode
# 4b. monolithic Pallas decode kernel A/B (weights VMEM-resident,
#     in-kernel early exit; interpret-mode exact vs XLA at f32,
#     tests/test_pallas_decode.py). First compile may be slow on the
#     remote-compile service (90-step in-kernel loop).
run decode_pallas 3600 python scripts/bench_decode_sweep.py --kernel pallas --batches 1,64,128
# 5. concurrent serving load (VERDICT #8 done-bar: >5x single-flight
#    at bounded p99 with 16 clients)
run serving_load  3600 python scripts/bench_serving_load.py --clients 16
# 5b. serving-artifact startup: live compile (cache off) vs
#     pre-compiled executable load (serving/artifact.py)
run artifact      3600 python scripts/bench_artifact.py
# 6. headline
run bench         2400 python bench.py

echo "queue done -> $OUT"
