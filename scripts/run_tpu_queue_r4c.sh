#!/usr/bin/env bash
# Round-4 third queue: follow-ups that depend on r4b's landed code —
# extraction stage timing with the fused select + s2d defaults,
# the extract_topk budget sweep, the train batch-256 lever, and the
# loader-rate reconciliation (VERDICT r3 weak #5: 2.6k driver-context
# vs 11-15k uncontended). Run AFTER run_tpu_queue_r4b.sh finishes.
# Usage: bash scripts/run_tpu_queue_r4c.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r4c.jsonl}"

probe() {
  python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
except OSError:
    sys.exit(1)
EOF
}

chip_ok() {
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

# extraction with the r4 session-2 defaults (fused select + s2d): the
# stage split credits the select fusion against the r4 66.7 ms row
run ext_stages 2400 python scripts/bench_extract_stages.py --batch 8
# proposal-budget sweep (canvas is per-ROI bound -> ~linear lever)
run ext_topk512 2400 python scripts/bench_extract_sweep.py --batches 8 --extract_topk 512
run ext_topk256 2400 python scripts/bench_extract_sweep.py --batches 8 --extract_topk 256
# train batch lever beyond 128
run train_b256 2400 python scripts/bench_train.py --batch 256
# fixed-capture train profile (r4b attempt crashed on a missing return
# after the DCE fix; the anchor now uses a nonzero underflowing scale)
run prof_train 2400 python scripts/profile_capture.py --target train
# loader reconciliation (host-only, no device claim)
run loader 1200 python scripts/bench_loader.py
# serving load with the fused stack+decode single dispatch and
# pipeline_depth=2 (r4b showed a strictly-serial dispatcher losing on
# per-batch relay roundtrips)
run serving_load2 3600 python scripts/bench_serving_load.py --clients 16
# monolithic pallas decode re-run: the r4b failure was the f32 gate
# kernel 612 KB over the 112 MB scoped-VMEM limit (raised to 120 MB)
run decode_pallas 3600 python scripts/bench_decode_sweep.py --kernel pallas --batches 64,128
# re-bench if anything above changed a default
run bench 2400 python bench.py

echo "queue done -> $OUT"
