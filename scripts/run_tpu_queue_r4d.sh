#!/usr/bin/env bash
# Round-4 fourth (final) queue: the re-runs unlocked by the session's
# fixes — the monolithic pallas decode with f32 accumulators + the
# peaked-logit gate, the fully-anchored train profile, the combined
# b128+bucket-48 train lever, and the select fused-vs-topk A/B in a
# quiet window. Usage: bash scripts/run_tpu_queue_r4d.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r4d.jsonl}"

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

# select A/B first (quiet window, process-fresh pair)
run sel_topk  2400 python scripts/bench_extract_stages.py --batch 8 --select topk
run sel_fused 2400 python scripts/bench_extract_stages.py --batch 8 --select fused
# combined train lever: serving-scale batch + length bucketing
run train_b128_bkt48 2400 python scripts/bench_train.py --batch 128 --buckets 48
# fully-anchored train profile
run prof_train 2400 python scripts/profile_capture.py --target train
# monolithic pallas decode: f32 accumulators + peaked gate
run decode_pallas 3600 python scripts/bench_decode_sweep.py --kernel pallas --batches 64,128

echo "queue done -> $OUT"
