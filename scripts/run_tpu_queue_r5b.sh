#!/usr/bin/env bash
# Round-5 measurement queue (single-flight, resumable):
#   1. pair_batch A/B (VERDICT r4 #3): bef/aft through ONE [2B]
#      relation-encoder pass — train step (the 19 ms encoder attack)
#      and decode, same-window baselines.
#   2. certify_topk (VERDICT r4 #2): train the synthetic detector at
#      full extraction geometry, certify per-(image,class) selection
#      agreement at extract_topk in {512, 256} vs the 1000 budget.
# Usage: bash scripts/run_tpu_queue_r5b.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r5b.jsonl}"

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

# --- pair_batch A/B at the best supported train operating point -------
# baseline FIRST (warm from the r5 opening bench? different program —
# b128+bkt48 was r4d; may recompile), then the variant, same window.
run train_base_b128 3600 python scripts/bench_train.py --batch 128 --buckets 48
run train_pair_b128 3600 python scripts/bench_train.py --batch 128 --buckets 48 --pair_batch
# b64/T90 point too: the encoder share is larger there (scan shorter
# amortization), so pair_batch's ceiling shows more clearly
run train_base_b64 2400 python scripts/bench_train.py --batch 64
run train_pair_b64 2400 python scripts/bench_train.py --batch 64 --pair_batch

# --- pair_batch on the decode path (encoder runs before the kernel) ---
run decode_base 2400 python scripts/bench_decode_sweep.py --batches 64,128 --kernel pallas
run decode_pair 2400 python scripts/bench_decode_sweep.py --batches 64,128 --kernel pallas --pair_batch

# --- extract_topk certification (trained detector, VERDICT r4 #2) -----
run certify_topk 7200 python scripts/certify_topk.py

echo "queue done -> $OUT"
