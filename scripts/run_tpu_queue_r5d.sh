#!/usr/bin/env bash
# Round-5 queue D (after r5c): decode-side pair_batch b64 re-verify
# under the hardened slope fit (the r5b +12% row predates the
# short-chain-congestion guard), the b128+bkt48 train trace for the
# encoder bound table (VERDICT r4 #3 fallback route), extract_topk
# certification (VERDICT r4 #2), and a final full bench.py run that
# both exercises the new train phase and leaves every driver program
# warm in the repo-local cache.
# Usage: bash scripts/run_tpu_queue_r5d.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r5d.jsonl}"

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

# --- decode pair_batch b64, hardened fit (was +12% in r5b) -----------
run decode_base_b64 2400 python scripts/bench_decode_sweep.py --batches 64 --kernel pallas
run decode_pair_b64 2400 python scripts/bench_decode_sweep.py --batches 64 --kernel pallas --pair_batch

# --- train trace at the operating point (encoder bound table) --------
run prof_train_b128 2400 python scripts/profile_capture.py --target train --batch 128 --buckets 48

# --- extract_topk certification (VERDICT r4 #2) ----------------------
run certify_topk 7200 python scripts/certify_topk.py

# bench_final intentionally NOT here: the session runs `python bench.py`
# itself after acting on the certification verdict (an extract_topk
# default flip changes the extract program, and the final bench must
# compile-warm the SHIPPED configuration for the driver's round-end run).

echo "queue done -> $OUT"
