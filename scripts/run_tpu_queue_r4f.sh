#!/usr/bin/env bash
# Round-4 fifth queue: the wrap-up window after the pallas-decode
# default flip — (1) a fresh bench.py so the driver-recorded headline
# reflects the new default AND its executables land in the persistent
# cache before the end-of-round driver run, (2) the pallas-decode b256
# probe (XLA b256 regressed to 12.0k; the kernel amortizes weight
# streaming differently), (3) the combined train b256+bucket-48 point,
# (4) per-group backbone timings + a current-defaults stage table +
# extract re-profile for docs/perf/EXTRACTION_BOUND.md.
# Usage: bash scripts/run_tpu_queue_r4f.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r4f.jsonl}"

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

# headline first: populates the pallas-default decode executables in the
# persistent cache so the driver's own bench.py run is warm
run bench 3600 python bench.py
# pallas decode at serving-plus scale
run decode_pallas_b256 3600 python scripts/bench_decode_sweep.py \
    --kernel pallas --batches 256
# train: big-batch + short-bucket combination
run train_b256_bkt48 2400 python scripts/bench_train.py \
    --batch 256 --buckets 48
# extraction bound evidence (current defaults: s2d on, topk select)
run bb_groups 3600 python scripts/bench_backbone_groups.py --batch 8
run ext_stages_now 2400 python scripts/bench_extract_stages.py \
    --batch 8 --norm frozen_bn
run prof_extract 2400 python scripts/profile_capture.py \
    --target extract --norm frozen_bn
# second bench pass: the first run paid the post-default-flip cold
# compiles and time-guarded out the b128/e2e rows; with the cache warm
# this run should land the full record (b64+b128+e2e+loader) AND leave
# every executable the driver's round-end bench needs in the cache.
run bench2 3600 python bench.py

echo "queue done -> $OUT"
