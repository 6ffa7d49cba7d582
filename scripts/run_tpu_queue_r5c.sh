#!/usr/bin/env bash
# Round-5 queue C (after r5b): e2e device-cache A/B, RPN fused-preds
# A/B, serving latency re-measure, on-chip learnable dress rehearsal.
# Usage: bash scripts/run_tpu_queue_r5c.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_queue_r5c.jsonl}"

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

# --- pair_batch b128 verification (r5b showed 2.08x at b128+bkt48 but
# flat at b64/T90 — a shape-dependent cliff that big needs a same-window
# repeat + a trace before any default flip; both executables warm) -----
run train_base_b128_v2 2400 python scripts/bench_train.py --batch 128 --buckets 48
run train_pair_b128_v2 2400 python scripts/bench_train.py --batch 128 --buckets 48 --pair_batch
run prof_train_pair 2400 python scripts/profile_capture.py --target train --batch 128 --buckets 48 --pair_batch
run prof_train_base 2400 python scripts/profile_capture.py --target train --batch 128 --buckets 48

# --- e2e eval: device cache A/B (VERDICT r4 #6) ----------------------
run e2e_base  2400 python scripts/bench_e2e.py --wire compact
run e2e_cache 2400 python scripts/bench_e2e.py --wire compact --device_cache 1024
# evicting regime (capacity < unique images): miss wire per batch
run e2e_cache_small 2400 python scripts/bench_e2e.py --wire compact --device_cache 256

# --- RPN fused preds (VERDICT r4 #8) --------------------------------
run bb_rpn_base  2400 python scripts/bench_backbone_groups.py --only rpn
run bb_rpn_fused 2400 python scripts/bench_backbone_groups.py --only rpn --fused_preds
run ext_fused 3000 python scripts/bench_extract_sweep.py --batches 8 --norm frozen_bn --fused_preds
run ext_base  3000 python scripts/bench_extract_sweep.py --batches 8 --norm frozen_bn

# --- serving latency re-measure at r4 defaults (VERDICT r4 #9) -------
run serving_load 3600 python scripts/bench_serving_load.py

# --- on-chip learnable dress rehearsal (VERDICT r4 #7) ---------------
run learn_rehearsal 5400 bash scripts/learn_rehearsal.sh /tmp/r5_learn 900 480

echo "queue done -> $OUT"
