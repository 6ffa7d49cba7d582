"""Summarize /tmp/tpu_queue_results.jsonl into a decision table.

The TPU measurement queue (run_tpu_queue.sh) appends JSON rows tagged
per job. This script groups them, extracts the headline number per
tag, and prints the A/B decisions the round's knobs hinge on:

  roi_*          canvas ROIAlign pooling='kron' / group sweep
  ext_stages*    extraction stage deltas + s2d stem A/B
  train_b128     train batch lever vs the 21% MFU b64 baseline
  train_bucket48 answer-length bucketing A/B
  decode_pallas  monolithic Pallas decode kernel vs XLA scan
  artifact       serving-artifact startup (compile vs load)
  serving_load   coalescing + replicas load test
  bench          the headline driver line

Usage: python scripts/analyze_queue.py [results.jsonl]
(pure host-side file parsing — safe while the queue is running)
"""

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/tpu_queue_results.jsonl"
    rows = defaultdict(list)
    status = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                tag = rec.get("tag", "?")
                if "row" in rec:
                    rows[tag].append(rec["row"])
                elif rec.get("done"):
                    status[tag] = "done"
                elif "exit" in rec:
                    status[tag] = f"exit {rec['exit']}"
                elif "skipped" in rec:
                    status[tag] = f"skipped: {rec['skipped']}"
    except FileNotFoundError:
        print(f"no results at {path} (queue has not run)")
        return

    for tag in sorted(set(rows) | set(status)):
        print(f"\n=== {tag} [{status.get(tag, 'INCOMPLETE')}] ===")
        for r in rows[tag]:
            print("  " + json.dumps(r))

    # quick knob verdicts where both sides exist
    def ms(tag, keys=("ms_per_call", "ms_per_batch", "ms"),
           where=None):
        for r in rows.get(tag, []):
            if where and any(r.get(k) != v for k, v in where.items()):
                continue
            for k in keys:
                if k in r:
                    return r[k]
        return None

    full = {"stage": "extract"}   # the cumulative full-program stage
    pairs = [
        (("roi_base", None), ("roi_kron", None),
         "canvas pooling=kron (1000 ROIs)"),
        (("roi_base", None), ("roi_g16", None),
         "canvas group=16 (1000 ROIs)"),
        (("roi_b8_base", None), ("roi_b8_best", None),
         "canvas kron at batch 8"),
        (("ext_stages", full), ("ext_stages_s2d", full),
         "s2d stem (full extract, b8)"),
    ]
    printed = False
    for (a, wa), (b, wb), label in pairs:
        va, vb = ms(a, where=wa), ms(b, where=wb)
        if va is not None and vb is not None:
            if not printed:
                print("\n=== knob verdicts (lower ms wins) ===")
                printed = True
            verdict = "WIN" if vb < va * 0.97 else (
                "LOSS" if vb > va * 1.03 else "flat")
            print(f"  {label}: {va} -> {vb} ms  [{verdict}]")


if __name__ == "__main__":
    main()
