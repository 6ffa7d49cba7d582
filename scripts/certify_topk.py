"""Certify `detector.extract_topk` against the full-budget selection.

VERDICT r4 #2: extract_topk=256 measured +48% extraction throughput
(176.8 vs 119.4 img/s at b8) but the default stayed 0 (=1000, the
reference budget of ana_bbox_generator.py:578-600 / get_bbox_id.py)
because per-class selection agreement at smaller N was uncertified on a
TRAINED detector (random-init scores are flat, so any budget cut can
reshuffle the per-class winners; trained scores are peaked, so the
per-class best survivor should sit far inside the top-N).

This script produces that certification:
  1. trains the synthetic-blob detector at full extraction geometry
     (1024², 26 classes — the r1 recipe that reached AP50 0.74) or
     loads a previously trained parameter pickle;
  2. reports AP50/AR so the table states the detector quality;
  3. runs `extract` at extract_topk ∈ {0, 512, 256} over a held-out
     image set and compares per-(image, class) selections against the
     full 1000-proposal budget: found-flag agreement, box identity,
     and feature-row max|Δ| (same box ⇒ same ROIAlign rows, so any
     feature delta means a different proposal won the class).

Agreement contract (what ≥99% must mean): a (image, class) slot
agrees iff found flags match AND (both not-found OR boxes are
element-identical). Prints one JSON row per N plus a summary row.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800,
                   help="detector training steps (r1: AP50 0.74 at 800)")
    p.add_argument("--train_images", type=int, default=256)
    p.add_argument("--eval_images", type=int, default=200,
                   help="held-out images for the agreement measurement")
    p.add_argument("--topk", default="512,256")
    p.add_argument("--params_pkl", default="/tmp/certify_topk_params.pkl",
                   help="trained detector params cache (skip retrain)")
    p.add_argument("--retrain", action="store_true")
    p.add_argument("--image_size", type=int, default=0,
                   help="override detector.image_size (0 = config 1024)")
    p.add_argument("--force_cpu", action="store_true")
    a = p.parse_args()

    if a.force_cpu:
        os.environ["EKAID_PLATFORM"] = "cpu"
        from ekaid_tpu.utils.platform import apply_platform_env
        apply_platform_env()
    elif not relay_up():
        print(json.dumps({"error": "axon relay down"}))
        sys.exit(1)

    from ekaid_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ekaid_tpu.config import default_config
    from ekaid_tpu.models.detector.faster_rcnn import FasterRCNN
    from ekaid_tpu.train.train_detector import (DetectorTrainer,
                                                synthetic_blob_dataset)
    from ekaid_tpu.utils.dtypes import Policy, canonical

    cfg = default_config()
    if a.image_size:
        cfg = cfg.replace(detector=cfg.detector.replace(
            image_size=a.image_size))
    det = cfg.detector
    k = det.num_anatomy_classes
    platform = jax.devices()[0].platform

    # ---- phase 1: a TRAINED detector (peaked scores) ----------------
    t0 = time.time()
    if os.path.exists(a.params_pkl) and not a.retrain:
        with open(a.params_pkl, "rb") as f:
            saved = pickle.load(f)
        params = jax.tree.map(jnp.asarray, saved["params"])
        quality = saved["quality"]
        print(f"loaded trained params from {a.params_pkl} "
              f"(AP50={quality.get('AP50')})", file=sys.stderr)
    else:
        trainer = DetectorTrainer(cfg, num_classes=k,
                                  total_steps=a.steps, lr=1e-3)
        arrays = synthetic_blob_dataset(a.train_images, det.image_size, k,
                                        seed=0)
        trainer.fit(arrays, steps=a.steps, log_every=100)
        val = synthetic_blob_dataset(64, det.image_size, k, seed=101)
        quality = trainer.evaluate(val, proposals=True)
        params = trainer.params
        with open(a.params_pkl, "wb") as f:
            pickle.dump({"params": jax.tree.map(np.asarray, params),
                         "quality": quality}, f)
    train_s = time.time() - t0
    print(json.dumps({"phase": "detector", "platform": platform,
                      "image_size": det.image_size,
                      "train_s": round(train_s, 1),
                      **{kk: round(float(v), 4)
                         for kk, v in quality.items()}}))

    # ---- phase 2: per-(image, class) selection agreement ------------
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    images, _, _, _ = synthetic_blob_dataset(
        a.eval_images, det.image_size, k, seed=202)
    b = det.extract_batch_size
    n = (a.eval_images // b) * b
    images = images[:n]

    def run_extract(et: int):
        model = FasterRCNN(det.replace(extract_topk=et), num_classes=k,
                           norm=det.norm, policy=policy)
        ex = jax.jit(lambda p, im: model.apply(p, im, method="extract"))
        outs = []
        for i in range(0, n, b):
            o = ex(params, jnp.asarray(images[i:i + b]))
            outs.append({kk: np.asarray(v) for kk, v in o.items()})
        return {kk: np.concatenate([o[kk] for o in outs])
                for kk in outs[0]}

    base = run_extract(0)
    rows = []
    for et in (int(x) for x in a.topk.split(",")):
        t1 = time.time()
        got = run_extract(et)
        found_match = (got["found"] == base["found"])
        both = got["found"] & base["found"]
        box_same = np.all(got["boxes"] == base["boxes"], axis=-1)
        agree = found_match & (box_same | ~base["found"] | ~got["found"])
        feat_delta = np.abs(got["features"] - base["features"]).max(
            axis=-1)
        row = {
            "phase": "agreement", "extract_topk": et,
            "images": int(n), "slots": int(agree.size),
            "found_match_pct": round(100.0 * found_match.mean(), 4),
            "agreement_pct": round(100.0 * agree.mean(), 4),
            "box_identical_pct_of_both": round(
                100.0 * (box_same[both].mean() if both.any() else 1.0), 4),
            "feat_max_abs_delta_agreeing": float(
                feat_delta[agree & both].max()) if (agree & both).any()
            else 0.0,
            "disagreeing_slots": int((~agree).sum()),
            "wall_s": round(time.time() - t1, 1),
        }
        rows.append(row)
        print(json.dumps(row))
    worst = min(r["agreement_pct"] for r in rows) if rows else None
    print(json.dumps({"phase": "summary", "worst_agreement_pct": worst,
                      "certified_999": bool(worst and worst >= 99.9),
                      "certified_99": bool(worst and worst >= 99.0)}))


if __name__ == "__main__":
    main()
