"""End-to-end pipeline drive: detector → extraction → graph HDF5 → VQA.

BASELINE.json config[4] ("End-to-end: DICOM→feature→graph→train_mimic
full training"): exercises every file-mediated seam of the framework on
one accelerator with synthetic imagery —

  1. (optionally) train the anatomy detector on synthetic blobs;
  2. run batched extraction with it (+ a random disease detector) to the
     reference-compatible cmb_bbox_di_feats.hdf5;
  3. build a DiffVQA dataset over that HDF5 (synthetic QA text);
  4. train the VQA model for a few hundred steps and greedy-decode.

Usage: python scripts/e2e_pipeline.py [--ana_ckpt PATH] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ana_ckpt", default=None)
    p.add_argument("--workdir", default="/tmp/ekaid_e2e")
    p.add_argument("--n_images", type=int, default=32)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--det_steps", type=int, default=0,
                   help="train a fresh detector for N steps first")
    a = p.parse_args()
    os.makedirs(a.workdir, exist_ok=True)

    from ekaid_tpu.config import default_config
    from ekaid_tpu.extract.pipeline import Extractor, H5Writer
    from ekaid_tpu.extract.runner import build_detector_fns
    from ekaid_tpu.train.train_detector import synthetic_blob_dataset

    cfg = default_config()
    det = cfg.detector.replace(image_size=a.image_size, batch_size=8)
    cfg = cfg.replace(detector=det)

    ana_params = None
    if a.det_steps:
        from ekaid_tpu.train.train_detector import DetectorTrainer
        tr = DetectorTrainer(cfg, det.num_anatomy_classes,
                             total_steps=a.det_steps)
        arrays = synthetic_blob_dataset(64, det.image_size,
                                        det.num_anatomy_classes)
        tr.fit(arrays, a.det_steps, log_every=max(a.det_steps // 4, 1))
        print("detector AP:", tr.evaluate(arrays)["AP50"])
        ana_params = tr.params
    elif a.ana_ckpt:
        import orbax.checkpoint as ocp
        ana_params = ocp.StandardCheckpointer().restore(
            os.path.abspath(a.ana_ckpt))
        print("restored detector checkpoint")

    # ---- stage 2: extraction over blob images -------------------------
    imgs, _, _, _ = synthetic_blob_dataset(
        a.n_images, det.image_size, det.num_anatomy_classes, seed=3)
    ana_apply, dis_apply = build_detector_fns(cfg, ana_params=ana_params)
    ex = Extractor(ana_apply, dis_apply, det.num_disease_classes)
    h5_path = os.path.join(a.workdir, "cmb_bbox_di_feats.hdf5")
    writer = H5Writer(h5_path, num_nodes=2 * det.num_anatomy_classes,
                      feat_dim=det.roi_feat_dim)
    bs = det.extract_batch_size
    ex.run((imgs[i:i + bs] for i in range(0, a.n_images, bs)), writer)

    import h5py
    with h5py.File(h5_path) as f:
        labels = np.asarray(f["bbox_label"])
        found_rate = float((labels[:, :26] < 49).mean())
        print(f"extraction: {labels.shape[0]} records, anatomy node "
              f"found-rate {found_rate:.2f}")

    # ---- stage 3+4: VQA dataset over the HDF5, short training ---------
    from ekaid_tpu.data.pipeline import (DiffVQADataset, H5FeatureStore,
                                         synthetic_dataset)
    from ekaid_tpu.train.train import Trainer, identity_vocab

    vqa_cfg = cfg.replace(
        data=cfg.data.replace(
            train=cfg.data.train.replace(batch_size=8),
            test=cfg.data.test.replace(batch_size=8)),
        train=cfg.train.replace(max_iter=a.steps,
                                snapshot_interval=10 ** 9,
                                log_interval=max(a.steps // 3, 1)))
    store = H5FeatureStore(h5_path)
    base = synthetic_dataset(vqa_cfg, "train", n_pairs=64)
    base.store = store
    base.feature_idx = np.stack(
        [np.random.default_rng(0).integers(0, len(store), 64),
         np.random.default_rng(1).integers(0, len(store), 64)],
        -1).astype(np.int64)
    eval_ds = synthetic_dataset(vqa_cfg, "test", n_pairs=64)
    eval_ds.store = store
    eval_ds.feature_idx = base.feature_idx
    vocab = identity_vocab(vqa_cfg.speaker.vocab_size)
    trainer = Trainer(vqa_cfg, a.workdir, base, eval_ds, vocab)
    trainer.train()
    scores = trainer.snapshot_and_eval(int(trainer.state.step),
                                       max_batches=2)
    print("E2E OK — pipeline seams exercised; eval:",
          {k: round(v, 3) for k, v in scores.items()})


if __name__ == "__main__":
    main()
