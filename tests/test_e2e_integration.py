"""End-to-end integration on CPU: detector → extraction → HDF5 → VQA.

A trimmed version of scripts/e2e_pipeline.py exercising every
file-mediated seam with tiny shapes (BASELINE.json config[4]).
"""

import numpy as np
import pytest

from ekaid_tpu.config import default_config


@pytest.mark.slow
def test_full_pipeline_seams(tmp_path):
    from ekaid_tpu.extract.pipeline import Extractor, H5Writer
    from ekaid_tpu.extract.runner import build_detector_fns
    from ekaid_tpu.train.train_detector import synthetic_blob_dataset

    cfg = default_config()
    det = cfg.detector.replace(image_size=64, batch_size=4,
                               num_anatomy_classes=4,
                               num_disease_classes=3,
                               fpn_channels=16, roi_feat_dim=32,
                               pre_nms_topk=50, post_nms_topk=30)
    cfg = cfg.replace(detector=det)

    # extraction with random detectors
    imgs, _, _, _ = synthetic_blob_dataset(8, 64, 4, seed=0)
    ana_apply, dis_apply = build_detector_fns(cfg)
    ex = Extractor(ana_apply, dis_apply, det.num_disease_classes)
    h5_path = str(tmp_path / "cmb.hdf5")
    writer = H5Writer(h5_path, num_nodes=8, feat_dim=32)
    n = ex.run((imgs[i:i + 4] for i in range(0, 8, 4)), writer,
               log_every=100)
    assert n == 8

    import h5py
    with h5py.File(h5_path) as f:
        assert f["image_features"].shape == (8, 8, 32)
        assert f["image_adj_matrix"].shape == (8, 100, 100)

    # VQA training over the produced HDF5
    from ekaid_tpu.data.pipeline import H5FeatureStore, synthetic_dataset
    from ekaid_tpu.train.train import Trainer, identity_vocab

    vqa_cfg = cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=32, rnn_size=16, embed_input_dim=96, embed_dim=32,
            word_embed_size=8, seq_length=6),
        question=cfg.question.replace(hidden_dim=32),
        data=cfg.data.replace(
            num_nodes=8, node_one_num=4, feature_dim=32,
            train=cfg.data.train.replace(batch_size=8),
            test=cfg.data.test.replace(batch_size=8)),
        train=cfg.train.replace(max_iter=4, snapshot_interval=10 ** 9,
                                log_interval=2))
    store = H5FeatureStore(h5_path)
    rng = np.random.default_rng(0)
    train_ds = synthetic_dataset(vqa_cfg, "train", n_pairs=24)
    train_ds.store = store
    train_ds.feature_idx = np.stack(
        [rng.integers(0, 8, 24), rng.integers(0, 8, 24)],
        -1).astype(np.int64)
    eval_ds = synthetic_dataset(vqa_cfg, "test", n_pairs=24)
    eval_ds.store = store
    eval_ds.feature_idx = train_ds.feature_idx

    trainer = Trainer(vqa_cfg, str(tmp_path / "run"), train_ds, eval_ds,
                      identity_vocab(vqa_cfg.speaker.vocab_size))
    metrics = trainer.train()
    assert np.isfinite(metrics["total_loss"])
    scores, preds = trainer.evaluate(max_batches=1)
    assert preds and set(scores) >= {"Bleu_1", "CIDEr"}
