"""Extraction pipeline + detection evaluator tests."""

import numpy as np

from ekaid_tpu.data import knowledge as K
from ekaid_tpu.extract.pipeline import (H5Writer, combine_pair,
                                        match_disease_to_anatomy)
from ekaid_tpu.metrics.detection import (DetectionEvaluator,
                                         average_precision)


def test_match_disease_basic():
    ana = np.array([[0, 0, 10, 10], [20, 20, 40, 40],
                    [60, 60, 90, 90]], np.float32)
    dis = np.array([[21, 21, 39, 39],     # overlaps ana1
                    [61, 59, 88, 92]], np.float32)   # overlaps ana2
    feats = np.array([[1.0, 1.0], [2.0, 2.0]], np.float32)
    classes = np.array([3, 7])
    valid = np.array([True, True])
    out_feat, out_cls = match_disease_to_anatomy(dis, feats, classes,
                                                 valid, ana, 22)
    np.testing.assert_array_equal(out_feat[1], [1.0, 1.0])
    np.testing.assert_array_equal(out_feat[2], [2.0, 2.0])
    assert out_cls.tolist() == [22, 3, 7]     # ana0 unassigned -> sentinel
    assert (out_feat[0] == 0).all()


def test_match_disease_greedy_priority():
    # one disease box overlapping two anatomy boxes: takes both; a second
    # disease with higher IoU on ana1 steals it (holder has >1)
    ana = np.array([[0, 0, 10, 10], [8, 0, 18, 10]], np.float32)
    dis = np.array([[0, 0, 18, 10],       # covers both
                    [8, 0, 18, 10]], np.float32)    # exactly ana1
    feats = np.array([[1.0], [2.0]], np.float32)
    classes = np.array([0, 1])
    valid = np.array([True, True])
    out_feat, out_cls = match_disease_to_anatomy(dis, feats, classes,
                                                 valid, ana, 22)
    assert out_cls.tolist() == [0, 1]     # ana1 stolen by disease 1
    np.testing.assert_array_equal(out_feat[:, 0], [1.0, 2.0])


def test_match_disease_invalid_skipped():
    ana = np.array([[0, 0, 10, 10]], np.float32)
    dis = np.array([[0, 0, 10, 10]], np.float32)
    out_feat, out_cls = match_disease_to_anatomy(
        dis, np.ones((1, 2), np.float32), np.array([5]),
        np.array([False]), ana, 22)
    assert out_cls.tolist() == [22]


def make_extraction(n_ana=4, feat=8):
    rng = np.random.default_rng(0)
    boxes = np.array([[10, 10, 100, 100], [150, 10, 300, 200],
                      [400, 400, 600, 600], [0, 0, 0, 0]], np.float32)
    ana = {
        "features": rng.standard_normal((n_ana, feat)).astype(np.float32),
        "boxes": boxes[:n_ana],
        "classes": np.array([0, 1, 2, n_ana]),   # last missing
        "found": np.array([True, True, True, False]),
    }
    dis = {
        "features": rng.standard_normal((n_ana, feat)).astype(np.float32),
        "classes": np.array([1, 22, 0, 22]),      # 22 = disease sentinel
    }
    return ana, dis


def test_combine_pair_layout():
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    assert rec["image_features"].shape == (8, 8)
    assert rec["image_bb"].shape == (8, 4)
    # disease rows share anatomy boxes (combine via match_bbx contract)
    np.testing.assert_array_equal(rec["image_bb"][4:], rec["image_bb"][:4])
    assert rec["image_adj_matrix"].shape == (12, 12)
    assert rec["semantic_adj_matrix"].shape == (12, 12)
    labels = rec["bbox_label"]
    # anatomy classes as-is, missing -> global sentinel
    assert labels[:4].tolist() == [0, 1, 2, K.NUM_CLASSES]
    # disease ids offset by the 27 anatomy entries, sentinel stays
    assert labels[4].tolist() == 27 + 1
    assert labels[5] == K.NUM_CLASSES
    # semantic edges only touch valid classes
    sem = rec["semantic_adj_matrix"]
    assert (sem[3, :] == 0).all() and (sem[:, 3] == 0).all()


def test_h5_writer_roundtrip(tmp_path):
    from ekaid_tpu.data.pipeline import H5FeatureStore
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12)
    w.append([rec, rec])
    w.close()
    store = H5FeatureStore(path)
    assert len(store) == 2
    got = store.get(1)
    np.testing.assert_allclose(got["feats"], rec["image_features"],
                               rtol=1e-6)
    np.testing.assert_array_equal(got["adj"], rec["image_adj_matrix"])


def _fake_applies(n_ana=4, feat=8, R=6):
    """Deterministic stand-in detector fns honoring the Extractor
    contract (batch-leading dicts), varying with the input images."""
    ana0, _ = make_extraction(n_ana, feat)
    rng = np.random.default_rng(7)
    dboxes = np.abs(rng.standard_normal((R, 4))).astype(np.float32) * 100
    dboxes[:, 2:] += dboxes[:, :2] + 10
    dfeat = rng.standard_normal((R, feat)).astype(np.float32)
    dcls = rng.integers(0, 22, R)

    def per_sample_scale(images):
        return 1.0 + images.reshape(images.shape[0], -1)[:, :1] * 0.01

    def ana_apply(images):
        s = per_sample_scale(images)                       # [B, 1]
        B = images.shape[0]
        return {
            "features": ana0["features"][None] * s[:, :, None],
            "boxes": np.tile(ana0["boxes"], (B, 1, 1)),
            "classes": np.tile(ana0["classes"], (B, 1)),
            "found": np.tile(ana0["found"], (B, 1)),
        }

    def dis_apply(images):
        s = per_sample_scale(images)
        B = images.shape[0]
        return {
            "boxes": np.tile(dboxes, (B, 1, 1)),
            "features": dfeat[None] * s[:, :, None],
            "classes": np.tile(dcls, (B, 1)),
            "valid": np.ones((B, dcls.shape[0]), bool),
        }

    return ana_apply, dis_apply


def test_extractor_pipelined_run_matches_serial(tmp_path):
    """run()'s one-deep dispatch pipeline must produce bit-identical
    output to the serial process_batch loop."""
    from ekaid_tpu.extract.pipeline import Extractor
    import h5py
    ana_apply, dis_apply = _fake_applies()
    batches = [np.full((2, 4, 4, 3), i, np.float32) for i in range(3)]

    ex = Extractor(ana_apply, dis_apply, num_disease_classes=22)
    p1 = str(tmp_path / "pipelined.hdf5")
    w1 = H5Writer(p1, num_nodes=8, feat_dim=8, adj_pad=100)
    n = ex.run(iter(batches), w1, log_every=2)
    assert n == 6

    p2 = str(tmp_path / "serial.hdf5")
    w2 = H5Writer(p2, num_nodes=8, feat_dim=8, adj_pad=100)
    for b in batches:
        w2.append(ex.process_batch(b))
    w2.close()

    with h5py.File(p1) as f1, h5py.File(p2) as f2:
        for k in f1.keys():
            np.testing.assert_array_equal(f1[k][:], f2[k][:])


def test_h5_writer_resume_appends(tmp_path):
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12)
    w.append([rec, rec])
    w.close()
    # resume: existing rows kept, n continues from them
    w2 = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12, mode="a")
    assert w2.n == 2
    w2.append([rec])
    w2.close()
    import h5py
    with h5py.File(path, "r") as f:
        assert f["image_features"].shape[0] == 3
        np.testing.assert_allclose(f["image_features"][2],
                                   rec["image_features"], rtol=1e-6)


def test_h5_writer_resume_repairs_crash(tmp_path):
    """A crash mid-append leaves datasets at unequal lengths; resume
    truncates all to the shortest consistent prefix."""
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12)
    w.append([rec, rec, rec])
    # simulate the torn write: one dataset grew past the others
    w.sets["image_bb"].resize(5, axis=0)
    w.close()
    w2 = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12, mode="a")
    assert w2.n == 3
    w2.close()
    import h5py
    with h5py.File(path, "r") as f:
        assert all(f[k].shape[0] == 3 for k in f.keys())


def test_h5_writer_resume_detects_torn_last_dataset(tmp_path):
    """A crash torn INSIDE the final dataset's write leaves all five
    datasets at the new length but committed_rows at the previous
    commit; resume must truncate back to the commit point."""
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12)
    w.append([rec, rec, rec])
    # simulate: every dataset resized+written for 2 more rows but the
    # commit attribute never updated (crash before the commit line)
    for ds in w.sets.values():
        ds.resize(5, axis=0)
    w._h5.attrs["committed_rows"] = 3
    w._h5.close()
    w2 = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12, mode="a")
    assert w2.n == 3
    assert all(ds.shape[0] == 3 for ds in w2.sets.values())
    w2.close()


def test_h5_writer_truncate_on_close(tmp_path):
    """expected_rows trims tail-batch zero-pad records at close."""
    import h5py
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12)
    w.append([rec, rec, rec, rec])    # 3 real + 1 pad
    w.expected_rows = 3
    w.close()
    with h5py.File(path) as f:
        assert all(f[k].shape[0] == 3 for k in f.keys())
        assert f.attrs["committed_rows"] == 3


def test_h5_writer_resume_rejects_run_meta_mismatch(tmp_path):
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12,
                 run_meta={"shard": "0/3", "image_dir": "/a"})
    w.append([rec])
    w.close()
    import pytest
    with pytest.raises(ValueError, match="run mismatch"):
        H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12, mode="a",
                 run_meta={"shard": "1/3", "image_dir": "/a"})
    # identical meta resumes fine
    w2 = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12, mode="a",
                  run_meta={"shard": "0/3", "image_dir": "/a"})
    assert w2.n == 1
    w2.close()


def test_h5_writer_resume_rejects_mismatch(tmp_path):
    ana, dis = make_extraction()
    organ, co, isd = K.semantic_tables()
    rec = combine_pair(ana, dis, organ, co, isd, adj_pad=12)
    path = str(tmp_path / "cmb.hdf5")
    w = H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12)
    w.append([rec])
    w.close()
    import pytest
    with pytest.raises(ValueError, match="geometry mismatch"):
        H5Writer(path, num_nodes=16, feat_dim=8, adj_pad=12, mode="a")
    with pytest.raises(ValueError, match="geometry mismatch"):
        H5Writer(path, num_nodes=8, feat_dim=8, adj_pad=12, mode="a",
                 feat_dtype="float16")


def test_average_precision_perfect():
    ap = average_precision([0.9, 0.8], [True, True], num_gt=2)
    assert abs(ap - 1.0) < 1e-6


def test_average_precision_half():
    # 1 TP then 1 FP over 2 gt: recall reaches 0.5 at precision 1
    ap = average_precision([0.9, 0.8], [True, False], num_gt=2)
    assert 0.45 < ap < 0.55


def test_detection_evaluator_end_to_end():
    ev = DetectionEvaluator(num_classes=2)
    gt_b = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    gt_c = np.array([0, 1])
    gt_v = np.array([True, True])
    # perfect predictions
    ev.add_image(gt_b, gt_c, np.array([0.9, 0.8]), np.array([True, True]),
                 gt_b, gt_c, gt_v)
    s = ev.summarize()
    assert abs(s["AP50"] - 1.0) < 1e-6
    assert abs(s["AR"] - 1.0) < 1e-6
    # off predictions
    ev2 = DetectionEvaluator(num_classes=2)
    off = gt_b + 200.0
    ev2.add_image(off, gt_c, np.array([0.9, 0.8]),
                  np.array([True, True]), gt_b, gt_c, gt_v)
    assert ev2.summarize()["AP50"] == 0.0


def test_build_detector_fns_honors_norm_config(monkeypatch):
    """Converted Detectron2 checkpoints need frozen_bn+stride_in_1x1 at
    model-construction time; GN would silently mis-apply them (both
    norms carry same-named scale/bias params). The runner must pass the
    config's norm fields through to FasterRCNN."""
    from ekaid_tpu.config import default_config
    from ekaid_tpu.extract import runner

    seen = []

    class FakeRCNN:
        def __init__(self, det, num_classes, norm="gn",
                     stride_in_1x1=False, policy=None):
            seen.append((norm, stride_in_1x1))

        def init(self, *a, **k):
            return {}

        def apply(self, *a, **k):          # never called here
            raise AssertionError

    monkeypatch.setattr(runner, "FasterRCNN", FakeRCNN)
    cfg = default_config()
    cfg = cfg.replace(detector=cfg.detector.replace(
        norm="frozen_bn", stride_in_1x1=True, image_size=64))
    runner.build_detector_fns(cfg)
    assert seen == [("frozen_bn", True), ("frozen_bn", True)]


def test_runner_on_device_preprocess_matches_helper():
    """uint8 batches + preprocess='detectron2' must reproduce
    torch_convert.detectron2_preprocess exactly (on-device caffe-BGR
    mean-sub for converted checkpoints), and uint8 must equal the f32
    path under 'unit'."""
    import jax
    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.extract import runner
    from ekaid_tpu.tools.torch_convert import detectron2_preprocess

    cfg = default_config()
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    f01 = u8.astype(np.float32) / 255.0

    class FakeRCNN:
        def __init__(self, det, num_classes, norm="gn",
                     stride_in_1x1=False, policy=None):
            self.k = num_classes

        def init(self, *a, **k):
            return {}

        def apply(self, params, images, method=None, **kw):
            return {"images": images}        # echo back, jit-safe

    import unittest.mock as mock
    for pre in ["unit", "detectron2"]:
        c = cfg.replace(detector=cfg.detector.replace(
            image_size=8, preprocess=pre))
        with mock.patch.object(runner, "FasterRCNN", FakeRCNN):
            ana_apply, _ = runner.build_detector_fns(c)
        got_u8 = np.asarray(ana_apply(jnp.asarray(u8))["images"])
        got_f = np.asarray(ana_apply(jnp.asarray(f01))["images"])
        np.testing.assert_allclose(got_u8, got_f, rtol=1e-5, atol=1e-5)
        if pre == "detectron2":
            want = detectron2_preprocess(f01)
            np.testing.assert_allclose(got_u8, want, rtol=1e-4,
                                       atol=1e-3)
        else:
            np.testing.assert_allclose(got_u8, f01, rtol=1e-6,
                                       atol=1e-6)


def test_png_batches_parallel_matches_sequential(tmp_path):
    """The threaded decode window must preserve sorted file order and
    the static-shape tail padding exactly (runner.py::png_batches)."""
    import numpy as np
    from PIL import Image
    from ekaid_tpu.extract.runner import png_batches

    rng = np.random.default_rng(0)
    for i in range(11):
        arr = rng.integers(0, 255, (32, 32), dtype=np.uint8)
        Image.fromarray(arr, "L").save(tmp_path / f"im{i:02d}.png")

    for bs in (4, 11):
        seq = list(png_batches(str(tmp_path), 32, bs, workers=1))
        par = list(png_batches(str(tmp_path), 32, bs, workers=4,
                               prefetch=2))
        assert len(seq) == len(par)
        for a, b in zip(seq, par):
            assert a.dtype == np.uint8 and a.shape == (bs, 32, 32, 3)
            np.testing.assert_array_equal(a, b)
        if bs == 4:
            # 11 % 4 = 3 -> final batch carries one zero-pad row
            assert (seq[-1][-1] == 0).all() and (par[-1][-1] == 0).all()


def test_png_batches_sharding_partitions(tmp_path):
    """--shard K/N: the N shards together cover every file exactly once
    (stable striding over the sorted list), and compose with skip."""
    import numpy as np
    from PIL import Image
    from ekaid_tpu.extract.runner import png_batches

    rng = np.random.default_rng(1)
    for i in range(10):
        arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
        Image.fromarray(arr, "L").save(tmp_path / f"im{i:02d}.png")

    full = np.concatenate(
        list(png_batches(str(tmp_path), 16, 1, workers=1)))
    parts = [np.concatenate(list(png_batches(str(tmp_path), 16, 1,
                                             workers=1, shard=(k, 3))))
             for k in range(3)]
    assert sum(p.shape[0] for p in parts) == 10
    np.testing.assert_array_equal(
        np.sort(np.concatenate(parts).reshape(10, -1), axis=0),
        np.sort(full.reshape(10, -1), axis=0))
    # shard 0 of 3 strides 0,3,6,9; skip=1 drops file 0
    got = np.concatenate(list(png_batches(str(tmp_path), 16, 1,
                                          workers=1, shard=(0, 3),
                                          skip=1)))
    np.testing.assert_array_equal(got, parts[0][1:])


def test_iou_matrix_matches_scalar():
    """iou_plus_one_matrix must reproduce the scalar reference formula
    (f64, as the reference's get_iou computes on Python floats) for
    every pair, including degenerate zero-union boxes."""
    import numpy as np
    from ekaid_tpu.extract.pipeline import (iou_plus_one,
                                            iou_plus_one_matrix)

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 500, (17, 4))
    b = rng.uniform(0, 500, (13, 4))
    a = np.concatenate([np.minimum(a[:, :2], a[:, 2:]),
                        np.maximum(a[:, :2], a[:, 2:])], 1)
    b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]),
                        np.maximum(b[:, :2], b[:, 2:])], 1)
    m = iou_plus_one_matrix(a, b)
    for i in range(len(a)):
        for j in range(len(b)):
            want = iou_plus_one([float(x) for x in a[i]],
                                [float(x) for x in b[j]])
            assert m[i, j] == want, (i, j)
