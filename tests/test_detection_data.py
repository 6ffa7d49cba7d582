"""Detection-annotation loader tests (fabricated CSVs)."""

import numpy as np
import pandas as pd

from ekaid_tpu.data.detection import (ANATOMY_DETECTOR_CLASSES,
                                      load_imagenome_gold, load_vindr)


def test_anatomy_detector_classes():
    assert len(ANATOMY_DETECTOR_CLASSES) == 26
    assert "edema" not in ANATOMY_DETECTOR_CLASSES


def test_load_imagenome_gold(tmp_path):
    df = pd.DataFrame({
        "image_id": ["a.dcm", "a.dcm", "b.dcm", "b.dcm"],
        "bbox_name": ["right lung", "left lung", "trachea", "bogus"],
        "original_x1": [10, 20, 30, 1],
        "original_y1": [10, 20, 30, 1],
        "original_x2": [100, 200, 300, 2],
        "original_y2": [100, 200, 300, 2],
    })
    p = tmp_path / "gold.csv"
    df.to_csv(p, index=False)
    names, boxes, classes, valid = load_imagenome_gold(
        str(p), shapes={"a": (2048, 2048)}, image_size=1024, max_gt=4)
    assert names == ["a", "b"]
    # image a scaled by 1024/2048 = 0.5
    np.testing.assert_allclose(boxes[0, 0], [5, 5, 50, 50])
    assert classes[0, 0] == ANATOMY_DETECTOR_CLASSES.index("right lung")
    # bogus class dropped
    assert valid[1].sum() == 1


def test_load_vindr(tmp_path):
    df = pd.DataFrame({
        "image_id": ["x", "x", "y"],
        "class_name": ["Cardiomegaly", "No finding", "Pleural effusion"],
        "x_min": [100.0, np.nan, 50.0],
        "y_min": [100.0, np.nan, 50.0],
        "x_max": [400.0, np.nan, 300.0],
        "y_max": [400.0, np.nan, 300.0],
    })
    p = tmp_path / "vindr.csv"
    df.to_csv(p, index=False)
    names, boxes, classes, valid = load_vindr(str(p), max_gt=4)
    assert names == ["x", "y"]
    assert valid[0].sum() == 1          # No finding row skipped
    from ekaid_tpu.data.knowledge import DISEASE_CLASSES
    assert classes[0, 0] == DISEASE_CLASSES.index("cardiomegaly")


def test_load_imagenome_silver(tmp_path):
    """Silver scene-graph JSONs: boxes in the 224-pad frame map back to
    originals (train_anatomy.py:105-134 oracle) then to 1024²."""
    import json

    from ekaid_tpu.data.detection import load_imagenome_silver

    # original image 2000h x 1500w: ratio 224/2000 = 0.112,
    # new = (224, 168), pad left = (224-168)//2 = 28, top = 0
    sg = {"image_id": "img1",
          "objects": [
              {"name": "right lung", "x1": 50, "y1": 30, "x2": 120,
               "y2": 100},
              {"name": "not a class", "x1": 1, "y1": 1, "x2": 2,
               "y2": 2},
          ]}
    (tmp_path / "img1_SceneGraph.json").write_text(json.dumps(sg))
    # an image with no known shape is skipped (reference :188-191)
    sg2 = {"image_id": "mystery", "objects": []}
    (tmp_path / "mystery_SceneGraph.json").write_text(json.dumps(sg2))

    names, boxes, classes, valid = load_imagenome_silver(
        str(tmp_path), shapes={"img1": (2000, 1500)}, image_size=1024,
        max_gt=4)
    assert names == ["img1"]
    assert valid[0].sum() == 1          # unknown class dropped

    # oracle: undo pad+resize with int() truncation, then scale to 1024
    ratio = 224.0 / 2000
    left, top = 28, 0
    ox1 = int((50 - left) / ratio)
    ox2 = int((120 - left) / ratio)
    oy1 = int((30 - top) / ratio)
    oy2 = int((100 - top) / ratio)
    want = [ox1 * 1024 / 1500, oy1 * 1024 / 2000,
            ox2 * 1024 / 1500, oy2 * 1024 / 2000]
    np.testing.assert_allclose(boxes[0, 0], want, rtol=1e-6)
    assert classes[0, 0] == ANATOMY_DETECTOR_CLASSES.index("right lung")


def test_load_shapes_both_layouts(tmp_path):
    import pickle

    from ekaid_tpu.data.detection import load_shapes

    ours = [{"image": "a", "shape": (100, 200)}]
    ref = [{"image": "b", "height": 300, "width": 400}]
    p1, p2 = tmp_path / "ours.pkl", tmp_path / "ref.pkl"
    p1.write_bytes(pickle.dumps(ours))
    p2.write_bytes(pickle.dumps(ref))
    assert load_shapes(str(p1)) == {"a": (100, 200)}
    assert load_shapes(str(p2)) == {"b": (300, 400)}
