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
