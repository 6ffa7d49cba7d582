"""Detection-annotation loaders: Chest ImaGenome gold + VinDr-CXR CSVs.

Parity targets:
  * get_mimic_ana_gold_dicts (train_anatomy.py:257-345): the gold 1000-
    image CSV with columns image_id (with extension), bbox_name,
    original_x1/y1/x2/y2, coordinates rescaled to the 1024² PNGs by the
    original image shape; 26 anatomy classes from get_kg2 order.
  * get_vindr_dicts (train_vindr.py:65-130): annotations_<split>.csv with
    image_id, class_name, x_min/y_min/x_max/y_max (empty for
    'No finding' rows), rescaled to 1024²; 22 disease classes.

Output is the padded-array contract used by DetectorTrainer:
(file_names, boxes [N, G, 4], classes [N, G], valid [N, G]).
Rows with malformed coordinates (x1 > x2 etc.) are dropped, as the
reference does (train_anatomy.py:320-322).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ekaid_tpu.data.knowledge import ANATOMY_CLASSES, DISEASE_CLASSES

# the 26 detector classes exclude the KG's stray 'edema' entry
ANATOMY_DETECTOR_CLASSES = [c for c in ANATOMY_CLASSES if c != "edema"]


def _pack(records: Dict[str, List[Tuple[List[float], int]]],
          max_gt: int):
    names = sorted(records)
    n = len(names)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    classes = np.zeros((n, max_gt), np.int32)
    valid = np.zeros((n, max_gt), bool)
    for i, name in enumerate(names):
        for j, (bb, cls) in enumerate(records[name][:max_gt]):
            boxes[i, j] = bb
            classes[i, j] = cls
            valid[i, j] = True
    return names, boxes, classes, valid


def _scale_box(x1, y1, x2, y2, w, h, size):
    sx, sy = size / float(w), size / float(h)
    return [float(x1) * sx, float(y1) * sy, float(x2) * sx,
            float(y2) * sy]


def load_imagenome_gold(csv_path: str,
                        shapes: Optional[Dict[str, Tuple[int, int]]] = None,
                        image_size: int = 1024, max_gt: int = 32):
    """Gold anatomy annotations. `shapes`: image_id -> (width, height)
    originals (mimic_shape_full equivalent); identity scaling if None."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    label2id = {c: i for i, c in enumerate(ANATOMY_DETECTOR_CLASSES)}
    recs: Dict[str, List] = {}
    for row in df.itertuples(index=False):
        image_id = os.path.splitext(str(row.image_id))[0]
        name = str(row.bbox_name).lower()
        if name not in label2id:
            continue
        x1 = getattr(row, "original_x1", None)
        if x1 is None or (isinstance(x1, float) and np.isnan(x1)):
            continue
        w, h = (shapes or {}).get(image_id, (image_size, image_size))
        bb = _scale_box(row.original_x1, row.original_y1,
                        row.original_x2, row.original_y2, w, h,
                        image_size)
        if bb[0] > bb[2] or bb[1] > bb[3]:
            continue                      # train_anatomy.py:320-322
        recs.setdefault(image_id, []).append((bb, label2id[name]))
    return _pack(recs, max_gt)


def load_vindr(csv_path: str,
               shapes: Optional[Dict[str, Tuple[int, int]]] = None,
               image_size: int = 1024, max_gt: int = 32):
    """VinDr-CXR annotations; 'No finding' rows (empty x_min) skipped."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    label2id = {c: i for i, c in enumerate(DISEASE_CLASSES)}
    recs: Dict[str, List] = {}
    for row in df.itertuples(index=False):
        image_id = str(row.image_id)
        name = str(row.class_name).lower()
        if name not in label2id:
            continue
        if row.x_min is None or (isinstance(row.x_min, float)
                                 and np.isnan(row.x_min)):
            continue
        w, h = (shapes or {}).get(image_id, (image_size, image_size))
        bb = _scale_box(row.x_min, row.y_min, row.x_max, row.y_max, w, h,
                        image_size)
        if bb[0] > bb[2] or bb[1] > bb[3]:
            continue
        recs.setdefault(image_id, []).append((bb, label2id[name]))
    return _pack(recs, max_gt)


class ImageBoxDataset:
    """On-the-fly PNG loader over packed annotations (for
    DetectorTrainer.fit via `arrays_from`)."""

    def __init__(self, names, boxes, classes, valid, image_dir: str,
                 image_size: int):
        self.names = names
        self.boxes = boxes
        self.classes = classes
        self.valid = valid
        self.image_dir = image_dir
        self.image_size = image_size

    def load_images(self, idxs) -> np.ndarray:
        from PIL import Image
        out = []
        for i in idxs:
            p = os.path.join(self.image_dir, self.names[i] + ".png")
            img = Image.open(p).convert("RGB")
            if img.size != (self.image_size, self.image_size):
                img = img.resize((self.image_size, self.image_size))
            out.append(np.asarray(img, np.float32) / 255.0)
        return np.stack(out)

    def materialize(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
        """Load every image into RAM (fine for the 1000-image gold set)."""
        imgs = self.load_images(range(len(self.names)))
        return imgs, self.boxes, self.classes, self.valid
