"""JAX Faster R-CNN R50-FPN: the TPU-native detector/extraction path.

Replaces the reference's Detectron2 pipelines (train_anatomy.py:561-586
config: COCO faster_rcnn_R_50_FPN_3x; hooked batch-1 inference in
ana_bbox_generator.py / bbox_generator_by_location.py) with a single
batched, jit-compiled program.
"""

from ekaid_tpu.models.detector.backbone import ResNetFPN  # noqa: F401
from ekaid_tpu.models.detector.faster_rcnn import FasterRCNN  # noqa: F401
