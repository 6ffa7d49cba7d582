"""Host-side evaluation: caption metrics and score analysis."""

from ekaid_tpu.metrics.caption import (  # noqa: F401
    bleu, cider, meteor15, meteor_lite, rouge_l, ptb_tokenize)
from ekaid_tpu.metrics.coco import CocoCaptions, CaptionEvaluator  # noqa: F401
