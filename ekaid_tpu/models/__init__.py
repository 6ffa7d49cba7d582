"""flax model modules for the difference-VQA stack."""

from ekaid_tpu.models.change_detector import ChangeDetector  # noqa: F401
from ekaid_tpu.models.decoder import DynamicSpeaker  # noqa: F401
from ekaid_tpu.models.ekaid import EkaidModel  # noqa: F401
