"""ekaid_tpu — a TPU-native difference-VQA framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Holipori/EKAID
(KDD 2023): chest-X-ray difference-aware medical VQA over MIMIC-Diff-VQA.

Layout (mirrors SURVEY.md §7's build plan):
  config     — two-tier strict config system (defaults + YAML overlay)
  ops        — pure jnp/Pallas compute ops: graph construction, position
               embeddings, RNN cells, NMS, ROIAlign
  models     — flax modules: question encoder, relation-aware GAT,
               change detector, scan-based answer decoder, Faster R-CNN
  parallel   — mesh/sharding utilities and the pjit train/eval steps
  data       — padded tensor schema, preprocessing, host pipeline
  train      — training/eval drivers (train_mimic.py / test_mimic.py parity)
  metrics    — host-side caption metrics (BLEU/ROUGE-L/CIDEr) and score
               analysis (evaluate_score.py parity)
  serving    — jitted inference server (demo_server.py parity)
  native     — C++ host-side accelerators (graph builder, data packing)
"""

__version__ = "0.1.0"

from ekaid_tpu.config import Config, default_config, load_config  # noqa: F401
