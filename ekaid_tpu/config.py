"""Two-tier config system: dataclass defaults + strict YAML overlay.

Re-designs the reference's global-AttrDict config (reference:
model/configs/config.py:7-157 defaults, merge_cfg_from_file at :165,
strict-keyed merge at :197-223, literal_eval coercion at :226-284) as
immutable nested dataclasses. Unknown YAML keys raise, types are coerced
the same way (numbers/strings/lists), and the resolved config serializes
to JSON for the run directory (parity with train_mimic.py:93-94).

TPU-native additions (no reference equivalent): a `mesh` section for
device-mesh axes (data/model parallelism), and a `dtypes` section for the
bf16/f32 policy — the reference hard-codes float32/float64
(rcc_dataset_pos_mimic.py:180-185).
"""

from __future__ import annotations

import dataclasses
import json
from ast import literal_eval
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import yaml


def _frozen(cls):
    cls = dataclass(frozen=True)(cls)
    if not hasattr(cls, "replace"):
        cls.replace = lambda self, **kw: dataclasses.replace(self, **kw)
    return cls


@_frozen
class ChangeDetectorConfig:
    """Graph change-encoder knobs (reference yaml:6-17, config.py:44-58)."""

    input_dim: int = 2052
    dim: int = 128               # pooled-attention embed dim
    feat_dim: int = 1026         # raw node feature dim + 2 (reference slices -2)
    att_dim: int = 1024          # node feature dim after projection
    att_head: int = 4
    nongt_dim: int = 52          # attention width over the node axis
    spa_label_num: int = 11
    sem_label_num: int = 3
    dir_num: int = 2
    pos_emb_dim: int = 64
    coef_sem: float = 0.333
    coef_spa: float = 0.333
    # How the three relation branches combine.
    #  'sequential' — faithful to the reference as *executed*: the in-place
    #    `exp_v += exp_v_rel` (relation_encoder.py:129,81) aliases the input,
    #    so semantic→spatial→implicit run as cumulative residuals and the
    #    coef mix (modules.py:233-235) is an identity. Verified empirically.
    #  'parallel' — what the reference code *appears* to intend: three
    #    independent branches mixed with coef_sem/coef_spa.
    branch_mix: str = "sequential"
    # GAT direction reduction.
    #  'reference' — faithful to graph_att.py:95-102 where `output` is
    #    overwritten per direction and then doubled: the final output is
    #    2 * dir-1(transposed-adjacency) attention; dir-0 never contributes.
    #  'sum' — self + both directions summed (the commented intent).
    dir_reduce: str = "reference"
    # Run the bef/aft images through the relation-encoder stack as ONE
    # [2B, …] batch instead of two sequential [B, …] passes (the
    # encoders share weights — reference call stack modules.py:216-232
    # runs them twice). Halves the per-step GAT program count; the
    # small [B,52,52,H] attention fusions are launch/VPU-bound so the
    # doubled batch amortizes their fixed cost. Eval outputs are
    # bit-identical (per-sample math is batch-row independent); train
    # differs only in the dropout mask draw (same distribution) —
    # tests/test_model.py pins both.
    #   'off'   — two sequential [B] passes everywhere (reference shape)
    #   'on'    — one [2B] pass everywhere
    #   'train' — [2B] pass under train=True only
    # Measured verdict (r5): FLAT everywhere that matters — the r5b
    # "+108% at b128+bkt48" row was a slope-fit glitch (short-chain
    # congestion; the v2 same-window re-run reads base 2,840.6 vs pair
    # 2,759.3 pairs/s, and the timing harness now rejects that fit
    # shape — bench._slope_time). Decode b64 read +12% pre-hardening
    # and is unconfirmed. Default 'off'; the knob stays as the
    # recorded experiment with its equivalence tests.
    # bool True/False (legacy) = 'on'/'off'.
    pair_batch: str = "off"


@_frozen
class SpeakerConfig:
    """Answer-decoder knobs (reference yaml:18-23, config.py:66-86)."""

    input_dim: int = 1024        # == change_detector.att_dim
    rnn_size: int = 512
    embed_input_dim: int = 3072  # 3 * input_dim (bef, diff, aft)
    embed_dim: int = 1024
    drop_prob_lm: float = 0.5
    word_embed_size: int = 300
    vocab_size: int = 148        # len(vocab)+1; overridden from data at build
    seq_length: int = 90
    pos_classes: int = 16        # POS head width (dynamic_speaker_change_pos.py:74)
    decoding_constraint: int = 0  # _sample default cfg.get('decoding_contraint',0)
    beam_size: int = 1
    # Diverse beam search (CaptionModel.py:106-108 defaults): beams are
    # split into `group_size` groups of beam_size//group_size; group g's
    # logits are penalized by diversity_lambda per occurrence of each
    # token earlier groups picked at the same local step.
    group_size: int = 1
    diversity_lambda: float = 0.5
    temperature: float = 1.0
    # lax.scan unroll factor for the decode loops (TPU knob: >1 lets
    # XLA overlap weight fetches across steps at the cost of program
    # size / compile time on the remote-compile service; outputs are
    # identical for any value)
    scan_unroll: int = 1
    # fuse the independent per-step matmuls (module-LSTM gates, pos1,
    # lang-LSTM h/x partials) into one wide matmul during free-running
    # decode — fewer, larger MXU dispatches per step at the cost of
    # multiplying by zero blocks. Same params, same math up to f32
    # summation order. Eval-only; ignored under init/teacher forcing.
    fused_core: bool = False
    # stream the large DynamicCore kernels as per-channel int8 during
    # free-running decode (halves the dominant HBM weight traffic of
    # the 90-step scan; ~0.4% per-weight rounding — models/quant.py).
    # Eval-only, like fused_core. 'none' | 'int8'.
    weight_quant: str = "none"
    # run the WHOLE greedy decode loop as one Pallas kernel (weights
    # VMEM-resident, states in registers, in-kernel early exit) instead
    # of the XLA lax.while_loop — attacks the per-step scheduling
    # latency the scan can't hide (models/pallas_decode.py). Eval-only,
    # greedy only. 'auto' (pallas on TPU, xla elsewhere — resolved at
    # build time by utils/platform.resolve_decode_kernel; unresolved
    # 'auto' IS the xla path) | 'xla' | 'pallas' | 'pallas_interpret'
    # (CPU debug). On-chip verdict (r4): hardware-proven token-exact at
    # pinned-f32; b64 10,689 / b128 13,876 pairs/s vs XLA's same-day
    # 10.0-10.6k / 13.0-13.3k.
    decode_kernel: str = "auto"
    # rematerialization policy for the teacher-forcing scan body during
    # TRAINING: 'none' stores every step's activations for the backward
    # (XLA default), 'dots' (jax.checkpoint_policies.checkpoint_dots)
    # keeps matmul outputs and recomputes the cheap elementwise tail,
    # 'full' recomputes the whole step. Trades HBM activation traffic
    # for recompute FLOPs; outputs/grads are bitwise-identical choices
    # of schedule only. A/B'd in scripts/bench_train.py --remat.
    remat: str = "none"
    # hoist the teacher-forcing scan's input-side matmuls (the
    # loop-invariant fused @ mod.w_ih[:E] and all T word-embedding
    # projections xt @ lang.w_ih[:W]) out of the scan: two fewer serial
    # per-step matmuls and their weight-grad accumulators leave the
    # 90-step backward carry. Same params, same math up to summation
    # order (decoder.teacher_forcing). No effect on scheduled-sampling
    # batches (inputs become output-dependent) or free-running decode.
    train_hoist: bool = False
    # BOS token fed at step 0 of free-running decode. The reference primes
    # with index 2 (dynamic_speaker_change_pos.py:272,311) even though the
    # shipped vocab maps '<start>'->1; kept for parity.
    bos_token: int = 2


@_frozen
class QuestionConfig:
    """Question-encoder knobs (WordEmbedding/GRU/self-att, language_model.py)."""

    max_len: int = 20
    word_emb_dim: int = 300      # doubled by the dual-embedding 'c' op
    hidden_dim: int = 1024       # == speaker.embed_dim in the shipped config
    dropout_word: float = 0.0
    dropout_att: float = 0.2
    # The reference's QuestionSelfAttention softmaxes over the *batch* axis
    # of a transposed score matrix and reshapes across batch rows
    # (language_model.py:149) — an upstream VQA_ReGAT bug that scrambles
    # attention across unrelated samples (verified empirically; at batch=1
    # every weight degenerates to 1.0). That is not reproducible under data
    # parallelism (it leaks across devices), so this rebuild implements the
    # intended per-sample softmax over tokens by default. Documented
    # deviation; 'reference' reproduces the transposed-softmax scramble
    # bit-for-bit (single-device only — used to validate converted
    # reference checkpoints end-to-end, tests/test_full_convert.py).
    att_mode: str = "fixed"      # fixed | reference


@_frozen
class SplitDataConfig:
    batch_size: int = 64
    seq_per_img: int = 1
    max_samples: Optional[int] = None
    empty_image: bool = False


@_frozen
class DataConfig:
    dataset: str = "mimic_diff_vqa"
    num_nodes: int = 52          # 26 anatomy + 26 disease, padded fixed
    node_one_num: int = 26
    feature_dim: int = 1024
    adj_pad: int = 100           # stored adjacency is 100x100, sliced live
    vocab_json: str = "data/vocab_mimic_VQA.json"
    splits_json: str = "data/splits_mimic_VQA.json"
    h5_label_file: str = "data/VQA_mimic_dataset.h5"
    feature_h5: str = "data/cmb_bbox_di_feats.hdf5"
    gt_captions: str = "data/mimic_gt_captions_%s.json"
    feature_mode: str = "both"   # both | single_ana | single_loc
    num_workers: int = -1        # loader threads; -1 = min(4, cpu_count)
                                 # (reference pins 0, yaml:30; we prefetch)
    prefetch: int = 2
    # eval/decode host->device wire dtypes: "compact" ships features as
    # f16 and adjacency labels as int8 (2.3x fewer bytes — see
    # data/pipeline.py compact_wire); the decode loop is transfer-bound
    # on any host. "f32" is the reference-parity wide wire. Training
    # batches always ship full-width. On-chip A/B (r4b queue, e2e):
    # 165.4 vs 87.5 pairs/s end-to-end (+89%) — default compact.
    eval_wire: str = "compact"
    # Device-resident per-image feature cache for the eval decode loop
    # (data/device_cache.py): >0 = cache that many images on-device and
    # ship only miss rows + question tokens per batch. MIMIC-Diff-VQA
    # asks ~4.3 questions per study pair, so the steady-state wire
    # traffic drops ~4x on top of the compact wire. Tokens are
    # bit-identical to the compact-wire path (tested). Single-device,
    # greedy-decode eval only (Trainer.evaluate gates it); 1024 slots
    # hold ~115 MB of HBM at flagship dims. 0 disables.
    eval_device_cache: int = 1024
    train: SplitDataConfig = field(default_factory=SplitDataConfig)
    val: SplitDataConfig = field(
        default_factory=lambda: SplitDataConfig(batch_size=64))
    test: SplitDataConfig = field(
        default_factory=lambda: SplitDataConfig(batch_size=64))


@_frozen
class OptimConfig:
    """reference yaml:42-47 + utils/utils.py:82-101."""

    type: str = "adam"
    lr: float = 1e-4
    alpha: float = 0.9           # Adam beta1 (torch betas=(alpha, beta))
    beta: float = 0.999
    epsilon: float = 1e-8
    weight_decay: float = 0.0
    step_size: int = 15          # epochs per lr decay step
    gamma: float = 0.1
    grad_clip: float = 0.0       # 0 = off (reference clip_gradient unused)


@_frozen
class TrainConfig:
    max_iter: int = 40000
    max_epoch: int = 20
    snapshot_interval: int = 2000
    log_interval: int = 50
    scheduled_sampling_start: int = -1   # epoch; <0 disables (reference: 1e6)
    scheduled_sampling_increase_every: int = 5
    scheduled_sampling_increase_prob: float = 0.05
    scheduled_sampling_max_prob: float = 0.25
    graph: str = "all"           # all | semantic | spatial | implicit | i+s
    setting: str = "mode2"
    att_reg_weight: float = 2.5e-3   # train_mimic.py:247
    # module-attention entropy bonus (-w * EntropyLoss; the reference
    # defines the criterion and a --entropy_weight flag but the term is
    # commented out at train_mimic.py:244 — 0 reproduces that).
    entropy_weight: float = 0.0
    # answer-length buckets (scan lengths) for the teacher-forcing
    # step; () = always full seq_length (reference behavior). See
    # data/pipeline.py::trim_batch_to_bucket.
    length_buckets: Tuple[int, ...] = ()
    # gradient accumulation: split each batch into this many
    # microbatches scanned inside the step, one optimizer update —
    # peak activation memory drops by the factor (effective batches
    # past the HBM ceiling). Loss/grads equal the full-batch step
    # exactly (train/step.py); only dropout mask draws differ.
    accum_steps: int = 1
    seed: int = 1238
    optim: OptimConfig = field(default_factory=OptimConfig)


@_frozen
class MeshConfig:
    """Device-mesh layout (TPU-native; no reference equivalent — the
    reference is single-GPU, SURVEY.md §2.4)."""

    data: int = -1               # -1: all remaining devices
    model: int = 1               # tensor-parallel width for wide matmuls
    axis_names: Tuple[str, str] = ("data", "model")


@_frozen
class DtypeConfig:
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    softmax_dtype: str = "float32"
    # cast the f32 master params to compute_dtype ONCE per train step
    # (inside the grad): the 90-step decoder scan otherwise re-reads
    # every weight matrix from HBM as f32 each step, forward AND
    # backward (~11 GB/step at batch 64). XLA does not hoist the
    # per-use cast out of the scan (measured: pre-casting sped up
    # inference decode). Numerics note: the scan's weight-gradient
    # accumulation then runs in bf16 instead of f32 — loss values are
    # identical (same rounding as the per-use cast), gradients lose
    # ~2-3 mantissa bits across the 90-step sum. Off by default.
    train_param_cast: bool = False


@_frozen
class DetectorConfig:
    """Faster R-CNN R50-FPN extraction path (reference train_anatomy.py:561-586,
    ana_bbox_generator.py:433-466)."""

    image_size: int = 1024
    num_anatomy_classes: int = 26
    num_disease_classes: int = 22
    fpn_channels: int = 256
    roi_feat_dim: int = 1024
    pre_nms_topk: int = 1000
    post_nms_topk: int = 1000
    # extraction-only proposal budget: pool/classify only the top-N
    # post-NMS proposals in `extract` (0 = all post_nms_topk, the
    # reference setting). Proposals arrive score-sorted, so N>0 is
    # exactly post_nms_topk=N for the extract path — a measured
    # speed/recall knob (the canvas ROIAlign and select tail scale
    # ~linearly in proposal count; see scripts/bench_extract_stages).
    extract_topk: int = 0
    # extract's top-1-per-class selection: 'topk' (the sorted-top-100
    # composition, detect()'s shape) or 'fused' (per-class argmax +
    # comparison-counted rank cap, no [R*K] sort). Exactly equivalent
    # outputs (tested). On-chip A/B (r4d, quiet window, process-fresh):
    # topk select tail 5.7 ms/b8 vs fused 7.8 — the sort-free rank
    # comparison loses to lax.top_k on hardware; default topk, fused
    # kept as the recorded experiment.
    select_impl: str = "topk"
    nms_thresh: float = 0.5
    score_thresh: float = 0.0
    proposals_per_image: int = 1000
    roi_pool_size: int = 7
    batch_size: int = 8          # detector TRAINING batch
    # inference/extraction batch. Measured on v5e at 1024² (docs/STATUS
    # r2): with the batched pallas ROIAlign + row-wise FC head, batch 8
    # is the throughput optimum (112 img/s; batch 16 equal, batch 1
    # ~52-90 with high relay variance). The reference is batch-1,
    # forced to it by its hook scheme.
    extract_batch_size: int = 8
    # backbone norm: 'gn' (GroupNorm-32, the from-scratch training
    # default) or 'frozen_bn' (FrozenAffine — REQUIRED when running
    # converted Detectron2 checkpoints, together with stride_in_1x1;
    # GN would silently mis-apply those weights since both norms carry
    # scale/bias params of the same names)
    norm: str = "gn"
    stride_in_1x1: bool = False
    # stem 7×7/s2 conv computed as an exactly-equivalent 4×4/s1 conv on
    # a 2×2 space-to-depth input (the MLPerf-ResNet TPU stem rewrite —
    # C_in=3 underfills the MXU contraction lanes). Pure perf knob:
    # same params, same outputs (tests/test_detector.py::
    # test_s2d_stem_is_exact); applies to training AND inference.
    # On-chip A/B (r4 queue, ext_stages_s2d): extract b8 66.7 ms vs
    # 69.6 baseline (+4.3%), backbone stage 30.5 vs 32.0 — an exact
    # rewrite that never loses, so default ON.
    s2d_stem: bool = True
    # input normalization applied ON-DEVICE by the extraction fns:
    # 'unit' = RGB in [0,1] (the from-scratch training convention);
    # 'detectron2' = caffe-BGR 0-255 mean-subtracted (zoo R50-FPN
    # pixel_mean; REQUIRED with converted Detectron2 checkpoints —
    # see tools/torch_convert.py::detectron2_preprocess)
    preprocess: str = "unit"
    # caffe normalization constants for preprocess='detectron2';
    # defaults are the zoo R50-FPN buffers — override with the
    # CONVERTED CHECKPOINT'S OWN pixel_mean/pixel_std when they differ
    # (torch_convert.convert_detector_checkpoint reports them)
    pixel_mean: tuple = (103.530, 116.280, 123.675)
    pixel_std: tuple = (1.0, 1.0, 1.0)
    # ROIAlign backend for the batched inference path
    # (ops/pallas_roi.py): 'canvas' (whole-pyramid-in-VMEM kernel —
    # 6.1x the XLA gather on v5e at 1024²; pools at the feature dtype),
    # 'pallas' (patch-DMA kernel — 1.7x XLA, f32-operand pooling, works
    # for images above 1536²), 'xla' (differentiable gather), or 'auto'
    # (canvas on TPU, xla elsewhere). Training always uses XLA.
    roi_backend: str = "auto"
    # canvas-kernel schedule (ops/pallas_roi.py): roi_group = ROIs per
    # grid step (per-step fixed cost amortizes over it); roi_unroll =
    # Python-unrolled ROIs per in-kernel fori_loop body (0 = fully
    # unrolled, round-3 behavior). group>8 needs unroll<=8 to stay
    # inside the remote-compile code-size bound.
    roi_group: int = 8
    roi_unroll: int = 0
    # RPN pre-NMS top-k at inference: 'exact' (Detectron2 bit-parity
    # sort) or 'approx' (lax.approx_max_k, recall 0.99 — TPU partial
    # reduction; DOCUMENTED DEVIATION, rpn.py::generate_proposals).
    # Training always sorts exactly.
    rpn_topk: str = "exact"
    # Fuse the RPN objectness + delta 1x1 convs into one 15-channel
    # conv (same params, bit-identical outputs — rpn.py::RPNHead):
    # reads the big hidden maps once instead of twice and replaces two
    # lane-padded small-channel stores with one. Default off pending
    # the on-chip A/B (r5 queue, VERDICT r4 #8).
    rpn_fused_preds: bool = False


@_frozen
class Config:
    exp_dir: str = "./experiments"
    exp_name: str = ""
    model_type: str = ""
    change_detector: ChangeDetectorConfig = field(
        default_factory=ChangeDetectorConfig)
    speaker: SpeakerConfig = field(default_factory=SpeakerConfig)
    question: QuestionConfig = field(default_factory=QuestionConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    dtypes: DtypeConfig = field(default_factory=DtypeConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def default_config() -> Config:
    return Config()


def _decode_value(v: Any) -> Any:
    """literal_eval coercion parity (reference configs/config.py:226-256)."""
    if not isinstance(v, str):
        return v
    try:
        return literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def _coerce(value: Any, old: Any, full_key: str) -> Any:
    """Type coercion parity (reference configs/config.py:259-284)."""
    if old is None or value is None:
        return value
    t_old, t_new = type(old), type(value)
    if t_old is t_new:
        return value
    if isinstance(old, bool) and isinstance(value, int):
        return bool(value)
    if (isinstance(old, bool) and isinstance(value, str)
            and value.lower() in ("true", "false")):
        # CLI spelling: `speaker.train_hoist true` — literal_eval only
        # accepts Python's capitalized True/False
        return value.lower() == "true"
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, str):
        return str(value)
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(old, list) and isinstance(value, tuple):
        return list(value)
    raise ValueError(
        f"Type mismatch ({t_old} vs {t_new}) with values ({old} vs {value}) "
        f"for config key: {full_key}")


def _merge_into(obj: Any, overrides: dict, stack: str = "") -> Any:
    """Strict-key merge (reference _merge_a_into_b, configs/config.py:197-223):
    every override key must already exist in the dataclass."""
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"cannot merge into non-dataclass at {stack!r}")
    names = {f.name for f in dataclasses.fields(obj)}
    updates = {}
    for k, v in overrides.items():
        full_key = f"{stack}.{k}" if stack else k
        if k not in names:
            raise KeyError(f"Non-existent config key: {full_key}")
        cur = getattr(obj, k)
        if isinstance(v, dict):
            updates[k] = _merge_into(cur, v, full_key)
        else:
            v = _decode_value(v)
            updates[k] = _coerce(v, cur, full_key)
    return dataclasses.replace(obj, **updates)


def merge_overrides(cfg: Config, overrides: dict) -> Config:
    return _merge_into(cfg, overrides)


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[dict] = None) -> Config:
    """Build a Config from defaults + optional YAML overlay + dict overrides."""
    cfg = default_config()
    if yaml_path is not None:
        with open(yaml_path) as f:
            loaded = yaml.safe_load(f) or {}
        cfg = merge_overrides(cfg, loaded)
    if overrides:
        cfg = merge_overrides(cfg, overrides)
    return cfg


def merge_from_list(cfg: Config, kv_list) -> Config:
    """CLI-style dotted-key overrides (reference merge_cfg_from_list,
    configs/config.py:177-194): ['train.optim.lr', '3e-4', ...]."""
    assert len(kv_list) % 2 == 0, "override list must be key/value pairs"
    nested: dict = {}
    for key, val in zip(kv_list[0::2], kv_list[1::2]):
        d = nested
        parts = key.split(".")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return merge_overrides(cfg, nested)
