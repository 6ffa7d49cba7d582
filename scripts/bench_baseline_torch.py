"""Measured reference baseline: same-host CPU-vs-CPU decode anchor.

BASELINE.md's rule is "reference numbers must be measured, not quoted",
but the reference's GPU pipeline cannot run here (no CUDA). What CAN be
measured apples-to-apples on this host is the software stack: the
reference's own torch model code (modules.py:81 ChangeDetector forward +
dynamic_speaker_change_pos.py:287 `_sample` greedy decode — the compute
inside test_mimic.py:92-137's timed eval loop) on torch CPU, against
ekaid_tpu's jitted CPU decode, at IDENTICAL batch/shapes (flagship
geometry: 52x1024 graphs, batch 64, 90-step decode, full 147-word
vocab, random weights both sides).

This anchors SOFTWARE efficiency — one fused XLA program + lax.scan
decode vs per-token Python/torch dispatch — with the hardware held
fixed. It is explicitly NOT the reference's GPU throughput; BENCH
records report `vs_baseline` against this anchor with that caveat
attached.

Usage:
  EKAID_PLATFORM=cpu python scripts/bench_baseline_torch.py [--write]

--write records {torch_cpu_decode_pairs_per_sec, ekaid_cpu_decode_
pairs_per_sec, cpu_vs_cpu_ratio, methodology} into BASELINE.json
.measured, which bench.py then uses for vs_baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF = "/root/reference/model"
B = 64           # eval batch (data.test.batch_size parity)
N = 52           # nodes
Q_LEN = 20
NTOK = 147


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _ref_cfg():
    """The reference's shipped flagship config values
    (configs/dynamic/dynamic_change_pos_mimic.yaml)."""
    d = _AttrDict
    return d(
        model=d(
            change_detector=d(
                input_dim=2052, dim=128, feat_dim=1026, att_dim=1024,
                att_head=4, nongt_dim=N, spa_label_num=11,
                sem_label_num=3, dir_num=2, pos_emb_dim=64,
                coef_sem=0.333, coef_spa=0.333),
            speaker=d(
                input_dim=1024, rnn_size=512, embed_input_dim=3072,
                embed_dim=1024, drop_prob_lm=0.5, word_embed_size=300,
                vocab_size=148, seq_length=90, beam_size=1,
                temperature=1.0),
        ),
        train=d(setting="mode2", graph="all"),
        data=d(feature_mode="both", train=d(empty_image=False)),
    )


def _import_reference():
    import torch
    for name in ("torchvision", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.path.append(REF)
    import models.modules as ref_modules
    import models.dynamic_speaker_change_pos as ref_speaker
    # CPU-run shims for the reference's hardcoded CUDA (see
    # tests/test_full_convert.py for the inventory)
    torch.Tensor.cuda = lambda self, *a, **k: self
    import functools
    ref_modules.torch_extract_position_embedding = functools.partial(
        ref_modules.torch_extract_position_embedding,
        device=torch.device("cpu"))
    return ref_modules, ref_speaker


def _np_batch(seed=0):
    import numpy as np
    r = np.random.default_rng(seed)
    x1 = r.uniform(0, 0.5, (B, N, 1)); y1 = r.uniform(0, 0.5, (B, N, 1))
    w = r.uniform(0.1, 0.5, (B, N, 1)); h = r.uniform(0.1, 0.5, (B, N, 1))
    bb = np.concatenate([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    return {
        "d_feats": r.normal(size=(B, N, 1024)).astype(np.float32),
        "q_feats": r.normal(size=(B, N, 1024)).astype(np.float32),
        "d_adj": r.integers(0, 12, (B, N, N)).astype(np.int32),
        "q_adj": r.integers(0, 12, (B, N, N)).astype(np.int32),
        "d_sem_adj": r.integers(0, 4, (B, N, N)).astype(np.int32),
        "q_sem_adj": r.integers(0, 4, (B, N, N)).astype(np.int32),
        "d_bb": bb, "q_bb": bb.copy(),
        "question": r.integers(0, NTOK, (B, Q_LEN)).astype(np.int32),
    }


def bench_torch(iters: int) -> float:
    import numpy as np
    import torch
    torch.manual_seed(0)
    ref_modules, ref_speaker = _import_reference()
    from utils.mimic_utils import process_matrix

    cfg = _ref_cfg()
    word_to_idx = {f"w{i}": i for i in range(NTOK)}
    cd = ref_modules.ChangeDetector(cfg, word_to_idx)
    spk = ref_speaker.DynamicSpeaker(cfg, 148)
    cd.eval(); spk.eval()

    batch = _np_batch()
    t = lambda x: torch.from_numpy(np.asarray(x))  # noqa: E731
    dev = torch.device("cpu")

    def run(i):
        with torch.no_grad():
            # adjacency broadcast on device each batch, as the reference
            # eval loop does (test_mimic.py:109-113)
            d_adj = process_matrix(t(batch["d_adj"]).long(), cfg, N, dev,
                                   type="spatial")
            q_adj = process_matrix(t(batch["q_adj"]).long(), cfg, N, dev,
                                   type="spatial")
            d_sem = process_matrix(t(batch["d_sem_adj"]).long(), cfg, N,
                                   dev, type="semantic")
            q_sem = process_matrix(t(batch["q_sem_adj"]).long(), cfg, N,
                                   dev, type="semantic")
            feats = t(batch["d_feats"]) + 1e-6 * i   # defeat any caching
            _, _, _, fb, fa, fd = cd(
                feats, t(batch["q_feats"]), d_adj, q_adj, d_sem, q_sem,
                t(batch["d_bb"]), t(batch["q_bb"]),
                t(batch["question"]).long(), setting="mode2", graph="all")
            seq, _ = spk._sample(fb, fa, fd, None, cfg=cfg, sample_max=1)
        return seq

    run(0)                                     # warm (allocator, MKL)
    t0 = time.perf_counter()
    for i in range(iters):
        run(i + 1)
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def bench_ekaid(iters: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.utils.dtypes import F32

    cfg = default_config()
    assert cfg.speaker.seq_length == 90 and cfg.data.num_nodes == N
    model = EkaidModel(cfg, ntoken=NTOK, policy=F32)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, B, seed=0))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, batch, train=True)

    @jax.jit
    def decode(params, batch, i):
        batch = dict(batch, d_feats=batch["d_feats"] + 1e-6 * i)
        return model.apply(params, batch, method="decode",
                           sample_max=True)["seq"]

    _ = np.asarray(decode(params, batch, jnp.float32(0)))   # compile
    t0 = time.perf_counter()
    for i in range(iters):
        _ = np.asarray(decode(params, batch, jnp.float32(i + 1)))
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--write", action="store_true",
                    help="record into BASELINE.json .measured")
    a = ap.parse_args()

    os.environ.setdefault("EKAID_PLATFORM", "cpu")
    from ekaid_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    torch_pps = bench_torch(a.iters)
    print(f"reference torch CPU decode: {torch_pps:.2f} pairs/s")
    ekaid_pps = bench_ekaid(a.iters)
    print(f"ekaid_tpu jitted CPU decode: {ekaid_pps:.2f} pairs/s")
    ratio = ekaid_pps / torch_pps
    print(f"cpu-vs-cpu ratio: {ratio:.2f}x")

    if a.write:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE.json")
        with open(path) as f:
            base = json.load(f)
        base["measured"] = {
            "torch_cpu_decode_pairs_per_sec": round(torch_pps, 2),
            "ekaid_cpu_decode_pairs_per_sec": round(ekaid_pps, 2),
            "cpu_vs_cpu_ratio": round(ratio, 2),
            "methodology": (
                "same-host CPU-vs-CPU, flagship geometry (52x1024 "
                "graphs, batch 64, 90-step greedy decode, 147-word "
                "vocab, random weights): reference torch "
                "ChangeDetector+DynamicSpeaker._sample built from "
                "/root/reference/model sources vs ekaid_tpu jitted "
                "decode. Software-efficiency anchor only — NOT the "
                "reference GPU number (no GPU on this host)."),
        }
        with open(path, "w") as f:
            json.dump(base, f, indent=2)
        print(f"wrote BASELINE.json .measured")


if __name__ == "__main__":
    main()
