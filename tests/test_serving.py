"""Inference-server tests: engine + live HTTP round-trip."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.serving.server import InferenceEngine, make_handler
from ekaid_tpu.train.train import build_synthetic_trainer


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    cfg = default_config()
    cfg = cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=32, rnn_size=16, embed_input_dim=96, embed_dim=32,
            word_embed_size=8, seq_length=8),
        data=cfg.data.replace(num_nodes=6, feature_dim=24, adj_pad=10,
                              train=cfg.data.train.replace(batch_size=4),
                              test=cfg.data.test.replace(batch_size=4)),
        question=cfg.question.replace(hidden_dim=32))
    trainer = build_synthetic_trainer(
        cfg, str(tmp_path_factory.mktemp("serve")), n_pairs=32)
    return InferenceEngine(trainer)


def test_engine_answer(engine):
    out = engine.answer("w5 w9 what")
    assert isinstance(out["answer"], str)
    assert out["latency_ms"] > 0
    assert out["question_tokens"]         # vocab hits resolved


def test_engine_answer_detail(engine):
    """detail=True adds per-token words + [T, 3] module attention for
    the web client; tokens must re-join to the answer string and each
    weight row must be a softmax (sums to 1)."""
    out = engine.answer("w5 w9 what", detail=True)
    assert " ".join(out["tokens"]) == out["answer"]
    mw = np.asarray(out["module_weights"])
    assert mw.shape == (len(out["tokens"]), 3)
    assert np.allclose(mw.sum(-1), 1.0, atol=2e-3)


def test_engine_unknown_words_drop(engine):
    out = engine.answer("zzzzz qqqqq")
    assert out["question_tokens"] == []   # question2id parity: drop OOV


def test_engine_refresh_changes_index(engine):
    seen = {engine.refresh() for _ in range(10)}
    assert len(seen) > 1


def test_http_round_trip(engine):
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def call(path, payload=None):
        if payload is None:
            req = urllib.request.Request(base + path)
        else:
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())

    status, health = call("/health")
    assert status == 200 and health["status"] == "ok"
    status, ans = call("/question", {"question": "what has changed"})
    assert status == 200 and "answer" in ans
    status, s = call("/sample")
    assert status == 200 and "gt_answer" in s
    # web client page (PyQt5 GUI re-design)
    with urllib.request.urlopen(base + "/", timeout=60) as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        page = r.read().decode()
    assert "EKAID-TPU" in page and "/question" in page
    status, ans = call("/question", {"question": "what has changed",
                                     "detail": True})
    assert status == 200 and "tokens" in ans and "module_weights" in ans
    # error paths
    with pytest.raises(urllib.error.HTTPError) as e:
        call("/question", {"nope": 1})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        call("/bogus")
    assert e.value.code == 404
    server.shutdown()


@pytest.fixture(scope="module")
def artifact_dir(engine, tmp_path_factory):
    """Export a pre-compiled serving artifact from the engine's
    (already inference-cast) trainer."""
    from ekaid_tpu.serving.artifact import save_artifact
    path = str(tmp_path_factory.mktemp("artifact"))
    trainer = engine.trainer
    sample = {k: v for k, v in
              trainer.eval_ds.sample(
                  int(trainer.eval_ds.split_idxs[0])).items()
              if k != "pair_index"}
    save_artifact(path, trainer.model, trainer.state.params, sample,
                  batch_sizes=(1, 8))
    return path


def test_artifact_engine_matches_live(artifact_dir, engine):
    """Serving from the pre-compiled artifact must answer exactly like
    the live-compiled engine (same params, same program)."""
    from ekaid_tpu.serving.artifact import load_artifact
    art = load_artifact(artifact_dir)
    assert art.meta["batch_sizes"] == [1, 8]
    eng2 = InferenceEngine(engine.trainer, artifact=art)
    idx = int(engine.ds.split_idxs[0])
    a = engine.answer("w5 what", index=idx)
    b = eng2.answer("w5 what", index=idx)
    assert a["answer"] == b["answer"]
    # coalescing path rides the artifact's bucket executable
    from ekaid_tpu.serving.server import CoalescingEngine
    eng3 = CoalescingEngine(engine.trainer, coalesce_batch=8,
                            linger_ms=1.0, artifact=art)
    c = eng3.answer("w5 what", index=idx)
    assert c["answer"] == a["answer"]


def test_artifact_shape_mismatch_raises(artifact_dir):
    from ekaid_tpu.serving.artifact import load_artifact
    art = load_artifact(artifact_dir)
    sample = {k: np.zeros(tuple(s), np.float32)
              for k, (s, _d) in art.meta["sample_shapes"].items()}
    art.check_sample(sample)              # exported shapes pass
    bad = dict(sample)
    first = next(iter(bad))
    bad[first] = np.zeros((1, 1), np.float32)
    with pytest.raises(RuntimeError, match="shape mismatch"):
        art.check_sample(bad)


def test_artifact_missing_batch_size_raises(artifact_dir):
    from ekaid_tpu.serving.artifact import load_artifact
    art = load_artifact(artifact_dir)
    with pytest.raises(ValueError, match="batch-16"):
        art.fn_for_batch(16)


def test_artifact_platform_mismatch_raises(artifact_dir, tmp_path):
    import json as _json
    import os
    import shutil
    bad = str(tmp_path / "bad_art")
    shutil.copytree(artifact_dir, bad)
    meta_path = os.path.join(bad, "meta.json")
    with open(meta_path) as f:
        meta = _json.load(f)
    meta["platform"] = "not_a_platform"
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    from ekaid_tpu.serving.artifact import load_artifact
    with pytest.raises(RuntimeError, match="platform-pinned"):
        load_artifact(bad)


@pytest.fixture(scope="module")
def coalescing_engine(engine):
    from ekaid_tpu.serving.server import CoalescingEngine
    return CoalescingEngine(engine.trainer, coalesce_batch=8,
                            linger_ms=30.0)


def test_coalescing_single_request(coalescing_engine):
    out = coalescing_engine.answer("w5 w9 what")
    assert isinstance(out["answer"], str)
    assert out["question_tokens"]
    # detail rides the dispatcher path too
    out = coalescing_engine.answer("w5 w9 what", detail=True)
    assert " ".join(out["tokens"]) == out["answer"]
    assert np.asarray(out["module_weights"]).shape[-1] == 3


def test_coalescing_matches_batch1(coalescing_engine, engine):
    """The padded batched decode must answer exactly like the batch-1
    program for the same (index, question)."""
    idx = int(engine.ds.split_idxs[0])
    a = engine.answer("w5 what", index=idx)
    b = coalescing_engine.answer("w5 what", index=idx)
    assert a["answer"] == b["answer"]


def test_replicated_engine_uses_all_devices(engine):
    """replicas=2 on the 8-virtual-device test env: concurrent
    requests must all answer correctly AND both device slots must
    execute batches. Answers must match the batch-1 engine's."""
    import jax
    from concurrent.futures import ThreadPoolExecutor
    from ekaid_tpu.serving.server import CoalescingEngine
    assert len(jax.devices()) >= 2
    eng = CoalescingEngine(engine.trainer, coalesce_batch=4,
                           linger_ms=1.0, replicas=2)
    avail = [int(i) for i in list(eng.ds.split_idxs)[:4]]
    expected = {i: engine.answer("what has changed", index=i)["answer"]
                for i in avail}
    idxs = [avail[k % len(avail)] for k in range(24)]
    with ThreadPoolExecutor(max_workers=24) as ex:
        outs = list(ex.map(
            lambda i: eng.answer("what has changed", index=i), idxs))
    assert all(o["answer"] == expected[i] for i, o in zip(idxs, outs))
    used = {k: v for k, v in eng.stats["per_device"].items() if v > 0}
    assert len(used) == 2, f"expected both devices used: {eng.stats}"


def test_replicas_bounds_checked(engine):
    import pytest as _pytest
    from ekaid_tpu.serving.server import CoalescingEngine
    with _pytest.raises(ValueError, match="devices are visible"):
        CoalescingEngine(engine.trainer, coalesce_batch=4, replicas=99)


def test_drain_waits_for_inflight(coalescing_engine):
    """drain() returns True once the queue is empty and every device
    slot is free (the graceful-shutdown path)."""
    from concurrent.futures import ThreadPoolExecutor
    eng = coalescing_engine
    with ThreadPoolExecutor(max_workers=4) as ex:
        outs = list(ex.map(
            lambda _: eng.answer("what has changed"), range(4)))
    assert all(isinstance(o["answer"], str) for o in outs)
    assert eng.drain(timeout_s=30)


def test_coalescing_concurrent_clients(coalescing_engine):
    """16 concurrent requests must all succeed, answers must match their
    per-index batch-1 results, and the dispatcher must have folded at
    least one multi-request batch (stats)."""
    from concurrent.futures import ThreadPoolExecutor

    eng = coalescing_engine
    avail = [int(i) for i in list(eng.ds.split_idxs)[:4]]
    idxs = [avail[k % len(avail)] for k in range(16)]
    before = dict(eng.stats)

    with ThreadPoolExecutor(max_workers=16) as ex:
        outs = list(ex.map(
            lambda i: eng.answer("what has changed", index=i), idxs))

    assert len(outs) == 16
    assert all(isinstance(o["answer"], str) for o in outs)
    # same index + same question -> identical answer regardless of
    # which coalesced batch it rode in
    by_idx = {}
    for i, o in zip(idxs, outs):
        by_idx.setdefault(i, set()).add(o["answer"])
    assert all(len(v) == 1 for v in by_idx.values())
    assert eng.stats["requests"] - before["requests"] == 16
    assert eng.stats["batches"] - before["batches"] < 16, \
        "no coalescing happened"
    assert eng.stats["max_batch"] >= 2
