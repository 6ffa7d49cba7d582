"""Device-resident eval feature cache (data/device_cache.py).

The cache replaces the per-batch H2D feature wire with slot gathers
from device arrays; everything here pins that the decode outputs are
bit-identical to the plain (compact-wire) eval path, including under
heavy eviction, and that the accounting sees real hits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.data.device_cache import DeviceEvalCache
from ekaid_tpu.data.pipeline import compact_wire, synthetic_dataset


def small_cfg(cache_slots: int):
    cfg = default_config()
    return cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=32, rnn_size=16, embed_input_dim=96, embed_dim=32,
            word_embed_size=8, seq_length=8),
        data=cfg.data.replace(
            num_nodes=6, feature_dim=24, adj_pad=10,
            eval_device_cache=cache_slots,
            train=cfg.data.train.replace(batch_size=4),
            test=cfg.data.test.replace(batch_size=4)),
        question=cfg.question.replace(hidden_dim=64),
        mesh=cfg.mesh.replace(data=1, model=1))


def _trainer(tmp_path, cache_slots: int):
    from ekaid_tpu.train.train import build_synthetic_trainer
    return build_synthetic_trainer(small_cfg(cache_slots),
                                   str(tmp_path), n_pairs=48)


def test_gather_matches_compact_wire():
    """ensure() + gather_batch must reproduce exactly the tensors the
    compact wire ships for the same pair indices."""
    cfg = small_cfg(64)
    ds = synthetic_dataset(cfg, "test", n_pairs=32)
    cache = DeviceEvalCache(ds, capacity=64)
    idxs = np.asarray(ds.split_idxs[:4])
    d_slots, q_slots = cache.ensure(idxs)
    ref = compact_wire(ds.sample_batch(idxs))
    got = DeviceEvalCache.gather_batch(
        cache.dev_arrays(), jnp.asarray(d_slots), jnp.asarray(q_slots),
        jnp.asarray(ref["question"]))
    for k in ("d_feats", "q_feats", "d_bb", "q_bb", "d_adj", "q_adj",
              "d_sem_adj", "q_sem_adj"):
        assert got[k].dtype == ref[k].dtype, k
        np.testing.assert_array_equal(np.asarray(got[k]), ref[k],
                                      err_msg=k)


def test_hit_accounting_and_no_reupload():
    cfg = small_cfg(64)
    ds = synthetic_dataset(cfg, "test", n_pairs=32)
    cache = DeviceEvalCache(ds, capacity=64)
    idxs = np.asarray(ds.split_idxs[:6])
    cache.ensure(idxs)
    up0 = cache.upload_bytes
    assert cache.misses > 0 and up0 > 0
    d2, q2 = cache.ensure(idxs)            # same batch: all hits
    assert cache.upload_bytes == up0
    s = cache.stats()
    assert s["hits"] >= len(set(ds.feature_idx[idxs].ravel().tolist()))
    # slots stay stable across the re-ensure
    d1, q1 = cache.ensure(idxs)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(q1, q2)


def test_capacity_too_small_raises():
    cfg = small_cfg(4)
    ds = synthetic_dataset(cfg, "test", n_pairs=32)
    cache = DeviceEvalCache(ds, capacity=4)
    with pytest.raises(AssertionError, match="capacity"):
        cache.ensure(np.asarray(ds.split_idxs[:8]))


def test_cached_eval_matches_plain(tmp_path):
    """Trainer.evaluate through the device cache must produce the same
    predictions dict as the plain wire path — and again under heavy
    eviction (capacity barely above one batch's unique legs)."""
    tr_plain = _trainer(tmp_path / "plain", cache_slots=0)
    scores0, preds0 = tr_plain.evaluate(max_batches=4)
    assert preds0

    tr_cache = _trainer(tmp_path / "cache", cache_slots=64)
    scores1, preds1 = tr_cache.evaluate(max_batches=4)
    assert preds1 == preds0
    assert tr_cache._eval_cache.hits + tr_cache._eval_cache.misses > 0

    # second evaluate on the same trainer: cache warm, still identical
    _, preds1b = tr_cache.evaluate(max_batches=4)
    assert preds1b == preds0

    tr_evict = _trainer(tmp_path / "evict", cache_slots=8)
    _, preds2 = tr_evict.evaluate(max_batches=4)
    assert preds2 == preds0
    assert tr_evict._eval_cache.stats()["resident"] <= 8
