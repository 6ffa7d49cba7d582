"""Training driver (train_mimic.py parity, TPU-native).

CLI mirrors the reference's flags (train_mimic.py:32-49): --cfg YAML,
--graph, --feature_mode, --lr, --seed, --eval_target; plus --synthetic
for a no-data smoke run and --workdir. The loop structure follows
train_mimic.py:187-384: epoch scheduler step, scheduled-sampling ramp,
per-iter step/logging, snapshot + greedy-decode eval + caption metrics
every snapshot_interval, best checkpoint on Bleu_1.

Differences by design (documented):
  * one jitted, donated, mesh-sharded train step instead of per-tensor
    .to(device) + backward (train_mimic.py:213-269);
  * optimizer state checkpoints with the params (the reference drops it);
  * metrics come from the native evaluator (ekaid_tpu.metrics), not the
    pycocoevalcap Java stack.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ekaid_tpu.config import Config, load_config, default_config
from ekaid_tpu.data.pipeline import (DiffVQADataset, H5FeatureStore,
                                     Loader, synthetic_dataset)
from ekaid_tpu.data.vocab import Vocabulary
from ekaid_tpu.metrics.coco import CaptionEvaluator, CocoCaptions
from ekaid_tpu.models.ekaid import EkaidModel
from ekaid_tpu.parallel.mesh import make_mesh, shard_batch
from ekaid_tpu.train.step import (init_state, make_jitted_steps,
                                  make_optimizer)
from ekaid_tpu.utils.checkpoint import CheckpointManager
from ekaid_tpu.utils.dtypes import Policy, canonical


def identity_vocab(vocab_size: int) -> Vocabulary:
    """Synthetic vocab: token i ↔ 'w<i>' (plus '<start>' at 1)."""
    words = {"<start>": 1}
    for i in range(2, vocab_size):
        words[f"w{i}"] = i
    return Vocabulary(words)


def ss_prob_for_epoch(cfg, epoch: int) -> float:
    """Scheduled-sampling ramp (train_mimic.py:195-202)."""
    t = cfg.train
    if t.scheduled_sampling_start < 0 or epoch <= t.scheduled_sampling_start:
        return 0.0
    frac = ((epoch - t.scheduled_sampling_start)
            // t.scheduled_sampling_increase_every)
    return min(t.scheduled_sampling_increase_prob * frac,
               t.scheduled_sampling_max_prob)


class Trainer:
    def __init__(self, cfg: Config, workdir: str,
                 train_ds: DiffVQADataset, eval_ds: DiffVQADataset,
                 vocab: Vocabulary,
                 gt_annotations: Optional[dict] = None):
        self.cfg = cfg
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        cfg.to_json(os.path.join(workdir, "cfg.json"))

        self.vocab = vocab
        self.train_ds = train_ds
        self.eval_ds = eval_ds
        self.gt_annotations = gt_annotations

        policy = Policy(
            param_dtype=canonical(cfg.dtypes.param_dtype),
            compute_dtype=canonical(cfg.dtypes.compute_dtype),
            softmax_dtype=canonical(cfg.dtypes.softmax_dtype))
        # vocab size flows from the data (train_mimic.py:148); the
        # decode kernel resolves 'auto' -> pallas on TPU here (build
        # time — modules never query devices, utils/platform.py).
        # sharded_ok: the mesh is threaded into the model below, so the
        # pallas kernel runs under shard_map over 'data' on multi-chip
        # hosts (VERDICT r4 #4) instead of falling back to the XLA loop.
        from ekaid_tpu.utils.platform import resolve_decode_kernel
        speaker_cfg = cfg.speaker.replace(
            vocab_size=vocab.size,
            decode_kernel=resolve_decode_kernel(
                cfg.speaker.decode_kernel, sharded_ok=True))
        self.cfg = cfg = cfg.replace(speaker=speaker_cfg)
        self.mesh = make_mesh(cfg.mesh)
        self.model = EkaidModel(
            cfg, ntoken=len(vocab.word_to_idx), policy=policy,
            decode_mesh=(self.mesh if self.mesh.size > 1 else None))

        steps_per_epoch = max(1, len(train_ds) // train_ds.batch_size)
        self.steps_per_epoch = steps_per_epoch
        self.tx = make_optimizer(cfg.train.optim, steps_per_epoch)
        rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng, init_rng = jax.random.split(rng)
        example = self._device_batch(next(iter(Loader(
            train_ds, batch_size=train_ds.batch_size, shuffle=False,
            pad_final=True))))
        state = init_state(self.model, self.tx, example, init_rng)
        self.make_train, self.jit_eval, self.state = make_jitted_steps(
            self.model, self.tx, cfg.train.att_reg_weight, self.mesh,
            state, example,
            param_cast=getattr(cfg.dtypes, "train_param_cast", False),
            accum_steps=cfg.train.accum_steps,
            entropy_weight=cfg.train.entropy_weight)
        self.jit_train = self.make_train(0.0)
        self.ckpt = CheckpointManager(os.path.join(workdir, "snapshots"))
        self.stop_requested = False
        self.best = self.ckpt.best_metric()
        from ekaid_tpu.utils.logging import MetricsLogger
        self.logger = MetricsLogger(workdir)
        self._dump_model_print()

    def install_preemption_handler(self):
        """SIGTERM/SIGINT → finish the in-flight step, checkpoint,
        exit cleanly (never kill a TPU process mid-claim — it can wedge
        the chip; memory: axon-tpu-quirks). With the exact mid-epoch
        resume, `--resume` continues from the precise batch."""
        import signal

        def _request_stop(signum, frame):
            if self.stop_requested:       # second signal: give up
                raise KeyboardInterrupt
            self.stop_requested = True
            print(f"signal {signum}: will checkpoint and exit after "
                  f"the current step")

        signal.signal(signal.SIGTERM, _request_stop)
        signal.signal(signal.SIGINT, _request_stop)

    def _dump_model_print(self):
        """Architecture dump to <workdir>/model_print
        (train_mimic.py:162-165 parity): per-parameter shapes/dtypes and
        the total count."""
        lines = []
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                self.state.params)[0]:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            lines.append(f"{name}  {tuple(leaf.shape)}  {leaf.dtype}")
            total += leaf.size
        lines.append(f"total parameters: {total:,}")
        with open(os.path.join(self.workdir, "model_print"), "w") as f:
            f.write("\n".join(lines) + "\n")

    def _device_batch(self, batch) -> Dict:
        batch = {k: v for k, v in batch.items() if k != "pair_index"}
        return jax.tree.map(jnp.asarray, batch)

    def _make_cached_decode(self, cache_slots: int):
        """Greedy decode fed from the device-resident image cache
        (data/device_cache.py). Returns fn(pair_idxs) -> decode outputs;
        cache + jit persist across evaluate() calls so the periodic
        in-training evals stay warm."""
        from ekaid_tpu.data.device_cache import DeviceEvalCache
        if getattr(self, "_eval_cache", None) is None:
            self._eval_cache = DeviceEvalCache(self.eval_ds,
                                               capacity=cache_slots)
            model = self.model

            @jax.jit
            def decode(state, dev, d_slots, q_slots, question):
                b = DeviceEvalCache.gather_batch(dev, d_slots, q_slots,
                                                 question)
                return model.apply(state.params, b, method="decode",
                                   sample_max=True)

            self._eval_cache_decode = decode
        cache = self._eval_cache
        questions = self.eval_ds.questions

        def run(pair_idxs):
            d_slots, q_slots = cache.ensure(pair_idxs)
            return self._eval_cache_decode(
                self.state, cache.dev_arrays(), jnp.asarray(d_slots),
                jnp.asarray(q_slots),
                jnp.asarray(questions[pair_idxs].astype(np.int32)))

        return run

    # ------------------------------------------------------------ train ---

    def train(self, log_every: Optional[int] = None,
              eval_fraction: Optional[int] = None) -> Dict:
        cfg = self.cfg
        log_every = log_every or cfg.train.log_interval
        t = int(self.state.step)
        epoch = t // self.steps_per_epoch
        last_metrics: Dict = {}
        import jax as _jax
        loader = Loader(self.train_ds, shuffle=True, seed=cfg.train.seed,
                        num_threads=cfg.data.num_workers,
                        prefetch=cfg.data.prefetch,
                        # multi-host pods: each process feeds a disjoint
                        # slice of the (identically shuffled) epoch
                        shard_index=_jax.process_index(),
                        num_shards=_jax.process_count())
        # exact mid-epoch resume (t restored from the checkpoint):
        # align the loader's shuffle permutation with the restored
        # epoch and fast-forward past the already-consumed batches, so
        # the data order continues exactly where the run stopped
        # (the reference restarts the epoch, train_mimic.py:208)
        loader.epoch = epoch
        if t % self.steps_per_epoch:
            loader.skip_next = t % self.steps_per_epoch

        def device_batches():
            """One-ahead device prefetch: device_put is async, so the
            next batch's host→HBM transfer overlaps the current step
            (the reference blocks on per-tensor .to(device) transfers,
            train_mimic.py:213-218)."""
            from ekaid_tpu.data.pipeline import trim_batch_to_bucket
            # multi-host: each process sees only its shard, so bucket
            # choices could diverge across hosts and desync the SPMD
            # program — bucket only when single-process
            buckets = (cfg.train.length_buckets
                       if _jax.process_count() == 1 else ())
            it = iter(loader)
            nxt = None
            for batch in it:
                if buckets:
                    batch = trim_batch_to_bucket(
                        batch, buckets, cfg.speaker.seq_length)
                cur = nxt
                nxt = shard_batch(self.mesh, self._device_batch(batch))
                if cur is not None:
                    yield cur
            if nxt is not None:
                yield nxt

        while t < cfg.train.max_iter:
            ss_prob = ss_prob_for_epoch(cfg, epoch)
            step_fn = self.make_train(ss_prob)
            for device_batch in device_batches():
                if self.stop_requested:
                    # preemption (SIGTERM/SIGINT via install_preemption
                    # _handler): save a resumable checkpoint and leave
                    # cleanly — NOT mid-device-claim (killing a TPU
                    # process mid-claim can wedge the chip; memory:
                    # axon-tpu-quirks). Combined with the exact
                    # mid-epoch resume above, training continues from
                    # this precise batch.
                    self.ckpt.save(self.state,
                                   config_dict=self.cfg.to_dict())
                    print(f"preempted at iter {t}: checkpoint saved; "
                          f"resume with --resume")
                    return last_metrics
                it_start = time.time()
                self.state, metrics = step_fn(
                    self.state, device_batch, self.rng)
                t += 1
                if t % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["iter_time"] = time.time() - it_start
                    print(f"epoch {epoch} iter {t} "
                          + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
                    self.logger.log(t, m, prefix="train/")
                    last_metrics = m
                if t % cfg.train.snapshot_interval == 0:
                    self.snapshot_and_eval(t, max_batches=eval_fraction)
                if t >= cfg.train.max_iter:
                    break
            epoch += 1
        return last_metrics

    # ------------------------------------------------------------- eval ---

    def snapshot_and_eval(self, t: int,
                          max_batches: Optional[int] = None) -> Dict:
        self.ckpt.save(self.state, config_dict=self.cfg.to_dict())
        scores, predictions = self.evaluate(max_batches=max_batches)
        print(f"eval @ {t}: "
              + " ".join(f"{k}={v:.3f}" for k, v in scores.items()))
        self.logger.log(t, scores, prefix="eval/")
        out = os.path.join(self.workdir, "eval_sents")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, f"eval_results_{t}.json"), "w") as f:
            json.dump([{"caption": v, "image_id": k}
                       for k, v in predictions.items()], f)
        if scores.get("Bleu_1", 0.0) > self.best:
            self.best = scores["Bleu_1"]
            self.ckpt.save_best(self.state, self.best,
                                config_dict=self.cfg.to_dict())
            print("Best checkpoint saved")
        return scores

    def evaluate(self, max_batches: Optional[int] = None,
                 beam_size: int = 1):
        """Greedy (or beam) decode over the eval split + caption metrics
        (train_mimic.py:292-375 parity)."""
        decode_fn = self.jit_eval
        if beam_size > 1:
            import jax as _jax
            model = self.model
            decode_fn = _jax.jit(lambda st, b: model.apply(
                st.params, b, method="decode_beam", beam_size=beam_size))
        loader = Loader(self.eval_ds, shuffle=False, pad_final=True,
                        num_threads=self.cfg.data.num_workers,
                        prefetch=self.cfg.data.prefetch,
                        wire=getattr(self.cfg.data, "eval_wire", "f32"))
        predictions: Dict[str, str] = {}

        def flush(pair_index, out):
            # np.asarray is the only true sync (axon acks buffers before
            # execution) — by flushing batch i only after batch i+1 is
            # enqueued, the D2H fetch + host detokenization overlap
            # device compute and the relay roundtrip
            seqs = np.asarray(out["seq"])
            for j, sent in enumerate(self.vocab.decode_batch(seqs)):
                predictions[str(int(pair_index[j]))] = sent

        # device-resident per-image feature cache (data/device_cache.py,
        # config.data.eval_device_cache): the eval loop is H2D-wire
        # bound and MIMIC asks ~4.3 questions per study pair — caching
        # images on-device ships only miss rows + question tokens.
        # Tokens are bit-identical to the wire path (tested). Gated to
        # greedy single-device eval: slot state is host-side and a DP
        # mesh would need per-shard caches.
        cache_slots = getattr(self.cfg.data, "eval_device_cache", 0)
        if (cache_slots > 0 and beam_size == 1 and self.mesh.size == 1
                and self.cfg.data.feature_mode != "mode0"):
            pending = None
            cached_decode = self._make_cached_decode(cache_slots)
            for i, idxs in enumerate(loader._batch_indices()):
                if max_batches is not None and i >= max_batches:
                    break
                # enqueue batch i+1 (miss upload + scatter + decode are
                # all async dispatches) before syncing batch i: the H2D
                # of the next misses rides under the current decode
                nxt = (idxs, cached_decode(idxs))
                if pending is not None:
                    flush(*pending)
                pending = nxt
            if pending is not None:
                flush(*pending)
        else:
            pending = None
            for i, batch in enumerate(loader):
                if max_batches is not None and i >= max_batches:
                    break
                nxt = (batch["pair_index"],
                       decode_fn(self.state,
                                 shard_batch(self.mesh,
                                             self._device_batch(batch))))
                if pending is not None:
                    flush(*pending)
                pending = nxt
            if pending is not None:
                flush(*pending)

        if not predictions:
            return {k: 0.0 for k in CaptionEvaluator.METRICS}, predictions
        gts = self._gt_annotations(predictions)
        res = CocoCaptions(annotations={"annotations": [
            {"image_id": k, "caption": v, "id": k}
            for k, v in predictions.items()]})
        ev = CaptionEvaluator(CocoCaptions(annotations=gts), res)
        scores = ev.evaluate()
        # answer accuracy alongside caption metrics (the reference only
        # computes it post-hoc, evaluate_score.py:216-251)
        from ekaid_tpu.train.score import accuracy as _acc
        results = [{"image_id": k, "caption": v}
                   for k, v in predictions.items()]
        total, open_a, closed = _acc(gts, results, verbose=False)
        scores.update({"acc_total": total, "acc_open": open_a,
                       "acc_closed": closed})
        return scores, predictions

    def _gt_annotations(self, predictions) -> dict:
        if self.gt_annotations is not None:
            keep = set(predictions)
            return {"annotations": [
                a for a in self.gt_annotations["annotations"]
                if str(a["image_id"]) in keep]}
        # synthetic: ground truth from the dataset's own answer rows
        annos = []
        for k in predictions:
            idx = int(k)
            caption = self.vocab.decode(self.eval_ds.answers[idx][1:])
            annos.append({"image_id": k, "id": k,
                          "caption": caption or "no change"})
        return {"annotations": annos}


def build_synthetic_trainer(cfg: Config, workdir: str,
                            n_pairs: int = 512,
                            corpus: str = "random") -> Trainer:
    """corpus='random': random-token answers (loss floors at the
    marginal entropy — optimization smoke only). corpus='learnable':
    answers are deterministic functions of the pair's features
    (data/pipeline.py::learnable_dataset) — eval Bleu_1/accuracy can
    reach ~1.0, so best-checkpoint selection and the full train→eval
    →snapshot loop (train_mimic.py:280-383) get a real signal."""
    vocab = identity_vocab(cfg.speaker.vocab_size)
    if corpus == "learnable":
        from ekaid_tpu.data.pipeline import learnable_dataset
        train_ds = learnable_dataset(cfg, "train", n_pairs=n_pairs * 8)
        eval_ds = learnable_dataset(cfg, "test", n_pairs=n_pairs * 8)
    else:
        train_ds = synthetic_dataset(cfg, "train", n_pairs=n_pairs)
        eval_ds = synthetic_dataset(cfg, "test", n_pairs=n_pairs)
    return Trainer(cfg, workdir, train_ds, eval_ds, vocab)


def build_trainer(cfg: Config, workdir: str,
                  eval_target: str = "test") -> Trainer:
    vocab = Vocabulary.load(cfg.data.vocab_json)
    store = H5FeatureStore(cfg.data.feature_h5)
    npz = os.path.join(os.path.dirname(cfg.data.vocab_json),
                       "vqa_dataset.npz")
    train_ds = DiffVQADataset(cfg, store, "train", npz_path=npz,
                              splits_path=cfg.data.splits_json, vocab=vocab)
    eval_ds = DiffVQADataset(cfg, store, eval_target, npz_path=npz,
                             splits_path=cfg.data.splits_json, vocab=vocab)
    gt_path = cfg.data.gt_captions % eval_target
    with open(gt_path) as f:
        gt = json.load(f)
    return Trainer(cfg, workdir, train_ds, eval_ds, vocab,
                   gt_annotations=gt)


def main(argv=None):
    from ekaid_tpu.utils.platform import (apply_platform_env,
                                            enable_compile_cache)
    apply_platform_env()
    enable_compile_cache()   # axon remote compiles take minutes
    p = argparse.ArgumentParser(description="EKAID-TPU training")
    p.add_argument("--cfg", default=None, help="YAML config overlay")
    p.add_argument("--graph", default="all",
                   choices=["implicit", "semantic", "spatial", "all",
                            "i+s"])
    p.add_argument("--feature_mode", default="both",
                   choices=["both", "location", "single_ana", "single_loc"])
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--entropy_weight", type=float, default=None,
                   help="module-attention entropy bonus weight "
                        "(train_mimic.py:35 parity; reference default 0)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--eval_target", default="test",
                   choices=["test", "val"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_corpus", default="random",
                   choices=["random", "learnable"],
                   help="'learnable': answers are deterministic "
                        "functions of the pair features "
                        "(data/pipeline.py::learnable_dataset) — eval "
                        "Bleu_1 has real headroom instead of the "
                        "random-token entropy floor")
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--snapshot_interval", type=int, default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--eval_batches", type=int, default=None,
                   help="cap eval batches per snapshot")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest snapshot in the workdir "
                        "(train_mimic.py:40-43,125-142 parity — plus "
                        "optimizer state, which the reference drops)")
    p.add_argument("overrides", nargs="*", metavar="KEY VALUE",
                   help="trailing dotted-key config overrides, e.g. "
                        "train.accum_steps 2 speaker.remat dots "
                        "(merge_cfg_from_list parity, "
                        "configs/config.py:177)")
    a = p.parse_args(argv)

    cfg = load_config(a.cfg) if a.cfg else default_config()
    if a.overrides:
        from ekaid_tpu.config import merge_from_list
        cfg = merge_from_list(cfg, a.overrides)
    train_over = {"graph": a.graph}
    if a.entropy_weight is not None:
        train_over["entropy_weight"] = a.entropy_weight
    if a.lr is not None:
        train_over["optim"] = cfg.train.optim.replace(lr=a.lr)
    if a.seed is not None:
        train_over["seed"] = a.seed
    if a.max_iter is not None:
        train_over["max_iter"] = a.max_iter
    if a.snapshot_interval is not None:
        train_over["snapshot_interval"] = a.snapshot_interval
    cfg = cfg.replace(train=cfg.train.replace(**train_over),
                      data=cfg.data.replace(feature_mode=a.feature_mode))

    exp = f"mode2_{a.feature_mode}_{a.graph}_{cfg.train.optim.lr}"
    workdir = a.workdir or os.path.join(cfg.exp_dir, "temp", exp)

    if a.synthetic:
        trainer = build_synthetic_trainer(cfg, workdir,
                                          corpus=a.synthetic_corpus)
    else:
        trainer = build_trainer(cfg, workdir, a.eval_target)
    if a.resume and trainer.ckpt.latest_step() is not None:
        from ekaid_tpu.utils.checkpoint import abstract_like
        trainer.state = trainer.ckpt.restore(abstract_like(trainer.state))
        print(f"resumed from step {int(trainer.state.step)}")
    trainer.install_preemption_handler()
    trainer.train(eval_fraction=a.eval_batches)
    if trainer.stop_requested:            # preempted: checkpoint is
        return                            # saved; skip the final eval
    trainer.snapshot_and_eval(int(trainer.state.step),
                              max_batches=a.eval_batches)


if __name__ == "__main__":
    main()
