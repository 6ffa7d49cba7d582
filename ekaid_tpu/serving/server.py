"""Inference server (demo_server.py parity, TPU-native).

The reference serves a PyQt5 client over a raw socket (port 4000,
demo_server.py:309-435) with commands question / refresh / load_image,
and fakes a batch of 64 by replicating one sample (:235,49-61) because
its model path was only exercised at batch 64. Here the server is
plain HTTP+JSON on the same default port with a *jitted batch-1*
decode path (no replication), one compile at startup:

  GET  /         -> browser demo client (serving/webui.py — the
                    re-design of the reference's PyQt5 GUI)
  POST /question {"question": str, "index": optional int,
                  "detail": optional bool} ->
       {"answer": str, "index": int, "question_tokens": [...]}
       (+ per-token "tokens"/"module_weights" when detail)
  POST /refresh  -> {"index": int}   (new random test pair)
  GET  /health   -> {"status": "ok", ...}
  GET  /sample?index=N -> the pair's ground-truth answers + question

Free-form questions tokenize through the same vocabulary as training
(question2id parity, demo_server.py:66: unknown words drop out).

Concurrency: requests from concurrent clients are micro-batch-coalesced
into one padded batched decode by `CoalescingEngine` (default; see its
docstring) — the chip's decode throughput is strongly batch-dependent,
so N clients cost ~one batched invocation instead of N serialized
batch-1 invocations. `--replicas N` adds N device-bound execution slots
(multi-chip serving); `--export_artifact`/`--artifact` pre-compile the
decode for zero-compile startup (serving/artifact.py).
"""

from __future__ import annotations

import argparse
import json
import random
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ekaid_tpu.config import default_config, load_config
from ekaid_tpu.data.vocab import treebank_tokenize


class InferenceEngine:
    """Holds the jitted batch-1 decode and the eval dataset."""

    def __init__(self, trainer, seed: int = 0,
                 image_dir: Optional[str] = None, artifact=None):
        self.trainer = trainer
        self.vocab = trainer.vocab
        self.ds = trainer.eval_ds
        self.rng = random.Random(seed)
        self.index = int(self.ds.split_idxs[0])
        self.image_dir = image_dir
        self.artifact = artifact

        if artifact is not None:
            # zero-compile startup: pre-compiled executable + the
            # inference-cast params it was exported with
            # (serving/artifact.py); fail with a clear message if the
            # live dataset's shapes differ from the export
            artifact.check_sample(
                {k: v for k, v in self.ds.sample(self.index).items()
                 if k != "pair_index"})
            trainer.state = trainer.state.replace(params=artifact.params)
            self._decode = artifact.fn_for_batch(1)
        else:
            model = trainer.model
            # serving is inference-only: bf16 weight copy (see
            # utils/dtypes.cast_params_for_inference)
            from ekaid_tpu.utils.dtypes import (Policy,
                                                cast_params_for_inference)
            trainer.state = trainer.state.replace(
                params=cast_params_for_inference(
                    trainer.state.params,
                    Policy.from_config(trainer.cfg.dtypes)))

            @jax.jit
            def decode1(params, batch):
                return model.apply(params, batch, method="decode",
                                   sample_max=True)

            self._decode = decode1
        # device-resident sample cache (see _dev_sample) — must exist
        # before the warm-up call below
        from collections import OrderedDict
        self._dev_cache: "OrderedDict[int, dict]" = OrderedDict()
        self._dev_cache_cap = 64
        # ThreadingHTTPServer handlers call _dev_sample concurrently on
        # the base engine (the coalescing engine funnels through one
        # dispatcher thread, but single-flight mode does not) — the
        # OrderedDict insert/move_to_end/popitem sequence must not
        # interleave
        self._dev_cache_lock = threading.Lock()
        # warm the compile with the first sample — explicitly the base
        # path: a subclass override (CoalescingEngine) is not wired up
        # until after this constructor returns
        InferenceEngine.answer(self, None)

    def _dev_sample(self, index: int) -> dict:
        """Device-resident sample (feats/adjacency/labels + the pair's
        stored question), uploaded ONCE per index and LRU-cached.

        TPU-first: a /question request re-uses ~0.6 MB of features that
        never change between questions about the same study pair — only
        the ~80-byte token row differs. Re-shipping the full payload per
        dispatch made coalesced batches H2D-bound on slow links (r4
        load test: 16-slot batches at ~10 MB each lost 2.9x to batch-1).
        The reference rebuilds the full torch batch per request
        (demo_server.py:49-61,235)."""
        with self._dev_cache_lock:
            hit = self._dev_cache.get(index)
            if hit is not None:
                self._dev_cache.move_to_end(index)
                return hit
        # miss: build + upload OUTSIDE the lock (host read + H2D can be
        # slow; a duplicate concurrent upload of the same index is
        # harmless — last writer wins, both values are identical)
        s = self.ds.sample(index)
        if self.artifact is None:
            # minimal wire dtypes for the one-time upload (the
            # model casts at entry); artifact executables were
            # exported against the full-width input signature
            from ekaid_tpu.data.pipeline import compact_wire
            s = compact_wire(s)
        hit = {k: jnp.asarray(np.asarray(v)[None])
               for k, v in s.items() if k != "pair_index"}
        with self._dev_cache_lock:
            self._dev_cache[index] = hit
            while len(self._dev_cache) > self._dev_cache_cap:
                self._dev_cache.popitem(last=False)
        return hit

    def _batch_for(self, index: int, question_ids: Optional[np.ndarray]):
        batch = self._dev_sample(index)
        if question_ids is not None:
            batch = dict(batch)
            # the question row is the only per-request upload
            batch["question"] = jnp.asarray(
                question_ids.astype(np.int32)[None])
        return batch

    def question_to_ids(self, text: str) -> np.ndarray:
        tokens = treebank_tokenize(text)
        ids = [self.vocab.word_to_idx[t] for t in tokens
               if t in self.vocab.word_to_idx]
        q = np.zeros(self.ds.questions.shape[1], np.int64)
        q[:len(ids)] = ids[:len(q)]
        return q

    def refresh(self) -> int:
        self.index = int(self.rng.choice(list(self.ds.split_idxs)))
        return self.index

    def _detail_fields(self, seq: np.ndarray,
                       mw: Optional[np.ndarray]) -> dict:
        """Per-token words + [T, 3] before/diff/aft module attention for
        the web client (decoder.py returns module_weights rows zeroed
        past EOS, so trim both to the generated length)."""
        n = int(np.argmax(seq == 0)) if (seq == 0).any() else len(seq)
        tokens = [self.vocab.idx_to_word.get(int(i), "<unk>")
                  for i in seq[:n]]
        weights = (np.asarray(mw[:n], np.float64).round(4).tolist()
                   if mw is not None else None)
        return {"tokens": tokens, "module_weights": weights}

    def answer(self, question_text: Optional[str],
               index: Optional[int] = None,
               detail: bool = False) -> dict:
        idx = self.index if index is None else int(index)
        qids = (self.question_to_ids(question_text)
                if question_text else None)
        t0 = time.time()
        out = self._decode(self.trainer.state.params,
                           self._batch_for(idx, qids))
        seq = np.asarray(out["seq"])[0]
        answer = self.vocab.decode(seq)
        res = {"answer": answer, "index": idx,
               "latency_ms": round(1000 * (time.time() - t0), 2),
               "question_tokens": (qids[qids > 0].tolist()
                                   if qids is not None else None)}
        if detail:
            res.update(self._detail_fields(
                seq, np.asarray(out["module_weights"])[0]))
        return res

    def sample_info(self, index: Optional[int] = None) -> dict:
        idx = self.index if index is None else int(index)
        s = self.ds.sample(idx)
        return {"index": idx,
                "question": self.vocab.decode(s["question"]),
                "gt_answer": self.vocab.decode(s["labels"][1:])}

    def image_bytes(self, index: Optional[int] = None,
                    which: str = "main") -> bytes:
        """PNG bytes for the study pair (the reference's 'load_image'
        socket command, demo_server.py:287,428-434). Requires the server
        to be started with an image directory."""
        import os
        if self.image_dir is None:
            raise FileNotFoundError("server started without --image_dir")
        idx = self.index if index is None else int(index)
        col = 0 if which == "main" else 1
        img_row = int(self.ds.feature_idx[idx][col])
        path = os.path.join(self.image_dir, f"{img_row}.png")
        with open(path, "rb") as f:
            return f.read()


class CoalescingEngine(InferenceEngine):
    """Micro-batch coalescing for concurrent clients (TPU-first design;
    no reference counterpart — demo_server.py is single-client).

    The decode program's throughput grows strongly with batch (b1 479 →
    b128 14,377 pairs/s on-chip, scripts/bench_decode_sweep.py), so
    serializing concurrent /question requests through the batch-1
    program wastes the chip. Here handler threads enqueue requests and
    ONE dispatcher thread folds whatever is queued (up to
    `coalesce_batch`, lingering `linger_ms` for stragglers) into a
    single padded batched decode. Single dispatcher = single-flight on
    the device, which the axon relay requires anyway (memory:
    axon-tpu-quirks).

    Two compiled programs: the inherited batch-1 (solo requests keep
    their low latency) and one fixed `coalesce_batch` bucket (queue
    depth >= 2 pads up to it — static shapes, no recompiles).
    `stats` counts requests/batches/coalesced for load tests.

    `replicas=N` scales out over N local chips: params are copied to
    each device once, and a pool of N device-bound slots executes
    folded batches concurrently (one in-flight program per device —
    the single-flight rule is per chip). The folding thread keeps
    running while devices execute, so host-side batch assembly
    pipelines under device time even at N=1. The reference has no
    analog (single GPU, single client, demo_server.py).
    """

    def __init__(self, trainer, seed: int = 0,
                 image_dir: Optional[str] = None,
                 coalesce_batch: int = 16, linger_ms: float = 2.0,
                 artifact=None, replicas: int = 1,
                 pipeline_depth: int = 2):
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor
        super().__init__(trainer, seed=seed, image_dir=image_dir,
                         artifact=artifact)
        self.coalesce_batch = int(coalesce_batch)
        self.linger_s = float(linger_ms) / 1e3
        # in-flight coalesced batches per device: dispatch latency
        # (HTTP handler -> fold -> device roundtrip -> D2H fetch)
        # pipelines under device time. The r4b load test showed a
        # strictly-serialized dispatcher losing to concurrent batch-1
        # requests purely on per-batch roundtrips (~4 x 40-60 ms on the
        # axon relay); depth 2 overlaps batch k+1's fold+upload with
        # batch k's execution+fetch on ANY host.
        self.pipeline_depth = max(1, int(pipeline_depth))
        devices = jax.devices()
        if replicas > len(devices):
            raise ValueError(f"replicas={replicas} but only "
                             f"{len(devices)} devices are visible")
        self.devices = devices[:max(1, int(replicas))]
        if artifact is not None:
            self._decode_n = artifact.fn_for_batch(self.coalesce_batch)
            if len(self.devices) > 1:
                raise ValueError(
                    "replicas>1 with --artifact is not supported yet: "
                    "the artifact executable is loaded onto one device")
        else:
            model = trainer.model

            @jax.jit
            def decode_n(params, batch):
                return model.apply(params, batch, method="decode",
                                   sample_max=True)

            self._decode_n = decode_n

        def stack_rows(rows, questions):
            # device-side batch assembly for _stack: concat the cached
            # [1, ...] sample rows, then overwrite the question block
            # (the only per-request payload)
            batch = {k: jnp.concatenate([r[k] for r in rows], axis=0)
                     for k in rows[0]}
            batch["question"] = questions
            return batch

        self._stack_jit = jax.jit(stack_rows)
        if artifact is None:
            model = trainer.model

            # live path: assembly + decode in ONE dispatch (one relay
            # roundtrip instead of two; artifact executables keep the
            # two-step path — their input signature is the plain batch)
            @jax.jit
            def stack_decode(params, rows, questions):
                return model.apply(params, stack_rows(rows, questions),
                                   method="decode", sample_max=True)

            self._stack_decode = stack_decode
        else:
            self._stack_decode = None
        # per-device param copies (serving params are immutable); warm
        # each device's bucket program once at startup (cached across
        # runs by the persistent compile cache)
        self._params_dev = {d: jax.device_put(self.trainer.state.params,
                                              d)
                            for d in self.devices}
        warm_items = [(self.index, None)] * self.coalesce_batch
        warm1 = self._batch_for(self.index, None)
        for d in self.devices:
            if self._stack_decode is not None:
                rows, questions = self._gather_rows(warm_items)
                if len(self.devices) > 1:
                    rows = jax.device_put(rows, d)
                    questions = jax.device_put(questions, d)
                np.asarray(self._stack_decode(
                    self._params_dev[d], rows, questions)["seq"])
            else:
                warm = self._stack(warm_items)
                np.asarray(self._decode_n(
                    self._params_dev[d], jax.device_put(warm, d))["seq"])
            # also warm the batch-1 fast path per device — a lazy
            # first-request compile would stall a solo client for the
            # full program-compile time
            np.asarray(self._decode(
                self._params_dev[d], jax.device_put(warm1, d))["seq"])
        self.stats = {"requests": 0, "batches": 0, "coalesced": 0,
                      "max_batch": 0,
                      "per_device": {str(d): 0 for d in self.devices}}
        self._q: "queue.Queue" = queue.Queue()
        # execution SLOTS: each device appears pipeline_depth times, so
        # up to depth batches are in flight per device (bounded memory:
        # depth x one padded batch + outputs)
        self._free: "queue.Queue" = queue.Queue()
        self._slots = len(self.devices) * self.pipeline_depth
        for _ in range(self.pipeline_depth):
            for d in self.devices:
                self._free.put(d)
        self._pool = ThreadPoolExecutor(max_workers=self._slots,
                                        thread_name_prefix="ekaid-exec")
        self._thread = threading.Thread(target=self._dispatch,
                                        daemon=True)
        self._thread.start()

    def _gather_rows(self, items):
        """items: [(index, qids-or-None)] → (rows, questions) padded to
        coalesce_batch (pad repeats item 0; static shapes).

        TPU-first: rows come from the device-resident LRU
        (`_dev_sample`) — the only host→device bytes per dispatch are
        the [B, T] question rows (~KB). The first r4 load test shipped
        the full padded feature batch (~10 MB) per dispatch and lost
        2.9x to batch-1 on the bandwidth-starved relay; the reference
        rebuilds the whole torch batch per request
        (demo_server.py:49-61,235)."""
        rows, qrows = [], []
        for idx, qids in items:
            rows.append(self._dev_sample(idx))
            qrows.append(qids if qids is not None
                         else np.asarray(self.ds.questions[idx]))
        while len(rows) < self.coalesce_batch:
            rows.append(rows[0])
            qrows.append(qrows[0])
        questions = np.stack(qrows).astype(np.int32)
        return tuple(rows), jnp.asarray(questions)

    def _stack(self, items):
        """Materialized padded device batch (artifact path + warm-up):
        on-device concat of the cached rows, one jitted program."""
        rows, questions = self._gather_rows(items)
        return self._stack_jit(rows, questions)

    def _dispatch(self):
        """Folding loop with backpressure: collect up to coalesce_batch
        requests (linger for stragglers), then KEEP folding until a
        device slot frees up — while every chip is busy, new arrivals
        join the current batch instead of spawning queued batches, so
        at most `replicas` batches are in flight (bounded device
        memory) and load coalesces into full buckets instead of
        trickling out as padded near-empty ones."""
        import queue
        while True:
            first = self._q.get()
            items = [first]
            deadline = time.time() + self.linger_s
            while len(items) < self.coalesce_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            device = None
            while device is None:
                if len(items) >= self.coalesce_batch:
                    device = self._free.get()
                    break
                try:
                    device = self._free.get_nowait()
                except queue.Empty:
                    try:                    # fold while chips are busy
                        items.append(self._q.get(timeout=0.001))
                    except queue.Empty:
                        pass
            self.stats["batches"] += 1
            self.stats["requests"] += len(items)
            self.stats["coalesced"] += len(items) > 1
            self.stats["max_batch"] = max(self.stats["max_batch"],
                                          len(items))
            try:
                if len(items) == 1:
                    idx, qids, _, _ = items[0]
                    work = ("batch", self._batch_for(idx, qids))
                elif self._stack_decode is not None:
                    work = ("fused", self._gather_rows(
                        [(i, q) for i, q, _, _ in items]))
                else:                       # artifact: plain-batch sig
                    work = ("batch", self._stack(
                        [(i, q) for i, q, _, _ in items]))
            except Exception as e:          # report, don't kill serving
                self._free.put(device)
                for *_, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            self._pool.submit(self._execute, items, work, device)

    def _execute(self, items, work, device):
        """Runs on a pool thread; `device` (an execution slot — each
        chip appears pipeline_depth times) was reserved by the
        dispatcher (backpressure) and is released here."""
        kind, payload = work
        try:
            try:
                self.stats["per_device"][str(device)] += 1
                params = self._params_dev[device]
                if kind == "fused":
                    rows, questions = payload
                    if len(self.devices) > 1:
                        rows = jax.device_put(rows, device)
                        questions = jax.device_put(questions, device)
                    out = self._stack_decode(params, rows, questions)
                else:
                    batch = payload
                    if len(self.devices) > 1:
                        batch = jax.device_put(batch, device)
                    fn = (self._decode if len(items) == 1
                          else self._decode_n)
                    out = fn(params, batch)
                seqs = np.asarray(out["seq"])
                # module weights cross device->host only when some
                # request in this batch asked for detail (the web
                # client); the hot no-detail path skips the fetch
                mws = (np.asarray(out["module_weights"])
                       if any(d for _, _, d, _ in items) else None)
            finally:
                self._free.put(device)
            for k, (idx, qids, _, fut) in enumerate(items):
                fut.set_result((seqs[k],
                                mws[k] if mws is not None else None,
                                idx, qids))
        except Exception as e:              # report, don't kill serving
            for *_, fut in items:
                if not fut.done():
                    fut.set_exception(e)

    def drain(self, timeout_s: float = 60.0) -> bool:
        """Wait until no request is queued and every device slot is
        free (shutdown path: never kill a TPU process mid-claim — it
        can wedge the chip; memory: axon-tpu-quirks)."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if (self._q.empty()
                    and self._free.qsize() == self._slots):
                return True
            time.sleep(0.05)
        return False

    def answer(self, question_text: Optional[str],
               index: Optional[int] = None,
               detail: bool = False) -> dict:
        from concurrent.futures import Future
        idx = self.index if index is None else int(index)
        qids = (self.question_to_ids(question_text)
                if question_text else None)
        t0 = time.time()
        fut: Future = Future()
        self._q.put((idx, qids, detail, fut))
        seq, mw, idx, qids = fut.result(timeout=120)
        res = {"answer": self.vocab.decode(seq), "index": idx,
               "latency_ms": round(1000 * (time.time() - t0), 2),
               "question_tokens": (qids[qids > 0].tolist()
                                   if qids is not None else None)}
        if detail:
            res.update(self._detail_fields(seq, mw))
        return res


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                from ekaid_tpu.serving.webui import PAGE_HTML
                body = PAGE_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/health"):
                info = {"status": "ok",
                        "index": engine.index,
                        "vocab_size": engine.vocab.size}
                if hasattr(engine, "stats"):
                    info["coalescing"] = dict(engine.stats)
                self._send(info)
            elif self.path.startswith("/sample"):
                q = self.path.split("index=")
                idx = int(q[1]) if len(q) > 1 else None
                try:
                    self._send(engine.sample_info(idx))
                except Exception as e:
                    self._send({"error": str(e)}, 400)
            elif self.path.startswith("/image"):
                from urllib.parse import parse_qs, urlparse
                qs = parse_qs(urlparse(self.path).query)
                try:
                    body = engine.image_bytes(
                        int(qs["index"][0]) if "index" in qs else None,
                        qs.get("which", ["main"])[0])
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except FileNotFoundError as e:
                    self._send({"error": str(e)}, 404)
            else:
                self._send({"error": "unknown path"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._send({"error": "invalid JSON body"}, 400)
            if self.path.startswith("/question"):
                text = payload.get("question")
                if not text:
                    return self._send(
                        {"error": "missing 'question' field"}, 400)
                try:
                    self._send(engine.answer(
                        text, payload.get("index"),
                        detail=bool(payload.get("detail", False))))
                except Exception as e:
                    self._send({"error": str(e)}, 500)
            elif self.path.startswith("/refresh"):
                self._send({"index": engine.refresh()})
            else:
                self._send({"error": "unknown path"}, 404)

    return Handler


def main(argv=None):
    from ekaid_tpu.utils.platform import (apply_platform_env,
                                            enable_compile_cache)
    apply_platform_env()
    enable_compile_cache()   # axon remote compiles take minutes
    p = argparse.ArgumentParser(description="EKAID-TPU inference server")
    p.add_argument("--cfg", default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--port", type=int, default=4000)   # demo_server.py:376
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--image_dir", default=None,
                   help="PNG directory for the /image endpoint")
    p.add_argument("--coalesce_batch", type=int, default=16,
                   help="micro-batch bucket for concurrent requests "
                        "(0 disables coalescing: plain batch-1 engine)")
    p.add_argument("--linger_ms", type=float, default=2.0,
                   help="dispatcher wait for straggler requests")
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="in-flight coalesced batches per device "
                        "(fold/upload of batch k+1 overlaps execution/"
                        "fetch of batch k)")
    p.add_argument("--replicas", type=int, default=1,
                   help="serve from N local chips: per-device param "
                        "copies + N concurrent device slots (requires "
                        "coalescing; one in-flight program per chip)")
    p.add_argument("--export_artifact", default=None, metavar="DIR",
                   help="compile the decode at batch 1 (+ the coalesce "
                        "bucket) and save a pre-compiled serving "
                        "artifact to DIR, then exit (serving/artifact.py)")
    p.add_argument("--artifact", default=None, metavar="DIR",
                   help="serve from a pre-compiled artifact: zero "
                        "compiles at startup; params come from the "
                        "artifact (overrides --checkpoint_dir)")
    a = p.parse_args(argv)

    from ekaid_tpu.train.train import (build_synthetic_trainer,
                                       build_trainer)
    cfg = load_config(a.cfg) if a.cfg else default_config()
    if a.synthetic:
        trainer = build_synthetic_trainer(cfg, "/tmp/ekaid_serve")
    else:
        trainer = build_trainer(cfg, "/tmp/ekaid_serve", "test")
    if a.checkpoint_dir:
        from ekaid_tpu.utils.checkpoint import (CheckpointManager,
                                                abstract_like)
        mgr = CheckpointManager(a.checkpoint_dir)
        trainer.state = mgr.restore(abstract_like(trainer.state),
                                    name=a.checkpoint)
        print(f"loaded checkpoint step {int(trainer.state.step)}")

    if a.export_artifact:
        from ekaid_tpu.serving.artifact import save_artifact
        from ekaid_tpu.utils.dtypes import (Policy,
                                            cast_params_for_inference)
        params = cast_params_for_inference(
            trainer.state.params, Policy.from_config(cfg.dtypes))
        sample = {k: v for k, v in
                  trainer.eval_ds.sample(
                      int(trainer.eval_ds.split_idxs[0])).items()
                  if k != "pair_index"}
        sizes = ((1, a.coalesce_batch) if a.coalesce_batch > 0 else (1,))
        save_artifact(a.export_artifact, trainer.model, params, sample,
                      batch_sizes=sizes)
        print(f"exported artifact to {a.export_artifact} "
              f"(batch sizes {sorted(set(sizes))})")
        return

    artifact = None
    if a.artifact:
        from ekaid_tpu.serving.artifact import load_artifact
        artifact = load_artifact(a.artifact)
        print(f"loaded artifact from {a.artifact} "
              f"(platform {artifact.meta['platform']}, "
              f"batch sizes {artifact.meta['batch_sizes']})")

    if a.coalesce_batch > 0:
        engine: InferenceEngine = CoalescingEngine(
            trainer, image_dir=a.image_dir,
            coalesce_batch=a.coalesce_batch, linger_ms=a.linger_ms,
            artifact=artifact, replicas=a.replicas,
            pipeline_depth=a.pipeline_depth)
    else:
        if a.replicas > 1:
            raise SystemExit("--replicas requires coalescing "
                             "(--coalesce_batch > 0)")
        engine = InferenceEngine(trainer, image_dir=a.image_dir,
                                 artifact=artifact)
    # deep listen backlog: socketserver's default request_queue_size=5
    # drops connections (RST) under request bursts larger than the
    # handler-thread spin-up rate — measured 14/128 resets on a
    # 128-connect burst (r5 verify); 128 absorbs any burst the
    # coalescing engine can batch
    class _Server(ThreadingHTTPServer):
        request_queue_size = 128

    server = _Server((a.host, a.port), make_handler(engine))

    # graceful shutdown: stop accepting, drain in-flight decodes, then
    # exit — never die mid-device-claim (it can wedge the chip; memory:
    # axon-tpu-quirks)
    import signal
    import threading

    def _shutdown(signum, frame):
        print(f"signal {signum}: draining and shutting down")
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)
    print(f"serving on http://{a.host}:{a.port}")
    server.serve_forever()
    if hasattr(engine, "drain"):
        ok = engine.drain()
        print("drained cleanly" if ok else "drain timed out")


if __name__ == "__main__":
    main()
