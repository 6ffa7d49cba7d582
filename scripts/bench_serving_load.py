"""Concurrent-serving load test: coalescing vs single-flight (VERDICT r2
do #8).

Starts the inference server in-process (synthetic eval set, flagship
config unless --small), drives N concurrent HTTP clients each issuing M
/question requests, and reports answers/sec + latency percentiles, for
both engines:

  * coalesce=0  — plain batch-1 engine (requests serialize on the chip)
  * coalesce=K  — CoalescingEngine micro-batching (default 16)

On TPU, run single-flight per memory/axon-tpu-quirks:
  timeout 3600 python scripts/bench_serving_load.py --clients 16

Note the axon relay adds ~35 ms fixed roundtrip per device call; the
coalescing gain shows up in aggregate answers/sec (one relay roundtrip
per BATCH instead of per request), which is also what a relay-free TPU
host would see, scaled down.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_load(port: int, clients: int, per_client: int):
    from concurrent.futures import ThreadPoolExecutor
    base = f"http://127.0.0.1:{port}"
    lat = []
    lock = threading.Lock()

    def one_client(c):
        times = []
        for m in range(per_client):
            req = urllib.request.Request(
                base + "/question",
                data=json.dumps({"question": "what has changed"}).encode())
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=300) as r:
                json.loads(r.read())
            times.append(time.perf_counter() - t0)
        with lock:
            lat.extend(times)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as ex:
        list(ex.map(one_client, range(clients)))
    wall = time.perf_counter() - t0
    lat.sort()
    n = len(lat)
    return {
        "answers_per_sec": round(n / wall, 2),
        "p50_ms": round(1e3 * lat[n // 2], 1),
        "p99_ms": round(1e3 * lat[min(n - 1, int(n * 0.99))], 1),
        "n": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--per_client", type=int, default=8)
    ap.add_argument("--coalesce", type=int, default=16)
    ap.add_argument("--replicas", type=int, default=1,
                    help="also load-test N device replicas (>1)")
    ap.add_argument("--small", action="store_true",
                    help="shrunken config (CPU smoke)")
    a = ap.parse_args()

    import socket
    if not os.environ.get("EKAID_PLATFORM"):
        # relay guard (memory: axon-tpu-quirks) — a dead relay makes
        # device init hang indefinitely, not fail
        try:
            socket.create_connection(("127.0.0.1", 8083),
                                     timeout=3).close()
        except OSError:
            print(json.dumps({"error": "axon relay down; set "
                              "EKAID_PLATFORM=cpu to run on CPU"}))
            sys.exit(1)

    from ekaid_tpu.utils.platform import (apply_platform_env,
                                          enable_compile_cache)
    apply_platform_env()
    enable_compile_cache()

    from http.server import ThreadingHTTPServer

    from ekaid_tpu.config import default_config
    from ekaid_tpu.serving.server import (CoalescingEngine,
                                          InferenceEngine, make_handler)
    from ekaid_tpu.train.train import build_synthetic_trainer

    cfg = default_config()
    if a.small:
        cfg = cfg.replace(
            change_detector=cfg.change_detector.replace(
                att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
            speaker=cfg.speaker.replace(
                input_dim=32, rnn_size=16, embed_input_dim=96,
                embed_dim=32, word_embed_size=8, seq_length=8),
            data=cfg.data.replace(num_nodes=6, feature_dim=24,
                                  adj_pad=10),
            question=cfg.question.replace(hidden_dim=32))
    trainer = build_synthetic_trainer(cfg, "/tmp/ekaid_load", n_pairs=64)

    results = {}
    modes = [("single_flight", lambda: InferenceEngine(trainer))]
    if a.coalesce > 0:                # 0 = batch-1 engine only
        modes.append((f"coalesce_{a.coalesce}",
                      lambda: CoalescingEngine(trainer,
                                               coalesce_batch=a.coalesce)))
    if a.replicas > 1:                # multi-chip scale-out (or the
        modes.append((                # 8-virtual-device CPU test env)
            f"coalesce_{a.coalesce}_x{a.replicas}",
            lambda: CoalescingEngine(trainer, coalesce_batch=a.coalesce,
                                     replicas=a.replicas)))
    for mode, make in modes:
        engine = make()
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(engine))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        r = run_load(port, a.clients, a.per_client)
        if hasattr(engine, "stats"):
            r["stats"] = dict(engine.stats)
        results[mode] = r
        print(json.dumps({mode: r}))
        server.shutdown()

    sf = results["single_flight"]["answers_per_sec"]
    if a.coalesce > 0:
        co = results[f"coalesce_{a.coalesce}"]["answers_per_sec"]
        print(json.dumps({"speedup": round(co / sf, 2),
                          "clients": a.clients}))


if __name__ == "__main__":
    main()
