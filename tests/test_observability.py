"""Observability + logging utility tests."""

import json
import time

from ekaid_tpu.utils.logging import MetricsLogger, read_metrics
from ekaid_tpu.utils.observability import StepTimer, log_compile_time


def test_step_timer_ema_and_throughput():
    t = StepTimer(alpha=0.5)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert 0.005 < t.ema < 0.1
    assert t.throughput(64) > 100


def test_metrics_logger_roundtrip(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log(1, {"loss": 1.5}, prefix="train/")
    lg.log(2, {"Bleu_1": 0.4}, prefix="eval/")
    lg.close()
    rows = read_metrics(str(tmp_path))
    assert len(rows) == 2
    assert rows[0]["train/loss"] == 1.5
    assert rows[1]["eval/Bleu_1"] == 0.4
    assert rows[0]["step"] == 1
    # file is valid JSONL
    with open(tmp_path / "metrics.jsonl") as f:
        for line in f:
            json.loads(line)


def test_log_compile_time_wrapper(capsys):
    import jax.numpy as jnp

    def f(x):
        return x * 2

    wrapped = log_compile_time(f, name="double")
    wrapped(jnp.ones(4))
    wrapped(jnp.ones(4))
    out = capsys.readouterr().out
    assert "compile+run" in out and "[double] run" in out


def test_xplane_wire_parser_roundtrip(tmp_path):
    """scripts/profile_capture.py parses .xplane.pb with a hand-rolled
    protobuf wire reader (no xplane_pb2 in this env). Build a tiny
    XSpace by hand-encoding the wire format and check the aggregation:
    one TPU plane with two events of one op, one host plane ignored."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__),
                                      "..", "scripts"))
    from profile_capture import summarize_xplane

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def tag(fno, wt):
        return varint(fno << 3 | wt)

    def ld(fno, payload):
        return tag(fno, 2) + varint(len(payload)) + payload

    def vi(fno, v):
        return tag(fno, 0) + varint(v)

    def event(mid, dur_ps):
        return vi(1, mid) + vi(3, dur_ps)

    # XPlane: name=2, lines=3, event_metadata=4 (map {key=1, value=2})
    line = ld(4, event(7, 3_000_000_000)) + ld(4, event(7, 2_000_000_000))
    tpu_plane = (ld(2, b"/device:TPU:0") + ld(3, line)
                 + ld(4, vi(1, 7) + ld(2, vi(1, 7) + ld(2, b"fusion.1"))))
    host_plane = (ld(2, b"/host:CPU")
                  + ld(3, ld(4, event(1, 9_000_000_000)))
                  + ld(4, vi(1, 1) + ld(2, vi(1, 1) + ld(2, b"hostop"))))
    space = ld(1, tpu_plane) + ld(1, host_plane)

    d = tmp_path / "plugins"
    d.mkdir()
    (d / "vm.xplane.pb").write_bytes(space)
    out = summarize_xplane(str(tmp_path))
    assert out["planes"] == ["/device:TPU:0", "/host:CPU"]
    assert out["top_ops"] == [{"plane": "/device:TPU:0",
                               "op": "fusion.1",
                               "total_ms": 5.0, "count": 2}]
