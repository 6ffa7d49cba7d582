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
