"""MFU flop accounting: the while-body supplement (bench.py).

XLA's cost_analysis counts a `while` body ONCE regardless of trip
count (and a pallas custom call as ~zero), so the scan-dominated
decode program's reported flops are essentially the encoder's alone —
BENCH r1-r3 MFU fields carried that undercount. bench.py now adds an
analytic per-step supplement (_decode_loop_tflops); these tests tie
the analytic figure to XLA's own count: compiling the decode program
and the encoder alone, the program-minus-encoder delta must equal one
loop body (plus the small question-GRU bodies and glue the supplement
deliberately omits).

Reference anchor for what is being accounted: the 90-token greedy loop
of dynamic_speaker_change_pos.py:224-266 run per eval batch
(test_mimic.py:92-137).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _decode_loop_tflops  # noqa: E402
from ekaid_tpu.data.synthetic import synthetic_batch  # noqa: E402
from ekaid_tpu.models.ekaid import EkaidModel  # noqa: E402
from ekaid_tpu.utils.dtypes import F32  # noqa: E402

from test_model import NTOKEN, tiny_config  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 4, seed=1))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    return cfg, model, batch, params


def _flops(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def test_supplement_matches_xla_body_count(setup):
    cfg, model, batch, params = setup
    B = batch["labels"].shape[0]

    enc_fl = _flops(
        lambda p, b: model.apply(p, b, method=model.encode), params, batch)
    dec_fl = _flops(
        lambda p, b: model.apply(p, b, method=model.decode,
                                 sample_max=True)["seq"], params, batch)

    delta = dec_fl - enc_fl
    body = _decode_loop_tflops(params, B, steps=1) * 1e12
    assert body > 0
    # the delta is one while body as XLA counts it, plus the question
    # GRU bodies / one-hot / sampling glue the supplement omits — the
    # analytic body must sit just below it, and must dominate it
    assert body <= delta * 1.001, (body, delta)
    assert body >= 0.5 * delta, (body, delta)


def test_supplement_scales_linearly(setup):
    cfg, model, batch, params = setup
    one = _decode_loop_tflops(params, 1, steps=1)
    assert _decode_loop_tflops(params, 7, steps=13) == \
        pytest.approx(one * 7 * 13, rel=1e-9)
    # the XLA while path drops the body cost_analysis already counted
    assert _decode_loop_tflops(params, 4, steps=10, counted_once=True) \
        == pytest.approx(one * 4 * 9, rel=1e-9)
