"""Numerical parity: converted torch weights must reproduce torch outputs.

These tests build torch modules matching the reference's atoms
(weight-norm Linear, LSTMCell, GRU, FCNet stacks), convert their weights
via ekaid_tpu.tools.torch_convert, and assert the flax modules produce
the same outputs — validating gate orders, transposes, and weight-norm
semantics end-to-end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ekaid_tpu.models.layers import GRU, LSTMCell, WNDense, FCNet  # noqa: E402
from ekaid_tpu.tools import torch_convert as tc  # noqa: E402
from ekaid_tpu.utils.dtypes import F32  # noqa: E402

RTOL = 2e-5
ATOL = 1e-5


def to_np(t):
    return t.detach().numpy()


def test_wndense_matches_torch_weight_norm():
    from torch.nn.utils import weight_norm
    lin = weight_norm(torch.nn.Linear(6, 4), dim=None)
    sd = {f"wn.{k}": v for k, v in lin.state_dict().items()}
    params = tc._wn_linear(sd, "wn")
    x = np.random.default_rng(0).standard_normal((3, 6)).astype(np.float32)
    want = to_np(lin(torch.from_numpy(x)))
    got = WNDense(4, policy=F32).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL,
                               atol=ATOL)


def test_lstm_cell_matches_torch():
    cell = torch.nn.LSTMCell(10, 8)
    sd = {f"c.{k}": v for k, v in cell.state_dict().items()}
    params = tc._lstm_cell(sd, "c")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 10)).astype(np.float32)
    h = rng.standard_normal((4, 8)).astype(np.float32)
    c = rng.standard_normal((4, 8)).astype(np.float32)
    want_h, want_c = cell(torch.from_numpy(x),
                          (torch.from_numpy(h), torch.from_numpy(c)))
    got_h, got_c = LSTMCell(8, policy=F32).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(h),
        jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got_h), to_np(want_h),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_c), to_np(want_c),
                               rtol=RTOL, atol=ATOL)


def test_gru_matches_torch():
    gru = torch.nn.GRU(6, 5, 1, batch_first=True)
    sd = {f"g.{k}": v for k, v in gru.state_dict().items()}
    params = tc._gru(sd, "g")
    x = np.random.default_rng(2).standard_normal((3, 7, 6)).astype(
        np.float32)
    want, _ = gru(torch.from_numpy(x))
    got = GRU(5, policy=F32).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), to_np(want), rtol=1e-4,
                               atol=1e-4)


def test_fcnet_stack_matches_torch():
    """FCNet([a, b], act=None, dropout=.2): Dropout → wn Linear; eval
    mode makes dropout identity (fc.py:15-39 structure)."""
    from torch.nn.utils import weight_norm
    seq = torch.nn.Sequential(
        torch.nn.Dropout(0.2),
        weight_norm(torch.nn.Linear(6, 4), dim=None))
    seq.eval()
    sd = {f"f.main.{i}.{k}": v for i, m in enumerate(seq)
          for k, v in m.state_dict().items()}
    params = tc._fcnet(sd, "f")
    x = np.random.default_rng(3).standard_normal((2, 6)).astype(
        np.float32)
    want = to_np(seq(torch.from_numpy(x)))
    got = FCNet([6, 4], act=None, dropout=0.2, policy=F32).apply(
        {"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL,
                               atol=ATOL)


def test_linear_transpose():
    lin = torch.nn.Linear(5, 3)
    sd = {f"l.{k}": v for k, v in lin.state_dict().items()}
    params = tc._linear(sd, "l")
    assert params["kernel"].shape == (5, 3)
    x = np.random.default_rng(4).standard_normal((2, 5)).astype(
        np.float32)
    want = to_np(lin(torch.from_numpy(x)))
    got = np.asarray(jnp.asarray(x) @ params["kernel"] + params["bias"])
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
