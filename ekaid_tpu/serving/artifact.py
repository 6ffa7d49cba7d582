"""Pre-compiled serving artifacts (AOT deployment).

No reference counterpart: the reference's demo_server.py:309-435
rebuilds the torch model per process (eager — no compile step to
amortize). Here the expensive startup cost is XLA compilation — the
full decode program takes minutes through the axon remote-compile
service — and the persistent compile cache
(utils/platform.enable_compile_cache) only hides repeats on the same
host fingerprint. An artifact pins the *compiled executable* itself,
so a fleet of identical TPU serving hosts compiles once:

    ekaid-serve --export_artifact art/ [--checkpoint_dir ...]  # once
    ekaid-serve --artifact art/ ...        # zero-compile startup

Layout (a directory):
    meta.json        platform, jax version, batch sizes, batch shapes
    params.msgpack   inference-cast params (flax msgpack, raw tree)
    decode_b{B}.exe  pickled (payload, in_tree, out_tree) from
                     jax.experimental.serialize_executable

XLA executables are platform- and topology-pinned; loading checks the
recorded platform against the live backend and raises early with a
clear message instead of a deep XLA error. The StableHLO-level
portable alternative (jax.export) deliberately isn't offered: it
re-compiles at load, which is exactly the cost this artifact removes —
portable deployment across platforms is what checkpoints are for.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Callable, Dict

import jax
import numpy as np

_META = "meta.json"
_PARAMS = "params.msgpack"


def _decode_fn(model) -> Callable:
    def decode(params, batch):
        return model.apply(params, batch, method="decode",
                           sample_max=True)
    return decode


def save_artifact(path: str, model, params, sample: Dict[str, np.ndarray],
                  batch_sizes=(1, 16)) -> None:
    """Compile the greedy decode at each batch size and serialize.

    `sample`: one dataset item (no batch dim, `pair_index` removed) —
    its shapes/dtypes define the serving batch layout. `params` should
    already be the inference-cast copy the server uses
    (utils/dtypes.cast_params_for_inference).
    """
    from flax import serialization
    from jax.experimental import serialize_executable as se

    os.makedirs(path, exist_ok=True)
    sizes = sorted({int(b) for b in batch_sizes})
    assert sizes and sizes[0] >= 1
    decode = _decode_fn(model)
    params_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)
    # canonicalize host dtypes exactly as the engines' jnp.asarray does
    # (int64 sample fields become int32 under x64-off) — the executable
    # must be lowered for the dtypes it will actually be fed
    import jax.numpy as jnp
    canon = {k: jnp.asarray(v) for k, v in sample.items()}
    for b in sizes:
        batch_abs = {k: jax.ShapeDtypeStruct((b, *v.shape), v.dtype)
                     for k, v in canon.items()}
        compiled = jax.jit(decode).lower(params_abs, batch_abs).compile()
        blob = pickle.dumps(se.serialize(compiled))
        with open(os.path.join(path, f"decode_b{b}.exe"), "wb") as f:
            f.write(blob)
    with open(os.path.join(path, _PARAMS), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(np.asarray, params)))
    meta = {
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
        "num_devices": jax.device_count(),
        "batch_sizes": sizes,
        "sample_shapes": {k: [list(v.shape), str(v.dtype)]
                          for k, v in sample.items()},
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


class Artifact:
    """Loaded serving artifact: `.params` (on device) and
    `.decode_fns[B](params, batch)` per exported batch size."""

    def __init__(self, meta: Dict[str, Any], params,
                 decode_fns: Dict[int, Callable]):
        self.meta = meta
        self.params = params
        self.decode_fns = decode_fns

    def fn_for_batch(self, b: int) -> Callable:
        if b not in self.decode_fns:
            raise ValueError(
                f"artifact has no batch-{b} decode; exported sizes: "
                f"{sorted(self.decode_fns)} — re-export with "
                f"batch_sizes including {b}")
        return self.decode_fns[b]

    def check_sample(self, sample: Dict[str, Any]) -> None:
        """Raise a clear error if the live dataset's per-sample shapes
        differ from what the executables were traced at (otherwise the
        mismatch surfaces as a deep aval error at the first decode)."""
        rec = self.meta.get("sample_shapes", {})
        for k, (shape, _dtype) in rec.items():
            if k not in sample or list(np.shape(sample[k])) != shape:
                got = (list(np.shape(sample[k])) if k in sample
                       else "absent")
                raise RuntimeError(
                    f"artifact shape mismatch for {k!r}: exported "
                    f"{shape}, live dataset {got} — the serving config "
                    f"must match the export config; re-export")


def load_artifact(path: str) -> Artifact:
    from flax import serialization
    from jax.experimental import serialize_executable as se

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    live = jax.default_backend()
    if meta["platform"] != live:
        raise RuntimeError(
            f"artifact was compiled for platform {meta['platform']!r} "
            f"but the live backend is {live!r}; XLA executables are "
            f"platform-pinned — re-export on this platform")
    if meta["jax_version"] != jax.__version__:
        raise RuntimeError(
            f"artifact was exported under jax {meta['jax_version']} but "
            f"this process runs jax {jax.__version__}; serialized "
            f"executables are not stable across versions — re-export")
    device = jax.devices()[0]
    with open(os.path.join(path, _PARAMS), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    params = jax.device_put(params, device)
    fns: Dict[int, Callable] = {}
    for b in meta["batch_sizes"]:
        with open(os.path.join(path, f"decode_b{b}.exe"), "rb") as f:
            payload, in_tree, out_tree = pickle.loads(f.read())
        # the decode is compiled single-device (serving is per-chip);
        # deserialize_and_load defaults to ALL local devices, which
        # mis-loads it as an N-shard executable on multi-device hosts
        fns[int(b)] = se.deserialize_and_load(
            payload, in_tree, out_tree, execution_devices=[device])
    return Artifact(meta, params, fns)
