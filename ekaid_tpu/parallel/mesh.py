"""Mesh construction and sharding rules.

The reference has no distributed layer at all (SURVEY.md §2.4: single GPU,
`CUDA_VISIBLE_DEVICES="0"`, no NCCL/MPI anywhere) — this module is the
TPU-native design that replaces it:

* **data parallelism** — batches shard over the 'data' mesh axis; XLA
  inserts the psum for gradients (GSPMD), riding ICI.
* **tensor parallelism** — the widest parameter matrices (GAT output
  mixers, GRU/LSTM input projections, vocabulary logits, embeddings) carry
  PartitionSpecs over the 'model' axis. With mesh.model == 1 (default —
  right for this model size) the rules are inert; wider model axes are
  exercised by the multi-chip dry-run and available for scaled-up variants.

Everything routes through `jax.sharding.NamedSharding` + `jax.jit`
in/out shardings; there are no manual collectives in the model code.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_cfg=None, devices=None,
              data: Optional[int] = None,
              model: Optional[int] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_cfg is not None:
        data = mesh_cfg.data if data is None else data
        model = mesh_cfg.model if model is None else model
    model = model or 1
    if data is None or data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    # explicit sizes may pin a SMALLER mesh than the host exposes (the
    # first data*model devices) — e.g. single-device eval on a
    # multi-chip host, or CPU tests of single-device gates on the
    # 8-virtual-device harness. Oversubscription still fails loudly.
    assert data * model <= n, (
        f"mesh {data}x{model} > {n} devices")
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# (param-path regex, PartitionSpec) — first match wins. Paths are
# '/'-joined flax param paths. Kernels are [in, out].
DEFAULT_PARAM_RULES: Sequence[Tuple[str, P]] = (
    # vocabulary logits: shard the vocab (output) dim
    (r".*speaker/logit/kernel$", P(None, "model")),
    # decoder fusion embed (3072 -> 1024): shard output
    (r".*speaker/embed/kernel$", P(None, "model")),
    # GAT head mixers (H*D -> D): shard the wide input dim
    (r".*linear_out_2/kernel$", P("model", None)),
    # GAT self-loop projections ((D+Q) -> D): shard input
    (r".*self_weights/WNDense_0/v$", P("model", None)),
    # question GRU input projection (600 -> 3H): shard output
    (r".*question/GRU_0/w_ih$", P(None, "model")),
    # LSTM input projections: shard input (concat features are wide)
    (r".*lstm/w_ih$", P("model", None)),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def param_shardings(mesh: Mesh, params,
                    rules: Sequence[Tuple[str, P]] = DEFAULT_PARAM_RULES):
    """Pytree of NamedShardings for params: rule match or replicated.

    Dims that don't divide the mesh axis fall back to replication — rules
    stay safe across config sizes.
    """
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def assign(path, leaf):
        s = _path_str(path)
        for pat, spec in compiled:
            if pat.match(s):
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    size = mesh.shape[axis]
                    if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                        ok = False
                        break
                if ok:
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch):
    """Shard every batch leaf over 'data' on its leading axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda _: s, batch)


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_shardings(mesh, batch))
