"""Checkpointing: params + opt_state + step via orbax.

The reference saves {change_detector_state, speaker_state, model_cfg}
every snapshot_interval and a Bleu_1-keyed checkpoint_best
(train_mimic.py:281-290, 379-383, utils/utils.py:11-23) but drops
optimizer state — resume restarts optimization (SURVEY.md §5). Here the
full TrainState (step, params, opt_state) round-trips, and the resolved
config is saved alongside as JSON.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ekaid_tpu.train.step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, name) -> str:
        return os.path.join(self.directory, str(name))

    def save(self, state: TrainState, name: Optional[str] = None,
             config_dict: Optional[dict] = None, force: bool = True):
        name = name if name is not None else int(state.step)
        path = self._path(name)
        self._ckptr.save(path, state, force=force)
        self._ckptr.wait_until_finished()
        if config_dict is not None:
            with open(os.path.join(self.directory, "cfg.json"), "w") as f:
                json.dump(config_dict, f, indent=2)
        self._gc()
        return path

    def save_best(self, state: TrainState, metric: float,
                  config_dict: Optional[dict] = None):
        """checkpoint_best keyed on Bleu_1 (train_mimic.py:379-383)."""
        path = self.save(state, name="best", config_dict=config_dict)
        with open(os.path.join(self.directory, "best_metric.json"),
                  "w") as f:
            json.dump({"Bleu_1": metric, "step": int(state.step)}, f)
        return path

    def best_metric(self) -> float:
        p = os.path.join(self.directory, "best_metric.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)["Bleu_1"]
        return 0.0

    def restore(self, abstract_state: TrainState,
                name: Optional[str] = None) -> TrainState:
        if name is None:
            name = self.latest_step()
            assert name is not None, f"no checkpoints in {self.directory}"
        return self._ckptr.restore(self._path(name), abstract_state)

    def latest_step(self) -> Optional[int]:
        steps = [int(d) for d in os.listdir(self.directory)
                 if d.isdigit()]
        return max(steps) if steps else None

    def _gc(self):
        steps = sorted(int(d) for d in os.listdir(self.directory)
                       if d.isdigit())
        for s in steps[:-self.keep]:
            import shutil
            shutil.rmtree(self._path(s), ignore_errors=True)


def abstract_like(state: TrainState) -> TrainState:
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
