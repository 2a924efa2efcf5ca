"""Checkpointing: orbax save/restore with best-metric gating and config
persistence.

Replaces the reference's DeepSpeed checkpoint flow (``train.py:421-472``):
- periodic + best checkpoints under ``runs/<exp>/ckpt`` (the reference's
  rank-0 delete + barrier becomes orbax's atomic directory swap);
- ``config.json`` persisted next to the run (train.py:194-195) and
  re-hydrated at eval (eval_utils.py:215-244);
- resume restores params/opt state/step (train.py:391-408).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_jsonable(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, type):
        return str(obj)
    if hasattr(obj, "dtype") and np.ndim(obj) == 0:
        return obj.item()
    if hasattr(obj, "__name__"):
        return obj.__name__
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        return str(obj)


def save_config(run_dir: str, config: Any, name: str = "config.json"):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, name), "w") as f:
        json.dump(_to_jsonable(config), f, indent=2)


def load_config(run_dir: str, name: str = "config.json") -> Dict:
    with open(os.path.join(run_dir, name)) as f:
        return json.load(f)


class CheckpointManager:
    """Thin orbax wrapper: step checkpoints + a tracked best checkpoint."""

    def __init__(self, run_dir: str, max_to_keep: int = 2):
        self.run_dir = os.path.abspath(run_dir)
        self.mgr = ocp.CheckpointManager(
            os.path.join(self.run_dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self.best_dir = os.path.join(self.run_dir, "ckpt_best")
        self.best_score: Optional[float] = self._load_best_score()

    def _load_best_score(self):
        meta = os.path.join(self.run_dir, "best_score.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)["score"]
        return None

    def save(self, step: int, state):
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        self.mgr.wait_until_finished()

    def save_best(self, step: int, state, score: float,
                  higher_is_better: bool = True):
        """Best-metric-gated save (reference train.py:434-468)."""
        improved = (
            self.best_score is None
            # tie -> update: among equal scores prefer the most-trained
            # params (otherwise a flat early metric pins "best" to the
            # first checkpoint forever -- e.g. val F1 0.0 while the CE
            # leg is still learning)
            or score == self.best_score
            or (score > self.best_score) == higher_is_better
        )
        if not improved:
            return False
        self.best_score = score
        ckptr = ocp.StandardCheckpointer()
        tmp = self.best_dir + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        ckptr.save(tmp, state)
        ckptr.wait_until_finished()
        import shutil

        if os.path.exists(self.best_dir):
            shutil.rmtree(self.best_dir)
        os.rename(tmp, self.best_dir)
        with open(os.path.join(self.run_dir, "best_score.json"), "w") as f:
            json.dump({"score": score, "step": step}, f)
        return True

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_like, step: Optional[int] = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def restore_best(self, state_like):
        if not os.path.exists(self.best_dir):
            return None
        return ocp.StandardCheckpointer().restore(
            self.best_dir, target=state_like
        )
