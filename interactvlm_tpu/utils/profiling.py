"""Observability: profiler capture, step timing, and metric logging.

The reference has only wall-clock meters + TB/wandb logging
(SURVEY.md §5 "tracing/profiling"); here:
- ``profile_trace``: context manager around ``jax.profiler`` (XPlane traces
  viewable in TensorBoard / xprof);
- ``StepTimer``: data/compute wall-clock split (the reference's
  batch_time/data_time meters, train.py:485-486);
- ``MetricLogger``: JSONL metric stream (always) + optional TensorBoard and
  wandb sinks when those packages exist (reference utils/utils.py:445-482).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    import jax

    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the xprof timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self):
        self.t_last = time.perf_counter()
        self.data_s = 0.0
        self.step_s = 0.0

    def mark_data(self):
        now = time.perf_counter()
        self.data_s = now - self.t_last
        self.t_last = now

    def mark_step(self):
        now = time.perf_counter()
        self.step_s = now - self.t_last
        self.t_last = now
        return {"data_secs": self.data_s, "step_secs": self.step_s}


class MetricLogger:
    """JSONL metrics with optional TensorBoard/wandb mirrors."""

    def __init__(self, log_dir: str, use_tb: bool = False,
                 use_wandb: bool = False, wandb_kwargs: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        self.wandb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                pass
        if use_wandb:
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self.wandb = wandb
            except Exception:
                pass

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def log_images(self, step: int, tag: str, image):
        """Log one (H, W, 3) float [0,1] image panel to TensorBoard
        (reference image panels, utils/utils.py:457-470)."""
        if self.tb is not None:
            import numpy as _np

            arr = _np.clip(_np.asarray(image, _np.float32), 0.0, 1.0)
            self.tb.add_image(tag, arr, step, dataformats="HWC")

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()


def mask_panel(clip_img, sam_img, pred_mask, gt_mask):
    """Concatenate CLIP image | SAM view | predicted mask | GT mask into one
    horizontal panel (the reference's TB image layout,
    utils/utils.py:457-470). Inputs are numpy arrays; masks are logits/
    labels and get normalized to [0, 1] grayscale RGB."""
    import numpy as np

    def to_rgb01(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 2:
            x = x[..., None].repeat(3, axis=-1)
        lo, hi = x.min(), x.max()
        return (x - lo) / (hi - lo + 1e-8)

    h = min(
        np.asarray(a).shape[0] for a in (clip_img, sam_img, pred_mask, gt_mask)
    )

    def fit(x):
        x = to_rgb01(x)
        s = x.shape[0] // h
        return x[::s, ::s][:h, :h] if s > 1 else x[:h, :h]

    return np.concatenate(
        [fit(clip_img), fit(sam_img), fit(pred_mask), fit(gt_mask)], axis=1
    )


def copy_code_snapshot(run_dir: str, repo_root: str = None):
    """Snapshot the framework sources into the run dir for reproducibility
    (reference ``copy_code``, utils/utils.py:402-425)."""
    import shutil

    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    dst = os.path.join(run_dir, "code_snapshot")
    src = os.path.join(root, "interactvlm_tpu")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(
        src, os.path.join(dst, "interactvlm_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
    )
    return dst
