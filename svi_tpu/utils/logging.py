"""Training/inference observability: JSONL metrics + optional JAX profiler.

The reference's observability is Lightning `self.log` of train_loss + buffer
stats (train_svi.py:1185-1199) with an unwired SwanLab flag and tqdm bars
(SURVEY §5: metrics "partial", profiling "none"). TPU-native equivalents:

  * MetricsLogger — append-only metrics.jsonl (step, wall time, arbitrary
    scalars) next to the experiment's args.json; cheap enough to call every
    step, trivially greppable/plottable.
  * profile_trace — context manager around jax.profiler.trace: dumps an
    xprof/tensorboard trace directory for any region (a denoise step, a train
    step) when --profile_dir is passed to the CLIs.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricsLogger:
    """Append-only JSONL metrics stream (one object per call)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self.path = path
        self._t0 = time.time()
        self._fh = open(path, "a", buffering=1)

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "wall_time": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    def close(self):
        self._fh.close()


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace around a region; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
