"""Profiling and step timing.

The reference has no tracing/profiling at all — only progress prints and a
``cudaDeviceSynchronize`` before returning from training (lrcn.jl:241,
381-385; SURVEY.md §5).  This module provides the TPU-native equivalents:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  XPlane traces viewable in TensorBoard/XProf;
- ``StepTimer``: wall-clock step statistics with correct device sync
  (synchronizes via a host transfer of a scalar, because experimental TPU
  runtimes may complete ``block_until_ready`` before execution finishes —
  measured in this repo, see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of all queued device work feeding ``tree``.

    Pulls one scalar per leaf to the host — unlike ``block_until_ready``
    this cannot return early on runtimes with lax completion semantics.
    """
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(jax.device_get(leaf.addressable_shards[0].data)
                       ).ravel()[:1]
        else:
            np.asarray(leaf).ravel()[:1]


@dataclass
class StepTimer:
    """Accumulates per-step wall times; sync only at measurement edges."""

    _times: list = field(default_factory=list)
    _t0: float | None = None

    def start(self, outputs=None) -> None:
        if outputs is not None:
            sync(outputs)
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if self._t0 is None:
            raise RuntimeError("stop() without start()")
        if outputs is not None:
            sync(outputs)
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        self._t0 = None
        return dt

    @property
    def count(self) -> int:
        return len(self._times)

    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    def percentile(self, p: float) -> float:
        return float(np.percentile(self._times, p)) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        m = self.mean()
        return items_per_step / m if m else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.count,
            "mean_s": round(self.mean(), 6),
            "p50_s": round(self.percentile(50), 6),
            "p95_s": round(self.percentile(95), 6),
        }
