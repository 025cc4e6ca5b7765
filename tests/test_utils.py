"""Profiling utilities tests."""

import jax.numpy as jnp
import numpy as np

from lrcn_tpu.utils import StepTimer
from lrcn_tpu.utils.profiling import sync


def test_step_timer_basic():
    t = StepTimer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        t.start()
        y = x * 2
        t.stop(y)
    assert t.count == 3
    assert t.mean() > 0
    s = t.summary()
    assert s["steps"] == 3 and s["p95_s"] >= s["p50_s"] >= 0
    assert t.throughput(10) > 0


def test_sync_handles_pytrees():
    sync({"a": jnp.ones((4,)), "b": [jnp.zeros((2, 2))]})
    sync(np.ones(3))
