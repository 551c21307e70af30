"""Tracing/profiling: per-step timing and jax.profiler traces.

The reference only prints wall-clock deltas (reference experiment/run.py:
19-23,52-55; SURVEY.md §5.1). Here stream throughput (images/sec/chip) is a
first-class metric and XLA-level traces are one context manager away.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class Throughput:
    """Accumulates (images, seconds) across tasks; reports images/sec."""

    def __init__(self):
        self.images = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_images: int, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            np.asarray(sync)  # host fetch forces full pipeline sync
        self.seconds += time.time() - t0
        self.images += n_images

    def images_per_sec(self) -> float:
        return self.images / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ocl_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
