"""Throughput counters and device tracing.

The reference's only observability is wall-clock benchmark prints
(reference benchmark_pytorch.py:44-153, pytorch_backend.py:593-621
get_model_info). Here: an RTF/chunks-per-second tracker that the demix
progress callback can feed, a params/size report, and a context manager
around ``jax.profiler.trace`` for on-device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class ThroughputTracker:
    """Track realtime factor and chunk throughput during separation."""

    sample_rate: int = 44100
    started: float = field(default_factory=time.time)
    samples_done: int = 0
    chunks_done: int = 0

    def update(self, samples: int = 0, chunks: int = 0) -> None:
        self.samples_done += samples
        self.chunks_done += chunks

    @property
    def elapsed(self) -> float:
        return max(1e-9, time.time() - self.started)

    @property
    def rtf(self) -> float:
        """Audio seconds processed per wall second (per chip)."""
        return (self.samples_done / self.sample_rate) / self.elapsed

    @property
    def chunks_per_sec(self) -> float:
        return self.chunks_done / self.elapsed

    def report(self) -> str:
        return (f"{self.samples_done / self.sample_rate:.1f}s audio in "
                f"{self.elapsed:.1f}s — RTF {self.rtf:.1f}x, "
                f"{self.chunks_per_sec:.2f} chunks/s")


def get_model_info(params, model_type: str = "") -> dict:
    """Parameter count / memory report (reference pytorch_backend.py:593-621)."""
    import jax

    leaves = jax.tree.leaves(params)
    n_params = int(sum(np.size(l) for l in leaves))
    n_bytes = int(sum(np.size(l) * np.dtype(l.dtype).itemsize for l in leaves))
    return {
        "model_type": model_type,
        "parameters": n_params,
        "size_mb": n_bytes / 1024 / 1024,
        "arrays": len(leaves),
    }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device profile around a block (view with tensorboard/xprof)."""
    import jax

    # start OUTSIDE the try: if start_trace itself raises (e.g. a trace is
    # already active), stopping here would finalize the OUTER trace
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
