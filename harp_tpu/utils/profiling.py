"""Profiling / observability (SURVEY.md §5: the reference has none beyond
tqdm + prints).

- Timer: wall-clock context manager with optional device sync.
- trace: context manager around jax.profiler for on-device traces.
- MetricsLogger: JSONL scalar logging (the reference's TensorBoard scalars,
  optimize_sequence.py:560-585, in a dependency-free format).
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class Timer:
    def __init__(self, sync=None):
        self._sync = sync

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            import jax

            jax.block_until_ready(self._sync)
        self.elapsed = time.perf_counter() - self.start
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code block (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code (shows up in device traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class MetricsLogger:
    """Append-only JSONL scalar logger."""

    def __init__(self, out_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._f = open(self.path, "a")

    def log(self, step: int, **scalars) -> None:
        rec = {"step": step, "ts": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
