"""Step metrics: rays/s accounting + JSONL logging + profiling hooks.

Generalizes the reference's live stats panel (SURVEY.md §3.4: wall time
between WorkQueueStart and the last worker's completion stamp, total rays
cast, avg ns per ray — reference main.cpp:840-849, wasm/wasm.cpp:199-212)
into structured per-step records on stdout/file, plus an optional
jax.profiler trace (the tracing subsystem, SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import IO, Optional

import jax


def hard_timeit(step, *args, iters: int = 3) -> float:
    """Wall time per step with a HARD host fetch of the first output leaf
    after the loop.

    Through the axon TPU tunnel, `jax.block_until_ready` on the final
    dispatch has been observed to return before execution completes (the
    r3 config-1 342M rays/s row was async-optimistic garbage at the 0.2 ms
    scale — BASELINE.md "Timing-method correction"); a device->host
    transfer cannot return early. This mirrors the reference's discipline
    of stamping completion time from the LAST finisher, never the
    dispatcher (reference wasm/wasm.cpp:643-647). Callers keep per-step
    outputs SMALL (a scalar reduction or a grad pytree) so the fetch is
    negligible. Shared by bench.py and tools/bench_matrix.py so no code
    path in the artifact-of-record tools can produce an async-optimistic
    number.
    """
    import numpy as np
    out = step(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Wall-time a device computation (device-synchronized on both edges)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False

    @staticmethod
    def timed(fn, *args):
        """Run fn(*args), block until ready -> (result, seconds)."""
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        return out, time.perf_counter() - t0


class MetricsLogger:
    """JSONL metrics stream (the stats panel, minus the DOM)."""

    def __init__(self, stream: Optional[IO] = None, path: Optional[str] = None):
        self._own = None
        if path is not None:
            self._own = open(path, "a")
            self.stream = self._own
        else:
            self.stream = stream or sys.stdout

    def log(self, **record) -> dict:
        record.setdefault("ts", time.time())
        self.stream.write(json.dumps(record) + "\n")
        self.stream.flush()
        return record

    def log_pass(self, *, rays: int, seconds: float, **extra) -> dict:
        """One progressive pass: the reference's three stat spans."""
        return self.log(
            rays_cast=int(rays),
            seconds=round(seconds, 6),
            rays_per_s=round(rays / seconds, 1) if seconds > 0 else None,
            ns_per_ray=round(seconds / rays * 1e9, 3) if rays else None,
            **extra,
        )

    def close(self):
        if self._own is not None:
            self._own.close()


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
