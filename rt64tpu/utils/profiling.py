"""Profiling & tracing — the observability the reference lacks.

The reference's only tracing is a breadcrumb log file compiled out in
release (RT64_LOG_* macros, rt64_common.h:153-162) plus named GPU
resources for PIX. Here:

  * FrameTimer: wall-clock per-pass timing with device sync, for
    coarse stage breakdowns.
  * trace(): context manager around jax.profiler for real TPU traces
    viewable in TensorBoard/XProf.
  * stage_bench(): amortized device-side timing (scan-looped) immune
    to dispatch-tunnel latency.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict

import jax
import numpy as np


class FrameTimer:
    """Accumulates per-stage wall times; call report() for a table."""

    def __init__(self):
        self.times = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [f"{'stage':<28}{'ms':>10}{'%':>7}"]
        for name, t in self.times.items():
            lines.append(f"{name:<28}{t * 1e3:>10.2f}{100 * t / total:>6.1f}%")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rt64tpu_trace"):
    """jax.profiler trace around a block (open with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def stage_bench(name, step, init_carry, iters: int = 20, reps: int = 3):
    """Device-side amortized timing: step: carry -> carry, scanned
    `iters` times inside one jit so per-dispatch latency washes out."""

    def run(carry):
        def body(c, _):
            return step(c), None

        out, _ = jax.lax.scan(body, carry, None, length=iters)
        return out

    jf = jax.jit(run)
    out = jf(init_carry)
    jax.tree.map(np.asarray, out)
    t0 = time.time()
    for _ in range(reps):
        out = jf(init_carry)
    jax.tree.map(np.asarray, out)
    ms = (time.time() - t0) / reps / iters * 1e3
    return ms
