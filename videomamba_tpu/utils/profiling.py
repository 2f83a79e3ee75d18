"""Tracing / profiling hooks — the TPU-native answer to SURVEY §5.

The reference's closest facility is MetricLogger iteration timing + CUDA
memory counters (basic_utils.py:137-197). Here that is kept (see
utils.basic_utils) and extended with first-class XLA tracing:

* :func:`trace` — context manager writing a TensorBoard-viewable profile
  (jax.profiler) for the enclosed steps.
* :class:`StepTimer` — dependency-aware step timing that is honest under
  asynchronous dispatch (blocks on the step's outputs before reading the
  clock; see bench.py for the dependent-chain methodology used for
  microbenchmarks).
* :func:`device_memory_summary` — HBM usage snapshot per local device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture an XLA/TPU profile: ``with trace("/tmp/prof"): step()``.

    View with TensorBoard's profile plugin or xprof. No-ops gracefully if
    the profiler cannot start (e.g. another trace is active).
    """
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:  # pragma: no cover - profiler availability varies
        pass
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer that synchronizes on outputs.

    Example:
        timer = StepTimer()
        for batch in data:
            out = step(batch)
            timer.tick(out)          # blocks on out, records dt
        print(timer.summary())
    """

    def __init__(self, window: int = 50):
        from videomamba_tpu.utils.basic_utils import SmoothedValue

        self.meter = SmoothedValue(window=window, fmt="{avg:.4f}s")
        self._last = time.perf_counter()

    def tick(self, outputs=None) -> float:
        if outputs is not None:
            jax.block_until_ready(outputs)
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.meter.update(dt)
        return dt

    def reset_clock(self) -> None:
        self._last = time.perf_counter()

    def summary(self) -> str:
        return (
            f"steps={self.meter.count} avg={self.meter.global_avg:.4f}s "
            f"p50={self.meter.median:.4f}s max={self.meter.max:.4f}s"
        )


def device_memory_summary() -> Dict[str, Dict[str, float]]:
    """Per-device HBM stats in MB (empty dict entries if not reported)."""
    out: Dict[str, Dict[str, float]] = {}
    mb = 1024.0 * 1024.0
    for dev in jax.local_devices():
        stats = {}
        try:
            raw = dev.memory_stats() or {}
            for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if key in raw:
                    stats[key.replace("bytes", "mb")] = raw[key] / mb
        except Exception:  # pragma: no cover
            pass
        out[str(dev)] = stats
    return out


def annotate(name: str):
    """Named-scope annotation for profiles: ``with annotate("block_7"): ...``"""
    return jax.profiler.TraceAnnotation(name)
