"""Tracing, profiling, and live-buffer accounting.

TPU-native replacement for the reference's observability toolkit:
- ``TensorLogger`` periodic live-tensor reporter with age histograms and
  bytes/device (lamp-sten/src/main/scala/lamp/TensorLogger.scala:11-237)
  -> :func:`live_buffer_report` / :class:`BufferLogger` over
  ``jax.live_arrays`` + device memory stats.
- ``Variable.graphMemoryAllocationReport`` (autograd.scala:231-257)
  -> :func:`model_memory_report` over a module pytree.
- ``Device.measureTime`` with CUDA sync (device.scala:177-184)
  -> :func:`measure_time` with ``block_until_ready``.
- ``Debug`` op / ``Peek`` module NaN probes (ops.scala:2392, Peek.scala:7)
  -> :class:`Peek` using ``jax.debug.print``.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.module import Module, static_field

__all__ = [
    "measure_time",
    "live_buffer_report",
    "BufferLogger",
    "model_memory_report",
    "device_memory_stats",
    "Peek",
    "profile_trace",
]


class profile_trace:
    """Context manager writing a jax.profiler trace (XPlane/TensorBoard) —
    the TPU-native analogue of the reference's nsight profiling setup
    (Dockerfile:5 installs nsight-compute/nsight-systems).

        with profile_trace("/tmp/trace"):
            train_step(...)
        # then: tensorboard --logdir /tmp/trace
    """

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def measure_time(fn, *args, sync: bool = True, **kwargs):
    """Run fn and return (result, seconds); blocks on device completion so the
    time covers the actual TPU execution (reference Device.measureTime)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def live_buffer_report() -> Dict:
    """Snapshot of live device arrays: count and bytes per device + dtype
    histogram (the TensorLogger accounting)."""
    per_device: Dict[str, int] = defaultdict(int)
    per_device_count: Dict[str, int] = defaultdict(int)
    per_dtype: Dict[str, int] = defaultdict(int)
    total = 0
    for arr in jax.live_arrays():
        try:
            nbytes = arr.size * arr.dtype.itemsize
            dev = str(next(iter(arr.devices())))
        except Exception:
            continue
        per_device[dev] += nbytes
        per_device_count[dev] += 1
        per_dtype[str(arr.dtype)] += nbytes
        total += nbytes
    return {
        "total_bytes": total,
        "bytes_per_device": dict(per_device),
        "count_per_device": dict(per_device_count),
        "bytes_per_dtype": dict(per_dtype),
    }


def device_memory_stats() -> Dict[str, Dict]:
    """Per-device allocator stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out


class BufferLogger:
    """Periodic live-buffer logger (reference TensorLogger.start,
    TensorLogger.scala:191): logs the live_buffer_report every ``interval``
    seconds on a daemon thread until ``stop()``."""

    def __init__(self, interval: float = 10.0,
                 logger: Callable[[str], None] = print):
        self.interval = interval
        self.logger = logger
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "BufferLogger":
        def loop():
            while not self._stop.wait(self.interval):
                rep = live_buffer_report()
                self.logger(
                    f"[buffers] total={rep['total_bytes'] / 1e6:.1f}MB "
                    f"per-device={rep['bytes_per_device']}"
                )

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)


def model_memory_report(module) -> Dict:
    """Parameter/buffer counts and bytes of a module
    (reference graphMemoryAllocationReport)."""
    from ..nn.module import partition_params

    params, rest = partition_params(module)

    def stats(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree) if x is not None]
        return (
            len(leaves),
            sum(x.size for x in leaves),
            sum(x.size * x.dtype.itemsize for x in leaves),
        )

    pc, pn, pb = stats(params)
    bc, bn, bb = stats(rest)
    return {
        "param_tensors": pc, "param_elements": pn, "param_bytes": pb,
        "buffer_tensors": bc, "buffer_elements": bn, "buffer_bytes": bb,
    }


class Peek(Module):
    """Pass-through probe printing tag, norm and NaN count at trace/run time
    (reference Peek.scala:7 / Debug op). Works under jit via jax.debug.print.
    """

    tag: str = static_field()

    @staticmethod
    def init(tag: str) -> "Peek":
        return Peek(tag=tag)

    def forward(self, x, *, key=None, train=False):
        xf = x.astype(jnp.float32)
        jax.debug.print(
            "[peek {tag}] shape={shape} norm={norm} nans={nans}",
            tag=self.tag, shape=str(x.shape),
            norm=jnp.linalg.norm(xf), nans=jnp.sum(jnp.isnan(xf)),
        )
        return x, self
