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
    "TensorLifetimes",
    "creation_site",
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


def creation_site(arr, *, max_frames: int = 1) -> str:
    """The user-code frame(s) where a live array was created, from the
    runtime's per-buffer traceback (reference TensorLogger records an
    allocation stack trace per tensor, TensorLogger.scala:11-237). Frames
    inside jax/jaxlib are filtered; returns "<unknown>" when the runtime
    did not attach a traceback."""
    tb = getattr(arr, "traceback", None)
    if tb is None:
        return "<unknown>"
    out = []
    try:
        frames = tb.frames
    except Exception:
        return "<unknown>"
    for f in frames:
        fname = getattr(f, "file_name", "")
        if "/jax/" in fname or "/jaxlib/" in fname or "jax/_src" in fname:
            continue
        out.append(
            f"{fname}:{getattr(f, 'line_num', 0)} "
            f"({getattr(f, 'function_name', '?')})"
        )
        if len(out) >= max_frames:
            break
    return "; ".join(out) if out else "<jax-internal>"


class TensorLifetimes:
    """Per-tensor lifetime tracking: birth timestamps, age histograms, and
    creation stack traces — the full reference TensorLogger semantics
    (TensorLogger.scala:11-237: per-tensor birth nanos + stack trace,
    age-bucketed live report).

    Births are observed by scanning ``jax.live_arrays()``: an array's birth
    is the first scan that sees it, so scan (or run :meth:`start`'s periodic
    thread) at least as often as the resolution you need. Identity is held
    by weakref, so tracking does not extend any array's lifetime.

        tl = TensorLifetimes().start(interval=1.0)
        ... training ...
        print(tl.report(top=5))   # oldest/largest live tensors + birth site
        tl.stop()
    """

    def __init__(self):
        import weakref

        self._weakref = weakref.ref
        self._births: Dict[int, tuple] = {}  # id -> (weakref, birth_ts)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def scan(self) -> None:
        """Record first-seen timestamps for newly live arrays and forget
        dead ones."""
        now = time.time()
        with self._lock:
            self._births = {
                k: v for k, v in self._births.items() if v[0]() is not None
            }
            for arr in jax.live_arrays():
                k = id(arr)
                prev = self._births.get(k)
                # id() reuse after gc: the stored weakref must still point
                # at THIS array, else it is a new tensor reusing the slot
                if prev is None or prev[0]() is not arr:
                    try:
                        self._births[k] = (self._weakref(arr), now)
                    except TypeError:
                        pass

    def start(self, interval: float = 1.0) -> "TensorLifetimes":
        self.scan()

        def loop():
            while not self._stop.wait(interval):
                self.scan()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)

    def report(self, top: int = 10,
               age_buckets=(1.0, 10.0, 60.0, 600.0)) -> Dict:
        """Live-tensor report: age histogram (reference's bucketed ages)
        plus the ``top`` oldest-largest tensors with their creation sites."""
        self.scan()
        now = time.time()
        rows = []
        with self._lock:
            for ref, birth in list(self._births.values()):
                arr = ref()
                if arr is None:
                    continue
                try:
                    nbytes = arr.size * arr.dtype.itemsize
                except Exception:
                    continue
                rows.append((now - birth, nbytes, arr))
        hist = {f"<{b}s": 0 for b in age_buckets}
        hist[f">={age_buckets[-1]}s"] = 0
        bytes_hist = dict.fromkeys(hist, 0)
        for age, nbytes, _ in rows:
            for b in age_buckets:
                if age < b:
                    key = f"<{b}s"
                    break
            else:
                key = f">={age_buckets[-1]}s"
            hist[key] += 1
            bytes_hist[key] += nbytes
        rows.sort(key=lambda r: (r[0], r[1]), reverse=True)
        return {
            "live_count": len(rows),
            "live_bytes": sum(r[1] for r in rows),
            "age_histogram": hist,
            "bytes_by_age": bytes_hist,
            "top": [
                {
                    "age_s": round(age, 3),
                    "nbytes": nbytes,
                    "shape": tuple(arr.shape),
                    "dtype": str(arr.dtype),
                    "born_at": creation_site(arr),
                }
                for age, nbytes, arr in rows[:top]
            ],
        }


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
