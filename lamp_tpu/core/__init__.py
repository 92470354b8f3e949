from .dtypes import BF16, DOUBLE, HALF, SINGLE, Precision, enable_x64
from .profiling import (
    BufferLogger,
    Peek,
    TensorLifetimes,
    creation_site,
    device_memory_stats,
    live_buffer_report,
    measure_time,
    model_memory_report,
    profile_trace,
)

__all__ = [
    "Precision",
    "SINGLE",
    "DOUBLE",
    "HALF",
    "BF16",
    "enable_x64",
    "measure_time",
    "live_buffer_report",
    "BufferLogger",
    "TensorLifetimes",
    "creation_site",
    "profile_trace",
    "model_memory_report",
    "device_memory_stats",
    "Peek",
]
