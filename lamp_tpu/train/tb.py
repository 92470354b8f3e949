"""TensorBoard scalar logging without a tensorboard dependency.

The reference's observability is scribe log lines plus a learning-curve
list returned from the loop (IOLoops.scala:736-743, :344) — nothing a
dashboard can read. This module writes real TensorBoard event files
(`events.out.tfevents.*`) that `tensorboard --logdir` renders, using a
self-contained encoder for the two formats involved:

- TFRecord framing: ``uint64 length | uint32 masked-crc32c(length) |
  payload | uint32 masked-crc32c(payload)``, crc32c = Castagnoli
  polynomial, mask = ``rotr15(crc) + 0xa282ead8``.
- The tiny protobuf subset TensorBoard needs: ``Event{wall_time=1(double),
  step=2(varint), file_version=3(string), summary=5(msg)}`` and
  ``Summary{value=1: Value{tag=1(string), simple_value=2(float)}}``.

Hand-rolled because the image must not grow dependencies; the encoding is
~60 lines and round-trip tested (tests/test_tb.py decodes the records
back). Wire into training via the loop callbacks:

    with TensorBoardWriter("runs/exp1") as tb:
        train.epochs(..., training_callback=lambda e, l: tb.scalar("loss/train", l, e),
                     validation_callback=lambda e, l: tb.scalar("loss/val", l, e))
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict, Optional

__all__ = ["TensorBoardWriter", "crc32c", "masked_crc"]

# Castagnoli CRC-32C table (reflected polynomial 0x82F63B78).
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _CRC_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(num: int, value: int) -> bytes:
    return _varint(num << 3) + _varint(value)


def _field_bytes(num: int, payload: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _field_double(num: int, value: float) -> bytes:
    return _varint((num << 3) | 1) + struct.pack("<d", value)


def _field_float(num: int, value: float) -> bytes:
    return _varint((num << 3) | 5) + struct.pack("<f", value)


def _event(wall_time: float, step: int, *, file_version: str = None,
           summary: bytes = None) -> bytes:
    msg = _field_double(1, wall_time) + _field_varint(2, step)
    if file_version is not None:
        msg += _field_bytes(3, file_version.encode())
    if summary is not None:
        msg += _field_bytes(5, summary)
    return msg


def _scalar_summary(tag: str, value: float) -> bytes:
    val = _field_bytes(1, tag.encode()) + _field_float(2, float(value))
    return _field_bytes(1, val)


class TensorBoardWriter:
    """Append-only scalar event writer, one file per instance.

    ``scalar(tag, value, step)`` is cheap (a few hundred bytes of Python
    work); call it from the training/validation callbacks. ``flush``
    happens per write by default so a live ``tensorboard`` process sees
    points as they land (set ``flush_every`` higher to batch)."""

    def __init__(self, logdir: str, *, filename_suffix: str = "",
                 flush_every: int = 1):
        os.makedirs(logdir, exist_ok=True)
        host = socket.gethostname()
        name = f"events.out.tfevents.{int(time.time())}.{host}{filename_suffix}"
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "wb")
        self._flush_every = max(int(flush_every), 1)
        self._since_flush = 0
        self._write(_event(time.time(), 0, file_version="brain.Event:2"))
        self._f.flush()

    def _write(self, event: bytes) -> None:
        header = struct.pack("<Q", len(event))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc(header)))
        self._f.write(event)
        self._f.write(struct.pack("<I", masked_crc(event)))
        self._since_flush += 1
        if self._since_flush >= self._flush_every:
            self._f.flush()
            self._since_flush = 0

    def scalar(self, tag: str, value, step: int,
               wall_time: Optional[float] = None) -> None:
        self._write(_event(wall_time if wall_time is not None
                           else time.time(), int(step),
                           summary=_scalar_summary(tag, float(value))))

    def scalars(self, values: Dict[str, float], step: int) -> None:
        """One event per tag at a shared step (e.g. per-epoch metrics)."""
        now = time.time()
        for tag, v in values.items():
            self.scalar(tag, v, step, wall_time=now)

    def flush(self) -> None:
        self._f.flush()
        self._since_flush = 0

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
