"""Image <-> tensor conversion helpers.

Capability parity with the reference's BufferedImageHelper
(lamp-data/src/main/scala/lamp/data/BufferedImageHelper.scala:14-113): the
JVM AWT image type maps to uint8 HWC numpy arrays (what PIL/imageio produce).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["image_to_tensor", "tensor_to_image", "normalize_image",
           "denormalize_image", "write_png", "save_image_grid"]


def image_to_tensor(image: np.ndarray, *, scale: bool = True) -> np.ndarray:
    """uint8 [H, W, C] (or [H, W]) -> float32 [C, H, W] in [0, 1]."""
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    chw = np.transpose(arr, (2, 0, 1)).astype(np.float32)
    return chw / 255.0 if scale else chw


def tensor_to_image(tensor: np.ndarray, *, scale: bool = True) -> np.ndarray:
    """float [C, H, W] -> uint8 [H, W, C] (clipped)."""
    arr = np.asarray(tensor, np.float32)
    if scale:
        arr = arr * 255.0
    hwc = np.transpose(arr, (1, 2, 0))
    return np.clip(np.round(hwc), 0, 255).astype(np.uint8)


def normalize_image(chw: np.ndarray, mean, std) -> np.ndarray:
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, np.float32).reshape(-1, 1, 1)
    return (np.asarray(chw, np.float32) - mean) / std


def denormalize_image(chw: np.ndarray, mean, std) -> np.ndarray:
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, np.float32).reshape(-1, 1, 1)
    return np.asarray(chw, np.float32) * std + mean


def write_png(path: str, image: np.ndarray) -> None:
    """Write a uint8 [H, W, C] (C in 1/3/4) or [H, W] array as PNG.

    Dependency-free (stdlib zlib only) so examples can save samples without
    PIL/imageio in the image.
    """
    arr = np.ascontiguousarray(np.asarray(image, np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3, 4):
        raise ValueError(
            f"write_png: {c} channels unsupported (PNG needs 1, 3, or 4)"
        )
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[row].tobytes() for row in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def save_image_grid(images: np.ndarray, path: str, *, cols: int = None,
                    pad: int = 2, scale: bool = True) -> None:
    """Tile a batch of float [N, C, H, W] images into one PNG grid."""
    imgs = np.asarray(images, np.float32)
    n, c, h, w = imgs.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * (h + pad) + pad, cols * (w + pad) + pad, c),
                    np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[pad + r * (h + pad):pad + r * (h + pad) + h,
             pad + col * (w + pad):pad + col * (w + pad) + w] = (
            tensor_to_image(imgs[i], scale=scale))
    write_png(path, grid[:, :, 0] if c == 1 else grid)
