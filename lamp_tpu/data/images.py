"""Image <-> tensor conversion helpers.

Capability parity with the reference's BufferedImageHelper
(lamp-data/src/main/scala/lamp/data/BufferedImageHelper.scala:14-113): the
JVM AWT image type maps to uint8 HWC numpy arrays (what PIL/imageio produce).
"""

from __future__ import annotations

import numpy as np

__all__ = ["image_to_tensor", "tensor_to_image", "normalize_image",
           "denormalize_image"]


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
