from .dtypes import BF16, DOUBLE, HALF, SINGLE, Precision, enable_x64

__all__ = ["Precision", "SINGLE", "DOUBLE", "HALF", "BF16", "enable_x64"]
