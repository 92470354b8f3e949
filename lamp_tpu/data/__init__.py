"""Data runtime: batch streams, prefetch, loaders, tokenizer, text utils."""

from .batchstream import (
    BatchStream,
    from_full_batch,
    from_function,
    from_indices,
    minibatches_from_full,
    prefetch_to_device,
    staged_from_indices,
)

__all__ = [
    "BatchStream",
    "from_full_batch",
    "from_function",
    "from_indices",
    "minibatches_from_full",
    "prefetch_to_device",
    "staged_from_indices",
]
