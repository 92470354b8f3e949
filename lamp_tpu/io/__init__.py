"""Serialization: checkpoint format, safetensors interop."""

from .checkpoint import (
    load_loop_state,
    load_pytree,
    load_pytree_sharded,
    read_safetensors,
    read_tensor_blob,
    save_loop_state,
    save_pytree_sharded,
    AsyncCheckpointer,
    save_pytree,
    write_safetensors,
    write_tensor_blob,
)
from .orbax_compat import load_orbax, save_orbax

__all__ = [
    "write_tensor_blob",
    "read_tensor_blob",
    "save_pytree",
    "save_pytree_sharded",
    "AsyncCheckpointer",
    "load_pytree",
    "load_pytree_sharded",
    "save_loop_state",
    "load_loop_state",
    "read_safetensors",
    "save_orbax",
    "load_orbax",
    "write_safetensors",
]
