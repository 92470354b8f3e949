"""Tabular IO: typed CSV and NPY readers.

Capability parity with the reference's lamp-saddle IO
(lamp-saddle/src/main/scala/lamp/io/csv/package.scala:190-560 typed CSV
reader and io/npy/package.scala:21-100 NPY reader): CSV columns are parsed
into typed arrays (float/int/string-categorical), NPY files load via numpy's
native format (mmap for zero-copy, the analogue of ``tensorsFromFile``).
"""

from __future__ import annotations

import csv
import gzip
import io
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["read_csv", "read_npy", "write_npy", "categorical_to_int"]


def _open(path_or_file, mode="rt"):
    if hasattr(path_or_file, "read"):
        return path_or_file
    if str(path_or_file).endswith(".gz"):
        return gzip.open(path_or_file, mode)
    return open(path_or_file, mode)


def read_csv(path_or_file, *, header: bool = True,
             dtype=np.float32, delimiter: str = ",",
             column_types: Optional[Dict[str, str]] = None):
    """Read a CSV into (columns_dict, column_names).

    Columns are parsed as float by default; ``column_types`` maps column name
    (or index as str) to "float" | "int" | "str". String columns come back as
    numpy object arrays (use :func:`categorical_to_int` to encode).
    """
    f = _open(path_or_file)
    reader = csv.reader(f, delimiter=delimiter)
    rows = list(reader)
    if not rows:
        return {}, []
    if header:
        names = rows[0]
        rows = rows[1:]
    else:
        names = [str(i) for i in range(len(rows[0]))]
    column_types = column_types or {}
    cols: Dict[str, np.ndarray] = {}
    for ci, name in enumerate(names):
        raw = [r[ci] for r in rows]
        t = column_types.get(name, "float")
        if t == "float":
            cols[name] = np.asarray(
                [float(x) if x not in ("", "NA", "nan") else np.nan for x in raw],
                dtype,
            )
        elif t == "int":
            cols[name] = np.asarray([int(float(x)) for x in raw], np.int64)
        else:
            cols[name] = np.asarray(raw, object)
    return cols, names


def categorical_to_int(column: np.ndarray) -> Tuple[np.ndarray, Dict[str, int]]:
    levels = {v: i for i, v in enumerate(sorted(set(column.tolist())))}
    return np.asarray([levels[v] for v in column.tolist()], np.int64), levels


def read_npy(path, *, mmap: bool = True) -> np.ndarray:
    """NPY loader (reference io/npy). mmap=True avoids a host copy until use."""
    return np.load(path, mmap_mode="r" if mmap else None)


def write_npy(path, array) -> None:
    np.save(path, np.asarray(array))
