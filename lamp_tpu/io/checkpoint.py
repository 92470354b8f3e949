"""Tensor and training-state serialization.

TPU-native replacement for the reference's checkpoint stack
(lamp-data/src/main/scala/lamp/data/{Writer,Reader,StateIO}.scala and
schemas/schemas.scala): tensors are written as one raw little-endian blob with
8-byte alignment padding plus a JSON descriptor (Writer.scala:15-35 format
spec), written atomically via tmp-file + rename (StateIO.scala:296-300), and
read back zero-copy with ``np.memmap`` (the analogue of
``Tensor.tensors_from_file``, Reader.scala:36-60).

Loop state (model + optimizer + min-validation model + learning curve +
epoch) mirrors the reference's ``SimpleLoopState`` /
``SimpleThenSWALoopState`` schemas (schemas.scala:60-104).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "write_tensor_blob",
    "read_tensor_blob",
    "save_pytree",
    "load_pytree",
    "save_pytree_sharded",
    "load_pytree_sharded",
    "save_loop_state",
    "load_loop_state",
    "read_safetensors",
    "write_safetensors",
    "AsyncCheckpointer",
]

_ALIGN = 8

_DTYPE_TO_NAME = {
    np.dtype("float64"): "f64",
    np.dtype("float32"): "f32",
    np.dtype("float16"): "f16",
    np.dtype("int64"): "i64",
    np.dtype("int32"): "i32",
    np.dtype("int16"): "i16",
    np.dtype("int8"): "i8",
    np.dtype("uint8"): "u8",
    np.dtype("bool"): "bool",
}
_NAME_TO_DTYPE = {v: k for k, v in _DTYPE_TO_NAME.items()}
# bf16 has no numpy dtype name by default; serialize as raw uint16 payloads
_BF16 = "bf16"


def _np_of(x) -> Tuple[np.ndarray, str]:
    if hasattr(x, "dtype") and x.dtype == jnp.bfloat16:
        return np.asarray(x).view(np.uint16), _BF16
    arr = np.asarray(x)
    return arr, _DTYPE_TO_NAME[arr.dtype]


def _is_writer_process() -> bool:
    """In multi-host SPMD only process 0 writes checkpoints (arrays are
    gathered to host by np.asarray); other processes still participate in
    the gather but skip the file IO."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def write_tensor_blob(path: str, tensors: List[Any]) -> List[Dict]:
    """Write tensors to ``path`` (raw LE blob, 8-byte padded records) and
    return the descriptor list (reference Writer.writeTensorsIntoFile)."""
    descriptors = []
    write = _is_writer_process()
    dirn = os.path.dirname(os.path.abspath(path))
    if write:
        os.makedirs(dirn, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=dirn)
        f = os.fdopen(fd, "wb")
    try:
        offset = 0
        for t in tensors:
            arr, dname = _np_of(t)
            data = np.ascontiguousarray(arr).tobytes()
            pad = (-len(data)) % _ALIGN
            if write:
                f.write(data)
                f.write(b"\x00" * pad)
            descriptors.append({
                "offset": offset,
                "nbytes": len(data),
                "dtype": dname,
                "shape": list(arr.shape),
            })
            offset += len(data) + pad
        if write:
            f.close()
            os.replace(tmp, path)
    except BaseException:
        if write:
            f.close()
            if os.path.exists(tmp):
                os.unlink(tmp)
        raise
    return descriptors


def read_tensor_blob(path: str, descriptors: List[Dict]) -> List[np.ndarray]:
    """Read tensors back via mmap (zero host copy until device_put)."""
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    out = []
    for d in descriptors:
        raw = mm[d["offset"]:d["offset"] + d["nbytes"]]
        if d["dtype"] == _BF16:
            arr = raw.view(np.uint16).reshape(d["shape"])
        else:
            arr = raw.view(_NAME_TO_DTYPE[d["dtype"]]).reshape(d["shape"])
        out.append(arr)
    return out


def _leaf_meta(x):
    if x is None:
        return {"kind": "none"}
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return {"kind": "array"}
    return {"kind": "py", "value": x}


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays (+ JSON-able scalars) as descriptor+blob.

    Layout: ``path`` is the JSON descriptor; ``path + ".data"`` is the blob.
    """
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: x is None
    )
    arrays, metas = [], []
    for leaf in leaves:
        meta = _leaf_meta(leaf)
        if meta["kind"] == "array":
            meta["index"] = len(arrays)
            arrays.append(leaf)
        metas.append(meta)
    descriptors = write_tensor_blob(path + ".data", arrays)
    if not _is_writer_process():
        return  # process-0-only IO (the gather already happened above)
    doc = {
        "version": 1,
        "treedef": str(treedef),
        "leaves": metas,
        "tensors": descriptors,
    }
    dirn = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=dirn)
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree`, using ``template`` for the
    tree structure and array dtypes/placement (the reference's Load typeclass
    role — loading is structure-directed, Module.scala:352)."""
    with open(path) as f:
        doc = json.load(f)
    blobs = read_tensor_blob(path + ".data", doc["tensors"])
    t_leaves, treedef = jax.tree_util.tree_flatten(
        template, is_leaf=lambda x: x is None
    )
    if len(t_leaves) != len(doc["leaves"]):
        raise ValueError(
            f"checkpoint has {len(doc['leaves'])} leaves, template has "
            f"{len(t_leaves)}"
        )
    out = []
    for tmpl, meta in zip(t_leaves, doc["leaves"]):
        if meta["kind"] == "none":
            out.append(None)
        elif meta["kind"] == "py":
            out.append(meta["value"])
        else:
            raw = blobs[meta["index"]]
            desc = doc["tensors"][meta["index"]]
            if desc["dtype"] == _BF16:
                arr = jnp.asarray(raw).view(jnp.bfloat16)
            else:
                arr = jnp.asarray(raw)
            if tmpl is not None and hasattr(tmpl, "dtype"):
                arr = arr.astype(tmpl.dtype)
            out.append(arr)
    return treedef.unflatten(out)


def save_pytree_sharded(path: str, tree: Any) -> None:
    """Sharded checkpoint: every process writes ONLY the array shards it
    addresses — no gather of distributed arrays to one host (contrast
    :func:`save_pytree`, whose ``np.asarray`` pulls each full array to
    process 0; the reference always gathers, Writer.scala:70-120).

    Layout: ``path`` is the main JSON descriptor (process 0),
    ``path + f".shard{p}.json"`` + ``path + f".data.shard{p}"`` are each
    process's shard descriptor and blob. Replicated shards are written once
    globally (by the shard with ``replica_id == 0``).
    """
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: x is None
    )
    try:
        pidx = jax.process_index()
    except Exception:
        pidx = 0
    blob_path = f"{path}.data.shard{pidx}"
    dirn = os.path.dirname(os.path.abspath(path))
    os.makedirs(dirn, exist_ok=True)

    metas, records = [], []
    arr_count = 0
    fd, tmp = tempfile.mkstemp(dir=dirn)
    offset = 0
    with os.fdopen(fd, "wb") as f:
        for leaf in leaves:
            meta = _leaf_meta(leaf)
            if meta["kind"] == "array":
                meta["index"] = arr_count
                meta["shape"] = list(np.shape(leaf))
                _, meta["dtype"] = _np_of(
                    leaf.dtype.type(0) if hasattr(leaf, "dtype") else leaf
                )
                shards = getattr(leaf, "addressable_shards", None)
                if shards is None:  # plain numpy/scalar array: every process
                    # holds the same copy; only process 0 records it
                    shards = [None] if pidx == 0 else []
                for sh in shards:
                    if sh is None:
                        data_arr = leaf
                        starts = [0] * np.ndim(leaf)
                    else:
                        if getattr(sh, "replica_id", 0) != 0:
                            continue  # replica written by its first holder
                        starts = [
                            sl.indices(dim)[0]
                            for sl, dim in zip(sh.index, np.shape(leaf))
                        ]
                        data_arr = sh.data
                    arr, _ = _np_of(data_arr)
                    data = np.ascontiguousarray(arr).tobytes()
                    pad = (-len(data)) % _ALIGN
                    f.write(data)
                    f.write(b"\x00" * pad)
                    records.append({
                        "leaf": arr_count,
                        "offset": offset,
                        "nbytes": len(data),
                        "start": starts,
                        "shape": list(arr.shape),
                    })
                    offset += len(data) + pad
                arr_count += 1
            metas.append(meta)
    os.replace(tmp, blob_path)

    fd, tmp = tempfile.mkstemp(dir=dirn)
    with os.fdopen(fd, "w") as f:
        json.dump({"process": pidx, "records": records}, f)
    os.replace(tmp, f"{path}.shard{pidx}.json")

    if pidx == 0:
        try:
            nproc = jax.process_count()
        except Exception:
            nproc = 1
        doc = {"version": 1, "sharded": True, "treedef": str(treedef),
               "processes": nproc, "leaves": metas}
        fd, tmp = tempfile.mkstemp(dir=dirn)
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)


def load_pytree_sharded(path: str, template: Any, *,
                        shardings=None) -> Any:
    """Load a sharded checkpoint, assembling each leaf from all shard files
    present next to ``path`` (mmap reads — only the bytes touched are
    paged in). ``shardings``: optional pytree of jax.sharding.Sharding
    matching ``template``; when given, leaves are device_put with them."""
    import glob as _glob

    with open(path) as f:
        doc = json.load(f)
    t_leaves, treedef = jax.tree_util.tree_flatten(
        template, is_leaf=lambda x: x is None
    )
    if len(t_leaves) != len(doc["leaves"]):
        raise ValueError(
            f"checkpoint has {len(doc['leaves'])} leaves, template has "
            f"{len(t_leaves)}"
        )
    # read exactly the shard set this save wrote ("processes" in the main
    # doc) — a bare glob would also pick up STALE higher-numbered shard
    # files left by an earlier save with more processes and silently
    # overwrite regions with old values (last-write-wins assembly)
    if "processes" in doc:
        shard_paths = [
            f"{path}.shard{p}.json" for p in range(doc["processes"])
        ]
    else:  # pre-"processes" checkpoints: best-effort glob
        shard_paths = sorted(_glob.glob(f"{path}.shard*.json"))
    shard_docs = []
    for sp in shard_paths:
        with open(sp) as f:
            sd = json.load(f)
        if not sd["records"]:
            continue  # that process held only replicas (0-byte blob)
        sd["blob"] = np.memmap(
            f"{path}.data.shard{sd['process']}", dtype=np.uint8, mode="r"
        )
        shard_docs.append(sd)

    by_leaf: Dict[int, List] = {}
    for sd in shard_docs:
        for rec in sd["records"]:
            by_leaf.setdefault(rec["leaf"], []).append((sd["blob"], rec))

    s_leaves = (
        jax.tree_util.tree_leaves(shardings, is_leaf=lambda x: x is None)
        if shardings is not None else [None] * len(t_leaves)
    )
    out = []
    for tmpl, meta, shrd in zip(t_leaves, doc["leaves"], s_leaves):
        if meta["kind"] == "none":
            out.append(None)
            continue
        if meta["kind"] == "py":
            out.append(meta["value"])
            continue
        dname = meta["dtype"]
        np_dtype = np.uint16 if dname == _BF16 else _NAME_TO_DTYPE[dname]
        full = np.empty(meta["shape"], np_dtype)
        covered = 0
        for blob, rec in by_leaf.get(meta["index"], []):
            raw = blob[rec["offset"]:rec["offset"] + rec["nbytes"]]
            piece = raw.view(np_dtype).reshape(rec["shape"])
            idx = tuple(
                slice(s, s + n) for s, n in zip(rec["start"], rec["shape"])
            )
            full[idx] = piece
            covered += piece.size
        if covered < full.size:
            raise ValueError(
                f"leaf {meta['index']}: shards cover {covered} of "
                f"{full.size} elements (missing shard files?)"
            )
        arr = jnp.asarray(full)
        if dname == _BF16:
            arr = arr.view(jnp.bfloat16)
        if tmpl is not None and hasattr(tmpl, "dtype"):
            arr = arr.astype(tmpl.dtype)
        if shrd is not None:
            arr = jax.device_put(arr, shrd)
        out.append(arr)
    return treedef.unflatten(out)


_BG_CHECKPOINTER = None


def save_loop_state(path: str, *, model, optimizer_state, epoch: int,
                    last_validation_loss=None, min_validation_loss=None,
                    min_validation_model=None, learning_curve=None,
                    lr_state=None, extra=None,
                    background: bool = False) -> None:
    """Persist full training-loop state (reference SimpleLoopState,
    data/LoopState.scala:4-29 + StateIO.stateToFile).

    ``background=True`` routes through a module-global
    :class:`AsyncCheckpointer`: array leaves are snapshotted with an
    on-device copy first (the caller's buffers may be donated away by the
    next train step), then a daemon thread performs the device→host gather
    and file IO. Consecutive background saves serialize, and a failed write
    re-raises on the next save.
    """
    if background:
        global _BG_CHECKPOINTER
        if _BG_CHECKPOINTER is None:
            _BG_CHECKPOINTER = AsyncCheckpointer()
        payload = {
            "model": model,
            "optimizer_state": optimizer_state,
            "min_validation_model": min_validation_model,
        }
        meta_kwargs = dict(
            epoch=epoch, last_validation_loss=last_validation_loss,
            min_validation_loss=min_validation_loss,
            learning_curve=learning_curve, lr_state=lr_state, extra=extra,
        )

        def write(p, snap):
            save_loop_state(
                p, model=snap["model"],
                optimizer_state=snap["optimizer_state"],
                min_validation_model=snap["min_validation_model"],
                background=False, **meta_kwargs,
            )

        _BG_CHECKPOINTER.save(path, payload, save_fn=write)
        return
    state = {
        "model": model,
        "optimizer_state": optimizer_state,
        "min_validation_model": min_validation_model,
    }
    save_pytree(path, state)
    meta = {
        "epoch": epoch,
        "last_validation_loss": last_validation_loss,
        "min_validation_loss": min_validation_loss,
        "learning_curve": learning_curve or [],
        "lr_state": lr_state,
        "extra": extra,
    }
    if not _is_writer_process():
        return
    dirn = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=dirn)
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path + ".meta")


def load_loop_state(path: str, *, model_template, optimizer_state_template,
                    min_validation_model_template=None):
    """Resume training-loop state; returns (state_dict, meta_dict)."""
    template = {
        "model": model_template,
        "optimizer_state": optimizer_state_template,
        "min_validation_model": min_validation_model_template,
    }
    state = load_pytree(path, template)
    with open(path + ".meta") as f:
        meta = json.load(f)
    return state, meta


# ---------------------------------------------------------------------------
# safetensors interop (HuggingFace weight import/export)
# ---------------------------------------------------------------------------

_ST_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def read_safetensors(path: str) -> Dict[str, jnp.ndarray]:
    """Parse a HuggingFace safetensors file into named arrays, mmap-backed.

    Reference: lamp-safetensors/src/main/scala/lamp/safetensors/
    SafeTensorReader.scala:15-139 (incl. bf16/f16 dtype handling).
    """
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    header_len = int(np.frombuffer(mm[:8].tobytes(), dtype="<u8")[0])
    header = json.loads(mm[8:8 + header_len].tobytes().decode("utf-8"))
    base = 8 + header_len
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        start, end = info["data_offsets"]
        raw = mm[base + start:base + end]
        dt = info["dtype"]
        if dt == "BF16":
            arr = jnp.asarray(
                np.frombuffer(raw.tobytes(), dtype=np.uint16).reshape(info["shape"])
            ).view(jnp.bfloat16)
        else:
            arr = jnp.asarray(
                np.frombuffer(raw.tobytes(), dtype=_ST_DTYPES[dt]).reshape(
                    info["shape"]
                )
            )
        out[name] = arr
    return out


def write_safetensors(path: str, tensors: Dict[str, Any],
                      metadata: Optional[Dict[str, str]] = None) -> None:
    """Write a safetensors file (round-trip + HF export)."""
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    payloads = []
    offset = 0
    rev = {v: k for k, v in _ST_DTYPES.items()}
    for name, t in tensors.items():
        if hasattr(t, "dtype") and t.dtype == jnp.bfloat16:
            arr = np.asarray(t).view(np.uint16)
            dt = "BF16"
        else:
            arr = np.asarray(t)
            dt = rev[arr.dtype.type]
        data = np.ascontiguousarray(arr).tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(data)],
        }
        payloads.append(data)
        offset += len(data)
    hj = json.dumps(header).encode("utf-8")
    pad = (-len(hj)) % 8
    hj += b" " * pad
    dirn = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(dirn, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dirn)
    with os.fdopen(fd, "wb") as f:
        f.write(np.uint64(len(hj)).tobytes())
        f.write(hj)
        for pdata in payloads:
            f.write(pdata)
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Background-thread checkpoint writes that do not stall the train loop.

    ``save`` snapshots every array leaf with an on-device copy (a cheap
    async XLA copy — the original buffers may be donated away by the next
    train step), then hands the snapshot to a writer thread that performs
    the device→host readback and the file IO. The main thread keeps
    dispatching steps; XLA overlaps the readback DMA with compute.

    At most one write is in flight: a new ``save`` first waits for the
    previous one (and re-raises its error, so failures are not silent).
    The reference has no async path — its checkpoint callback blocks the
    loop (StateIO.scala:262-300); this is the TPU-idiomatic upgrade, same
    on-disk format.
    """

    def __init__(self):
        self._thread = None
        self._exc = None

    def _snapshot(self, tree):
        def copy(x):
            if isinstance(x, jax.Array):
                return jnp.copy(x)
            return x

        return jax.tree_util.tree_map(
            copy, tree, is_leaf=lambda x: x is None
        )

    def save(self, path: str, tree: Any, *, save_fn=None) -> None:
        """Queue an asynchronous ``save_fn(path, snapshot)`` (default
        :func:`save_pytree`). Returns as soon as the device-side copies are
        dispatched."""
        import threading

        self.wait()
        fn = save_fn or save_pytree
        snapshot = self._snapshot(tree)

        def worker():
            try:
                fn(path, snapshot)
            except BaseException as e:  # surfaced by the next wait()/save()
                self._exc = e

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) finishes; re-raise its
        error."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
