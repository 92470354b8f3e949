"""Torch-based ONNX executor: an INDEPENDENT verifier for exported graphs.

The reference re-runs every ONNX export under onnxruntime in CI
(/root/reference/build.sbt:259, lamp-onnx onnx.test.scala) so the exporter
is checked against a second implementation of the op semantics.
onnxruntime is not installed on this box; torch (CPU) is. This module
executes the op subset emitted by ``onnx_export`` by dispatching every
node to torch's NATIVE primitives (``F.conv2d``, ``F.max_pool2d``,
``torch.einsum``, ``torch.erf``, …) — the op implementations are where
the exporter and the bundled numpy interpreter could share a wrong
assumption, and torch's kernels are written by neither.

Usage mirrors ``onnx_interp.run_onnx``::

    outs = run_onnx_torch(model_proto, {"input_0": np_array})
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from . import onnx_minimal_pb2 as pb
from .onnx_interp import _ONNX_TO_NP, _attrs, _decode_tensor

__all__ = ["run_onnx_torch"]


def _to_torch(x):
    import torch

    if isinstance(x, torch.Tensor):
        return x
    a = np.asarray(x)
    # NOTE: np.ascontiguousarray promotes 0-d arrays to shape (1,) — copy
    # preserves the shape and also makes the buffer writable for torch
    return torch.from_numpy(a.copy())


def run_onnx_torch(model: pb.ModelProto,
                   inputs: Dict[str, np.ndarray]) -> List[np.ndarray]:
    outs = _run_graph(model.graph, {}, inputs)
    return [o.numpy() for o in outs]


def _promote(ts):
    """numpy-style dtype promotion (torch requires matching dtypes where
    numpy silently promotes, e.g. f32 weights meeting an f64 input)."""
    import torch

    tensors = [t for t in ts if t is not None]
    dt = tensors[0].dtype
    for t in tensors[1:]:
        dt = torch.promote_types(dt, t.dtype)
    return [t if t is None else t.to(dt) for t in ts]


def _split_pads(pads, spatial):
    """ONNX pads [x1b, x2b, ..., x1e, x2e, ...] -> torch F.pad order
    (last dim first, (begin, end) pairs)."""
    half = len(pads) // 2
    begins, ends = pads[:half], pads[half:]
    flat = []
    for i in range(spatial - 1, -1, -1):
        flat.extend([int(begins[i]), int(ends[i])])
    return flat


def _run_graph(graph: pb.GraphProto, outer_env, inputs) -> List:
    import torch
    import torch.nn.functional as F

    env = dict(outer_env)
    for t in graph.initializer:
        env[t.name] = _to_torch(_decode_tensor(t))
    for k, v in inputs.items():
        env[k] = _to_torch(v)

    for node in graph.node:
        ins = [env[i] if i else None for i in node.input]
        a = _attrs(node)
        op = node.op_type
        if op in ("Add", "Sub", "Mul", "Div", "Max", "Min", "Pow", "Mod",
                  "Einsum", "Concat", "Clip", "Equal", "Less", "Greater",
                  "LessOrEqual", "GreaterOrEqual"):
            ins = _promote(ins)
        elif op == "Where":
            ins = [ins[0]] + _promote(ins[1:])
        elif op == "Conv":
            ins = _promote(ins)
        if op == "Add":
            out = [ins[0] + ins[1]]
        elif op == "Sub":
            out = [ins[0] - ins[1]]
        elif op == "Mul":
            out = [ins[0] * ins[1]]
        elif op == "Div":
            out = [ins[0] / ins[1]]
        elif op == "Max":
            out = [torch.maximum(ins[0], ins[1])]
        elif op == "Min":
            out = [torch.minimum(ins[0], ins[1])]
        elif op == "Pow":
            out = [torch.pow(ins[0], ins[1])]
        elif op == "Exp":
            out = [torch.exp(ins[0])]
        elif op == "Log":
            out = [torch.log(ins[0])]
        elif op == "Tanh":
            out = [torch.tanh(ins[0])]
        elif op == "Sigmoid":
            out = [torch.sigmoid(ins[0])]
        elif op == "Erf":
            out = [torch.erf(ins[0])]
        elif op == "Sqrt":
            out = [torch.sqrt(ins[0])]
        elif op == "Abs":
            out = [torch.abs(ins[0])]
        elif op == "Neg":
            out = [-ins[0]]
        elif op == "Sign":
            out = [torch.sign(ins[0])]
        elif op == "Floor":
            out = [torch.floor(ins[0])]
        elif op == "Ceil":
            out = [torch.ceil(ins[0])]
        elif op == "Sin":
            out = [torch.sin(ins[0])]
        elif op == "Cos":
            out = [torch.cos(ins[0])]
        elif op == "Tan":
            out = [torch.tan(ins[0])]
        elif op == "Atan":
            out = [torch.atan(ins[0])]
        elif op == "Identity":
            out = [ins[0]]
        elif op == "Not":
            out = [~ins[0]]
        elif op == "IsNaN":
            out = [torch.isnan(ins[0])]
        elif op == "IsInf":
            out = [torch.isinf(ins[0])]
        elif op == "Equal":
            out = [ins[0] == ins[1]]
        elif op == "Less":
            out = [ins[0] < ins[1]]
        elif op == "Greater":
            out = [ins[0] > ins[1]]
        elif op == "LessOrEqual":
            out = [ins[0] <= ins[1]]
        elif op == "GreaterOrEqual":
            out = [ins[0] >= ins[1]]
        elif op == "And":
            out = [ins[0] & ins[1]]
        elif op == "Or":
            out = [ins[0] | ins[1]]
        elif op == "Cast":
            np_dt = _ONNX_TO_NP[a["to"]]
            torch_dt = _to_torch(np.zeros((), np_dt)).dtype
            out = [ins[0].to(torch_dt)]
        elif op == "Reshape":
            out = [ins[0].reshape(tuple(int(d) for d in ins[1]))]
        elif op == "Squeeze":
            x = ins[0]
            for ax in sorted((int(d) for d in ins[1]), reverse=True):
                x = x.squeeze(ax)
            out = [x]
        elif op == "Unsqueeze":
            x = ins[0]
            for ax in sorted(int(d) for d in ins[1]):
                x = x.unsqueeze(ax)
            out = [x]
        elif op == "Transpose":
            out = [ins[0].permute(tuple(a["perm"]))]
        elif op == "Expand":
            out = [ins[0].expand(tuple(int(d) for d in ins[1])).contiguous()]
        elif op == "ReduceSum":
            axes = tuple(int(d) for d in ins[1]) if len(ins) > 1 else None
            keep = bool(a.get("keepdims", 1))
            if axes is None:
                r = ins[0].sum()
                out = [r.reshape((1,) * ins[0].dim()) if keep else r]
            else:
                out = [ins[0].sum(dim=axes, keepdim=keep)]
        elif op in ("ReduceMax", "ReduceMin", "ReduceProd"):
            keep = bool(a.get("keepdims", 1))
            x = ins[0]
            fn = {"ReduceMax": torch.amax, "ReduceMin": torch.amin}.get(op)
            if fn is not None:
                out = [fn(x, dim=tuple(a["axes"]), keepdim=keep)]
            else:
                for ax in sorted(a["axes"], reverse=True):
                    x = torch.prod(x, dim=ax, keepdim=keep)
                out = [x]
        elif op == "ArgMax":
            out = [torch.argmax(ins[0], dim=a["axis"])]
        elif op == "ArgMin":
            out = [torch.argmin(ins[0], dim=a["axis"])]
        elif op == "Where":
            out = [torch.where(ins[0], ins[1], ins[2])]
        elif op == "Einsum":
            out = [torch.einsum(a["equation"], *ins)]
        elif op == "Conv":
            out = [_conv(ins, a)]
        elif op == "MaxPool":
            out = [_maxpool(ins[0], a)]
        elif op == "AveragePool":
            out = [_avgpool(ins[0], a)]
        elif op == "Concat":
            out = [torch.cat(ins, dim=a["axis"])]
        elif op == "Slice":
            out = [_slice(ins)]
        elif op == "Pad":
            pads = [int(p) for p in ins[1]]
            half = len(pads) // 2
            flat = []
            for i in range(half - 1, -1, -1):
                flat.extend([pads[i], pads[half + i]])
            cval = float(ins[2]) if len(ins) > 2 and ins[2] is not None else 0.0
            out = [F.pad(ins[0], flat, value=cval)]
        elif op == "Gather":
            out = [torch.index_select(
                ins[0], a.get("axis", 0), ins[1].reshape(-1).long()
            ).reshape(
                ins[0].shape[:a.get("axis", 0)] + ins[1].shape
                + ins[0].shape[a.get("axis", 0) + 1:]
            )]
        elif op == "Clip":
            out = [torch.clamp(ins[0], ins[1], ins[2])]
        elif op == "CumSum":
            ax = int(ins[1])
            if a.get("reverse", 0):
                out = [torch.flip(torch.cumsum(torch.flip(ins[0], (ax,)),
                                               dim=ax), (ax,))]
            else:
                out = [torch.cumsum(ins[0], dim=ax)]
        elif op == "Mod":
            out = [torch.fmod(ins[0], ins[1])]
        elif op == "Scan":
            out = _scan(ins, a, env, node)
        elif op == "Loop":
            out = _loop(ins, a, env, node)
        else:
            raise NotImplementedError(f"torch interp: {op}")
        for name, val in zip(node.output, out):
            env[name] = val

    return [env[o.name] for o in graph.output]


def _scan(ins, a, env, node):
    import torch

    body = a["body"]
    m = a["num_scan_inputs"]
    n_states = len(node.input) - m
    states = list(ins[:n_states])
    xs = ins[n_states:]
    in_dirs = a.get("scan_input_directions", [0] * m)
    n_ys = len(body.output) - n_states
    out_dirs = a.get("scan_output_directions", [0] * n_ys)
    t_len = xs[0].shape[0]
    body_in_names = [vi.name for vi in body.input]
    ys = [[] for _ in range(n_ys)]
    for t in range(t_len):
        sub = dict(zip(body_in_names[:n_states], states))
        for j in range(m):
            idx = t_len - 1 - t if in_dirs[j] else t
            sub[body_in_names[n_states + j]] = xs[j][idx]
        outs = _run_graph(body, env, sub)
        states = outs[:n_states]
        for j in range(n_ys):
            ys[j].append(outs[n_states + j])
    stacked = [
        torch.stack(y[::-1] if out_dirs[j] else y, dim=0)
        for j, y in enumerate(ys)
    ]
    return states + stacked


def _loop(ins, a, env, node):
    import torch

    body = a["body"]
    max_trip = ins[0]
    cond = bool(ins[1]) if node.input[1] else True
    vals = list(ins[2:])
    body_in_names = [vi.name for vi in body.input]
    it = 0
    while cond and (max_trip is None or it < int(max_trip)):
        sub = {
            body_in_names[0]: torch.tensor(it, dtype=torch.int64),
            body_in_names[1]: torch.tensor(cond),
        }
        sub.update(zip(body_in_names[2:], vals))
        outs = _run_graph(body, env, sub)
        cond = bool(outs[0])
        vals = outs[1:1 + len(vals)]
        it += 1
    return vals


def _conv(ins, a):
    import torch.nn.functional as F

    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    spatial = x.dim() - 2
    strides = [int(s) for s in a.get("strides", [1] * spatial)]
    pads = a.get("pads", [0] * (2 * spatial))
    dil = [int(d) for d in a.get("dilations", [1] * spatial)]
    group = int(a.get("group", 1))
    xp = F.pad(x, _split_pads(pads, spatial))
    conv = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}[spatial]
    return conv(xp, w, b, stride=strides, dilation=dil, groups=group)


def _maxpool(x, a):
    import torch.nn.functional as F

    ks = [int(k) for k in a["kernel_shape"]]
    st = [int(s) for s in a.get("strides", ks)]
    pads = a.get("pads", [0] * (2 * len(ks)))
    xp = F.pad(x, _split_pads(pads, len(ks)), value=float("-inf"))
    pool = {1: F.max_pool1d, 2: F.max_pool2d}[len(ks)]
    return pool(xp, ks, stride=st)


def _avgpool(x, a):
    import torch.nn.functional as F

    ks = [int(k) for k in a["kernel_shape"]]
    st = [int(s) for s in a.get("strides", ks)]
    pads = a.get("pads", [0] * (2 * len(ks)))
    # explicit pad + count_include_pad matches the numpy interpreter's
    # (and ONNX's default count_include_pad=0 is NOT what onnx_export
    # emits: it pads explicitly so padded zeros count)
    xp = F.pad(x, _split_pads(pads, len(ks)))
    pool = {1: F.avg_pool1d, 2: F.avg_pool2d}[len(ks)]
    return pool(xp, ks, stride=st)


def _slice(ins):
    import torch

    x = ins[0]
    # starts/ends may arrive 0-d or nested from Scan/Loop bodies
    starts = [int(s) for s in ins[1].reshape(-1)]
    ends = [int(e) for e in ins[2].reshape(-1)]
    axes = ([int(ax) for ax in ins[3].reshape(-1)] if len(ins) > 3
            else list(range(len(starts))))
    steps = ([int(s) for s in ins[4].reshape(-1)] if len(ins) > 4
             else [1] * len(starts))
    for s, e, ax, stp in zip(starts, ends, axes, steps):
        n = x.shape[ax]
        if stp > 0:
            s_ = min(s + n if s < 0 else s, n)
            e_ = min(e + n if e < 0 else e, n)
            idx = list(range(s_, e_, stp))
        else:
            # torch has no negative-step slicing: enumerate indices
            s_ = s + n if s < 0 else min(s, n - 1)
            int64_min = -(2 ** 63)
            if e <= int64_min + 2 or e < -n:
                e_ = -1
            else:
                e_ = e + n if e < 0 else e
            idx = list(range(s_, e_, stp))
        x = torch.index_select(
            x, ax, torch.tensor(idx, dtype=torch.int64))
    return x
