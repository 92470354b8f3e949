"""Minimal numpy ONNX interpreter.

Executes the op subset emitted by onnx_export so exported models can be
verified without onnxruntime (the reference verifies its exports by running
them under com.microsoft.onnxruntime — lamp-onnx onnx.test.scala; this is
the dependency-free equivalent).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from . import onnx_minimal_pb2 as pb

__all__ = ["run_onnx"]

_ONNX_TO_NP = {
    pb.TensorProto.FLOAT: np.float32,
    pb.TensorProto.DOUBLE: np.float64,
    pb.TensorProto.FLOAT16: np.float16,
    pb.TensorProto.INT64: np.int64,
    pb.TensorProto.INT32: np.int32,
    pb.TensorProto.INT16: np.int16,
    pb.TensorProto.INT8: np.int8,
    pb.TensorProto.UINT8: np.uint8,
    pb.TensorProto.BOOL: np.bool_,
}


def _decode_tensor(t: pb.TensorProto) -> np.ndarray:
    if t.data_type == pb.TensorProto.BFLOAT16:
        import jax.numpy as jnp

        raw = np.frombuffer(t.raw_data, np.uint16).reshape(tuple(t.dims))
        return np.asarray(jnp.asarray(raw).view(jnp.bfloat16), np.float32)
    dt = _ONNX_TO_NP[t.data_type]
    if t.raw_data:
        return np.frombuffer(t.raw_data, dt).reshape(tuple(t.dims)).copy()
    if t.float_data:
        return np.asarray(t.float_data, np.float32).reshape(tuple(t.dims))
    if t.int64_data:
        return np.asarray(t.int64_data, np.int64).reshape(tuple(t.dims))
    return np.zeros(tuple(t.dims), dt)


def _attrs(node) -> Dict:
    out = {}
    for a in node.attribute:
        if a.type == pb.AttributeProto.INT:
            out[a.name] = a.i
        elif a.type == pb.AttributeProto.FLOAT:
            out[a.name] = a.f
        elif a.type == pb.AttributeProto.STRING:
            out[a.name] = a.s.decode()
        elif a.type == pb.AttributeProto.INTS:
            out[a.name] = list(a.ints)
        elif a.type == pb.AttributeProto.FLOATS:
            out[a.name] = list(a.floats)
        elif a.type == pb.AttributeProto.GRAPH:
            out[a.name] = a.g
    return out


def run_onnx(model: pb.ModelProto, inputs: Dict[str, np.ndarray]) -> List[np.ndarray]:
    return _run_graph(model.graph, {}, inputs)


def _run_graph(graph: pb.GraphProto, outer_env: Dict[str, np.ndarray],
               inputs: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """Execute one GraphProto. ``outer_env`` provides outer-scope names
    (ONNX subgraph capture semantics for Scan/Loop bodies)."""
    env: Dict[str, np.ndarray] = dict(outer_env)
    for t in graph.initializer:
        env[t.name] = _decode_tensor(t)
    for k, v in inputs.items():
        env[k] = np.asarray(v)

    for node in graph.node:
        ins = [env[i] if i else None for i in node.input]
        a = _attrs(node)
        op = node.op_type
        if op == "Add":
            out = [ins[0] + ins[1]]
        elif op == "Sub":
            out = [ins[0] - ins[1]]
        elif op == "Mul":
            out = [ins[0] * ins[1]]
        elif op == "Div":
            out = [ins[0] / ins[1]]
        elif op == "Max":
            out = [np.maximum(ins[0], ins[1])]
        elif op == "Min":
            out = [np.minimum(ins[0], ins[1])]
        elif op == "Pow":
            out = [np.power(ins[0], ins[1])]
        elif op == "Exp":
            out = [np.exp(ins[0])]
        elif op == "Log":
            out = [np.log(ins[0])]
        elif op == "Tanh":
            out = [np.tanh(ins[0])]
        elif op == "Sigmoid":
            out = [1.0 / (1.0 + np.exp(-ins[0]))]
        elif op == "Erf":
            from math import erf

            out = [np.vectorize(erf)(ins[0]).astype(ins[0].dtype)]
        elif op == "Sqrt":
            out = [np.sqrt(ins[0])]
        elif op == "Abs":
            out = [np.abs(ins[0])]
        elif op == "Neg":
            out = [-ins[0]]
        elif op == "Sign":
            out = [np.sign(ins[0])]
        elif op == "Floor":
            out = [np.floor(ins[0])]
        elif op == "Ceil":
            out = [np.ceil(ins[0])]
        elif op in ("Sin", "Cos", "Tan"):
            out = [getattr(np, op.lower())(ins[0])]
        elif op == "Atan":
            out = [np.arctan(ins[0])]
        elif op == "Identity":
            out = [ins[0]]
        elif op == "Not":
            out = [~ins[0]]
        elif op == "IsNaN":
            out = [np.isnan(ins[0])]
        elif op == "IsInf":
            out = [np.isinf(ins[0])]
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
            out = [ins[0].astype(_ONNX_TO_NP[a["to"]])]
        elif op == "Reshape":
            out = [ins[0].reshape(tuple(ins[1].astype(np.int64)))]
        elif op == "Squeeze":
            out = [np.squeeze(ins[0], tuple(ins[1].astype(np.int64)))]
        elif op == "Unsqueeze":
            out = [np.expand_dims(ins[0], tuple(ins[1].astype(np.int64)))]
        elif op == "Transpose":
            out = [np.transpose(ins[0], a["perm"])]
        elif op == "Expand":
            out = [np.broadcast_to(ins[0], tuple(ins[1].astype(np.int64))).copy()]
        elif op in ("ReduceSum",):
            axes = tuple(ins[1].astype(np.int64)) if len(ins) > 1 else None
            out = [np.sum(ins[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))]
        elif op in ("ReduceMax", "ReduceMin", "ReduceProd"):
            fn = {"ReduceMax": np.max, "ReduceMin": np.min,
                  "ReduceProd": np.prod}[op]
            out = [fn(ins[0], axis=tuple(a["axes"]),
                      keepdims=bool(a.get("keepdims", 1)))]
        elif op == "ArgMax":
            out = [np.argmax(ins[0], axis=a["axis"]).astype(np.int64)]
        elif op == "ArgMin":
            out = [np.argmin(ins[0], axis=a["axis"]).astype(np.int64)]
        elif op == "Where":
            out = [np.where(ins[0], ins[1], ins[2])]
        elif op == "Einsum":
            out = [np.einsum(a["equation"], *ins)]
        elif op == "Conv":
            out = [_conv(ins, a)]
        elif op == "MaxPool":
            out = [_maxpool(ins[0], a)]
        elif op == "AveragePool":
            out = [_avgpool(ins[0], a)]
        elif op == "Concat":
            out = [np.concatenate(ins, axis=a["axis"])]
        elif op == "Slice":
            out = [_slice(ins)]
        elif op == "Pad":
            pads = ins[1].astype(np.int64)
            half = len(pads) // 2
            widths = list(zip(pads[:half], pads[half:]))
            cval = ins[2] if len(ins) > 2 else 0
            out = [np.pad(ins[0], widths, constant_values=cval)]
        elif op == "Gather":
            out = [np.take(ins[0], ins[1].astype(np.int64), axis=a.get("axis", 0))]
        elif op == "Clip":
            out = [np.clip(ins[0], ins[1], ins[2])]
        elif op == "CumSum":
            ax = int(ins[1])
            if a.get("reverse", 0):
                out = [np.flip(np.cumsum(np.flip(ins[0], ax), axis=ax), ax)]
            else:
                out = [np.cumsum(ins[0], axis=ax)]
        elif op == "Mod":
            out = [np.fmod(ins[0], ins[1])]
        elif op == "Scan":
            out = _scan(ins, a, env, node)
        elif op == "Loop":
            out = _loop(ins, a, env, node)
        else:
            raise NotImplementedError(f"interp: {op}")
        for name, val in zip(node.output, out):
            env[name] = val

    return [env[o.name] for o in graph.output]


def _scan(ins, a, env, node):
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
        sub_inputs = dict(zip(body_in_names[:n_states], states))
        for j in range(m):
            idx = t_len - 1 - t if in_dirs[j] else t
            sub_inputs[body_in_names[n_states + j]] = xs[j][idx]
        outs = _run_graph(body, env, sub_inputs)
        states = outs[:n_states]
        for j in range(n_ys):
            ys[j].append(outs[n_states + j])
    stacked = [
        np.stack(y[::-1] if out_dirs[j] else y, axis=0)
        for j, y in enumerate(ys)
    ]
    return states + stacked


def _loop(ins, a, env, node):
    body = a["body"]
    max_trip = ins[0]
    cond = bool(ins[1]) if node.input[1] else True
    vals = list(ins[2:])
    body_in_names = [vi.name for vi in body.input]
    it = 0
    while cond and (max_trip is None or it < int(max_trip)):
        sub_inputs = {
            body_in_names[0]: np.asarray(it, np.int64),
            body_in_names[1]: np.asarray(cond),
        }
        sub_inputs.update(zip(body_in_names[2:], vals))
        outs = _run_graph(body, env, sub_inputs)
        cond = bool(outs[0])
        vals = outs[1:1 + len(vals)]
        it += 1
    return vals


def _conv(ins, a):
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    strides = a.get("strides", [1, 1])
    pads = a.get("pads", [0] * (2 * (x.ndim - 2)))
    dil = a.get("dilations", [1] * (x.ndim - 2))
    group = a.get("group", 1)
    spatial = x.ndim - 2
    half = len(pads) // 2
    widths = [(0, 0), (0, 0)] + [
        (pads[i], pads[half + i]) for i in range(spatial)
    ]
    xp = np.pad(x, widths)
    n, cin = x.shape[:2]
    cout = w.shape[0]
    ks = w.shape[2:]
    out_spatial = [
        (xp.shape[2 + i] - (dil[i] * (ks[i] - 1) + 1)) // strides[i] + 1
        for i in range(spatial)
    ]
    out = np.zeros((n, cout) + tuple(out_spatial), x.dtype)
    cin_g = cin // group
    cout_g = cout // group
    if spatial == 2:
        for g in range(group):
            xs = xp[:, g * cin_g:(g + 1) * cin_g]
            wg = w[g * cout_g:(g + 1) * cout_g]
            for oy in range(out_spatial[0]):
                for ox in range(out_spatial[1]):
                    ys = oy * strides[0]
                    xs0 = ox * strides[1]
                    patch = xs[
                        :, :,
                        ys:ys + dil[0] * ks[0]:dil[0],
                        xs0:xs0 + dil[1] * ks[1]:dil[1],
                    ]
                    out[:, g * cout_g:(g + 1) * cout_g, oy, ox] = np.einsum(
                        "nchw,ochw->no", patch, wg
                    )
    elif spatial == 1:
        for g in range(group):
            xs = xp[:, g * cin_g:(g + 1) * cin_g]
            wg = w[g * cout_g:(g + 1) * cout_g]
            for ox in range(out_spatial[0]):
                s = ox * strides[0]
                patch = xs[:, :, s:s + dil[0] * (ks[0] - 1) + 1:dil[0]]
                out[:, g * cout_g:(g + 1) * cout_g, ox] = np.einsum(
                    "ncw,ocw->no", patch, wg
                )
    else:
        raise NotImplementedError(f"{spatial}-d conv")
    if b is not None:
        out += b.reshape((1, -1) + (1,) * spatial)
    return out


def _maxpool(x, a):
    ks = a["kernel_shape"]
    st = a.get("strides", ks)
    pads = a.get("pads", [0] * (2 * len(ks)))
    half = len(pads) // 2
    widths = [(0, 0), (0, 0)] + [(pads[i], pads[half + i]) for i in range(len(ks))]
    xp = np.pad(x, widths, constant_values=-np.inf)
    out_sp = [
        (xp.shape[2 + i] - ks[i]) // st[i] + 1 for i in range(len(ks))
    ]
    out = np.zeros(x.shape[:2] + tuple(out_sp), x.dtype)
    if len(ks) == 2:
        for oy in range(out_sp[0]):
            for ox in range(out_sp[1]):
                out[:, :, oy, ox] = xp[
                    :, :, oy * st[0]:oy * st[0] + ks[0],
                    ox * st[1]:ox * st[1] + ks[1],
                ].max(axis=(2, 3))
    else:
        raise NotImplementedError
    return out


def _avgpool(x, a):
    ks = a["kernel_shape"]
    st = a.get("strides", ks)
    pads = a.get("pads", [0] * (2 * len(ks)))
    half = len(pads) // 2
    widths = [(0, 0), (0, 0)] + [(pads[i], pads[half + i]) for i in range(len(ks))]
    xp = np.pad(x, widths)
    out_sp = [(xp.shape[2 + i] - ks[i]) // st[i] + 1 for i in range(len(ks))]
    out = np.zeros(x.shape[:2] + tuple(out_sp), x.dtype)
    if len(ks) == 2:
        for oy in range(out_sp[0]):
            for ox in range(out_sp[1]):
                out[:, :, oy, ox] = xp[
                    :, :, oy * st[0]:oy * st[0] + ks[0],
                    ox * st[1]:ox * st[1] + ks[1],
                ].mean(axis=(2, 3))
    else:
        raise NotImplementedError
    return out


def _slice(ins):
    x, starts, ends = ins[0], ins[1].astype(np.int64), ins[2].astype(np.int64)
    axes = (
        ins[3].astype(np.int64) if len(ins) > 3
        else np.arange(len(starts), dtype=np.int64)
    )
    steps = ins[4].astype(np.int64) if len(ins) > 4 else np.ones(len(starts), np.int64)
    slicer = [slice(None)] * x.ndim
    for s, e, ax, stp in zip(starts, ends, axes, steps):
        e_val = None if (stp < 0 and e <= -x.shape[ax] - 1 + 1) else int(e)
        if stp < 0 and e <= np.iinfo(np.int64).min + 2:
            e_val = None
        slicer[ax] = slice(int(s), e_val, int(stp))
    return x[tuple(slicer)]
