"""ONNX export: trace a jax function to an ONNX inference graph.

Capability parity with lamp-onnx
(lamp-onnx/src/main/scala/lamp/onnx/{package,OpSet}.scala: ``serialize``
:74 walking the Variable graph with per-op converters in ``DefaultOpSet``).
Here the traced graph is the jaxpr of the model's inference function: each
jax primitive maps to ONNX node(s); jaxpr consts (the model weights) become
initializers; fully-constant subgraphs are folded at export time.

The emitted file uses the standard ONNX binary schema (see
onnx_minimal.proto — standard field numbers) at opset 17, so it loads in
onnxruntime/netron. A bundled numpy interpreter (onnx_interp.py) re-executes
exported models for verification without onnxruntime.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import onnx_minimal_pb2 as pb

__all__ = ["export_onnx"]

OPSET = 17

_NP_TO_ONNX = {
    np.dtype("float32"): pb.TensorProto.FLOAT,
    np.dtype("float64"): pb.TensorProto.DOUBLE,
    np.dtype("float16"): pb.TensorProto.FLOAT16,
    np.dtype("int64"): pb.TensorProto.INT64,
    np.dtype("int32"): pb.TensorProto.INT32,
    np.dtype("int16"): pb.TensorProto.INT16,
    np.dtype("int8"): pb.TensorProto.INT8,
    np.dtype("uint8"): pb.TensorProto.UINT8,
    np.dtype("bool"): pb.TensorProto.BOOL,
}


def _onnx_dtype(dtype) -> int:
    if dtype == jnp.bfloat16:
        return pb.TensorProto.BFLOAT16
    return _NP_TO_ONNX[np.dtype(dtype)]


def _tensor_proto(name: str, arr) -> pb.TensorProto:
    t = pb.TensorProto()
    t.name = name
    if hasattr(arr, "dtype") and arr.dtype == jnp.bfloat16:
        np_arr = np.asarray(arr).view(np.uint16)
        t.data_type = pb.TensorProto.BFLOAT16
    else:
        np_arr = np.asarray(arr)
        t.data_type = _NP_TO_ONNX[np_arr.dtype]
    t.dims.extend(np_arr.shape)
    t.raw_data = np.ascontiguousarray(np_arr).tobytes()
    return t


class _Exporter:
    def __init__(self, root: Optional["_Exporter"] = None):
        self.graph = pb.GraphProto()
        self.names: Dict[Any, str] = {}
        self.consts: Dict[Any, np.ndarray] = {}  # var -> folded constant
        self._root = root or self
        self.counter = 0
        self.initializer_names: Dict[int, str] = {}

    def child(self) -> "_Exporter":
        """Exporter for a subgraph (Scan/Loop body). Shares the name counter
        so subgraph names never collide with outer-scope names (ONNX
        subgraphs capture outer values by name)."""
        return _Exporter(root=self._root)

    def fresh(self, hint="v"):
        self._root.counter += 1
        return f"{hint}_{self._root.counter}"

    def name_of(self, var):
        from jax.extend.core import Literal

        if isinstance(var, Literal):
            return self.add_initializer(np.asarray(var.val))
        if var in self.consts:
            return self.add_initializer(self.consts[var])
        return self.names[var]

    def const_of(self, var):
        from jax.extend.core import Literal

        if isinstance(var, Literal):
            return np.asarray(var.val)
        return self.consts.get(var)

    def add_initializer(self, arr, hint="const") -> str:
        arr = np.asarray(arr)
        # dedup by the full key, not its hash — a hash collision would
        # silently alias two different constants
        key = (arr.shape, str(arr.dtype), arr.tobytes())
        if key in self.initializer_names:
            return self.initializer_names[key]
        name = self.fresh(hint)
        self.graph.initializer.append(_tensor_proto(name, arr))
        self.initializer_names[key] = name
        return name

    def node(self, op_type: str, inputs: Sequence[str], n_out: int = 1,
             **attrs) -> List[str]:
        n = self.graph.node.add()
        n.op_type = op_type
        n.name = self.fresh(op_type)
        n.input.extend(inputs)
        outs = [self.fresh(op_type.lower()) for _ in range(n_out)]
        n.output.extend(outs)
        for k, v in attrs.items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, bool):
                a.type = pb.AttributeProto.INT
                a.i = int(v)
            elif isinstance(v, int):
                a.type = pb.AttributeProto.INT
                a.i = v
            elif isinstance(v, float):
                a.type = pb.AttributeProto.FLOAT
                a.f = v
            elif isinstance(v, str):
                a.type = pb.AttributeProto.STRING
                a.s = v.encode()
            elif isinstance(v, (list, tuple)) and all(
                isinstance(x, int) for x in v
            ):
                a.type = pb.AttributeProto.INTS
                a.ints.extend(v)
            elif isinstance(v, (list, tuple)) and all(
                isinstance(x, float) for x in v
            ):
                a.type = pb.AttributeProto.FLOATS
                a.floats.extend(v)
            elif isinstance(v, pb.GraphProto):
                a.type = pb.AttributeProto.GRAPH
                a.g.CopyFrom(v)
            else:
                raise ValueError(f"attr {k}={v}")
        return outs


def _einsum_equation(dimension_numbers, lhs_ndim, rhs_ndim):
    (lc, rc), (lb, rb) = dimension_numbers
    letters = "abcdefghijklmnopqrstuvwxyz"
    it = iter(letters)
    lhs_l = [None] * lhs_ndim
    rhs_l = [None] * rhs_ndim
    # batch dims share letters
    for li, ri in zip(lb, rb):
        c = next(it)
        lhs_l[li] = c
        rhs_l[ri] = c
    # contract dims share letters
    for li, ri in zip(lc, rc):
        c = next(it)
        lhs_l[li] = c
        rhs_l[ri] = c
    for i in range(lhs_ndim):
        if lhs_l[i] is None:
            lhs_l[i] = next(it)
    for i in range(rhs_ndim):
        if rhs_l[i] is None:
            rhs_l[i] = next(it)
    out = (
        [lhs_l[i] for i in lb]
        + [lhs_l[i] for i in range(lhs_ndim) if i not in lb and i not in lc]
        + [rhs_l[i] for i in range(rhs_ndim) if i not in rb and i not in rc]
    )
    return f"{''.join(lhs_l)},{''.join(rhs_l)}->{''.join(out)}"


def export_onnx(fn, example_args, path: Optional[str] = None, *,
                model_name: str = "lamp_tpu_model",
                input_names: Optional[Sequence[str]] = None,
                output_names: Optional[Sequence[str]] = None) -> pb.ModelProto:
    """Export ``fn(*example_args)`` to an ONNX ModelProto (optionally writing
    it to ``path``). Weights captured by closure become initializers."""
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    ex = _Exporter()

    # graph inputs
    flat_args = jax.tree_util.tree_leaves(example_args)
    in_names = input_names or [f"input_{i}" for i in range(len(jaxpr.invars))]
    for var, name in zip(jaxpr.invars, in_names):
        ex.names[var] = name
        vi = ex.graph.input.add()
        vi.name = name
        vi.type.tensor_type.elem_type = _onnx_dtype(var.aval.dtype)
        for d in var.aval.shape:
            dim = vi.type.tensor_type.shape.dim.add()
            dim.dim_value = d

    # consts (weights) are fold-candidates; only materialize when used
    for var, val in zip(jaxpr.constvars, closed.consts):
        ex.consts[var] = np.asarray(val)

    _emit_jaxpr(ex, jaxpr)

    out_names_final = []
    onames = output_names or [f"output_{i}" for i in range(len(jaxpr.outvars))]
    for var, name in zip(jaxpr.outvars, onames):
        src = ex.name_of(var)
        # alias via Identity so the graph output has the requested name
        n = ex.graph.node.add()
        n.op_type = "Identity"
        n.name = ex.fresh("out")
        n.input.append(src)
        n.output.append(name)
        vo = ex.graph.output.add()
        vo.name = name
        vo.type.tensor_type.elem_type = _onnx_dtype(var.aval.dtype)
        for d in var.aval.shape:
            dim = vo.type.tensor_type.shape.dim.add()
            dim.dim_value = d
        out_names_final.append(name)

    model = pb.ModelProto()
    model.ir_version = 8
    model.producer_name = "lamp_tpu"
    model.producer_version = "0.1"
    model.graph.CopyFrom(ex.graph)
    model.graph.name = model_name
    op = model.opset_import.add()
    op.version = OPSET
    if path:
        with open(path, "wb") as f:
            f.write(model.SerializeToString())
    return model


def _eval_prim(eqn, consts):
    """Constant-fold one primitive eagerly."""
    from jax.extend.core import Literal

    vals = [
        c.val if isinstance(c, Literal) else consts[c] for c in eqn.invars
    ]
    out = eqn.primitive.bind(*[jnp.asarray(v) for v in vals], **eqn.params)
    if not eqn.primitive.multiple_results:
        out = [out]
    return [np.asarray(o) for o in out]


def _emit_jaxpr(ex: _Exporter, jaxpr):
    from jax.extend.core import Literal

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name

        # inline call-like primitives
        if prim in ("pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "custom_vjp_call_jaxpr", "remat",
                    "checkpoint", "jit"):
            sub = None
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if k in eqn.params:
                    sub = eqn.params[k]
                    break
            if sub is None:
                raise NotImplementedError(f"call prim {prim}: {eqn.params.keys()}")
            sub_jaxpr = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            sub_consts = getattr(sub, "consts", [])
            # bind invars
            for sv, ov in zip(sub_jaxpr.invars, eqn.invars):
                c = ex.const_of(ov)
                if c is not None:
                    ex.consts[sv] = c
                else:
                    ex.names[sv] = ex.name_of(ov)
            for sv, cval in zip(sub_jaxpr.constvars, sub_consts):
                ex.consts[sv] = np.asarray(cval)
            _emit_jaxpr(ex, sub_jaxpr)
            for outer, inner in zip(eqn.outvars, sub_jaxpr.outvars):
                c = ex.const_of(inner)
                if c is not None:
                    ex.consts[outer] = c
                else:
                    ex.names[outer] = ex.name_of(inner)
            continue

        # constant folding: all inputs known -> evaluate now
        if all(
            isinstance(v, Literal) or v in ex.consts for v in eqn.invars
        ):
            outs = _eval_prim(eqn, ex.consts)
            for var, val in zip(eqn.outvars, outs):
                ex.consts[var] = val
            continue

        outs = _emit_eqn(ex, eqn)
        for var, name in zip(eqn.outvars, outs):
            ex.names[var] = name


_SIMPLE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
    "exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
    "erf": "Erf", "sqrt": "Sqrt", "abs": "Abs", "neg": "Neg",
    "sign": "Sign", "floor": "Floor", "ceil": "Ceil",
    "sin": "Sin", "cos": "Cos", "tan": "Tan", "atan": "Atan",
    "stop_gradient": "Identity", "copy": "Identity",
    "not": "Not",
    "eq": "Equal", "lt": "Less", "gt": "Greater",
    "le": "LessOrEqual", "ge": "GreaterOrEqual",
    "and": "And", "or": "Or",
}


def _emit_eqn(ex: _Exporter, eqn) -> List[str]:
    prim = eqn.primitive.name
    ins = [ex.name_of(v) for v in eqn.invars]
    p = eqn.params

    if prim in _SIMPLE:
        return ex.node(_SIMPLE[prim], ins)

    if prim == "integer_pow":
        exp_init = ex.add_initializer(
            np.asarray(p["y"]).astype(np.dtype(eqn.invars[0].aval.dtype))
        )
        return ex.node("Pow", [ins[0], exp_init])

    if prim == "square":
        return ex.node("Mul", [ins[0], ins[0]])

    if prim == "cbrt":
        third = ex.add_initializer(
            np.asarray(1.0 / 3.0, eqn.invars[0].aval.dtype)
        )
        return ex.node("Pow", [ins[0], third])

    if prim == "is_finite":
        inf_chk = ex.node("IsInf", [ins[0]])[0]
        nan_chk = ex.node("IsNaN", [ins[0]])[0]
        bad = ex.node("Or", [inf_chk, nan_chk])[0]
        return ex.node("Not", [bad])

    if prim == "rsqrt":
        s = ex.node("Sqrt", ins)[0]
        one = ex.add_initializer(np.asarray(1.0, eqn.invars[0].aval.dtype))
        return ex.node("Div", [one, s])

    if prim == "log1p":
        one = ex.add_initializer(np.asarray(1.0, eqn.invars[0].aval.dtype))
        s = ex.node("Add", [one, ins[0]])[0]
        return ex.node("Log", [s])

    if prim == "convert_element_type":
        return ex.node("Cast", ins, to=int(_onnx_dtype(p["new_dtype"])))

    if prim == "reshape":
        shape = ex.add_initializer(np.asarray(eqn.outvars[0].aval.shape, np.int64))
        return ex.node("Reshape", [ins[0], shape])

    if prim == "squeeze":
        axes = ex.add_initializer(np.asarray(p["dimensions"], np.int64))
        return ex.node("Squeeze", [ins[0], axes])

    if prim == "expand_dims":
        axes = ex.add_initializer(np.asarray(p["dimensions"], np.int64))
        return ex.node("Unsqueeze", [ins[0], axes])

    if prim == "transpose":
        return ex.node("Transpose", ins, perm=list(p["permutation"]))

    if prim == "broadcast_in_dim":
        in_shape = eqn.invars[0].aval.shape
        out_shape = p["shape"]
        bdims = p["broadcast_dimensions"]
        # reshape to place existing dims, then Expand
        mid = [1] * len(out_shape)
        for i, d in enumerate(bdims):
            mid[d] = in_shape[i]
        shape1 = ex.add_initializer(np.asarray(mid, np.int64))
        r = ex.node("Reshape", [ins[0], shape1])[0]
        shape2 = ex.add_initializer(np.asarray(out_shape, np.int64))
        return ex.node("Expand", [r, shape2])

    if prim in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod"):
        axes = list(p["axes"])
        op = {"reduce_sum": "ReduceSum", "reduce_max": "ReduceMax",
              "reduce_min": "ReduceMin", "reduce_prod": "ReduceProd"}[prim]
        if op == "ReduceSum":
            ax = ex.add_initializer(np.asarray(axes, np.int64))
            return ex.node(op, [ins[0], ax], keepdims=0)
        return ex.node(op, [ins[0]], axes=axes, keepdims=0)

    if prim in ("argmax", "argmin"):
        axes = p["axes"]
        op = "ArgMax" if prim == "argmax" else "ArgMin"
        out = ex.node(op, [ins[0]], axis=int(axes[0]), keepdims=0)
        if np.dtype(p["index_dtype"]) != np.int64:
            return ex.node("Cast", out, to=int(_onnx_dtype(p["index_dtype"])))
        return out

    if prim == "select_n":
        # select_n(pred, case0, case1): pred False->case0, True->case1
        assert len(ins) == 3, "select_n with >2 cases unsupported"
        return ex.node("Where", [ins[0], ins[2], ins[1]])

    if prim == "dot_general":
        eqs = _einsum_equation(
            p["dimension_numbers"], eqn.invars[0].aval.ndim,
            eqn.invars[1].aval.ndim,
        )
        return ex.node("Einsum", ins, equation=eqs)

    if prim == "conv_general_dilated":
        dn = p["dimension_numbers"]
        # we emit only the NCHW/OIHW layout our layers use
        lhs_spec = dn.lhs_spec if hasattr(dn, "lhs_spec") else dn[0]
        strides = list(p["window_strides"])
        pads = p["padding"]
        pad_list = [pr[0] for pr in pads] + [pr[1] for pr in pads]
        rhs_dil = list(p.get("rhs_dilation") or [1] * len(strides))
        lhs_dil = list(p.get("lhs_dilation") or [1] * len(strides))
        if any(d != 1 for d in lhs_dil):
            raise NotImplementedError("transposed conv export")
        return ex.node(
            "Conv", ins, strides=strides, pads=pad_list, dilations=rhs_dil,
            group=int(p.get("feature_group_count", 1)),
        )

    if prim in ("reduce_window_max", "reduce_window_sum", "reduce_window"):
        wd = p["window_dimensions"]
        ws = p["window_strides"]
        pads = p["padding"]
        if prim == "reduce_window":
            body = str(p["jaxpr"].eqns[0].primitive.name) if p["jaxpr"].eqns \
                else ""
            kind = {"max": "max", "add": "sum"}.get(body)
            if kind is None:
                raise NotImplementedError(f"reduce_window body {body}")
        else:
            kind = "max" if prim.endswith("max") else "sum"
        if not (wd[0] == wd[1] == 1 and ws[0] == ws[1] == 1):
            raise NotImplementedError("non-NCHW pooling")
        pad_list = [pr[0] for pr in pads[2:]] + [pr[1] for pr in pads[2:]]
        if kind == "max":
            return ex.node(
                "MaxPool", [ins[0]], kernel_shape=list(wd[2:]),
                strides=list(ws[2:]), pads=pad_list,
            )
        # sum pooling: AveragePool * window size
        avg = ex.node(
            "AveragePool", [ins[0]], kernel_shape=list(wd[2:]),
            strides=list(ws[2:]), pads=pad_list, count_include_pad=1,
        )[0]
        size = float(np.prod(wd[2:]))
        scale = ex.add_initializer(np.asarray(size, eqn.invars[0].aval.dtype))
        return ex.node("Mul", [avg, scale])

    if prim == "concatenate":
        return ex.node("Concat", ins, axis=int(p["dimension"]))

    if prim == "slice":
        starts = ex.add_initializer(np.asarray(p["start_indices"], np.int64))
        ends = ex.add_initializer(np.asarray(p["limit_indices"], np.int64))
        axes = ex.add_initializer(
            np.asarray(range(len(p["start_indices"])), np.int64)
        )
        if p.get("strides"):
            steps = ex.add_initializer(np.asarray(p["strides"], np.int64))
            return ex.node("Slice", [ins[0], starts, ends, axes, steps])
        return ex.node("Slice", [ins[0], starts, ends, axes])

    if prim == "rev":
        # reverse via Slice with negative steps
        dims = list(p["dimensions"])
        starts = ex.add_initializer(np.asarray([-1] * len(dims), np.int64))
        ends = ex.add_initializer(
            np.asarray([np.iinfo(np.int64).min + 1] * len(dims), np.int64)
        )
        axes = ex.add_initializer(np.asarray(dims, np.int64))
        steps = ex.add_initializer(np.asarray([-1] * len(dims), np.int64))
        return ex.node("Slice", [ins[0], starts, ends, axes, steps])

    if prim == "pad":
        cfg = p["padding_config"]
        if any(interior != 0 for _, _, interior in cfg):
            raise NotImplementedError("interior pad")
        pad_list = [lo for lo, _, _ in cfg] + [hi for _, hi, _ in cfg]
        pads = ex.add_initializer(np.asarray(pad_list, np.int64))
        return ex.node("Pad", [ins[0], pads, ins[1]])

    if prim == "gather":
        # recognize the jnp.take(..., axis=a) pattern
        dn = p["dimension_numbers"]
        operand = eqn.invars[0].aval
        sizes = tuple(p["slice_sizes"])
        full_rows = all(
            sizes[dim] == operand.shape[dim]
            for dim in range(operand.ndim)
            if dim not in dn.start_index_map
        )
        if (
            len(dn.start_index_map) == 1
            and len(dn.collapsed_slice_dims) == 1
            and dn.collapsed_slice_dims[0] == dn.start_index_map[0]
            and full_rows  # ONNX Gather returns FULL rows; partial
                           # slice_sizes would silently widen the result
        ):
            axis = dn.start_index_map[0]
            # indices var has trailing singleton dim; drop it
            idx_aval = eqn.invars[1].aval
            sq_axes = ex.add_initializer(np.asarray([idx_aval.ndim - 1], np.int64))
            idx = ex.node("Squeeze", [ins[1], sq_axes])[0]
            return ex.node("Gather", [ins[0], idx], axis=int(axis))
        raise NotImplementedError(f"general gather: {dn}")

    if prim == "iota":
        raise NotImplementedError("dynamic iota (should have been folded)")

    if prim == "clamp":
        return ex.node("Clip", [ins[1], ins[0], ins[2]])

    if prim == "cumsum":
        ax = ex.add_initializer(np.asarray(p["axis"], np.int64))
        return ex.node("CumSum", [ins[0], ax],
                       reverse=int(bool(p.get("reverse", False))))

    if prim == "rem":
        return ex.node("Mod", ins, fmod=1)

    if prim == "dynamic_slice":
        sizes = np.asarray(p["slice_sizes"], np.int64)
        dims = np.asarray(eqn.invars[0].aval.shape, np.int64)
        parts = []
        axes0 = ex.add_initializer(np.asarray([0], np.int64))
        for s_in in ins[1:]:
            c = ex.node("Cast", [s_in], to=int(pb.TensorProto.INT64))[0]
            parts.append(ex.node("Unsqueeze", [c, axes0])[0])
        starts_raw = (
            ex.node("Concat", parts, axis=0)[0] if len(parts) > 1 else parts[0]
        )
        # jax clamps starts so the full slice fits; mirror that
        zeros = ex.add_initializer(np.zeros(len(sizes), np.int64))
        maxs = ex.add_initializer(dims - sizes)
        starts = ex.node("Max", [starts_raw, zeros])[0]
        starts = ex.node("Min", [starts, maxs])[0]
        sz = ex.add_initializer(sizes)
        ends = ex.node("Add", [starts, sz])[0]
        axes = ex.add_initializer(np.arange(len(sizes), dtype=np.int64))
        return ex.node("Slice", [ins[0], starts, ends, axes])

    if prim == "scan":
        return _emit_scan(ex, eqn)

    if prim == "while":
        return _emit_while(ex, eqn)

    raise NotImplementedError(f"ONNX export: unsupported primitive '{prim}'")


def _declare_graph_input(g: pb.GraphProto, name: str, dtype, shape) -> None:
    vi = g.input.add()
    vi.name = name
    vi.type.tensor_type.elem_type = _onnx_dtype(dtype)
    for d in shape:
        vi.type.tensor_type.shape.dim.add().dim_value = int(d)


def _declare_graph_output(child: "_Exporter", var, dtype, shape) -> str:
    """Alias ``var`` (via Identity) as a fresh subgraph output."""
    src = child.name_of(var)
    name = child.fresh("body_out")
    n = child.graph.node.add()
    n.op_type = "Identity"
    n.name = child.fresh("out")
    n.input.append(src)
    n.output.append(name)
    vo = child.graph.output.add()
    vo.name = name
    vo.type.tensor_type.elem_type = _onnx_dtype(dtype)
    for d in shape:
        vo.type.tensor_type.shape.dim.add().dim_value = int(d)
    return name


def _emit_scan(ex: _Exporter, eqn) -> List[str]:
    """lax.scan -> ONNX Scan. Reference precedent: lamp-onnx exports only
    the static graphs it traces; scan bodies become an ONNX Scan subgraph
    here so RNN/LSTM/GRU inference exports without unrolling."""
    p = eqn.params
    closed = p["jaxpr"]
    body = closed.jaxpr
    nc, ncar = p["num_consts"], p["num_carry"]
    reverse = bool(p.get("reverse", False))
    length = int(p["length"])

    const_vs = eqn.invars[:nc]
    carry_vs = eqn.invars[nc:nc + ncar]
    xs_vs = eqn.invars[nc + ncar:]
    n_ys = len(eqn.outvars) - ncar

    child = ex.child()
    # consts: captured from the outer scope by name (or folded in-body)
    for bv, ov in zip(body.invars[:nc], const_vs):
        cval = ex.const_of(ov)
        if cval is not None:
            child.consts[bv] = cval
        else:
            child.names[bv] = ex.name_of(ov)
    for bv, cval in zip(body.constvars, closed.consts):
        child.consts[bv] = np.asarray(cval)

    # body graph inputs: carries, then per-step scan-input elements
    for bv in body.invars[nc:]:
        name = child.fresh("scan_in")
        child.names[bv] = name
        _declare_graph_input(child.graph, name, bv.aval.dtype, bv.aval.shape)

    scan_ins = [ex.name_of(v) for v in xs_vs]
    if not xs_vs:
        # ONNX Scan requires >= 1 scan input; feed an unused zeros[length, 1]
        dummy = ex.add_initializer(
            np.zeros((length, 1), np.float32), "scan_dummy"
        )
        scan_ins = [dummy]
        _declare_graph_input(child.graph, child.fresh("scan_in"),
                             np.float32, (1,))

    _emit_jaxpr(child, body)

    for ov in body.outvars[:ncar]:
        _declare_graph_output(child, ov, ov.aval.dtype, ov.aval.shape)
    for ov in body.outvars[ncar:]:
        _declare_graph_output(child, ov, ov.aval.dtype, ov.aval.shape)

    n_scan_in = max(len(xs_vs), 1)
    attrs = dict(
        body=child.graph,
        num_scan_inputs=n_scan_in,
        scan_input_axes=[0] * n_scan_in,
    )
    if n_ys:
        attrs["scan_output_axes"] = [0] * n_ys
    if reverse:
        attrs["scan_input_directions"] = [1] * n_scan_in
        if n_ys:
            attrs["scan_output_directions"] = [1] * n_ys

    node_ins = [ex.name_of(v) for v in carry_vs] + scan_ins
    return ex.node("Scan", node_ins, n_out=ncar + n_ys, **attrs)


def _emit_while(ex: _Exporter, eqn) -> List[str]:
    """lax.while_loop -> ONNX Loop (condition-driven, no trip count)."""
    p = eqn.params
    cond_closed, body_closed = p["cond_jaxpr"], p["body_jaxpr"]
    cnc, bnc = p["cond_nconsts"], p["body_nconsts"]
    cond_consts = eqn.invars[:cnc]
    body_consts = eqn.invars[cnc:cnc + bnc]
    carry_vs = eqn.invars[cnc + bnc:]
    ncar = len(carry_vs)

    def bind_consts(child, jaxpr, closed, const_outer):
        for bv, ov in zip(jaxpr.invars[:len(const_outer)], const_outer):
            cval = ex.const_of(ov)
            if cval is not None:
                child.consts[bv] = cval
            else:
                child.names[bv] = ex.name_of(ov)
        for bv, cval in zip(jaxpr.constvars, closed.consts):
            child.consts[bv] = np.asarray(cval)

    # initial condition, evaluated in the outer graph
    outer_cond = ex.child()
    outer_cond.graph = ex.graph  # emit directly into the outer graph
    bind_consts(outer_cond, cond_closed.jaxpr, cond_closed, cond_consts)
    for bv, ov in zip(cond_closed.jaxpr.invars[cnc:], carry_vs):
        cval = ex.const_of(ov)
        if cval is not None:
            outer_cond.consts[bv] = cval
        else:
            outer_cond.names[bv] = ex.name_of(ov)
    _emit_jaxpr(outer_cond, cond_closed.jaxpr)
    cond0 = outer_cond.name_of(cond_closed.jaxpr.outvars[0])

    # Loop body: inputs (iter, cond_in, carries); outputs (cond_out, carries)
    child = ex.child()
    it_name = child.fresh("loop_iter")
    cond_in = child.fresh("loop_cond")
    _declare_graph_input(child.graph, it_name, np.int64, ())
    _declare_graph_input(child.graph, cond_in, np.dtype(bool), ())
    body = body_closed.jaxpr
    bind_consts(child, body, body_closed, body_consts)
    for bv in body.invars[bnc:]:
        name = child.fresh("loop_in")
        child.names[bv] = name
        _declare_graph_input(child.graph, name, bv.aval.dtype, bv.aval.shape)
    _emit_jaxpr(child, body)

    # recompute the condition on the new carry, same subgraph
    cond_child_bindings = {}
    for bv, ov in zip(cond_closed.jaxpr.invars[cnc:], body.outvars):
        cval = child.const_of(ov)
        if cval is not None:
            cond_child_bindings[bv] = ("const", cval)
        else:
            cond_child_bindings[bv] = ("name", child.name_of(ov))
    cond_eval = ex.child()
    cond_eval.graph = child.graph
    bind_consts(cond_eval, cond_closed.jaxpr, cond_closed, cond_consts)
    for bv, (kind, val) in cond_child_bindings.items():
        if kind == "const":
            cond_eval.consts[bv] = val
        else:
            cond_eval.names[bv] = val
    _emit_jaxpr(cond_eval, cond_closed.jaxpr)

    _declare_graph_output(cond_eval, cond_closed.jaxpr.outvars[0],
                          np.dtype(bool), ())
    for ov in body.outvars:
        _declare_graph_output(child, ov, ov.aval.dtype, ov.aval.shape)

    node_ins = ["", cond0] + [ex.name_of(v) for v in carry_vs]
    return ex.node("Loop", node_ins, n_out=ncar, body=child.graph)
