"""ONNX export tests: export zoo-model inference graphs and verify by
re-executing the ONNX graph with the bundled numpy interpreter.

Mirrors the reference's lamp-onnx onnx.test.scala (export then run under
onnxruntime and compare outputs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import nn
from lamp_tpu.io.onnx_export import export_onnx
from lamp_tpu.io.onnx_interp import run_onnx


try:  # opportunistic: cross-check exports under a real ONNX runtime.
    # VERIFIED UNOBTAINABLE on this box (round 5): not in the baked image,
    # no local wheel anywhere on disk, and `pip download onnxruntime`
    # reports "from versions: none" (zero-egress environment). The torch
    # executor below (run_onnx_torch) is the independent runtime check
    # that actually executes here; this branch stays only so the suite
    # picks onnxruntime up automatically if a future image bakes it in.
    import onnxruntime as _ort
except ImportError:  # pragma: no cover - absent in the baked image
    _ort = None

try:  # independent verifier built on torch's native op kernels
    import torch as _torch

    from lamp_tpu.io.onnx_torch import run_onnx_torch
except ImportError:  # pragma: no cover - torch is baked into this image
    _torch = None


def _check(fn, args, atol=1e-4, input_names=None):
    model = export_onnx(fn, args, input_names=input_names)
    expected = fn(*args)
    names = input_names or [f"input_{i}" for i in range(len(args))]
    feeds = dict(zip(names, [np.asarray(a) for a in args]))
    got = run_onnx(model, feeds)
    np.testing.assert_allclose(
        np.asarray(expected, np.float64), np.asarray(got[0], np.float64),
        atol=atol, rtol=atol,
    )
    if _ort is not None:
        # independent-runtime verification (the reference re-executes its
        # exports under com.microsoft.onnxruntime — lamp-onnx onnx.test.scala;
        # the bundled numpy interpreter alone is self-referential)
        sess = _ort.InferenceSession(
            model.SerializeToString(), providers=["CPUExecutionProvider"]
        )
        ort_feeds = {
            k: v.astype(np.float32) if v.dtype == np.float64 else v
            for k, v in feeds.items()
        }
        (ort_out, *_rest) = sess.run(None, ort_feeds)
        np.testing.assert_allclose(
            np.asarray(expected, np.float64), np.asarray(ort_out, np.float64),
            atol=max(atol, 1e-3), rtol=max(atol, 1e-3),
        )
    if _torch is not None:
        # second independent verification: re-execute the graph dispatching
        # every node to torch's native kernels (conv/pool/einsum/erf/… are
        # implementations written by neither the exporter nor the numpy
        # interpreter — the reference gets this independence from
        # onnxruntime, build.sbt:259)
        torch_out = run_onnx_torch(model, feeds)
        np.testing.assert_allclose(
            np.asarray(expected, np.float64),
            np.asarray(torch_out[0], np.float64),
            atol=max(atol, 1e-3), rtol=max(atol, 1e-3),
        )
    return model


def test_torch_crosscheck_runs():
    """The torch-based independent verifier must actually execute on this
    box (torch is baked in) — unlike the onnxruntime branch which skips."""
    assert _torch is not None
    m = nn.MLP(4, 8, 3, key=jax.random.PRNGKey(0), norm=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    model = export_onnx(lambda x: m(x), (x,))
    got = run_onnx_torch(model, {"input_0": np.asarray(x)})
    np.testing.assert_allclose(
        np.asarray(m(x), np.float64), got[0].astype(np.float64), atol=1e-4
    )


def test_export_mlp():
    m = nn.MLP(4, 8, 3, key=jax.random.PRNGKey(0), norm=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    _check(lambda x: m(x), (x,))


def test_export_mlp_with_batchnorm():
    m = nn.MLP(4, 8, 3, key=jax.random.PRNGKey(0), norm=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    _check(lambda x: m(x), (x,))


def test_export_conv_net():
    key = jax.random.PRNGKey(0)
    m = nn.Sequential.init(
        nn.Conv2D.init(3, 8, 3, key=key, padding=1),
        nn.Fun.init(jax.nn.relu),
        nn.MaxPool2D.init(2),
        nn.BatchNorm2D.init(8),
        nn.Fun.init(lambda x: x.reshape(x.shape[0], -1)),
        nn.Linear.init(8 * 4 * 4, 5, key=jax.random.PRNGKey(2)),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8))
    _check(lambda x: m(x), (x,))


def test_export_transformer_lm():
    m = nn.LanguageModelModule.init(
        vocab_size=17, context_length=8, num_blocks=1, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)

    def fwd(tokens):
        logits, _ = m.forward(tokens, train=False)
        return logits

    model = _check(fwd, (tokens,), atol=2e-3, input_names=["tokens"])
    # graph has initializers (the weights) and einsum/softmax structure
    assert len(model.graph.initializer) > 4
    ops = {n.op_type for n in model.graph.node}
    assert "Einsum" in ops


def test_export_lstm_classifier():
    """The LSTM's lax.scan exports as an ONNX Scan subgraph — no unrolling."""
    key = jax.random.PRNGKey(0)
    emb = nn.Embedding.init(10, 8, key=key)
    lstm = nn.LSTM.init(8, 12, key=jax.random.PRNGKey(1))
    head = nn.Linear.init(12, 3, key=jax.random.PRNGKey(2))
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    def fwd(tokens):
        e = emb(tokens)
        (h, _), _ = lstm.forward((e, None))
        return head(h[:, -1])

    model = _check(fwd, (tokens,), input_names=["tokens"])
    ops = {n.op_type for n in model.graph.node}
    assert "Scan" in ops


def test_export_gru():
    gru = nn.GRU.init(6, 5, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 6))

    def fwd(x):
        (h, _), _ = gru.forward((x, None))
        return h[:, -1]

    _check(fwd, (x,))


def test_export_while_loop():
    """lax.while_loop exports as an ONNX Loop subgraph."""
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 4)) * 0.1

    def fwd(x):
        def cond(carry):
            i, _ = carry
            return i < 5

        def body(carry):
            i, x = carry
            return i + 1, jnp.tanh(x @ w)

        _, y = jax.lax.while_loop(cond, body, (0, x))
        return y

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    model = _check(fwd, (x,))
    ops = {n.op_type for n in model.graph.node}
    assert "Loop" in ops


def test_export_file_roundtrip(tmp_path):
    m = nn.Linear.init(3, 2, key=jax.random.PRNGKey(0))
    x = jnp.ones((1, 3))
    p = str(tmp_path / "model.onnx")
    export_onnx(lambda x: m(x), (x,), path=p)
    from lamp_tpu.io import onnx_minimal_pb2 as pb

    loaded = pb.ModelProto()
    with open(p, "rb") as f:
        loaded.ParseFromString(f.read())
    assert loaded.producer_name == "lamp_tpu"
    got = run_onnx(loaded, {"input_0": np.ones((1, 3), np.float32)})
    np.testing.assert_allclose(np.asarray(m(x)), got[0], atol=1e-6)
