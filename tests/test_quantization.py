"""Int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import nn, ops


def test_quantize_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
    q, s = ops.quantize_int8(w, axis=0)
    assert q.dtype == jnp.int8
    back = ops.dequantize_int8(q, s)
    # absmax per column bounds the error at scale/2
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(s) * 0.51
    assert (err <= bound).all()


def test_int8_matmul_close_to_float():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32) * 0.1
    wq, ws = ops.quantize_int8(w, axis=0)
    y_q = ops.int8_matmul(x, wq, ws)
    y_f = x @ w
    rel = np.linalg.norm(np.asarray(y_q - y_f)) / np.linalg.norm(np.asarray(y_f))
    assert rel < 0.02, rel


def test_quantized_linear_and_model_surgery():
    key = jax.random.PRNGKey(0)
    model = nn.MLP(8, 32, 4, key=key, norm=False)
    qmodel = ops.quantize_model(model)
    # all Linears replaced
    assert isinstance(qmodel.layers[0], ops.QuantizedLinear)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8), jnp.float32)
    y_f = np.asarray(model(x))
    y_q = np.asarray(qmodel(x))
    cos = (y_f * y_q).sum() / (
        np.linalg.norm(y_f) * np.linalg.norm(y_q) + 1e-9
    )
    assert cos > 0.999, cos


def test_quantized_lm_generates():
    """A quantized LM still produces coherent argmax decoding (end-to-end
    serving path)."""
    from lamp_tpu import data

    model = nn.LanguageModelModule.init(
        vocab_size=17, context_length=12, num_blocks=1, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    qmodel = ops.quantize_model(model)
    prefix = np.array([[1, 2, 3]])
    out_f = data.autoregressive_inference(model, prefix, length=4, temperature=0)
    out_q = data.autoregressive_inference(qmodel, prefix, length=4, temperature=0)
    assert out_q.shape == out_f.shape
    assert out_q.min() >= 0 and out_q.max() < 17


def test_stochastic_quantizer_unbiased():
    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("pltpu.prng_seed has no CPU interpreter lowering")
    # anchor the scale at 1.0; payload 0.3 -> scaled 38.1 rounds 38/39
    x = jnp.concatenate(
        [jnp.ones((512, 1)), jnp.full((512, 127), 0.3)], axis=1
    ).astype(jnp.float32)
    vals, scales = ops.quantize_int8_stochastic(x, seed=1)
    v = np.asarray(vals)[:, 1:]
    assert set(np.unique(v)) <= {38, 39}
    back = v.astype(np.float32) * np.asarray(scales)
    # unbiased: the mean approximates the true value despite sub-ULP rounding
    np.testing.assert_allclose(back.mean(), 0.3, rtol=0.005)


def test_int4_roundtrip_exact_on_grid():
    """Values already on the int4 grid survive the pack/unpack round trip
    exactly."""
    rng = np.random.RandomState(0)
    # [-7, 7]: absmax maps to ±7 codes, so these are exactly representable
    grid = rng.randint(-7, 8, (64, 16)).astype(np.float32)
    scales = np.abs(rng.randn(1, 16)).astype(np.float32) + 0.1
    w = jnp.asarray(grid * scales)
    packed, s = ops.quantize_int4(w, group_size=32)
    assert packed.shape == (32, 16) and packed.dtype == jnp.uint8
    back = np.asarray(ops.dequantize_int4(packed, s, dtype=jnp.float32))
    np.testing.assert_allclose(back, np.asarray(w), rtol=2e-3, atol=1e-4)


def test_int4_matmul_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 32).astype(np.float32))
    packed, s = ops.quantize_int4(w, group_size=32)
    y_q = np.asarray(ops.int4_matmul(x, packed, s))
    y_f = np.asarray(x @ w)
    cos = (y_q * y_f).sum() / (
        np.linalg.norm(y_q) * np.linalg.norm(y_f) + 1e-9
    )
    assert cos > 0.99, cos


def test_int4_model_surgery_and_generation():
    from lamp_tpu import data

    model = nn.LanguageModelModule.init(
        vocab_size=17, context_length=12, num_blocks=1, embed_dim=16,
        attention_heads=2, key=jax.random.PRNGKey(0),
    )
    qmodel = ops.quantize_model(model, bits=4)
    assert isinstance(
        qmodel.encoder.blocks[0].attention.w_q, ops.QuantizedLinearInt4
    )
    prefix = np.array([[1, 2, 3]])
    out_q = data.autoregressive_inference(qmodel, prefix, length=4,
                                          temperature=0)
    assert out_q.min() >= 0 and out_q.max() < 17
    # packed weights really are half-size uint8
    wq = qmodel.encoder.blocks[0].attention.w_q.w_packed
    assert wq.dtype == jnp.uint8 and wq.shape[0] == 8


def test_int4_fused_kernel_matches_dequant_reference():
    """The fused Pallas dequant-matmul (kernel-eligible shapes: N%128,
    group%32) equals the XLA dequantize-then-dot path, including the
    M-padding branch."""
    rng = np.random.RandomState(2)
    for m, k, n, dt in ((5, 256, 128, jnp.float32), (16, 512, 256, jnp.bfloat16)):
        w = jnp.asarray(rng.randn(k, n).astype(np.float32))
        g = ops.int4_group_size(k)
        assert g % 32 == 0
        packed, s = ops.quantize_int4(w, group_size=g)
        x = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(dt)
        y_kernel = np.asarray(
            ops.int4_matmul(x, packed, s, out_dtype=jnp.float32,
                            interpret=True)
        )
        # exact f32 reference (the kernel applies group scales in f32 to the
        # partial products, so it is MORE precise than a bf16 dequant-dot)
        deq = ops.dequantize_int4(packed, s, dtype=jnp.float32)
        y_ref = np.asarray(
            jnp.dot(x.astype(jnp.float32), deq,
                    preferred_element_type=jnp.float32)
        )
        np.testing.assert_allclose(y_kernel, y_ref, atol=1e-3, rtol=1e-3)
