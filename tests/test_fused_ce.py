"""Fused (chunked-vocab) linear+cross-entropy: parity with the naive
materialized-logits loss, values and gradients, including ignore_index
handling, chunk padding, and the ModernLM.loss wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn
from lamp_tpu.ops.fused_ce import fused_linear_cross_entropy, fused_lm_loss


def _naive(x, w, t, ignore_index=-100, reduction="mean"):
    acc = jnp.promote_types(x.dtype, jnp.float32)
    logits = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=acc)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    tgt = jnp.take_along_axis(
        logits, jnp.clip(t, 0, w.shape[0] - 1)[:, None], 1)[:, 0]
    keep = t != ignore_index
    losses = jnp.where(keep, lse - tgt, 0.0)
    if reduction == "none":
        return losses
    if reduction == "sum":
        return jnp.sum(losses)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(keep.astype(acc)), 1.0)


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_value_parity(reduction):
    rng = np.random.RandomState(0)
    n, d, v = 37, 16, 11
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(v, d).astype(np.float32))
    t = rng.randint(0, v, n).astype(np.int32)
    t[::5] = -100  # ignored rows
    t = jnp.asarray(t)
    got = fused_linear_cross_entropy(x, w, t, reduction=reduction,
                                     row_chunk=8)
    want = _naive(x, w, t, reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grad_parity():
    rng = np.random.RandomState(1)
    n, d, v = 29, 12, 7
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(v, d).astype(np.float32))
    t = rng.randint(0, v, n).astype(np.int32)
    t[3] = -100
    t = jnp.asarray(t)

    gx_f, gw_f = jax.grad(
        lambda x, w: fused_linear_cross_entropy(x, w, t, row_chunk=8),
        argnums=(0, 1))(x, w)
    gx_n, gw_n = jax.grad(lambda x, w: _naive(x, w, t), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_n),
                               rtol=1e-5, atol=1e-5)


def test_all_rows_ignored():
    x = jnp.ones((4, 8))
    w = jnp.ones((5, 8))
    t = jnp.full((4,), -100, jnp.int32)
    loss = fused_linear_cross_entropy(x, w, t, row_chunk=4)
    assert float(loss) == 0.0
    gx = jax.grad(
        lambda x: fused_linear_cross_entropy(x, w, t, row_chunk=4))(x)
    assert np.all(np.asarray(gx) == 0.0)


def test_bf16_runs_and_is_close():
    rng = np.random.RandomState(2)
    n, d, v = 16, 32, 64
    x = jnp.asarray(rng.randn(n, d)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(v, d) * 0.1).astype(jnp.bfloat16)
    t = jnp.asarray(rng.randint(0, v, n).astype(np.int32))
    got = fused_linear_cross_entropy(x, w, t, row_chunk=8)
    want = _naive(x, w, t)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=2e-2)
    gx, gw = jax.grad(
        lambda x, w: fused_linear_cross_entropy(x, w, t, row_chunk=8),
        argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16


def test_modern_lm_loss_matches_forward_path():
    key = jax.random.PRNGKey(0)
    model = nn.ModernLM.init(vocab_size=31, context_length=16, num_blocks=2,
                             embed_dim=32, num_heads=4, key=key)
    tok = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 31)
    tgt = jnp.roll(tok, -1, axis=1)

    fused = model.loss(tok, tgt, row_chunk=8)
    logits, _ = model.forward(tok)
    naive = nn.lm_loss(logits, tgt)
    np.testing.assert_allclose(float(fused), float(naive), rtol=1e-5)

    # gradients through the whole model agree between the two formulations
    def loss_fused(m):
        return m.loss(tok, tgt, row_chunk=8)

    def loss_naive(m):
        lg, _ = m.forward(tok)
        return nn.lm_loss(lg, tgt)

    gf = jax.grad(loss_fused)(model)
    gn = jax.grad(loss_naive)(model)
    fl, _ = jax.tree_util.tree_flatten(gf)
    nl, _ = jax.tree_util.tree_flatten(gn)
    for a, b in zip(fl, nl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_untied_head():
    key = jax.random.PRNGKey(3)
    model = nn.ModernLM.init(vocab_size=17, context_length=8, num_blocks=1,
                             embed_dim=16, num_heads=2, tied=False, key=key)
    tok = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, 17)
    tgt = jnp.roll(tok, -1, axis=1)
    fused = model.loss(tok, tgt, row_chunk=8)
    logits, _ = model.forward(tok)
    naive = nn.lm_loss(logits, tgt)
    np.testing.assert_allclose(float(fused), float(naive), rtol=1e-5)


def test_fused_lm_loss_shape_wrapper():
    rng = np.random.RandomState(5)
    b, t, d, v = 2, 6, 8, 9
    h = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    w = jnp.asarray(rng.randn(v, d).astype(np.float32))
    tg = jnp.asarray(rng.randint(0, v, (b, t)).astype(np.int32))
    got = fused_lm_loss(h, w, tg, row_chunk=4)
    want = _naive(h.reshape(-1, d), w, tg.reshape(-1))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_fused_ce_numeric_gradcheck():
    """Central-difference numeric gradients for the fused-CE custom VJP, in
    f64 at the reference's 4-decimal tolerance — the GradientSuite-style
    check (reference autograd.test.scala:104-120) for this kernel, fully
    independent of jax.grad on the naive formulation (the other tests'
    oracle). Covers chunking (row_chunk < N) and ignore_index rows."""
    from .gradcheck import check_grad

    rng = np.random.RandomState(11)
    n, d, v = 7, 5, 6
    x = rng.randn(n, d)
    w = rng.randn(v, d)
    t = rng.randint(0, v, n)
    t[2] = -100  # one ignored row

    check_grad(
        lambda xx: fused_linear_cross_entropy(
            xx, jnp.asarray(w), jnp.asarray(t), row_chunk=3), x)
    check_grad(
        lambda ww: fused_linear_cross_entropy(
            jnp.asarray(x), ww, jnp.asarray(t), row_chunk=3), w)
