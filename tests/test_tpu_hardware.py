"""Real-hardware test tier (``LAMP_TPU_TESTS=1 pytest -m tpu``, once per
round — CLAUDE.md checklist).

The reference runs its kernel-touching tests on the real accelerator as a
tagged suite (CudaTest, lamp-core nn.test.scala:18-19, wired by
build.sbt:86-87 / test_cuda.sh). This is the TPU analogue: the Pallas
kernels' NUMERICS on the actual chip (interpret mode cannot catch
Mosaic-specific layout/DMA bugs — VERDICT r4 missing #1) plus one serving
engine smoke. Distilled from scripts/exp_flash_verify_tpu.py /
exp_paged_verify_tpu.py, whose JSON artifacts could silently go stale;
this tier re-runs at HEAD every round.

Every test body is wrapped in the tunnel-retry helper: the axon service
intermittently fails ANY allocation (CLAUDE.md); a retried pass is a pass.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _retry(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except AssertionError:
            raise  # real numeric failures must not be retried away
        except Exception as e:  # pragma: no cover - service flake path
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}")
            time.sleep(3.0)


def _max_err(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


B, H, D = 2, 8, 64


def _qkv(ctx, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(k, (B, H, ctx, D), jnp.bfloat16)
                 for k in ks)


def _check_attention(ctx, flash_kwargs, ref_kwargs, kernel=None):
    """Forward + backward vs the XLA oracle on the chip. bf16 tolerance:
    two differently-ordered bf16 reductions over ctx elements differ by
    O(sqrt(ctx)) ulps; real masking/indexing bugs produce O(1) errors."""
    from lamp_tpu.ops.attention import flash_attention, mha_reference

    kfn = kernel or flash_attention
    q, k, v = _qkv(ctx)

    def loss_flash(q, k, v):
        return (kfn(q, k, v, interpret=False, **flash_kwargs)
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (mha_reference(q, k, v, **ref_kwargs)
                .astype(jnp.float32) ** 2).sum()

    o_f = kfn(q, k, v, interpret=False, **flash_kwargs)
    o_r = mha_reference(q, k, v, **ref_kwargs)
    g_f = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    assert _max_err(o_f, o_r) < 0.06
    for a, b in zip(g_f, g_r):
        scale = float(np.max(np.abs(np.asarray(b, np.float32)))) or 1.0
        assert _max_err(a, b) / scale < 0.03


def test_flash_causal_numerics_on_chip():
    _retry(lambda: _check_attention(
        2048, dict(causal=True), dict(causal=True)))


def test_flash_window_segment_numerics_on_chip():
    _retry(lambda: _check_attention(
        2048, dict(causal=True, window=512), dict(causal=True, window=512)))
    ctx = 2048
    seg = np.zeros((B, ctx), np.int32)
    seg[:, ctx // 3:2 * ctx // 3] = 1
    seg[:, 2 * ctx // 3:] = 2
    seg = jnp.asarray(seg)
    _retry(lambda: _check_attention(
        ctx, dict(causal=True, segment_ids=seg),
        dict(causal=True, segment_ids=seg)))


def test_compact_attention_numerics_on_chip():
    from lamp_tpu.ops.attention import compact_attention

    _retry(lambda: _check_attention(
        1024, dict(causal=True), dict(causal=True),
        kernel=compact_attention))


def test_paged_attention_numerics_on_chip():
    """Grouped/single-pass paged kernel vs the gather reference at the
    bench serving shapes, incl. zero-length rows, per-request windows and
    the append_kv injection path (scripts/exp_paged_verify_tpu.py)."""
    from lamp_tpu.ops.paged_attention import (
        paged_attention, paged_attention_reference)

    HQ, HKV, HD, PAGE, PPS, b = 12, 4, 64, 128, 8, 32

    def run():
        rng = np.random.RandomState(0)
        n_pages = b * PPS + 1
        kv = jnp.asarray(
            rng.randn(n_pages, 2, PAGE, HKV * HD), jnp.bfloat16)
        q = jnp.asarray(rng.randn(b, HQ, HD), jnp.bfloat16)
        page_idx = jnp.asarray(
            rng.permutation(b * PPS).reshape(b, PPS).astype(np.int32))
        lengths = jnp.asarray(
            rng.randint(0, PPS * PAGE, b).astype(np.int32)).at[3].set(0)
        wins = jnp.asarray(rng.randint(-2, 200, b).astype(np.int32))
        nk = jnp.asarray(rng.randn(b, HKV * HD), jnp.bfloat16)
        nv = jnp.asarray(rng.randn(b, HKV * HD), jnp.bfloat16)

        o = paged_attention(q, kv, None, page_idx, lengths,
                            num_kv_heads=HKV, interpret=False)
        o_ref = paged_attention_reference(q, kv, None, page_idx, lengths,
                                          num_kv_heads=HKV)
        assert _max_err(o, o_ref) < 0.05

        o2 = paged_attention(q, kv, None, page_idx, lengths,
                             num_kv_heads=HKV, windows=wins,
                             append_kv=(nk, nv), interpret=False)
        o2_ref = paged_attention_reference(
            q, kv, None, page_idx, lengths, num_kv_heads=HKV,
            windows=wins, append_kv=(nk, nv))
        assert _max_err(o2, o2_ref) < 0.05

    _retry(run)


def test_serving_engine_greedy_matches_dense_forward_on_chip():
    """Engine smoke on the chip: greedy paged decode (stacked pool,
    deferred writes, append_kv) must emit exactly the dense forward's
    argmax chain."""
    from lamp_tpu import nn
    from lamp_tpu.models.serving import ModernBatchServer

    def run():
        lm = nn.ModernLM.init(
            vocab_size=256, context_length=160, num_blocks=3,
            embed_dim=256, num_heads=4, num_kv_heads=2,
            key=jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        prompt = [5, 9, 250, 3, 17, 77, 120, 8]
        srv = ModernBatchServer(lm, page_size=16, total_pages=48)
        srv.add("a", list(prompt))
        got = []
        for _ in range(3):
            got.extend(srv.step_many(8)["a"])

        seq = list(prompt)
        want = []
        for _ in range(len(got)):
            logits, _ = lm.forward(jnp.asarray([seq]))
            nxt = int(jnp.argmax(logits[0, -1]))
            want.append(nxt)
            seq.append(nxt)
        assert got == want, (got, want)

    _retry(run)


def test_train_step_loss_drops_on_chip():
    """One jitted accumulation train step through the public API learns on
    the chip (the canonical verify-skill flow, pinned as a test)."""
    from lamp_tpu import nn, optim, train

    def run():
        model = nn.LanguageModelModule.init(
            vocab_size=64, context_length=32, num_blocks=2, embed_dim=64,
            attention_heads=2, key=jax.random.PRNGKey(0),
            dtype=jnp.bfloat16, dropout=0.0)
        opt = optim.AdamW(1e-3)

        def loss_fn(m, batch, key, train_flag):
            x, y = batch
            logits, m2 = m.forward(x, key=key, train=train_flag)
            return (nn.lm_loss(logits, y),
                    jnp.asarray(x.shape[0], jnp.float32), m2)

        state = train.TrainState.init(model, opt)
        step = jax.jit(
            train.make_train_step(opt, loss_fn, accumulation_steps=2),
            donate_argnums=(0,))
        k = jax.random.PRNGKey(1)
        x = jax.random.randint(k, (2, 4, 32), 0, 64)
        batch = (x, jnp.roll(x, -1, axis=-1))
        first = last = None
        for i in range(30):
            state, (loss, _) = step(state, batch, jax.random.fold_in(k, i))
            if i == 0:
                first = float(loss)
        last = float(loss)
        assert last < first * 0.7, (first, last)

    _retry(run)
