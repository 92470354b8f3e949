#!/usr/bin/env python
"""Decompose the serving step's "everything else" bucket (real TPU).

docs/serving_headroom.md measures full step ~577us = matmuls ~218 +
paged attention ~174 + OTHER ~185us. This experiment times the OTHER
components in isolation, each as a chained lax.scan at the exact bench
shapes (B=32, 12L/768d, 12q/4kv heads, vocab 32k, bf16):

  1. sampling: per-step on-device sample_tokens at [B, 32k] f32
     (argmax + categorical; the bench batch is temperature-only)
  2. glue: per-layer norms + RoPE rotate + the two fused-pool KV
     scatters + residual adds, x12 layers + final norm (no matmuls,
     no attention)
  3. norms alone (rmsnorm x25)
  4. kv writes alone (2 scatters x12 on donated fused pools)

Per-step seconds via the two-chain-length DIFFERENCE method (see
scripts/serving_headroom.py) so tunnel readback latency cancels.

Usage: python scripts/exp_other_breakdown.py   (real TPU, ~3 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, L, D, HQ, HKV, HD, VOCAB = 32, 12, 768, 12, 4, 64, 32000
PAGE = 128
N1, N2 = 8, 64


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def diff_pairs(call, pairs=6):
    """Per-step seconds via the two-chain-length DIFFERENCE method with
    MIN-based estimation: service jitter only ever INFLATES a wall reading
    of a fixed workload, so min per chain length is the least-contaminated
    estimate and differencing the mins cancels the per-call readback
    exactly (per-pair differencing is biased: a latency spike landing in
    the short call makes that pair's difference too small — observed as
    NEGATIVE per-step times in bad tunnel windows)."""
    call(N1), call(N2)
    w1, w2 = [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        call(N1)
        t1 = time.perf_counter()
        call(N2)
        t2 = time.perf_counter()
        w1.append(t1 - t0)
        w2.append(t2 - t1)
    return (min(w2) - min(w1)) / (N2 - N1)


def time_scan(fn, carry, reps=4):
    import jax

    fns = {}
    state = {"c": carry}  # donated carries: thread the latest buffers

    def call(n):
        if n not in fns:
            fns[n] = jax.jit(lambda c: jax.lax.scan(
                lambda cc, _: (fn(cc), None), c, length=n)[0],
                donate_argnums=(0,))
        out = fns[n](state["c"])
        state["c"] = out
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

    return diff_pairs(call, pairs=reps)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu.models.sampling import sample_tokens

    # --- 1. sampling at [B, 32k] (temperature-only batch, like bench)
    logits0 = jax.random.normal(jax.random.PRNGKey(0), (B, VOCAB),
                                jnp.float32)
    temps = jnp.full((B,), 0.8, jnp.float32)

    def samp(carry):
        logits, key = carry
        key, sub = jax.random.split(key)
        tok = sample_tokens(logits, sub, temps)
        key = jax.random.fold_in(key, tok[0])  # chain on the result
        return logits, key

    samp_us = with_retries(lambda: time_scan(
        samp, (logits0, jax.random.PRNGKey(1)))) * 1e6
    print(f"sampling [B,{VOCAB}]: {samp_us:.1f} us/step")

    # --- 2. per-layer glue: norms + rope + 2 kv scatters + residuals
    F = HKV * HD

    def fresh_pools():  # donated per-phase: each phase needs its own
        return tuple(
            jnp.zeros((B * 2 + 1, 2, PAGE, F), jnp.bfloat16)
            for _ in range(L))
    gamma = jnp.ones((D,), jnp.bfloat16)
    cos_t = jax.random.normal(jax.random.PRNGKey(2), (4096, HD // 2),
                              jnp.float32)
    sin_t = jax.random.normal(jax.random.PRNGKey(3), (4096, HD // 2),
                              jnp.float32)
    tp = jnp.arange(B, dtype=jnp.int32)
    ts = jnp.zeros((B,), jnp.int32)
    lengths = jnp.full((B,), 150, jnp.int32)

    def rms(x):
        acc = x.astype(jnp.float32)
        return (acc * jax.lax.rsqrt(
            jnp.mean(acc * acc, -1, keepdims=True) + 1e-6)
        ).astype(x.dtype) * gamma

    def glue(carry):
        x, pools = carry
        pools = list(pools)
        c = jnp.take(cos_t, lengths, axis=0)[:, None, :]
        s = jnp.take(sin_t, lengths, axis=0)[:, None, :]

        def rot(t):
            acc = t.astype(jnp.float32)
            t1, t2 = jnp.split(acc, 2, axis=-1)
            return jnp.concatenate(
                [t1 * c - t2 * s, t2 * c + t1 * s], -1).astype(t.dtype)

        for li in range(L):
            a = rms(x)
            q = rot(a.reshape(B, HQ, HD))
            kk = rot(a[:, :F].reshape(B, HKV, HD))
            vv = a[:, :F].reshape(B, HKV, HD)
            p = pools[li]
            p = p.at[tp, 0, ts].set(kk.reshape(B, -1))
            pools[li] = p.at[tp, 1, ts].set(vv.reshape(B, -1))
            x = x + q.reshape(B, -1)[:, :D] * jnp.bfloat16(1e-3)
            x = x + rms(x) * jnp.bfloat16(1e-3)
        x = rms(x) + jnp.bfloat16(1.0)
        return x, tuple(pools)

    def fresh_x():
        return jax.random.normal(jax.random.PRNGKey(4), (B, D), jnp.bfloat16)

    glue_us = with_retries(lambda: time_scan(
        glue, (fresh_x(), fresh_pools()))) * 1e6
    print(f"glue (norms+rope+writes+residuals x{L}): {glue_us:.1f} us/step")

    # --- 3. norms alone (25 rmsnorms like the step)
    def norms_only(x):
        for _ in range(2 * L + 1):
            x = x + rms(x) * jnp.bfloat16(1e-3)
        return x

    norms_us = with_retries(lambda: time_scan(norms_only, fresh_x())) * 1e6
    print(f"norms alone (x{2 * L + 1}): {norms_us:.1f} us/step")

    # --- 4. kv writes alone (2 scatters x 12 layers, donated pools)
    def writes_only(carry):
        x, pools = carry
        pools = list(pools)
        rows = x[:, :F]
        for li in range(L):
            p = pools[li]
            p = p.at[tp, 0, ts].set(rows)
            pools[li] = p.at[tp, 1, ts].set(rows * jnp.bfloat16(2.0))
        return x + jnp.bfloat16(1e-6), tuple(pools)

    writes_us = with_retries(lambda: time_scan(
        writes_only, (fresh_x(), fresh_pools()))) * 1e6
    print(f"kv writes alone (2x{L} scatters): {writes_us:.1f} us/step")

    print(f"\nsum(sampling + glue) = {samp_us + glue_us:.1f} us of the "
          f"~185 us OTHER bucket (docs/serving_headroom.md)")


if __name__ == "__main__":
    main()
