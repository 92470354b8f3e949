#!/usr/bin/env python
"""Ground-truth serving step time with NO RTT assumption.

Every wall-clock timing through the axon tunnel includes one host readback
of unknown latency (the cached-scalar probe reads ~0, a fresh-value probe
reads ~23-30 ms — neither is provably what a given program pays). Instead
of subtracting an assumed RTT, time the SAME call at two chain lengths and
difference them: wall(n) = overhead + n * step, so
step = (wall(n2) - wall(n1)) / (n2 - n1) with the readback cancelling
exactly. Pairs are interleaved so KV-fill drift hits both lengths equally.

Measures: full engine step_many, the weight-matmul scan, the
paged-attention scan (the serving_headroom.py components).

Usage: python scripts/exp_true_steptime.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, L, D, HQ, HKV, HD, HIDDEN, VOCAB = 32, 12, 768, 12, 4, 64, 2048, 32000
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


def diff_time(call, pairs=4):
    """Per-step seconds via the two-length difference method."""
    call(N1), call(N2)  # compile both
    vals = []
    for _ in range(pairs):
        t0 = time.perf_counter()
        call(N1)
        t1 = time.perf_counter()
        call(N2)
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (N2 - N1))
    return np.median(vals), (t1 - t0)  # per-step, last wall(N1)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn
    from lamp_tpu.models import ModernBatchServer, SamplingParams
    from lamp_tpu.ops.paged_attention import paged_attention

    key = jax.random.PRNGKey(0)

    # --- full engine step (context 2048 so the fill never caps out)
    lm = with_retries(lambda: nn.ModernLM.init(
        vocab_size=VOCAB, context_length=2048, num_blocks=L, embed_dim=D,
        num_heads=HQ, num_kv_heads=HKV, key=key, dtype=jnp.bfloat16))
    server = ModernBatchServer(lm, total_pages=32 * 16 + 8)
    rng = np.random.RandomState(0)
    for i in range(B):
        server.add(f"r{i}", rng.randint(0, VOCAB, 24 + (i % 8)).tolist(),
                   SamplingParams(temperature=0.8))
    with_retries(lambda: server.step_many(N1))
    step_s, wall1 = with_retries(lambda: diff_time(
        lambda n: server.step_many(n)))
    overhead = wall1 - N1 * step_s
    print(f"engine step: {step_s * 1e6:.0f} us/step "
          f"(per-call overhead incl. readback {overhead * 1e3:.1f} ms; "
          f"{32 / step_s:,.0f} tok/s)", flush=True)

    # --- weight matmul scan
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    wqkv = jax.random.normal(ks[0], (L, D, (HQ + 2 * HKV) * HD), jnp.bfloat16)
    wo = jax.random.normal(ks[1], (L, HQ * HD, D), jnp.bfloat16)
    w13 = jax.random.normal(ks[2], (L, 2, D, HIDDEN), jnp.bfloat16)
    w2 = jax.random.normal(ks[3], (L, HIDDEN, D), jnp.bfloat16)
    lmh = jax.random.normal(ks[4], (D, VOCAB), jnp.bfloat16)

    def matmul_stack(x):
        for li in range(L):
            y = jnp.matmul(x, wqkv[li], preferred_element_type=jnp.float32)
            a = y[:, :HQ * HD].astype(jnp.bfloat16)
            x = x + jnp.matmul(a, wo[li],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
            g1 = jnp.matmul(x, w13[li, 0], preferred_element_type=jnp.float32)
            g3 = jnp.matmul(x, w13[li, 1], preferred_element_type=jnp.float32)
            g = (jax.nn.silu(g1) * g3).astype(jnp.bfloat16)
            x = x + jnp.matmul(g, w2[li],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
        logits = jnp.matmul(x, lmh, preferred_element_type=jnp.float32)
        return x + logits[:, :D].astype(jnp.bfloat16) * 1e-6

    x0 = jax.random.normal(ks[5], (B, D), jnp.bfloat16)

    def scan_call(fn, carry):
        fns = {}

        def call(n):
            if n not in fns:
                fns[n] = jax.jit(lambda c: jax.lax.scan(
                    lambda cc, _: (fn(cc), None), c, length=n)[0])
            out = fns[n](carry)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]
                             ).reshape(-1)[0])
        return call

    mm_s, _ = with_retries(lambda: diff_time(scan_call(matmul_stack, x0)))
    print(f"matmul stack: {mm_s * 1e6:.0f} us/step "
          f"(roofline 244 us @ 200 MB bf16)", flush=True)

    # --- paged attention chain at fill 152
    fill = 152
    ppr = (fill + PAGE - 1) // PAGE
    n_pages = B * ppr + 1
    kp = jax.random.normal(jax.random.PRNGKey(7),
                           (L, n_pages, PAGE, HKV * HD), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(8),
                           (L, n_pages, PAGE, HKV * HD), jnp.bfloat16)
    page_idx = jnp.arange(B * ppr, dtype=jnp.int32).reshape(B, ppr)
    pad = jnp.zeros((B, 8 - ppr), jnp.int32)
    page_idx = jnp.concatenate([page_idx, pad], axis=1)
    lengths = jnp.full((B,), fill, jnp.int32)

    def attn_chain(q):
        o = q
        for li in range(L):
            o = paged_attention(o, kp[li], vp[li], page_idx, lengths,
                                num_kv_heads=HKV, pages_per_block=2)
        return o * (1.0 + 1e-6)

    q0 = jax.random.normal(jax.random.PRNGKey(9), (B, HQ, HD), jnp.bfloat16)
    att_s, _ = with_retries(lambda: diff_time(scan_call(attn_chain, q0)))
    print(f"paged attention x12 @ fill {fill}: {att_s * 1e6:.0f} us/step "
          f"(roofline 73 us @ 60 MB KV)", flush=True)


if __name__ == "__main__":
    main()
