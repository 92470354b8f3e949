#!/usr/bin/env python
"""Drive the grouped paged-attention kernel on the REAL chip: numerics vs
the gather reference at the bench serving shapes (interpret mode cannot
catch Mosaic-specific layout/DMA bugs), then time the 12-layer chain.

Usage: python scripts/exp_paged_verify_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HQ, HKV, HD, PAGE = 12, 4, 64, 128
L = 12
B = 32
PPS = 8  # pages per seq


def measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda i: i + 1.0)
    float(f(jnp.float32(0)))
    ts = []
    for i in range(5):
        y = f(jnp.float32(i))
        t0 = time.perf_counter()
        float(y)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu.ops.paged_attention import (
        paged_attention, paged_attention_reference)

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)

    rng = np.random.RandomState(0)
    n_pages = B * PPS + 1
    kp = jnp.asarray(rng.randn(n_pages, PAGE, HKV * HD), jnp.bfloat16)
    vp = jnp.asarray(rng.randn(n_pages, PAGE, HKV * HD), jnp.bfloat16)
    q = jnp.asarray(rng.randn(B, HQ, HD), jnp.bfloat16)
    page_idx = jnp.asarray(
        rng.permutation(B * PPS).reshape(B, PPS).astype(np.int32))
    lengths = jnp.asarray(
        rng.randint(0, PPS * PAGE, B).astype(np.int32)).at[3].set(0)
    wins = jnp.asarray(
        rng.randint(-2, 200, B).astype(np.int32))

    # --- numerics on the real chip (grouped kernel vs gather reference)
    for name, kw in [("plain", {}), ("windows", {"windows": wins})]:
        out = jax.jit(lambda q, kp, vp, pi, ln: paged_attention(
            q, kp, vp, pi, ln, num_kv_heads=HKV, **kw))(
            q, kp, vp, page_idx, lengths)
        ref = jax.jit(lambda q, kp, vp, pi, ln: paged_attention_reference(
            q, kp, vp, pi, ln, num_kv_heads=HKV, **kw))(
            q, kp, vp, page_idx, lengths)
        a = np.asarray(out, np.float32)
        b = np.asarray(ref, np.float32)
        err = np.max(np.abs(a - b))
        print(f"{name}: max|kernel - ref| = {err:.5f} "
              f"(bf16 kernel vs bf16 reference)", flush=True)
        assert err < 3e-2, (name, err)
        assert float(np.max(np.abs(a[3]))) == 0.0, "zero-length row"

    # --- timing: 12-layer chain at the bench fill
    kpl = jnp.asarray(rng.randn(L, n_pages, PAGE, HKV * HD), jnp.bfloat16)
    vpl = jnp.asarray(rng.randn(L, n_pages, PAGE, HKV * HD), jnp.bfloat16)
    idx_t = jnp.arange(B * PPS, dtype=jnp.int32).reshape(B, PPS)

    def chain(qc, ln, kp_, vp_):
        def layer(o, kv):
            k, v = kv
            return paged_attention(o, k, v, idx_t, ln,
                                   num_kv_heads=HKV), None
        o, _ = jax.lax.scan(layer, qc, (kp_, vp_))
        return o * (1.0 + 1e-6)

    n = 64
    scanned = jax.jit(lambda c, ln, kp_, vp_: jax.lax.scan(
        lambda cc, _: (chain(cc, ln, kp_, vp_), None), c, length=n)[0])
    for fill in (152, 504, 1000):
        ln = jnp.full((B,), fill, jnp.int32)
        out = scanned(q, ln, kpl, vpl)
        float(np.asarray(out).reshape(-1)[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = scanned(q, ln, kpl, vpl)
            float(np.asarray(out).reshape(-1)[0])
            ts.append((time.perf_counter() - t0 - rtt) / n)
        print(f"fill={fill:4d}: {min(ts) * 1e6:7.0f} us/step "
              f"(12-layer chain, B={B})", flush=True)


if __name__ == "__main__":
    main()
