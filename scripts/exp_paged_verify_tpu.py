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

    # --- fused-KV layout: numerics on the real chip
    kv = jnp.stack([kp, vp], axis=1)  # [P, 2, page, fused]
    out = jax.jit(lambda q, kv, pi, ln: paged_attention(
        q, kv, None, pi, ln, num_kv_heads=HKV))(q, kv, page_idx, lengths)
    ref = jax.jit(lambda q, kp, vp, pi, ln: paged_attention_reference(
        q, kp, vp, pi, ln, num_kv_heads=HKV))(q, kp, vp, page_idx, lengths)
    err = np.max(np.abs(np.asarray(out, np.float32)
                        - np.asarray(ref, np.float32)))
    print(f"fused-kv: max|kernel - ref| = {err:.5f}", flush=True)
    assert err < 3e-2, ("fused", err)

    # --- timing: 12-layer chain at the bench fill, split vs fused pools.
    # Pools are TUPLES of per-layer arrays (exactly like the serving
    # engine) — scanning over a stacked [L, ...] pool dynamic-slices a
    # full-layer COPY out of HBM per layer per step (~67 MB, ~80 us), which
    # swamps the kernel (measured 734 vs 177 us/step at fill 152; same
    # pitfall as models/serving.py pool layout comment). Pools are also
    # jit ARGUMENTS, not closure captures — captured device arrays bake
    # into the compile payload and the remote-compile helper rejects the
    # ~800 MB request (HTTP 413).
    kpl = tuple(jnp.asarray(rng.randn(n_pages, PAGE, HKV * HD), jnp.bfloat16)
                for _ in range(L))
    vpl = tuple(jnp.asarray(rng.randn(n_pages, PAGE, HKV * HD), jnp.bfloat16)
                for _ in range(L))
    kvl = tuple(jnp.stack([k, v], axis=1) for k, v in zip(kpl, vpl))
    idx_t = jnp.arange(B * PPS, dtype=jnp.int32).reshape(B, PPS)

    def chain_split(qc, ln, pools):
        kps, vps = pools
        o = qc
        for li in range(L):
            o = paged_attention(o, kps[li], vps[li], idx_t, ln,
                                num_kv_heads=HKV)
        return o * (1.0 + 1e-6)

    def chain_fused(qc, ln, pools):
        o = qc
        for li in range(L):
            o = paged_attention(o, pools[li], None, idx_t, ln,
                                num_kv_heads=HKV)
        return o * (1.0 + 1e-6)

    # two-chain-length difference timing (readback latency cancels; see
    # scripts/exp_true_steptime.py)
    n1, n2 = 8, 64
    for name, chain, pools in [("split", chain_split, (kpl, vpl)),
                               ("fused", chain_fused, kvl)]:
        fns = {n: jax.jit(lambda c, ln, p, n=n, chain=chain: jax.lax.scan(
            lambda cc, _: (chain(cc, ln, p), None), c, length=n)[0])
            for n in (n1, n2)}
        for fill in (152, 504, 1000):
            ln = jnp.full((B,), fill, jnp.int32)
            for n in (n1, n2):
                float(np.asarray(fns[n](q, ln, pools)).reshape(-1)[0])
            vals = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(fns[n1](q, ln, pools)).reshape(-1)[0])
                t1 = time.perf_counter()
                float(np.asarray(fns[n2](q, ln, pools)).reshape(-1)[0])
                t2 = time.perf_counter()
                vals.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
            vals.sort()
            print(f"{name} fill={fill:4d}: {vals[1] * 1e6:7.0f} us/step "
                  f"(12-layer chain, B={B})", flush=True)


if __name__ == "__main__":
    main()
