#!/usr/bin/env python
"""Sweep paged_attention kernel parameters on the real chip to locate the
cost structure behind docs/serving_headroom.md's 898us/12-layer measurement.

Sweeps, at the bench serving shapes (12q/4kv heads, D=64, page=128):
  - pages_per_block in {1, 2, 4} -> DMA tail waste vs per-block overhead
  - batch B in {16, 32}          -> per-grid-cell fixed overhead
  - fill in {152, 504, 1000}     -> scaling with real KV bytes (no recompile:
                                    lengths is a traced input)

Each point: a 64-iteration chained scan over a 12-layer lax.scan chain (one
pallas kernel instance in the program, so the remote-compile payload stays
small), RTT-corrected, min of 3. Prints us per 12-layer step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HQ, HKV, HD, PAGE = 12, 4, 64, 128
L = 12


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def measure_rtt():
    """Round-trip of one host readback of a FRESH device scalar (a cached
    one reads back instantly and would understate the correction)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda i: i + 1.0)
    float(f(jnp.float32(0)))  # compile
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

    from lamp_tpu.ops.paged_attention import paged_attention

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)

    def make(b, ppb, pages_per_seq=8, n=64):
        n_pages = b * pages_per_seq + 1
        kp = jax.random.normal(
            jax.random.PRNGKey(7), (L, n_pages, PAGE, HKV * HD), jnp.bfloat16)
        vp = jax.random.normal(
            jax.random.PRNGKey(8), (L, n_pages, PAGE, HKV * HD), jnp.bfloat16)
        page_idx = jnp.arange(b * pages_per_seq, dtype=jnp.int32).reshape(
            b, pages_per_seq)

        def chain(q, lengths, kp, vp):
            def layer(o, kv):
                k, v = kv
                return paged_attention(
                    o, k, v, page_idx, lengths,
                    num_kv_heads=HKV, pages_per_block=ppb,
                ), None
            o, _ = jax.lax.scan(layer, q, (kp, vp))
            return o * (1.0 + 1e-6)

        # kp/vp must be EXPLICIT jit args: closure-captured arrays are
        # serialized into the remote-compile payload (HTTP 413 at ~200MB)
        scanned = jax.jit(lambda c, ln, kp, vp: jax.lax.scan(
            lambda cc, _: (chain(cc, ln, kp, vp), None), c, length=n)[0])
        q0 = jax.random.normal(jax.random.PRNGKey(9), (b, HQ, HD), jnp.bfloat16)

        def run(fill):
            lengths = jnp.full((b,), fill, jnp.int32)
            out = scanned(q0, lengths, kp, vp)
            float(np.asarray(out).reshape(-1)[0])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = scanned(q0, lengths, kp, vp)
                float(np.asarray(out).reshape(-1)[0])
                ts.append((time.perf_counter() - t0 - rtt) / n)
            return min(ts) * 1e6

        return run

    print("== ppb sweep (B=32, fill=152) ==", flush=True)
    for ppb in (1, 2, 4):
        us = with_retries(lambda ppb=ppb: make(32, ppb)(152))
        print(f"ppb={ppb}: {us:7.0f} us/step", flush=True)

    print("== B=16 (fill=152, ppb=4) ==", flush=True)
    us = with_retries(lambda: make(16, 4)(152))
    print(f"B=16: {us:7.0f} us/step  ({us / 16:5.2f} us/seq)", flush=True)

    print("== fill sweep (B=32, ppb=4, one compile) ==", flush=True)
    run32 = make(32, 4)
    for fill in (152, 504, 1000):
        us = with_retries(lambda fill=fill: run32(fill))
        kv_mb = 32 * fill * HKV * HD * 2 * 2 * L / 1e6
        print(f"fill={fill:4d}: {us:7.0f} us/step  "
              f"(KV {kv_mb:.0f} MB -> roofline {kv_mb * 1e6 / 819e3:.0f} us)",
              flush=True)


if __name__ == "__main__":
    main()
