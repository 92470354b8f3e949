#!/usr/bin/env python
"""Measure single-pass vs per-group-cell paged attention on the real chip.

docs/serving_headroom.md: paged attention at the bench shapes (B=32,
12q/4kv, D=64, page=128, fill=152) measures ~174us/12 layers vs a 73us
HBM roofline; the gap decomposes as ~1.6us per-grid-cell fixed cost x
(B/G=4 cells) x 12 layers plus the group-dot MXU time. single_pass=True
walks all groups in ONE Mosaic cell (fori_loop, parity as loop carry),
paying the fixed cost once per launch.

Sweeps {single_pass} x {ppb} x {page size} at the bench fill, fused-KV
pools (the engine layout). Prints us per 12-layer step.

Usage: python scripts/exp_paged_single_pass.py   (real TPU, ~4 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HQ, HKV, HD = 12, 4, 64
L = 12
B = 32
FILL = 152


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


N1, N2 = 8, 64


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu.ops.paged_attention import paged_attention

    def make(page, ppb, single_pass, pairs=6):
        """Per-12-layer-step us by the two-chain-length DIFFERENCE method
        (min per chain length, then difference — the per-call tunnel
        overhead is ~25-70 ms and would swamp naive RTT correction)."""
        pages_per_seq = max(2048 // page, (FILL + page - 1) // page)
        n_pages = B * pages_per_seq + 1
        # SEPARATE per-layer pools exactly like the engine: a layer-stacked
        # [L, P, ...] array indexed kv[li] materializes a full-layer slice
        # copy per layer per step as the pallas operand (~34 MB each at
        # this pool size — measured to swamp the kernel ~14x)
        kv = tuple(
            jax.random.normal(jax.random.PRNGKey(7 + li),
                              (n_pages, 2, page, HKV * HD), jnp.bfloat16)
            for li in range(L))
        page_idx = jnp.arange(B * pages_per_seq, dtype=jnp.int32).reshape(
            B, pages_per_seq)

        def chain(q, lengths, kv):
            o = q
            for li in range(L):
                o = paged_attention(
                    o, kv[li], None, page_idx, lengths,
                    num_kv_heads=HKV, pages_per_block=ppb,
                    single_pass=single_pass,
                )
            return o * (1.0 + 1e-6)

        fns = {
            n: jax.jit(lambda c, ln, kv, n=n: jax.lax.scan(
                lambda cc, _: (chain(cc, ln, kv), None), c, length=n)[0])
            for n in (N1, N2)
        }
        q0 = jax.random.normal(jax.random.PRNGKey(9), (B, HQ, HD),
                               jnp.bfloat16)
        lengths = jnp.full((B,), FILL, jnp.int32)

        def call(n):
            out = fns[n](q0, lengths, kv)
            float(np.asarray(out).reshape(-1)[0])

        call(N1), call(N2)  # compile
        w1, w2 = [], []
        for _ in range(pairs):
            t0 = time.perf_counter()
            call(N1)
            t1 = time.perf_counter()
            call(N2)
            t2 = time.perf_counter()
            w1.append(t1 - t0)
            w2.append(t2 - t1)
        return (min(w2) - min(w1)) / (N2 - N1) * 1e6

    kv_mb = B * FILL * HKV * HD * 2 * 2 * L / 1e6
    print(f"KV bytes {kv_mb:.0f} MB -> roofline "
          f"{kv_mb * 1e6 / 819e3:.0f} us/step", flush=True)
    # each config costs ~2 remote compiles (~1 min); select via argv to
    # keep one invocation inside a timeout: "128,1,0 128,1,1" etc.;
    # default sweeps the two page-128 contenders
    configs = [tuple(int(x) for x in a.split(","))
               for a in sys.argv[1:]] or [
        (128, 1, 0), (128, 1, 1), (128, 2, 0), (128, 2, 1)]
    for page, ppb, sp in configs:
        us = with_retries(
            lambda page=page, ppb=ppb, sp=sp: make(page, ppb, bool(sp)))
        print(f"page={page} ppb={ppb} single_pass={sp}: "
              f"{us:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
