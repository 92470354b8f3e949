#!/usr/bin/env python
"""Measure deferred KV-write strategies on the real chip.

scripts/exp_other_breakdown.py measured the per-step KV writes at ~41 us
(as 2x12 separate scatters; the engine's _kv_write_combined form is 12).
The paged kernel's ``page_offset`` support means the engine COULD keep one
layer-stacked pool ``[L*P, 2, page, F]`` addressed per layer with
``page_offset=li*P`` — then the deferred write collapses to TWO scatters
total (all layers' K rows, all layers' V rows), or ONE combined scatter,
instead of 12. This measures, at the exact bench shapes (B=32, L=12,
F=256, 128-token pages, 192-page pools):

  1. tuple pools, 12x _kv_write_combined   (the engine today)
  2. stacked pool, ONE combined scatter    (2*L*B rows)
  3. stacked pool, TWO scatters (K, V)     (L*B rows each)

All on donated carries via the two-chain-length difference method.
In-place aliasing of each form is separately pinned on CPU by
tests/test_serving.py; this script is about dispatch overhead.

Usage: python scripts/exp_stacked_writes.py   (real TPU, ~2 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, L, F, PAGE, POOL = 32, 12, 256, 128, 192
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


def time_scan(step, carry0):
    import jax

    fns = {}
    state = {"c": carry0}

    def call(n):
        if n not in fns:
            fns[n] = jax.jit(lambda c: jax.lax.scan(
                lambda cc, _: (step(cc), None), c, length=n)[0],
                donate_argnums=(0,))
        state["c"] = fns[n](state["c"])
        float(np.asarray(
            jax.tree_util.tree_leaves(state["c"])[0]).reshape(-1)[0])

    return diff_pairs(call)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu.models.serving import _kv_write_combined

    tp = jnp.arange(B, dtype=jnp.int32) % POOL
    ts = jnp.full((B,), 3, jnp.int32)

    def rows_of(x):
        return x[:, :F]

    # --- 1. tuple pools, 12 combined scatters (engine today)
    def tuple_step(carry):
        x, pools = carry
        pools = list(pools)
        for li in range(L):
            pools[li] = _kv_write_combined(
                pools[li], tp, ts, rows_of(x), rows_of(x) * jnp.bfloat16(2))
        return x + jnp.bfloat16(1e-6), tuple(pools)

    def fresh_tuple():
        return (jax.random.normal(jax.random.PRNGKey(0), (B, F),
                                  jnp.bfloat16),
                tuple(jnp.zeros((POOL, 2, PAGE, F), jnp.bfloat16)
                      for _ in range(L)))

    us1 = with_retries(lambda: time_scan(tuple_step, fresh_tuple())) * 1e6
    print(f"tuple pools, {L} combined scatters: {us1:.1f} us/step",
          flush=True)

    # --- 2. stacked pool, ONE combined scatter (2*L*B rows)
    layer_off = (jnp.arange(L, dtype=jnp.int32) * POOL)[:, None]  # [L,1]

    def stacked_one(carry):
        x, pool = carry
        k = rows_of(x)
        v = k * jnp.bfloat16(2)
        pages = jnp.tile((layer_off + tp[None, :]).reshape(-1), 2)
        sel = jnp.concatenate([jnp.zeros((L * B,), jnp.int32),
                               jnp.ones((L * B,), jnp.int32)])
        slots = jnp.tile(ts, 2 * L)
        krows = jnp.tile(k, (L, 1))
        vrows = jnp.tile(v, (L, 1))
        rows = jnp.concatenate([krows, vrows])
        pool = pool.at[pages, sel, slots].set(rows)
        return x + jnp.bfloat16(1e-6), pool

    def fresh_stacked():
        return (jax.random.normal(jax.random.PRNGKey(0), (B, F),
                                  jnp.bfloat16),
                jnp.zeros((L * POOL, 2, PAGE, F), jnp.bfloat16))

    us2 = with_retries(lambda: time_scan(stacked_one, fresh_stacked())) * 1e6
    print(f"stacked pool, ONE combined scatter: {us2:.1f} us/step",
          flush=True)

    # --- 3. stacked pool, TWO scatters (K then V)
    def stacked_two(carry):
        x, pool = carry
        k = rows_of(x)
        v = k * jnp.bfloat16(2)
        pages = (layer_off + tp[None, :]).reshape(-1)
        slots = jnp.tile(ts, L)
        pool = pool.at[pages, 0, slots].set(jnp.tile(k, (L, 1)))
        pool = pool.at[pages, 1, slots].set(jnp.tile(v, (L, 1)))
        return x + jnp.bfloat16(1e-6), pool

    us3 = with_retries(lambda: time_scan(stacked_two, fresh_stacked())) * 1e6
    print(f"stacked pool, TWO scatters: {us3:.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
