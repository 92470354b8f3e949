#!/usr/bin/env python
"""Why is the AdamW update 14 ms against a 3.1 ms HBM floor?

scripts/exp_lm_step_sol.py measured the flagship optimizer phase at 14.0
ms (plain) / 13.1 ms (fused Pallas) vs a 3.1 ms memory floor. Hypothesis:
the update runs as ~200 per-leaf fusions (tree_map over the param pytree)
and each small kernel pays a fixed sequencing cost, so leaf COUNT — not
bytes — dominates. This times, on the real chip, at the flagship LM's
exact leaf inventory (~200 leaves, 85.6M params):

  1. per-leaf AdamW update (the optimizer's current shape: tree_map math,
     f32 m/v/master + bf16 params), donated chained scan
  2. ONE flat update: same math on single [N] f32 m/v/master + [N] bf16
     param buffers (what a flat-state optimizer would run)
  3. flat update + slice-back: (2) plus dynamic-slice/reshape of the new
     bf16 flat params into the ~200 original leaves (what the train step
     needs to hand the model back)

Usage: python scripts/exp_opt_flat.py    (real TPU, ~3 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N1, N2 = 4, 16
HBM_GBS = 819.0


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def diff_time(call, pairs=5):
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


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn

    model = nn.LanguageModelModule.init(
        vocab_size=256, context_length=384, num_blocks=12, embed_dim=768,
        attention_heads=12, key=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        dropout=0.0,
    )
    leaves = [x for x in jax.tree_util.tree_leaves(model)
              if hasattr(x, "shape")]
    shapes = [tuple(x.shape) for x in leaves]
    n_params = sum(int(np.prod(s)) for s in shapes)
    print(f"{len(shapes)} leaves, {n_params / 1e6:.1f}M params")
    # floor: read g+m+v+master f32, write m+v+master f32 + param bf16
    floor_ms = n_params * 30 / (HBM_GBS * 1e9) * 1e3
    print(f"HBM floor {floor_ms:.2f} ms")

    b1, b2, eps, lr, wd = 0.9, 0.999, 1e-8, 1e-3, 0.01

    def upd_one(p, g, m, v):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * jnp.square(g)
        pm = p - lr * (m / (jnp.sqrt(v) + eps)) - lr * wd * p
        return pm, m, v

    # --- 1. per-leaf update at the model's leaf inventory
    def make_leafy():
        ks = jax.random.PRNGKey(1)
        params = [jnp.zeros(s, jnp.float32) + 0.01 for s in shapes]
        grads = [jnp.ones(s, jnp.float32) * 1e-4 for s in shapes]
        m = [jnp.zeros(s, jnp.float32) for s in shapes]
        v = [jnp.zeros(s, jnp.float32) for s in shapes]
        return params, grads, m, v

    def leafy_step(carry):
        params, grads, m, v = carry
        out = [upd_one(p, g, mm, vv)
               for p, g, mm, vv in zip(params, grads, m, v)]
        params = [o[0] for o in out]
        m = [o[1] for o in out]
        v = [o[2] for o in out]
        # chain: grads depend on params so scan iterations can't collapse
        grads = [g + p * 1e-6 for g, p in zip(grads, params)]
        return params, grads, m, v

    def time_scan(step, mk):
        fns = {}
        state = {"c": mk()}

        def call(n):
            if n not in fns:
                fns[n] = jax.jit(lambda c: jax.lax.scan(
                    lambda cc, _: (step(cc), None), c, length=n)[0],
                    donate_argnums=(0,))
            state["c"] = fns[n](state["c"])
            float(np.asarray(
                jax.tree_util.tree_leaves(state["c"])[0]).reshape(-1)[0])

        return diff_time(call)

    ms1 = with_retries(lambda: time_scan(leafy_step, make_leafy)) * 1e3
    print(f"per-leaf update ({len(shapes)} leaves): {ms1:.2f} ms "
          f"({ms1 / floor_ms:.1f}x floor)", flush=True)

    # --- 2. one flat update (bf16 param + f32 m/v/master)
    def make_flat():
        p16 = jnp.zeros((n_params,), jnp.bfloat16) + jnp.bfloat16(0.01)
        master = jnp.zeros((n_params,), jnp.float32) + 0.01
        g = jnp.ones((n_params,), jnp.float32) * 1e-4
        m = jnp.zeros((n_params,), jnp.float32)
        v = jnp.zeros((n_params,), jnp.float32)
        return p16, master, g, m, v

    def flat_step(carry):
        p16, master, g, m, v = carry
        new_master, m, v = upd_one(master, g, m, v)
        p16 = new_master.astype(jnp.bfloat16)
        g = g + new_master * 1e-6
        return p16, new_master, g, m, v

    ms2 = with_retries(lambda: time_scan(flat_step, make_flat)) * 1e3
    print(f"flat update (1 buffer): {ms2:.2f} ms "
          f"({ms2 / floor_ms:.1f}x floor)", flush=True)

    # --- 3. flat update + slice-back into the ~200 bf16 leaves
    offs = np.cumsum([0] + [int(np.prod(s)) for s in shapes])

    def flat_slice_step(carry):
        p16, master, g, m, v = carry
        new_master, m, v = upd_one(master, g, m, v)
        p16 = new_master.astype(jnp.bfloat16)
        outs = [jax.lax.dynamic_slice(p16, (int(offs[i]),),
                                      (int(np.prod(s)),)).reshape(s)
                for i, s in enumerate(shapes)]
        # consume the slices so they aren't dead-code-eliminated
        g = g + new_master * 1e-6
        acc = jnp.zeros((), jnp.float32)
        for o in outs:
            acc = acc + o.reshape(-1)[0].astype(jnp.float32)
        m = m.at[0].add(acc * 1e-20)
        return p16, master * 1.0, g, m, v

    ms3 = with_retries(lambda: time_scan(flat_slice_step, make_flat)) * 1e3
    print(f"flat update + slice-back: {ms3:.2f} ms "
          f"({ms3 / floor_ms:.1f}x floor)", flush=True)


if __name__ == "__main__":
    main()
