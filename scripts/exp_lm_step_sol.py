#!/usr/bin/env python
"""Step-level speed-of-light decomposition of the flagship LM train step.

VERDICT r3 item 5: the headline (12L/768d ctx384 b8x5, bf16, AdamW
mixed-precision) has been flat at ~229k tok/s (MFU .646);
docs/attn384_headroom.md bounds only the attention 9% of the step. This
script decomposes the remaining 91% on the real chip:

  1. full train step (5-accum, donated) — the bench.py headline workload
  2. fwd+bwd only (no optimizer): value_and_grad of the same loss x5
  3. optimizer alone: plain AdamW (master weights) vs the fused-Pallas
     AdamWStochastic (no master copy, stochastic rounding)
  4. analytic floors: model-FLOPs MXU floor for (2); HBM state-stream
     floor for (3) (m/v/master reads+writes at 819 GB/s)

All timings: two-chain-length difference method over donated chained
steps. Prints a table; decisions (switch bench.py's optimizer, or accept
the step as >=X% of floor) cite this output.

Usage: python scripts/exp_lm_step_sol.py   (real TPU, ~4 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BATCH, CTX, VOCAB, ACCUM, LAYERS, DIM, HEADS = 8, 384, 256, 5, 12, 768, 12
N1, N2 = 3, 12
PEAK = 197e12
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
    """Seconds per unit-call via min-based two-chain differencing; ``call``
    takes n (chain length) and ends in one fresh host readback."""
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

    from lamp_tpu import nn, optim, train
    from lamp_tpu.ops.fused_adamw import AdamWStochastic

    def make_model():
        # fresh arrays per phase: donated train steps DELETE the buffers of
        # whatever pytree seeded TrainState, so phases must not share one
        # model instance (the bug mode is "Array has been deleted" on the
        # second phase)
        return nn.LanguageModelModule.init(
            vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
            embed_dim=DIM, attention_heads=HEADS, key=jax.random.PRNGKey(0),
            dtype=jnp.bfloat16, dropout=0.0,
        )

    model = make_model()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(model)
                   if hasattr(x, "size"))
    tokens_per_step = ACCUM * BATCH * CTX
    flops_per_tok = 6 * n_params + 12 * LAYERS * DIM * CTX
    mxu_floor_ms = tokens_per_step * flops_per_tok / PEAK * 1e3

    def loss_fn(model, batch, key, train_mode):
        toks, target = batch
        logits, nm = model.forward(toks, key=key, train=train_mode)
        return (nn.lm_loss(logits, target),
                jnp.asarray(toks.shape[0], jnp.float32), nm)

    rng = np.random.RandomState(0)
    toks = jnp.asarray(
        rng.randint(0, VOCAB, (ACCUM, BATCH, CTX)).astype(np.int32))
    batch = (toks, jnp.roll(toks, -1, axis=2))
    rk = jax.random.PRNGKey(1)

    def time_step(opt, label, mk=None, unroll=None):
        step = jax.jit(
            train.make_train_step(opt, loss_fn, accumulation_steps=ACCUM,
                                  accumulation_unroll=unroll),
            donate_argnums=(0,))

        def attempt():
            # fresh model+state per attempt: the previous attempt's state
            # was DONATED (its arrays deleted), and the state aliases the
            # seeding model's buffers
            holder = {"s": train.TrainState.init((mk or make_model)(), opt)}

            def call(n):
                for _ in range(n):
                    holder["s"], (loss, _) = step(holder["s"], batch, rk)
                float(loss)

            return diff_time(call)

        dt = with_retries(attempt) * 1e3
        tok_s = tokens_per_step / (dt / 1e3)
        print(f"{label}: {dt:.2f} ms/step ({tok_s:,.0f} tok/s, "
              f"MFU {tok_s * flops_per_tok / PEAK:.3f})", flush=True)
        return dt

    # 1+3. full step, both optimizers; scan-vs-unroll A/B IN THE SAME
    # SESSION (the tunnel's service throughput drifts ~15% between
    # sessions, so cross-session comparisons of the two accumulation
    # programs are meaningless)
    full_plain = time_step(optim.AdamW(3e-4, weight_decay=0.01),
                           "full step (AdamW master-weights, scan accum "
                           "— the default)")
    time_step(optim.AdamW(3e-4, weight_decay=0.01),
              "full step (AdamW master-weights, unrolled accumulation)",
              unroll=True)
    full_fused = time_step(AdamWStochastic(3e-4, weight_decay=0.01),
                           "full step (fused AdamWStochastic)")

    # 1b. int8 dynamic-quantization training (ops/int8_training.py claims
    # ~1.7x on 4096^3 matmuls; this measures it END-TO-END at the flagship
    # shapes — numerics differ from the headline config, so this is an
    # extra lever, not the comparable number)
    from lamp_tpu.ops.int8_training import quantize_training

    time_step(optim.AdamW(3e-4, weight_decay=0.01),
              "full step (int8 training matmuls)",
              mk=lambda: quantize_training(make_model()))

    # 2. fwd+bwd only (same 5-accum loss/grad, no optimizer update).
    # NOTE: this probe UNROLLS the accumulation loop in Python, so it
    # decomposes the unrolled full-step variant, not the (faster) scan
    # default — measured round 4: probe 73.5 ms vs unrolled full step
    # 76.0 ms (optimizer ~2.5 ms by difference), while the scan step ran
    # 67.6 ms. A scan-structured probe would be needed to decompose the
    # default program; the isolated optimizer number from exp_opt_flat.py
    # (4.3 ms) is the per-phase bound used in docs/lm_step_headroom.md.
    params0 = make_model()

    def grad_only(m):
        def one(i, acc):
            g = jax.grad(
                lambda mm: loss_fn(mm, (batch[0][i], batch[1][i]), rk,
                                   True)[0])(m)
            return jax.tree_util.tree_map(
                lambda a, b: a + b.astype(a.dtype) if hasattr(a, "dtype")
                else a, acc, g)
        z = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x, jnp.float32)
            if hasattr(x, "dtype") else x, m)
        # python loop over static ACCUM — same structure as make_train_step
        acc = z
        for i in range(ACCUM):
            acc = one(i, acc)
        return acc

    # read back a reduction over EVERY gradient leaf: returning a single
    # leaf let XLA dead-code-eliminate the other 219 leaves' weight-gradient
    # matmuls, which produced a fictitious "82% of floor" fwd+bwd reading
    # and a fictitious 14 ms optimizer gap (round-4 note). The chained
    # scalar also perturbs one input leaf so successive calls have a REAL
    # data dependency (identical dispatches may be elided by the tunnel).
    def gfn_raw(m, s):
        leaves, treedef = jax.tree_util.tree_flatten(m)
        for idx, x in enumerate(leaves):
            if hasattr(x, "dtype"):
                leaves[idx] = x + (s * 1e-30).astype(x.dtype)
                break
        m = jax.tree_util.tree_unflatten(treedef, leaves)
        return sum(jnp.sum(g)
                   for g in jax.tree_util.tree_leaves(grad_only(m))
                   if hasattr(g, "dtype"))

    gfn = jax.jit(gfn_raw)

    def call_g(n):
        s = jnp.zeros((), jnp.float32)
        for _ in range(n):
            s = gfn(params0, s)
        float(np.asarray(s))

    fb_ms = with_retries(lambda: diff_time(call_g)) * 1e3
    print(f"fwd+bwd only (5 accum): {fb_ms:.2f} ms "
          f"(MXU model-FLOPs floor {mxu_floor_ms:.2f} ms -> "
          f"{100 * mxu_floor_ms / fb_ms:.0f}% of floor)", flush=True)

    opt_plain_ms = full_plain - fb_ms
    opt_fused_ms = full_fused - fb_ms
    # plain AdamW streams per param: read grad f32(4)+master(4)+m(4)+v(4),
    # write master(4)+m(4)+v(4)+param bf16(2) = 30 B
    plain_floor = n_params * 30 / (HBM_GBS * 1e9) * 1e3
    # fused: read grad(4)+p(2)+m(4)+v(4), write p(2)+m(4)+v(4) = 24 B
    fused_floor = n_params * 24 / (HBM_GBS * 1e9) * 1e3
    print(f"optimizer (by difference): plain {opt_plain_ms:.2f} ms "
          f"(HBM floor {plain_floor:.2f}), fused {opt_fused_ms:.2f} ms "
          f"(floor {fused_floor:.2f})", flush=True)
    print(f"n_params={n_params / 1e6:.1f}M  tokens/step={tokens_per_step}",
          flush=True)


if __name__ == "__main__":
    main()
