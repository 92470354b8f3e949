#!/usr/bin/env python
"""Re-decide the ctx-384 attention dispatch IN-MODEL (round 5).

exp_step_knockouts measured the attention CORE at ~14.5 ms on-path (22%
of the flagship step) — 2.3x the standalone microbench number the
XLA-for-kv<=512 crossover was chosen on (docs/attn384_headroom.md's
104 us/call). Standalone, XLA's unflashed attention fuses into one tight
program; inside the full backward its [B,H,384,384] f32 intermediates
compete for HBM. So the crossover must be re-measured in the REAL step:

  baseline   : shipping dispatch (XLA path at kv<=512)
  compact384 : MultiheadAttention forced to compact_attention
  flash384   : forced to flash_attention

Interleaved rounds, paired deltas. If a kernel wins, the dispatch gate in
nn/transformer.py moves.

Usage: python scripts/exp_attn_dispatch384.py   (real TPU, ~10 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

BATCH, CTX, VOCAB, ACCUM, LAYERS, DIM, HEADS = 8, 384, 256, 5, 12, 768, 12
N1, N2 = 3, 12


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn, optim, train
    from lamp_tpu.nn import transformer as TR
    from lamp_tpu.ops.attention import compact_attention, flash_attention

    def make_model():
        return nn.LanguageModelModule.init(
            vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
            embed_dim=DIM, attention_heads=HEADS, key=jax.random.PRNGKey(0),
            dtype=jnp.bfloat16, dropout=0.0,
        )

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

    orig_mha = TR.MultiheadAttention.forward

    def forced_forward(kernel):
        def fwd(self, x, *, key=None, train=False):
            xq, xkv = (x[0], x[1]) if isinstance(x, tuple) else (x, x)
            q = self._split_heads(self.w_q(xq))
            k = self._split_heads(self.w_k(xkv), self.num_kv_heads)
            v = self._split_heads(self.w_v(xkv), self.num_kv_heads)
            if self.num_kv_heads != self.num_heads:
                rep = self.num_heads // self.num_kv_heads
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            o = kernel(q, k, v, causal=self.causal, interpret=False)
            return self.w_o(self._merge_heads(o)).astype(xq.dtype), self
        return fwd

    variants = {
        "baseline": orig_mha,
        "compact384": forced_forward(compact_attention),
        "flash384": forced_forward(flash_attention),
    }

    opt = optim.AdamW(3e-4, weight_decay=0.01)
    steps = {}
    for name, fwd in variants.items():
        TR.MultiheadAttention.forward = fwd
        try:
            step = jax.jit(
                train.make_train_step(opt, loss_fn,
                                      accumulation_steps=ACCUM),
                donate_argnums=(0,))
            holder = {"s": train.TrainState.init(make_model(), opt)}

            def call(n, step=step, holder=holder):
                for _ in range(n):
                    holder["s"], (loss, _) = step(holder["s"], batch, rk)
                float(loss)

            with_retries(lambda: call(1))
            steps[name] = call
            print(f"compiled {name}", flush=True)
        finally:
            TR.MultiheadAttention.forward = orig_mha

    w1 = {n: [] for n in steps}
    w2 = {n: [] for n in steps}
    for rnd in range(6):
        for name, call in steps.items():
            t0 = time.perf_counter()
            with_retries(lambda: call(N1))
            t1 = time.perf_counter()
            with_retries(lambda: call(N2))
            t2 = time.perf_counter()
            w1[name].append(t1 - t0)
            w2[name].append(t2 - t1)
        d = {n: (w2[n][-1] - w1[n][-1]) / (N2 - N1) * 1e3 for n in steps}
        print(f"round {rnd}: " + " ".join(f"{n}={v:.2f}"
                                          for n, v in d.items()), flush=True)

    out = {}
    base_rounds = [(b2 - b1) / (N2 - N1) * 1e3
                   for b1, b2 in zip(w1["baseline"], w2["baseline"])]
    for n in steps:
        rounds = [(b2 - b1) / (N2 - N1) * 1e3
                  for b1, b2 in zip(w1[n], w2[n])]
        paired = [r - b for r, b in zip(rounds, base_rounds)]
        out[n] = {"min_ms": round(min(rounds), 2),
                  "rounds_ms": [round(r, 2) for r in rounds],
                  "paired_delta_ms": [round(d, 2) for d in paired]}
        print(f"{n:>12}: min {min(rounds):.2f} ms; paired "
              f"{[round(d, 2) for d in paired]}")
    with open(os.path.join(os.path.dirname(__file__),
                           "exp_attn_dispatch384.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
