#!/usr/bin/env python
"""Pin the flagship step's remaining on-path buckets by interleaved
knockouts (follow-up to exp_norm_knockout.py, which pinned norm stats at
~4.2 ms on-path). Variants, all timed round-robin in the same minutes:

  baseline    : the shipping step
  nostats     : LayerNorm stats knocked out (y = x*w + b)  [replication]
  noattncore  : attention core knocked out (o = v + q*1e-30 after the
                head split, keeping ALL four projection matmuls and the
                split/merge relayouts) — pins the in-model cost of the
                score/softmax/value einsums themselves
  nogelu      : MLP activation replaced by identity — pins GELU f+b
  nosplit     : noattncore AND the head split/merge transposes removed
                (o = xv reshaped directly) — the difference vs noattncore
                pins the [B,T,H,D]<->[B,H,T,D] relayout cost

Usage: python scripts/exp_step_knockouts.py   (real TPU, ~12 min)
Writes scripts/exp_step_knockouts.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

BATCH, CTX, VOCAB, ACCUM, LAYERS, DIM, HEADS = 8, 384, 256, 5, 12, 768, 12
N1, N2 = 3, 12
# LAMP_KO_CTX4096=1: run the same knockout protocol at the ctx-4096
# flash-path bench-extra config instead (B=2, no accumulation, fewer
# rounds — each step is ~76 ms)
if os.environ.get("LAMP_KO_CTX4096"):
    BATCH, CTX, ACCUM = 2, 4096, 1
    N1, N2 = 2, 8


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
    from lamp_tpu.nn import layers as LY
    from lamp_tpu.nn import transformer as TR

    def make_model(activation=None):
        m = nn.LanguageModelModule.init(
            vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
            embed_dim=DIM, attention_heads=HEADS, key=jax.random.PRNGKey(0),
            dtype=jnp.bfloat16, dropout=0.0,
        )
        if activation is not None:
            enc = m.encoder
            blocks = tuple(dataclasses.replace(b, activation=activation)
                           for b in enc.blocks)
            m = dataclasses.replace(
                m, encoder=dataclasses.replace(enc, blocks=blocks))
        return m

    def loss_fn(model, batch, key, train_mode):
        toks, target = batch
        logits, nm = model.forward(toks, key=key, train=train_mode)
        return (nn.lm_loss(logits, target),
                jnp.asarray(toks.shape[0], jnp.float32), nm)

    rng = np.random.RandomState(0)
    shape = (ACCUM, BATCH, CTX) if ACCUM > 1 else (BATCH, CTX)
    toks = jnp.asarray(rng.randint(0, VOCAB, shape).astype(np.int32))
    batch = (toks, jnp.roll(toks, -1, axis=-1))
    rk = jax.random.PRNGKey(1)

    orig_ln = LY.LayerNorm.forward
    orig_mha = TR.MultiheadAttention.forward

    def nostats_forward(self, x, *, key=None, train=False):
        sd = jnp.promote_types(x.dtype, jnp.float32)
        y = x.astype(sd)
        if self.weight is not None:
            y = y * self.weight.astype(sd)
        if self.bias is not None:
            y = y + self.bias.astype(sd)
        return y.astype(x.dtype), self

    def noattncore_forward(self, x, *, key=None, train=False):
        xq, xkv = (x[0], x[1]) if isinstance(x, tuple) else (x, x)
        q = self._split_heads(self.w_q(xq))
        k = self._split_heads(self.w_k(xkv), self.num_kv_heads)
        v = self._split_heads(self.w_v(xkv), self.num_kv_heads)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        o = v + q * jnp.bfloat16(1e-30) + k * jnp.bfloat16(1e-30)
        return self.w_o(self._merge_heads(o)).astype(xq.dtype), self

    def nosplit_forward(self, x, *, key=None, train=False):
        xq, xkv = (x[0], x[1]) if isinstance(x, tuple) else (x, x)
        q = self.w_q(xq)
        k = self.w_k(xkv)
        v = self.w_v(xkv)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.tile(k, (1, 1, rep))
            v = jnp.tile(v, (1, 1, rep))
        o = v + q * jnp.bfloat16(1e-30) + k * jnp.bfloat16(1e-30)
        return self.w_o(o).astype(xq.dtype), self

    variants = {
        "baseline": (orig_ln, orig_mha, None),
        "nostats": (nostats_forward, orig_mha, None),
        "noattncore": (orig_ln, noattncore_forward, None),
        "nosplit": (orig_ln, nosplit_forward, None),
        "nogelu": (orig_ln, orig_mha, lambda x: x),
    }

    opt = optim.AdamW(3e-4, weight_decay=0.01)
    steps = {}
    for name, (ln_fwd, mha_fwd, act) in variants.items():
        LY.LayerNorm.forward = ln_fwd
        TR.MultiheadAttention.forward = mha_fwd
        try:
            step = jax.jit(
                train.make_train_step(opt, loss_fn,
                                      accumulation_steps=ACCUM),
                donate_argnums=(0,))
            holder = {"s": train.TrainState.init(make_model(act), opt)}

            def call(n, step=step, holder=holder):
                for _ in range(n):
                    holder["s"], (loss, _) = step(holder["s"], batch, rk)
                float(loss)

            with_retries(lambda: call(1))  # trace+compile while patched
            steps[name] = call
            print(f"compiled {name}", flush=True)
        finally:
            LY.LayerNorm.forward = orig_ln
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
    name = ("exp_step_knockouts_ctx4096.json"
            if os.environ.get("LAMP_KO_CTX4096")
            else "exp_step_knockouts.json")
    with open(os.path.join(os.path.dirname(__file__), name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
