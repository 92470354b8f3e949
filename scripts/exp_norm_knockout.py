#!/usr/bin/env python
"""Is the flagship step's ~10 ms isolated-norms cost (exp_lm_step_scan P6)
actually on the critical path, or overlapped? A/B the REAL train step with
LayerNorm's statistics knocked out (y = x * w + b — same tensor shapes and
program structure, no mean/var/rsqrt), INTERLEAVED with baseline so
service drift cancels. If the knockout recovers most of the 10 ms, a
fused Pallas LayerNorm f+b kernel is worth building; if not, norms are
hidden under the matmul streams and the step is bound.

Usage: python scripts/exp_norm_knockout.py   (real TPU, ~6 min)
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
    from lamp_tpu.nn import layers as LY

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

    orig_forward = LY.LayerNorm.forward

    def nostats_forward(self, x, *, key=None, train=False):
        sd = jnp.promote_types(x.dtype, jnp.float32)
        y = x.astype(sd)
        if self.weight is not None:
            y = y * self.weight.astype(sd)
        if self.bias is not None:
            y = y + self.bias.astype(sd)
        return y.astype(x.dtype), self

    # build BOTH step fns up front (patch only during trace)
    opt = optim.AdamW(3e-4, weight_decay=0.01)
    steps = {}
    holders = {}
    for name, fwd in (("baseline", orig_forward),
                      ("nostats", nostats_forward)):
        LY.LayerNorm.forward = fwd
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

            with_retries(lambda: call(1))  # compile (traces NOW, patched)
            steps[name] = call
            holders[name] = holder
            print(f"compiled {name}", flush=True)
        finally:
            LY.LayerNorm.forward = orig_forward

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
        print(f"round {rnd}: " + " ".join(f"{n}={v:.2f}ms"
                                          for n, v in d.items()), flush=True)

    out = {}
    for n in steps:
        rounds = [(b2 - b1) / (N2 - N1) * 1e3
                  for b1, b2 in zip(w1[n], w2[n])]
        out[n] = {"min_ms": round(min(rounds), 2),
                  "rounds_ms": [round(r, 2) for r in rounds]}
    paired = [a - b for a, b in zip(out["nostats"]["rounds_ms"],
                                    out["baseline"]["rounds_ms"])]
    out["paired_delta_ms"] = [round(d, 2) for d in paired]
    print(f"baseline min {out['baseline']['min_ms']} ms, nostats min "
          f"{out['nostats']['min_ms']} ms; paired deltas {paired}")
    with open(os.path.join(os.path.dirname(__file__),
                           "exp_norm_knockout.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
