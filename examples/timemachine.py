#!/usr/bin/env python
"""Char-LSTM text generation (the reference's example-timemachine,
example-timemachine/src/main/scala/lamp/example/timemachine/timemachine.scala:
1-219): char vocabulary, stateful LSTM trained on contiguous windows, greedy
generation from a prompt.

Usage: python examples/timemachine.py --text book.txt --epochs 5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default=None)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--embed", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--generate", type=int, default=200)
    ap.add_argument("--prompt", default="the ")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, nn, optim, train

    if args.text:
        with open(args.text) as f:
            text = f.read().lower()
    else:
        print("no --text; using a synthetic repeated phrase")
        text = ("the time machine by h g wells " * 500).lower()

    tokens, vocab = data.chars_to_integers(text)
    inv_vocab = {i: c for c, i in vocab.items()}
    V = len(vocab)
    print(f"{len(tokens)} chars, vocab {V}")

    class CharLSTM(nn.Module):
        emb: nn.Embedding
        lstm: nn.LSTM
        head: nn.Linear

        def forward(self, x_and_state, *, key=None, train=False):
            if isinstance(x_and_state, tuple):
                x, carry = x_and_state
            else:
                x, carry = x_and_state, None
            e = self.emb(x)
            (h, carry), _ = self.lstm.forward((e, carry))
            return (self.head(h), carry), self

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(args.seed), 3)
    model = CharLSTM(
        emb=nn.Embedding.init(V, args.embed, key=k1),
        lstm=nn.LSTM.init(args.embed, args.hidden, key=k2),
        head=nn.Linear.init(args.hidden, V, key=k3),
    )

    def loss_fn(m, batch, key, train_mode):
        x, y = batch
        (logits, _), nm = m.forward((x, None), key=key, train=train_mode)
        return nn.losses.sequence_nll(logits, y), jnp.asarray(
            x.shape[0], jnp.float32
        ), nm

    rng = np.random.default_rng(args.seed)
    result = train.epochs(
        model=model,
        # reference config: AdamW.factory(wd=0, clip=1.0) with the factory's
        # beta2=0.95 default (timemachine.scala:178-182)
        optimizer=optim.AdamW(args.learning_rate, beta2=0.95, clip=1.0),
        loss_fn=loss_fn,
        train_batches=lambda e: data.minibatches_from_text(
            tokens, args.batch_size, args.seq_len, rng=rng
        ),
        epochs=args.epochs,
        key=jax.random.PRNGKey(args.seed),
        log=print,
    )

    # greedy generation (reference: FreeRunningRNN-style)
    final = result.state.model
    prompt = np.asarray([vocab.get(c, 0) for c in args.prompt.lower()])[None]

    def fwd(tok):
        (logits, _), _ = final.forward((tok, None))
        return logits

    out = data.sequence_prediction(fwd, prompt, args.generate)
    print("".join(inv_vocab[int(t)] for t in np.asarray(out)[0]))


if __name__ == "__main__":
    main()
