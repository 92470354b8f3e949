#!/usr/bin/env python
"""BERT pretraining on a text corpus (the reference's example-bert,
example-bert/src/main/scala/lamp/example/bert/wiki.scala): sentence-pair NSP
batches with 80/10/10 MLM masking, trained with AdamW.

Usage: python examples/bert.py --corpus wiki.txt --steps 500
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PAD, CLS, SEP, MASK, UNK = 0, 1, 2, 3, 4
SPECIAL = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, io as lio, nn, optim, train

    if args.corpus:
        with open(args.corpus) as f:
            text = f.read()
    else:
        print("no --corpus; synthetic text")
        text = "the quick brown fox jumps over the lazy dog . " * 2000

    # word-level vocabulary with special tokens
    words = text.split()
    from collections import Counter

    counts = Counter(words)
    vocab = {w: i + SPECIAL for i, (w, _) in enumerate(
        counts.most_common(args.vocab - SPECIAL)
    )}
    V = SPECIAL + len(vocab)
    print(f"vocab {V}")

    # paragraphs of tokenized sentences (split on '.')
    paragraphs = []
    for para in text.split("\n\n") if "\n\n" in text else [text]:
        sentences = [
            [vocab.get(w, UNK) for w in s.split()][: args.max_length // 2 - 2]
            for s in para.split(".") if s.strip()
        ]
        sentences = [s for s in sentences if len(s) >= 2]
        if len(sentences) >= 2:
            paragraphs.append(sentences)

    model = nn.BertPretrainModule.init(
        vocab_size=V, segments=2, max_length=args.max_length,
        num_blocks=args.layers, embed_dim=args.dim,
        attention_heads=args.heads, key=jax.random.PRNGKey(args.seed),
    )

    def loss_fn(m, batch, key, train_mode):
        tokens, segments, positions, mlm_t, nsp_t, lengths = batch
        inp = nn.BertPretrainInput(tokens, segments, positions, lengths)
        (enc, mlm, nsp), nm = m.forward(inp, key=key, train=train_mode)
        loss = nn.bert_loss(mlm, mlm_t, nsp, nsp_t)
        return loss, jnp.asarray(tokens.shape[0], jnp.float32), nm

    # the reference BERT example trains with RAdam, wd=0
    # (example-bert wiki.scala:210-213) — round-5 fidelity audit
    opt = optim.RAdam(args.learning_rate, weight_decay=0.0)
    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    for i in range(args.steps):
        batch = data.prepare_sentence_pairs(
            paragraphs, rng=rng, max_length=args.max_length, cls_token=CLS,
            sep_token=SEP, pad_token=PAD, mask_token=MASK, vocab_size=V,
            num_prediction_positions=20,
        )
        sel = rng.choice(len(batch.tokens),
                         min(args.batch_size, len(batch.tokens)),
                         replace=False)
        b = tuple(np.asarray(x)[sel] for x in batch)
        key, sub = jax.random.split(key)
        state, (loss, _) = step(state, b, sub)
        if i % 25 == 0:
            print(f"step {i} loss {float(loss):.4f}")

    if args.checkpoint:
        lio.save_loop_state(
            args.checkpoint, model=state.model,
            optimizer_state=state.opt_state, epoch=args.steps,
        )
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()
