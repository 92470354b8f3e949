#!/usr/bin/env python
"""CLIP / SigLIP contrastive pretraining example.

Beyond reference parity (pityka/lamp has no multimodal family): trains a
dual-tower image-text model with the symmetric InfoNCE (CLIP) or pairwise
sigmoid (SigLIP) objective. Runs on synthetic procedurally-labelled data by
default so the pipeline is runnable anywhere; point --data at a .npz with
``images`` [N,3,H,W] float, ``tokens`` [N,T] int, ``lengths`` [N] int to
train on real pairs.

Usage:
  python examples/clip_train.py --epochs 3 --batch-size 64 --siglip
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_pairs(n=512, image_size=16, vocab=64, ctx=8, seed=0):
    """Instance-level pairs: each sample carries a random 3-digit code
    (16 levels per digit). The caption spells the code as three tokens and
    the image encodes digit j as channel-j brightness — so every pair is
    (near-)unique and InfoNCE retrieval is well-posed."""
    rng = np.random.RandomState(seed)
    levels = min(16, vocab - 4)
    code = rng.randint(0, levels, (n, 3))
    images = rng.rand(n, 3, image_size, image_size).astype(np.float32) * 0.2
    images += (code[:, :, None, None] / levels).astype(np.float32)
    tokens = rng.randint(4 + levels, vocab, (n, ctx)).astype(np.int32) \
        if vocab > 4 + levels else rng.randint(4, vocab, (n, ctx)).astype(np.int32)
    tokens[:, :3] = 4 + code
    lengths = rng.randint(3, ctx + 1, n).astype(np.int32)
    return images, tokens, lengths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help=".npz with images/tokens/lengths")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--embed-dim", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=16)
    ap.add_argument("--patch-size", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=64)
    ap.add_argument("--context", type=int, default=8)
    ap.add_argument("--siglip", action="store_true",
                    help="pairwise sigmoid loss instead of InfoNCE")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import models, optim, train
    from lamp_tpu.io import checkpoint as ckpt

    if args.data:
        blob = np.load(args.data)
        images, tokens, lengths = (
            blob["images"], blob["tokens"], blob["lengths"]
        )
    else:
        images, tokens, lengths = synthetic_pairs(
            image_size=args.image_size, vocab=args.vocab, ctx=args.context
        )

    model = models.CLIP.init(
        image_size=images.shape[-1], patch_size=args.patch_size,
        vocab_size=args.vocab, context_length=tokens.shape[1],
        embed_dim=args.embed_dim, key=jax.random.PRNGKey(0),
        siglip=args.siglip,
    )
    opt = optim.AdamW(args.learning_rate, weight_decay=0.05)
    loss = models.siglip_loss if args.siglip else models.clip_loss

    def loss_fn(m, batch, key, train_mode):
        (img, txt), new_m = m.forward(batch, key=key, train=train_mode)
        if args.siglip:
            val = loss(img, txt, m.logit_scale, m.logit_bias)
        else:
            val = loss(img, txt, m.logit_scale)
        return val, jnp.float32(batch[0].shape[0]), new_m

    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn))
    n = images.shape[0]
    b = args.batch_size
    rng = np.random.RandomState(0)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        tot, cnt = 0.0, 0
        for s in range(0, n - b + 1, b):
            idx = order[s:s + b]
            batch = (jnp.asarray(images[idx]), jnp.asarray(tokens[idx]),
                     jnp.asarray(lengths[idx]))
            state, (l, _) = step(state, batch, jax.random.PRNGKey(epoch * 999 + s))
            tot += float(l) * b
            cnt += b
        print(f"epoch {epoch}: loss {tot / max(cnt, 1):.4f}")

    # retrieval accuracy on a held-out probe
    probe = (jnp.asarray(images[:64]), jnp.asarray(tokens[:64]),
             jnp.asarray(lengths[:64]))
    (img_e, txt_e), _ = state.model.forward(probe)
    sim = np.asarray(img_e @ txt_e.T)
    acc = float((sim.argmax(axis=1) == np.arange(sim.shape[0])).mean())
    print(f"image->text retrieval@1: {acc:.3f}")

    if args.checkpoint:
        ckpt.save_pytree(args.checkpoint, state.model)
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()
