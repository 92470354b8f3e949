#!/usr/bin/env python
"""DiT image-generation example: DDPM or rectified-flow training + sampling.

Beyond-parity example (the reference pityka/lamp has no generative image
models). Trains a class-conditional DiT on CIFAR-100 binary files (same
layout as examples/cifar100.py) or synthetic data, then samples a grid with
classifier-free guidance.

Usage:
  python examples/diffusion.py --epochs 2 --batch-size 64 \
      [--train-data train.bin] [--objective flow|ddpm] [--sample-png out.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-data", default=None)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--objective", choices=("ddpm", "flow"), default="flow")
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--patch-size", type=int, default=4)
    ap.add_argument("--embed-dim", type=int, default=192)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--heads", type=int, default=3)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--cfg-scale", type=float, default=3.0)
    ap.add_argument("--sample-steps", type=int, default=32)
    ap.add_argument("--sample-png", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import optim, train
    from lamp_tpu.models import DiT, GaussianDiffusion, RectifiedFlow

    if args.train_data:
        from cifar100 import load_cifar100_bin
        x, y = load_cifar100_bin(args.train_data)
        if args.image_size != x.shape[-1]:
            raise SystemExit(
                f"--train-data yields {x.shape[-1]}x{x.shape[-1]} images but "
                f"--image-size is {args.image_size}; pass --image-size "
                f"{x.shape[-1]} (or omit it)."
            )
    else:
        rng = np.random.RandomState(0)
        x = rng.rand(512, 3, args.image_size, args.image_size).astype(np.float32)
        y = rng.randint(0, args.classes, len(x)).astype(np.int32)
    x = x * 2.0 - 1.0  # [-1, 1]

    key = jax.random.PRNGKey(0)
    model = DiT.init(image_size=args.image_size, patch_size=args.patch_size,
                     channels=3, embed_dim=args.embed_dim,
                     num_blocks=args.blocks, num_heads=args.heads,
                     num_classes=args.classes, key=key)
    process = (RectifiedFlow() if args.objective == "flow"
               else GaussianDiffusion(1000))
    opt = optim.AdamW(args.learning_rate, weight_decay=0.0)
    state = train.TrainState.init(model, opt)

    def loss_fn(m, batch, k, tr):
        xb, yb = batch
        return (process.loss(m, xb, key=k, labels=yb, cfg_dropout=0.1),
                jnp.asarray(float(xb.shape[0])), m)

    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))
    n = (len(x) // args.batch_size) * args.batch_size
    for epoch in range(args.epochs):
        perm = np.random.RandomState(epoch).permutation(len(x))[:n]
        losses = []
        for i in range(0, n, args.batch_size):
            idx = perm[i:i + args.batch_size]
            state, (loss, _) = step(
                state, (jnp.asarray(x[idx]), jnp.asarray(y[idx])),
                jax.random.PRNGKey(epoch * 100003 + i))
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    labels = jnp.arange(8) % args.classes
    if args.objective == "flow":
        imgs = process.sample(state.model, key=jax.random.PRNGKey(1), batch=8,
                              num_steps=args.sample_steps, labels=labels,
                              guidance_scale=args.cfg_scale)
    else:
        imgs = process.ddim_sample(state.model, key=jax.random.PRNGKey(1),
                                   batch=8, num_steps=args.sample_steps,
                                   labels=labels,
                                   guidance_scale=args.cfg_scale)
    imgs = np.asarray((jnp.clip(imgs, -1, 1) + 1) / 2)
    print("sampled:", imgs.shape, "mean", float(imgs.mean()))
    if args.sample_png:
        from lamp_tpu.data.images import save_image_grid
        save_image_grid(imgs, args.sample_png)
        print("wrote", args.sample_png)


if __name__ == "__main__":
    main()
