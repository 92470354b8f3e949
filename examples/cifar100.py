#!/usr/bin/env python
"""CIFAR-100 residual convnet training.

Mirrors the reference example-cifar100 CLI
(example-cifar100/src/main/scala/lamp/example/cifar/cifar100.scala:28-300):
trains the residual conv net on CIFAR-100 binary files (train.bin/test.bin in
the standard CIFAR binary layout), with the same knobs (batch size, epochs,
lr, dropout, onnx export). Without data files it runs on synthetic data so the
pipeline is runnable anywhere.

Usage:
  python examples/cifar100.py --train-data train.bin --test-data test.bin \
      --epochs 10 --batch-size 256 --learning-rate 1e-3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_cifar100_bin(path, coarse=False):
    """Standard CIFAR-100 binary: per record 1 coarse label + 1 fine label +
    3072 pixel bytes."""
    raw = np.fromfile(path, dtype=np.uint8).reshape(-1, 3074)
    labels = raw[:, 0 if coarse else 1].astype(np.int32)
    images = raw[:, 2:].reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
    return images, labels


def synthetic(n=512, classes=100, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, 3, 32, 32).astype(np.float32)
    y = rng.randint(0, classes, n).astype(np.int32)
    return x, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-data", default=None)
    ap.add_argument("--test-data", default=None)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--width", type=int, default=1)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--export-onnx", default=None)
    ap.add_argument("--mesh", default=None,
                    help="e.g. 'dp=8' — SPMD data parallel over devices "
                         "(replaces the reference's 2-process NCCL DDP)")
    ap.add_argument("--steps-per-call", type=int, default=8,
                    help="optimizer steps fused per device dispatch "
                         "(lax.scan); this model's step is sub-ms on TPU, "
                         "so per-batch dispatch would leave the chip idle")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, io as lio, models, nn, optim, train

    if args.train_data:
        x_train, y_train = load_cifar100_bin(args.train_data)
        x_test, y_test = (
            load_cifar100_bin(args.test_data) if args.test_data else (None, None)
        )
    else:
        print("no --train-data given; using synthetic data")
        x_train, y_train = synthetic()
        x_test, y_test = synthetic(256, seed=1)

    model = models.resnet_cifar(
        100, key=jax.random.PRNGKey(args.seed), dropout=args.dropout,
        width_multiplier=args.width,
    )
    # reference config: AdamW.factory(wd=0.0) with the factory's beta2=0.95
    # default (cifar100.scala:187-190); --weight-decay overrides
    optimizer = optim.AdamW(args.learning_rate, beta2=0.95,
                            weight_decay=args.weight_decay)

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        out, nm = m.forward(xx, key=key, train=train_mode)
        return nn.losses.nll_loss(out, yy), jnp.asarray(
            xx.shape[0], jnp.float32
        ), nm

    rng = np.random.default_rng(args.seed)

    def checkpoint_cb(state, meta):
        if args.checkpoint:
            lio.save_loop_state(
                args.checkpoint, model=state.model,
                optimizer_state=state.opt_state, epoch=meta["epoch"],
                learning_curve=meta["learning_curve"],
            )

    train_step = None
    if args.mesh:
        from lamp_tpu import parallel

        axes = dict(
            (kv.split("=")[0], int(kv.split("=")[1]))
            for kv in args.mesh.split(",")
        )
        mesh = parallel.make_mesh(axes)
        sharding = parallel.batch_sharding(mesh, list(axes)[0])
        base = train.make_train_step(optimizer, loss_fn)
        jitted = jax.jit(base, donate_argnums=(0,))

        def train_step(state, batch, key, lr_factor=1.0):
            return jitted(state, jax.device_put(batch, sharding), key,
                          lr_factor)

    result = train.epochs(
        model=model,
        optimizer=optimizer,
        loss_fn=loss_fn,
        train_batches=lambda e: data.minibatches_from_full(
            args.batch_size, x_train, y_train, rng=rng
        ),
        validation_batches=(
            (lambda e: data.minibatches_from_full(args.batch_size, x_test, y_test))
            if x_test is not None else None
        ),
        epochs=args.epochs,
        key=jax.random.PRNGKey(args.seed),
        checkpoint_callback=checkpoint_cb,
        train_step=train_step,
        steps_per_call=(1 if args.mesh else args.steps_per_call),
        log=print,
    )

    final = result.state.model
    if x_test is not None:
        preds = []
        for s in range(0, len(x_test), args.batch_size):
            preds.append(np.asarray(
                jnp.argmax(final(jnp.asarray(x_test[s:s + args.batch_size])), -1)
            ))
        acc = (np.concatenate(preds) == y_test[:len(np.concatenate(preds))]).mean()
        print(f"test accuracy: {acc:.4f}")

    if args.export_onnx:
        from lamp_tpu.io.onnx_export import export_onnx

        export_onnx(
            lambda x: final(x), (jnp.zeros((1, 3, 32, 32), jnp.float32),),
            path=args.export_onnx, input_names=["image"],
        )
        print(f"exported ONNX to {args.export_onnx}")


if __name__ == "__main__":
    main()
