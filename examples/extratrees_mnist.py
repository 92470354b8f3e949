#!/usr/bin/env python
"""Extra-trees classification (the reference's example-extratree: mnist.sc —
extremely randomized trees on MNIST CSV).

Usage: python examples/extratrees_mnist.py --train mnist_train.csv.gz \
       --test mnist_test.csv.gz --trees 50
Without files it runs on a synthetic digits-like problem.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_mnist_csv(path):
    from lamp_tpu.data import read_csv

    cols, names = read_csv(path, header=True)
    y = cols[names[0]].astype(np.int64)
    x = np.stack([cols[c] for c in names[1:]], axis=1)
    return x / 255.0, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default=None)
    ap.add_argument("--test", default=None)
    ap.add_argument("--trees", type=int, default=50)
    ap.add_argument("--min-leaf", type=int, default=2)
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    from lamp_tpu import sidecars

    if args.train:
        x_train, y_train = load_mnist_csv(args.train)
        x_test, y_test = load_mnist_csv(args.test) if args.test else (None, None)
    else:
        print("no --train; synthetic 10-class problem")
        rng = np.random.RandomState(0)
        centers = rng.randn(10, 32) * 3
        y_train = rng.randint(0, 10, 2000)
        x_train = centers[y_train] + rng.randn(2000, 32)
        y_test = rng.randint(0, 10, 500)
        x_test = centers[y_test] + rng.randn(500, 32)

    classes = int(y_train.max()) + 1
    t0 = time.perf_counter()
    forest = sidecars.build_forest_classification(
        x_train, y_train, num_classes=classes, n_trees=args.trees,
        min_leaf=args.min_leaf, n_jobs=args.jobs, seed=0,
    )
    print(f"built {args.trees} trees in {time.perf_counter() - t0:.1f}s")

    if x_test is not None:
        pred = sidecars.predict_classification(forest, x_test).argmax(1)
        print(f"test accuracy: {(pred == y_test).mean():.4f}")

    if args.save:
        sidecars.save_forest(args.save, forest)
        print(f"saved to {args.save}")


if __name__ == "__main__":
    main()
