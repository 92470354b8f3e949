#!/usr/bin/env python
"""GCN node classification (the reference's example-arxiv: OGB-arxiv with
GCN, example-arxiv/src/main/scala/lamp/example/arxiv/arxiv.scala:90-102).

Accepts an .npz with node_features [N,D], labels [N], edge_index [2,E],
train_mask/test_mask; without a file it builds a synthetic community graph.

Usage: python examples/arxiv.py --data arxiv.npz --epochs 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_communities(n_per=100, communities=4, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    n = n_per * communities
    labels = np.repeat(np.arange(communities), n_per)
    feats = rng.randn(n, dim).astype(np.float32) * 0.5
    for c in range(communities):
        feats[labels == c, c % dim] += 2.0
    edges = []
    for i in range(n):
        for _ in range(5):
            if rng.rand() < 0.8:  # intra-community edge
                j = rng.randint(n_per) + (labels[i] * n_per)
            else:
                j = rng.randint(n)
            edges.append((i, j))
    ei = np.asarray([e[0] for e in edges])
    ej = np.asarray([e[1] for e in edges])
    mask = rng.rand(n) < 0.7
    return feats, labels, ei, ej, mask, ~mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--learning-rate", type=float, default=1e-2)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn, optim

    if args.data:
        z = np.load(args.data)
        feats, labels = z["node_features"], z["labels"]
        ei, ej = z["edge_index"][0], z["edge_index"][1]
        train_mask, test_mask = z["train_mask"], z["test_mask"]
    else:
        print("no --data; synthetic community graph")
        feats, labels, ei, ej, train_mask, test_mask = synthetic_communities()

    classes = int(labels.max()) + 1
    g = nn.Graph(
        jnp.asarray(feats), None, jnp.asarray(ei), jnp.asarray(ej), None
    )

    class GCNNet(nn.Module):
        layers_: tuple
        head: nn.Linear
        dropout: float = nn.static_field()

        def forward(self, graph, *, key=None, train=False):
            keys = (
                jax.random.split(key, len(self.layers_))
                if key is not None else [None] * len(self.layers_)
            )
            for gcn, k in zip(self.layers_, keys):
                graph, _ = gcn.forward(graph, key=k, train=train)
                x = jax.nn.relu(graph.node_features)
                if train and self.dropout > 0 and k is not None:
                    keep = 1 - self.dropout
                    x = x * jax.random.bernoulli(k, keep, x.shape) / keep
                graph = graph._replace(node_features=x)
            return self.head(graph.node_features), self

    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.layers + 1)
    dims = [feats.shape[1]] + [args.hidden] * args.layers
    model = GCNNet(
        layers_=tuple(
            nn.GCN.init(nn.Linear.init(dims[i], dims[i + 1], key=keys[i]))
            for i in range(args.layers)
        ),
        head=nn.Linear.init(args.hidden, classes, key=keys[-1]),
        dropout=args.dropout,
    )

    labels_j = jnp.asarray(labels)
    train_mask_j = jnp.asarray(train_mask)
    params, rest = nn.partition_params(model)
    # reference config: AdamW.factory(lr=0.01, wd=1e-4) with the factory's
    # beta2=0.95 default (arxiv.scala:138-141)
    opt = optim.AdamW(args.learning_rate, beta2=0.95, weight_decay=1e-4)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def lf(p):
            m = nn.combine(p, rest)
            logits, _ = m.forward(g, key=key, train=True)
            losses = nn.losses.cross_entropy_loss(
                logits, labels_j, reduction="none"
            )
            return jnp.sum(losses * train_mask_j) / jnp.sum(train_mask_j)

        loss, grads = jax.value_and_grad(lf)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        if epoch % 20 == 0:
            print(f"epoch {epoch} loss {float(loss):.4f}")

    final = nn.combine(params, rest)
    logits, _ = final.forward(g, train=False)
    pred = np.asarray(jnp.argmax(logits, -1))
    acc = (pred[test_mask] == labels[test_mask]).mean()
    print(f"test accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
