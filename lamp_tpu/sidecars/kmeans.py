"""Minibatch k-means with k-means++ initialization.

Capability parity with lamp-kmeans
(lamp-kmeans/src/main/scala/lamp/kmeans/package.scala:23-150
``minibatchKMeans``): k-means++ seeding, minibatch center updates with
per-center learning rates (Sculley 2010).

TPU-first: assignment is one distance matmul per minibatch; the update is a
segment-sum — the whole iteration jits into a single program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .knn import squared_euclidean_distance

__all__ = ["kmeans_plus_plus_init", "minibatch_kmeans", "kmeans_assign",
           "KMeansResult"]


class KMeansResult(NamedTuple):
    centers: jnp.ndarray
    assignment: jnp.ndarray
    inertia: float


def kmeans_plus_plus_init(key, data, k: int):
    """k-means++ seeding: iteratively sample points ∝ squared distance to the
    nearest already-chosen center."""
    data = jnp.asarray(data, jnp.float32)
    n = data.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((k, data.shape[1]), jnp.float32).at[0].set(data[first])
    d2 = squared_euclidean_distance(data, centers[:1])[:, 0]
    for i in range(1, k):
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        nxt = jax.random.choice(sub, n, p=probs)
        centers = centers.at[i].set(data[nxt])
        nd = squared_euclidean_distance(data, centers[i:i + 1])[:, 0]
        d2 = jnp.minimum(d2, nd)
    return centers


def kmeans_assign(data, centers):
    d = squared_euclidean_distance(jnp.asarray(data, jnp.float32), centers)
    return jnp.argmin(d, axis=1), jnp.min(d, axis=1)


def minibatch_kmeans(data, k: int, *, iterations: int = 100,
                     batch_size: int = 1024, key=None) -> KMeansResult:
    """Sculley-style minibatch k-means (reference kmeans/package.scala:23)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    data = jnp.asarray(data, jnp.float32)
    n = data.shape[0]
    batch_size = min(batch_size, n)
    key, ik = jax.random.split(key)
    centers = kmeans_plus_plus_init(ik, data, k)
    counts = jnp.zeros((k,), jnp.float32)

    @jax.jit
    def step(centers, counts, batch):
        assign, _ = kmeans_assign(batch, centers)
        one_hot = jax.nn.one_hot(assign, k)                   # [B, k]
        batch_counts = one_hot.sum(axis=0)                     # [k]
        sums = one_hot.T @ batch                               # [k, D]
        new_counts = counts + batch_counts
        lr = jnp.where(new_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0), 0.0)
        means = sums / jnp.maximum(batch_counts[:, None], 1.0)
        new_centers = centers * (1 - lr[:, None]) + means * lr[:, None]
        # keep centers that saw no data unchanged
        new_centers = jnp.where(batch_counts[:, None] > 0, new_centers, centers)
        return new_centers, new_counts

    for _ in range(iterations):
        key, sub = jax.random.split(key)
        sel = jax.random.choice(sub, n, (batch_size,), replace=False)
        centers, counts = step(centers, counts, data[sel])

    assignment, dists = kmeans_assign(data, centers)
    return KMeansResult(centers, assignment, float(jnp.sum(dists)))
