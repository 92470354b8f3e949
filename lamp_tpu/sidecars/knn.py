"""Brute-force k-nearest-neighbours on TPU.

Capability parity with lamp-knn
(lamp-knn/src/main/scala/lamp/knn/package.scala): squared-euclidean and
jaccard distances (:8-44), minibatched search (:60), regression /
classification voting (:82-96).

TPU-first: the distance matrix is one big matmul (||a-b||² = ||a||² + ||b||²
- 2a·b) tiled by query minibatch so arbitrarily large query sets stream
through fixed-shape jitted programs.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["squared_euclidean_distance", "jaccard_distance", "knn_search",
           "knn_classification", "knn_regression"]


def squared_euclidean_distance(a, b):
    """[N,D] x [M,D] -> [N,M] squared distances via the MXU."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    d = a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d, 0.0)


def jaccard_distance(a, b):
    """1 - |intersection| / |union| over binary/count features
    (reference knn/package.scala:24-44)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    inter = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    asum = jnp.sum(a, axis=1, keepdims=True)
    bsum = jnp.sum(b, axis=1, keepdims=True)
    union = asum + bsum.T - inter
    return 1.0 - inter / jnp.maximum(union, 1e-12)


def knn_search(query, corpus, k: int, *,
               distance: Callable = squared_euclidean_distance,
               batch_size: int = 4096):
    """Indices [Nq, k] of the k nearest corpus rows per query row
    (reference knnSearch + minibatched variant, knn/package.scala:60-80)."""
    query = jnp.asarray(query)
    corpus = jnp.asarray(corpus)

    @jax.jit
    def top(qb):
        d = distance(qb, corpus)
        _, idx = jax.lax.top_k(-d, k)
        return idx

    outs = []
    n = query.shape[0]
    for s in range(0, n, batch_size):
        outs.append(top(query[s:s + batch_size]))
    return jnp.concatenate(outs, axis=0)


def knn_classification(features, values, query, k: int, *, num_classes: int,
                       distance: Callable = squared_euclidean_distance,
                       return_probabilities: bool = False):
    """Majority vote over neighbours (reference knn/package.scala:82-90)."""
    idx = knn_search(query, features, k, distance=distance)
    votes = jnp.take(jnp.asarray(values).astype(jnp.int32), idx)  # [Nq, k]
    counts = jax.nn.one_hot(votes, num_classes).sum(axis=1)
    if return_probabilities:
        return counts / k
    return jnp.argmax(counts, axis=1)


def knn_regression(features, values, query, k: int, *,
                   distance: Callable = squared_euclidean_distance):
    """Neighbour mean (reference knn/package.scala:92-96)."""
    idx = knn_search(query, features, k, distance=distance)
    return jnp.mean(jnp.take(jnp.asarray(values), idx), axis=1)
