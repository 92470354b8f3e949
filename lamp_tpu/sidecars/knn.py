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
           "knn_search_nn_descent", "knn_classification", "knn_regression"]


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


@functools.lru_cache(maxsize=None)
def _top_k_fn(distance: Callable, k: int):
    # cached per (distance, k) so repeated knn_search calls reuse the
    # compiled program instead of re-jitting a fresh closure every call
    @jax.jit
    def top(qb, corpus):
        d = distance(qb, corpus)
        _, idx = jax.lax.top_k(-d, k)
        return idx

    return top


def knn_search(query, corpus, k: int, *,
               distance: Callable = squared_euclidean_distance,
               batch_size: int = 4096):
    """Indices [Nq, k] of the k nearest corpus rows per query row
    (reference knnSearch + minibatched variant, knn/package.scala:60-80)."""
    query = jnp.asarray(query)
    corpus = jnp.asarray(corpus)
    top = _top_k_fn(distance, k)

    outs = []
    n = query.shape[0]
    for s in range(0, n, batch_size):
        outs.append(top(query[s:s + batch_size], corpus))
    return jnp.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=None)
def _nn_descent_refine(k_eff: int):
    # cached per k; data passed as an ARGUMENT (closure capture would bake
    # the whole [N, D] dataset into the jaxpr as a constant and re-trace
    # on every knn_search_nn_descent call)
    @jax.jit
    def refine(rows, cand, x_rows, data):
        # cand: [B, C] candidate neighbour ids for these rows
        xc = data[cand]                       # [B, C, D]
        d = jnp.sum(jnp.square(x_rows[:, None, :] - xc), axis=-1)
        d = jnp.where(cand == rows[:, None], jnp.inf, d)
        # dedup: sort by candidate id, mask adjacent repeats
        order = jnp.argsort(cand, axis=1)
        cs = jnp.take_along_axis(cand, order, axis=1)
        ds = jnp.take_along_axis(d, order, axis=1)
        dup = cs[:, 1:] == cs[:, :-1]
        ds = jnp.concatenate(
            [ds[:, :1], jnp.where(dup, jnp.inf, ds[:, 1:])], axis=1
        )
        negd, pos = jax.lax.top_k(-ds, k_eff)
        return jnp.take_along_axis(cs, pos, axis=1), -negd

    return refine


def knn_search_nn_descent(data, k: int, *, n_iters: int = 12,
                          n_random: int = 8, key=None,
                          batch_size: int = 2048, tol: float = 0.001):
    """Approximate all-pairs kNN by NN-descent (Dong et al. 2011): refine a
    random neighbour graph by repeatedly examining neighbours-of-neighbours.
    O(N·k²·D) per sweep instead of the O(N²·D) brute-force matrix — the
    large-N path the reference's brute-force kNN (knn/package.scala:60)
    lacks.

    TPU-shaped: each sweep is a fixed-shape jitted program over row
    minibatches; candidate dedup is a sort + adjacent-equality mask (no
    dynamic shapes). Reverse edges (j proposes itself to each of its
    neighbours — the other half of Dong et al.'s local join) are sampled
    into a fixed [N, k] table by random-slot scatter, and the expansion
    walks neighbours of the forward∪reverse union (4k² candidates/row),
    which lifts recall sharply at small k where forward-only expansion
    starves. Returns (indices [N,k], distances [N,k]) with squared
    euclidean distances, sorted ascending. Stops early when fewer than
    ``tol``·N·k neighbour entries changed in a sweep.
    """
    data = jnp.asarray(data, jnp.float32)
    n = data.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    k_eff = min(k, n - 1)

    key, ik = jax.random.split(key)
    idx = jax.random.randint(ik, (n, k_eff), 0, n)

    refine = _nn_descent_refine(k_eff)

    rows_col = jnp.tile(jnp.arange(n)[:, None], (1, k_eff))
    sources = jnp.repeat(jnp.arange(n), k_eff)

    dists = None
    for _ in range(n_iters):
        key, rk, sk = jax.random.split(key, 3)
        rand = jax.random.randint(rk, (n, n_random), 0, n)
        # reverse-edge sample: every edge (j → idx[j,c]) proposes j as a
        # candidate of idx[j,c]; random slots, collisions drop edges. The
        # self-id fill is inert (refine masks cand == row with inf).
        slots = jax.random.randint(sk, (n * k_eff,), 0, k_eff)
        rev = rows_col.at[idx.reshape(-1), slots].set(sources)
        union = jnp.concatenate([idx, rev], axis=1)
        expanded = union[union].reshape(n, 4 * k_eff * k_eff)
        cand = jnp.concatenate([idx, expanded, rand], axis=1)
        new_idx, new_d = [], []
        rows_all = jnp.arange(n)
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            ni, nd = refine(rows_all[s:e], cand[s:e], data[s:e], data)
            new_idx.append(ni)
            new_d.append(nd)
        new_idx = jnp.concatenate(new_idx, axis=0)
        dists = jnp.concatenate(new_d, axis=0)
        changed = int(jnp.sum(new_idx != idx))
        idx = new_idx
        if changed <= tol * n * k_eff:
            break
    return idx, dists


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
