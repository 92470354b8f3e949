"""UMAP dimensionality reduction.

Capability parity with lamp-umap
(lamp-umap/src/main/scala/lamp/umap/umap.scala): kNN graph -> fuzzy
simplicial edge weights via the smooth-kNN binary search (``edgeWeights``
:50), then a negative-sampling stochastic layout optimized with the
framework's own AdamW (``optimize`` ~:180-350, ``umap``/``umapCustomKnn``
:355,420) — the same structure, on TPU: the kNN graph is one big matmul
(sidecars.knn) and each optimizer step is a jitted batch of attractive +
negative-sampled repulsive forces.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..optim import AdamW
from .knn import knn_search, squared_euclidean_distance

__all__ = ["smooth_knn_weights", "find_ab_params", "umap", "umap_custom_knn"]


def smooth_knn_weights(knn_dists: np.ndarray, *, n_iter: int = 64,
                       bandwidth: float = 1.0) -> np.ndarray:
    """Fuzzy membership weights per (point, neighbour).

    For each row: rho = nearest nonzero distance; binary-search sigma so that
    sum_j exp(-(d_ij - rho)/sigma) == log2(k) (reference edgeWeights,
    umap.scala:50-120).
    """
    d = np.asarray(knn_dists, np.float64)
    n, k = d.shape
    target = np.log2(k) * bandwidth
    rho = np.where(d[:, 0] > 0, d[:, 0], 0.0)
    # nearest nonzero distance per row
    masked = np.where(d > 0, d, np.inf)
    rho = np.min(masked, axis=1)
    rho[~np.isfinite(rho)] = 0.0

    lo = np.zeros(n)
    hi = np.full(n, np.inf)
    sigma = np.ones(n)
    for _ in range(n_iter):
        val = np.sum(np.exp(-np.maximum(d - rho[:, None], 0.0) / sigma[:, None]),
                     axis=1)
        too_big = val > target
        hi = np.where(too_big, sigma, hi)
        lo = np.where(too_big, lo, sigma)
        sigma = np.where(
            np.isfinite(hi), (lo + hi) / 2.0,
            sigma * np.where(too_big, 0.5, 2.0),
        )
    w = np.exp(-np.maximum(d - rho[:, None], 0.0) / sigma[:, None])
    return w


def _symmetrize(rows, cols, weights, n):
    """w_sym = w + w^T - w ∘ w^T over the sparse kNN graph."""
    from collections import defaultdict

    m = defaultdict(float)
    for r, c, w in zip(rows, cols, weights):
        m[(int(r), int(c))] = float(w)
    out = {}
    for (r, c), w in m.items():
        wt = m.get((c, r), 0.0)
        out[(r, c)] = w + wt - w * wt
    rr, cc, ww = [], [], []
    for (r, c), w in out.items():
        if r != c and w > 0:
            rr.append(r)
            cc.append(c)
            ww.append(w)
    return np.asarray(rr), np.asarray(cc), np.asarray(ww)


def find_ab_params(spread: float = 1.0, min_dist: float = 0.1,
                   steps: int = 2000) -> Tuple[float, float]:
    """Fit the 1/(1 + a d^(2b)) low-dimensional similarity curve to the
    desired (spread, min_dist) falloff — gradient-descent least squares (the
    reference relies on defaults; scipy-free)."""
    x = np.linspace(0, spread * 3, 300)
    y = np.where(x < min_dist, 1.0, np.exp(-(x - min_dist) / spread))
    a, b = 1.0, 1.0
    lr = 0.05
    for _ in range(steps):
        f = 1.0 / (1.0 + a * x ** (2 * b))
        err = f - y
        # gradients wrt a, b
        common = -err * (f ** 2)
        ga = np.sum(common * x ** (2 * b))
        with np.errstate(divide="ignore", invalid="ignore"):
            glogx = np.where(x > 0, np.log(x), 0.0)
        gb = np.sum(common * a * x ** (2 * b) * 2 * glogx)
        a -= lr * ga / len(x)
        b -= lr * gb / len(x)
        a = max(a, 1e-3)
        b = max(b, 1e-3)
    return float(a), float(b)


def umap_custom_knn(knn_idx: np.ndarray, knn_dists: np.ndarray, *,
                    dim: int = 2, epochs: int = 300,
                    negative_samples: int = 5, learning_rate: float = 0.5,
                    repulsion_strength: float = 0.7,
                    spread: float = 1.0, min_dist: float = 0.1,
                    key=None, init: Optional[np.ndarray] = None) -> np.ndarray:
    """UMAP layout from a precomputed kNN graph (reference umapCustomKnn,
    umap.scala:420)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n, k = knn_idx.shape
    weights = smooth_knn_weights(knn_dists)
    rows = np.repeat(np.arange(n), k)
    cols = np.asarray(knn_idx).reshape(-1)
    ww = weights.reshape(-1)
    keep = rows != cols
    rows, cols, ww = _symmetrize(rows[keep], cols[keep], ww[keep], n)

    a, b = find_ab_params(spread, min_dist)

    if init is None:
        ikey, key = jax.random.split(key)
        emb = jax.random.normal(ikey, (n, dim), jnp.float32) * 0.1
    else:
        emb = jnp.asarray(init, jnp.float32)

    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    ww_j = jnp.asarray(ww, jnp.float32)

    opt = AdamW(learning_rate=learning_rate, weight_decay=0.0)
    params = {"emb": emb}
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            e = p["emb"]
            # attractive term over positive edges
            d2 = jnp.sum(jnp.square(e[rows_j] - e[cols_j]), axis=1)
            attract = ww_j * jnp.log1p(a * d2 ** b)
            # repulsive term over negative samples
            nkey = key
            negs = jax.random.randint(
                nkey, (rows_j.shape[0], negative_samples), 0, n
            )
            dneg = jnp.sum(
                jnp.square(e[rows_j][:, None, :] - e[negs]), axis=-1
            )
            repel = jnp.sum(
                jnp.log1p(1.0 / (1e-3 + a * jnp.maximum(dneg, 1e-6) ** b)),
                axis=1,
            )
            # balance: each edge contributes one attraction but
            # ``negative_samples`` repulsions; scale attraction to match
            # (and damp repulsion by the UMAP repulsion_strength/gamma knob)
            return (negative_samples * jnp.mean(attract)
                    + repulsion_strength * jnp.mean(repel))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    for i in range(epochs):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
    return np.asarray(params["emb"])


def umap(data: np.ndarray, *, k: int = 15, dim: int = 2, epochs: int = 300,
         negative_samples: int = 5, learning_rate: float = 0.5,
         repulsion_strength: float = 0.7,
         spread: float = 1.0, min_dist: float = 0.1, key=None) -> np.ndarray:
    """Full UMAP: kNN on TPU + fuzzy weights + stochastic layout
    (reference umap, umap.scala:355)."""
    data = np.asarray(data, np.float32)
    idx = np.asarray(knn_search(data, data, k + 1))
    # drop self column
    self_col = idx[:, 0] == np.arange(len(data))
    idx = np.where(self_col[:, None], np.roll(idx, -1, axis=1), idx)[:, :k]
    d = np.sqrt(np.maximum(np.asarray(
        squared_euclidean_distance(jnp.asarray(data), jnp.asarray(data))
    ), 0.0)) if len(data) <= 4096 else None
    if d is not None:
        dists = np.take_along_axis(d, idx, axis=1)
    else:
        dists = np.stack([
            np.linalg.norm(data[i] - data[idx[i]], axis=1)
            for i in range(len(data))
        ])
    return umap_custom_knn(
        idx, dists, dim=dim, epochs=epochs,
        negative_samples=negative_samples, learning_rate=learning_rate,
        repulsion_strength=repulsion_strength,
        spread=spread, min_dist=min_dist, key=key,
    )
