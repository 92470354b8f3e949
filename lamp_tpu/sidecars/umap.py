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
from .knn import knn_search, knn_search_nn_descent, squared_euclidean_distance

__all__ = ["smooth_knn_weights", "find_ab_params", "spectral_init", "umap",
           "umap_custom_knn"]


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
    # iterate the UNION of directed edges and their mirrors: a one-way kNN
    # edge (r, c) must also produce (c, r) with the same symmetrized weight
    keys = set(m) | {(c, r) for (r, c) in m}
    for (r, c) in keys:
        w = m.get((r, c), 0.0)
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


def spectral_init(rows, cols, weights, n: int, dim: int, *,
                  max_dense: int = 4096) -> Optional[np.ndarray]:
    """Spectral embedding of the fuzzy graph as layout initialization: the
    ``dim`` eigenvectors of the symmetric normalized Laplacian with smallest
    nonzero eigenvalues (umap-learn's default init; the reference only has
    random init). Dense eigh (one TPU/LAPACK call) up to ``max_dense``
    points; returns None beyond that (caller falls back to random init)."""
    if n > max_dense:
        return None
    a = np.zeros((n, n), np.float32)
    a[np.asarray(rows), np.asarray(cols)] = np.asarray(weights, np.float32)
    a = np.maximum(a, a.T)
    deg = a.sum(axis=1)
    dmh = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    lsym = np.eye(n, dtype=np.float32) - (dmh[:, None] * a) * dmh[None, :]
    _, evecs = np.linalg.eigh(lsym.astype(np.float64))
    comp = evecs[:, 1:dim + 1].astype(np.float32)
    scale = 10.0 / max(np.abs(comp).max(), 1e-12)
    return comp * scale


def umap_custom_knn(knn_idx: np.ndarray, knn_dists: np.ndarray, *,
                    dim: int = 2, epochs: int = 300,
                    negative_samples: int = 5, learning_rate: float = 0.5,
                    repulsion_strength: float = 0.7,
                    spread: float = 1.0, min_dist: float = 0.1,
                    key=None, init="spectral") -> np.ndarray:
    """UMAP layout from a precomputed kNN graph (reference umapCustomKnn,
    umap.scala:420). ``init``: "spectral" (default; falls back to random
    beyond the dense-eigh size limit), "random", or an explicit [n, dim]
    array."""
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

    emb = None
    if init is None:  # old-signature compatibility: None -> random
        init = "random"
    if isinstance(init, str):
        if init == "spectral":
            emb = spectral_init(rows, cols, ww, n, dim)
            if emb is not None:
                ikey, key = jax.random.split(key)
                emb = jnp.asarray(emb) + jax.random.normal(
                    ikey, (n, dim), jnp.float32
                ) * 1e-3
        elif init != "random":
            raise ValueError(f"unknown init {init!r}")
    else:
        emb = jnp.asarray(init, jnp.float32)
    if emb is None:
        ikey, key = jax.random.split(key)
        emb = jax.random.normal(ikey, (n, dim), jnp.float32) * 0.1

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
         spread: float = 1.0, min_dist: float = 0.1, key=None,
         knn_method: str = "auto") -> np.ndarray:
    """Full UMAP: kNN on TPU + fuzzy weights + stochastic layout
    (reference umap, umap.scala:355). ``knn_method``: "brute" (exact,
    O(N²) distance matmul), "nn_descent" (approximate, O(N·k²) per sweep —
    the large-N path), or "auto" (brute up to 4096 points)."""
    data = np.asarray(data, np.float32)
    n = len(data)
    if knn_method == "auto":
        knn_method = "brute" if n <= 4096 else "nn_descent"
    if knn_method == "nn_descent":
        idx, d2 = knn_search_nn_descent(
            data, k, key=key if key is not None else jax.random.PRNGKey(0)
        )
        idx = np.asarray(idx)
        dists = np.sqrt(np.maximum(np.asarray(d2), 0.0))
    else:
        idx = np.asarray(knn_search(data, data, k + 1))
        # drop self column
        self_col = idx[:, 0] == np.arange(n)
        idx = np.where(self_col[:, None], np.roll(idx, -1, axis=1), idx)[:, :k]
        if n <= 4096:
            d = np.sqrt(np.maximum(np.asarray(
                squared_euclidean_distance(jnp.asarray(data), jnp.asarray(data))
            ), 0.0))
            dists = np.take_along_axis(d, idx, axis=1)
        else:
            dists = np.stack([
                np.linalg.norm(data[i] - data[idx[i]], axis=1)
                for i in range(n)
            ])
    return umap_custom_knn(
        idx, dists, dim=dim, epochs=epochs,
        negative_samples=negative_samples, learning_rate=learning_rate,
        repulsion_strength=repulsion_strength,
        spread=spread, min_dist=min_dist, key=key,
    )
