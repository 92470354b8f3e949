"""Extremely randomized trees (extra-trees) — classification and regression.

Capability parity with the reference's pure-JVM extratrees module
(extratrees/src/main/scala/lamp/extratrees: tree ADTs extratrees.scala:1-60,
``buildForestClassification``/``buildForestRegression`` forest/package.scala
:611,704, prediction :513-577, upickle JSON serialization): Geurts-style
extra-trees with per-node uniform-random thresholds over K random features,
gini (classification) / variance (regression) split scoring, parallel tree
building, JSON persistence.

This is a CPU tree algorithm, not a tensor workload (the reference keeps it
off the GPU too) — implemented in vectorized NumPy with threads across trees
(NumPy releases the GIL in the hot reductions).
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from typing import List, NamedTuple, Optional

import numpy as np

__all__ = [
    "build_forest_classification",
    "build_forest_regression",
    "predict_classification",
    "predict_regression",
    "save_forest",
    "load_forest",
]


class _Tree(NamedTuple):
    feature: np.ndarray       # [nodes] int, -1 for leaf
    threshold: np.ndarray     # [nodes] float
    left: np.ndarray          # [nodes] int
    right: np.ndarray         # [nodes] int
    value: np.ndarray         # [nodes, C] class distribution or [nodes, 1] mean
    missing_less: np.ndarray  # [nodes] bool: NaN routes left at this node


def _gini(counts):
    total = counts.sum()
    if total == 0:
        return 0.0
    p = counts / total
    return 1.0 - np.sum(p * p)


def _build_tree(x, y, *, num_classes, k, min_leaf, rng, classification,
                max_depth):
    feature: List[int] = []
    threshold: List[float] = []
    left: List[int] = []
    right: List[int] = []
    value: List[np.ndarray] = []
    missing_less: List[bool] = []

    def leaf_value(idx):
        if classification:
            counts = np.bincount(y[idx], minlength=num_classes).astype(np.float64)
            return counts / max(counts.sum(), 1.0)
        return np.asarray([y[idx].mean()], np.float64)

    def new_node():
        feature.append(-1)
        threshold.append(0.0)
        left.append(-1)
        right.append(-1)
        value.append(None)
        missing_less.append(False)
        return len(feature) - 1

    def grow(node, idx, depth):
        """Split ``node`` (already allocated) or make it a leaf; returns
        [(child_node, child_idx, child_depth), ...] work items. Driven by an
        explicit stack below — recursion would blow Python's frame limit on
        the deep chains uniform-random thresholds can produce."""
        ys = y[idx]
        pure = (
            (classification and len(np.unique(ys)) == 1)
            or (not classification and np.var(ys) < 1e-24)
        )
        if len(idx) < max(2 * min_leaf, 2) or pure or depth >= max_depth:
            value[node] = leaf_value(idx)
            return []

        feats = rng.choice(x.shape[1], size=min(k, x.shape[1]), replace=False)
        best = None  # (score, feat, thr, mask, missing_is_less)
        for f in feats:
            col = x[idx, f]
            # NaN-aware min/max scan + both-ways missing routing, per the
            # reference's minmax/lessThanCutpoint/missingIsLess machinery
            # (forest/package.scala:13-97): NaN is excluded from the value
            # range; when present, the split is scored with NaN routed left
            # AND routed right, and the node records the winning direction.
            nan = np.isnan(col)
            has_missing = bool(nan.any())
            finite = col[~nan] if has_missing else col
            if finite.size:
                lo, hi = finite.min(), finite.max()
            else:
                lo = hi = 0.0
            if hi <= lo and not has_missing:
                continue
            if hi > lo:
                thr = rng.uniform(lo, hi)
                base = col <= thr  # NaN <= thr is False: missing right
            else:
                # constant finite values + missing: only the NaN/non-NaN
                # separation is informative
                thr = lo
                base = np.zeros(len(col), bool)
            routings = [(base, False)]
            if has_missing:
                routings.append((base | nan, True))
            for mask, mil in routings:
                nl = int(mask.sum())
                nr = len(idx) - nl
                if nl < min_leaf or nr < min_leaf:
                    continue
                if classification:
                    cl = np.bincount(ys[mask], minlength=num_classes)
                    cr = np.bincount(ys[~mask], minlength=num_classes)
                    score = (nl * _gini(cl) + nr * _gini(cr)) / len(idx)
                else:
                    score = (nl * np.var(ys[mask])
                             + nr * np.var(ys[~mask])) / len(idx)
                if best is None or score < best[0]:
                    best = (score, f, thr, mask, mil)
        if best is None:
            value[node] = leaf_value(idx)
            return []
        _, f, thr, mask, mil = best
        feature[node] = int(f)
        threshold[node] = float(thr)
        missing_less[node] = bool(mil)
        li = new_node()
        ri = new_node()
        left[node] = li
        right[node] = ri
        value[node] = np.zeros(
            num_classes if classification else 1, np.float64
        )
        # right pushed first so the left child pops first — preserves the
        # recursive version's left-first DFS rng consumption order
        return [(ri, idx[~mask], depth + 1), (li, idx[mask], depth + 1)]

    stack = [(new_node(), np.arange(x.shape[0]), 0)]
    while stack:
        node, idx, depth = stack.pop()
        stack.extend(grow(node, idx, depth))
    c = num_classes if classification else 1
    return _Tree(
        np.asarray(feature, np.int32),
        np.asarray(threshold, np.float64),
        np.asarray(left, np.int32),
        np.asarray(right, np.int32),
        np.stack([
            v if v is not None else np.zeros(c, np.float64) for v in value
        ]),
        np.asarray(missing_less, bool),
    )


def _build_forest(x, y, *, n_trees, num_classes, k, min_leaf, seed,
                  classification, n_jobs, max_depth, bootstrap):
    x = np.asarray(x, np.float64)
    y = (
        np.asarray(y, np.int64) if classification
        else np.asarray(y, np.float64)
    )
    root = np.random.SeedSequence(seed)
    rngs = [np.random.default_rng(s) for s in root.spawn(n_trees)]

    def one(rng):
        if bootstrap:
            sel = rng.choice(len(x), len(x), replace=True)
            xs, ys = x[sel], y[sel]
        else:
            xs, ys = x, y
        return _build_tree(
            xs, ys, num_classes=num_classes, k=k, min_leaf=min_leaf, rng=rng,
            classification=classification, max_depth=max_depth,
        )

    if n_jobs > 1:
        with ThreadPoolExecutor(max_workers=n_jobs) as ex:
            return list(ex.map(one, rngs))
    return [one(rng) for rng in rngs]


def build_forest_classification(x, y, num_classes: int, *, n_trees: int = 100,
                                k: Optional[int] = None, min_leaf: int = 2,
                                seed: int = 0, n_jobs: int = 1,
                                max_depth: int = 1 << 30,
                                bootstrap: bool = False):
    """Reference: buildForestClassification (forest/package.scala:611)."""
    k = k if k is not None else max(1, int(np.sqrt(np.asarray(x).shape[1])))
    trees = _build_forest(
        x, y, n_trees=n_trees, num_classes=num_classes, k=k, min_leaf=min_leaf,
        seed=seed, classification=True, n_jobs=n_jobs, max_depth=max_depth,
        bootstrap=bootstrap,
    )
    return {"trees": trees, "num_classes": num_classes, "type": "classification"}


def build_forest_regression(x, y, *, n_trees: int = 100,
                            k: Optional[int] = None, min_leaf: int = 2,
                            seed: int = 0, n_jobs: int = 1,
                            max_depth: int = 1 << 30,
                            bootstrap: bool = False):
    """Reference: buildForestRegression (forest/package.scala:704)."""
    k = k if k is not None else max(1, np.asarray(x).shape[1])
    trees = _build_forest(
        x, y, n_trees=n_trees, num_classes=1, k=k, min_leaf=min_leaf,
        seed=seed, classification=False, n_jobs=n_jobs, max_depth=max_depth,
        bootstrap=bootstrap,
    )
    return {"trees": trees, "num_classes": 1, "type": "regression"}


def _tree_apply(tree: _Tree, x):
    """Vectorized traversal: iterate depth levels, routing all rows at once."""
    n = x.shape[0]
    node = np.zeros(n, np.int32)
    while True:
        f = tree.feature[node]
        interior = f >= 0
        if not interior.any():
            break
        thr = tree.threshold[node]
        val = x[np.arange(n), np.maximum(f, 0)]
        # NaN routes left iff the node's missing_is_less flag is set
        # (reference predictClassification traversal, package.scala:517-534)
        go_left = np.where(
            interior,
            (val <= thr) | (tree.missing_less[node] & np.isnan(val)),
            False,
        )
        nxt = np.where(go_left, tree.left[node], tree.right[node])
        node = np.where(interior, nxt, node).astype(np.int32)
    return tree.value[node]


def predict_classification(forest, x) -> np.ndarray:
    """Mean class distribution over trees (reference predict :513-545).
    Routes through the C++ traversal when available."""
    x = np.asarray(x, np.float64)
    try:
        from ..native import native_forest_predict

        out = native_forest_predict(forest, x)
        if out is not None:
            return out
    except Exception:
        pass
    acc = np.zeros((x.shape[0], forest["num_classes"]), np.float64)
    for t in forest["trees"]:
        acc += _tree_apply(t, x)
    return acc / len(forest["trees"])


def predict_regression(forest, x) -> np.ndarray:
    x = np.asarray(x, np.float64)
    try:
        from ..native import native_forest_predict

        out = native_forest_predict(forest, x)
        if out is not None:
            return out[:, 0]
    except Exception:
        pass
    acc = np.zeros((x.shape[0],), np.float64)
    for t in forest["trees"]:
        acc += _tree_apply(t, x)[:, 0]
    return acc / len(forest["trees"])


def save_forest(path: str, forest) -> None:
    """JSON persistence (the upickle analogue)."""
    doc = {
        "type": forest["type"],
        "num_classes": forest["num_classes"],
        "trees": [
            {
                "feature": t.feature.tolist(),
                "threshold": t.threshold.tolist(),
                "left": t.left.tolist(),
                "right": t.right.tolist(),
                "value": t.value.tolist(),
                "missing_less": t.missing_less.astype(int).tolist(),
            }
            for t in forest["trees"]
        ],
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def load_forest(path: str):
    with open(path) as f:
        doc = json.load(f)
    trees = [
        _Tree(
            np.asarray(t["feature"], np.int32),
            np.asarray(t["threshold"], np.float64),
            np.asarray(t["left"], np.int32),
            np.asarray(t["right"], np.int32),
            np.asarray(t["value"], np.float64),
            np.asarray(t.get("missing_less", [0] * len(t["feature"])), bool),
        )
        for t in doc["trees"]
    ]
    return {"trees": trees, "num_classes": doc["num_classes"],
            "type": doc["type"]}
