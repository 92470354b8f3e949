"""Sidecar tests: kNN, k-means, UMAP, extratrees.

Mirrors the reference's knn.test.scala, kmeans.test.scala, umap.test.scala
and extratree.test.scala (accuracy + round-trip assertions).
"""

import numpy as np
import pytest

from lamp_tpu import sidecars


def _blobs(n_per=50, centers=((0, 0), (5, 5), (0, 5)), seed=0, dim=2):
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for i, c in enumerate(centers):
        pt = np.asarray(c, np.float32)
        if dim > len(c):
            pt = np.concatenate([pt, np.zeros(dim - len(c), np.float32)])
        xs.append(pt + rng.randn(n_per, dim).astype(np.float32) * 0.5)
        ys.append(np.full(n_per, i))
    return np.concatenate(xs), np.concatenate(ys)


def test_knn_search_exact():
    x = np.asarray([[0.0], [1.0], [2.0], [10.0]], np.float32)
    idx = np.asarray(sidecars.knn_search(x, x, 2))
    assert idx[0, 0] == 0 and idx[0, 1] == 1
    assert idx[3, 0] == 3 and idx[3, 1] == 2


def test_knn_classification_and_regression():
    x, y = _blobs()
    pred = np.asarray(sidecars.knn_classification(x, y, x, 5, num_classes=3))
    assert (pred == y).mean() > 0.95
    yr = x[:, 0] * 2.0
    predr = np.asarray(sidecars.knn_regression(x, yr, x, 5))
    assert np.corrcoef(predr, yr)[0, 1] > 0.95


def test_jaccard_distance():
    a = np.asarray([[1, 1, 0, 0]], np.float32)
    b = np.asarray([[1, 0, 1, 0], [1, 1, 0, 0]], np.float32)
    d = np.asarray(sidecars.jaccard_distance(a, b))
    assert abs(d[0, 0] - (1 - 1 / 3)) < 1e-6
    assert abs(d[0, 1]) < 1e-6


def test_minibatch_kmeans_recovers_blobs():
    x, y = _blobs(n_per=100)
    res = sidecars.minibatch_kmeans(x, 3, iterations=50, batch_size=64)
    assert res.centers.shape == (3, 2)
    # each true cluster maps to a distinct kmeans cluster
    assign = np.asarray(res.assignment)
    maps = [np.bincount(assign[y == i], minlength=3).argmax() for i in range(3)]
    assert len(set(maps)) == 3
    # purity
    correct = sum(
        (assign[y == i] == maps[i]).sum() for i in range(3)
    )
    assert correct / len(y) > 0.95


def test_smooth_knn_weights():
    d = np.asarray([[0.1, 0.2, 0.5], [0.0, 1.0, 2.0]])
    w = sidecars.smooth_knn_weights(d)
    assert w.shape == d.shape
    # nearest neighbour always has weight 1 (d == rho)
    np.testing.assert_allclose(w[:, 0], 1.0, atol=1e-6)
    # weights decrease with distance
    assert (np.diff(w, axis=1) <= 1e-9).all()


def test_umap_separates_blobs():
    x, y = _blobs(n_per=40, dim=8, centers=((0,) * 8, (8,) * 8))
    emb = sidecars.umap(x, k=10, dim=2, epochs=300, key=None)
    assert emb.shape == (80, 2)
    c0 = emb[y == 0].mean(0)
    c1 = emb[y == 1].mean(0)
    spread = max(emb[y == 0].std(), emb[y == 1].std())
    # cluster centers separated relative to intra-cluster spread
    assert np.linalg.norm(c0 - c1) > 1.8 * spread


def test_nn_descent_recall():
    """NN-descent recovers (almost) the exact kNN graph on blob data."""
    x, _ = _blobs(n_per=120, dim=8, centers=((0,) * 8, (6,) * 8, (3,) * 8))
    k = 10
    exact = np.asarray(sidecars.knn_search(x, x, k + 1))[:, 1:]  # drop self
    approx, dists = sidecars.knn_search_nn_descent(x, k, n_iters=15)
    approx = np.asarray(approx)
    recall = np.mean([
        len(set(approx[i]) & set(exact[i])) / k for i in range(len(x))
    ])
    assert recall > 0.9, recall
    # distances ascending, self excluded
    d = np.asarray(dists)
    assert (np.diff(d, axis=1) >= -1e-5).all()
    assert not (approx == np.arange(len(x))[:, None]).any()


def test_nn_descent_low_k_recall():
    """Reverse-edge candidate sampling keeps recall high at very low k,
    where forward-only expansion starves (round-2 backlog item)."""
    x, _ = _blobs(n_per=150, dim=8, centers=((0,) * 8, (6,) * 8, (3,) * 8))
    k = 3
    exact = np.asarray(sidecars.knn_search(x, x, k + 1))[:, 1:]
    approx, _ = sidecars.knn_search_nn_descent(x, k, n_iters=10)
    approx = np.asarray(approx)
    recall = np.mean([
        len(set(approx[i]) & set(exact[i])) / k for i in range(len(x))
    ])
    assert recall > 0.85, recall


def test_spectral_init_separates_components():
    """Spectral init places two disconnected graph components apart."""
    # two 4-cliques, disjoint
    rows, cols, w = [], [], []
    for base in (0, 4):
        for i in range(4):
            for j in range(4):
                if i != j:
                    rows.append(base + i)
                    cols.append(base + j)
                    w.append(1.0)
    emb = sidecars.spectral_init(rows, cols, w, 8, 1)
    assert emb is not None and emb.shape == (8, 1)
    a, b = emb[:4, 0], emb[4:, 0]
    # components land on opposite sides
    assert (a.max() < b.min()) or (b.max() < a.min())


def test_umap_nn_descent_path():
    x, y = _blobs(n_per=40, dim=8, centers=((0,) * 8, (8,) * 8))
    emb = sidecars.umap(x, k=10, dim=2, epochs=200, knn_method="nn_descent")
    assert emb.shape == (80, 2)
    c0 = emb[y == 0].mean(0)
    c1 = emb[y == 1].mean(0)
    spread = max(emb[y == 0].std(), emb[y == 1].std())
    assert np.linalg.norm(c0 - c1) > 1.8 * spread


def test_find_ab_params():
    a, b = sidecars.find_ab_params(1.0, 0.1)
    # canonical values for these settings are a≈1.58, b≈0.90
    assert 1.2 < a < 2.0, a
    assert 0.7 < b < 1.1, b


def test_extratrees_classification():
    x, y = _blobs(n_per=100)
    forest = sidecars.build_forest_classification(
        x, y, num_classes=3, n_trees=20, seed=0
    )
    probs = sidecars.predict_classification(forest, x)
    assert probs.shape == (300, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-9)
    acc = (probs.argmax(1) == y).mean()
    assert acc > 0.95, acc


def test_extratrees_regression():
    rng = np.random.RandomState(0)
    x = rng.randn(300, 4)
    y = 3 * x[:, 0] - 2 * x[:, 1] + 0.1 * rng.randn(300)
    forest = sidecars.build_forest_regression(x, y, n_trees=30, seed=0)
    pred = sidecars.predict_regression(forest, x)
    assert np.corrcoef(pred, y)[0, 1] ** 2 > 0.85


def test_extratrees_generalization_split():
    """Train/test split sanity — not just memorization."""
    x, y = _blobs(n_per=150)
    rng = np.random.RandomState(1)
    order = rng.permutation(len(x))
    tr, te = order[:300], order[300:]
    forest = sidecars.build_forest_classification(
        x[tr], y[tr], num_classes=3, n_trees=20, seed=0, n_jobs=2
    )
    acc = (sidecars.predict_classification(forest, x[te]).argmax(1) == y[te]).mean()
    assert acc > 0.9, acc


def test_extratrees_nan_routing_exact():
    """NaN routes per the node's missing_less flag, both directions —
    reference forest/package.scala:13-97 (missingIsLess both-ways split)
    and the predict traversal (package.scala:517-534)."""
    from lamp_tpu.sidecars.extratrees import _Tree, _tree_apply

    def make(mil):
        return _Tree(
            feature=np.array([0, -1, -1], np.int32),
            threshold=np.array([0.5, 0.0, 0.0]),
            left=np.array([1, -1, -1], np.int32),
            right=np.array([2, -1, -1], np.int32),
            value=np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
            missing_less=np.array([mil, False, False]),
        )

    x = np.array([[0.2], [0.9], [np.nan]])
    np.testing.assert_allclose(
        _tree_apply(make(True), x), [[1, 0], [0, 1], [1, 0]]
    )
    np.testing.assert_allclose(
        _tree_apply(make(False), x), [[1, 0], [0, 1], [0, 1]]
    )
    # the native C++ traversal must agree with the Python one
    from lamp_tpu.native import native_forest_predict

    for mil in (True, False):
        forest = {"trees": [make(mil)], "num_classes": 2,
                  "type": "classification"}
        native = native_forest_predict(forest, x)
        if native is not None:
            np.testing.assert_allclose(native, _tree_apply(make(mil), x))


def test_extratrees_nan_informative_missingness():
    """Missingness itself carries the label: feature 0 is NaN iff y == 1,
    all other features noise. Solvable only by trying NaN on both split
    sides (reference missingIsLess machinery)."""
    rng = np.random.RandomState(0)
    n = 200
    y = rng.randint(0, 2, n)
    x = rng.randn(n, 3)
    x[y == 1, 0] = np.nan
    forest = sidecars.build_forest_classification(
        x, y, num_classes=2, n_trees=10, seed=0
    )
    probs = sidecars.predict_classification(forest, x)
    assert np.isfinite(probs).all()
    acc = (probs.argmax(1) == y).mean()
    assert acc > 0.95, acc


def test_extratrees_nan_holes_dont_corrupt():
    """10% NaN holes in blob data: accuracy degrades gracefully instead of
    splits silently corrupting (pre-fix, NaN poisoned the min/max scan)."""
    x, y = _blobs(n_per=100)
    rng = np.random.RandomState(2)
    holes = rng.rand(*x.shape) < 0.10
    x = x.copy()
    x[holes] = np.nan
    forest = sidecars.build_forest_classification(
        x, y, num_classes=3, n_trees=20, seed=0
    )
    probs = sidecars.predict_classification(forest, x)
    assert np.isfinite(probs).all()
    acc = (probs.argmax(1) == y).mean()
    assert acc > 0.9, acc


def test_extratrees_nan_serialization(tmp_path):
    """missing_less flags survive a save/load round trip."""
    rng = np.random.RandomState(0)
    x = rng.randn(80, 3)
    y = (rng.rand(80) < 0.5).astype(np.int64)
    x[y == 1, 0] = np.nan
    forest = sidecars.build_forest_classification(
        x, y, num_classes=2, n_trees=5, seed=0
    )
    p = str(tmp_path / "forest_nan.json")
    sidecars.save_forest(p, forest)
    loaded = sidecars.load_forest(p)
    np.testing.assert_allclose(
        sidecars.predict_classification(forest, x),
        sidecars.predict_classification(loaded, x),
    )


def test_extratrees_serialization(tmp_path):
    x, y = _blobs(n_per=30)
    forest = sidecars.build_forest_classification(
        x, y, num_classes=3, n_trees=5, seed=0
    )
    p = str(tmp_path / "forest.json")
    sidecars.save_forest(p, forest)
    loaded = sidecars.load_forest(p)
    np.testing.assert_allclose(
        sidecars.predict_classification(forest, x),
        sidecars.predict_classification(loaded, x),
    )
