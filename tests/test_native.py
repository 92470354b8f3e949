"""Native (C++) component tests: parity with the Python implementations."""

import numpy as np
import pytest

from lamp_tpu import data, sidecars
from lamp_tpu.native import NativeBpe, get_lib


def test_native_library_builds():
    assert get_lib() is not None, "g++ build of lamp_native.cpp failed"


def test_native_bpe_matches_python():
    corpus = b"the quick brown fox jumps over the lazy dog " * 10
    enc = data.train_bpe(corpus, 0, 100, 4)
    py = data.bpe_encode(corpus, enc, unknown_token=99)
    nat = NativeBpe(enc).encode(corpus, 99)
    np.testing.assert_array_equal(py, nat)


def test_native_bpe_unknown():
    enc = data.train_bpe(b"abcabc", 0, 50, 3)
    nat = NativeBpe(enc).encode(b"abcX", 49)
    py = data.bpe_encode(b"abcX", enc, unknown_token=49)
    np.testing.assert_array_equal(py, nat)


def test_native_forest_matches_python():
    rng = np.random.RandomState(0)
    x = rng.randn(200, 5)
    y = (x[:, 0] + x[:, 1] > 0).astype(np.int64)
    forest = sidecars.build_forest_classification(
        x, y, num_classes=2, n_trees=10, seed=0
    )
    from lamp_tpu.native import native_forest_predict
    from lamp_tpu.sidecars.extratrees import _tree_apply

    nat = native_forest_predict(forest, x)
    acc = np.zeros((x.shape[0], 2))
    for t in forest["trees"]:
        acc += _tree_apply(t, x)
    py = acc / len(forest["trees"])
    np.testing.assert_allclose(nat, py, atol=1e-12)


def test_native_bpe_speed():
    """The native encoder must beat the Python loop comfortably."""
    import time

    corpus = (b"the quick brown fox jumps over the lazy dog " * 2000)
    enc = data.train_bpe(corpus[:2000], 0, 200, 4)
    nat = NativeBpe(enc)
    t0 = time.perf_counter()
    nat.encode(corpus, 199)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    data.bpe_encode(corpus, enc, unknown_token=199)
    t_py = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)


def test_native_ngram_counts_matches_python():
    from collections import Counter

    from lamp_tpu.native import native_ngram_counts

    corpus = b"abcabcabx"
    native = native_ngram_counts(corpus, 3)
    py = Counter()
    for i in range(len(corpus)):
        for j in range(i + 1, min(i + 3, len(corpus)) + 1):
            py[corpus[i:j]] += 1
    assert native == dict(py)


def test_bpe_train_large_corpus_speed():
    """Training on a ~1MB corpus must complete quickly via the C++ counter."""
    import time

    corpus = (b"the quick brown fox jumps over the lazy dog " * 25000)
    t0 = time.perf_counter()
    enc = data.train_bpe(corpus, 0, 500, 4)
    dt = time.perf_counter() - t0
    assert len(enc) > 50
    assert dt < 30, dt
