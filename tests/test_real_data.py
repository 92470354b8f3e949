"""Integration tests on the reference's own bundled datasets.

The reference trains its loop-integration tests on real MNIST CSV
(lamp-core/src/test/resources/mnist_test.csv.gz, used by ioloop.test.scala,
mlp.test.scala, logistic.test.scala) and its char-LSTM text tests on the
Project Gutenberg Time Machine text (lamp-data/src/test/resources/35-0.txt,
textgeneration.test.scala). These tests run the same workloads through this
framework. Skipped when the reference checkout is absent.
"""

import gzip
import os

import numpy as np
import pytest

MNIST = "/root/reference/lamp-core/src/test/resources/mnist_test.csv.gz"
TIMEMACHINE = "/root/reference/lamp-data/src/test/resources/35-0.txt"


def _load_mnist():
    with gzip.open(MNIST, "rt") as f:
        header = f.readline()  # label,pix0,...
        del header
        rows = np.loadtxt(f, delimiter=",", dtype=np.float32)
    y = rows[:, 0].astype(np.int32)
    x = rows[:, 1:] / 255.0
    return x, y


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(MNIST), reason="reference data absent")
def test_real_mnist_mlp():
    """MLP on real MNIST reaches the reference integration tests' accuracy
    regime (ioloop.test.scala trains the same data to > 0.9)."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, nn, optim, train

    x, y = _load_mnist()
    xt, yt = x[8000:], y[8000:]
    x, y = x[:8000], y[:8000]

    model = nn.MLP(784, 64, 10, key=jax.random.PRNGKey(0), norm=False)

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        logits, nm = m.forward(xx, key=key, train=train_mode)
        return nn.losses.cross_entropy_loss(logits, yy), jnp.asarray(
            xx.shape[0], jnp.float32
        ), nm

    rng = np.random.default_rng(0)
    result = train.epochs(
        model=model, optimizer=optim.AdamW(1e-3), loss_fn=loss_fn,
        train_batches=lambda e: data.minibatches_from_full(256, x, y, rng=rng),
        epochs=8, key=jax.random.PRNGKey(1), prefetch=False,
    )
    final = result.state.model
    pred = np.asarray(jnp.argmax(final(jnp.asarray(xt)), -1))
    acc = (pred == yt).mean()
    assert acc > 0.9, acc


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(TIMEMACHINE),
                    reason="reference data absent")
def test_real_timemachine_charlm():
    """Char-LSTM on the real Time Machine text: loss clearly drops and
    greedy generation continues a prompt (textgeneration.test.scala)."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, nn, optim, train

    with open(TIMEMACHINE, encoding="utf-8") as f:
        text = f.read()[2000:60000].lower()
    corpus, vocab = data.chars_to_integers(text)
    v = len(vocab)

    seq = 64
    model = nn.Sequential.init(
        nn.Embedding.init(v, 32, key=jax.random.PRNGKey(0)),
        nn.LSTM.init(32, 128, key=jax.random.PRNGKey(1)),
        nn.Fun.init(lambda t: t[0] if isinstance(t, tuple) else t),
        nn.Linear.init(128, v, key=jax.random.PRNGKey(2)),
    )

    corpus = np.asarray(corpus, np.int32)
    n_seq = (len(corpus) - 1) // seq

    def batches(epoch):
        xs = corpus[:n_seq * seq].reshape(n_seq, seq)
        ys = corpus[1:n_seq * seq + 1].reshape(n_seq, seq)
        return data.minibatches_from_full(
            64, xs, ys, rng=np.random.default_rng(epoch)
        )

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        logits, nm = m.forward(xx, key=key, train=train_mode)
        return nn.losses.sequence_nll(logits, yy), jnp.asarray(
            xx.shape[0], jnp.float32
        ), nm

    result = train.epochs(
        model=model, optimizer=optim.AdamW(3e-3), loss_fn=loss_fn,
        train_batches=batches, epochs=4, key=jax.random.PRNGKey(3),
        prefetch=False,
    )
    first = result.learning_curve[0][1]
    last = result.learning_curve[-1][1]
    assert last < first * 0.75, (first, last)
    assert last < 2.6, last  # clearly below the uniform-vocab entropy
