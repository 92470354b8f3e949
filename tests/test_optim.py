"""Optimizer unit tests.

Mirrors the reference's optimizer trajectory tests
(lamp-core/src/test/scala/lamp/nn/{adamw,sgd,shampoo}.test.scala): steps are
compared against hand-computed expectations, plus convergence checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu import nn, optim


def _quadratic_convergence(opt, steps=300, tol=1e-2):
    """All optimizers must minimize a simple convex quadratic."""
    params = {"w": jnp.array([3.0, -2.0, 1.5])}

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]))

    state = opt.init(params)
    for _ in range(steps):
        g = jax.grad(loss_fn)(params)
        params, state = opt.step(params, g, state)
    assert float(loss_fn(params)) < tol, float(loss_fn(params))


def test_sgdw_converges():
    _quadratic_convergence(optim.SGDW(learning_rate=0.1))


def test_sgdw_momentum_converges():
    _quadratic_convergence(optim.SGDW(learning_rate=0.05, momentum=0.9))


def test_adamw_converges():
    _quadratic_convergence(optim.AdamW(learning_rate=0.1))


def test_radam_converges():
    _quadratic_convergence(optim.RAdam(learning_rate=0.1))


def test_yogi_converges():
    _quadratic_convergence(optim.Yogi(learning_rate=0.1))


def test_lamb_converges():
    _quadratic_convergence(optim.Lamb(learning_rate=0.05))


def test_lion_converges():
    _quadratic_convergence(optim.Lion(learning_rate=0.02), steps=400)


def test_adafactor_converges():
    # fixed LR mode on a vector param (full second moment path)
    _quadratic_convergence(optim.Adafactor(learning_rate=0.1), steps=400)


def test_lion_first_step_matches_hand_computed():
    """Step 1 from zero momentum: update = sign((1-b1)·g); m1 = (1-b2)·g."""
    params = {"w": jnp.array([1.0, -2.0, 0.5])}
    g = {"w": jnp.array([0.5, -0.1, 0.0])}
    lr, wd = 0.1, 0.1
    opt = optim.Lion(learning_rate=lr, beta1=0.9, beta2=0.99,
                     weight_decay=wd)
    state = opt.init(params)
    new_params, state = opt.step(params, g, state)
    w = np.array([1.0, -2.0, 0.5])
    expect = w - lr * (np.sign(0.1 * np.array([0.5, -0.1, 0.0])) + wd * w)
    np.testing.assert_allclose(np.asarray(new_params["w"]), expect, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state["mt"]["w"]), 0.01 * np.array([0.5, -0.1, 0.0]),
        atol=1e-7,
    )


def test_adafactor_factored_state_shapes():
    """Matrices get O(n+m) factored second moments; vectors a full one."""
    params = {"w": jnp.zeros((6, 4)), "b": jnp.zeros((4,))}
    opt = optim.Adafactor()
    state = opt.init(params)
    assert state["vr"]["w"].shape == (6,)
    assert state["vc"]["w"].shape == (4,)
    assert state["v"]["w"] is None
    assert state["vr"]["b"] is None
    assert state["v"]["b"].shape == (4,)


def test_adafactor_trains_linear_regression():
    """Relative-step mode (learning_rate=None) fits a small least squares
    problem through matrix (factored) and bias (full) params."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 5).astype(np.float32))
    w_true = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    y = x @ w_true + 0.3
    # NOT zero-init: Adafactor's relative step is proportional to RMS(p),
    # so all-zero params would move at the eps2 floor only
    params = {
        "w": jnp.asarray(rng.randn(5, 3).astype(np.float32)) * 0.5,
        "b": jnp.asarray(rng.randn(3).astype(np.float32)) * 0.5,
    }

    def loss_fn(p):
        return jnp.mean(jnp.square(x @ p["w"] + p["b"] - y))

    opt = optim.Adafactor(beta1=0.9)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    for _ in range(600):
        g = jax.grad(loss_fn)(params)
        params, state = opt.step(params, g, state)
    assert float(loss_fn(params)) < 0.05 * l0, float(loss_fn(params))


def test_shampoo_converges():
    _quadratic_convergence(optim.Shampoo(learning_rate=0.1), steps=400)


def test_shampoo_refreshes_every_step():
    """update_preconditioner_every=1 must actually refresh the roots (a
    ``t % 1 == 1`` bug made it never fire)."""
    import jax.numpy as jnp

    opt = optim.Shampoo(learning_rate=0.1, update_preconditioner_every=1)
    p = {"w": jnp.asarray([[1.0, 0.5], [0.2, 2.0]])}
    g = {"w": jnp.asarray([[0.3, -0.1], [0.7, 0.4]])}
    st = opt.init(p)
    p1, st = opt.step(p, g, st)
    linv_after_1 = np.asarray(st["stats"]["w"]["Linv"])
    assert not np.allclose(linv_after_1, np.eye(2)), (
        "preconditioner roots never left their identity init"
    )


def test_adamw_first_step_matches_hand_computed():
    """First AdamW step: update = lr * m_hat / (sqrt(v_hat) + eps) + lr*wd*p."""
    lr, wd, b1, b2, eps = 0.1, 0.01, 0.9, 0.999, 1e-8
    p = {"w": jnp.array([1.0, 2.0])}
    g = {"w": jnp.array([0.5, -0.5])}
    opt = optim.AdamW(lr, beta1=b1, beta2=b2, eps=eps, weight_decay=wd)
    state = opt.init(p)
    newp, _ = opt.step(p, g, state)
    m = (1 - b1) * np.array([0.5, -0.5])
    v = (1 - b2) * np.array([0.25, 0.25])
    m_hat = m / (1 - b1)
    v_hat = v / (1 - b2)
    expected = (
        np.array([1.0, 2.0])
        - lr * m_hat / (np.sqrt(v_hat) + eps)
        - lr * wd * np.array([1.0, 2.0])
    )
    np.testing.assert_allclose(np.asarray(newp["w"]), expected, rtol=1e-6)


def test_sgdw_first_step_matches_hand_computed():
    lr, wd = 0.1, 0.01
    p = {"w": jnp.array([1.0, -2.0])}
    g = {"w": jnp.array([0.3, 0.7])}
    opt = optim.SGDW(lr, weight_decay=wd)
    state = opt.init(p)
    newp, _ = opt.step(p, g, state)
    expected = np.array([1.0, -2.0]) - lr * (
        np.array([0.3, 0.7]) + wd * np.array([1.0, -2.0])
    )
    np.testing.assert_allclose(np.asarray(newp["w"]), expected, rtol=1e-6)


def test_adamw_mixed_precision_master_weights():
    """bf16 params keep f32 masters: many tiny updates must accumulate
    (they would be lost to bf16 rounding without the master copy).
    Reference behavior: AdamW.scala:47-63."""
    p = {"w": jnp.ones((4,), jnp.bfloat16)}
    opt = optim.AdamW(learning_rate=1e-4, mixed_precision=True)
    state = opt.init(p)
    g = {"w": jnp.full((4,), 1e-3, jnp.bfloat16)}
    for _ in range(50):
        p, state = opt.step(p, g, state)
    master = np.asarray(state["master"]["w"], dtype=np.float64)
    assert state["master"]["w"].dtype == jnp.float32
    assert np.all(master < 1.0)
    assert p["w"].dtype == jnp.bfloat16


def test_per_tag_weight_decay():
    """Weight decay applies to tagged leaves only (reference
    DependentHyperparameter, train.scala:55-62)."""
    key = jax.random.PRNGKey(0)
    m = nn.Linear.init(3, 3, key=key)
    params, rest = nn.partition_params(m)
    tags = nn.param_tags(params)
    opt = optim.SGDW(
        learning_rate=0.1,
        weight_decay={"Linear.weight": 0.5, "default": 0.0},
        tags=tags,
    )
    state = opt.init(params)
    zero_g = jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.zeros_like(x),
        params, is_leaf=lambda x: x is None,
    )
    newp, _ = opt.step(params, zero_g, state)
    # weight decayed, bias untouched
    assert np.all(np.abs(np.asarray(newp.weight)) < np.abs(np.asarray(m.weight)))
    np.testing.assert_array_equal(np.asarray(newp.bias), np.asarray(m.bias))


def test_clip_by_global_norm():
    g = {"a": jnp.array([3.0, 4.0]), "b": jnp.zeros(2)}
    clipped, norm = optim.clip_by_global_norm(g, 1.0)
    assert abs(float(norm) - 5.0) < 1e-6
    cn = float(optim.global_norm(clipped))
    assert abs(cn - 1.0) < 1e-5


def test_schedules():
    s = optim.schedules.step_after(5, 0.1)
    assert s(None, 0, None)[1] == 1.0
    assert s(None, 7, None)[1] == 0.1

    lin = optim.schedules.linear(1.0, 0.0, 10)
    assert abs(lin(None, 5, None)[1] - 0.5) < 1e-9

    cos = optim.schedules.cosine_with_warmup(10, 100)
    assert cos(None, 0, None)[1] == pytest.approx(0.1)
    assert cos(None, 9, None)[1] == pytest.approx(1.0)
    assert cos(None, 100, None)[1] == pytest.approx(0.1)


def test_reduce_lr_on_plateau():
    s = optim.schedules.reduce_lr_on_plateau(factor=0.5, patience=2)
    state = dict(s.init_state)
    # improving: factor stays 1
    for v in [1.0, 0.9, 0.8]:
        state, f = s(state, 0, v)
        assert f == 1.0
    # plateau: after patience+1 bad epochs factor halves
    for v in [0.8, 0.8, 0.8]:
        state, f = s(state, 0, v)
    assert f == 0.5
    # state round-trips through plain dict (JSON-serializable)
    import json

    json.dumps(state)


def test_muon_converges():
    # vector params take the embedded AdamW path
    _quadratic_convergence(optim.Muon(learning_rate=0.05, adam_lr=0.1))


def test_muon_newton_schulz_orthogonalizes():
    """NS output ~ UV^T of the SVD: singular values in ~[0.68, 1.13] (the
    official quintic coefficients' fixed band), direction matched."""
    from lamp_tpu.optim.optimizers import newton_schulz_orthogonalize

    for shape, seed in [((64, 256), 0), ((256, 64), 1), ((48, 48), 2)]:
        g = jax.random.normal(jax.random.PRNGKey(seed), shape)
        o = newton_schulz_orthogonalize(g)
        sv = jnp.linalg.svd(o, compute_uv=False)
        # random square matrices can have a near-zero smallest singular
        # value, which NS lifts only slowly — allow it a wider floor
        assert 0.3 < float(sv.min()) and float(sv.max()) < 1.5, shape
        u, s, vt = jnp.linalg.svd(g, full_matrices=False)
        uvt = u @ vt
        cos = jnp.sum(o * uvt) / (jnp.linalg.norm(o) * jnp.linalg.norm(uvt))
        assert float(cos) > 0.97, (shape, float(cos))


def test_muon_trains_mlp():
    """Muon on the matrices + embedded AdamW on the biases overfits a tiny
    regression, jitted end to end."""
    model = nn.MLP(8, 16, 1, key=jax.random.PRNGKey(2))
    params, static = nn.partition_params(model)
    X = jax.random.normal(jax.random.PRNGKey(3), (64, 8))
    yt = jnp.sin(X.sum(1, keepdims=True))
    opt = optim.Muon(0.05, adam_lr=1e-2)
    state = opt.init(params)

    def loss_fn(p):
        y, _ = nn.combine(p, static).forward(X)
        return jnp.mean((y - yt) ** 2)

    @jax.jit
    def step(p, st):
        l, g = jax.value_and_grad(loss_fn)(p)
        p2, st2 = opt.step(p, g, st)
        return p2, st2, l

    l0 = float(loss_fn(params))
    for _ in range(150):
        params, state, l = step(params, state)
    assert float(l) < 0.1 * l0
    # structure preserved (tuples in the params tree must not be unpacked)
    import jax.tree_util as tu

    assert tu.tree_structure(params) == tu.tree_structure(
        nn.partition_params(model)[0])


def test_muon_adam_tags_route_to_adam():
    """Params whose tag matches adam_tags get the AdamW path (vt state
    allocated); by default 2D params are Muon'd (vt None)."""
    import jax.tree_util as tu

    params = {"emb": jnp.ones((8, 4)), "w": jnp.ones((4, 4)),
              "b": jnp.ones((4,))}
    tags = {"emb": "Embedding.weight", "w": "Linear.weight",
            "b": "Linear.bias"}
    opt = optim.Muon(0.05, adam_tags=("Embedding",), tags=tags)
    st = opt.init(params)
    assert st["vt"]["emb"] is not None     # routed to adam by tag
    assert st["vt"]["w"] is None           # muon
    assert st["vt"]["b"] is not None       # 1D -> adam
    p2, st2 = opt.step(params, tu.tree_map(jnp.ones_like, params), st)
    assert p2["w"].shape == (4, 4)


def test_schedule_free_adamw_converges():
    _quadratic_convergence(optim.ScheduleFreeAdamW(learning_rate=0.1))


def test_schedule_free_adamw_matches_numpy_reference():
    """Three steps against a plain-NumPy transcription of the update rule
    (Defazio et al. 2024; constant lr, no warmup)."""
    lr, b1, b2, eps, wd = 0.1, 0.9, 0.999, 1e-8, 0.01
    w0 = np.array([1.0, -2.0, 0.5], np.float64)

    def grad(y):
        return 2.0 * y  # loss = sum(y^2), evaluated at y = params

    # numpy reference
    z = w0.copy()
    x = w0.copy()
    v = np.zeros_like(w0)
    wsum = 0.0
    y = w0.copy()
    ys = []
    for t in range(1, 4):
        g = grad(y)
        v = b2 * v + (1 - b2) * g * g
        gamma = lr * np.sqrt(1 - b2 ** t)
        z = z - gamma * g / (np.sqrt(v) + eps) - gamma * wd * y
        weight = gamma ** 2
        wsum += weight
        c = weight / wsum
        x = (1 - c) * x + c * z
        y = (1 - b1) * z + b1 * x
        ys.append(y.copy())

    opt = optim.ScheduleFreeAdamW(learning_rate=lr, beta1=b1, beta2=b2,
                                  eps=eps, weight_decay=wd)
    params = {"w": jnp.asarray(w0, jnp.float32)}
    state = opt.init(params)
    for t in range(3):
        g = {"w": 2.0 * params["w"]}
        params, state = opt.step(params, g, state)
        np.testing.assert_allclose(np.asarray(params["w"]), ys[t],
                                   rtol=1e-5, atol=1e-6)
    ev = optim.ScheduleFreeAdamW.eval_params(params, state)
    np.testing.assert_allclose(np.asarray(ev["w"]), x, rtol=1e-5, atol=1e-6)


def test_schedule_free_adamw_eval_params_and_no_alias():
    opt = optim.ScheduleFreeAdamW(learning_rate=0.05, warmup_steps=5)
    params = {"w": jnp.array([4.0, -3.0])}
    state = opt.init(params)
    # z/x start as copies, not aliases, of the param buffer
    assert state["z"]["w"] is not params["w"]
    assert state["x"]["w"] is not params["w"]

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]))

    step = jax.jit(lambda p, s: opt.step(p, jax.grad(loss_fn)(p), s))
    for _ in range(400):
        params, state = step(params, state)
    ev = optim.ScheduleFreeAdamW.eval_params(params, state)
    # the Polyak average trails the fast iterate; 400 constant-lr steps
    # bring it well under the starting loss
    assert float(jnp.sum(jnp.square(ev["w"]))) < 1e-2
    assert float(loss_fn(params)) < 1e-2


def test_schedule_free_adamw_per_tag_weight_decay():
    """Tagged params get their own wd; bias tag with wd=0 stays unshrunk
    under zero gradients."""
    params = {"w": jnp.array([1.0]), "b": jnp.array([1.0])}
    tags = {"w": "weight", "b": "bias"}
    opt = optim.ScheduleFreeAdamW(
        learning_rate=0.1, weight_decay={"weight": 0.5, "bias": 0.0},
        tags=tags)
    state = opt.init(params)
    zg = {"w": jnp.zeros(1), "b": jnp.zeros(1)}
    for _ in range(3):
        params, state = opt.step(params, zg, state)
    assert float(params["b"][0]) == 1.0
    assert float(params["w"][0]) < 1.0
