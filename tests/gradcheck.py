"""Numeric differentiation gradient-check harness.

This is the rebuild of the reference's core test strategy: central-difference
numeric gradients compared against autodiff for every op and layer
(reference: lamp-core/src/test/scala/lamp/autograd/autograd.test.scala:71-120,
``diff``/``diffND``/``testGradientAndValue``). Against jax.grad this validates
our layer math and every custom_vjp / Pallas kernel backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def numeric_grad(f, x, eps=1e-6):
    """Central-difference gradient of scalar-valued f at x (single array)."""
    base = np.array(x, dtype=np.float64)
    g = np.zeros_like(base)
    for i in range(base.size):
        hi = base.copy().reshape(-1)
        lo = base.copy().reshape(-1)
        hi[i] += eps
        lo[i] -= eps
        fp = float(f(jnp.asarray(hi.reshape(base.shape))))
        fm = float(f(jnp.asarray(lo.reshape(base.shape))))
        g.reshape(-1)[i] = (fp - fm) / (2 * eps)
    return g


def check_grad(f, x, *, eps=1e-6, atol=1e-4, rtol=1e-4):
    """Assert autodiff gradient of scalar f matches central differences.

    Run in float64 (conftest enables x64) to match the reference's
    4-decimal-place tolerance.
    """
    x64 = jnp.asarray(np.array(x, dtype=np.float64))
    auto = np.asarray(jax.grad(f)(x64), dtype=np.float64)
    num = numeric_grad(f, x64, eps=eps)
    np.testing.assert_allclose(auto, num, atol=atol, rtol=rtol)
    return auto


def check_module_grads(build_loss, params, *, eps=1e-6, atol=1e-4, rtol=1e-4,
                       max_elems_per_leaf=None):
    """Check gradient of ``build_loss(params) -> scalar`` for every leaf.

    ``params`` is a pytree (possibly a Module); every floating leaf is
    perturbed element-wise. ``max_elems_per_leaf`` limits cost on big leaves
    (random subset of coordinates, seeded deterministically).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params, is_leaf=lambda x: x is None)

    def to64(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.float64)
        return x

    leaves64 = [to64(x) for x in leaves]
    params64 = treedef.unflatten(leaves64)

    jitted_loss = jax.jit(build_loss)

    auto_grads = jax.grad(
        lambda p: build_loss(p).astype(jnp.float64)
    )(params64)
    auto_leaves = treedef.flatten_up_to(auto_grads)

    rng = np.random.RandomState(0)
    for li, (leaf, ag) in enumerate(zip(leaves64, auto_leaves)):
        if leaf is None or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        base = np.array(leaf, dtype=np.float64)
        agn = np.asarray(ag, dtype=np.float64).reshape(-1)
        n = base.size
        idxs = (
            rng.choice(n, size=min(max_elems_per_leaf, n), replace=False)
            if max_elems_per_leaf
            else range(n)
        )

        def eval_at(vec):
            tree = treedef.unflatten(
                [jnp.asarray(vec.reshape(base.shape)) if j == li else l
                 for j, l in enumerate(leaves64)]
            )
            return float(jitted_loss(tree))

        for i in idxs:
            hi = base.copy().reshape(-1)
            lo = base.copy().reshape(-1)
            hi[i] += eps
            lo[i] -= eps
            num = (eval_at(hi) - eval_at(lo)) / (2 * eps)
            if not np.isclose(agn[i], num, atol=atol, rtol=rtol):
                raise AssertionError(
                    f"leaf {li} elem {i}: autodiff {agn[i]} vs numeric {num}"
                )
