#!/usr/bin/env python
"""Split the ctx-4096 flash cost into forward vs backward (the 47 ms
on-path attention bucket is 62% of the longctx step — before attempting
kernel work, size where it loses vs the ~130 TF/s D=64 shape cap).

Times, chained/donated, [2, 12, 4096, 64] bf16 causal:
  fwd only        : flash_attention forward
  f+b             : value_and_grad (fused dq+dk+dv backward kernel)
  fwd (recompute) : 2x forward — the bwd's internal recompute floor

Usage: python scripts/exp_flash_split.py   (real TPU, ~4 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

B, H, CTX, D = 2, 12, 4096, 64
N1, N2 = 8, 64  # fwd is ~0.5 ms/call: chain long enough to beat readback noise
PEAK_D64 = 130e12


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def diff_time(call, pairs=4):
    call(N1), call(N2)
    w1, w2 = [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        call(N1)
        t1 = time.perf_counter()
        call(N2)
        t2 = time.perf_counter()
        w1.append(t1 - t0)
        w2.append(t2 - t1)
    return (min(w2) - min(w1)) / (N2 - N1)


def time_chain(body, x0_fn, reps=4):
    import jax

    fns = {}
    state = {"c": x0_fn()}

    def call(n):
        if n not in fns:
            fns[n] = jax.jit(lambda c: jax.lax.scan(
                lambda cc, _: (body(cc), None), c, length=n)[0],
                donate_argnums=(0,))
        out = fns[n](state["c"])
        state["c"] = out
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

    return diff_time(call, pairs=reps)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu.ops.attention import flash_attention

    def init():
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, CTX, D),
                              jnp.bfloat16)
        return (q, q * 1.01, q * 0.99)

    def fwd_body(carry):
        q, k, v = carry
        o = flash_attention(q, k, v, causal=True, interpret=False)
        return (q + o * jnp.bfloat16(1e-3), k, v)

    def fb_body(carry):
        q, k, v = carry

        def loss(q, k, v):
            o = flash_attention(q, k, v, causal=True, interpret=False)
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return (q + dq.astype(q.dtype) * jnp.bfloat16(1e-3),
                k + dk.astype(k.dtype) * jnp.bfloat16(1e-3),
                v + dv.astype(v.dtype) * jnp.bfloat16(1e-3))

    fwd_us = with_retries(lambda: time_chain(fwd_body, init)) * 1e6
    fb_us = with_retries(lambda: time_chain(fb_body, init)) * 1e6
    bwd_us = fb_us - fwd_us
    # causal fwd matmul FLOPs: 2 matmuls * 2*ctx^2*d per bh, halved
    fwd_flops = 2 * 2 * B * H * CTX * CTX * D / 2
    bwd_flops = fwd_flops * 2.5  # 5 matmuls vs 2
    out = {
        "fwd_us": round(fwd_us, 1),
        "fb_us": round(fb_us, 1),
        "bwd_us": round(bwd_us, 1),
        "fwd_tf_s": round(fwd_flops / fwd_us / 1e6, 1),
        "bwd_tf_s": round(bwd_flops / bwd_us / 1e6, 1),
        "d64_cap_tf_s": 130.0,
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "exp_flash_split.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
