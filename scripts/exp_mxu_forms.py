#!/usr/bin/env python
"""Isolate the MXU cost of one decode-attention block at the bench shapes
(H=12 q heads, fused H_kv*D=256 lanes, bk=512 tokens) — KV resident in VMEM,
no DMA — for three dot formulations:

  A  head-major (current kernel): s = qe @ k^T [12, 512]; softmax over
     lanes; o = p @ v [12, 256]. KV passes the MXU as WEIGHTS.
  B  token-major: s^T = k @ qe^T [512, 12]; softmax over sublanes;
     o = p^T(0,0)-contracted with v. KV passes as ACTIVATIONS.
  C  group-of-8 big dot: [96, 256] @ [256, 4096] + diag use. Amortizes tile
     loads across 8 sequences (cross-seq blocks wasted).

Each form: a pallas kernel that fori_loops the block body 512 times with a
value dependency; wall time (RTT-corrected) / 512 = per-block cost. Numbers
calibrate the paged-attention redesign (docs/serving_headroom.md).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H, HKV, D, BK = 12, 4, 64, 512
FUSED = HKV * D
ITERS = 512


def measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda i: i + 1.0)
    float(f(jnp.float32(0)))
    ts = []
    for i in range(5):
        y = f(jnp.float32(i))
        t0 = time.perf_counter()
        float(y)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    def timed(name, kernel, inputs, out_shape):
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jfn = jax.jit(fn)
        out = jfn(*inputs)
        float(np.asarray(out).reshape(-1)[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*inputs)
            float(np.asarray(out).reshape(-1)[0])
            ts.append((time.perf_counter() - t0 - rtt) / ITERS)
        us = min(ts) * 1e6
        print(f"{name}: {us:7.3f} us/block", flush=True)
        return us

    qe = jax.random.normal(ks[0], (H, FUSED), jnp.bfloat16)
    k = jax.random.normal(ks[1], (BK, FUSED), jnp.bfloat16)
    v = jax.random.normal(ks[2], (BK, FUSED), jnp.bfloat16)

    # -- A: head-major (what the paged kernel does today)
    def kern_a(q_ref, k_ref, v_ref, o_ref):
        q0 = q_ref[...]
        kk = k_ref[...]
        vv = v_ref[...]

        def body(i, q_):
            s = jax.lax.dot_general(
                q_, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * 0.125
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vv,
                            preferred_element_type=jnp.float32)
            o = o / l
            return q0 + (o * 1e-30).astype(jnp.bfloat16)

        q_fin = jax.lax.fori_loop(0, ITERS, body, q0)
        o_ref[...] = q_fin.astype(jnp.float32)

    a_us = timed("A head-major ", kern_a, (qe, k, v), (H, FUSED))

    # -- B: token-major (KV as MXU activations)
    def kern_b(q_ref, k_ref, v_ref, o_ref):
        q0 = q_ref[...]
        kk = k_ref[...]
        vv = v_ref[...]

        def body(i, q_):
            st = jax.lax.dot_general(
                kk, q_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * 0.125  # [BK, H]
            m = jnp.max(st, axis=0, keepdims=True)
            p = jnp.exp(st - m)
            l = jnp.sum(p, axis=0, keepdims=True)            # [1, H]
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vv, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [H, FUSED]
            o = o / l.reshape(H, 1)
            return q0 + (o * 1e-30).astype(jnp.bfloat16)

        q_fin = jax.lax.fori_loop(0, ITERS, body, q0)
        o_ref[...] = q_fin.astype(jnp.float32)

    b_us = timed("B token-major", kern_b, (qe, k, v), (H, FUSED))

    # -- C: 8-seq grouped big dot (per-block cost divided by 8 at print)
    G = 8
    qa = jax.random.normal(ks[3], (G * H, FUSED), jnp.bfloat16)
    ka = jax.random.normal(ks[1], (G * BK, FUSED), jnp.bfloat16)
    va = jax.random.normal(ks[2], (G * BK, FUSED), jnp.bfloat16)

    def kern_c(q_ref, k_ref, v_ref, o_ref):
        q0 = q_ref[...]
        kk = k_ref[...]
        vv = v_ref[...]

        def body(i, q_):
            s = jax.lax.dot_general(
                q_, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * 0.125  # [G*H, G*BK]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vv,
                            preferred_element_type=jnp.float32)
            o = o / l
            return q0 + (o * 1e-30).astype(jnp.bfloat16)

        q_fin = jax.lax.fori_loop(0, ITERS, body, q0)
        o_ref[...] = q_fin.astype(jnp.float32)

    c_us = timed("C grouped dot", kern_c, (qa, ka, va), (G * H, FUSED))
    print(f"C per-seq: {c_us / G:7.3f} us", flush=True)

    kv_kb = 2 * BK * FUSED * 2 / 1024
    print(f"per-block KV = {kv_kb:.0f} KB; HBM-roofline equivalent "
          f"{kv_kb * 1024 / 819e9 * 1e6:.3f} us", flush=True)


if __name__ == "__main__":
    main()
