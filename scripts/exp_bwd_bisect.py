#!/usr/bin/env python
"""Bisect the flash fused-backward kernel's cost on the real chip.

Round 5 established (docs/lm_step_headroom.md): at ctx 4096 the flash
backward runs ~31 TF/s while the forward hits ~174, and the step IS the
kernel. Block sweeps don't move it and the dim0-contraction micro-bench
shows transposed dots cost only 1.2x — so the sink is inside the kernel
body. This strips the shipped `_bwd_fused_kernel` down piece by piece
(same grid/blocks/specs, fake-but-safe lse/di so exp() stays finite):

  full        : the shipped body (sanity: should match ~in-VJP cost)
  no_dqslab   : dq matmul + the [n_kv, bh, sq, d] HBM slab write removed
  no_dkv      : dv/dk accumulation matmuls + scratch removed
  no_vpu      : masking/exp/ds elementwise replaced by cheap scalings
                (matmuls kept) — bounds the VPU share
  sp_only     : only the s matmul + p recompute survive

Chained timing, interpreted deltas vs `full`.

Usage: python scripts/exp_bwd_bisect.py   (real TPU, ~8 min)
Writes scripts/exp_bwd_bisect.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

BH, S, D = 24, 4096, 64   # [B=2, H=12] flagship longctx shape
BQ, BK = 1024, 1024
N1, N2 = 8, 64
SM = 1.0 / 8.0


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    n_kv = S // BK
    n_q = S // BQ

    def make_kernel(variant):
        def kern(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                 dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr):
            ki = pl.program_id(1)
            qi = pl.program_id(2)

            @pl.when(qi == 0)
            def _init():
                dk_scr[...] = jnp.zeros_like(dk_scr)
                dv_scr[...] = jnp.zeros_like(dv_scr)

            if variant != "no_dqslab":
                dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])

            run = (qi + 1) * BQ > ki * BK  # causal block skip

            @pl.when(run)
            def _compute():
                q = q_ref[0]
                k = k_ref[0]
                v = v_ref[0]
                do = do_ref[0].astype(jnp.float32)
                lse = lse_ref[0]
                di = di_ref[0]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * SM
                if variant in ("full", "no_dqslab", "no_dkv", "sp_only"):
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 0) + qi * BQ
                    cols = jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 1) + ki * BK
                    valid = cols <= rows
                    s = jnp.where(valid, s, -1e30)
                    p = jnp.exp(s - lse[:, :1])
                else:  # no_vpu: keep dataflow, drop the elementwise stack
                    p = s * 1e-6
                if variant == "sp_only":
                    # consume p cheaply so nothing is DCE'd
                    dv_scr[...] += jnp.sum(
                        p, axis=0, keepdims=True
                    ).reshape(1, -1)[:, :D] * jnp.ones((BK, 1), jnp.float32)
                    return
                if variant != "no_dkv":
                    dv_scr[...] += jax.lax.dot_general(
                        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if variant == "no_vpu":
                    ds = (p + dp) * 1e-6
                else:
                    ds = p * (dp - di[:, :1]) * SM
                if variant != "no_dkv":
                    dk_scr[...] += jax.lax.dot_general(
                        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if variant != "no_dqslab":
                    dqp_ref[0, 0] = jax.lax.dot(
                        ds.astype(q.dtype), k,
                        preferred_element_type=jnp.float32
                    ).astype(dqp_ref.dtype)
                else:
                    # keep ds live without the dq matmul or slab write
                    dk_scr[...] += jnp.sum(
                        ds, axis=0, keepdims=True
                    ).reshape(1, -1)[:, :D] * 1e-30

            @pl.when(qi == n_q - 1)
            def _store():
                dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
                dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

        return kern

    def build(variant):
        slab_kv = 1 if variant == "no_dqslab" else n_kv
        dq_bq = 8 if variant == "no_dqslab" else BQ
        in_specs = [
            pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, BQ, LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, BQ, LANES), lambda b, j, i: (b, i, 0)),
        ]
        out_specs = (
            pl.BlockSpec((1, 1, dq_bq, D), lambda b, j, i: (0, b, 0, 0))
            if variant == "no_dqslab" else
            pl.BlockSpec((1, 1, BQ, D), lambda b, j, i: (j, b, i, 0)),
            pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct(
                (slab_kv, BH, dq_bq if variant == "no_dqslab" else S, D),
                jnp.bfloat16),
            jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
        )
        return pl.pallas_call(
            make_kernel(variant),
            grid=(BH, n_kv, n_q),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((BK, D), jnp.float32),
                pltpu.VMEM((BK, D), jnp.float32),
            ],
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=False,
        )

    def time_variant(variant):
        f = build(variant)

        def init():
            k = jax.random.PRNGKey(0)
            q = jax.random.normal(k, (BH, S, D), jnp.bfloat16) * 0.3
            lse = jnp.full((BH, S, LANES), 3.0, jnp.float32)
            di = jnp.full((BH, S, LANES), 0.1, jnp.float32)
            return (q, q * 1.01, q * 0.99, q * 0.5, lse, di)

        def body(c):
            q, k, v, do, lse, di = c
            dqp, dk, dv = f(q, k, v, do, lse, di)
            return (q + dk * jnp.bfloat16(1e-30),
                    k + dv * jnp.bfloat16(1e-30), v, do, lse, di)

        fns = {}
        state = {"c": init()}

        def call(n):
            if n not in fns:
                fns[n] = jax.jit(lambda c, n=n: jax.lax.scan(
                    lambda cc, _: (body(cc), None), c, length=n)[0],
                    donate_argnums=(0,))
            out = fns[n](state["c"])
            state["c"] = out
            float(np.asarray(out[0]).astype(np.float32).reshape(-1)[0])

        call(N1), call(N2)
        w1, w2 = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            call(N1)
            t1 = time.perf_counter()
            call(N2)
            t2 = time.perf_counter()
            w1.append(t1 - t0)
            w2.append(t2 - t1)
        return (min(w2) - min(w1)) / (N2 - N1) * 1e6

    out = {}
    for variant in ("full", "no_dqslab", "no_dkv", "no_vpu", "sp_only"):
        us = with_retries(lambda: time_variant(variant))
        out[variant] = round(us, 1)
        print(f"{variant:>10}: {us:.1f} us/call", flush=True)
    path = os.path.join(os.path.dirname(__file__), "exp_bwd_bisect.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
