#!/usr/bin/env python
"""Prototype a TRANSPOSED-SPACE flash backward and A/B it against the
shipped fused backward's body, same session, same grid/blocks.

Motivation (docs/lm_step_headroom.md round 5): the backward runs ~31 TF/s
vs the forward's ~174 and IS the ctx-4096 step. The shipped body computes
in [block_q, block_k] orientation and needs TWO dim0-contraction dots
(dv = p^T do, dk = ds^T q). Computing in [block_k, block_q] orientation
(s^T = k.q) makes dv/dk STANDARD dots and leaves ONE dim0-dot (dq), and
the lse/di row-vectors ride an [8, sq] layout so no in-kernel vector
transposes appear.

Timing-only (fake-but-finite lse/di, zeros outputs compared for shape
sanity); if the transposed body wins >20% it gets productionized with
full numerics.

Usage: python scripts/exp_bwd_transposed.py   (real TPU, ~6 min)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

BH, S, D = 24, 4096, 64
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

    n_kv = S // BK
    n_q = S // BQ

    # ---------------- shipped-orientation body (current kernel) ----------
    def kern_current(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                     dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr):
        ki = pl.program_id(1)
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])
        run = (qi + 1) * BQ > ki * BK

        @pl.when(run)
        def _compute():
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            lse = lse_ref[0]
            di = di_ref[0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * SM
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * BQ
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * BK
            s = jnp.where(cols <= rows, s, -1e30)
            p = jnp.exp(s - lse[:, :1])
            dv_scr[...] += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - di[:, :1]) * SM
            dk_scr[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqp_ref[0, 0] = jax.lax.dot(
                ds.astype(q.dtype), k, preferred_element_type=jnp.float32
            ).astype(dqp_ref.dtype)

        @pl.when(qi == n_q - 1)
        def _store():
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

    # ---------------- transposed-orientation body ------------------------
    def kern_transposed(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                        dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr):
        ki = pl.program_id(1)
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])
        run = (qi + 1) * BQ > ki * BK

        @pl.when(run)
        def _compute():
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            do = do_ref[0]
            lse = lse_ref[0]   # [8, BQ] row layout
            di = di_ref[0]
            sT = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * SM  # [BK, BQ]
            krow = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0) + ki * BK
            qcol = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1) + qi * BQ
            sT = jnp.where(krow <= qcol, sT, -1e30)
            pT = jnp.exp(sT - lse[:1, :])                 # [BK, BQ]
            # dv += pT @ do: STANDARD dot
            dv_scr[...] += jax.lax.dot(
                pT.astype(do.dtype), do, preferred_element_type=jnp.float32)
            dpT = jax.lax.dot_general(
                v, do, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [BK, BQ]
            dsT = pT * (dpT - di[:1, :]) * SM
            # dk += dsT @ q: STANDARD dot
            dk_scr[...] += jax.lax.dot(
                dsT.astype(q.dtype), q, preferred_element_type=jnp.float32)
            # dq partial: the single remaining dim0-contraction
            dqp_ref[0, 0] = jax.lax.dot_general(
                dsT.astype(q.dtype), k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(dqp_ref.dtype)

        @pl.when(qi == n_q - 1)
        def _store():
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

    def build(which):
        lse_spec = (pl.BlockSpec((1, BQ, 8), lambda b, j, i: (b, i, 0))
                    if which == "current"
                    else pl.BlockSpec((1, 8, BQ), lambda b, j, i: (b, 0, i)))
        return pl.pallas_call(
            kern_current if which == "current" else kern_transposed,
            grid=(BH, n_kv, n_q),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, BQ, D), lambda b, j, i: (b, i, 0)),
                lse_spec, lse_spec,
            ],
            out_specs=(
                pl.BlockSpec((1, 1, BQ, D), lambda b, j, i: (j, b, i, 0)),
                pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, BK, D), lambda b, j, i: (b, j, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((BK, D), jnp.float32),
                pltpu.VMEM((BK, D), jnp.float32),
            ],
            out_shape=(
                jax.ShapeDtypeStruct((n_kv, BH, S, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=False,
        )

    def time_variant(which):
        f = build(which)

        def init():
            k = jax.random.PRNGKey(0)
            q = jax.random.normal(k, (BH, S, D), jnp.bfloat16) * 0.3
            if which == "current":
                lse = jnp.full((BH, S, 8), 3.0, jnp.float32)
            else:
                lse = jnp.full((BH, 8, S), 3.0, jnp.float32)
            di = lse * 0.03
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

        return call

    calls = {}
    for which in ("current", "transposed"):
        c = time_variant(which)
        with_retries(lambda: c(N1))
        with_retries(lambda: c(N2))
        calls[which] = c
        print(f"compiled {which}", flush=True)

    w1 = {n: [] for n in calls}
    w2 = {n: [] for n in calls}
    for rnd in range(5):
        for n, c in calls.items():
            t0 = time.perf_counter()
            with_retries(lambda: c(N1))
            t1 = time.perf_counter()
            with_retries(lambda: c(N2))
            t2 = time.perf_counter()
            w1[n].append(t1 - t0)
            w2[n].append(t2 - t1)
        print(f"round {rnd}: " + " ".join(
            f"{n}={(w2[n][-1] - w1[n][-1]) / (N2 - N1) * 1e6:.0f}us"
            for n in calls), flush=True)
    out = {n: round((min(w2[n]) - min(w1[n])) / (N2 - N1) * 1e6, 1)
           for n in calls}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "exp_bwd_transposed.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
