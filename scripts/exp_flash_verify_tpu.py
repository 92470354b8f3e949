#!/usr/bin/env python
"""Pin flash/compact attention NUMERICS + PERF on the real chip.

VERDICT r3 weak #5: tests/test_attention.py runs interpret=True on CPU
only — interpret mode cannot catch Mosaic-specific layout/DMA bugs, and
the round-2 "1.11x f+b at ctx 2048-8192" claim had no committed hardware
evidence. This script, run on the real TPU:

 1. NUMERICS — flash forward AND backward (dq/dk/dv) vs mha_reference at
    ctx 2048 and 8192, bf16 inputs, for the load-bearing variants:
    causal, sliding window, segment ids (packed documents), 2D per-row
    kv limits, and the compact kernel at its dispatch band (ctx 1024).
 2. PERF — forward+backward wall time per call of flash vs plain-XLA
    attention at ctx 2048 / 4096 / 8192 (difference method over chained
    scans, so tunnel readback cancels).

Writes FLASH_TPU.json at the repo root (the standing hardware artifact;
commit it). Retries every phase on the axon tunnel's transient errors.

Usage: python scripts/exp_flash_verify_tpu.py     (real TPU, ~5 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, H, D = 2, 8, 64
N1, N2 = 4, 16

# --smoke: tiny contexts + interpret mode on CPU, numerics only — drives
# the full script structure without the chip (harness testability; the
# artifact is NOT written in smoke mode)
SMOKE = "--smoke" in sys.argv[1:]


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def max_err(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu.ops.attention import (compact_attention, flash_attention,
                                        mha_reference)

    results = {"numerics": [], "perf": []}

    def qkv(ctx, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        q = jax.random.normal(ks[0], (B, H, ctx, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, ctx, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, ctx, D), jnp.bfloat16)
        return q, k, v

    def check(name, ctx, flash_kwargs, ref_kwargs, kernel=None):
        """Forward + full backward numerics vs the XLA oracle. The bf16
        tolerance: two differently-ordered bf16 reductions over ctx
        elements differ by O(sqrt(ctx)) ulps — 0.06 abs covers ctx 8192
        with margin while still catching any real masking/indexing bug
        (those produce O(1) errors)."""
        kfn = kernel or flash_attention
        interp = True if SMOKE else False
        q, k, v = qkv(ctx)

        def loss_flash(q, k, v):
            return (kfn(q, k, v, interpret=interp, **flash_kwargs)
                    .astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v):
            return (mha_reference(q, k, v, **ref_kwargs)
                    .astype(jnp.float32) ** 2).sum()

        o_f = kfn(q, k, v, interpret=interp, **flash_kwargs)
        o_r = mha_reference(q, k, v, **ref_kwargs)
        g_f = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        # grads scale with ctx (sum-of-squares loss): compare relatively
        errs = {"o": max_err(o_f, o_r)}
        for nm, a, b in zip(("dq", "dk", "dv"), g_f, g_r):
            scale = float(np.max(np.abs(np.asarray(b, np.float32)))) or 1.0
            errs[nm] = max_err(a, b) / scale
        tol = {"o": 0.06, "dq": 0.03, "dk": 0.03, "dv": 0.03}
        ok = all(errs[x] < tol[x] for x in errs)
        rec = {"name": name, "ctx": ctx, "errors": errs, "ok": bool(ok)}
        results["numerics"].append(rec)
        print(f"numerics {name} ctx={ctx}: "
              + " ".join(f"{x}={errs[x]:.4f}" for x in errs)
              + ("  OK" if ok else "  FAIL"), flush=True)
        assert ok, rec

    # --- numerics ---
    for ctx in ((256,) if SMOKE else (2048, 8192)):
        with_retries(lambda ctx=ctx: check(
            "causal", ctx, dict(causal=True), dict(causal=True)))
    wctx, wwin = (256, 64) if SMOKE else (4096, 512)
    with_retries(lambda: check(
        "window", wctx, dict(causal=True, window=wwin),
        dict(causal=True, window=wwin)))
    sctx = 256 if SMOKE else 2048
    seg = np.zeros((B, sctx), np.int32)
    seg[:, sctx // 3:2 * sctx // 3] = 1
    seg[:, 2 * sctx // 3:] = 2
    seg = jnp.asarray(seg)
    with_retries(lambda: check(
        "segment_ids", sctx, dict(causal=True, segment_ids=seg),
        dict(causal=True, segment_ids=seg)))
    rng = np.random.RandomState(0)
    lim2d = jnp.asarray(rng.randint(1, sctx, (B, sctx)), jnp.int32)
    mask2d = (jnp.arange(sctx)[None, None, None, :]
              < lim2d[:, None, :, None])
    with_retries(lambda: check(
        "kv_limits_2d", sctx, dict(kv_lengths=lim2d), dict(mask=mask2d)))
    with_retries(lambda: check(
        "compact_causal", 256 if SMOKE else 1024, dict(causal=True),
        dict(causal=True), kernel=compact_attention))

    if SMOKE:
        print("smoke mode: numerics OK, skipping perf + artifact")
        return

    # --- perf: f+b per call, flash vs XLA, difference method ---
    def time_fb(fn, ctx, pairs=4, n1=None, n2=None):
        """n1/n2 chain lengths must scale with the per-call cost: the
        differenced signal (n2-n1)*cost has to dwarf the ~40 ms
        readback's run-to-run noise (the round-5 fast backward made the
        old 4/16 lengths produce NEGATIVE ctx-4096 readings)."""
        n1 = N1 if n1 is None else n1
        n2 = N2 if n2 is None else n2
        q, k, v = qkv(ctx)

        def fb(args):
            q, k, v = args
            def loss(q, k, v):
                return (fn(q, k, v).astype(jnp.float32) ** 2).sum() * 1e-6
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            # chain: feed grads back so scanned iterations depend on
            # each other and cannot be elided
            return (q + dq.astype(q.dtype) * 1e-3, k + dk.astype(k.dtype)
                    * 1e-3, v + dv.astype(v.dtype) * 1e-3)

        fns = {n: jax.jit(lambda c, n=n: jax.lax.scan(
            lambda cc, _: (fb(cc), None), c, length=n)[0])
            for n in (n1, n2)}

        def call(n):
            out = fns[n]((q, k, v))
            float(np.asarray(out[0]).reshape(-1)[0])

        call(n1), call(n2)
        w1, w2 = [], []
        for _ in range(pairs):
            t0 = time.perf_counter()
            call(n1)
            t1 = time.perf_counter()
            call(n2)
            t2 = time.perf_counter()
            w1.append(t1 - t0)
            w2.append(t2 - t1)
        return (min(w2) - min(w1)) / (n2 - n1) * 1e6

    chain = {2048: (16, 128), 4096: (8, 64), 8192: (4, 16)}
    for ctx in (2048, 4096, 8192):
        n1, n2 = chain[ctx]
        flash_us = with_retries(lambda ctx=ctx: time_fb(
            lambda q, k, v: flash_attention(q, k, v, causal=True,
                                            interpret=False), ctx,
            n1=n1, n2=n2))
        xla_us = with_retries(lambda ctx=ctx: time_fb(
            lambda q, k, v: mha_reference(q, k, v, causal=True), ctx,
            n1=N1, n2=N2))
        rec = {"ctx": ctx, "flash_fb_us": round(flash_us, 1),
               "xla_fb_us": round(xla_us, 1),
               "speedup": round(xla_us / flash_us, 3)}
        results["perf"].append(rec)
        print(f"perf ctx={ctx}: flash {flash_us:.0f} us  xla {xla_us:.0f} "
              f"us  ({xla_us / flash_us:.2f}x)", flush=True)

    results["device"] = str(jax.devices()[0])
    results["date"] = time.strftime("%Y-%m-%d")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FLASH_TPU.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
