#!/usr/bin/env python
"""Scan-structured decomposition of the flagship LM train step (VERDICT r4
task 3): account the SHIPPING program (lax.scan accumulation, 67.6 ms r4)
within ~10% out of MEASURED component probes, each at the exact flagship
sub-batch shapes — not the unrolled variant exp_lm_step_sol.py decomposed.

Probes (all two-chain-length difference timing, donated chained state,
every probe does ACCUM=5 sub-batch units per chain step so numbers are
per-train-step comparable):

  P1 full step        : bench.py's exact scan-accum AdamW step
  P2 fwd+bwd scan     : the same scan structure with a no-update probe
                        optimizer (grads reduced to one scalar folded into
                        one leaf — ~0.3 ms of extra grad reads, noted)
  P3 forward only     : scan of the loss forward alone
  P4 matmul skeleton  : every weight matmul of the step in fwd (y=xW),
                        dx (dy W^T) and dW (x^T dy) form, weights updated
                        by eps so the chain has real dependencies
  P5 attention        : 12x XLA-path causal attention f+b at [8,12,384,64]
  P6 norms            : 25 LayerNorms f+b at [8,384,768]
  P7 CE               : softmax cross-entropy f+b at [3072, 256]
  P8 embedding        : token gather + learned-position add f+b

Accounting: P2 =?= P4 + P5 + P6 + P7 + P8 (+ residual glue);
P1 - P2 =?= isolated optimizer (exp_opt_flat: 4.3 ms).

Usage: python scripts/exp_lm_step_scan.py   (real TPU, ~8 min)
Writes scripts/exp_lm_step_scan.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

BATCH, CTX, VOCAB, ACCUM, LAYERS, DIM, HEADS = 8, 384, 256, 5, 12, 768, 12
HD = DIM // HEADS
MLP = 4 * DIM
M = BATCH * CTX
N1, N2 = 3, 12
PEAK = 197e12


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def diff_time(call, pairs=5):
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


def time_scan_chain(body, x0_fn, reps=5):
    """Per-chain-step seconds of ``body`` (carry -> carry), donated."""
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

    from lamp_tpu import nn, optim, train

    results = {}

    def make_model():
        return nn.LanguageModelModule.init(
            vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
            embed_dim=DIM, attention_heads=HEADS, key=jax.random.PRNGKey(0),
            dtype=jnp.bfloat16, dropout=0.0,
        )

    model0 = make_model()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(model0)
                   if hasattr(x, "size"))
    tokens_per_step = ACCUM * BATCH * CTX
    flops_per_tok = 6 * n_params + 12 * LAYERS * DIM * CTX
    mxu_floor_ms = tokens_per_step * flops_per_tok / PEAK * 1e3

    def loss_fn(model, batch, key, train_mode):
        toks, target = batch
        logits, nm = model.forward(toks, key=key, train=train_mode)
        return (nn.lm_loss(logits, target),
                jnp.asarray(toks.shape[0], jnp.float32), nm)

    rng = np.random.RandomState(0)
    toks = jnp.asarray(
        rng.randint(0, VOCAB, (ACCUM, BATCH, CTX)).astype(np.int32))
    batch = (toks, jnp.roll(toks, -1, axis=2))
    rk = jax.random.PRNGKey(1)

    # ---------------- P1: full step (the shipping scan program) ----------
    def time_step(opt, label):
        step = jax.jit(
            train.make_train_step(opt, loss_fn, accumulation_steps=ACCUM),
            donate_argnums=(0,))

        def attempt():
            holder = {"s": train.TrainState.init(make_model(), opt)}

            def call(n):
                for _ in range(n):
                    holder["s"], (loss, _) = step(holder["s"], batch, rk)
                float(loss)

            return diff_time(call)

        dt = with_retries(attempt) * 1e3
        print(f"{label}: {dt:.2f} ms/step "
              f"({tokens_per_step / dt * 1e3:,.0f} tok/s)", flush=True)
        return dt

    p1 = time_step(optim.AdamW(3e-4, weight_decay=0.01),
                   "P1 full step (scan accum, AdamW)")
    results["p1_full_ms"] = round(p1, 2)

    # ---------------- P2: fwd+bwd with the SAME scan structure -----------
    class ProbeNoOpt:
        """No-update optimizer: consumes every gradient leaf via one
        reduction (so nothing is DCE'd — the round-4 lesson) folded into
        one param leaf at 1e-30. Extra cost vs a true fwd+bwd: one read
        of the 64M f32 grads (~0.3 ms)."""

        def init(self, params):
            return jnp.zeros((), jnp.float32)

        def step(self, params, grads, state, lr_factor=1.0):
            tot = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)
                      if hasattr(g, "dtype"))
            leaves, treedef = jax.tree_util.tree_flatten(params)
            for i, x in enumerate(leaves):
                if hasattr(x, "dtype"):
                    leaves[i] = x + (tot * 1e-30).astype(x.dtype)
                    break
            return (jax.tree_util.tree_unflatten(treedef, leaves),
                    state + tot * 1e-30)

    p2 = time_step(ProbeNoOpt(), "P2 fwd+bwd (scan form, no-update opt)")
    results["p2_fb_scan_ms"] = round(p2, 2)

    # ---------------- P3: forward only, same scan shape ------------------
    def fwd_body(carry):
        m, s = carry
        def body(c, sub):
            t, tg = sub
            loss, _, _ = loss_fn(m, (t, tg), rk, True)
            return c + loss, None
        tot, _ = jax.lax.scan(body, s * 1e-30, batch)
        return m, tot

    p3 = with_retries(lambda: time_scan_chain(
        fwd_body, lambda: (make_model(), jnp.zeros((), jnp.float32)))) * 1e3
    print(f"P3 forward only (scan): {p3:.2f} ms/step", flush=True)
    results["p3_fwd_ms"] = round(p3, 2)

    # ---------------- P4: matmul skeleton (fwd + dx + dW forms) ----------
    def mm_shapes():
        per_layer = [(DIM, 3 * DIM), (DIM, DIM), (DIM, MLP), (MLP, DIM)]
        return per_layer * LAYERS + [(DIM, VOCAB)]

    def skel_init():
        k = jax.random.PRNGKey(2)
        ws = []
        for i, (a, b) in enumerate(mm_shapes()):
            ws.append(jax.random.normal(jax.random.fold_in(k, i), (a, b),
                                        jnp.bfloat16) * 0.02)
        x = jax.random.normal(jax.random.PRNGKey(3), (M, DIM), jnp.bfloat16)
        return x, tuple(ws)

    def skel_body(carry):
        x, ws = carry
        acc = jnp.promote_types(x.dtype, jnp.float32)
        for _ in range(ACCUM):
            new_ws = []
            h = x
            for w in ws:
                a, b = w.shape
                xin = h if h.shape[1] == a else (
                    h[:, :a] if h.shape[1] > a
                    else jnp.tile(h, (1, a // h.shape[1])))
                y = jnp.matmul(xin, w, preferred_element_type=acc)
                dy = (y * jnp.bfloat16(1e-3)).astype(x.dtype)
                dx = jnp.matmul(dy, w.T, preferred_element_type=acc)
                dw = jnp.matmul(xin.T.astype(x.dtype), dy,
                                preferred_element_type=acc)
                new_ws.append(w + dw.astype(w.dtype) * jnp.bfloat16(1e-30))
                h = (xin + dx.astype(x.dtype) * jnp.bfloat16(1e-3))
            ws = tuple(new_ws)
            x = h[:, :DIM]
        return x, ws

    p4 = with_retries(lambda: time_scan_chain(skel_body, skel_init)) * 1e3
    print(f"P4 matmul skeleton (fwd+dx+dW x{ACCUM}): {p4:.2f} ms/step "
          f"(analytic MXU floor for ALL model FLOPs: {mxu_floor_ms:.2f})",
          flush=True)
    results["p4_mm_skeleton_ms"] = round(p4, 2)

    # ---------------- P5: attention f+b x 12 x ACCUM ---------------------
    from lamp_tpu.ops.attention import mha_reference

    def attn_init():
        k = jax.random.PRNGKey(4)
        q = jax.random.normal(k, (BATCH, HEADS, CTX, HD), jnp.bfloat16)
        return (q, q * 1.01, q * 0.99)

    def attn_body(carry):
        q, k, v = carry
        def loss(q, k, v):
            tot = jnp.zeros((), jnp.float32)
            for _ in range(LAYERS):
                o = mha_reference(q, k, v, causal=True)
                tot = tot + jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
                q = q + o * jnp.bfloat16(1e-3)
            return tot
        for _ in range(ACCUM):
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            q = q + dq.astype(q.dtype) * jnp.bfloat16(1e-3)
            k = k + dk.astype(k.dtype) * jnp.bfloat16(1e-3)
            v = v + dv.astype(v.dtype) * jnp.bfloat16(1e-3)
        return q, k, v

    p5 = with_retries(lambda: time_scan_chain(attn_body, attn_init)) * 1e3
    print(f"P5 attention f+b (x{LAYERS} x{ACCUM}): {p5:.2f} ms/step",
          flush=True)
    results["p5_attn_ms"] = round(p5, 2)

    # ---------------- P6: norms f+b ----------------------------------
    n_norms = 2 * LAYERS + 1
    gamma0 = jnp.ones((DIM,), jnp.bfloat16)

    def norm_init():
        return (jax.random.normal(jax.random.PRNGKey(5),
                                  (BATCH, CTX, DIM), jnp.bfloat16), gamma0)

    def norm_body(carry):
        x, gamma = carry

        def loss(x, gamma):
            h = x
            for _ in range(n_norms):
                acc = h.astype(jnp.float32)
                mu = jnp.mean(acc, -1, keepdims=True)
                var = jnp.mean((acc - mu) ** 2, -1, keepdims=True)
                h = ((acc - mu) * jax.lax.rsqrt(var + 1e-5)
                     ).astype(h.dtype) * gamma
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

        for _ in range(ACCUM):
            dx, dg = jax.grad(loss, argnums=(0, 1))(x, gamma)
            x = x + dx.astype(x.dtype) * jnp.bfloat16(1e-3)
            gamma = gamma + dg.astype(gamma.dtype) * jnp.bfloat16(1e-30)
        return x, gamma

    p6 = with_retries(lambda: time_scan_chain(norm_body, norm_init)) * 1e3
    print(f"P6 norms f+b (x{n_norms} x{ACCUM}): {p6:.2f} ms/step",
          flush=True)
    results["p6_norms_ms"] = round(p6, 2)

    # ---------------- P7: CE f+b ----------------------------------------
    def ce_init():
        lg = jax.random.normal(jax.random.PRNGKey(6), (M, VOCAB),
                               jnp.float32)
        tg = jnp.asarray(rng.randint(0, VOCAB, (M,)).astype(np.int32))
        return lg, tg

    def ce_body(carry):
        lg, tg = carry

        def loss(lg):
            lp = jax.nn.log_softmax(lg, -1)
            return -jnp.mean(jnp.take_along_axis(lp, tg[:, None], 1))

        for _ in range(ACCUM):
            d = jax.grad(loss)(lg)
            lg = lg + d * 1e-3
        return lg, tg

    p7 = with_retries(lambda: time_scan_chain(ce_body, ce_init)) * 1e3
    print(f"P7 CE f+b (x{ACCUM}): {p7:.2f} ms/step", flush=True)
    results["p7_ce_ms"] = round(p7, 2)

    # ---------------- P8: embedding + positions f+b ----------------------
    def emb_init():
        e = jax.random.normal(jax.random.PRNGKey(7), (VOCAB, DIM),
                              jnp.bfloat16) * 0.02
        pe = jax.random.normal(jax.random.PRNGKey(8), (CTX, DIM),
                               jnp.bfloat16) * 0.02
        tg = jnp.asarray(rng.randint(0, VOCAB, (BATCH, CTX)).astype(np.int32))
        return e, pe, tg

    def emb_body(carry):
        e, pe, tg = carry

        def loss(e, pe):
            h = e[tg] + pe[None, :, :]
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

        for _ in range(ACCUM):
            de, dpe = jax.grad(loss, argnums=(0, 1))(e, pe)
            e = e + de.astype(e.dtype) * jnp.bfloat16(1e-30)
            pe = pe + dpe.astype(pe.dtype) * jnp.bfloat16(1e-30)
        return e, pe, tg

    p8 = with_retries(lambda: time_scan_chain(emb_body, emb_init)) * 1e3
    print(f"P8 embedding f+b (x{ACCUM}): {p8:.2f} ms/step", flush=True)
    results["p8_embed_ms"] = round(p8, 2)

    # ---------------- accounting ----------------------------------------
    comp_sum = p4 + p5 + p6 + p7 + p8
    opt_diff = p1 - p2
    print("\n=== accounting (per train step) ===")
    print(f"P1 full           {p1:8.2f} ms")
    print(f"P2 fwd+bwd scan   {p2:8.2f} ms   optimizer by diff "
          f"{opt_diff:.2f} ms (exp_opt_flat isolated: ~4.3)")
    print(f"P3 forward only   {p3:8.2f} ms   bwd/fwd ratio "
          f"{(p2 - p3) / max(p3, 1e-9):.2f}")
    print(f"P4..P8 sum        {comp_sum:8.2f} ms   "
          f"({100 * comp_sum / p2:.0f}% of P2; residual glue "
          f"{p2 - comp_sum:.2f} ms)")
    print(f"analytic MXU floor {mxu_floor_ms:.2f} ms; "
          f"P4 measured matmul skeleton {p4:.2f} ms "
          f"({100 * mxu_floor_ms / p4:.0f}% of skeleton)")
    results.update({
        "component_sum_ms": round(comp_sum, 2),
        "residual_ms": round(p2 - comp_sum, 2),
        "opt_by_difference_ms": round(opt_diff, 2),
        "analytic_mxu_floor_ms": round(mxu_floor_ms, 2),
        "n_params": int(n_params),
    })
    path = os.path.join(os.path.dirname(__file__), "exp_lm_step_scan.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
