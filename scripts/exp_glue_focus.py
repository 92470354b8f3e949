#!/usr/bin/env python
"""Isolate the serving step's ~57us RoPE/residual/dispatch glue (VERDICT r4
weak #1) and A/B candidate fixes on the REAL engine, all in ONE session so
tunnel drift cancels.

Phase A — isolated chained probes at bench shapes (B=32, 12 layers' worth
of work per chain step):
  rot_current : the shipping rotation (3D reshape + f32 split/concat) for
                q [B,12,64] and k [B,4,64], x12 layers
  rot_flat    : rotation applied on the FLAT [B, 1024] q||k lane layout
                (one static-gather half-swap, no 3D reshapes), x12 layers

Phase B — real-engine step_many A/B (fresh bench-shaped server per
variant, two-chain-length difference method exactly like bench.py):
  baseline          : shipping engine at HEAD
  norope            : rot() replaced by identity (upper bound for any
                      rope-side win; numerically wrong, timing only)
  flatrope          : the Phase-A flat rotation wired into _decode_step
  nowrites          : _kv_write_stacked skipped (timing only)
  flatrope_nowrites : both (checks additivity)

Usage: python scripts/exp_glue_focus.py        (real TPU, ~6 min)
Writes scripts/exp_glue_focus.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

B, L, D, HQ, HKV, HD, VOCAB = 32, 12, 768, 12, 4, 64, 32000
N1, N2 = 8, 64


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


def diff_pairs(call, pairs=4, n1=None, n2=None):
    """(min wall(n2) - min wall(n1)) / (n2 - n1): cancels readback latency;
    min-based so service jitter (inflation-only) is rejected."""
    n1 = N1 if n1 is None else n1
    n2 = N2 if n2 is None else n2
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
    return (min(w2) - min(w1)) / (n2 - n1)


# ---------------------------------------------------------------- Phase A

def phase_a():
    import jax
    import jax.numpy as jnp

    nq, nkv = HQ * HD, HKV * HD
    nqk = nq + nkv
    half = HD // 2
    key = jax.random.PRNGKey(0)
    lengths = jnp.full((B,), 150, jnp.int32)
    cos_t = jax.random.normal(jax.random.PRNGKey(2), (4096, half),
                              jnp.float32)
    sin_t = jax.random.normal(jax.random.PRNGKey(3), (4096, half),
                              jnp.float32)

    def hoisted():
        c = jnp.take(cos_t, lengths, axis=0)
        s = jnp.take(sin_t, lengths, axis=0)
        return c, s

    def time_chain(body, x0_fn, reps=4):
        fns = {}
        state = {"c": x0_fn()}  # fresh per invocation: the carry is donated

        def call(n):
            if n not in fns:
                fns[n] = jax.jit(lambda c: jax.lax.scan(
                    lambda cc, _: (body(cc), None), c, length=n)[0],
                    donate_argnums=(0,))
            out = fns[n](state["c"])
            state["c"] = out
            float(np.asarray(out).reshape(-1)[0])

        # the per-chain-step work here is ~tens of us: chain long enough
        # that the differenced signal (~(n2-n1)*cost) dwarfs the ~40ms
        # readback's run-to-run noise (the 8/64 bench lengths measured a
        # NEGATIVE rot cost in one window)
        return diff_pairs(call, pairs=reps, n1=64, n2=1024)

    def x0():
        return jax.random.normal(key, (B, nqk), jnp.bfloat16)

    # current form: per layer rot(q 3D) + rot(k 3D) with reshapes
    def body_current(y):
        c, s = hoisted()
        cb = c[:, None, :]
        sb = s[:, None, :]

        def rot(t):
            acc = t.astype(jnp.float32)
            t1, t2 = jnp.split(acc, 2, axis=-1)
            return jnp.concatenate(
                [t1 * cb - t2 * sb, t2 * cb + t1 * sb], axis=-1
            ).astype(t.dtype)

        for _ in range(L):
            q = rot(y[:, :nq].reshape(B, HQ, HD))
            kk = rot(y[:, nq:].reshape(B, HKV, HD))
            flat = jnp.concatenate(
                [q.reshape(B, -1), kk.reshape(B, -1)], axis=1)
            y = y * jnp.bfloat16(0.999) + flat * jnp.bfloat16(1e-3)
        return y

    # flat form: ONE rotation over the q||k lane layout, no 3D
    c64s = None
    perm = jnp.asarray(
        [(l // HD) * HD + ((l % HD) + half) % HD for l in range(nqk)],
        jnp.int32)

    def body_flat(y):
        c, s = hoisted()
        c64 = jnp.concatenate([c, c], -1)
        s64 = jnp.concatenate([-s, s], -1)
        cflat = jnp.tile(c64, (1, nqk // HD))
        sflat = jnp.tile(s64, (1, nqk // HD))
        for _ in range(L):
            acc = y.astype(jnp.float32)
            flat = (acc * cflat + jnp.take(acc, perm, axis=1) * sflat
                    ).astype(y.dtype)
            y = y * jnp.bfloat16(0.999) + flat * jnp.bfloat16(1e-3)
        return y

    cur = with_retries(lambda: time_chain(body_current, x0)) * 1e6
    print(f"rot_current x{L} layers (q+k): {cur:.1f} us/step")
    flat = with_retries(lambda: time_chain(body_flat, x0)) * 1e6
    print(f"rot_flat    x{L} layers (q||k): {flat:.1f} us/step")
    return {"rot_current_us": round(cur, 1), "rot_flat_us": round(flat, 1)}


# ---------------------------------------------------------------- Phase B

def make_decode_step(variant):
    """A _decode_step clone with the variant's change; signature-compatible
    (non-TP, non-MoE path only — the bench workload)."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu.models import serving as S

    def step(self, model, kv_pages, tokens, page_idx, lengths,
             token_pages, token_slots, extras, lora=None, req_windows=None):
        assert self._tp == 1 and not self._moe and lora is None
        b = tokens.shape[0]
        wqkv, wo, w1, w3, w2, lmh = extras
        x = model.token_embedding(tokens[:, None])
        hd = self.head_dim
        half = hd // 2
        nq = self.heads * hd
        nkv = self.kv_heads * hd
        nqk = nq + nkv
        c = jnp.take(model.rope_cos, lengths, axis=0).astype(jnp.float32)
        s = jnp.take(model.rope_sin, lengths, axis=0).astype(jnp.float32)
        if "flatrope" in variant:
            c64 = jnp.concatenate([c, c], -1)
            s64 = jnp.concatenate([-s, s], -1)
            cflat = jnp.tile(c64, (1, nqk // hd))
            sflat = jnp.tile(s64, (1, nqk // hd))
            perm = jnp.asarray(
                [(l // hd) * hd + ((l % hd) + half) % hd
                 for l in range(nqk)], jnp.int32)

            def rot_qk(t):  # [B, nqk] -> [B, nqk], rotated per 64-lane head
                acc = t.astype(jnp.float32)
                return (acc * cflat + jnp.take(acc, perm, axis=1) * sflat
                        ).astype(t.dtype)
        else:
            cb = c[:, None, :]
            sb = s[:, None, :]

            def rot(t):
                if variant.startswith("norope"):
                    return t
                acc = t.astype(jnp.float32)
                t1, t2 = jnp.split(acc, 2, axis=-1)
                return jnp.concatenate(
                    [t1 * cb - t2 * sb, t2 * cb + t1 * sb], axis=-1
                ).astype(t.dtype)

        deferred = []
        for li, block in enumerate(model.blocks):
            a = block.norm1(x)[:, 0]
            y = self._mm(a, wqkv[li])
            if "flatrope" in variant:
                yr = rot_qk(y[:, :nqk])
                q = yr[:, :nq].reshape(b, self.heads, hd)
                kk_f = yr[:, nq:]
            else:
                q = rot(y[:, :nq].reshape(b, self.heads, hd))
                kk_f = rot(
                    y[:, nq:nqk].reshape(b, self.kv_heads, hd)
                ).reshape(b, -1)
            vv_f = y[:, nqk:]
            deferred.append((kk_f, vv_f))
            o = S.paged_attention(
                q, kv_pages, None, page_idx, lengths,
                num_kv_heads=self.kv_heads,
                pages_per_block=self.pages_per_block,
                window=self._windows[li], windows=req_windows,
                append_kv=(kk_f, vv_f),
                page_offset=li * self.total_pages,
            )
            x = x + self._mm(o.reshape(b, 1, -1), wo[li])
            h = block.norm2(x)
            gate = jax.nn.silu(self._mm(h, w1[li])) * self._mm(h, w3[li])
            x = x + self._mm(gate, w2[li])
        if "nowrites" not in variant:
            kv_pages = S._kv_write_stacked(
                kv_pages, self.total_pages, token_pages, token_slots,
                deferred)
        x = model.final_norm(x)
        logits = self._mm(x, lmh, out_dtype=jnp.float32)[:, 0]
        return logits, kv_pages

    return step


def make_decode_step_rows(variant):
    """_decode_step clone that RETURNS the per-layer K/V row stacks
    ([L, B, F] each) instead of scattering them — the caller owns the pool
    write (software-pipelined variants)."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu.models import serving as S

    def step(self, model, kv_pages, tokens, page_idx, lengths, extras,
             req_windows=None):
        b = tokens.shape[0]
        wqkv, wo, w1, w3, w2, lmh = extras
        x = model.token_embedding(tokens[:, None])
        hd = self.head_dim
        half = hd // 2
        nq = self.heads * hd
        nkv = self.kv_heads * hd
        nqk = nq + nkv
        c = jnp.take(model.rope_cos, lengths, axis=0).astype(jnp.float32)
        s = jnp.take(model.rope_sin, lengths, axis=0).astype(jnp.float32)
        if "flatrope" in variant:
            c64 = jnp.concatenate([c, c], -1)
            s64 = jnp.concatenate([-s, s], -1)
            cflat = jnp.tile(c64, (1, nqk // hd))
            sflat = jnp.tile(s64, (1, nqk // hd))
            perm = jnp.asarray(
                [(l // hd) * hd + ((l % hd) + half) % hd
                 for l in range(nqk)], jnp.int32)

            def rot_qk(t):
                acc = t.astype(jnp.float32)
                return (acc * cflat + jnp.take(acc, perm, axis=1) * sflat
                        ).astype(t.dtype)
        else:
            cb = c[:, None, :]
            sb = s[:, None, :]

            def rot(t):
                acc = t.astype(jnp.float32)
                t1, t2 = jnp.split(acc, 2, axis=-1)
                return jnp.concatenate(
                    [t1 * cb - t2 * sb, t2 * cb + t1 * sb], axis=-1
                ).astype(t.dtype)

        ks, vs = [], []
        for li, block in enumerate(model.blocks):
            a = block.norm1(x)[:, 0]
            y = self._mm(a, wqkv[li])
            if "flatrope" in variant:
                yr = rot_qk(y[:, :nqk])
                q = yr[:, :nq].reshape(b, self.heads, hd)
                kk_f = yr[:, nq:]
            else:
                q = rot(y[:, :nq].reshape(b, self.heads, hd))
                kk_f = rot(
                    y[:, nq:nqk].reshape(b, self.kv_heads, hd)
                ).reshape(b, -1)
            vv_f = y[:, nqk:]
            ks.append(kk_f)
            vs.append(vv_f)
            o = S.paged_attention(
                q, kv_pages, None, page_idx, lengths,
                num_kv_heads=self.kv_heads,
                pages_per_block=self.pages_per_block,
                window=self._windows[li], windows=req_windows,
                append_kv=(kk_f, vv_f),
                page_offset=li * self.total_pages,
            )
            x = x + self._mm(o.reshape(b, 1, -1), wo[li])
            h = block.norm2(x)
            gate = jax.nn.silu(self._mm(h, w1[li])) * self._mm(h, w3[li])
            x = x + self._mm(gate, w2[li])
        x = model.final_norm(x)
        logits = self._mm(x, lmh, out_dtype=jnp.float32)[:, 0]
        return logits, jnp.stack(ks), jnp.stack(vs)

    return step


def _scatter_stacked(pool, total_pages, tp, ts, kstack, vstack):
    """One all-layer scatter of [L, B, F] K and V stacks (same index
    discipline as serving._kv_write_stacked: all advanced indices
    adjacent, so in-place aliasing of the donated pool is preserved)."""
    import jax.numpy as jnp

    layers, b, _ = kstack.shape
    off = jnp.arange(layers, dtype=jnp.int32) * total_pages
    pages_l = (off[:, None] + tp[None, :]).reshape(-1)
    pages2 = jnp.concatenate([pages_l, pages_l])
    sel = jnp.concatenate([jnp.zeros((layers * b,), jnp.int32),
                           jnp.ones((layers * b,), jnp.int32)])
    slots_l = jnp.tile(ts, layers)
    slots2 = jnp.concatenate([slots_l, slots_l])
    rows = jnp.concatenate(
        [kstack.reshape(layers * b, -1), vstack.reshape(layers * b, -1)]
    ).astype(pool.dtype)
    return pool.at[pages2, sel, slots2].set(rows)


def make_decode_many_pipelined(variant):
    """_decode_many clone with SOFTWARE-PIPELINED pool writes: iteration i
    scatters iteration i-1's K/V rows at the TOP of the scan body (the
    previous token's KV must be visible before this step's kernels — exact
    numerics), so the body's TAIL has no scatter chain hanging off all 12
    layers' rows — the structural property the fast flatrope_nowrites
    program has. Iteration 0 scatters zero rows into trash page 0
    (reserved; windows/lengths keep it out of every softmax). One final
    scatter after the scan lands the last token's rows."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu.models.sampling import sample_tokens

    step_rows = make_decode_step_rows(variant)

    def many(self, model, kv_pages, tokens0, page_idx, lens0, token_pages,
             token_slots, extras, lora, key, temps, top_k, top_p, penalties,
             req_windows=None, ctable=None, cstates=None, min_p=None,
             *, n, max_top_k=0, return_logprobs=False):
        assert lora is None and penalties is None and ctable is None
        assert not return_logprobs
        b = tokens0.shape[0]
        L = len(model.blocks)
        F = self.kv_heads * self.head_dim
        pool_dt = kv_pages.dtype
        z = jnp.zeros((L, b, F), pool_dt)

        def body(carry, i):
            tok, kvp, k_, pk, pv, ptp, pts = carry
            kvp = _scatter_stacked(kvp, self.total_pages, ptp, pts, pk, pv)
            logits, kk, vv = step_rows(
                self, model, kvp, tok, page_idx, lens0 + i, extras,
                req_windows)
            k_, sub = jax.random.split(k_)
            nxt = sample_tokens(logits, sub, temps, top_k, top_p, None,
                                None, min_p, max_top_k)
            return (nxt, kvp, k_, kk.astype(pool_dt), vv.astype(pool_dt),
                    token_pages[:, i], token_slots[:, i]), (nxt, jnp.zeros(()))

        (_, kv_pages, _, lk, lv, ltp, lts), (toks, lps) = jax.lax.scan(
            body,
            (tokens0, kv_pages, key, z, z,
             jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32)),
            jnp.arange(n),
        )
        kv_pages = _scatter_stacked(
            kv_pages, self.total_pages, ltp, lts, lk, lv)
        return toks, kv_pages, None, None

    return many


def phase_b():
    """INTERLEAVED A/B: every variant's server is pre-built and pre-compiled,
    then the (N1, N2) timing pairs alternate across variants round-robin —
    tunnel drift (minutes-scale ±25% windows) hits all variants nearly
    equally, and per-variant min rejects the slow windows. The sequential
    protocol measured the two baselines equal but knockouts swinging
    -28%/+17%, which is not physical."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn
    from lamp_tpu.models import ModernBatchServer, SamplingParams

    lm = nn.ModernLM.init(
        vocab_size=VOCAB, context_length=512, num_blocks=L, embed_dim=D,
        num_heads=HQ, num_kv_heads=HKV, key=jax.random.PRNGKey(0),
        dtype=jnp.bfloat16,
    )
    orig = ModernBatchServer._decode_step
    variants = ("baseline", "flatrope", "nowrites", "flatrope_nowrites",
                "norope")
    servers = {}
    try:
        for variant in variants:
            ModernBatchServer._decode_step = (
                orig if variant == "baseline"
                else make_decode_step(variant))
            srv = ModernBatchServer(lm, total_pages=192)
            rng = np.random.RandomState(0)
            for i in range(B):
                srv.add(f"r{i}",
                        rng.randint(0, VOCAB, 24 + (i % 8)).tolist(),
                        SamplingParams(temperature=0.8))
            # compile BOTH call shapes now (captures this variant's patch;
            # later rounds only re-execute)
            with_retries(lambda: srv.step_many(N1))
            with_retries(lambda: srv.step_many(N2))
            servers[variant] = srv
            print(f"compiled {variant}", flush=True)
    finally:
        ModernBatchServer._decode_step = orig

    w1 = {v: [] for v in variants}
    w2 = {v: [] for v in variants}
    for rnd in range(5):
        for v in variants:
            srv = servers[v]
            t0 = time.perf_counter()
            with_retries(lambda: srv.step_many(N1))
            t1 = time.perf_counter()
            with_retries(lambda: srv.step_many(N2))
            t2 = time.perf_counter()
            w1[v].append(t1 - t0)
            w2[v].append(t2 - t1)
        print(f"round {rnd}: " + " ".join(
            f"{v}={(w2[v][-1] - w1[v][-1]) / (N2 - N1) * 1e6:.0f}"
            for v in variants), flush=True)

    results = {}
    for v in variants:
        dt = (min(w2[v]) - min(w1[v])) / (N2 - N1)
        results[v] = round(dt * 1e6, 1)
        print(f"{v:>20}: {dt * 1e6:.1f} us/step ({B / dt:.0f} tok/s)")
    return results


def phase_c():
    """Shippable candidates, interleaved + PAIRED per-round: the fast
    flatrope_nowrites program is not shippable (pool never written); the
    pipelined-write variants reproduce its tail structure with exact
    numerics. Paired per-round deltas vs baseline are the statistic (same
    window for all variants in a round)."""
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn
    from lamp_tpu.models import ModernBatchServer, SamplingParams

    lm = nn.ModernLM.init(
        vocab_size=VOCAB, context_length=512, num_blocks=L, embed_dim=D,
        num_heads=HQ, num_kv_heads=HKV, key=jax.random.PRNGKey(0),
        dtype=jnp.bfloat16,
    )
    orig_step = ModernBatchServer._decode_step
    orig_many = ModernBatchServer._decode_many
    variants = ("baseline", "flatrope_nowrites", "pipewrite",
                "flatrope_pipewrite")
    servers = {}
    try:
        for variant in variants:
            ModernBatchServer._decode_step = orig_step
            ModernBatchServer._decode_many = orig_many
            if variant == "flatrope_nowrites":
                ModernBatchServer._decode_step = make_decode_step(variant)
            elif "pipewrite" in variant:
                ModernBatchServer._decode_many = \
                    make_decode_many_pipelined(variant)
            srv = ModernBatchServer(lm, total_pages=192)
            rng = np.random.RandomState(0)
            for i in range(B):
                srv.add(f"r{i}",
                        rng.randint(0, VOCAB, 24 + (i % 8)).tolist(),
                        SamplingParams(temperature=0.8))
            with_retries(lambda: srv.step_many(N1))
            with_retries(lambda: srv.step_many(N2))
            servers[variant] = srv
            print(f"compiled {variant}", flush=True)
    finally:
        ModernBatchServer._decode_step = orig_step
        ModernBatchServer._decode_many = orig_many

    w1 = {v: [] for v in variants}
    w2 = {v: [] for v in variants}
    for rnd in range(5):
        for v in variants:
            srv = servers[v]
            t0 = time.perf_counter()
            with_retries(lambda: srv.step_many(N1))
            t1 = time.perf_counter()
            with_retries(lambda: srv.step_many(N2))
            t2 = time.perf_counter()
            w1[v].append(t1 - t0)
            w2[v].append(t2 - t1)
        print(f"round {rnd}: " + " ".join(
            f"{v}={(w2[v][-1] - w1[v][-1]) / (N2 - N1) * 1e6:.0f}"
            for v in variants), flush=True)

    results = {}
    base_rounds = [(b2 - b1) / (N2 - N1) * 1e6
                   for b1, b2 in zip(w1["baseline"], w2["baseline"])]
    for v in variants:
        dt = (min(w2[v]) - min(w1[v])) / (N2 - N1)
        rounds = [(b2 - b1) / (N2 - N1) * 1e6
                  for b1, b2 in zip(w1[v], w2[v])]
        paired = [r - b for r, b in zip(rounds, base_rounds)]
        results[v] = {"min_us": round(dt * 1e6, 1),
                      "rounds_us": [round(r, 0) for r in rounds],
                      "paired_delta_us": [round(d, 0) for d in paired]}
        print(f"{v:>20}: min {dt * 1e6:.1f} us/step; paired deltas "
              f"{[round(d) for d in paired]}")
    return results


def main():
    out = {}
    if "--c" in sys.argv[1:]:
        out["phase_c"] = phase_c()
        path = os.path.join(os.path.dirname(__file__),
                            "exp_glue_focus_c.json")
    else:
        out["phase_a"] = phase_a()
        out["phase_b"] = phase_b()
        path = os.path.join(os.path.dirname(__file__), "exp_glue_focus.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
