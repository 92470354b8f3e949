"""Benchmark suite: north-star metrics on the real TPU chip.

Headline metric (the JSON line's ``value``): GPT-LM training throughput in
tokens/sec/chip at the reference's exact flagship config — 12 layers /
768 dim / 12 heads, context 384, byte vocab 256, bf16 params with f32 AdamW
master state, batch 8 x 5 gradient accumulation
(reference example-autoregressivelm model.scala:23-27, CliConfig.scala:12-24).
Tokens are random — throughput does not depend on token values; loss curves
are validated elsewhere (tests/test_e2e_parity.py, examples/).

The SAME JSON line also carries an ``extra`` object with the other
BASELINE.json north-star metrics so regressions are visible round over round:
  - ``lm_mfu``: model-FLOPs utilization of the headline workload
    (6*N_params + 12*L*d_model*ctx per token, vs the chip's bf16 peak)
  - ``cifar100_epoch_seconds`` / ``cifar100_images_per_sec``: steady-state
    epoch time for the CIFAR-100 residual convnet at batch 256
    (reference run_cifar.sh, example-cifar100 cifar100.scala:28-300)
  - ``serving_decode_tokens_per_sec``: continuous-batching paged-KV decode,
    32 concurrent requests on a 12L/768d GQA ModernLM (bf16)

``vs_baseline`` compares the headline value against the BEST prior round
(max over all recorded BENCH_r*.json), so a regression in round N can never
re-baseline round N+1 downward.

Each phase retries on the axon tunnel's intermittent "TPU backend error"
(service-side flakiness, see CLAUDE.md); a phase that still fails reports an
error string in ``extra`` instead of zeroing the whole benchmark.
"""

import glob
import json
import os
import sys
import time

# BENCH_SMOKE=1 shrinks every phase to toy shapes/iteration counts so the
# full script (timing structure, estimators, JSON assembly) can be driven
# end-to-end on CPU in ~a minute. Numbers produced under smoke are
# meaningless; the flag exists so bench-harness changes are testable
# without the real chip (.claude/skills/verify/SKILL.md).
SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0") or "0"))

# Persistent compilation cache (real-TPU runs only — the CPU backend's AOT
# cache entries are machine-feature-pinned and warn on reload): re-runs and
# the serving phase's repeated fresh-server measurement, which re-jits
# per-instance bound methods, skip the ~30-60s remote compiles.
if os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_readback_rtt():
    """Host<->device round-trip of a FRESH scalar readback through the axon
    tunnel (~23-30ms); subtracted once from chained-step timings whose final
    sync is a scalar read. Must be a fresh value each probe — re-reading the
    same buffer hits a host-side cache and measures ~0. Measured, not
    hard-coded, so tunnel-latency drift does not skew results."""
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
    rtt = min(ts)
    return rtt if 0.0005 < rtt < 1.0 else 0.03


def peak_flops():
    """bf16 peak of the attached chip (TPU v5e: 197 TFLOP/s bf16)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 197e12, "v5litepod": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12}
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12


def with_retries(fn, name, attempts=3):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # axon flake: retry; real bug: surfaces thrice
            log(f"{name}: attempt {i + 1} failed: {e!r}")
            if i == attempts - 1:
                return {"error": f"{type(e).__name__}: {e}"[:200]}
            time.sleep(2.0)


def bench_lm(rtt):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lamp_tpu import nn, optim, train

    BATCH, CTX, VOCAB, ACCUM, LAYERS, DIM = 8, 384, 256, 5, 12, 768
    if SMOKE:
        BATCH, CTX, ACCUM, LAYERS, DIM = 2, 64, 2, 2, 128
    model = nn.LanguageModelModule.init(
        vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
        embed_dim=DIM, attention_heads=2 if SMOKE else 12,
        key=jax.random.PRNGKey(0), dtype=jnp.bfloat16, dropout=0.0,
    )
    opt = optim.AdamW(3e-4, weight_decay=0.01)

    def loss_fn(model, batch, key, train_mode):
        tokens, target = batch
        logits, new_model = model.forward(tokens, key=key, train=train_mode)
        return (nn.lm_loss(logits, target),
                jnp.asarray(tokens.shape[0], jnp.float32), new_model)

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(model)
        if hasattr(x, "size")
    )
    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn, accumulation_steps=ACCUM),
                   donate_argnums=(0,))

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, VOCAB, (ACCUM, BATCH, CTX)).astype(np.int32))
    batch = (tokens, jnp.roll(tokens, -1, axis=2))
    rk = jax.random.PRNGKey(1)

    for _ in range(3):  # warmup/compile
        state, (loss, _) = step(state, batch, rk)
    float(loss)

    # Best-of-3 timed windows: the axon tunnel's service throughput drifts
    # 5-15% on identical code (docs/bench_variance.md), so a single window
    # conflates service jitter with code speed. Each window is itself an
    # average over 15 chained steps (~1s of device work); the min window
    # is the standard timeit-style estimate of the code's capability.
    iters = 2 if SMOKE else 15
    dt = None
    for _ in range(2 if SMOKE else 3):
        t0 = time.perf_counter()
        for _ in range(iters):  # steps chain through donated state
            state, (loss, _) = step(state, batch, rk)
        float(loss)  # one sync at the end
        w = time.perf_counter() - t0 - rtt
        dt = w if dt is None else min(dt, w)

    tok_s = ACCUM * BATCH * CTX * iters / dt / jax.device_count()
    # standard MFU convention: model FLOPs only (6*N per token for fwd+bwd
    # of the matmuls + attention score/value term), not actual-HLO FLOPs
    flops_per_tok = 6 * n_params + 12 * LAYERS * DIM * CTX
    mfu = tok_s * flops_per_tok / peak_flops()
    log(f"lm: {tok_s:.0f} tok/s/chip, mfu={mfu:.3f} (n_params={n_params/1e6:.1f}M)")

    # Same step with the fused Pallas AdamWStochastic (bf16-native params,
    # stochastic rounding, no f32 master copy — 24 B/param optimizer
    # stream vs plain AdamW's 30): measured ~2.5% faster end-to-end
    # (docs/lm_step_headroom.md). Kept as an EXTRA — the headline stays on
    # master-weight AdamW for strict reference comparability.
    if SMOKE:
        # the stochastic-rounding kernel needs pltpu.prng_seed, which has
        # no CPU interpreter lowering
        return {"tokens_per_sec_per_chip": round(tok_s, 1),
                "mfu": round(mfu, 4)}
    try:
        from lamp_tpu.ops.fused_adamw import AdamWStochastic
        opt_f = AdamWStochastic(3e-4, weight_decay=0.01)
        # (this extra only runs off-SMOKE — the early return above — so
        # the shapes are hard-coded to the non-smoke flagship config)
        model_f = nn.LanguageModelModule.init(
            vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
            embed_dim=DIM, attention_heads=12,
            key=jax.random.PRNGKey(0), dtype=jnp.bfloat16, dropout=0.0,
        )
        state_f = train.TrainState.init(model_f, opt_f)
        step_f = jax.jit(
            train.make_train_step(opt_f, loss_fn, accumulation_steps=ACCUM),
            donate_argnums=(0,))
        for _ in range(3):
            state_f, (loss, _) = step_f(state_f, batch, rk)
        float(loss)
        dt_f = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                state_f, (loss, _) = step_f(state_f, batch, rk)
            float(loss)
            w = time.perf_counter() - t0 - rtt
            dt_f = w if dt_f is None else min(dt_f, w)
        tok_s_f = ACCUM * BATCH * CTX * iters / dt_f / jax.device_count()
        log(f"lm fused-opt: {tok_s_f:.0f} tok/s/chip "
            f"(mfu={tok_s_f * flops_per_tok / peak_flops():.3f})")
        return {"tokens_per_sec_per_chip": round(tok_s, 1),
                "mfu": round(mfu, 4),
                "tokens_per_sec_fused_opt": round(tok_s_f, 1)}
    except Exception as e:  # the EXTRA must never zero the headline
        log(f"lm fused-opt extra failed (headline unaffected): {e!r}")
        return {"tokens_per_sec_per_chip": round(tok_s, 1),
                "mfu": round(mfu, 4)}


def bench_lm_longctx(rtt):
    """ctx-4096 flagship-width LM train microbench: the standing hardware
    number for the FLASH attention path (the headline ctx-384 workload
    dispatches to XLA attention and serving to the paged kernel, so
    without this no pinned workload exercised flash on the real chip —
    VERDICT r3 item 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lamp_tpu import nn, optim, train

    BATCH, CTX, VOCAB, LAYERS, DIM = 2, 4096, 256, 12, 768
    if SMOKE:
        BATCH, CTX, LAYERS, DIM = 1, 256, 2, 128
    model = nn.LanguageModelModule.init(
        vocab_size=VOCAB, context_length=CTX, num_blocks=LAYERS,
        embed_dim=DIM, attention_heads=2 if SMOKE else 12,
        key=jax.random.PRNGKey(0), dtype=jnp.bfloat16, dropout=0.0,
    )
    opt = optim.AdamW(3e-4, weight_decay=0.01)

    def loss_fn(model, batch, key, train_mode):
        tokens, target = batch
        logits, nm = model.forward(tokens, key=key, train=train_mode)
        return (nn.lm_loss(logits, target),
                jnp.asarray(tokens.shape[0], jnp.float32), nm)

    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, VOCAB, (BATCH, CTX)).astype(np.int32))
    batch = (tokens, jnp.roll(tokens, -1, axis=1))
    rk = jax.random.PRNGKey(1)
    for _ in range(2):
        state, (loss, _) = step(state, batch, rk)
    float(loss)
    iters = 2 if SMOKE else 10
    dt = None
    for _ in range(2 if SMOKE else 3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, (loss, _) = step(state, batch, rk)
        float(loss)
        w = time.perf_counter() - t0 - rtt
        dt = w if dt is None else min(dt, w)
    tok_s = BATCH * CTX * iters / dt
    log(f"lm ctx4096 (flash path): {tok_s:.0f} tok/s")
    return {"tokens_per_sec": round(tok_s, 1)}


def bench_cifar(rtt):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lamp_tpu import models, nn, optim, train

    BATCH, K = 256, 16  # K optimizer steps fused per dispatch (lax.scan)
    if SMOKE:
        BATCH, K = 8, 2
    model = models.resnet_cifar(100, key=jax.random.PRNGKey(0), dropout=0.0)
    opt = optim.AdamW(1e-3, weight_decay=1e-4)

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        out, nm = m.forward(xx, key=key, train=train_mode)
        return (nn.losses.nll_loss(out, yy),
                jnp.asarray(xx.shape[0], jnp.float32), nm)

    state = train.TrainState.init(model, opt)
    chained = jax.jit(train.make_chained_train_step(opt, loss_fn),
                      donate_argnums=(0,))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(K, BATCH, 3, 32, 32).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 100, (K, BATCH)).astype(np.int32))
    rk = jax.random.PRNGKey(1)

    state, (loss, _) = chained(state, (x, y), rk)
    float(loss)  # compile + sync

    # best-of-3 windows vs tunnel jitter (see bench_lm / bench_variance.md)
    calls = 2 if SMOKE else 6
    dt = None
    for _ in range(2 if SMOKE else 3):
        t0 = time.perf_counter()
        for _ in range(calls):
            state, (loss, _) = chained(state, (x, y), rk)
        float(loss)
        w = time.perf_counter() - t0 - rtt
        dt = w if dt is None else min(dt, w)

    img_s = K * BATCH * calls / dt
    epoch_s = 50000.0 / img_s  # CIFAR-100 train split
    log(f"cifar100: {img_s:.0f} img/s, epoch={epoch_s:.2f}s")
    return {"images_per_sec": round(img_s, 1),
            "epoch_seconds": round(epoch_s, 3)}


def bench_serving(rtt):
    """Steady-state continuous-batching decode at B=32 on the recorded
    workload (README perf table): llama-style ModernLM 12L/768d GQA,
    vocab 32k, ctx 512, paged KV (128-token pages), on-device sampling
    and token emission via the fused multi-step ``step_many`` path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lamp_tpu import nn
    from lamp_tpu.models import ModernBatchServer, SamplingParams

    n_req, vocab = (4, 512) if SMOKE else (32, 32000)
    lm = nn.ModernLM.init(
        vocab_size=vocab, context_length=512,
        num_blocks=2 if SMOKE else 12, embed_dim=128 if SMOKE else 768,
        num_heads=2 if SMOKE else 12, num_kv_heads=2 if SMOKE else 4,
        key=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
    )

    # Two-chain-length DIFFERENCE timing: each step_many call ends in one
    # host readback of the emitted tokens, whose latency through the axon
    # tunnel is large and not a property of the engine (~43ms measured for
    # this call shape — bigger than the scalar-probe rtt, so subtracting
    # the probed constant would still mis-state per-step time; see
    # scripts/exp_true_steptime.py). Timing the same call at n=8 and n=64
    # and differencing cancels the readback exactly:
    # step = (wall(64) - wall(8)) / 56.
    n1, n2 = (2, 6) if SMOKE else (8, 64)

    def measure(bits):
        """ONE full measurement on a FRESH server (fill starts at the
        prompts, grows identically every time — repeats are comparable
        with each other and with prior rounds' single-pass protocol).
        Service jitter only ever INFLATES a wall reading, so
        min-per-call-shape is the least-contaminated estimate; the two
        mins are then differenced (min of per-pair differences would be
        biased: jitter landing in the n=8 call deflates that pair).
        4 pairs: warmup (72) + 4*72 = 360 decode steps, safely under every
        request's ~480-token budget (ctx 512 - prompt), so emission per
        pair stays the full B*(n2-n1)."""
        server = ModernBatchServer(lm, total_pages=24 if SMOKE else 192,
                                   quantize_bits=bits)
        rng = np.random.RandomState(0)
        for i in range(n_req):
            server.add(f"r{i}",
                       rng.randint(0, vocab, 24 + (i % 8)).tolist(),
                       SamplingParams(temperature=0.8))
        server.step_many(n1)  # compile (B=32, n=8)
        server.step_many(n2)  # compile (B=32, n=64)
        w1, w2 = [], []
        toks = None
        for _ in range(2 if SMOKE else 4):
            t0 = time.perf_counter()
            out1 = server.step_many(n1)
            t1 = time.perf_counter()
            out2 = server.step_many(n2)
            t2 = time.perf_counter()
            w1.append(t1 - t0)
            w2.append(t2 - t1)
            toks = (sum(len(v) for v in out2.values())
                    - sum(len(v) for v in out1.values()))
        return toks / (min(w2) - min(w1))

    # Repeat the whole measurement on fresh servers and keep the BEST
    # (fastest) reading: the serving calls are ~tens of ms, short enough
    # that a sustained slow-service patch contaminates all 4 pairs of one
    # repeat (observed 33k vs 46k for identical code in one night); the
    # max across repeats estimates code capability, exactly like the LM
    # phase's best-of-3 windows. Per-instance jits recompile per repeat —
    # amortized by the persistent compilation cache.
    #
    # bf16 and int8 measures INTERLEAVE (bf16, int8, bf16, int8, ...): each
    # adjacent pair shares the same service window, so the per-pair ratio
    # pins the int8 SPEEDUP itself even when the absolute numbers drift
    # (VERDICT r4 weak #2 — the ratio cancels tunnel drift; the absolute
    # numbers don't).
    reps = 1 if SMOKE else 3
    bf16_vals, int8_vals = [], []
    for _ in range(reps):
        b16 = with_retries(lambda: measure(None), "serving bf16")
        bf16_vals.append(b16)
        if not isinstance(b16, float):
            # this rep's bf16 failed (tunnel window): skip its int8 twin —
            # the paired ratio needs same-window pairs, and if every rep
            # fails the minutes of int8 measurement would be discarded by
            # the error return below. None keeps the pairing aligned.
            int8_vals.append(None)
            continue
        int8_vals.append(with_retries(lambda: measure(8), "serving int8"))

    ok16 = [v for v in bf16_vals if isinstance(v, float)]
    if not ok16:
        return {"error": bf16_vals[-1].get("error", "serving failed")}
    tok_s = max(ok16)
    log(f"serving: {tok_s:.0f} decode tok/s (B=32, 12L/768d GQA vocab 32k "
        f"bf16, best of {reps})")

    # int8 weight-only mode: the measured ~1.9x weight-stream lever
    # (docs/serving_headroom.md); quality is gated by
    # tests/test_serving.py::test_modern_serving_quantized_decode and the
    # trained-model artifact scripts/exp_int8_quality.json
    ok8 = [v for v in int8_vals if isinstance(v, float)]
    if not ok8:
        last = next((v for v in reversed(int8_vals)
                     if isinstance(v, dict)), None)
        return {"decode_tokens_per_sec": round(tok_s, 1),
                "int8_error": (last or {}).get("error", "failed")}
    tok_s8 = max(ok8)
    ratios = [i8 / b16 for b16, i8 in zip(bf16_vals, int8_vals)
              if isinstance(b16, float) and isinstance(i8, float)]
    ratio = sorted(ratios)[len(ratios) // 2] if ratios else None
    log(f"serving int8: {tok_s8:.0f} decode tok/s (same workload, "
        f"weight-only int8, best of {reps}; paired same-window speedup "
        f"{ratio:.2f}x)" if ratio else
        f"serving int8: {tok_s8:.0f} decode tok/s")
    out = {"decode_tokens_per_sec": round(tok_s, 1),
           "decode_tokens_per_sec_int8": round(tok_s8, 1)}
    if ratio:
        out["int8_speedup_paired"] = round(ratio, 3)
    return out


def best_prior_headline():
    """Best lm tokens/s/chip over every recorded round — never re-baseline
    downward from a regressed round."""
    best = None
    here = os.path.dirname(__file__) or "."
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                doc = json.load(f)
            doc = doc.get("parsed", doc)
            v = float(doc.get("value") or 0)
            if v and (best is None or v > best):
                best = v
        except Exception:
            pass
    return best


def main():
    # the axon tunnel's intermittent allocation failure can hit even the
    # first jnp.zeros of the RTT probe — retry it like every other phase,
    # falling back to the long-observed 30ms on persistent failure
    rtt = with_retries(measure_readback_rtt, "rtt")
    if not isinstance(rtt, float):
        rtt = 0.03
    log(f"readback rtt: {rtt * 1000:.1f} ms")

    lm = with_retries(lambda: bench_lm(rtt), "lm")
    longctx = with_retries(lambda: bench_lm_longctx(rtt), "lm_ctx4096")
    cifar = with_retries(lambda: bench_cifar(rtt), "cifar100")
    serving = with_retries(lambda: bench_serving(rtt), "serving")

    value = float(lm.get("tokens_per_sec_per_chip", 0.0))
    prior = best_prior_headline()
    vs_baseline = value / prior if (prior and value) else 1.0

    print(json.dumps({
        "metric": "lm_train_tokens_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "extra": {
            "lm_mfu": lm.get("mfu", lm.get("error")),
            "lm_tokens_per_sec_fused_opt": lm.get(
                "tokens_per_sec_fused_opt"),
            "lm_ctx4096_tokens_per_sec": longctx.get(
                "tokens_per_sec", longctx.get("error")),
            "cifar100_epoch_seconds": cifar.get("epoch_seconds",
                                                cifar.get("error")),
            "cifar100_images_per_sec": cifar.get("images_per_sec"),
            "serving_decode_tokens_per_sec": serving.get(
                "decode_tokens_per_sec", serving.get("error")),
            "serving_decode_tokens_per_sec_int8": serving.get(
                "decode_tokens_per_sec_int8"),
            "serving_int8_speedup_paired": serving.get(
                "int8_speedup_paired"),
        },
    }))


if __name__ == "__main__":
    main()
