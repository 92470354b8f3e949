#!/usr/bin/env python
"""Measure the serving-decode roofline on the real chip (VERDICT r2 item 4).

Times, at the exact bench.py serving workload (ModernLM 12L/768d, 12 q / 4 kv
heads, SwiGLU 2048, vocab 32k, bf16, B=32, paged KV 128-token pages):

  1. the full fused ``step_many`` engine step (steady state),
  2. a scan over JUST the per-step weight matmuls (qkv/o/w1/w3/w2 x 12 + lm
     head) at B=32 — the measured memory floor of the weight stream,
  3. the same matmul scan with int8 weights (what quantize_bits=8 buys),
  4. a scan over JUST the paged-attention kernel at the steady-state fill.

Writes docs/serving_headroom.md with the numbers + the analytic HBM roofline.

Usage: python scripts/serving_headroom.py   (real TPU; ~3 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, L, D, HQ, HKV, HD, HIDDEN, VOCAB = 32, 12, 768, 12, 4, 64, 2048, 32000
PAGE = 128
HBM_GBS = 819.0  # TPU v5e HBM bandwidth (publicly documented ~819 GB/s)


def with_retries(fn, attempts=4):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"retry after: {e!r}", file=sys.stderr)
            time.sleep(3.0)


N1, N2 = 8, 64


def diff_pairs(call, pairs=6):
    """Per-step seconds via the two-chain-length DIFFERENCE method:
    wall(n) = overhead + n*step, so step = (wall(N2)-wall(N1))/(N2-N1) and
    the per-call host-readback latency cancels EXACTLY — no assumed RTT.
    (Measured on this box: the readback a step_many call pays is ~43 ms,
    vs ~23 ms for a fresh scalar and ~0 for a cached one; subtracting any
    probed constant mis-states per-step time by hundreds of us at n=64.
    See scripts/exp_true_steptime.py.)

    MIN-based estimation: service jitter only ever INFLATES a wall reading
    of a fixed workload, so min per chain length is the least-contaminated
    estimate and differencing the mins still cancels the readback exactly.
    (Per-pair differencing + median is biased: a latency spike landing in
    the SHORT call makes that pair's difference too small — observed as
    NEGATIVE per-step times in bad tunnel windows.)"""
    call(N1), call(N2)  # compile both
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


def measure_at_least(fn, floor_us, name, attempts=3):
    """Re-measure while the result is BELOW its own HBM roofline — a
    physically impossible reading (the difference method degrades to noise
    when the tunnel has latency spikes between the paired calls). Returns
    the first plausible value, or raises if every attempt is impossible
    so a garbage number never lands in the committed doc."""
    last = None
    for i in range(attempts):
        last = fn()
        if last >= 0.9 * floor_us:
            return last
        print(f"{name}: {last:.0f} us is below the {floor_us:.0f} us HBM "
              f"roofline — impossible, re-measuring ({i + 1}/{attempts})",
              file=sys.stderr)
    raise RuntimeError(
        f"{name}: measured {last:.0f} us < roofline {floor_us:.0f} us "
        f"after {attempts} attempts; tunnel too unstable to trust")


def time_scan(fn, carry, reps=4):
    """Per-step seconds of one jitted chained step via diff_pairs."""
    import jax

    fns = {}

    def call(n):
        if n not in fns:
            fns[n] = jax.jit(lambda c: jax.lax.scan(
                lambda cc, _: (fn(cc), None), c, length=n)[0])
        out = fns[n](carry)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

    return diff_pairs(call, pairs=reps)


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn
    from lamp_tpu.models import ModernBatchServer, SamplingParams
    from lamp_tpu.ops.paged_attention import paged_attention
    from lamp_tpu.ops.quantization import quantize_int8

    key = jax.random.PRNGKey(0)

    # --- 1. full engine step (bench.py workload, steady state; context
    # 2048 so the interleaved 8/64-step timing pairs never cap out)
    lm = with_retries(lambda: nn.ModernLM.init(
        vocab_size=VOCAB, context_length=2048, num_blocks=L, embed_dim=D,
        num_heads=HQ, num_kv_heads=HKV, key=key, dtype=jnp.bfloat16))
    server = ModernBatchServer(lm, total_pages=32 * 16 + 8)
    rng = np.random.RandomState(0)
    for i in range(B):
        server.add(f"r{i}", rng.randint(0, VOCAB, 24 + (i % 8)).tolist(),
                   SamplingParams(temperature=0.8))
    with_retries(lambda: server.step_many(N1))  # warm the KV fill a bit
    # floor: bf16 weights (200MB) + KV must stream through HBM every step
    full_floor = (200.0 + 60.0) * 1e3 / HBM_GBS
    full_us = with_retries(lambda: measure_at_least(
        lambda: diff_pairs(lambda n: server.step_many(n)) * 1e6,
        full_floor, "full engine step"))
    print(f"full engine step: {full_us:.0f} us")

    # --- 2. weight-stream floor: just the decode matmuls, chained
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    wqkv = jax.random.normal(ks[0], (L, D, (HQ + 2 * HKV) * HD), jnp.bfloat16)
    wo = jax.random.normal(ks[1], (L, HQ * HD, D), jnp.bfloat16)
    w13 = jax.random.normal(ks[2], (L, 2, D, HIDDEN), jnp.bfloat16)
    w2 = jax.random.normal(ks[3], (L, HIDDEN, D), jnp.bfloat16)
    lmh = jax.random.normal(ks[4], (D, VOCAB), jnp.bfloat16)

    def matmul_stack(x):
        for li in range(L):
            y = jnp.matmul(x, wqkv[li], preferred_element_type=jnp.float32)
            a = y[:, :HQ * HD].astype(jnp.bfloat16)
            x = x + jnp.matmul(a, wo[li],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
            g1 = jnp.matmul(x, w13[li, 0], preferred_element_type=jnp.float32)
            g3 = jnp.matmul(x, w13[li, 1], preferred_element_type=jnp.float32)
            g = (jax.nn.silu(g1) * g3).astype(jnp.bfloat16)
            x = x + jnp.matmul(g, w2[li],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
        logits = jnp.matmul(x, lmh, preferred_element_type=jnp.float32)
        # feed a token-slot of the logits back so the scan has a real chain
        return x + logits[:, :D].astype(jnp.bfloat16) * 1e-6

    x0 = jax.random.normal(ks[5], (B, D), jnp.bfloat16)
    weight_mb = (wqkv.size + wo.size + w13.size + w2.size + lmh.size) * 2 / 1e6
    roof_us = weight_mb * 1e6 / (HBM_GBS * 1e3)
    mm_us = with_retries(lambda: measure_at_least(
        lambda: time_scan(matmul_stack, x0) * 1e6, roof_us, "matmul stack"))
    print(f"matmul stack: {mm_us:.0f} us (weights {weight_mb:.0f} MB, "
          f"HBM roofline {roof_us:.0f} us)")

    # --- 3. the same stack with int8 weights (+f32 scales)
    def q8(w):
        flat = w.reshape(-1, w.shape[-1])
        v, s = quantize_int8(flat, axis=0)
        return v.reshape(w.shape), s

    qkv_q = jax.vmap(lambda w: quantize_int8(w, axis=0))(wqkv)
    wo_q = jax.vmap(lambda w: quantize_int8(w, axis=0))(wo)
    w13_q = jax.vmap(jax.vmap(lambda w: quantize_int8(w, axis=0)))(w13)
    w2_q = jax.vmap(lambda w: quantize_int8(w, axis=0))(w2)
    lmh_q = quantize_int8(lmh, axis=0)

    def mm_q(x, wq):
        v, s = wq
        y = jnp.matmul(x.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y * s

    def matmul_stack_q(x):
        for li in range(L):
            y = mm_q(x, (qkv_q[0][li], qkv_q[1][li]))
            a = y[:, :HQ * HD].astype(jnp.bfloat16)
            x = x + mm_q(a, (wo_q[0][li], wo_q[1][li])).astype(jnp.bfloat16)
            g1 = mm_q(x, (w13_q[0][li, 0], w13_q[1][li, 0]))
            g3 = mm_q(x, (w13_q[0][li, 1], w13_q[1][li, 1]))
            g = (jax.nn.silu(g1) * g3).astype(jnp.bfloat16)
            x = x + mm_q(g, (w2_q[0][li], w2_q[1][li])).astype(jnp.bfloat16)
        logits = mm_q(x, lmh_q)
        return x + logits[:, :D].astype(jnp.bfloat16) * 1e-6

    q_mb = weight_mb / 2
    q_roof_us = q_mb * 1e6 / (HBM_GBS * 1e3)
    mm_q_us = with_retries(lambda: measure_at_least(
        lambda: time_scan(matmul_stack_q, x0) * 1e6, q_roof_us,
        "matmul stack int8"))
    print(f"matmul stack int8: {mm_q_us:.0f} us ({q_mb:.0f} MB, roofline "
          f"{q_roof_us:.0f} us)")

    # --- 4. paged attention alone at the steady-state fill (~150 tokens),
    # in the engine's LAYER-STACKED fused pool layout ([L*P, 2, page, F]:
    # one DMA per page moves K and V together; layer li addressed through
    # the kernel's static page_offset, never an XLA kv[li] slice — a slice
    # materializes a full-layer copy per layer per step as the pallas
    # operand and swamps the kernel)
    fill = 152
    pages_per_req = (fill + PAGE - 1) // PAGE
    n_pages = B * pages_per_req + 1
    kp = jax.random.normal(jax.random.PRNGKey(7),
                           (L * n_pages, 2, PAGE, HKV * HD), jnp.bfloat16)
    page_idx = jnp.arange(B * pages_per_req, dtype=jnp.int32).reshape(
        B, pages_per_req)
    pad = jnp.zeros((B, max(0, 8 - pages_per_req)), jnp.int32)
    page_idx = jnp.concatenate([page_idx, pad], axis=1)[:, :8]
    lengths = jnp.full((B,), fill, jnp.int32)

    def attn_chain(q):
        o = q
        for li in range(L):
            o = paged_attention(
                o, kp, None, page_idx, lengths,
                num_kv_heads=HKV, pages_per_block=server.pages_per_block,
                page_offset=li * n_pages,
            )
        return o * (1.0 + 1e-6)

    q0 = jax.random.normal(jax.random.PRNGKey(9), (B, HQ, HD), jnp.bfloat16)
    kv_mb = B * fill * HKV * HD * 2 * 2 * L / 1e6
    att_us = with_retries(lambda: measure_at_least(
        lambda: time_scan(attn_chain, q0) * 1e6,
        kv_mb * 1e6 / (HBM_GBS * 1e3), "paged attention"))
    print(f"paged attention x12 @ fill {fill}: {att_us:.0f} us "
          f"(KV touched {kv_mb:.0f} MB, roofline "
          f"{kv_mb * 1e6 / (HBM_GBS * 1e3):.0f} us)")

    other_us = full_us - mm_us - att_us
    doc = f"""# Serving decode headroom (measured on the layer-stacked-pool engine, round 4)

Workload: bench.py `bench_serving` — ModernLM 12L/768d, 12q/4kv heads,
SwiGLU 2048, vocab 32k, bf16, B=32 continuous batching, paged KV
(128-token pages), fused `step_many(64)` scan. TPU v5e (HBM ~{HBM_GBS:.0f}
GB/s). All numbers are per-step medians measured by the two-chain-length
DIFFERENCE method (wall(64) − wall(8)) / 56, which cancels the axon
tunnel's per-call host-readback latency exactly (~43 ms for a step_many
call on this box — assuming ANY fixed RTT mis-states per-step time by
hundreds of µs; see scripts/exp_true_steptime.py).

| component | measured µs/step | bytes/step | HBM roofline µs |
|---|---|---|---|
| full engine step (`step_many`) | {full_us:.0f} | — | — |
| weight matmul stack (bf16) | {mm_us:.0f} | {weight_mb:.0f} MB | {roof_us:.0f} |
| weight matmul stack (int8) | {mm_q_us:.0f} | {q_mb:.0f} MB | {q_mb * 1e6 / (HBM_GBS * 1e3):.0f} |
| paged attention ×12 @ fill {fill} | {att_us:.0f} | {kv_mb:.0f} MB KV | {kv_mb * 1e6 / (HBM_GBS * 1e3):.0f} |
| everything else (norms, RoPE, KV writes, sampling, bookkeeping) | {other_us:.0f} | — | — |

Decode throughput = 32 tokens / step-time:
- measured full step: {full_us:.0f} µs → {32 / full_us * 1e6:,.0f} tok/s
- perfect-overlap HBM roofline (bf16 weights + KV):
  {roof_us + kv_mb * 1e6 / (HBM_GBS * 1e3):.0f} µs → {32 / (roof_us + kv_mb * 1e6 / (HBM_GBS * 1e3)) * 1e6:,.0f} tok/s

So the engine runs at {100 * (roof_us + kv_mb * 1e6 / (HBM_GBS * 1e3)) / full_us:.0f}% of the
HBM roofline (run-to-run tunnel variance on the full step is ~±15%: the
same engine measured 480/577/680 µs across three round-3 sessions; the
component rows are independently measured and need not sum exactly).
The weight stream dominates and is {100 * roof_us / mm_us:.0f}%
HBM-efficient against the NOMINAL 819 GB/s ({mm_us:.0f} µs vs {roof_us:.0f} µs
— above 100% means effective bandwidth beats the spec number), so the
remaining levers are (a) shrinking the weight roofline itself — int8
weights measure {mm_q_us:.0f} µs ({mm_us / mm_q_us:.2f}× vs bf16), available via
`ModernBatchServer(..., quantize_bits=8)` — and (b) the paged-attention
gap ({att_us:.0f} µs vs {kv_mb * 1e6 / (HBM_GBS * 1e3):.0f} µs roofline: per-page
DMA-programming overhead, {32 * 12:.0f}+ async copies per layer at this fill).

Generated by scripts/serving_headroom.py.
"""
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "serving_headroom.md")
    # preserve hand-written sections appended after the generated block
    # (anything below the "Generated by" line, e.g. the fused-pool history)
    tail = ""
    if os.path.exists(out):
        with open(out) as fh:
            prev = fh.read()
        marker = "Generated by scripts/serving_headroom.py.\n"
        if marker not in prev:
            # the marker sentence was reworded/removed: overwriting now
            # would silently discard every hand-written section below it
            raise RuntimeError(
                f"{out} exists but lacks the marker line {marker!r}; "
                "refusing to overwrite (hand-written tail would be lost). "
                "Re-add the marker or move the hand-written sections.")
        tail = prev.split(marker, 1)[1]
    with open(out, "w") as fh:
        fh.write(doc + tail)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
