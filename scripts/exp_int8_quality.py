#!/usr/bin/env python
"""Quality gate for the int8 weight-only serving mode (VERDICT r4 task 8).

The bench pins int8 decode THROUGHPUT (~74k tok/s) but shipped no accuracy
evidence on a trained model. This script:

  1. trains the BENCH-SHAPED ModernLM (12L/768d, 12q/4kv heads, SwiGLU)
     as a byte-level LM on the reference's own LM corpus
     (lamp-data/src/test/resources/35-0.txt — The Time Machine, the corpus
     the reference's example-timemachine trains; train.scala reads it the
     same way) for a few hundred steps on the real TPU, so the logits have
     real structure (quantization agreement on RANDOM weights is
     meaningless — logits cluster near zero and argmax flips on noise);
  2. serves the SAME weights through the real engine three ways — bf16,
     ``quantize_bits=8``, ``quantize_bits=4`` — greedy-decoding held-out
     prose prompts;
  3. pins per-position token agreement and logit drift (max |delta| of
     log-softmax on the first decode step, plus its KL) into
     scripts/exp_int8_quality.json.

Usage: python scripts/exp_int8_quality.py    (real TPU, ~4 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

CORPUS = "/root/reference/lamp-data/src/test/resources/35-0.txt"
STEPS = 300
BATCH, CTX = 8, 256
N_PROMPTS, PROMPT_LEN, GEN = 16, 48, 64


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

    from lamp_tpu import nn, optim, train
    from lamp_tpu.models import ModernBatchServer

    with open(CORPUS, "rb") as f:
        raw = np.frombuffer(f.read(), np.uint8).astype(np.int32)
    n_valid = len(raw) // 10
    train_bytes, valid_bytes = raw[:-n_valid], raw[-n_valid:]

    model = with_retries(lambda: nn.ModernLM.init(
        vocab_size=256, context_length=512, num_blocks=12, embed_dim=768,
        num_heads=12, num_kv_heads=4, key=jax.random.PRNGKey(0),
        dtype=jnp.bfloat16,
    ))
    opt = optim.AdamW(3e-4, weight_decay=0.01)

    def loss_fn(m, batch, key, train_mode):
        tokens, target = batch
        loss = m.loss(tokens, target, key=key, train=train_mode)
        return loss, jnp.asarray(tokens.shape[0], jnp.float32), m

    state = train.TrainState.init(model, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))

    rng = np.random.RandomState(0)

    def batch_of(src):
        starts = rng.randint(0, len(src) - CTX - 1, BATCH)
        toks = np.stack([src[s:s + CTX] for s in starts])
        tgts = np.stack([src[s + 1:s + CTX + 1] for s in starts])
        return jnp.asarray(toks), jnp.asarray(tgts)

    print(f"training 12L/768d byte LM for {STEPS} steps ...", flush=True)
    t0 = time.time()
    first = last = None
    for i in range(STEPS):
        state, (loss, _) = with_retries(
            lambda: step(state, batch_of(train_bytes),
                         jax.random.fold_in(jax.random.PRNGKey(1), i)))
        if i == 0:
            first = float(loss)
        if i == STEPS - 1:
            last = float(loss)
    print(f"train loss {first:.3f} -> {last:.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    lm = state.model

    # held-out prose prompts
    prompts = []
    for i in range(N_PROMPTS):
        s = (i * 1009) % (len(valid_bytes) - PROMPT_LEN - 1)
        prompts.append([int(b) for b in valid_bytes[s:s + PROMPT_LEN]])

    def decode(bits, kv_dtype=None):
        """Greedy token streams + FIRST-step logits per mode.

        The logit probe runs on a FRESH server BEFORE any decoding so every
        mode sees the IDENTICAL prompt context — probing after step_many
        (as an earlier revision did) measures trajectory divergence of
        already-diverged greedy histories, not quantization noise; and the
        probe must keep the FULL [B, V] batch (a ``[0]`` once silently
        reduced the "mean over prompts" to prompt 0 — round-5 self-review).
        """
        kw = {} if kv_dtype is None else {"kv_dtype": kv_dtype}
        ids = [f"p{i}" for i in range(N_PROMPTS)]

        probe = ModernBatchServer(lm, total_pages=96,
                                  quantize_bits=bits, **kw)
        for i, p in enumerate(prompts):
            probe.add(ids[i], p)
        logits = np.asarray(
            probe._advance(ids, jnp.asarray(
                [probe.last_token[s] for s in ids], jnp.int32)), np.float64)

        srv = ModernBatchServer(lm, total_pages=96,
                                quantize_bits=bits, **kw)
        for i, p in enumerate(prompts):
            srv.add(ids[i], p)  # default SamplingParams: greedy
        toks = {s: [] for s in ids}
        for out in (srv.step_many(GEN),):
            for k, v in out.items():
                toks[k].extend(v)
        return toks, logits

    ref_toks, ref_logits = with_retries(lambda: decode(None))
    out = {"train_loss_first": round(first, 3),
           "train_loss_last": round(last, 3),
           "steps": STEPS, "prompts": N_PROMPTS, "gen_tokens": GEN,
           "model": "ModernLM 12L/768d 12q/4kv byte-vocab, bf16",
           "corpus": CORPUS}
    lse_r = ref_logits - np.log(
        np.exp(ref_logits - ref_logits.max(-1, keepdims=True)).sum(
            -1, keepdims=True)) - ref_logits.max(-1, keepdims=True)
    for bits, kvd, name in ((8, None, "int8"), (4, None, "int4"),
                            (None, "fp8", "fp8kv"),
                            (8, "fp8", "int8+fp8kv")):
        kv_dtype = jnp.float8_e4m3fn if kvd else None
        toks, logits = with_retries(
            lambda: decode(bits, kv_dtype=kv_dtype))
        agree = np.mean([
            np.mean(np.asarray(toks[k]) == np.asarray(ref_toks[k]))
            for k in ref_toks])
        # greedy decode diverges permanently after ONE flip; prefix length
        # before the first disagreement is the operative agreement metric
        prefix = np.mean([
            int(np.argmin(np.asarray(toks[k]) == np.asarray(ref_toks[k])))
            if not all(np.asarray(toks[k]) == np.asarray(ref_toks[k]))
            else GEN
            for k in ref_toks])
        lse_q = logits - np.log(
            np.exp(logits - logits.max(-1, keepdims=True)).sum(
                -1, keepdims=True)) - logits.max(-1, keepdims=True)
        kl = float(np.mean(np.sum(np.exp(lse_r) * (lse_r - lse_q), -1)))
        drift = float(np.mean(np.abs(lse_r - lse_q).max(-1)))
        out[name] = {
            "token_agreement": round(float(agree), 4),
            "mean_agreeing_prefix_of_64": round(float(prefix), 1),
            "mean_kl_first_step_nats": round(kl, 5),
            "mean_max_abs_logprob_drift": round(drift, 4),
        }
        print(f"{name}: agreement {agree:.3f}, prefix {prefix:.1f}/{GEN}, "
              f"KL {kl:.5f}, max|dlogp| {drift:.4f}", flush=True)

    path = os.path.join(os.path.dirname(__file__), "exp_int8_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
