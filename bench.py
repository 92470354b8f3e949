"""Benchmark: flagship GPT-LM training throughput (tokens/sec/chip).

Matches the reference's headline perf workload — the autoregressive LM at
12 layers / 768 dim / 12 heads, context 384, byte-level vocab 256, bf16
params with f32 AdamW master state, batch 8
(reference example-autoregressivelm model.scala:23-27, CliConfig.scala:12-24).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the previous round's recorded number
(BENCH_r*.json) when available, else 1.0.
"""

import glob
import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from lamp_tpu import nn, optim, train

    key = jax.random.PRNGKey(0)
    # the reference's exact training config: batch 8 x 5 gradient-accumulation
    # sub-batches (CliConfig.scala:12-24), ctx 384, byte vocab, bf16 params
    BATCH, CTX, VOCAB, ACCUM = 8, 384, 256, 5
    model = nn.LanguageModelModule.init(
        vocab_size=VOCAB, context_length=CTX, num_blocks=12, embed_dim=768,
        attention_heads=12, key=key, dtype=jnp.bfloat16, dropout=0.0,
    )
    opt = optim.AdamW(3e-4, weight_decay=0.01)

    def loss_fn(model, batch, key, train_mode):
        tokens, target = batch
        logits, new_model = model.forward(tokens, key=key, train=train_mode)
        return (
            nn.lm_loss(logits, target),
            jnp.asarray(tokens.shape[0], jnp.float32),
            new_model,
        )

    state = train.TrainState.init(model, opt)
    step = jax.jit(
        train.make_train_step(opt, loss_fn, accumulation_steps=ACCUM),
        donate_argnums=(0,),
    )

    import numpy as np

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(
        rng.randint(0, VOCAB, (ACCUM, BATCH, CTX)).astype(np.int32)
    )
    target = jnp.roll(tokens, -1, axis=2)
    batch = (tokens, target)
    rk = jax.random.PRNGKey(1)

    # warmup / compile; loss readback forces true device sync (through the
    # axon tunnel block_until_ready alone does not wait for execution)
    for _ in range(3):
        state, (loss, _) = step(state, batch, rk)
    float(loss)

    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, (loss, _) = step(state, batch, rk)
    float(loss)  # steps chain through donated state; one sync at the end
    dt = time.perf_counter() - t0 - 0.03  # subtract the readback round trip

    tokens_per_sec = ACCUM * BATCH * CTX * iters / dt
    n_chips = jax.device_count()
    value = tokens_per_sec / n_chips

    vs_baseline = 1.0
    prior = sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                          "BENCH_r*.json")))
    if prior:
        try:
            with open(prior[-1]) as f:
                doc = json.load(f)
            if doc.get("value"):
                vs_baseline = value / float(doc["value"])
        except Exception:
            pass

    print(json.dumps({
        "metric": "lm_train_tokens_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
