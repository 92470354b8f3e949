"""Experiment: does chaining K train steps into one dispatch (lax.scan)
beat the per-step dispatch loop in bench.py's workload on the real TPU?

Per CLAUDE.md: each host readback costs ~30ms through the axon tunnel and
dispatches may not pipeline perfectly; bench.py already chains via donated
state but still issues 15 Python dispatches. This measures both.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu import nn, optim, train

key = jax.random.PRNGKey(0)
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


rng = np.random.RandomState(0)
tokens = jnp.asarray(rng.randint(0, VOCAB, (ACCUM, BATCH, CTX)).astype(np.int32))
target = jnp.roll(tokens, -1, axis=2)
batch = (tokens, target)
rk = jax.random.PRNGKey(1)
ITERS = 15

# --- A: per-step dispatch loop (current bench.py) -------------------------
state = train.TrainState.init(model, opt)
step = jax.jit(
    train.make_train_step(opt, loss_fn, accumulation_steps=ACCUM),
    donate_argnums=(0,),
)
for _ in range(3):
    state, (loss, _) = step(state, batch, rk)
float(loss)
t0 = time.perf_counter()
for _ in range(ITERS):
    state, (loss, _) = step(state, batch, rk)
float(loss)
dt_a = time.perf_counter() - t0 - 0.03
print(f"A per-step loop: {ACCUM*BATCH*CTX*ITERS/dt_a:,.0f} tok/s  ({dt_a/ITERS*1e3:.1f} ms/step)")

# --- B: chained lax.scan over ITERS steps ---------------------------------
del state, step
state = train.TrainState.init(model, opt)
chained = jax.jit(
    train.make_chained_train_step(opt, loss_fn, accumulation_steps=ACCUM),
    donate_argnums=(0,),
)
stacked = jax.tree_util.tree_map(
    lambda x: jnp.broadcast_to(x[None], (ITERS,) + x.shape), batch
)
state, (loss, _) = chained(state, stacked, rk)
float(loss)
t0 = time.perf_counter()
state, (loss, _) = chained(state, stacked, rk)
float(loss)
dt_b = time.perf_counter() - t0 - 0.03
print(f"B chained scan:  {ACCUM*BATCH*CTX*ITERS/dt_b:,.0f} tok/s  ({dt_b/ITERS*1e3:.1f} ms/step)")
print(f"speedup B/A: {dt_a/dt_b:.3f}x")
