#!/usr/bin/env python
"""LoRA fine-tuning demo: adapt a (frozen) byte-level LM to new text.

Injects rank-r adapters into the attention/MLP projections of a GPT-style
LM, freezes everything else (embeddings via ``nn.Frozen``), trains only the
adapters with the standard train step, then merges them back into plain
Linears for serving.

Usage: python examples/lora_finetune.py --steps 200 --rank 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="loop-state checkpoint of the base model")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--context", type=int, default=128)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--text", default=None,
                    help="path to fine-tuning text (default: built-in)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lamp_tpu import io as lio, nn, optim, train

    model = nn.LanguageModelModule.init(
        vocab_size=256, context_length=args.context, num_blocks=args.layers,
        embed_dim=args.dim, attention_heads=args.heads,
        key=jax.random.PRNGKey(0),
    )
    if args.checkpoint and os.path.exists(args.checkpoint):
        opt0 = optim.AdamW(1e-3)
        t = train.TrainState.init(model, opt0)
        loaded, _ = lio.load_loop_state(
            args.checkpoint, model_template=t.model,
            optimizer_state_template=t.opt_state,
        )
        model = loaded["model"]
        print("loaded base checkpoint")

    # adapters on every attention/MLP projection; embeddings frozen
    tuned = nn.lora_inject(
        model, rank=args.rank, key=jax.random.PRNGKey(1),
        match=lambda p: any(s in p for s in ("w_q", "w_k", "w_v", "w_o",
                                             "w1", "w2")),
    )
    tuned = tuned.replace(
        token_embedding=nn.Frozen(tuned.token_embedding),
        position_embedding=nn.Frozen(tuned.position_embedding),
    )
    n_total = nn.parameter_count(model)
    n_adapt = nn.lora_parameter_count(tuned)
    print(f"trainable adapter params: {n_adapt:,} "
          f"({100 * n_adapt / n_total:.2f}% of {n_total:,})")

    if args.text and os.path.exists(args.text):
        corpus = np.frombuffer(
            open(args.text, "rb").read(), np.uint8
        ).astype(np.int32)
    else:
        corpus = np.frombuffer(
            (b"the lazy brown fox jumped over the quick dog. " * 400),
            np.uint8,
        ).astype(np.int32)

    opt = optim.AdamW(args.lr, weight_decay=0.0)

    def loss_fn(m, batch, key, train_mode):
        tokens, target = batch
        logits, new_m = m.forward(tokens, key=key, train=train_mode)
        return nn.lm_loss(logits, target), jnp.float32(tokens.shape[0]), new_m

    state = train.TrainState.init(tuned, opt)
    step = jax.jit(train.make_train_step(opt, loss_fn), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    ctx = args.context
    t0 = time.perf_counter()
    for i in range(args.steps):
        starts = rng.randint(0, len(corpus) - ctx - 1, args.batch)
        tok = np.stack([corpus[s:s + ctx] for s in starts])
        tgt = np.stack([corpus[s + 1:s + ctx + 1] for s in starts])
        state, (loss, _) = step(
            state, (jnp.asarray(tok), jnp.asarray(tgt)), jax.random.PRNGKey(i)
        )
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f}")
    print(f"trained {args.steps} steps in {time.perf_counter() - t0:.1f}s")

    # merge for serving: plain Linears again, identical outputs
    merged = nn.lora_merge(state.model)
    merged = merged.replace(
        token_embedding=merged.token_embedding.inner,
        position_embedding=merged.position_embedding.inner,
    )
    from lamp_tpu.models import generate

    out = generate(merged, jnp.asarray([list(b"the lazy ")], jnp.int32),
                   40, temperature=0.0)
    print("sample:", bytes(out[0].tolist()).decode("utf-8", "replace"))


if __name__ == "__main__":
    main()
