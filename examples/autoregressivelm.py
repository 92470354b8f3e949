#!/usr/bin/env python
"""Byte-level GPT autoregressive language model: train / generate.

Mirrors the reference example-autoregressivelm
(example-autoregressivelm/src/main/scala/lamp/example/lm/{model,train,
inference,DistributedTrain}.scala): 12-layer/768-dim/12-head GPT, bf16
params, context 384, byte vocab 256 (optional BPE), AdamW with per-tag weight
decay, gradient accumulation, checkpoint resume, temperature sampling. The
reference's NCCL DDP flags are replaced by the --mesh flag (SPMD dp x tp over
all visible devices).

Usage:
  python examples/autoregressivelm.py train --corpus file.txt --steps 1000
  python examples/autoregressivelm.py generate --checkpoint ck --prompt "The "
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_model(args, key):
    import jax.numpy as jnp

    from lamp_tpu import nn

    return nn.LanguageModelModule.init(
        vocab_size=args.vocab_size,
        context_length=args.context,
        num_blocks=args.layers,
        embed_dim=args.dim,
        attention_heads=args.heads,
        dropout=args.dropout,
        key=key,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--layers", type=int, default=12)
        p.add_argument("--dim", type=int, default=768)
        p.add_argument("--heads", type=int, default=12)
        p.add_argument("--context", type=int, default=384)
        p.add_argument("--vocab-size", type=int, default=256)
        p.add_argument("--dropout", type=float, default=0.0)
        p.add_argument("--bf16", action="store_true", default=True)
        p.add_argument("--no-bf16", dest="bf16", action="store_false")
        p.add_argument("--checkpoint", default="lm_checkpoint")
        p.add_argument("--bpe", default=None,
                       help="path to a trained ByteSegmentCodec json")
        p.add_argument("--seed", type=int, default=0)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--corpus", required=True)
    t.add_argument("--steps", type=int, default=1000)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--grad-accum", type=int, default=5)
    t.add_argument("--learning-rate", type=float, default=3e-4)
    t.add_argument("--weight-decay", type=float, default=0.01)
    # the reference LM example trains with beta2=0.95, the GPT convention
    # (CliConfig.scala:14, wired via AdamW.factory train.scala:53-63)
    t.add_argument("--beta2", type=float, default=0.95)
    t.add_argument("--warmup-steps", type=int, default=100)
    t.add_argument("--mesh", default=None,
                   help="e.g. 'dp=8' or 'dp=2,tp=4' over visible devices")
    t.add_argument("--resume", action="store_true")

    g = sub.add_parser("generate")
    common(g)
    g.add_argument("--prompt", default="The ")
    g.add_argument("--length", type=int, default=200)
    g.add_argument("--temperature", type=float, default=0.8)

    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, io as lio, models, nn, optim, parallel, train

    key = jax.random.PRNGKey(args.seed)
    model = build_model(args, key)
    tags = nn.param_tags(model)
    optimizer = optim.AdamW(
        args.learning_rate if args.cmd == "train" else 1e-3,
        beta2=args.beta2 if args.cmd == "train" else 0.999,
        # the reference example clips unconditionally (train.scala:64
        # clip = Some(1d))
        clip=1.0 if args.cmd == "train" else None,
        weight_decay=(
            # no decay on norms/biases/embeddings (reference train.scala:55-62)
            lambda tag: 0.0 if (
                "bias" in tag or "LayerNorm" in tag or "scale" in tag
                or "Embedding" in tag
            ) else args.weight_decay
        ) if args.cmd == "train" else 0.0,
        tags=nn.param_tags(nn.partition_params(model)[0]),
    )

    codec = (
        data.ByteSegmentCodec.load(args.bpe) if args.bpe else data.IdentityCodec()
    )

    if args.cmd == "train":
        with open(args.corpus, "rb") as f:
            corpus = codec.encode(f.read())
        print(f"corpus: {len(corpus)} tokens")

        def loss_fn(m, batch, k, train_mode):
            tokens, target = batch
            logits, nm = m.forward(tokens, key=k, train=train_mode)
            return nn.lm_loss(logits, target), jnp.asarray(
                tokens.shape[0], jnp.float32
            ), nm

        state = train.TrainState.init(model, optimizer)
        if args.resume and os.path.exists(args.checkpoint):
            loaded, meta = lio.load_loop_state(
                args.checkpoint, model_template=state.model,
                optimizer_state_template=state.opt_state,
            )
            params, rest = nn.partition_params(loaded["model"])
            state = train.TrainState(params, rest, loaded["optimizer_state"],
                                     jnp.asarray(meta["epoch"], jnp.int32))
            print(f"resumed from step {meta['epoch']}")

        mesh = None
        if args.mesh:
            axes = dict(
                (kv.split("=")[0], int(kv.split("=")[1]))
                for kv in args.mesh.split(",")
            )
            mesh = parallel.make_mesh(axes)
            rules = (
                parallel.lm_tensor_parallel_rules("tp") if "tp" in axes else None
            )
            state = parallel.shard_train_state(state, mesh, rules)
            step = parallel.make_sharded_train_step(
                optimizer, loss_fn, mesh,
                accumulation_steps=args.grad_accum,
            )
        else:
            step = jax.jit(
                train.make_train_step(
                    optimizer, loss_fn, accumulation_steps=args.grad_accum
                ),
                donate_argnums=(0,),
            )

        schedule = optim.schedules.cosine_with_warmup(
            args.warmup_steps, args.steps
        )
        rng = np.random.default_rng(args.seed)
        stream = data.autoregressive_minibatches_from_corpus(
            corpus, args.batch_size * args.grad_accum, args.context,
            batches_per_epoch=args.steps, rng=rng,
        )
        import time

        t0 = time.perf_counter()
        tokens_done = 0
        start = int(state.step)
        for i, (x, y) in enumerate(stream):
            gstep = start + i
            _, lr_factor = schedule(None, gstep, None)
            if args.grad_accum > 1:
                x = x.reshape(args.grad_accum, args.batch_size, -1)
                y = y.reshape(args.grad_accum, args.batch_size, -1)
            batch = (x, y)
            if mesh is not None:
                batch = parallel.shard_batch(batch, mesh, "dp")
            key, sub2 = jax.random.split(key)
            state, (loss, n) = step(state, batch, sub2, lr_factor)
            tokens_done += args.batch_size * args.grad_accum * args.context
            if gstep % 50 == 0:
                dt = time.perf_counter() - t0
                print(f"step {gstep} loss {float(loss):.4f} "
                      f"{tokens_done / max(dt, 1e-9):.0f} tok/s")
            if gstep % 500 == 499 or i == len(stream) - 1:
                lio.save_loop_state(
                    args.checkpoint, model=state.model,
                    optimizer_state=state.opt_state, epoch=gstep + 1,
                )
                print(f"checkpointed at step {gstep}")

    else:  # generate
        state = train.TrainState.init(model, optimizer)
        if os.path.exists(args.checkpoint):
            loaded, _ = lio.load_loop_state(
                args.checkpoint, model_template=state.model,
                optimizer_state_template=state.opt_state,
            )
            model = loaded["model"]
            print("loaded checkpoint")
        prompt_tokens = codec.encode(args.prompt.encode())
        out = models.generate(
            model, prompt_tokens[None, :], args.length,
            temperature=args.temperature, key=jax.random.PRNGKey(args.seed),
        )
        text = codec.decode(out[0])
        print(args.prompt + text.decode("utf-8", errors="replace"))


if __name__ == "__main__":
    main()
