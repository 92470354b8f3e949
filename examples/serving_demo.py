#!/usr/bin/env python
"""Batch-serving demo: continuous batching over the paged KV cache.

Loads (or initializes) a byte-level LM, admits several prompts, decodes them
concurrently with requests finishing at different times, and prints the
completions. Pair with a checkpoint from examples/autoregressivelm.py for
meaningful text.

Usage: python examples/serving_demo.py --checkpoint lm_ck --tokens 60
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--tokens", type=int, default=40)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--prompts", nargs="*",
                    default=["the quick ", "once upon ", "in the beginning "])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lamp_tpu import io as lio, nn, optim, train
    from lamp_tpu.models import BatchServer

    model = nn.LanguageModelModule.init(
        vocab_size=256, context_length=args.context, num_blocks=args.layers,
        embed_dim=args.dim, attention_heads=args.heads,
        key=jax.random.PRNGKey(0),
    )
    if args.checkpoint and os.path.exists(args.checkpoint):
        opt = optim.AdamW(1e-3)
        t = train.TrainState.init(model, opt)
        loaded, _ = lio.load_loop_state(
            args.checkpoint, model_template=t.model,
            optimizer_state_template=t.opt_state,
        )
        model = loaded["model"]
        print("loaded checkpoint")

    from lamp_tpu.models import SamplingParams, ServingEngine

    server = BatchServer(model, page_size=32, total_pages=256,
                         enable_prefix_cache=True)
    engine = ServingEngine(server, decode_steps=8)
    for i, p in enumerate(args.prompts):
        # staggered budgets + per-request sampling exercise join/leave and
        # the heterogeneous on-device sampler
        engine.submit(
            list(p.encode()),
            SamplingParams(temperature=args.temperature, top_p=0.95,
                           max_tokens=args.tokens + 10 * i),
            request_id=f"req{i}",
        )

    t0 = time.perf_counter()
    results = engine.run()
    dt = time.perf_counter() - t0
    total = sum(len(o) for o in results.values())
    print(f"decoded {total} tokens in {dt:.2f}s "
          f"({total / dt:.0f} tok/s aggregate); prefix cache "
          f"hit/miss tokens {server.cache_hit_tokens}/"
          f"{server.cache_miss_tokens}")
    for i, p in enumerate(args.prompts):
        text = bytes(results[f"req{i}"]).decode("utf-8", errors="replace")
        print(f"[{i}] {p!r} -> {text!r}")


if __name__ == "__main__":
    main()
