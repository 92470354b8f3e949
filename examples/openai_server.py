#!/usr/bin/env python
"""Serve a model over an OpenAI-compatible HTTP API.

Starts a continuous-batching engine (paged KV cache) behind
``/v1/completions`` + ``/v1/chat/completions`` with SSE streaming, stop
strings, parallel sampling, and a Prometheus ``/metrics`` endpoint. Works
with a byte-level checkpoint from examples/autoregressivelm.py, or an
untrained model for smoke testing.

Usage:
    python examples/openai_server.py --port 8000 --checkpoint lm_ck
    curl localhost:8000/v1/completions -d '{"prompt": "once upon ", "max_tokens": 40}'
    curl -N localhost:8000/v1/completions -d '{"prompt": "the ", "stream": true}'
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--context", type=int, default=512)
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--total-pages", type=int, default=512)
    ap.add_argument("--decode-steps", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=32)
    args = ap.parse_args()

    import jax

    from lamp_tpu import io as lio, nn, optim, train
    from lamp_tpu.data.tokenizer import IdentityCodec
    from lamp_tpu.models.openai_api import OpenAIFrontend, OpenAIHTTPServer
    from lamp_tpu.models.serving import ModernBatchServer, ServingEngine

    model = nn.ModernLM.init(
        vocab_size=256, context_length=args.context, num_blocks=args.layers,
        embed_dim=args.dim, num_heads=args.heads,
        key=jax.random.PRNGKey(0))
    if args.checkpoint and os.path.exists(args.checkpoint):
        t = train.TrainState.init(model, optim.AdamW(1e-3))
        loaded, _ = lio.load_loop_state(
            args.checkpoint, model_template=t.model,
            optimizer_state_template=t.opt_state)
        model = loaded["model"]
        print(f"loaded {args.checkpoint}")

    server = ModernBatchServer(model, page_size=args.page_size,
                               total_pages=args.total_pages,
                               enable_prefix_cache=True)
    engine = ServingEngine(server, decode_steps=args.decode_steps,
                           max_batch=args.max_batch)
    api = OpenAIHTTPServer(
        OpenAIFrontend(engine, IdentityCodec(), model_name="lamp-byte-lm",
                       default_max_tokens=64),
        host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{api.port}/v1  "
          f"(metrics: /metrics, health: /health)")
    try:
        api.serve_forever()
    except KeyboardInterrupt:
        api.shutdown()


if __name__ == "__main__":
    main()
