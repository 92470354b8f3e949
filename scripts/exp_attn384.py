"""Experiment: attention dispatch at the flagship ctx-384 workload.

VERDICT round 1 item 3: the bench workload sits at ~63% MFU with attention
on the XLA path at kv=384 (compact Pallas loses below ~512). This measures
(a) f+b time of each attention implementation at B8 H12 S384 D64 bf16
causal, (b) the share of the full train step that attention accounts for,
so the headroom claim is a measurement rather than a hypothesis.

Timing per CLAUDE.md: chain iterations inside one jitted lax.scan with real
data dependencies, one readback, subtract the measured ~30ms tunnel rtt.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lamp_tpu.ops import attention as A

B, H, S, D = 8, 12, 384, 64
ITERS = 30
RTT = 0.03


def time_attn(impl, iters=ITERS):
    fn = functools.partial(A.dot_product_attention, causal=True,
                           implementation=impl)

    def loss(q, k, v):
        return fn(q, k, v).astype(jnp.float32).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))

    def body(carry, _):
        q, k, v = carry
        dq, dk, dv = g(q, k, v)
        # chain: next iteration's inputs depend on this one's grads
        return (q + 1e-6 * dq, k + 1e-6 * dk, v + 1e-6 * dv), ()

    # Two scan lengths, difference the wall times: per-iter cost is far
    # below the ~30ms tunnel RTT, so RTT subtraction would be noise.
    def make(length):
        @jax.jit
        def run(qkv):
            (q, k, v), _ = jax.lax.scan(body, qkv, None, length=length)
            return q.astype(jnp.float32).sum()

        return run

    n1, n2 = iters, iters * 11
    run1, run2 = make(n1), make(n2)
    rng = np.random.RandomState(0)
    qkv = tuple(
        jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16) for _ in range(3)
    )
    float(run1(qkv)), float(run2(qkv))  # compile + sync
    t0 = time.perf_counter()
    float(run1(qkv))
    t1 = time.perf_counter()
    out = float(run2(qkv))
    dt = ((time.perf_counter() - t1) - (t1 - t0)) / (n2 - n1)
    return dt, out


def time_step(attn_impl):
    """Full flagship train step with attention forced to one implementation
    (None = the model's own dispatch)."""
    from lamp_tpu import nn, optim, train

    model = nn.LanguageModelModule.init(
        vocab_size=256, context_length=S, num_blocks=12, embed_dim=768,
        attention_heads=12, key=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        dropout=0.0,
    )
    opt = optim.AdamW(3e-4, weight_decay=0.01)

    def loss_fn(m, batch, key, train_mode):
        tokens, target = batch
        logits, nm = m.forward(tokens, key=key, train=train_mode)
        return nn.lm_loss(logits, target), jnp.asarray(
            tokens.shape[0], jnp.float32), nm

    state = train.TrainState.init(model, opt)
    K = 15
    chained = jax.jit(
        train.make_chained_train_step(opt, loss_fn, accumulation_steps=5),
        donate_argnums=(0,),
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 256, (K, 5, 8, S)).astype(np.int32))
    stacked = (tokens, jnp.roll(tokens, -1, axis=3))
    rk = jax.random.PRNGKey(1)

    import contextlib

    @contextlib.contextmanager
    def forced(impl):
        if impl is None:
            yield
            return
        orig = A.dot_product_attention

        def patched(q, k, v, **kw):
            kw["implementation"] = impl
            return orig(q, k, v, **kw)

        # patch at both the ops module and the transformer import site
        import lamp_tpu.nn.transformer as T
        saved_t = getattr(T, "dot_product_attention", None)
        A.dot_product_attention = patched
        if saved_t is not None:
            T.dot_product_attention = patched
        try:
            yield
        finally:
            A.dot_product_attention = orig
            if saved_t is not None:
                T.dot_product_attention = saved_t

    with forced(attn_impl):
        state, (loss, _) = chained(state, stacked, rk)
        float(loss)  # compile + sync
        t0 = time.perf_counter()
        state, (loss, _) = chained(state, stacked, rk)
        float(loss)
        dt = (time.perf_counter() - t0 - RTT) / K
    tok_s = 5 * 8 * S / dt
    return dt, tok_s


def main():
    for impl in ("xla", "compact", "flash"):
        dt, _ = time_attn(impl)
        # f+b model FLOPs for causal attention: fwd 2*2*S^2*D*B*H*0.5(causal)
        # bwd ~2.5x fwd matmul work (dq,dk,dv,dp recompute)
        flops = 3.5 * 2 * 2 * B * H * S * S * D * 0.5
        print(f"attn f+b {impl:8s}: {dt*1e3:7.3f} ms/iter "
              f"({flops/dt/1e12:.1f} TFLOP/s eff)")

    for impl in (None, "xla", "compact"):
        dt, tok_s = time_step(impl)
        print(f"train step attn={str(impl):8s}: {dt*1e3:6.2f} ms/step "
              f"{tok_s:,.0f} tok/s")


if __name__ == "__main__":
    main()
