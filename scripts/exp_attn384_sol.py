"""Speed-of-light probe for ctx-384 attention (VERDICT item 3).

Times the RAW batched matmuls that attention f+b at B8 H12 S384 D64 bf16
executes (no softmax, no masking) — the hard MXU floor for any kernel at
these shapes. If XLA's fused attention time (~0.143 ms measured in
exp_attn384.py) is close to this floor plus VPU softmax cost, the XLA path
is hardware-shape-bound and no Pallas kernel can beat it meaningfully.

Matmul inventory per f+b attention call (executed, no causal skip — XLA
computes full tiles):
  fwd:  s = q k^T        [96](384x64)@(64x384)    2 matmuls worth noting
        o = p v          [96](384x384)@(384x64)
  bwd:  dv = p^T do      [96](384x384)@(384x64)
        dp = do v^T      [96](384x64)@(64x384)  (wrong, do[384,64] v^T[64,384])
        dq = ds k        [96](384x384)@(384x64)
        dk = ds^T q      [96](384x384)@(384x64)
So: 2 "K=64" matmuls (contraction 64, N=384) and 4 "N=64" matmuls
(contraction 384, N=64). Also times a causal-skipped variant (x0.5 FLOPs)
to bound what a triangle-skipping kernel could save.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, S, D = 8, 12, 384, 64
BH = B * H
ITERS = 30
RTT = 0.03


def bench(name, fn, *args, flops):
    # Two scan lengths, difference the wall times: cancels the tunnel RTT
    # and any fixed dispatch overhead exactly (per-iter cost here is well
    # under the ~30ms RTT, so subtraction-based timing goes negative).
    def make(length):
        @jax.jit
        def run(args):
            def body(c, _):
                out = fn(*c)
                # chain: feed output back (shapes differ, so mix a scalar)
                scale = 1.0 + 1e-7 * out.astype(jnp.float32).mean()
                return tuple(a * scale.astype(a.dtype) for a in c), ()

            c, _ = jax.lax.scan(body, args, None, length=length)
            return c[0].astype(jnp.float32).sum()

        return run

    n1, n2 = ITERS, ITERS * 11
    run1, run2 = make(n1), make(n2)
    args = tuple(jnp.asarray(a, jnp.bfloat16) for a in args)
    float(run1(args)), float(run2(args))  # compile + sync
    t0 = time.perf_counter()
    float(run1(args))
    t1 = time.perf_counter()
    float(run2(args))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    print(f"{name:34s}: {dt*1e6:8.1f} us  ({flops/dt/1e12:6.1f} TFLOP/s)")
    return dt


def main():
    rng = np.random.RandomState(0)
    q = rng.randn(BH, S, D)
    k = rng.randn(BH, S, D)
    p = rng.randn(BH, S, S)

    f32 = jnp.float32
    mm_k64 = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32)
    mm_n64 = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)

    fl_k64 = 2 * BH * S * S * D
    fl_n64 = 2 * BH * S * S * D

    t1 = bench("s = q k^T  (K=64, N=384)", mm_k64, q, k, flops=fl_k64)
    t2 = bench("o = p v    (K=384, N=64)", mm_n64, p, k, flops=fl_n64)

    # attention f+b executes 2 K=64-type and 4 N=64-type batched matmuls
    floor = 2 * t1 + 4 * t2
    print(f"raw matmul floor (2x + 4x):        {floor*1e6:8.1f} us")
    print("XLA fused attention f+b measured:     104 us (exp_attn384.py, "
          "2026-08-19; compact 312 us, flash 395 us)")

    # softmax VPU cost alone: exp+max+sum+div over [BH, S, S] f32, fwd+bwd
    sm = lambda s: jax.nn.softmax(s, axis=-1)
    g = jax.jit(jax.grad(lambda s: sm(s).astype(f32).sum()))

    def smfb(s):
        return g(s)

    bench("softmax f+b [96,384,384]", smfb, p,
          flops=10 * BH * S * S)  # ~10 VPU ops/elem, prints "TFLOP/s"=Tops/s

    # what would causal tile-skipping save: same matmuls at half FLOPs
    half = rng.randn(BH, S // 2, S)
    bench("o = p v causal-half (K=384, N=64)", mm_n64, half, k,
          flops=fl_n64 // 2)


if __name__ == "__main__":
    main()
