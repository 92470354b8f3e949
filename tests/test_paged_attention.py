"""Paged-attention kernel + page-pool manager tests (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lamp_tpu.ops.paged_attention import (
    PagedKVCache,
    paged_attention,
    paged_attention_reference,
)


def _setup(B=3, H=4, Hkv=2, D=32, PAGE=16, PAGES=8, TOTAL=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_pages = jnp.asarray(rng.randn(TOTAL, PAGE, Hkv * D).astype(np.float32))
    v_pages = jnp.asarray(rng.randn(TOTAL, PAGE, Hkv * D).astype(np.float32))
    page_indices = jnp.asarray(np.stack([
        rng.choice(TOTAL, PAGES, replace=False) for _ in range(B)
    ]).astype(np.int32))
    lengths = jnp.asarray(rng.randint(1, PAGES * PAGE, B).astype(np.int32))
    return (q, k_pages, v_pages, page_indices, lengths), Hkv


def test_paged_matches_reference():
    args, hkv = _setup()
    ref = paged_attention_reference(*args, num_kv_heads=hkv)
    out = paged_attention(*args, num_kv_heads=hkv, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_paged_length_zero_row():
    """A length-0 sequence (padded batch slot) yields a zero output row in
    both kernel and reference."""
    (q, kp, vp, idx, _), hkv = _setup()
    lengths = jnp.asarray([0, 5, 40], jnp.int32)
    ref = paged_attention_reference(q, kp, vp, idx, lengths, num_kv_heads=hkv)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    assert float(jnp.max(jnp.abs(out[0]))) == 0.0


def test_paged_mha_no_gqa():
    args, hkv = _setup(H=2, Hkv=2)
    ref = paged_attention_reference(*args, num_kv_heads=hkv)
    out = paged_attention(*args, num_kv_heads=hkv, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_page_pool_manager():
    cache = PagedKVCache(num_kv_heads=2, head_dim=8, page_size=4,
                         total_pages=16, max_pages_per_seq=4,
                         dtype=jnp.float32)
    rng = np.random.RandomState(0)
    cache.add_sequence("a")
    cache.add_sequence("b")
    kv = {}
    for sid, n in [("a", 6), ("b", 3)]:
        kv[sid] = []
        for _ in range(n):
            k = jnp.asarray(rng.randn(2, 8).astype(np.float32))
            v = jnp.asarray(rng.randn(2, 8).astype(np.float32))
            cache.append(sid, k, v)
            kv[sid].append((k, v))
    # lengths/pages bookkeeping
    idx, lens = cache.batch_views(["a", "b"])
    assert lens.tolist() == [6, 3]
    assert len(cache.seq_pages["a"]) == 2 and len(cache.seq_pages["b"]) == 1

    # attention over the pool equals attention over the raw appended kv
    q = jnp.asarray(rng.randn(2, 4, 8).astype(np.float32))  # B=2, H=4 (GQA 2)
    out = paged_attention(q, cache.k_pages, cache.v_pages, idx, lens,
                          num_kv_heads=2, interpret=True)
    ref = paged_attention_reference(q, cache.k_pages, cache.v_pages, idx,
                                    lens, num_kv_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # freeing returns pages to the pool
    before = len(cache.free_pages)
    cache.free_sequence("a")
    assert len(cache.free_pages) == before + 2


def test_pool_exhaustion():
    cache = PagedKVCache(num_kv_heads=1, head_dim=4, page_size=2,
                         total_pages=1, max_pages_per_seq=2,
                         dtype=jnp.float32)
    cache.add_sequence("a")
    k = jnp.zeros((1, 4)); v = jnp.zeros((1, 4))
    cache.append("a", k, v)
    cache.append("a", k, v)
    with pytest.raises(RuntimeError):
        cache.append("a", k, v)  # needs a second page; pool has one


@pytest.mark.parametrize("window", [1, 7, 16, 33, 100])
def test_paged_window_matches_reference(window):
    """Sliding-window decode: kernel (which skips whole blocks below the
    band) matches the masked reference for windows crossing page/block
    boundaries."""
    args, hkv = _setup(seed=3)
    ref = paged_attention_reference(*args, num_kv_heads=hkv, window=window)
    out = paged_attention(*args, num_kv_heads=hkv, window=window,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_paged_window_mixed_lengths_and_zero():
    (q, kp, vp, idx, _), hkv = _setup(seed=4)
    lengths = jnp.asarray([0, 3, 127], jnp.int32)
    ref = paged_attention_reference(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                                    window=32)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          window=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    assert float(jnp.max(jnp.abs(out[0]))) == 0.0


def test_paged_window_wider_than_length_is_full():
    """window >= length must equal unwindowed attention."""
    args, hkv = _setup(seed=5)
    full = paged_attention(*args, num_kv_heads=hkv, interpret=True)
    win = paged_attention(*args, num_kv_heads=hkv, window=10_000,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full), atol=2e-5,
                               rtol=2e-5)


def test_narrow_fused_width_falls_back_to_reference():
    """fused = H_kv*D below the 128-lane tile dispatches to the gather path
    even with interpret=False (real-TPU Mosaic rejects unaligned DMA slices;
    found serving a tiny HF checkpoint)."""
    args, hkv = _setup(D=16)  # fused = 2*16 = 32, not 128-aligned
    ref = paged_attention_reference(*args, num_kv_heads=hkv)
    out = paged_attention(*args, num_kv_heads=hkv, interpret=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_paged_per_request_windows():
    """Per-request window limits: each row independently capped; <=0 rows
    unlimited. Kernel matches a per-row masked reference built from
    single-row static-window calls."""
    (q, kp, vp, idx, lengths), hkv = _setup(seed=6)
    wins = jnp.asarray([5, 0, 40], jnp.int32)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          windows=wins, interpret=True)
    ref = paged_attention_reference(q, kp, vp, idx, lengths,
                                    num_kv_heads=hkv, windows=wins)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    # row-by-row against static-window calls (the ground truth semantics)
    for i, w in enumerate([5, None, 40]):
        row = paged_attention_reference(
            q[i:i + 1], kp, vp, idx[i:i + 1], lengths[i:i + 1],
            num_kv_heads=hkv, window=w,
        )
        np.testing.assert_allclose(np.asarray(out[i:i + 1]), np.asarray(row),
                                   atol=2e-5, rtol=2e-5)


def test_paged_per_request_windows_combine_with_static():
    """Static (layer) window + per-request limits: each row uses the
    tighter of the two."""
    (q, kp, vp, idx, lengths), hkv = _setup(seed=7)
    wins = jnp.asarray([64, 0, 8], jnp.int32)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          window=16, windows=wins, interpret=True)
    for i, w in enumerate([16, 16, 8]):
        row = paged_attention_reference(
            q[i:i + 1], kp, vp, idx[i:i + 1], lengths[i:i + 1],
            num_kv_heads=hkv, window=w,
        )
        np.testing.assert_allclose(np.asarray(out[i:i + 1]), np.asarray(row),
                                   atol=2e-5, rtol=2e-5)


def test_paged_fp8_kv_pool():
    """fp8 (e4m3) KV pool: kernel matches the fp8 reference tightly (both
    attend over identical dequantized values) and stays close to the full-
    precision result (quantization noise only)."""
    (q, kp, vp, idx, lengths), hkv = _setup(seed=8)
    f8 = jnp.float8_e4m3fn
    kp8, vp8 = kp.astype(f8), vp.astype(f8)
    out8 = paged_attention(q, kp8, vp8, idx, lengths, num_kv_heads=hkv,
                           interpret=True)
    ref8 = paged_attention_reference(q, kp8, vp8, idx, lengths,
                                     num_kv_heads=hkv)
    # kernel dequantizes f8 -> bf16 for the MXU dots; the reference runs
    # f32 after the gather, so agreement is bf16-rounding-bounded
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                               atol=4e-3, rtol=4e-2)
    full = paged_attention_reference(q, kp, vp, idx, lengths,
                                     num_kv_heads=hkv)
    a = np.asarray(out8, np.float64).reshape(-1)
    b = np.asarray(full, np.float64).reshape(-1)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98, cos


def test_paged_fp8_with_windows():
    """fp8 pool composes with per-request window limits."""
    (q, kp, vp, idx, lengths), hkv = _setup(seed=9)
    f8 = jnp.float8_e4m3fn
    wins = jnp.asarray([5, 0, 40], jnp.int32)
    out = paged_attention(q, kp.astype(f8), vp.astype(f8), idx, lengths,
                          num_kv_heads=hkv, windows=wins, interpret=True)
    ref = paged_attention_reference(q, kp.astype(f8), vp.astype(f8), idx,
                                    lengths, num_kv_heads=hkv, windows=wins)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=4e-3, rtol=4e-2)


@pytest.mark.parametrize("B", [6, 8, 12, 16])
def test_paged_grouped_matches_reference(B):
    """B divisible by 2/4/8 dispatches to the GROUPED kernel (G sequences
    per grid cell, chosen by the VMEM budget); outputs must be identical to
    the gather reference for mixed lengths including a zero row."""
    args, hkv = _setup(B=B, seed=10 + B)
    (q, kp, vp, idx, lengths) = args
    lengths = lengths.at[1].set(0)  # a padded slot inside a group
    ref = paged_attention_reference(q, kp, vp, idx, lengths, num_kv_heads=hkv)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    assert float(jnp.max(jnp.abs(out[1]))) == 0.0


def test_paged_grouped_per_request_windows():
    """Grouped cells honor PER-SEQUENCE window limits: the block walk covers
    the union of the group's bands while each row masks to its own."""
    (q, kp, vp, idx, lengths), hkv = _setup(B=8, seed=21)
    wins = jnp.asarray([5, 0, 40, 1, 0, 17, 64, 3], jnp.int32)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          windows=wins, interpret=True)
    ref = paged_attention_reference(q, kp, vp, idx, lengths,
                                    num_kv_heads=hkv, windows=wins)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_paged_grouped_static_window():
    (q, kp, vp, idx, lengths), hkv = _setup(B=8, seed=22)
    ref = paged_attention_reference(q, kp, vp, idx, lengths,
                                    num_kv_heads=hkv, window=19)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          window=19, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_paged_grouped_fp8():
    (q, kp, vp, idx, lengths), hkv = _setup(B=8, seed=23)
    f8 = jnp.float8_e4m3fn
    out = paged_attention(q, kp.astype(f8), vp.astype(f8), idx, lengths,
                          num_kv_heads=hkv, interpret=True)
    ref = paged_attention_reference(q, kp.astype(f8), vp.astype(f8), idx,
                                    lengths, num_kv_heads=hkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=4e-3, rtol=4e-2)


def _fuse(kp, vp):
    return jnp.stack([kp, vp], axis=1)  # [P, 2, page, fused]


@pytest.mark.parametrize("B", [3, 8])
def test_paged_fused_kv_matches_reference(B):
    """v_pages=None selects the FUSED layout (kv_pages [P, 2, page, fused],
    one DMA per page); outputs must match the split-pool kernel exactly."""
    (q, kp, vp, idx, lengths), hkv = _setup(B=B, seed=31 + B)
    lengths = lengths.at[0].set(0)
    kv = _fuse(kp, vp)
    ref = paged_attention_reference(q, kv, None, idx, lengths,
                                    num_kv_heads=hkv)
    split_ref = paged_attention_reference(q, kp, vp, idx, lengths,
                                          num_kv_heads=hkv)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(split_ref),
                               atol=0, rtol=0)
    out = paged_attention(q, kv, None, idx, lengths, num_kv_heads=hkv,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    assert float(jnp.max(jnp.abs(out[0]))) == 0.0


def test_paged_fused_kv_windows_and_fp8():
    (q, kp, vp, idx, lengths), hkv = _setup(B=8, seed=41)
    wins = jnp.asarray([5, 0, 40, 1, 0, 17, 64, 3], jnp.int32)
    kv = _fuse(kp, vp)
    out = paged_attention(q, kv, None, idx, lengths, num_kv_heads=hkv,
                          windows=wins, interpret=True)
    ref = paged_attention_reference(q, kp, vp, idx, lengths,
                                    num_kv_heads=hkv, windows=wins)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    f8 = jnp.float8_e4m3fn
    out8 = paged_attention(q, kv.astype(f8), None, idx, lengths,
                           num_kv_heads=hkv, interpret=True)
    ref8 = paged_attention_reference(q, kp.astype(f8), vp.astype(f8), idx,
                                     lengths, num_kv_heads=hkv)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                               atol=4e-3, rtol=4e-2)


@pytest.mark.parametrize("single_pass", [False, True])
@pytest.mark.parametrize("B", [8, 16])
def test_paged_single_pass_modes_match_reference(B, single_pass):
    """Both grid modes (one Mosaic cell per group vs ONE cell walking all
    groups with an internal fori_loop) must agree with the reference on
    mixed lengths including zero rows."""
    args, hkv = _setup(B=B, PAGES=4, TOTAL=B * 4 + 2, seed=3)
    q, kp, vp, idx, _ = args
    rng = np.random.RandomState(7)
    lengths = jnp.asarray(
        np.where(rng.rand(B) < 0.2, 0, rng.randint(1, 4 * 16, B)), jnp.int32)
    ref = paged_attention_reference(q, kp, vp, idx, lengths, num_kv_heads=hkv)
    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          single_pass=single_pass, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("single_pass", [False, True])
def test_paged_single_pass_fused_windows(single_pass):
    """Single-pass mode with the engine's fused-KV layout + per-request
    windows (the serving configuration)."""
    B, PAGES, PAGE = 8, 4, 16
    (q, kp, vp, idx, lengths), hkv = _setup(
        B=B, PAGES=PAGES, TOTAL=B * PAGES + 1, seed=11)
    kv = jnp.stack([kp, vp], axis=1)  # [P, 2, page, fused]
    wins = jnp.asarray([0, 3, 17, 0, 9, 1, 64, 5], jnp.int32)
    ref = paged_attention_reference(q, kv, None, idx, lengths,
                                    num_kv_heads=hkv, windows=wins)
    out = paged_attention(q, kv, None, idx, lengths, num_kv_heads=hkv,
                          windows=wins, single_pass=single_pass,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("single_pass", [False, True])
def test_paged_append_kv_matches_write_then_attend(single_pass):
    """append_kv (current token injected from VMEM, pool writes deferred)
    must equal the write-then-attend order the engine used before: scatter
    the rows into the pool, then attend with lengths+1."""
    B, PAGES, PAGE = 8, 4, 16
    (q, kp, vp, _, lengths), hkv = _setup(
        B=B, PAGES=PAGES, TOTAL=B * PAGES + 1, seed=21)
    # DISJOINT page tables (real serving invariant): the oracle below
    # writes rows into pages, so cross-sequence page sharing would corrupt
    # other rows
    idx = jnp.arange(1, B * PAGES + 1, dtype=jnp.int32).reshape(B, PAGES)
    rng = np.random.RandomState(5)
    # lengths strictly below capacity so the append slot exists; include 0
    lengths = jnp.asarray(
        np.where(rng.rand(B) < 0.25, 0,
                 rng.randint(1, PAGES * PAGE - 1, B)), jnp.int32)
    F = kp.shape[-1]
    new_k = jnp.asarray(rng.randn(B, F).astype(np.float32))
    new_v = jnp.asarray(rng.randn(B, F).astype(np.float32))

    # oracle: write rows into the pool at slot `lengths`, attend len+1
    kp2, vp2 = np.asarray(kp).copy(), np.asarray(vp).copy()
    for b in range(B):
        pos = int(lengths[b])
        pg = int(idx[b, pos // PAGE])
        kp2[pg, pos % PAGE] = np.asarray(new_k[b])
        vp2[pg, pos % PAGE] = np.asarray(new_v[b])
    ref = paged_attention_reference(
        q, jnp.asarray(kp2), jnp.asarray(vp2), idx, lengths + 1,
        num_kv_heads=hkv)

    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          append_kv=(new_k, new_v),
                          single_pass=single_pass, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    # and the jnp reference path agrees too
    ref2 = paged_attention_reference(
        q, kp, vp, idx, lengths, num_kv_heads=hkv,
        append_kv=(new_k, new_v))
    np.testing.assert_allclose(np.asarray(ref2), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("single_pass", [False, True])
def test_paged_append_kv_with_windows(single_pass):
    """append + per-request windows: the self token counts as the newest
    of the `w` visible keys (band [len+1-w, len])."""
    B, PAGES, PAGE = 8, 4, 16
    (q, kp, vp, _, _), hkv = _setup(
        B=B, PAGES=PAGES, TOTAL=B * PAGES + 1, seed=22)
    idx = jnp.arange(1, B * PAGES + 1, dtype=jnp.int32).reshape(B, PAGES)
    rng = np.random.RandomState(6)
    lengths = jnp.asarray(rng.randint(0, PAGES * PAGE - 1, B), jnp.int32)
    wins = jnp.asarray([1, 2, 5, 0, 17, 1, 30, 3], jnp.int32)
    F = kp.shape[-1]
    new_k = jnp.asarray(rng.randn(B, F).astype(np.float32))
    new_v = jnp.asarray(rng.randn(B, F).astype(np.float32))

    kp2, vp2 = np.asarray(kp).copy(), np.asarray(vp).copy()
    for b in range(B):
        pos = int(lengths[b])
        pg = int(idx[b, pos // PAGE])
        kp2[pg, pos % PAGE] = np.asarray(new_k[b])
        vp2[pg, pos % PAGE] = np.asarray(new_v[b])
    ref = paged_attention_reference(
        q, jnp.asarray(kp2), jnp.asarray(vp2), idx, lengths + 1,
        num_kv_heads=hkv, windows=wins)

    out = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                          windows=wins, append_kv=(new_k, new_v),
                          single_pass=single_pass, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("single_pass", [False, True])
def test_paged_page_offset_stacked_pool(single_pass):
    """A layer-stacked pool [L*P, ...] addressed via page_offset=li*P must
    equal per-layer pools — no XLA slicing, same numbers."""
    L = 3
    B, PAGES, PAGE = 4, 2, 16
    per_layer = []
    rng = np.random.RandomState(9)
    TOTAL = B * PAGES + 1
    for li in range(L):
        (q, kp, vp, idx, lengths), hkv = _setup(
            B=B, PAGES=PAGES, TOTAL=TOTAL, seed=30 + li)
        per_layer.append((q, kp, vp, idx, lengths, hkv))
    stacked_k = jnp.concatenate([kp for _, kp, _, _, _, _ in per_layer])
    stacked_v = jnp.concatenate([vp for _, _, vp, _, _, _ in per_layer])
    for li, (q, kp, vp, idx, lengths, hkv) in enumerate(per_layer):
        ref = paged_attention(q, kp, vp, idx, lengths, num_kv_heads=hkv,
                              single_pass=single_pass, interpret=True)
        out = paged_attention(q, stacked_k, stacked_v, idx, lengths,
                              num_kv_heads=hkv, page_offset=li * TOTAL,
                              single_pass=single_pass, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_paged_append_kv_fused_pool_and_fp8():
    """append on the engine's FUSED pool layout, bf16 and fp8 pools."""
    B, PAGES, PAGE = 8, 4, 16
    (q, kp, vp, idx, _), hkv = _setup(
        B=B, PAGES=PAGES, TOTAL=B * PAGES + 1, seed=23)
    rng = np.random.RandomState(8)
    lengths = jnp.asarray(rng.randint(0, PAGES * PAGE - 1, B), jnp.int32)
    F = kp.shape[-1]
    new_k = jnp.asarray(rng.randn(B, F).astype(np.float32))
    new_v = jnp.asarray(rng.randn(B, F).astype(np.float32))
    for dt in (jnp.bfloat16, jnp.float8_e4m3fn):
        kv = jnp.stack([kp, vp], axis=1).astype(dt)
        qq = q.astype(jnp.bfloat16)
        ref = paged_attention_reference(
            qq, kv, None, idx, lengths, num_kv_heads=hkv,
            append_kv=(new_k, new_v))
        out = paged_attention(qq, kv, None, idx, lengths, num_kv_heads=hkv,
                              append_kv=(new_k, new_v), interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.06, rtol=0.06)
