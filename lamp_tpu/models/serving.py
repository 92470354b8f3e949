"""Batch LM serving over the paged KV cache.

Continuous-batching decode engine: concurrent sequences of different lengths
share one physical page pool (ops.paged_attention); requests join and leave
the batch between steps. This is the serving-side counterpart of the
training stack — the reference has no serving layer at all (SURVEY.md §1).

Engine shape:
    server = BatchServer(model, page_size=64, total_pages=1024)
    server.add("req1", prompt_tokens)
    new_tokens = server.step()      # one token for every active request
    server.remove("req1")

One jitted step: per layer, the new tokens' K/V are written into their page
slots functionally (donated pool buffers update in place under jit), then
the paged kernel attends over history + self.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.lm import LanguageModelModule
from ..ops.paged_attention import paged_attention
from .sampling import SamplingParams, sample_tokens

__all__ = [
    "BatchServer", "ModernBatchServer", "SpeculativeDecoder",
    "LoRADraftSpeculativeDecoder", "ServingEngine", "SamplingParams",
]




def _kv_write(pool, token_pages, token_slots, k_rows, v_rows):
    """Scatter a token's K and V rows into its page slot of the FUSED
    per-layer pool ``[P, 2, page, F]`` (index 0 = K, 1 = V), cast to the
    pool dtype. With an fp8 pool (``kv_dtype=jnp.float8_e4m3fn``) this is
    where the cache quantizes; for bf16/f32 pools the cast is a no-op.

    MUST stay two statically-indexed scatters — NOT
    ``pool.at[tp, :, ts].set(stack([k, v]))``: mixing advanced indices
    around a slice defeats XLA's in-place aliasing of the donated pool
    and copies every pool every step (measured 2.7x decode regression,
    docs/serving_headroom.md). The in-place property of this form is
    pinned by tests/test_serving.py::
    test_kv_write_scatter_preserves_inplace_aliasing."""
    pool = pool.at[token_pages, 0, token_slots].set(k_rows.astype(pool.dtype))
    return pool.at[token_pages, 1, token_slots].set(v_rows.astype(pool.dtype))


def _kv_write_combined(pool, token_pages, token_slots, k_rows, v_rows):
    """ONE scatter writes a token batch's K AND V rows into the fused pool
    ``[P, 2, page, F]``. All three index arrays are advanced (no slice in
    between), so unlike the forbidden ``pool.at[tp, :, ts]`` form XLA keeps
    the in-place aliasing of the donated pool (pinned by
    tests/test_serving.py::test_kv_write_scatter_preserves_inplace_aliasing).
    Halves the scatter-dispatch count of :func:`_kv_write`; decode paths
    additionally DEFER these writes out of the layer loop (the kernel's
    ``append_kv`` injects the current token), so the scatter chain depends
    on nothing downstream and XLA can overlap it with the layer matmuls."""
    b = token_pages.shape[0]
    pages2 = jnp.concatenate([token_pages, token_pages])
    sel = jnp.concatenate([jnp.zeros((b,), jnp.int32),
                           jnp.ones((b,), jnp.int32)])
    slots2 = jnp.concatenate([token_slots, token_slots])
    rows = jnp.concatenate([k_rows, v_rows]).astype(pool.dtype)
    return pool.at[pages2, sel, slots2].set(rows)


def _kv_write_stacked(pool, total_pages, token_pages, token_slots,
                      deferred_rows):
    """ONE combined scatter writes EVERY layer's deferred K and V rows into
    the layer-stacked fused pool ``[L*P, 2, page, F]`` (layer ``li`` owns
    physical rows ``[li*P, (li+1)*P)``; the paged kernel addresses them with
    ``page_offset=li*P``, never an XLA-level layer slice).

    ``deferred_rows`` is the decode loop's per-layer ``[(k_rows [B, F],
    v_rows [B, F]), ...]`` list. Collapses the former 12-scatters-per-step
    chain (one per layer) into a single [2*L*B]-row scatter — decode-step
    scatter cost is dispatch-bound, not byte-bound
    (scripts/exp_stacked_writes.py). Index layout mirrors
    :func:`_kv_write_combined` (all advanced indices adjacent, static axis-1
    entries via the ``sel`` array) so XLA's in-place aliasing of the donated
    pool is preserved — pinned by tests/test_serving.py::
    test_kv_write_scatter_preserves_inplace_aliasing."""
    layers = len(deferred_rows)
    b = token_pages.shape[0]
    off = jnp.arange(layers, dtype=jnp.int32) * total_pages
    pages_l = (off[:, None] + token_pages[None, :]).reshape(-1)  # [L*B]
    pages2 = jnp.concatenate([pages_l, pages_l])
    sel = jnp.concatenate([jnp.zeros((layers * b,), jnp.int32),
                           jnp.ones((layers * b,), jnp.int32)])
    slots_l = jnp.tile(token_slots, layers)
    slots2 = jnp.concatenate([slots_l, slots_l])
    rows = jnp.concatenate(
        [r for r, _ in deferred_rows] + [r for _, r in deferred_rows]
    ).astype(pool.dtype)
    return pool.at[pages2, sel, slots2].set(rows)


@jax.jit
def _bump_counts(counts, nxt):
    """counts [B, V] += one_hot(nxt) (device-side, single dispatch)."""
    return counts.at[jnp.arange(nxt.shape[0]), nxt].add(1)


class BatchServer:
    """Paged-KV batch decode for :class:`LanguageModelModule` (see
    :class:`ModernBatchServer` for the llama-style family).

    ``page_size`` default 128: measured on v5e (B=32, ctx 512, 12L/768d
    GQA), 128-token pages run the paged kernel 1.7x faster than 64-token
    pages (fewer per-page DMA issues per token); 256-token pages lose when
    a block over-covers the live length. Tune with ``pages_per_block``
    (block = pages_per_block * page_size tokens should track the typical
    live context)."""

    def _introspect(self, model):
        block = model.encoder.blocks[0]
        self.layers = len(model.encoder.blocks)
        self.heads = block.attention.num_heads
        self.kv_heads = self.heads
        self.head_dim = block.attention.w_q.weight.shape[1] // self.heads
        self._windows = tuple(None for _ in range(self.layers))

    PREFILL_BUCKET = 64
    _tp = 1  # tensor-parallel degree; >1 only on ModernBatchServer(mesh=...)

    def __init__(self, model, *, page_size: int = 128,
                 total_pages: int = 512, temperature: float = 0.0,
                 seed: int = 0, quantize_bits: Optional[int] = None,
                 pages_per_block: int = 2,
                 enable_prefix_cache: bool = False,
                 kv_dtype=None):
        if quantize_bits not in (None, 4, 8):
            raise ValueError("quantize_bits must be None, 4 or 8")
        self.quantize_bits = quantize_bits
        self.pages_per_block = pages_per_block
        self.enable_prefix_cache = enable_prefix_cache
        self.model = model
        self._introspect(model)
        self.page_size = page_size
        self.total_pages = total_pages
        self.max_pages_per_seq = (
            model.context_length + page_size - 1
        ) // page_size
        # ``kv_dtype`` overrides the pool precision: jnp.float8_e4m3fn
        # stores the cache in fp8 — half the KV HBM of bf16, so double the
        # concurrent batch x context per chip; the paged kernel DMAs half
        # the bytes and upcasts in VMEM (see ops.paged_attention)
        dt = (model.token_embedding.weight.dtype if kv_dtype is None
              else jnp.dtype(kv_dtype))
        self.kv_dtype = dt
        # ONE layer-stacked FUSED pool: [L*P, 2, page, H_kv*D] — layer li
        # owns physical page rows [li*P, (li+1)*P); within a page, index 0
        # holds its keys, 1 its values, so the paged kernel moves a page's
        # K and V with ONE async DMA (at serving fills decode attention is
        # bound by DMA-programming overhead, not KV bytes: 19% faster than
        # split K/V pools, docs/serving_headroom.md). Heads fuse into lanes
        # so DMA slices stay 128-aligned for any head_dim.
        #
        # The kernel addresses layer li via ``page_offset=li*P`` (a static
        # int folded into the page-table lookup) — NEVER ``kv_pages[li]``:
        # slicing a layer out of a stacked pool materializes a full-layer
        # copy per layer per step as the pallas operand, making step time
        # scale with POOL size instead of batch size (measured 11.5 ms vs
        # 1.6 ms per step at 4096 pages, B=32 — that measurement is what
        # previously forced per-layer tuple pools; page_offset removes the
        # slice, and the single array lets the decode step write ALL
        # layers' K/V with ONE combined scatter instead of L of them,
        # see _kv_write_stacked).
        self.kv_pages = jnp.zeros(
            (self.layers * total_pages, 2, page_size,
             self.kv_heads * self.head_dim),
            dt,
        )
        # page 0 is reserved as the "trash" page: bucketed prefill pads the
        # prompt up to a multiple of PREFILL_BUCKET (one jit trace per bucket
        # instead of one per prompt length) and the padded rows' K/V land
        # there (causal attention means they never affect real tokens)
        self.free_pages: List[int] = list(range(total_pages - 1, 0, -1))
        self.seq_pages: Dict = {}
        self.seq_len: Dict = {}
        self.last_token: Dict = {}
        self.seq_params: Dict = {}
        self.seq_adapter: Dict = {}
        # per-request attention window (None = model default) and the count
        # of leading logical pages already released back to the pool because
        # they fell fully below every layer's sliding-window band
        self.seq_window: Dict = {}
        self.seq_released: Dict = {}
        self.vocab = model.token_embedding.weight.shape[0]
        # penalty state: host prompt masks per request; device [B, V] count
        # stack cached per batch composition (rebuilt with one gather/scatter
        # when requests join/leave)
        self.seq_prompt_mask: Dict = {}
        # per-request chosen-token logprobs (populated when
        # SamplingParams.logprobs is set)
        self.seq_logprobs: Dict = {}
        self._pen_cache = None  # (ids tuple, counts [B,V], pmask [B,V])
        self._pen_dirty: set = set()
        self.temperature = temperature
        # constrained decoding (models.constrained): registered TokenDFA
        # transition tables stacked into ONE [sum_states, V] device array;
        # row 0 is the "free" automaton (every token allowed, self-loop) so
        # unconstrained requests cost nothing extra when mixed in
        self._constraints: Dict = {}
        self._c_offsets: Dict = {}
        self._ctable_host = np.zeros((1, self.vocab), np.int32)
        self._ctable_dev = None
        self.seq_cstate: Dict = {}
        self.key = jax.random.PRNGKey(seed)
        self._sample_fn = jax.jit(
            sample_tokens,
            static_argnames=("max_top_k", "return_logprobs"),
        )
        # prefix cache (vLLM-style): full prompt pages are content-addressed
        # by a chain hash over page-sized token chunks; matching prefixes of
        # later requests share the physical pages (refcounted). Pages whose
        # refcount drops to 0 stay cached on an LRU until the allocator
        # reclaims them. Copy-on-write protects shared pages from rewinds.
        self._page_refs: Dict[int, int] = {}
        self._hash_to_page: Dict[bytes, int] = {}
        self._page_hash: Dict[int, bytes] = {}
        from collections import OrderedDict

        self._lru: "OrderedDict[int, None]" = OrderedDict()
        self.cache_hit_tokens = 0
        self.cache_miss_tokens = 0
        self._copy_page_fn = jax.jit(
            self._copy_page, donate_argnums=(0,)
        )
        # serving weights are frozen: precompute fused per-layer QKV weights
        # once (one [D, (H+2H_kv)*hd] matmul per layer instead of three) and
        # pass them as jit ARGS — closure capture would bake them into the
        # compiled program as constants
        self._extras = self._precompute_extras(model)
        self._step_fn = jax.jit(self._decode_step, donate_argnums=(1,))
        self._chunk_fn = jax.jit(self._decode_chunk, donate_argnums=(1,))
        self._prefill_fn = jax.jit(self._prefill_seq, donate_argnums=(1,),
                                   static_argnames=("req_window",))

    def _quantize_weight(self, w):
        """Weight entry for the decode path: plain array (no quantization)
        or a (values, scales) pair — uint8 nibble-packed int4 with per-group
        scales, or int8 with per-channel scales. Decode is HBM-bandwidth
        bound on weights at low batch, so packed weights cut the per-token
        weight traffic 4x (int4) / 2x (int8) vs bf16."""
        if not self.quantize_bits:
            return w
        from ..ops.quantization import (
            int4_group_size, quantize_int4, quantize_int8,
        )

        if self.quantize_bits == 8:
            return quantize_int8(w, axis=0)
        return quantize_int4(w, group_size=int4_group_size(w.shape[0]))

    @staticmethod
    def _mm(a, w, out_dtype=None):
        """Matmul against a weight entry (see :meth:`_quantize_weight`)."""
        out_dtype = out_dtype or a.dtype
        if isinstance(w, tuple):
            from ..ops.quantization import int4_matmul, int8_matmul

            vals, scales = w
            if vals.dtype == jnp.uint8:
                return int4_matmul(a, vals, scales, out_dtype=out_dtype)
            return int8_matmul(a, vals, scales, out_dtype=out_dtype)
        acc = jnp.promote_types(a.dtype, jnp.float32)
        return jnp.matmul(a, w, preferred_element_type=acc).astype(out_dtype)

    def _precompute_extras(self, model):
        if self.quantize_bits:
            raise ValueError(
                "quantize_bits is supported on ModernBatchServer"
            )
        ws, bs = [], []
        any_bias = False
        for block in model.encoder.blocks:
            att = block.attention
            ws.append(jnp.concatenate(
                [att.w_q.weight, att.w_k.weight, att.w_v.weight], axis=1
            ))
            row = []
            for lin in (att.w_q, att.w_k, att.w_v):
                n = lin.weight.shape[1]
                if lin.bias is not None:
                    any_bias = True
                    row.append(lin.bias)
                else:
                    row.append(jnp.zeros((n,), lin.weight.dtype))
            bs.append(jnp.concatenate(row))
        return (tuple(ws), tuple(bs) if any_bias else None)

    # -- request lifecycle --------------------------------------------------
    def add(self, seq_id, prompt_tokens,
            params: Optional[SamplingParams] = None,
            adapter: Optional[str] = None,
            window: Optional[int] = None,
            constraint: Optional[str] = None) -> None:
        """Admit a request: dense one-shot prefill of the prompt (full-matmul
        efficiency; all K/V rows written into pages in one jitted call).
        ``params`` sets per-request sampling controls (temperature / top-k /
        top-p); default is the server-level ``temperature``. ``adapter``
        names a LoRA adapter previously registered with
        :meth:`ModernBatchServer.register_adapter`. ``window`` caps THIS
        request's attention to its last ``window`` tokens (combined with any
        per-layer model windows, tighter wins); when every layer ends up
        windowed, pages that fall fully below the band are released back to
        the pool mid-generation — KV memory is O(window), not O(length).
        ``constraint`` names a :meth:`register_constraint`-ed TokenDFA: the
        request's output is grammar-constrained (masked sampling), see
        :mod:`lamp_tpu.models.constrained`."""
        if seq_id in self.seq_pages:
            raise ValueError(f"duplicate request {seq_id}")
        if window is not None:
            window = int(window)
            if window <= 0:
                raise ValueError("window must be a positive int")
        if constraint is not None:
            if constraint not in self._c_offsets:
                raise ValueError(f"unknown constraint {constraint!r}")
            # global state index into the stacked table (DFA start is 0)
            self.seq_cstate[seq_id] = self._c_offsets[constraint]
        aidx = self._adapter_index(adapter)
        self.seq_adapter[seq_id] = aidx
        self.seq_window[seq_id] = window
        self.seq_released[seq_id] = 0
        sp = params or SamplingParams(temperature=self.temperature)
        self.seq_params[seq_id] = sp
        if sp.logprobs:
            self.seq_logprobs[seq_id] = []
        if sp.has_penalties:
            # host-side prompt mask; the [B, V] count state lives on device
            # in a batch-composition cache (_pen_cache) updated inside the
            # fused scan — no per-seq device rows, no recurring transfers
            mask = np.zeros(self.vocab, bool)
            mask[np.asarray(prompt_tokens).reshape(-1)] = True
            self.seq_prompt_mask[seq_id] = mask
            self._pen_dirty.add(seq_id)
        self.seq_pages[seq_id] = []
        self.seq_len[seq_id] = 0
        prompt = np.asarray(prompt_tokens).reshape(-1)
        n_prefill = len(prompt) - 1
        matched = 0
        hashes = []
        if self.enable_prefix_cache and n_prefill > 0:
            # reuse the longest cached prefix of full pages: shared physical
            # pages, no recompute (chain hash ⇒ identical token history)
            # the salt partitions the cache: adapters AND windows change the
            # K/V contents (a window alters layer-1 attention outputs, hence
            # every later layer's K/V for the same tokens)
            hashes = self._prefix_hashes(
                prompt[:-1],
                salt=(f"{aidx}:{window}".encode()
                      if (aidx or window is not None) else b""),
            )
            pages = self.seq_pages[seq_id]
            for h in hashes:
                pg = self._hash_to_page.get(h)
                if pg is None:
                    break
                self._incref(pg)
                pages.append(pg)
            matched = len(pages) * self.page_size
            self.seq_len[seq_id] = matched
            self.cache_hit_tokens += matched
            self.cache_miss_tokens += n_prefill - matched
        if matched > 0 or ((self._tp > 1 or aidx) and n_prefill > 0):
            if n_prefill > matched:
                # the suffix attends over the cached pages: chunked decode
                # with per-token causality over the shared page table.
                # (Under tensor parallelism cold prompts also prefill through
                # this path — one TP kernel serves decode, chunk and prefill.)
                self._prefill_suffix(seq_id, prompt[matched:-1])
            if self.enable_prefix_cache and hashes:
                self._register_pages(seq_id, hashes)
            self.last_token[seq_id] = int(prompt[-1])
            self._release_pages(seq_id)
            return
        if n_prefill > 0:
            # allocate the pages/slots for all prefill tokens
            slots = []
            for _ in range(n_prefill):
                slots.append(self._alloc_slot(seq_id))
                self.seq_len[seq_id] += 1
            # bucket the length so prefill compiles once per bucket; padded
            # rows write their K/V to the reserved trash page (cap at the
            # model's context length — positions beyond it don't exist)
            t_pad = min(
                -(-n_prefill // self.PREFILL_BUCKET) * self.PREFILL_BUCKET,
                self.model.context_length,
            )
            n_pad = max(t_pad, n_prefill) - n_prefill
            tp = np.asarray(
                [p for p, _ in slots] + [0] * n_pad, np.int32
            )
            ts = np.asarray(
                [sl for _, sl in slots]
                + [j % self.page_size for j in range(n_pad)], np.int32,
            )
            tokens = np.concatenate(
                [prompt[:-1], np.zeros(n_pad, prompt.dtype)]
            ).astype(np.int32)
            self.kv_pages = self._prefill_fn(
                self.model, self.kv_pages,
                jnp.asarray(tokens), jnp.asarray(tp), jnp.asarray(ts),
                req_window=window,
            )
        if self.enable_prefix_cache and hashes:
            self._register_pages(seq_id, hashes)
        self.last_token[seq_id] = int(prompt[-1])
        self._release_pages(seq_id)

    # -- prefix cache ----------------------------------------------------
    def _prefix_hashes(self, prompt_kv, salt: bytes = b"") -> List[bytes]:
        """Chain hash per FULL page-sized chunk of the prompt's KV tokens;
        hash i commits to all tokens up to and including chunk i. ``salt``
        partitions the cache (e.g. by LoRA adapter — different adapters
        produce different K/V for the same tokens)."""
        import hashlib

        ps = self.page_size
        out = []
        h = salt
        for i in range(len(prompt_kv) // ps):
            chunk = np.asarray(
                prompt_kv[i * ps:(i + 1) * ps], np.int64
            ).tobytes()
            h = hashlib.sha256(h + chunk).digest()
            out.append(h)
        return out

    def _incref(self, pg: int) -> None:
        r = self._page_refs.get(pg, 0)
        if r == 0:
            self._lru.pop(pg, None)  # back in active use
        self._page_refs[pg] = r + 1

    def _register_pages(self, seq_id, hashes) -> None:
        """Content-address this request's full prompt pages so later
        requests can share them."""
        pages = self.seq_pages[seq_id]
        for i, h in enumerate(hashes):
            if i >= len(pages):
                break
            if h in self._hash_to_page:
                continue
            pg = pages[i]
            if pg in self._page_hash:
                continue
            self._hash_to_page[h] = pg
            self._page_hash[pg] = h

    def _prefill_suffix(self, seq_id, suffix) -> None:
        """Prefill the uncached tail after a prefix-cache hit (and all TP
        prompts): chunked decode, bucketed to PREFILL_BUCKET for one jit
        trace per bucket. Pad rows write their K/V to the reserved trash
        page 0 (like dense prefill) — they allocate NOTHING, so the pool
        can never be transiently exhausted by padding."""
        m = len(suffix)
        if m == 0:
            return
        ctx = self.model.context_length
        start = self.seq_len[seq_id]
        m_pad = min(
            -(-m // self.PREFILL_BUCKET) * self.PREFILL_BUCKET, ctx - start
        )
        n_pad = max(m_pad, m) - m
        tp = np.zeros((1, m + n_pad), np.int32)
        ts = np.zeros((1, m + n_pad), np.int32)
        for j in range(m):
            tp[0, j], ts[0, j] = self._alloc_slot(seq_id)
            self.seq_len[seq_id] += 1
        for j in range(n_pad):
            ts[0, m + j] = j % self.page_size  # page 0: the trash page
        idx, _ = self._views([seq_id])
        toks = np.concatenate(
            [np.asarray(suffix, np.int32), np.zeros(n_pad, np.int32)]
        )
        _, self.kv_pages = self._chunk_fn(
            self.model, self.kv_pages, jnp.asarray(toks[None]),
            idx, jnp.asarray([start], jnp.int32), jnp.asarray(tp),
            jnp.asarray(ts), self._extras, self._lora_arg([seq_id]),
            self._windows_arg([seq_id]),
        )

    def _prefill_seq(self, model, kv_pages, tokens, token_pages,
                     token_slots, req_window=None):
        """Dense prefill of ONE sequence: full causal forward over [T] tokens,
        writing every layer's K/V rows into (token_pages, token_slots).
        ``req_window`` (static) applies this request's attention window."""
        t = tokens.shape[0]
        x = model.token_embedding(tokens[None]) + jnp.take(
            model.position_embedding.weight, jnp.arange(t)[None], axis=0
        )  # [1, T, D]
        from ..ops.attention import mha_reference

        deferred_rows = []  # all layers' rows -> ONE stacked scatter
        for li, block in enumerate(model.encoder.blocks):
            att = block.attention
            h = att.num_heads
            a = block.norm1(x)

            def heads(lin):
                y = a @ lin.weight
                if lin.bias is not None:
                    y = y + lin.bias
                return y.reshape(1, t, h, self.head_dim).transpose(0, 2, 1, 3)

            q = heads(att.w_q)
            kk = heads(att.w_k)
            vv = heads(att.w_v)
            # write kv rows: [T, H*D] into page slots (deferred: prefill
            # attention reads the in-flight kk/vv, not the pool)
            k_rows = kk[0].transpose(1, 0, 2).reshape(t, -1)
            v_rows = vv[0].transpose(1, 0, 2).reshape(t, -1)
            deferred_rows.append((k_rows, v_rows))
            o = mha_reference(q, kk, vv, causal=True, window=req_window)
            o = o.transpose(0, 2, 1, 3).reshape(1, t, -1)
            ow = jnp.matmul(
                o, att.w_o.weight,
                preferred_element_type=jnp.promote_types(
                    o.dtype, jnp.float32
                ),
            ).astype(o.dtype)
            if att.w_o.bias is not None:
                ow = ow + att.w_o.bias
            x = x + ow * block.scale1
            m = block.w2(block.activation(block.w1(block.norm2(x))))
            x = x + m * block.scale2
        return _kv_write_stacked(kv_pages, self.total_pages, token_pages,
                                 token_slots, deferred_rows)

    def remove(self, seq_id) -> None:
        pages = self.seq_pages.pop(seq_id)
        if self.enable_prefix_cache:
            for pg in pages:
                if pg >= 0:
                    self._decref(pg)
        else:
            self.free_pages.extend(pg for pg in pages if pg >= 0)
        self.seq_len.pop(seq_id)
        self.last_token.pop(seq_id)
        self.seq_params.pop(seq_id, None)
        self.seq_adapter.pop(seq_id, None)
        self.seq_window.pop(seq_id, None)
        self.seq_released.pop(seq_id, None)
        self.seq_cstate.pop(seq_id, None)
        self.seq_logprobs.pop(seq_id, None)
        self.seq_prompt_mask.pop(seq_id, None)
        self._pen_dirty.discard(seq_id)

    def fork(self, src_id, dst_id) -> None:
        """Duplicate a sequence's decode state WITHOUT copying its KV: the
        child references the parent's physical pages (refcounted); the
        first write into the shared tail page triggers the prefix cache's
        copy-on-write (see :meth:`_alloc_slot`), so a fork costs one page
        copy amortized — the substrate for beam search and any
        tree-structured decode. Requires ``enable_prefix_cache=True`` (that
        flag owns the refcount/COW machinery)."""
        if not self.enable_prefix_cache:
            raise RuntimeError("fork requires enable_prefix_cache=True")
        if dst_id in self.seq_pages:
            raise ValueError(f"duplicate request {dst_id}")
        if src_id not in self.seq_pages:
            raise KeyError(f"unknown request {src_id}")
        for pg in self.seq_pages[src_id]:
            if pg >= 0:
                self._incref(pg)
        self.seq_pages[dst_id] = list(self.seq_pages[src_id])
        self.seq_len[dst_id] = self.seq_len[src_id]
        self.last_token[dst_id] = self.last_token[src_id]
        self.seq_params[dst_id] = self.seq_params[src_id]
        self.seq_adapter[dst_id] = self.seq_adapter.get(src_id, 0)
        self.seq_window[dst_id] = self.seq_window.get(src_id)
        self.seq_released[dst_id] = self.seq_released.get(src_id, 0)
        if src_id in self.seq_cstate:
            self.seq_cstate[dst_id] = self.seq_cstate[src_id]
        if src_id in self.seq_logprobs:
            self.seq_logprobs[dst_id] = list(self.seq_logprobs[src_id])
        if src_id in self.seq_prompt_mask:
            self.seq_prompt_mask[dst_id] = self.seq_prompt_mask[src_id].copy()
            self._pen_dirty.add(dst_id)

    # -- sliding-window KV release ---------------------------------------
    def kv_bound_for(self, window: Optional[int] = None) -> Optional[int]:
        """Max tokens of history ANY layer can still attend for a request
        with per-request ``window``, or None when some layer is unbounded.
        bound = max over layers of min(layer window, request window)."""
        bound = 0
        for w in self._windows:
            if w is None and window is None:
                return None
            eff = (w if window is None
                   else (window if w is None else min(w, window)))
            bound = max(bound, eff)
        return bound

    def _kv_bound(self, seq_id) -> Optional[int]:
        return self.kv_bound_for(self.seq_window.get(seq_id))

    def _release_pages(self, seq_id) -> None:
        """Free leading logical pages whose every token is below the
        sliding-window band for ALL layers — they can never be attended
        again (lengths only grow; rewind is guarded). Freed entries become
        -1 sentinels in the logical page list (the table hands the kernel
        the trash page 0 for them; windowed masking keeps those lanes out
        of every softmax)."""
        bound = self._kv_bound(seq_id)
        if bound is None:
            return
        ps = self.page_size
        pages = self.seq_pages[seq_id]
        j = self.seq_released[seq_id]
        # page j holds tokens [j*ps, (j+1)*ps); releasable when its newest
        # token is below len - bound with one token of slack (the kernel
        # sees lengths+1 during decode)
        while j < len(pages) and (j + 1) * ps <= self.seq_len[seq_id] - bound:
            pg = pages[j]
            if pg >= 0:
                if self.enable_prefix_cache:
                    self._decref(pg)
                else:
                    self.free_pages.append(pg)
                pages[j] = -1
            j += 1
        self.seq_released[seq_id] = j

    def _windows_arg(self, seq_ids):
        """[B] per-request window limits for the kernels (0 = no limit), or
        None when no active request sets one (STATIC — the compiled program
        carries no window logic at all)."""
        if not any(self.seq_window.get(s) for s in seq_ids):
            return None
        return jnp.asarray(
            [self.seq_window.get(s) or 0 for s in seq_ids], jnp.int32
        )

    @property
    def active(self) -> List:
        return list(self.seq_pages)

    # -- internals ------------------------------------------------------

    def _adapter_index(self, name) -> int:
        if name is None:
            return 0
        raise NotImplementedError(
            "LoRA adapters are supported on ModernBatchServer"
        )

    def _lora_arg(self, seq_ids):
        """(adapter_ids [B], stacks) jit argument, or None when no adapter
        is registered (STATIC — zero overhead in the compiled program)."""
        if not getattr(self, "_adapters", None):
            return None
        host_ids = [self.seq_adapter.get(s, 0) for s in seq_ids]
        if not any(host_ids):
            return None  # purely-base batch: no gather/delta work at all
        return (jnp.asarray(host_ids, jnp.int32), self._lora_stacks)

    def _copy_page(self, kv_pages, src, dst):
        """Device-side page copy for copy-on-write: gathers the page's rows
        across ALL layers of the stacked pool ([L, 2, page, F] worth of
        K+V) and scatters them at the destination ids — one gather + one
        scatter regardless of depth."""
        off = jnp.arange(self.layers, dtype=jnp.int32) * self.total_pages
        return kv_pages.at[off + dst].set(kv_pages[off + src])

    @property
    def available_pages(self) -> int:
        """Pages the allocator can hand out: free + reclaimable cached."""
        return len(self.free_pages) + len(self._lru)

    def _take_page(self) -> int:
        if self.free_pages:
            return self.free_pages.pop()
        if self._lru:  # reclaim the least-recently-used cached page
            pg, _ = self._lru.popitem(last=False)
            h = self._page_hash.pop(pg, None)
            if h is not None and self._hash_to_page.get(h) == pg:
                del self._hash_to_page[h]
            return pg
        raise RuntimeError("KV page pool exhausted")

    def _decref(self, pg: int) -> None:
        r = self._page_refs.get(pg, 1) - 1
        if r > 0:
            self._page_refs[pg] = r
            return
        self._page_refs.pop(pg, None)
        if pg in self._page_hash:
            self._lru[pg] = None  # keep the KV around, reclaimable
            self._lru.move_to_end(pg)
        else:
            self.free_pages.append(pg)

    def _invalidate_page(self, pg: int) -> None:
        h = self._page_hash.pop(pg, None)
        if h is not None and self._hash_to_page.get(h) == pg:
            del self._hash_to_page[h]

    def _alloc_slot(self, seq_id) -> Tuple[int, int]:
        pos = self.seq_len[seq_id]
        if pos >= self.model.context_length:
            # BatchServer is the low-level engine: request lifecycle
            # (max_tokens, stop tokens, context-edge retirement) belongs to
            # the caller (ServingEngine does this; see _budget). Fail loudly
            # here instead of overflowing the page table.
            raise RuntimeError(
                f"sequence {seq_id!r} is at context_length="
                f"{self.model.context_length}; remove() it (ServingEngine "
                "handles max_tokens/stop/context retirement automatically)")
        pages = self.seq_pages[seq_id]
        if pos % self.page_size == 0 and pos // self.page_size == len(pages):
            if self.enable_prefix_cache:
                pg = self._take_page()
                self._page_refs[pg] = 1
            else:
                if not self.free_pages:
                    raise RuntimeError("KV page pool exhausted")
                pg = self.free_pages.pop()
            pages.append(pg)
        pg = pages[pos // self.page_size]
        if self.enable_prefix_cache:
            if self._page_refs.get(pg, 1) > 1:
                # about to write into a SHARED page (rewind landed inside a
                # cached prefix): copy-on-write
                new = self._take_page()
                self._page_refs[new] = 1
                self.kv_pages = self._copy_page_fn(self.kv_pages, pg, new)
                self._decref(pg)
                pages[pos // self.page_size] = new
                pg = new
            elif pg in self._page_hash:
                # sole owner, but the page is content-addressed: the write
                # changes its content, so drop the cache entry
                self._invalidate_page(pg)
        return pg, pos % self.page_size

    def _views(self, seq_ids):
        b = len(seq_ids)
        idx = np.zeros((b, self.max_pages_per_seq), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, sid in enumerate(seq_ids):
            pages = self.seq_pages[sid]
            idx[i, :len(pages)] = pages
            lens[i] = self.seq_len[sid]
        # released pages (-1 sentinels) point at the trash page 0: the
        # kernel's window mask keeps their tokens out of every softmax
        np.maximum(idx, 0, out=idx)
        return jnp.asarray(idx), jnp.asarray(lens)

    def _decode_step(self, model, kv_pages, tokens, page_idx, lengths,
                     token_pages, token_slots, extras, lora=None,
                     req_windows=None):
        """Process a [B] batch of tokens sitting at positions ``lengths``:
        write their per-layer K/V into (token_pages, token_slots), attend over
        history + self, return (logits [B,V], new_kv_pages)."""
        b = tokens.shape[0]
        wqkv, bqkv = extras
        x = model.token_embedding(tokens[:, None]) + jnp.take(
            model.position_embedding.weight, lengths[:, None], axis=0
        )
        hd = self.head_dim
        deferred_rows = []  # per-layer (k_rows, v_rows) written after loop
        for li, block in enumerate(model.encoder.blocks):
            att = block.attention
            h = att.num_heads
            a = block.norm1(x)[:, 0]          # [B, D_model]

            y = jnp.matmul(
                a, wqkv[li],
                preferred_element_type=jnp.promote_types(a.dtype, jnp.float32),
            ).astype(a.dtype)
            if bqkv is not None:
                y = y + bqkv[li]
            nq = h * hd
            q = y[:, :nq].reshape(b, h, hd)
            kk = y[:, nq:2 * nq].reshape(b, h, hd)
            vv = y[:, 2 * nq:].reshape(b, h, hd)
            # current token injected via append_kv; pool write deferred out
            # of the layer loop (one combined scatter per layer after it)
            kk_f, vv_f = kk.reshape(b, -1), vv.reshape(b, -1)
            deferred_rows.append((kk_f, vv_f))
            o = paged_attention(
                q, kv_pages, None, page_idx, lengths,
                num_kv_heads=self.kv_heads,
                pages_per_block=self.pages_per_block,
                windows=req_windows,
                append_kv=(kk_f, vv_f),
                page_offset=li * self.total_pages,
            )
            o = o.reshape(b, 1, h * self.head_dim)
            ow = jnp.matmul(
                o, att.w_o.weight,
                preferred_element_type=jnp.promote_types(
                    o.dtype, jnp.float32
                ),
            ).astype(o.dtype)
            if att.w_o.bias is not None:
                ow = ow + att.w_o.bias
            x = x + ow * block.scale1
            m = block.w2(block.activation(block.w1(block.norm2(x))))
            x = x + m * block.scale2
        # deferred pool write (see _kv_write_stacked): ONE scatter for all
        # layers, off the critical path because attention used append_kv
        kv_pages = _kv_write_stacked(kv_pages, self.total_pages,
                                     token_pages, token_slots, deferred_rows)
        x = model.final_norm(x)
        w = model.token_embedding.weight
        logits = jnp.einsum(
            "btd,vd->btv", x, w, preferred_element_type=jnp.float32
        )[:, 0]
        return logits, kv_pages

    def _decode_chunk(self, model, kv_pages, tokens, page_idx,
                      lengths, token_pages, token_slots, extras, lora=None,
                      req_windows=None):
        """Process M tokens per sequence in ONE call (chunked decode): write
        all their K/V, then attend with per-token causality by treating each
        of the B·M tokens as a pseudo-sequence sharing its sequence's page
        table with length = position + 1. tokens/token_pages/token_slots are
        [B, M]; returns (logits [B, M, V], pools).

        Used for speculative-decoding verification and chunked prefill."""
        b, m = tokens.shape
        win_r = (None if req_windows is None
                 else jnp.repeat(req_windows, m))
        wqkv, bqkv = extras
        pos = lengths[:, None] + jnp.arange(m)[None, :]  # [B, M]
        x = model.token_embedding(tokens) + jnp.take(
            model.position_embedding.weight, pos, axis=0
        )
        hd = self.head_dim
        plen = (pos + 1).reshape(-1)                     # [B*M]
        pidx = jnp.repeat(page_idx, m, axis=0)           # [B*M, P]
        for li, block in enumerate(model.encoder.blocks):
            att = block.attention
            h = att.num_heads
            a = block.norm1(x)                           # [B, M, D]
            y = jnp.matmul(
                a, wqkv[li],
                preferred_element_type=jnp.promote_types(a.dtype, jnp.float32),
            ).astype(a.dtype)
            if bqkv is not None:
                y = y + bqkv[li]
            nq = h * hd
            q = y[..., :nq].reshape(b, m, h, hd)
            kk = y[..., nq:2 * nq]
            vv = y[..., 2 * nq:]
            # chunk attention READS the pool (pseudo-sequence causality),
            # so this layer's write cannot be deferred: per-layer scatter
            # at the layer's page_offset band of the stacked pool
            kv_pages = _kv_write(
                kv_pages, token_pages + li * self.total_pages, token_slots,
                kk, vv)
            o = paged_attention(
                q.reshape(b * m, h, hd), kv_pages, None, pidx,
                plen, num_kv_heads=self.kv_heads,
                pages_per_block=self.pages_per_block, windows=win_r,
                page_offset=li * self.total_pages,
            ).reshape(b, m, h * hd)
            ow = jnp.matmul(
                o, att.w_o.weight,
                preferred_element_type=jnp.promote_types(
                    o.dtype, jnp.float32
                ),
            ).astype(o.dtype)
            if att.w_o.bias is not None:
                ow = ow + att.w_o.bias
            x = x + ow * block.scale1
            mm = block.w2(block.activation(block.w1(block.norm2(x))))
            x = x + mm * block.scale2
        x = model.final_norm(x)
        w = model.token_embedding.weight
        logits = jnp.einsum(
            "bmd,vd->bmv", x, w, preferred_element_type=jnp.float32
        )
        return logits, kv_pages

    def _require_capacity(self, seq_ids, n: int) -> None:
        """Pre-scan the batch BEFORE any page release / slot allocation /
        length bump: the context-length error must never leave a step
        half-mutated with some sequences already holding fresh pages or
        phantom seq_len entries (ADVICE r4; shared by every multi-token
        entry point, not just _advance)."""
        ctx = self.model.context_length
        full = [s for s in seq_ids if self.seq_len[s] + n > ctx]
        if full:
            raise RuntimeError(
                f"sequences {full!r} would exceed context_length={ctx} "
                f"after {n} token(s); remove() them (ServingEngine handles "
                "max_tokens/stop/context retirement automatically)")

    def _advance(self, seq_ids, tokens):
        """Write tokens' KV + return logits; bumps lengths."""
        self._require_capacity(seq_ids, 1)
        for s in seq_ids:
            self._release_pages(s)
        slots = [self._alloc_slot(s) for s in seq_ids]
        idx, lens = self._views(seq_ids)
        tp = jnp.asarray([p for p, _ in slots], jnp.int32)
        ts = jnp.asarray([sl for _, sl in slots], jnp.int32)
        logits, self.kv_pages = self._step_fn(
            self.model, self.kv_pages, tokens, idx, lens, tp, ts,
            self._extras, self._lora_arg(seq_ids), self._windows_arg(seq_ids),
        )
        for s in seq_ids:
            self.seq_len[s] += 1
        return logits

    def advance_chunk(self, seq_ids, tokens):
        """Process M tokens per sequence in one jitted call; returns logits
        [B, M, V]. Token j's logits predict token j+1 (causal within the
        chunk). Bumps lengths by M."""
        tokens = np.asarray(tokens, np.int32)
        b, m = tokens.shape
        self._require_capacity(seq_ids, m)
        for s in seq_ids:
            self._release_pages(s)
        lens0 = jnp.asarray(
            [self.seq_len[s] for s in seq_ids], jnp.int32
        )
        tp = np.zeros((b, m), np.int32)
        ts = np.zeros((b, m), np.int32)
        for i, s in enumerate(seq_ids):
            for j in range(m):
                tp[i, j], ts[i, j] = self._alloc_slot(s)
                self.seq_len[s] += 1
        # page table AFTER allocation (a chunk may open new pages)
        idx, _ = self._views(seq_ids)
        logits, self.kv_pages = self._chunk_fn(
            self.model, self.kv_pages, jnp.asarray(tokens), idx,
            lens0, jnp.asarray(tp), jnp.asarray(ts), self._extras,
            self._lora_arg(seq_ids), self._windows_arg(seq_ids),
        )
        return logits

    def rewind(self, seq_id, n: int) -> None:
        """Drop the last ``n`` tokens' KV (speculative-decoding rollback).
        The rows are simply forgotten: lengths mask them and their slots are
        reused on the next advance."""
        self.seq_len[seq_id] -= n
        assert self.seq_len[seq_id] >= 0
        rel = self.seq_released.get(seq_id, 0)
        if rel:
            bound = self._kv_bound(seq_id)
            # the rewound band must not re-enter released history
            if bound is None or self.seq_len[seq_id] + 1 - bound < rel * self.page_size:
                raise RuntimeError(
                    f"rewind({n}) crosses KV already released by the "
                    f"sliding window for {seq_id!r}"
                )
        keep = -(-self.seq_len[seq_id] // self.page_size)
        keep = max(keep, rel)
        pages = self.seq_pages[seq_id]
        while len(pages) > keep:
            pg = pages.pop()
            if self.enable_prefix_cache:
                self._decref(pg)
            else:
                self.free_pages.append(pg)

    def register_constraint(self, name: str, dfa) -> None:
        """Register a :class:`~lamp_tpu.models.constrained.TokenDFA` under
        ``name`` for use by ``add(..., constraint=name)``. The transition
        table is appended to the server's stacked device table once; per
        decode step a constrained batch pays one row gather (which doubles
        as the state advance). Compile the DFA with ``eos_token`` so every
        accepting state keeps an out-edge (emitting EOS ends the request
        with a guaranteed-complete match)."""
        if name in self._constraints:
            raise ValueError(f"duplicate constraint {name!r}")
        if dfa.vocab_size != self.vocab:
            raise ValueError(
                f"constraint vocab {dfa.vocab_size} != model vocab "
                f"{self.vocab}"
            )
        offset = self._ctable_host.shape[0]
        block = dfa.table.astype(np.int32).copy()
        block[block >= 0] += offset
        self._constraints[name] = dfa
        self._c_offsets[name] = offset
        self._ctable_host = np.concatenate([self._ctable_host, block], 0)
        self._ctable_dev = jnp.asarray(self._ctable_host)

    def _constraint_arrays(self, seq_ids):
        """(table, states [B]) for the batch, or (None, None) — STATIC —
        when no active request is constrained (keeps the gather/mask out of
        the compiled program entirely)."""
        states = [self.seq_cstate.get(sid, 0) for sid in seq_ids]
        if not any(states):
            return None, None
        return self._ctable_dev, jnp.asarray(states, jnp.int32)

    def _constraint_advance(self, seq_ids, toks_host):
        """Host-side automaton advance after sampling: toks_host is [B]
        or [n, B]."""
        tt = toks_host if toks_host.ndim == 2 else toks_host[None]
        for i, sid in enumerate(seq_ids):
            st = self.seq_cstate.get(sid, 0)
            if st == 0:
                continue
            for t in tt[:, i]:
                st = int(self._ctable_host[st, int(t)])
                if st < 0:  # no out-edges (see register_constraint note):
                    st = 0  # fall back to unconstrained rather than wrap
                    break
            self.seq_cstate[sid] = st

    def _sampling_arrays(self, seq_ids):
        """(temperature [B], top_k [B] | None, top_p [B] | None) for the
        active requests. The filter arrays are None (STATIC — skips the
        [B, V] sorts in the compiled program) when no request uses them."""
        ps = [self.seq_params[s] for s in seq_ids]
        # temps None (STATIC) when the whole batch is greedy: the compiled
        # program is a bare argmax, no categorical/PRNG work in the scan
        temps = None
        if any(p.temperature > 0 for p in ps):
            temps = jnp.asarray([p.temperature for p in ps], jnp.float32)
        top_k = None
        max_top_k = 0
        if any(p.top_k > 0 for p in ps):
            top_k = jnp.asarray([p.top_k for p in ps], jnp.int32)
            # static jit key: 0 for anything the default candidate set
            # already covers; power-of-two buckets above it (one compile
            # per bucket instead of one per distinct top_k value)
            from .sampling import NUCLEUS_CAND

            mk = max(p.top_k for p in ps)
            if mk > NUCLEUS_CAND:
                max_top_k = 1 << (mk - 1).bit_length()
        top_p = None
        if any(p.top_p < 1.0 for p in ps):
            top_p = jnp.asarray([p.top_p for p in ps], jnp.float32)
        min_p = None
        if any(p.min_p > 0.0 for p in ps):
            min_p = jnp.asarray([p.min_p for p in ps], jnp.float32)
        penalties = None
        if any(p.has_penalties for p in ps):
            counts, pmask = self._pen_stacks(seq_ids)
            penalties = (
                counts, pmask,
                jnp.asarray([p.presence_penalty for p in ps], jnp.float32),
                jnp.asarray([p.frequency_penalty for p in ps], jnp.float32),
                jnp.asarray([p.repetition_penalty for p in ps], jnp.float32),
            )
        want_lp = any(p.logprobs for p in ps)
        return temps, top_k, top_p, min_p, penalties, max_top_k, want_lp

    def _pen_stacks(self, seq_ids):
        """Device [B, V] (counts, prompt_mask) for the current batch.
        Cached per composition; on a change, surviving rows are gathered
        from the previous stack (ONE device op) and new/dirty rows start at
        zero — steady-state decode adds no extra dispatches."""
        key = tuple(seq_ids)
        cache = self._pen_cache
        if cache is not None and cache[0] == key and not self._pen_dirty:
            return cache[1], cache[2]
        b, v = len(seq_ids), self.vocab
        zero_m = np.zeros(v, bool)
        pmask = jnp.asarray(np.stack([
            self.seq_prompt_mask.get(s, zero_m) for s in seq_ids
        ]))
        counts = jnp.zeros((b, v), jnp.int32)
        if cache is not None:
            old_ids, old_counts, _ = cache
            pos = {s: i for i, s in enumerate(old_ids)}
            keep = [
                (i, pos[s]) for i, s in enumerate(seq_ids)
                if s in pos and s not in self._pen_dirty
            ]
            if keep:
                rows = jnp.asarray([i for i, _ in keep], jnp.int32)
                srcs = jnp.asarray([j for _, j in keep], jnp.int32)
                counts = counts.at[rows].set(old_counts[srcs])
        self._pen_dirty.clear()
        self._pen_cache = (key, counts, pmask)
        return counts, pmask

    def _pen_store(self, seq_ids, counts):
        """Write updated device counts back into the composition cache."""
        cache = self._pen_cache
        if cache is not None and cache[0] == tuple(seq_ids):
            self._pen_cache = (cache[0], counts, cache[2])

    # -- decode ----------------------------------------------------------
    def step(self) -> Dict:
        """Decode one token for every active request; returns {seq_id: token}.
        Sampling honours each request's :class:`SamplingParams`."""
        seq_ids = self.active
        if not seq_ids:
            return {}
        tokens = jnp.asarray([self.last_token[s] for s in seq_ids], jnp.int32)
        logits = self._advance(seq_ids, tokens)
        temps, top_k, top_p, min_p, pen, mtk, want_lp = \
            self._sampling_arrays(seq_ids)
        ctable, cstates = self._constraint_arrays(seq_ids)
        rows = None if ctable is None else jnp.take(ctable, cstates, axis=0)
        self.key, sub = jax.random.split(self.key)
        out = self._sample_fn(logits, sub, temps, top_k, top_p, pen,
                              rows, min_p, max_top_k=mtk,
                              return_logprobs=want_lp)
        nxt, lps = out if want_lp else (out, None)
        # ONE device->host transfer for the whole batch (per-element int()
        # would pay a full round trip per sequence)
        nxt_host = np.asarray(nxt)
        if lps is not None:
            lps_host = np.asarray(lps)
            for i, sid in enumerate(seq_ids):
                if sid in self.seq_logprobs:
                    self.seq_logprobs[sid].append(float(lps_host[i]))
        if ctable is not None:
            self._constraint_advance(seq_ids, nxt_host)
        if pen is not None:
            self._pen_store(seq_ids, _bump_counts(pen[0], nxt))
        out = {}
        for i, s in enumerate(seq_ids):
            t = int(nxt_host[i])
            self.last_token[s] = t
            out[s] = t
        return out

    def _decode_many(self, model, kv_pages, tokens0, page_idx,
                     lens0, token_pages, token_slots, extras, lora, key,
                     temps, top_k, top_p, penalties, req_windows=None,
                     ctable=None, cstates=None, min_p=None,
                     *, n: int, max_top_k: int = 0,
                     return_logprobs: bool = False):
        """``n`` decode steps fused into ONE program: lax.scan over the
        single-token step with on-device per-request sampling (temperature /
        top-k / top-p) feeding each step's output token into the next.
        Amortizes the per-dispatch host/runtime latency over n tokens — the
        multi-step scheduling idea; between the n steps no requests can join
        or leave (the standard multi-step tradeoff)."""

        if penalties is not None:
            counts0, pmask, pres, freq, rep = penalties

        def body(carry, i):
            tok, kvp, k_, cnts, cst = carry
            logits, kvp = self._decode_step(
                model, kvp, tok, page_idx, lens0 + i,
                token_pages[:, i], token_slots[:, i], extras, lora,
                req_windows,
            )
            k_, sub = jax.random.split(k_)
            pen = None if cnts is None else (cnts, pmask, pres, freq, rep)
            # constrained rows double as mask and automaton step
            rows = None if cst is None else jnp.take(ctable, cst, axis=0)
            out = sample_tokens(logits, sub, temps, top_k, top_p, pen,
                                rows, min_p, max_top_k,
                                return_logprobs=return_logprobs)
            nxt, lp = out if return_logprobs else (out, jnp.zeros(()))
            if cst is not None:
                stepped = rows[jnp.arange(nxt.shape[0]), nxt]
                # dead-end guard (mirrors _constraint_advance): fall back
                # to the free automaton instead of wrapping to the last row
                cst = jnp.maximum(stepped, 0)
            if cnts is not None:  # track generated tokens inside the scan
                cnts = cnts.at[jnp.arange(nxt.shape[0]), nxt].add(1)
            return (nxt, kvp, k_, cnts, cst), (nxt, lp)

        (_, kv_pages, _, cnts_end, cst_end), (toks, lps) = \
            jax.lax.scan(
                body,
                (tokens0, kv_pages, key,
                 None if penalties is None else counts0, cstates),
                jnp.arange(n),
            )
        return toks, kv_pages, cnts_end, (
            lps if return_logprobs else None)

    def step_many(self, n: int) -> Dict:
        """Decode ``n`` tokens for every active request in ONE dispatched
        program (sampling stays on device); returns {seq_id: [tok, ...]}.
        Compiles once per (batch-size, n) pair."""
        seq_ids = self.active
        if not seq_ids:
            return {}
        b = len(seq_ids)
        self._require_capacity(seq_ids, n)
        for s in seq_ids:
            self._release_pages(s)
        lens0 = jnp.asarray([self.seq_len[s] for s in seq_ids], jnp.int32)
        tokens0 = jnp.asarray(
            [self.last_token[s] for s in seq_ids], jnp.int32
        )
        tp = np.zeros((b, n), np.int32)
        ts = np.zeros((b, n), np.int32)
        for i, s in enumerate(seq_ids):
            for j in range(n):
                tp[i, j], ts[i, j] = self._alloc_slot(s)
                self.seq_len[s] += 1
        # page table AFTER allocation (later steps may open new pages; the
        # per-step live length keeps unwritten slots out of attention)
        idx, _ = self._views(seq_ids)
        if not hasattr(self, "_many_fn"):
            self._many_fn = jax.jit(
                self._decode_many, donate_argnums=(1,),
                static_argnames=("n", "max_top_k", "return_logprobs"),
            )
        temps, top_k, top_p, min_p, pen, mtk, want_lp = \
            self._sampling_arrays(seq_ids)
        ctable, cstates = self._constraint_arrays(seq_ids)
        self.key, sub = jax.random.split(self.key)
        toks, self.kv_pages, cnts_end, lps = self._many_fn(
            self.model, self.kv_pages, tokens0, idx, lens0,
            jnp.asarray(tp), jnp.asarray(ts), self._extras,
            self._lora_arg(seq_ids), sub, temps, top_k, top_p, pen,
            self._windows_arg(seq_ids), ctable, cstates, min_p, n=n,
            max_top_k=mtk, return_logprobs=want_lp,
        )
        if cnts_end is not None:
            self._pen_store(seq_ids, cnts_end)
        toks_host = np.asarray(toks)  # [n, B]
        if lps is not None:
            lps_host = np.asarray(lps)  # [n, B]
            for i, sid in enumerate(seq_ids):
                if sid in self.seq_logprobs:
                    self.seq_logprobs[sid].extend(
                        float(x) for x in lps_host[:, i])
        if ctable is not None:
            self._constraint_advance(seq_ids, toks_host)
        out = {}
        for i, s in enumerate(seq_ids):
            seq_toks = [int(t) for t in toks_host[:, i]]
            self.last_token[s] = seq_toks[-1]
            out[s] = seq_toks
        return out


class ModernBatchServer(BatchServer):
    """Paged-KV batch decode for :class:`lamp_tpu.nn.ModernLM` (RoPE + GQA +
    RMSNorm + SwiGLU). The pool holds ``num_kv_heads`` fused head rows; RoPE
    rotates q/k at each token's absolute position before the pages are
    written, so the cached keys are already position-encoded.

    ``mesh=`` enables Megatron-style TENSOR-PARALLEL serving over the mesh's
    ``tp_axis``: attention heads and MLP hidden units are sharded across
    chips (the per-layer KV pools shard over kv heads, so each chip's paged
    kernel gathers only its local head lanes), with one psum after the
    attention out-projection and one after the MLP down-projection per
    layer, and a vocab all-gather for the logits. The reference has no
    multi-device model striping at all (docs/docs/multigpu.md:13); this is
    how a model larger than one chip's HBM serves on a TPU pod slice."""

    def __init__(self, model, *, mesh=None, tp_axis: str = "tp", **kwargs):
        # MoE (SwiGLUMoE) blocks: dense-dispatch expert MLP on the decode
        # paths; composes with paging/windows/constraints/sampling but not
        # (yet) with weight quantization, tensor parallelism or LoRA
        self._moe = any(not hasattr(b.mlp, "w1")
                        or not hasattr(b.mlp.w1, "weight")
                        for b in model.blocks)
        if self._moe:
            self._moe_top_k = int(model.blocks[0].mlp.top_k)
            if kwargs.get("quantize_bits") == 4:
                raise NotImplementedError(
                    "int4 quantization with MoE serving (int8 is supported)"
                )
        if mesh is not None:
            self._tp = int(mesh.shape[tp_axis])
            self._mesh = mesh
            self._tp_axis = tp_axis
        super().__init__(model, **kwargs)
        if self._tp > 1:
            if self.quantize_bits:
                raise NotImplementedError(
                    "quantize_bits under tensor parallelism"
                )
            if self.kv_heads % self._tp or self.heads % self._tp:
                raise ValueError(
                    f"tp={self._tp} must divide heads={self.heads} and "
                    f"kv_heads={self.kv_heads}"
                )
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            mk = lambda spec: NamedSharding(self._mesh, spec)  # noqa: E731
            pool = mk(P(None, None, None, tp_axis))
            self.kv_pages = jax.device_put(self.kv_pages, pool)
            wqkv, wo, w1, w3, w2, lmh = self._extras
            if self._moe:
                n_exp = w3[0].shape[0]
                if n_exp % self._tp:
                    raise ValueError(
                        f"tp={self._tp} must divide num_experts={n_exp}"
                    )
            elif any(w.shape[1] % self._tp for w in w1):
                raise ValueError(
                    f"tp={self._tp} must divide the MLP hidden width"
                )
            # vocab padded to a tp multiple; logits sliced back after the
            # all-gather (padded columns are zero weights)
            self._vocab = lmh.shape[1]
            pad = -lmh.shape[1] % self._tp
            if pad:
                lmh = jnp.concatenate(
                    [lmh, jnp.zeros((lmh.shape[0], pad), lmh.dtype)], axis=1
                )
            col, row = mk(P(None, tp_axis)), mk(P(tp_axis, None))
            if self._moe:
                # expert parallelism: stacked expert tensors shard on the
                # leading E axis; the [D, E] gate is replicated (top-k needs
                # the full expert distribution on every chip)
                rep = mk(P())
                ep = mk(P(tp_axis, None, None))
                w1 = tuple((jax.device_put(g, rep), jax.device_put(ws, ep))
                           for g, ws in w1)
                w3 = tuple(jax.device_put(w, ep) for w in w3)
                w2 = tuple(jax.device_put(w, ep) for w in w2)
            else:
                w1 = tuple(jax.device_put(w, col) for w in w1)
                w3 = tuple(jax.device_put(w, col) for w in w3)
                w2 = tuple(jax.device_put(w, row) for w in w2)
            self._extras = (
                tuple(jax.device_put(w, col) for w in wqkv),
                tuple(jax.device_put(w, row) for w in wo),
                w1,
                w3,
                w2,
                jax.device_put(lmh, col),
            )

    def _introspect(self, model):
        block = model.blocks[0]
        self.layers = len(model.blocks)
        self.heads = block.num_heads
        self.kv_heads = block.num_kv_heads
        d_model = block.w_q.weight.shape[0]
        self.head_dim = d_model // self.heads
        # per-layer sliding windows (Mistral/Gemma-style): the paged kernel
        # walks only the pages intersecting each layer's band, so windowed
        # layers decode in O(window) regardless of sequence length
        self._windows = tuple(
            getattr(b, "window", None) for b in model.blocks
        )

    # -- multi-LoRA serving ------------------------------------------------
    _PROJ_NAMES = ("q", "k", "v", "o", "w1", "w3", "w2")

    def register_adapter(self, name: str, lora_model) -> None:
        """Register a LoRA adapter for per-request use (S-LoRA-style
        multi-adapter serving): ``lora_model`` is a ``lora_inject``-ed
        version of this server's base model. Requests pass
        ``add(..., adapter=name)``; one batch mixes adapters freely — the
        decode step gathers each row's A/B factors from stacked adapter
        tensors and adds the low-rank delta beside the shared base matmuls.
        The prefix cache is partitioned per adapter (different adapters
        produce different K/V for the same prompt)."""
        from ..nn.lora import LoRALinear

        if self._tp > 1:
            raise NotImplementedError("adapters under tensor parallelism")
        if getattr(self, "_moe", False):
            raise NotImplementedError("adapters on MoE models")
        if not hasattr(self, "_adapters"):
            self._adapters: Dict[str, int] = {}
            self._adapter_defs: Dict[str, dict] = {}
        if name in self._adapters:
            raise ValueError(f"duplicate adapter {name!r}")

        def proj_modules(blk):
            return {
                "q": blk.w_q, "k": blk.w_k, "v": blk.w_v, "o": blk.w_o,
                "w1": blk.mlp.w1, "w3": blk.mlp.w3, "w2": blk.mlp.w2,
            }

        per_layer = []
        n_collected = 0
        for blk in lora_model.blocks:
            row = {}
            for p, mod in proj_modules(blk).items():
                if type(mod) is LoRALinear:
                    row[p] = (
                        mod.lora_a,
                        (mod.lora_b.astype(jnp.float32)
                         * mod.scale).astype(mod.lora_b.dtype),
                    )
                    n_collected += 1
            per_layer.append(row)
        # every LoRALinear in the model must be served — silently dropping
        # one (e.g. an adapted untied lm_head) would break the
        # logits-match-merged-model guarantee
        from ..nn.lora import _map_linears

        n_total = 0

        def count(path, node):
            nonlocal n_total
            if type(node) is LoRALinear:
                n_total += 1
            return None

        _map_linears(lora_model, count, ())
        if n_total != n_collected:
            raise ValueError(
                f"adapter {name!r} adapts {n_total - n_collected} module(s) "
                "outside the block q/k/v/o/w1/w3/w2 projections (e.g. an "
                "untied lm_head or embedding); these are not servable — "
                "restrict lora_inject's match= accordingly"
            )
        self._adapter_defs[name] = {"layers": per_layer}
        self._adapters[name] = len(self._adapters) + 1  # 0 = base
        self._rebuild_lora_stacks()

    def _rebuild_lora_stacks(self) -> None:
        """Stack every adapter's A/B factors: per adapted projection p,
        A[li]: [N+1, D_in, r_p], B[li]: [N+1, r_p, O] — index 0 is the
        all-zero base "adapter", smaller ranks are zero-padded to r_p."""
        n = len(self._adapters)
        order = sorted(self._adapters, key=self._adapters.get)
        blk0 = self.model.blocks[0]
        proj_shapes = {
            "q": blk0.w_q.weight.shape, "k": blk0.w_k.weight.shape,
            "v": blk0.w_v.weight.shape, "o": blk0.w_o.weight.shape,
            "w1": blk0.mlp.w1.weight.shape, "w3": blk0.mlp.w3.weight.shape,
            "w2": blk0.mlp.w2.weight.shape,
        }
        dt = blk0.w_q.weight.dtype
        stacks = {}
        for p in self._PROJ_NAMES:
            ranks = [
                self._adapter_defs[nm]["layers"][li][p][0].shape[1]
                for nm in order for li in range(self.layers)
                if p in self._adapter_defs[nm]["layers"][li]
            ]
            if not ranks:
                continue
            r = max(ranks)
            d_in, d_out = proj_shapes[p]
            a_layers, b_layers = [], []
            for li in range(self.layers):
                a_rows = np.zeros((n + 1, d_in, r), dt)
                b_rows = np.zeros((n + 1, r, d_out), dt)
                for k, nm in enumerate(order):
                    entry = self._adapter_defs[nm]["layers"][li].get(p)
                    if entry is None:
                        continue
                    a, bv = entry
                    a_rows[k + 1, :, :a.shape[1]] = np.asarray(
                        a.astype(dt)
                    )
                    b_rows[k + 1, :bv.shape[0], :] = np.asarray(
                        bv.astype(dt)
                    )
                a_layers.append(jnp.asarray(a_rows))
                b_layers.append(jnp.asarray(b_rows))
            stacks[p] = (tuple(a_layers), tuple(b_layers))
        self._lora_stacks = stacks

    def _adapter_index(self, name) -> int:
        if name is None:
            return 0
        try:
            return self._adapters[name]
        except (AttributeError, KeyError):
            raise ValueError(f"unknown adapter {name!r}") from None

    @staticmethod
    def _lora_delta(x, stack, ids, li):
        """Per-row low-rank delta: x [B, T, D_in], stack layer li holds
        A [N, D_in, r] / B [N, r, O] (scale folded into B), ids [B].
        Returns [B, T, O] in x.dtype."""
        A, Bv = stack
        a_g = jnp.take(A[li], ids, axis=0)      # [B, D_in, r]
        b_g = jnp.take(Bv[li], ids, axis=0)     # [B, r, O]
        h = jnp.einsum(
            "btd,bdr->btr", x, a_g, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return jnp.einsum(
            "btr,bro->bto", h, b_g, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    def _quantize_stacked(self, w):
        """Quantize a stacked expert tensor [E, K, N] per expert per output
        channel: (values int8 [E, K, N], scales f32 [E, 1, N]). No-op pass-
        through without quantize_bits."""
        if not self.quantize_bits:
            return w
        from ..ops.quantization import quantize_int8

        return jax.vmap(functools.partial(quantize_int8, axis=0))(w)

    def _moe_mlp_rows(self, h, li, w1, w3, w2, tp_axis=None):
        """Sparse-MLP decode: dense dispatch (every expert computes the few
        decode rows, combined by the renormalized top-k gates) — at decode
        batch sizes gathering per-token expert weights would materialize
        more bytes than computing all experts, so dense dispatch is also
        the fast path, exactly like training (nn.moe.SwiGLUMoE).

        With ``tp_axis`` (inside a shard_map body) this is EXPERT-parallel:
        the stacked expert tensors arrive sharded on their leading E axis,
        the gate/top-k runs on the full (replicated) expert distribution,
        each chip computes only its local experts weighted by its slice of
        the combine matrix, and one psum sums the expert contributions —
        the MoE analogue of the dense path's MLP-down psum."""
        wg, w1s = w1[li]
        w3s, w2s = w3[li], w2[li]
        shape = h.shape
        flat = h.reshape(-1, shape[-1])
        acc = jnp.promote_types(h.dtype, jnp.float32)
        logits = jnp.matmul(flat, wg.astype(flat.dtype),
                            preferred_element_type=acc)
        probs = jax.nn.softmax(logits, axis=-1)
        tv, ti = jax.lax.top_k(probs, self._moe_top_k)
        tv = tv / jnp.maximum(jnp.sum(tv, axis=-1, keepdims=True), 1e-9)
        combine = jnp.zeros(probs.shape, acc).at[
            jnp.arange(flat.shape[0])[:, None], ti
        ].set(tv.astype(acc))
        if tp_axis is not None:
            e_local = (w3s[0] if isinstance(w3s, tuple) else w3s).shape[0]
            combine = jax.lax.dynamic_slice_in_dim(
                combine, jax.lax.axis_index(tp_axis) * e_local, e_local,
                axis=1,
            )
        if isinstance(w3s, tuple):
            # int8 experts: dynamically quantize the decode rows once, run
            # the up/gate einsums on the int8 MXU path, and re-quantize the
            # per-expert activations for the down projection
            from ..ops.quantization import quantize_int8

            w1v, w1sc = w1s
            w3v, w3sc = w3s
            w2v, w2sc = w2s
            xq, x_scale = quantize_int8(flat, axis=1)       # [T,D], [T,1]
            up = jnp.einsum("td,edh->eth", xq, w1v,
                            preferred_element_type=jnp.int32)
            g1 = up.astype(jnp.float32) * x_scale[None] * w1sc
            g3 = jnp.einsum("td,edh->eth", xq, w3v,
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * x_scale[None] * w3sc
            g = jax.nn.silu(g1) * g3                        # [E,T,H] f32
            gq, g_scale = jax.vmap(
                functools.partial(quantize_int8, axis=1)
            )(g)                                            # [E,T,H],[E,T,1]
            out = jnp.einsum("eth,ehd->etd", gq, w2v,
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * g_scale * w2sc
        else:
            g = jax.nn.silu(jnp.einsum(
                "td,edh->eth", flat, w1s.astype(flat.dtype),
                preferred_element_type=acc,
            )) * jnp.einsum(
                "td,edh->eth", flat, w3s.astype(flat.dtype),
                preferred_element_type=acc,
            )
            out = jnp.einsum(
                "eth,ehd->etd", g.astype(flat.dtype), w2s.astype(flat.dtype),
                preferred_element_type=acc,
            )
        y = jnp.einsum("te,etd->td", combine, out.astype(acc))
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        return y.reshape(shape).astype(h.dtype)

    def _precompute_extras(self, model):
        """All decode-path weights ride in extras (jit args, not closure
        constants): fused per-layer QKV, attention out-projection, the three
        SwiGLU matrices, and the logits matrix. With ``quantize_bits`` each
        entry is a packed (values, scales) pair (see :meth:`_quantize_weight`)
        — the unquantized entries are references, not copies."""
        q = self._quantize_weight

        def cat_qkv(blk):
            if self._tp == 1:
                return jnp.concatenate(
                    [blk.w_q.weight, blk.w_k.weight, blk.w_v.weight], axis=1
                )
            # tensor parallel: interleave per-shard [q_s | k_s | v_s] blocks
            # so a contiguous column chunk (what P(None, "tp") hands each
            # device) is exactly that device's fused projection
            t = self._tp
            nq = self.heads // t * self.head_dim
            nkv = self.kv_heads // t * self.head_dim
            parts = []
            for s in range(t):
                parts.append(blk.w_q.weight[:, s * nq:(s + 1) * nq])
                parts.append(blk.w_k.weight[:, s * nkv:(s + 1) * nkv])
                parts.append(blk.w_v.weight[:, s * nkv:(s + 1) * nkv])
            return jnp.concatenate(parts, axis=1)

        wqkv = tuple(q(cat_qkv(blk)) for blk in model.blocks)
        wo = tuple(q(blk.w_o.weight) for blk in model.blocks)
        if self._moe:
            # per layer: w1 entry carries (gate [D, E], stacked w1 [E, D, H]);
            # the tiny gate stays unquantized, the stacked expert tensors
            # quantize per expert per output channel (int8 only)
            qs = self._quantize_stacked
            w1 = tuple((blk.mlp.w_gate, qs(blk.mlp.w1))
                       for blk in model.blocks)
            w3 = tuple(qs(blk.mlp.w3) for blk in model.blocks)
            w2 = tuple(qs(blk.mlp.w2) for blk in model.blocks)
        else:
            w1 = tuple(q(blk.mlp.w1.weight) for blk in model.blocks)
            w3 = tuple(q(blk.mlp.w3.weight) for blk in model.blocks)
            w2 = tuple(q(blk.mlp.w2.weight) for blk in model.blocks)
        if model.lm_head is not None:
            lmh = q(model.lm_head.weight)
        else:
            # tied embedding: logits = x @ E^T; the packed transpose copy
            # costs V*D/2 bytes, the gather-side embedding stays bf16
            lmh = q(model.token_embedding.weight.T)
        return (wqkv, wo, w1, w3, w2, lmh)

    def _decode_step(self, model, kv_pages, tokens, page_idx, lengths,
                     token_pages, token_slots, extras, lora=None,
                     req_windows=None):
        if self._tp > 1:
            return self._tp_call(
                self._tp_decode_inner, model, kv_pages, tokens,
                page_idx, lengths, token_pages, token_slots, extras,
                req_windows,
            )
        b = tokens.shape[0]
        wqkv, wo, w1, w3, w2, lmh = extras
        x = model.token_embedding(tokens[:, None])  # [B, 1, D]
        # hoist the RoPE angle gathers out of the layer loop: every layer
        # rotates at the same per-token positions
        hd = self.head_dim
        c = jnp.take(model.rope_cos, lengths, axis=0).astype(jnp.float32)
        s = jnp.take(model.rope_sin, lengths, axis=0).astype(jnp.float32)
        c = c[:, None, :]  # [B, 1, hd/2] broadcasting over heads
        s = s[:, None, :]

        def rot(t):
            acc = t.astype(jnp.float32)
            t1, t2 = jnp.split(acc, 2, axis=-1)
            return jnp.concatenate(
                [t1 * c - t2 * s, t2 * c + t1 * s], axis=-1
            ).astype(t.dtype)

        nq = self.heads * hd
        nkv = self.kv_heads * hd
        dl = self._lora_delta
        deferred_rows = []  # per-layer (k_rows, v_rows) written after loop
        for li, block in enumerate(model.blocks):
            a3 = block.norm1(x)            # [B, 1, D]
            a = a3[:, 0]

            y = self._mm(a, wqkv[li])
            yq = y[:, :nq]
            yk = y[:, nq:nq + nkv]
            yv = y[:, nq + nkv:]
            if lora is not None:
                ids, st = lora
                if "q" in st:
                    yq = yq + dl(a3, st["q"], ids, li)[:, 0]
                if "k" in st:
                    yk = yk + dl(a3, st["k"], ids, li)[:, 0]
                if "v" in st:
                    yv = yv + dl(a3, st["v"], ids, li)[:, 0]
            # rotate at each token's own position ([B] lengths)
            q = rot(yq.reshape(b, self.heads, hd))
            kk = rot(yk.reshape(b, self.kv_heads, hd))
            vv = yv.reshape(b, self.kv_heads, hd)
            # the current token's K/V is INJECTED into the kernel
            # (append_kv) instead of read back from the pool, so the pool
            # write is deferred out of the layer loop entirely — see the
            # deferred-scatter block after the loop
            kk_f, vv_f = kk.reshape(b, -1), vv.reshape(b, -1)
            deferred_rows.append((kk_f, vv_f))
            o = paged_attention(
                q, kv_pages, None, page_idx, lengths,
                num_kv_heads=self.kv_heads,
                pages_per_block=self.pages_per_block,
                window=self._windows[li], windows=req_windows,
                append_kv=(kk_f, vv_f),
                page_offset=li * self.total_pages,
            )
            o3 = o.reshape(b, 1, -1)
            att = self._mm(o3, wo[li])
            if lora is not None and "o" in st:
                att = att + dl(o3, st["o"], ids, li)
            x = x + att
            h = block.norm2(x)
            if self._moe:
                down = self._moe_mlp_rows(h, li, w1, w3, w2)
            else:
                g1 = self._mm(h, w1[li])
                g3 = self._mm(h, w3[li])
                if lora is not None:
                    if "w1" in st:
                        g1 = g1 + dl(h, st["w1"], ids, li)
                    if "w3" in st:
                        g3 = g3 + dl(h, st["w3"], ids, li)
                gate = jax.nn.silu(g1) * g3
                down = self._mm(gate, w2[li])
                if lora is not None and "w2" in st:
                    down = down + dl(gate, st["w2"], ids, li)
            x = x + down
        # deferred pool write: ONE combined K+V scatter for ALL layers, off
        # the critical path (attention used append_kv), so XLA is free to
        # overlap it with the layer matmuls above
        kv_pages = _kv_write_stacked(kv_pages, self.total_pages,
                                     token_pages, token_slots, deferred_rows)
        x = model.final_norm(x)
        logits = self._mm(x, lmh, out_dtype=jnp.float32)[:, 0]
        return logits, kv_pages

    def _tp_call(self, inner, model, kv_pages, tokens, page_idx,
                 lengths, token_pages, token_slots, extras, req_windows=None):
        """shard_map ``inner`` over the tp axis: pools shard on the fused
        head-lane dim, extras per the Megatron column/row pattern, everything
        else replicated. ``inner`` returns replicated logits (psum/gather
        inside)."""
        from jax.sharding import PartitionSpec as P

        axis = self._tp_axis
        pool = P(None, None, None, axis)
        if getattr(self, "_moe", False):
            # per-layer w1 entries are (replicated gate, E-sharded experts)
            w1_spec = tuple((P(), P(axis, None, None))
                            for _ in range(self.layers))
            ep = P(axis, None, None)
            extras_spec = (
                P(None, axis), P(axis, None), w1_spec, ep, ep, P(None, axis),
            )
        else:
            extras_spec = (
                P(None, axis), P(axis, None), P(None, axis), P(None, axis),
                P(axis, None), P(None, axis),
            )
        in_specs = [P(), pool, P(), P(), P(), P(), P(), extras_spec]
        args = [model, kv_pages, tokens, page_idx, lengths,
                token_pages, token_slots, extras]
        if req_windows is not None:
            in_specs.append(P())
            args.append(req_windows)
        return jax.shard_map(
            inner,
            mesh=self._mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), pool),
            check_vma=False,
        )(*args)

    def _tp_decode_inner(self, model, kv_pages, tokens, page_idx,
                         lengths, token_pages, token_slots, extras,
                         req_windows=None):
        """Per-device body of the TP decode step: local q/kv heads, local
        pool lanes, psum after attention-out and MLP-down, vocab all-gather
        for the logits."""
        axis = self._tp_axis
        b = tokens.shape[0]
        wqkv, wo, w1, w3, w2, lmh = extras
        x = model.token_embedding(tokens[:, None])
        hd = self.head_dim
        c = jnp.take(model.rope_cos, lengths, axis=0).astype(jnp.float32)
        s = jnp.take(model.rope_sin, lengths, axis=0).astype(jnp.float32)
        c = c[:, None, :]
        s = s[:, None, :]

        def rot(t):
            acc = t.astype(jnp.float32)
            t1, t2 = jnp.split(acc, 2, axis=-1)
            return jnp.concatenate(
                [t1 * c - t2 * s, t2 * c + t1 * s], axis=-1
            ).astype(t.dtype)

        hq_l = self.heads // self._tp
        hkv_l = self.kv_heads // self._tp
        nq = hq_l * hd
        nkv = hkv_l * hd
        deferred_rows = []  # deferred writes, as in the non-TP decode step
        for li, block in enumerate(model.blocks):
            a = block.norm1(x)[:, 0]
            y = self._mm(a, wqkv[li])
            q = rot(y[:, :nq].reshape(b, hq_l, hd))
            kk = rot(y[:, nq:nq + nkv].reshape(b, hkv_l, hd))
            vv = y[:, nq + nkv:].reshape(b, hkv_l, hd)
            kk_f, vv_f = kk.reshape(b, -1), vv.reshape(b, -1)
            deferred_rows.append((kk_f, vv_f))
            o = paged_attention(
                q, kv_pages, None, page_idx, lengths,
                num_kv_heads=hkv_l, pages_per_block=self.pages_per_block,
                window=self._windows[li], windows=req_windows,
                append_kv=(kk_f, vv_f),
                page_offset=li * self.total_pages,
            )
            att = self._mm(o.reshape(b, 1, -1), wo[li])
            x = x + jax.lax.psum(att, axis)
            h = block.norm2(x)
            if self._moe:
                x = x + self._moe_mlp_rows(h, li, w1, w3, w2, tp_axis=axis)
            else:
                gate = jax.nn.silu(self._mm(h, w1[li])) * self._mm(h, w3[li])
                x = x + jax.lax.psum(self._mm(gate, w2[li]), axis)
        kv_pages = _kv_write_stacked(kv_pages, self.total_pages,
                                     token_pages, token_slots, deferred_rows)
        x = model.final_norm(x)
        local = self._mm(x, lmh, out_dtype=jnp.float32)  # [B, 1, Vp/t]
        logits = jax.lax.all_gather(
            local, axis, axis=2, tiled=True
        )[:, 0, :self._vocab]
        return logits, kv_pages

    def _tp_chunk_inner(self, model, kv_pages, tokens, page_idx,
                        lengths, token_pages, token_slots, extras,
                        req_windows=None):
        """Per-device body of the TP chunked decode ([B, M] tokens with
        per-token causality via pseudo-sequences; also the TP prefill path)."""
        axis = self._tp_axis
        b, m = tokens.shape
        win_r = (None if req_windows is None
                 else jnp.repeat(req_windows, m))
        wqkv, wo, w1, w3, w2, lmh = extras
        pos = lengths[:, None] + jnp.arange(m)[None, :]
        x = model.token_embedding(tokens)
        hd = self.head_dim
        c = jnp.take(model.rope_cos, pos, axis=0).astype(jnp.float32)
        s = jnp.take(model.rope_sin, pos, axis=0).astype(jnp.float32)
        c = c[:, :, None, :]
        s = s[:, :, None, :]

        def rot(t):
            acc = t.astype(jnp.float32)
            t1, t2 = jnp.split(acc, 2, axis=-1)
            return jnp.concatenate(
                [t1 * c - t2 * s, t2 * c + t1 * s], axis=-1
            ).astype(t.dtype)

        hq_l = self.heads // self._tp
        hkv_l = self.kv_heads // self._tp
        nq = hq_l * hd
        nkv = hkv_l * hd
        plen = (pos + 1).reshape(-1)
        pidx = jnp.repeat(page_idx, m, axis=0)
        for li, block in enumerate(model.blocks):
            a = block.norm1(x)
            y = self._mm(a, wqkv[li])
            q = rot(y[..., :nq].reshape(b, m, hq_l, hd))
            kk = rot(y[..., nq:nq + nkv].reshape(b, m, hkv_l, hd))
            vv = y[..., nq + nkv:]
            kv_pages = _kv_write(
                kv_pages, token_pages + li * self.total_pages, token_slots,
                kk.reshape(b, m, -1), vv)
            o = paged_attention(
                q.reshape(b * m, hq_l, hd), kv_pages, None,
                pidx, plen, num_kv_heads=hkv_l,
                pages_per_block=self.pages_per_block,
                window=self._windows[li], windows=win_r,
                page_offset=li * self.total_pages,
            ).reshape(b, m, -1)
            x = x + jax.lax.psum(self._mm(o, wo[li]), axis)
            h = block.norm2(x)
            if self._moe:
                x = x + self._moe_mlp_rows(h, li, w1, w3, w2, tp_axis=axis)
            else:
                gate = jax.nn.silu(self._mm(h, w1[li])) * self._mm(h, w3[li])
                x = x + jax.lax.psum(self._mm(gate, w2[li]), axis)
        x = model.final_norm(x)
        local = self._mm(x, lmh, out_dtype=jnp.float32)  # [B, M, Vp/t]
        logits = jax.lax.all_gather(
            local, axis, axis=2, tiled=True
        )[..., :self._vocab]
        return logits, kv_pages

    def _decode_chunk(self, model, kv_pages, tokens, page_idx,
                      lengths, token_pages, token_slots, extras, lora=None,
                      req_windows=None):
        if self._tp > 1:
            return self._tp_call(
                self._tp_chunk_inner, model, kv_pages, tokens,
                page_idx, lengths, token_pages, token_slots, extras,
                req_windows,
            )
        b, m = tokens.shape
        win_r = (None if req_windows is None
                 else jnp.repeat(req_windows, m))
        wqkv, wo, w1, w3, w2, lmh = extras
        pos = lengths[:, None] + jnp.arange(m)[None, :]  # [B, M]
        x = model.token_embedding(tokens)                # [B, M, D]
        hd = self.head_dim
        c = jnp.take(model.rope_cos, pos, axis=0).astype(jnp.float32)
        s = jnp.take(model.rope_sin, pos, axis=0).astype(jnp.float32)
        c = c[:, :, None, :]  # [B, M, 1, hd/2] broadcasting over heads
        s = s[:, :, None, :]

        def rot(t):
            acc = t.astype(jnp.float32)
            t1, t2 = jnp.split(acc, 2, axis=-1)
            return jnp.concatenate(
                [t1 * c - t2 * s, t2 * c + t1 * s], axis=-1
            ).astype(t.dtype)

        nq = self.heads * hd
        nkv = self.kv_heads * hd
        dl = self._lora_delta
        plen = (pos + 1).reshape(-1)
        pidx = jnp.repeat(page_idx, m, axis=0)
        for li, block in enumerate(model.blocks):
            a = block.norm1(x)
            y = self._mm(a, wqkv[li])
            yq = y[..., :nq]
            yk = y[..., nq:nq + nkv]
            yv = y[..., nq + nkv:]
            if lora is not None:
                ids, st = lora
                if "q" in st:
                    yq = yq + dl(a, st["q"], ids, li)
                if "k" in st:
                    yk = yk + dl(a, st["k"], ids, li)
                if "v" in st:
                    yv = yv + dl(a, st["v"], ids, li)
            q = rot(yq.reshape(b, m, self.heads, hd))
            kk = rot(yk.reshape(b, m, self.kv_heads, hd))
            vv = yv
            kv_pages = _kv_write(
                kv_pages, token_pages + li * self.total_pages, token_slots,
                kk.reshape(b, m, -1), vv)
            o = paged_attention(
                q.reshape(b * m, self.heads, hd), kv_pages, None,
                pidx, plen, num_kv_heads=self.kv_heads,
                pages_per_block=self.pages_per_block,
                window=self._windows[li], windows=win_r,
                page_offset=li * self.total_pages,
            ).reshape(b, m, -1)
            att = self._mm(o, wo[li])
            if lora is not None and "o" in st:
                att = att + dl(o, st["o"], ids, li)
            x = x + att
            h = block.norm2(x)
            if self._moe:
                down = self._moe_mlp_rows(h, li, w1, w3, w2)
            else:
                g1 = self._mm(h, w1[li])
                g3 = self._mm(h, w3[li])
                if lora is not None:
                    if "w1" in st:
                        g1 = g1 + dl(h, st["w1"], ids, li)
                    if "w3" in st:
                        g3 = g3 + dl(h, st["w3"], ids, li)
                gate = jax.nn.silu(g1) * g3
                down = self._mm(gate, w2[li])
                if lora is not None and "w2" in st:
                    down = down + dl(gate, st["w2"], ids, li)
            x = x + down
        x = model.final_norm(x)
        logits = self._mm(x, lmh, out_dtype=jnp.float32)
        return logits, kv_pages

    def _prefill_seq(self, model, kv_pages, tokens, token_pages,
                     token_slots, req_window=None):
        from ..nn.modern import apply_rope
        from ..ops.attention import mha_reference

        def minw(a, b_):
            if a is None:
                return b_
            return a if b_ is None else min(a, b_)

        t = tokens.shape[0]
        x = model.token_embedding(tokens[None])  # [1, T, D]
        cos, sin = model.rope_cos, model.rope_sin
        deferred_rows = []  # all layers' rows -> ONE stacked scatter
        for li, block in enumerate(model.blocks):
            a = block.norm1(x)

            def heads(lin, nh):
                return (a @ lin.weight).reshape(1, t, nh, self.head_dim
                                                ).transpose(0, 2, 1, 3)

            q = heads(block.w_q, self.heads)
            kk = heads(block.w_k, self.kv_heads)
            vv = heads(block.w_v, self.kv_heads)
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
            k_rows = kk[0].transpose(1, 0, 2).reshape(t, -1)
            v_rows = vv[0].transpose(1, 0, 2).reshape(t, -1)
            deferred_rows.append((k_rows, v_rows))
            if self.kv_heads != self.heads:
                rep = self.heads // self.kv_heads
                kk = jnp.repeat(kk, rep, axis=1)
                vv = jnp.repeat(vv, rep, axis=1)
            o = mha_reference(q, kk, vv, causal=True,
                              window=minw(self._windows[li], req_window))
            o = o.transpose(0, 2, 1, 3).reshape(1, t, -1)
            x = x + (o @ block.w_o.weight)
            m, _ = block.mlp.forward(block.norm2(x))
            x = x + m
        return _kv_write_stacked(kv_pages, self.total_pages, token_pages,
                                 token_slots, deferred_rows)



class ServingEngine:
    """Continuous-batching scheduler over a :class:`BatchServer` /
    :class:`ModernBatchServer`.

    Requests are submitted with per-request :class:`SamplingParams`
    (temperature / top-k / top-p / ``max_tokens`` / ``stop_tokens``) and
    queue until KV pages are available; each :meth:`step` admits what fits
    (conservative worst-case page reservation, so the pool can never be
    exhausted mid-flight), decodes a chunk of tokens for the whole batch in
    one fused dispatch (``step_many``), applies stop conditions, and retires
    finished requests — freeing their pages for the queue. The serving-layer
    counterpart of the training loop; the reference has no serving layer at
    all (SURVEY.md §1).

    Set ``max_tokens`` on requests for throughput: admission reserves
    ``ceil((prompt + max_new) / page_size)`` pages per request, so unbounded
    requests reserve a full context window each.

    Usage:
        engine = ServingEngine(server, decode_steps=8)
        engine.submit(prompt, SamplingParams(max_tokens=64), request_id="a")
        results = engine.run()          # {"a": [tok, ...], ...}
    """

    def __init__(self, server: BatchServer, *, decode_steps: int = 8,
                 max_batch: int = 64, on_token=None):
        """``on_token(request_id, token)`` streams tokens as they are
        accepted (after stop/budget filtering) — the serving-layer streaming
        hook; it fires once per emitted token, in order, from :meth:`step`.
        """
        self.server = server
        self.decode_steps = decode_steps
        self.max_batch = max_batch
        self.on_token = on_token
        from collections import deque

        self.pending = deque()       # (rid, prompt list, params)
        self.generated: Dict = {}    # rid -> [tokens so far]
        self.results: Dict = {}      # rid -> finished token list
        # chosen-token logprobs for requests with SamplingParams.logprobs,
        # aligned 1:1 with the emitted tokens (stop token excluded)
        self.result_logprobs: Dict = {}
        self._generated_lp: Dict = {}
        self._reserve: Dict = {}     # rid -> worst-case total pages
        self._max_new: Dict = {}     # rid -> decode budget
        self._next_id = 0
        # n>1 / best_of fan-out bookkeeping: child rids are (parent, i)
        self._parent: Dict = {}      # child rid -> parent rid
        self._fan: Dict = {}         # parent -> [branch tokens | None] * k
        self._fan_lp: Dict = {}      # parent -> per-branch logprob lists
        self._fan_n: Dict = {}       # parent -> n to return (<= k sampled)
        self._fan_ranked: Dict = {}  # parent -> rank branches by logprob
        self._fan_want_lp: Dict = {} # parent -> caller asked for logprobs
        self._retired = 0            # finished requests incl. fan children

    def submit(self, prompt_tokens, params: Optional[SamplingParams] = None,
               request_id=None, adapter: Optional[str] = None,
               window: Optional[int] = None,
               constraint: Optional[str] = None, n: int = 1,
               best_of: Optional[int] = None):
        """Queue a request; returns its id. Decoding starts once pages are
        available (see :meth:`step`). ``adapter`` selects a registered LoRA
        adapter for this request; ``window`` caps the request's attention to
        its last ``window`` tokens (bounded-KV admission: the reservation
        shrinks to O(window) pages when every layer ends up windowed);
        ``constraint`` names a DFA registered on the server with
        :meth:`BatchServer.register_constraint` — the request's output is
        grammar-constrained (compile the DFA with the request's EOS token
        and list that token in ``params.stop_tokens`` to stop on a complete
        match).

        Parallel sampling (vLLM-style): ``n > 1`` fans the request into n
        independently-sampled branches sharing one prompt — the prefix
        cache shares the prompt's KV pages, so the extra HBM is only each
        branch's generated tokens. The result for the request is then a
        LIST of n token lists (and ``result_logprobs`` a list of n logprob
        lists). ``best_of = k > n`` samples k branches and keeps the n with
        the highest cumulative logprob, ranked best-first (``n == 1`` with
        ``best_of`` still returns a plain token list — the best branch).
        Branch rids are ``(rid, i)``; ``on_token`` fires with those, so a
        streaming consumer can follow individual branches. Fan-out requires
        ``temperature > 0`` (greedy branches would be identical)."""
        rid = request_id if request_id is not None else f"req{self._next_id}"
        self._next_id += 1
        prompt = [int(t) for t in np.asarray(prompt_tokens).reshape(-1)]
        if not prompt:
            raise ValueError("empty prompt")
        ctx = self.server.model.context_length
        if len(prompt) > ctx:
            raise ValueError(f"prompt longer than context ({len(prompt)} > {ctx})")
        if params is None:
            # same default a direct server.add() would apply
            params = SamplingParams(temperature=self.server.temperature)
        self.server._adapter_index(adapter)  # validate early
        if window is not None and int(window) <= 0:
            raise ValueError("window must be a positive int")
        if constraint is not None and constraint not in self.server._c_offsets:
            raise ValueError(f"unknown constraint {constraint!r}")
        if n < 1:
            raise ValueError("n must be >= 1")
        if best_of is not None and best_of < n:
            raise ValueError("best_of must be >= n")
        k = best_of if best_of is not None else n
        if k > 1:
            if params.temperature == 0.0:
                raise ValueError(
                    "n/best_of > 1 requires temperature > 0 (greedy "
                    "branches would be identical)"
                )
            ranked = best_of is not None
            child_params = params
            if ranked and not params.logprobs:
                # ranking needs per-token logprobs; don't expose them
                # unless the caller asked
                child_params = dataclasses.replace(params, logprobs=True)
            self._fan[rid] = [None] * k
            self._fan_lp[rid] = [None] * k
            self._fan_n[rid] = n
            self._fan_ranked[rid] = ranked
            self._fan_want_lp[rid] = params.logprobs
            for i in range(k):
                child = (rid, i)
                self._parent[child] = rid
                self.pending.append(
                    (child, prompt, child_params, adapter, window, constraint)
                )
            return rid
        self.pending.append((rid, prompt, params, adapter, window, constraint))
        return rid

    def _budget(self, prompt_len: int, params: SamplingParams) -> int:
        """Decode-token budget for a request (stop at the context edge: the
        last processable position is context_length - 1)."""
        cap = self.server.model.context_length - prompt_len + 1
        if params.max_tokens is not None:
            cap = min(cap, params.max_tokens)
        return max(cap, 1)

    def _pages_for(self, prompt_len: int, max_new: int,
                   window: Optional[int] = None) -> int:
        # decode always runs full decode_steps chunks (tokens past a
        # request's budget are discarded), so reserve for max_new rounded
        # up to a chunk multiple; a sequence can never hold more than
        # context_length rows
        ds = self.decode_steps
        ps = self.server.page_size
        chunks = -(-max_new // ds)
        total_rows = min(prompt_len - 1 + chunks * ds,
                         self.server.model.context_length)
        need = -(-max(total_rows, 1) // ps)
        bound = self.server.kv_bound_for(window)
        if bound is not None:
            # sliding-window release keeps concurrent pages O(bound): the
            # band plus one partially-retired page plus one chunk of
            # release lag (release runs at chunk starts). Prefill allocates
            # the whole prompt before the first release, so a long prompt's
            # transient peak still has to fit.
            cap = -(-(bound + ps + ds) // ps) + 1
            prefill_pages = -(-max(prompt_len - 1, 1) // ps)
            need = min(need, max(cap, prefill_pages))
        return need

    def _held(self, rid) -> int:
        s = self.server
        return len(s.seq_pages[rid]) - s.seq_released.get(rid, 0)

    def _admit(self) -> None:
        s = self.server
        # pages still owed to requests already in flight
        owed = sum(self._reserve[r] - self._held(r) for r in s.seq_pages)
        while self.pending and len(s.seq_pages) < self.max_batch:
            rid, prompt, params, adapter, window, constraint = \
                self.pending[0]
            max_new = self._budget(len(prompt), params)
            need = self._pages_for(len(prompt), max_new, window)
            if s.available_pages < owed + need:
                break
            self.pending.popleft()
            s.add(rid, prompt, params, adapter=adapter, window=window,
                  constraint=constraint)
            self.generated[rid] = []
            if params.logprobs:
                self._generated_lp[rid] = []
            self._reserve[rid] = need
            self._max_new[rid] = max_new
            owed += need - self._held(rid)

    def step(self) -> Dict:
        """Admit + decode one chunk; returns {rid: tokens} for requests that
        FINISHED this step (stop token, max_tokens, or context edge)."""
        self._admit()
        s = self.server
        active = s.active
        if not active:
            return {}
        # full decode_steps chunks for the whole batch (tokens past a
        # request's budget are discarded — the reservation covers them);
        # only the hard context edge shrinks the chunk
        ctx = s.model.context_length
        n = min([self.decode_steps] + [ctx - s.seq_len[r] for r in active])
        n = max(n, 1)
        if n <= 1:
            chunk = {r: [t] for r, t in s.step().items()}
        else:
            chunk = s.step_many(n)
        finished = {}
        for rid, toks in chunk.items():
            g = self.generated[rid]
            params = s.seq_params[rid]
            lp_tail = (s.seq_logprobs[rid][-len(toks):]
                       if rid in self._generated_lp else None)
            done = False
            for i, t in enumerate(toks):
                if t in params.stop_tokens:
                    done = True
                    break  # stop token is not emitted
                g.append(t)
                if lp_tail is not None:
                    self._generated_lp[rid].append(lp_tail[i])
                if self.on_token is not None:
                    self.on_token(rid, t)
                if len(g) >= self._max_new[rid]:
                    done = True
                    break
            if done:
                finished[rid] = g
        out = {}
        for rid in finished:
            s.remove(rid)
            toks = self.generated.pop(rid)
            lp = self._generated_lp.pop(rid, None)
            self._reserve.pop(rid)
            self._max_new.pop(rid)
            self._retired += 1
            parent = self._parent.pop(rid, None)
            if parent is None:
                self.results[rid] = toks
                if lp is not None:
                    self.result_logprobs[rid] = lp
                out[rid] = toks
                continue
            # fan-out branch: slot its tokens; the parent finishes (and is
            # the only thing reported) once every branch is in
            self._fan[parent][rid[1]] = toks
            self._fan_lp[parent][rid[1]] = lp
            if any(v is None for v in self._fan[parent]):
                continue
            branches = self._fan.pop(parent)
            lps = self._fan_lp.pop(parent)
            nkeep = self._fan_n.pop(parent)
            want_lp = self._fan_want_lp.pop(parent)
            if self._fan_ranked.pop(parent):
                order = sorted(range(len(branches)),
                               key=lambda i: -sum(lps[i]))[:nkeep]
            else:
                order = range(nkeep)
            kept = [branches[i] for i in order]
            kept_lp = [lps[i] for i in order]
            if nkeep == 1:
                # best_of with n=1 reads like a plain request
                kept, kept_lp = kept[0], kept_lp[0]
            self.results[parent] = kept
            if want_lp:
                self.result_logprobs[parent] = kept_lp
            out[parent] = kept
        return out

    def run(self) -> Dict:
        """Drain the queue; returns {rid: token list} for every request."""
        while self.pending or self.server.seq_pages:
            before = self._retired
            self.step()
            if self._retired == before and not self.server.seq_pages:
                raise RuntimeError(
                    "scheduler stalled: pending requests cannot be admitted "
                    "(page pool too small for the largest request)"
                )
        return dict(self.results)

    def cancel(self, rid) -> bool:
        """Abort a request, pending or in flight. Its KV pages free
        immediately and it never appears in :attr:`results`. A fan-out
        parent (``n``/``best_of`` submit) cancels every branch. Returns
        True if anything was cancelled — False means the id is unknown or
        already finished. The serving-layer client-disconnect hook (the
        HTTP front-end calls this when a streaming client goes away)."""
        if rid in self._fan:
            k = len(self._fan.pop(rid))
            self._fan_lp.pop(rid, None)
            self._fan_n.pop(rid, None)
            self._fan_ranked.pop(rid, None)
            self._fan_want_lp.pop(rid, None)
            any_cancelled = False
            for i in range(k):
                child = (rid, i)
                if self._parent.pop(child, None) is not None:
                    any_cancelled |= self._cancel_leaf(child)
            return any_cancelled
        self._parent.pop(rid, None)
        return self._cancel_leaf(rid)

    def _cancel_leaf(self, rid) -> bool:
        for i, entry in enumerate(self.pending):
            if entry[0] == rid:
                del self.pending[i]
                return True
        s = self.server
        if rid in s.seq_pages:
            s.remove(rid)
            self.generated.pop(rid, None)
            self._generated_lp.pop(rid, None)
            self._reserve.pop(rid, None)
            self._max_new.pop(rid, None)
            self._retired += 1
            return True
        return False


class BeamSearchDecoder:
    """Deterministic beam search over a paged server.

    The reference offers beam decode only by re-forwarding full prefixes
    (lamp/data/Text.scala sequenceToBeam); here every beam keeps paged KV
    and a step is ONE batched decode over the live beams. Beam forks use
    :meth:`BatchServer.fork` — child beams reference the parent's physical
    pages (refcounted, copy-on-write at the shared tail page), so a fork
    never copies the whole KV history.

    Scoring: cumulative logprob, final ranking divided by
    ``len ** length_penalty`` (HF convention; 0 = pure sum, 1 = mean).
    ``early_stopping`` stops once ``beams`` finished hypotheses exist;
    otherwise the search runs to ``max_tokens`` and unfinished beams
    compete with finished ones in the final ranking.

    Usage:
        server = ModernBatchServer(model, ..., enable_prefix_cache=True)
        decoder = BeamSearchDecoder(server, beams=4)
        hyps = decoder.decode(prompt, max_tokens=32, stop_tokens=(eos,))
        best_tokens, best_score = hyps[0]
    """

    def __init__(self, server: BatchServer, *, beams: int = 4,
                 length_penalty: float = 1.0, early_stopping: bool = True):
        if not server.enable_prefix_cache:
            raise ValueError(
                "BeamSearchDecoder needs a server with "
                "enable_prefix_cache=True (beam forks ride the refcount/COW "
                "machinery)"
            )
        if beams < 1:
            raise ValueError("beams must be >= 1")
        self.server = server
        self.beams = beams
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self._n = 0

    def _score(self, cum: float, length: int) -> float:
        return cum / max(length, 1) ** self.length_penalty

    def decode(self, prompt_tokens, *, max_tokens: int,
               stop_tokens=()) -> List[Tuple[List[int], float]]:
        """Beam-search one prompt; returns up to ``beams`` hypotheses as
        ``(generated_tokens, score)`` sorted best-first. Stop tokens are
        not emitted."""
        s = self.server
        prompt = [int(t) for t in np.asarray(prompt_tokens).reshape(-1)]
        if not prompt:
            raise ValueError("empty prompt")
        stop = set(int(t) for t in stop_tokens)
        w = self.beams
        tag = self._n
        self._n += 1
        root = ("_beam", tag, 0)
        s.add(root, prompt)
        live = [root]          # seq ids, one per live beam
        toks = {root: []}      # generated tokens per live beam
        cums = {root: 0.0}     # cumulative logprob per live beam
        done: List[Tuple[List[int], float]] = []
        next_child = 1
        ctx = s.model.context_length
        max_steps = min(int(max_tokens), ctx - len(prompt) + 1)

        for _ in range(max_steps):
            feed = jnp.asarray([s.last_token[b] for b in live], jnp.int32)
            logits = s._advance(live, feed)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            k = min(2 * w, logp.shape[-1])
            top_lp, top_ix = jax.lax.top_k(logp, k)
            top_lp = np.asarray(top_lp)
            top_ix = np.asarray(top_ix)
            cands = sorted(
                ((cums[b] + float(top_lp[i, j]), i, int(top_ix[i, j]))
                 for i, b in enumerate(live) for j in range(k)),
                key=lambda c: -c[0],
            )
            chosen = []
            for score, i, t in cands:
                if t in stop:
                    b = live[i]
                    done.append((list(toks[b]),
                                 self._score(score, len(toks[b]) + 1)))
                elif len(chosen) < w:
                    chosen.append((score, i, t))
            if self.early_stopping and len(done) >= w:
                for b in live:
                    s.remove(b)
                live = []
                break
            # reassign beams: one child per parent continues in place,
            # extras fork (before any state mutation of the parent)
            used = {}
            new_live, new_toks, new_cums, removals = [], {}, {}, set(range(len(live)))
            for score, i, t in chosen:
                parent = live[i]
                if i not in used:
                    bid = parent
                    used[i] = bid
                    removals.discard(i)
                else:
                    bid = ("_beam", tag, next_child)
                    next_child += 1
                    s.fork(parent, bid)
                new_live.append(bid)
                new_toks[bid] = toks[parent] + [t]
                new_cums[bid] = score
            for i in removals:
                s.remove(live[i])
            for bid, (score, _, t) in zip(new_live, chosen):
                s.last_token[bid] = t
            live = new_live
            toks = new_toks
            cums = new_cums
            if not live:  # every candidate finished
                break

        for b in live:  # ran out of budget: unfinished beams compete too
            done.append((list(toks[b]), self._score(cums[b], len(toks[b]))))
            s.remove(b)
        done.sort(key=lambda h: -h[1])
        return done[:w]


class SpeculativeDecoder:
    """Speculative decoding over the paged servers: a small DRAFT model
    proposes ``k-1`` tokens autoregressively, the TARGET model scores all
    ``k`` positions in ONE chunked decode call.

    ``temperature == 0`` (default): greedy — the longest draft prefix
    agreeing with the target's argmax is accepted (+1 corrected token); the
    emitted stream is IDENTICAL to target-only greedy decoding.

    ``temperature > 0``: rejection sampling (Leviathan et al.) — draft
    token d_j is accepted with probability min(1, p_j(d_j)/q_j(d_j)); on
    rejection a replacement is drawn from normalize(max(0, p_j - q_j)); if
    all proposals are accepted a bonus token is drawn from p_k. The emitted
    tokens are distributed EXACTLY as target-only sampling at that
    temperature.

    Rejected tokens' K/V are dropped with :meth:`BatchServer.rewind` (their
    page slots are simply reused). Both servers must be fed the same
    prompts via :meth:`add`.
    """

    def __init__(self, target_model, draft_model, *, k: int = 4,
                 page_size: int = 128, total_pages: int = 512,
                 temperature: float = 0.0, seed: int = 0,
                 server_cls=None):
        if server_cls is None:
            server_cls = (
                BatchServer if hasattr(target_model, "encoder")
                else ModernBatchServer
            )
        self.k = k
        self.temperature = temperature
        self.rng = np.random.default_rng(seed)
        self.target = server_cls(
            target_model, page_size=page_size, total_pages=total_pages
        )
        self.draft = server_cls(
            draft_model, page_size=page_size, total_pages=total_pages
        )

    def add(self, seq_id, prompt_tokens) -> None:
        self.target.add(seq_id, prompt_tokens)
        self.draft.add(seq_id, prompt_tokens)

    def remove(self, seq_id) -> None:
        self.target.remove(seq_id)
        self.draft.remove(seq_id)

    @property
    def active(self):
        return self.target.active

    @staticmethod
    def _softmax(logits, temperature):
        z = logits / temperature
        z = z - z.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)

    def step(self) -> Dict:
        """One speculative round; returns {seq_id: [emitted tokens]} (1 to
        ``k`` tokens per sequence)."""
        seq_ids = self.active
        if not seq_ids:
            return {}
        k = self.k
        b = len(seq_ids)
        sampling = self.temperature > 0
        # 1. draft proposes: inputs p0 (pending token), d1, ..., d_{k-2};
        #    outputs d1..d_{k-1}
        proposals = np.zeros((b, k), np.int64)
        proposals[:, 0] = [self.target.last_token[s] for s in seq_ids]
        q_dists = []  # [k-1] entries of [B, V] draft distributions
        for j in range(1, k):
            logits = self.draft._advance(
                seq_ids, jnp.asarray(proposals[:, j - 1], jnp.int32)
            )
            if sampling:
                q = self._softmax(np.asarray(logits, np.float64),
                                  self.temperature)
                q_dists.append(q)
                for i in range(b):
                    proposals[i, j] = self.rng.choice(q.shape[1], p=q[i])
            else:
                proposals[:, j] = np.asarray(jnp.argmax(logits, -1))
        # 2. target verifies all k positions at once
        tlogits = self.target.advance_chunk(seq_ids, proposals)
        if sampling:
            p_dists = self._softmax(
                np.asarray(tlogits, np.float64), self.temperature
            )  # [B, k, V]
        t_next = np.asarray(jnp.argmax(tlogits, -1))  # [B, k]: t1..tk
        out = {}
        for i, s in enumerate(seq_ids):
            emitted = []
            if sampling:
                # rejection sampling: accept d_j w.p. min(1, p/q); replace
                # from the normalized positive residual on rejection
                for j in range(1, k):
                    d = int(proposals[i, j])
                    p_j = p_dists[i, j - 1]
                    q_j = q_dists[j - 1][i]
                    if self.rng.uniform() < min(
                        1.0, p_j[d] / max(q_j[d], 1e-30)
                    ):
                        emitted.append(d)
                    else:
                        resid = np.maximum(p_j - q_j, 0.0)
                        tot = resid.sum()
                        dist = resid / tot if tot > 0 else p_j
                        emitted.append(int(self.rng.choice(len(dist), p=dist)))
                        break
                else:  # all accepted: bonus token from the target
                    pk = p_dists[i, k - 1]
                    emitted.append(int(self.rng.choice(len(pk), p=pk)))
            else:
                # greedy: accept while the draft matches the target's argmax
                for j in range(1, k):
                    if proposals[i, j] == t_next[i, j - 1]:
                        emitted.append(int(proposals[i, j]))
                    else:
                        break
                # +1: the target's token at the first mismatch (or position k)
                emitted.append(int(t_next[i, len(emitted)]))
            n_emit = len(emitted)
            # 3. roll back both servers to the accepted history
            #    target wrote k rows, draft wrote k-1; each needs
            #    old_len + n_emit rows (the newest token stays pending)
            self.target.rewind(s, k - n_emit)
            if n_emit == k:
                # draft never processed d_{k-1} (== t_{k-1}); feed it so the
                # draft's history matches before the next round
                self.draft._advance(
                    [s], jnp.asarray([int(proposals[i, k - 1])], jnp.int32)
                )
            else:
                self.draft.rewind(s, (k - 1) - n_emit)
            self.target.last_token[s] = emitted[-1]
            self.draft.last_token[s] = emitted[-1]
            out[s] = emitted
        return out


def draft_view(model, num_blocks: int):
    """A truncated VIEW of a :class:`~lamp_tpu.nn.ModernLM`: the first
    ``num_blocks`` transformer blocks plus the shared final norm / LM head /
    embeddings. Every weight is the SAME jax array as the full model's —
    no HBM is copied. Train a LoRA adapter on ``lora_inject(draft_view(m,
    L), ...)`` (self-distillation against the full model's next-token
    output) and serve it with :class:`LoRADraftSpeculativeDecoder`."""
    if not 0 < num_blocks <= len(model.blocks):
        raise ValueError(
            f"num_blocks must be in [1, {len(model.blocks)}], got {num_blocks}"
        )
    return model.replace(blocks=model.blocks[:num_blocks])


class LoRADraftSpeculativeDecoder(SpeculativeDecoder):
    """Speculative decoding whose DRAFT shares the target's weights: the
    draft is the target's first ``L`` blocks (an early-exit stack) with a
    LoRA adapter on the block projections, so the only extra HBM is the
    adapter's low-rank factors and a KV pool for ``L`` layers — no separate
    draft model. (The plain :class:`SpeculativeDecoder` keeps a full second
    model's weights resident; CLAUDE.md backlog item.)

    ``lora_draft`` is a ``lora_inject``-ed :func:`draft_view` of the target
    (adapter restricted to the block q/k/v/o/w1/w3/w2 projections — the
    same constraint as :meth:`ModernBatchServer.register_adapter`); its
    block count sets the draft depth. Acceptance/rollback semantics are
    inherited unchanged, so the emitted stream keeps the exact
    target-distribution guarantee regardless of draft quality.
    """

    def __init__(self, model, lora_draft, *, k: int = 4,
                 page_size: int = 128, total_pages: int = 512,
                 draft_total_pages: Optional[int] = None,
                 temperature: float = 0.0, seed: int = 0, **server_kwargs):
        if hasattr(model, "encoder"):
            raise NotImplementedError(
                "LoRA-draft speculation serves the ModernLM family"
            )
        n_draft = len(lora_draft.blocks)
        if n_draft > len(model.blocks):
            raise ValueError(
                f"draft has {n_draft} blocks but the target only "
                f"{len(model.blocks)}"
            )
        self.k = k
        self.temperature = temperature
        self.rng = np.random.default_rng(seed)
        self.target = ModernBatchServer(
            model, page_size=page_size, total_pages=total_pages,
            **server_kwargs,
        )
        te = self.target._extras

        class _SharedExtrasServer(ModernBatchServer):
            """Draft server whose projection/LM-head weights are slices of
            the target server's extras tuples — references to the same jax
            arrays, so the fused-QKV concatenation is not re-materialized."""

            def _precompute_extras(self, m):
                wqkv, wo, w1, w3, w2, lmh = te
                n = len(m.blocks)
                return (wqkv[:n], wo[:n], w1[:n], w3[:n], w2[:n], lmh)

        self.draft = _SharedExtrasServer(
            draft_view(model, n_draft), page_size=page_size,
            total_pages=(total_pages if draft_total_pages is None
                         else draft_total_pages),
            **server_kwargs,
        )
        self.draft.register_adapter("draft", lora_draft)

    def add(self, seq_id, prompt_tokens) -> None:
        self.target.add(seq_id, prompt_tokens)
        self.draft.add(seq_id, prompt_tokens, adapter="draft")
