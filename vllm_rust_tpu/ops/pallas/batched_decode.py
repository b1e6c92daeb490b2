"""Batched-seq paged decode attention (r3).

Why a third decode path (see docs/perf/r3-decode-attribution.md): at
serving geometry (c=16, ~200-token contexts) decode attention is
latency-bound, not bandwidth-bound — the per-(seq,page) kernel runs 256
tiny programs (98 GB/s effective) and per-seq q-blocks give M=4 MXU
rows. FLOPs are free here (13 MB of KV, ~0.4 GFLOP), so this kernel
trades wasted flops for full batching:

- ALL sequences' page lists concatenate into one flat span; the grid
  walks pb-page chunks of it with double-buffered multi-page DMA
  (the in-house ragged kernel's DMA idiom).
- EVERY chunk computes scores for EVERY query row ([S*G, chunk] dots,
  M=64 at c=16 instead of M=4), with a cross-sequence mask zeroing
  pairs that belong to different sequences — the flash accumulator
  makes masked chunks free.

Covers GQA/MQA, length masking, sliding window, softcap, fp8/int8 KV
static scales. Sinks/ALiBi route to the in-house ragged kernel
(ops/paged_attention.py dispatch).

Reference counterpart: paged_attention.cu V2's partitioned decode —
re-thought for the MXU's appetite for batched rows rather than CUDA's
warp-per-sequence layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_kernels

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    kv_lens_ref,  # scalar prefetch [S]
    pages_ref,  # scalar prefetch [S*P] flat page table
    q_ref,  # [S, H, D] (VMEM, whole batch)
    kv_hbm_ref,  # [pages, ps, 2K, D] (ANY/HBM)
    valid_ref,  # [1, S*G, span] i8 — this chunk's mask (precomputed
    # in-graph OUTSIDE the kernel; XLA CSEs it across the 36 layer
    # calls, so the per-chunk iota/div/mod/select work happens once
    # per step instead of once per (layer, chunk))
    o_ref,  # [S, H, D]
    kv_buf,  # [2, PB, ps, 2K, D]
    sems,  # [2, PB]
    m_ref,  # [K, S*G, 128] f32
    l_ref,  # [K, S*G, 128] f32
    acc_ref,  # [K, S*G, D] f32
    *,
    pb: int,
    page_size: int,
    pages_per_seq: int,
    num_kv_heads: int,
    sm_scale: float,
    sliding_window: int | None,
    soft_cap: float | None,
    k_scale: float | None,
    v_scale: float | None,
):
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    span = pb * page_size
    s_pad, h, d = q_ref.shape
    g = h // num_kv_heads

    def page_live(chunk, j):
        # page j of this chunk holds live tokens iff its first token
        # position is below its owner's kv_len — all from SMEM scalars,
        # so skipped pages never touch HBM at all
        flat = chunk * pb + j
        owner = flat // pages_per_seq
        return (flat % pages_per_seq) * page_size < kv_lens_ref[owner]

    def start_dma(chunk, slot):
        for j in range(pb):
            @pl.when(page_live(chunk, j))
            def _go(j=j):
                page = pages_ref[chunk * pb + j]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).start()

    def wait_dma(chunk, slot):
        for j in range(pb):
            @pl.when(page_live(chunk, j))
            def _go(j=j):
                page = pages_ref[chunk * pb + j]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).wait()

    def chunk_live(chunk):
        live = page_live(chunk, 0)
        for j in range(1, pb):
            live = jnp.logical_or(live, page_live(chunk, j))
        return live

    slot = jax.lax.rem(c, 2)

    @pl.when(c == 0)
    def _warmup():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        start_dma(0, 0)

    @pl.when(c + 1 < n_chunks)
    def _prefetch():
        start_dma(c + 1, 1 - slot)

    wait_dma(c, slot)

    # skipped pages hold stale/uninitialized VMEM — possibly NaN, which
    # would poison the dots even at masked positions (0*NaN=NaN). Zero
    # them so masked contributions are finite and the flash rescale
    # (alpha=0 on a row's first live chunk) wipes any leading garbage.
    for j in range(pb):
        @pl.when(jnp.logical_not(page_live(c, j)))
        def _zero(j=j):
            kv_buf[slot, j] = jnp.zeros_like(kv_buf[slot, j])

    @pl.when(chunk_live(c))
    def _compute():
        _chunk_compute(
            q_ref, valid_ref, kv_buf, m_ref, l_ref, acc_ref, slot,
            span=span, s_pad=s_pad, g=g, num_kv_heads=num_kv_heads, d=d,
            sm_scale=sm_scale, soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
        )

    @pl.when(c == n_chunks - 1)
    def _finish():
        for kh in range(num_kv_heads):
            denom = jnp.maximum(l_ref[kh, :, :1], 1e-30)
            o_ref[:, kh * g : (kh + 1) * g, :] = (
                (acc_ref[kh] / denom).reshape(s_pad, g, -1).astype(
                    o_ref.dtype
                )
            )


def _chunk_compute(
    q_ref, valid_ref, kv_buf, m_ref, l_ref, acc_ref, slot,
    *, span, s_pad, g, num_kv_heads, d, sm_scale, soft_cap,
    k_scale, v_scale,
):
    valid = valid_ref[0] > 0  # [S*G, span]

    kv = kv_buf[slot].reshape(span, 2 * num_kv_heads, d)
    for kh in range(num_kv_heads):
        k_mat = kv[:, 2 * kh, :].astype(jnp.float32)  # [span, D]
        v_mat = kv[:, 2 * kh + 1, :].astype(jnp.float32)
        if k_scale is not None:
            k_mat = k_mat * k_scale
        if v_scale is not None:
            v_mat = v_mat * v_scale
        q_kh = (
            q_ref[:, kh * g : (kh + 1) * g, :]
            .astype(jnp.float32)
            .reshape(s_pad * g, d)
        )
        scores = jax.lax.dot_general(
            q_kh, k_mat,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [S*G, span]
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[kh, :, :1]
        l_prev = l_ref[kh, :, :1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = alpha * l_prev + jnp.sum(e, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            e, v_mat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S*G, D]
        m_ref[kh] = jnp.broadcast_to(m_new, m_ref.shape[1:])
        l_ref[kh] = jnp.broadcast_to(l_new, l_ref.shape[1:])
        acc_ref[kh] = acc_ref[kh] * alpha + pv


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "soft_cap", "k_scale", "v_scale",
    ),
)
def batched_decode_attention(
    q: jax.Array,  # [S, H, D]
    kv_pages: jax.Array,  # [pages, ps, 2K, D]
    kv_lens: jax.Array,  # [S] i32
    page_indices: jax.Array,  # [S, P] i32
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    soft_cap: float | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
) -> jax.Array:
    s, h, d = q.shape
    _, page_size, combined, _ = kv_pages.shape
    num_kv = combined // 2
    p = page_indices.shape[1]
    g = h // num_kv
    # chunk size: 16 pages (256 tokens at ps=16) halves the per-chunk
    # flash/bookkeeping overhead vs 8 (invalid pages cost nothing now
    # that DMA skips them); shrink for tiny tables so pb divides S*P
    pb = 16
    while (s * p) % pb:
        pb //= 2
    n_chunks = (s * p) // pb

    kernel = functools.partial(
        _kernel,
        pb=pb,
        page_size=page_size,
        pages_per_seq=p,
        num_kv_heads=num_kv,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((s, h, d), lambda c, lens, pages: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, s * g, pb * page_size),
                lambda c, lens, pages: (c, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((s, h, d), lambda c, lens, pages: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, pb, page_size, combined, d), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pb)),
            pltpu.VMEM((num_kv, s * g, 128), jnp.float32),
            pltpu.VMEM((num_kv, s * g, 128), jnp.float32),
            pltpu.VMEM((num_kv, s * g, d), jnp.float32),
        ],
    )
    # per-(chunk, row, token) validity, computed once per step (CSE'd
    # across layers): ownership + length + optional sliding window
    span = pb * page_size
    tok = jnp.arange(n_chunks * span, dtype=jnp.int32).reshape(
        n_chunks, 1, span
    )
    flat_page = tok // page_size
    seq_of = flat_page // p
    kvpos = (flat_page % p) * page_size + tok % page_size
    lens_of = kv_lens[jnp.clip(seq_of, 0, s - 1)]
    row_seq = (
        jnp.arange(s * g, dtype=jnp.int32).reshape(1, s * g, 1) // g
    )
    valid = (seq_of == row_seq) & (kvpos < lens_of)
    if sliding_window is not None:
        valid = valid & (kvpos > (lens_of - 1 - sliding_window))
    valid = valid.astype(jnp.int8)  # 4x less mask traffic than i32

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, h, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_kernels(),
    )(kv_lens, page_indices.reshape(-1), q, kv_pages, valid)
