"""In-house ragged paged attention: mixed chunked-prefill + decode.

TPU-native re-design of the reference's full attention-kernel matrix
(crates/core/kernels/paged_attention.cu:1-1199 — V1/V2 decode kernels x
{f16,bf16} x KV {auto,fp8e4m3,fp8e5m2,int8} x {±ALiBi}, plus the
prefill backends of crates/core/src/layers/attention/backend.rs): ONE
kernel serves every production shape of the unified flattened-token step.

Design (differs from the stock JAX ragged kernel):

  - **Sequence-aligned q blocks.** Each sequence's query span is padded
    to a multiple of BQ, so every q block belongs to exactly one
    sequence. Q and outputs then ride plain BlockSpecs (the Pallas grid
    pipeline fetches them); no in-kernel q walking. The alignment
    scatter/gather is done by the wrapper in pure XLA (bounded waste:
    < BQ tokens per sequence, and the engine can hand the kernel an
    already-aligned layout to skip it).
  - **Page indirection by scalar prefetch + manual double-buffered DMA.**
    The KV pool stays in HBM (ANY); each active (q-block, kv-block) grid
    step DMAs PB non-contiguous pages — one KV span of PB*page_size =
    128 tokens — into a VMEM double buffer, prefetching the NEXT active
    step's span while computing. 128-token spans keep Q@K^T score tiles
    at full MXU lane width (the one-page-per-step BlockSpec trick of the
    decode kernel caps lanes at page_size).
  - **Static schedule, no mutable kernel state.** Which grid cells are
    active, each cell's buffer parity, and each cell's successor are all
    precomputed as scalar-prefetch arrays (cum_active / next_qi), so the
    kernel never tracks seq/buffer indices in SMEM the way the stock
    kernel does.

Features: GQA/MQA, causal + length masking, sliding window (with whole
KV-span skipping), logit softcap, attention sinks (GPT-OSS), ALiBi and
sqrt-ALiBi (Step1), inline fp8/int8 KV dequant with static scales, and
an optional LSE output [T, H] for DCP merging (ops/dcp.py lse_merge).
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
    # scalar prefetch
    blk_seq_ref,  # [NQB] owning sequence per q block (clamped)
    qpos_start_ref,  # [NQB] absolute kv position of the block's row 0
    kstart_ref,  # [NQB] first active kv-span index
    kend_ref,  # [NQB] one past last active kv-span index (0 => inactive)
    cum_active_ref,  # [NQB] exclusive prefix sum of active spans
    next_qi_ref,  # [NQB] next q block with work (NQB => none)
    kv_lens_ref,  # [S]
    pages_ref,  # [S*P] flattened page table
    # inputs
    q_ref,  # [BQ, H, D] (VMEM, grid-pipelined)
    kv_hbm_ref,  # [pages, ps, 2K, D] (ANY/HBM)
    sinks_ref,  # [H, 128] f32
    alibi_ref,  # [H, 128] f32
    # outputs
    o_ref,  # [BQ, H, D]
    lse_ref,  # [BQ, H] f32
    # scratch
    kv_buf,  # [2, PB, ps, 2K, D] pool dtype
    sems,  # DMA sems [2, PB]
    m_ref,  # [K, BQ*G, 128] f32
    l_ref,  # [K, BQ*G, 128] f32
    acc_ref,  # [K, BQ*G, D] f32
    *,
    bq: int,
    pb: int,
    page_size: int,
    pages_per_seq: int,
    num_kv_heads: int,
    sm_scale: float,
    sliding_window: int | None,
    soft_cap: float | None,
    k_scale: float | None,
    v_scale: float | None,
    use_sinks: bool,
    use_alibi: bool,
    alibi_sqrt: bool,
):
    qi = pl.program_id(0)
    ki = pl.program_id(1)
    nqb = pl.num_programs(0)
    span = pb * page_size

    kstart = kstart_ref[qi]
    kend = kend_ref[qi]
    active = (ki >= kstart) & (ki < kend)

    def start_span_dma(tqi, tki, slot):
        """Start the PB page copies for step (tqi, tki) into buffer
        `slot`. Page-table overruns land on the null page 0."""
        s = blk_seq_ref[tqi]
        base = s * pages_per_seq + tki * pb
        for j in range(pb):
            in_range = tki * pb + j < pages_per_seq
            page = jnp.where(in_range, pages_ref[base + j], 0)
            pltpu.make_async_copy(
                kv_hbm_ref.at[page],
                kv_buf.at[slot, j],
                sems.at[slot, j],
            ).start()

    def wait_span_dma(tqi, tki, slot):
        s = blk_seq_ref[tqi]
        base = s * pages_per_seq + tki * pb
        for j in range(pb):
            in_range = tki * pb + j < pages_per_seq
            page = jnp.where(in_range, pages_ref[base + j], 0)
            pltpu.make_async_copy(
                kv_hbm_ref.at[page],
                kv_buf.at[slot, j],
                sems.at[slot, j],
            ).wait()

    @pl.when(active)
    def _step():
        g_idx = cum_active_ref[qi] + (ki - kstart)
        slot = jax.lax.rem(g_idx, 2)

        # warm-up: the very first active step fetches its own span
        @pl.when(g_idx == 0)
        def _():
            start_span_dma(qi, ki, slot)

        # prefetch the successor's span into the other buffer
        has_next_in_row = ki + 1 < kend
        nqi = jnp.where(has_next_in_row, qi, next_qi_ref[qi])
        nki = jnp.where(has_next_in_row, ki + 1, kstart_ref[
            jnp.minimum(nqi, nqb - 1)])
        @pl.when(has_next_in_row | (next_qi_ref[qi] < nqb))
        def _():
            start_span_dma(nqi, nki, 1 - slot)

        wait_span_dma(qi, ki, slot)

        h, d = q_ref.shape[1], q_ref.shape[2]
        k_heads = num_kv_heads
        g = h // k_heads
        s = blk_seq_ref[qi]
        kv_len = kv_lens_ref[s]
        qpos0 = qpos_start_ref[qi]

        @pl.when(ki == kstart)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # absolute kv positions covered by this span
        pos = ki * span + jax.lax.broadcasted_iota(
            jnp.int32, (1, span), 1
        )  # [1, span]
        # absolute q position per score row (rows are (token, group))
        row_tok = jax.lax.broadcasted_iota(
            jnp.int32, (bq * g, 1), 0
        ) // g  # [BQ*G, 1]
        qpos = qpos0 + row_tok
        valid = (pos <= qpos) & (pos < kv_len)
        if sliding_window is not None:
            valid &= pos > (qpos - sliding_window)

        dist = (pos - qpos).astype(jnp.float32) if use_alibi else None
        if use_alibi and alibi_sqrt:
            dist = -jnp.sqrt(jnp.maximum(-dist, 0.0))

        kv = kv_buf[slot].reshape(span, 2 * k_heads, d)
        for kh in range(k_heads):
            k_mat = kv[:, 2 * kh, :].astype(jnp.float32)  # [span, D]
            v_mat = kv[:, 2 * kh + 1, :].astype(jnp.float32)
            if k_scale is not None:
                k_mat = k_mat * k_scale
            if v_scale is not None:
                v_mat = v_mat * v_scale
            q_kh = (
                q_ref[:, kh * g : (kh + 1) * g, :]
                .astype(jnp.float32)
                .reshape(bq * g, d)
            )
            scores = jax.lax.dot_general(
                q_kh, k_mat,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [BQ*G, span]
            if use_alibi:
                slopes = alibi_ref[kh * g : (kh + 1) * g, :1]  # [G, 1]
                slope_rows = jnp.broadcast_to(
                    slopes.reshape(1, g), (bq, g)
                ).reshape(bq * g, 1)
                scores = scores + slope_rows * dist
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
            )  # [BQ*G, D]
            m_ref[kh] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            l_ref[kh] = jnp.broadcast_to(l_new, l_ref.shape[1:])
            acc_ref[kh] = acc_ref[kh] * alpha + pv

        @pl.when(ki == kend - 1)
        def _finish():
            for kh in range(k_heads):
                m_fin = m_ref[kh, :, :1]  # [BQ*G, 1]
                l_fin = l_ref[kh, :, :1]
                if use_sinks:
                    sk = sinks_ref[kh * g : (kh + 1) * g, :1]  # [G, 1]
                    sk_rows = jnp.broadcast_to(
                        sk.reshape(1, g), (bq, g)
                    ).reshape(bq * g, 1)
                    # the sink joins max and denominator with zero value
                    m_sink = jnp.maximum(m_fin, sk_rows)
                    corr = jnp.exp(m_fin - m_sink)
                    l_fin = l_fin * corr + jnp.exp(sk_rows - m_sink)
                    acc = acc_ref[kh] * corr
                    m_fin = m_sink
                else:
                    acc = acc_ref[kh]
                denom = jnp.maximum(l_fin, 1e-30)
                o_ref[:, kh * g : (kh + 1) * g, :] = (
                    (acc / denom).reshape(bq, g, -1).astype(o_ref.dtype)
                )
                lse_ref[:, kh * g : (kh + 1) * g] = (
                    (m_fin + jnp.log(denom)).reshape(bq, g)
                )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "soft_cap", "k_scale", "v_scale",
        "alibi_sqrt", "num_queries_per_block", "return_lse",
    ),
)
def ragged_paged_attention_pallas(
    q: jax.Array,  # [T, H, D]
    kv_pages: jax.Array,  # [pages, ps, 2K, D]
    kv_lens: jax.Array,  # [S]
    page_indices: jax.Array,  # [S, P]
    cu_q_lens: jax.Array,  # [S+1]
    num_seqs: jax.Array,  # [1] (unused: padding rows have q_len 0)
    sinks: jax.Array | None = None,  # [H]
    alibi_slopes: jax.Array | None = None,  # [H]
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    soft_cap: float | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    alibi_sqrt: bool = False,
    num_queries_per_block: int = 32,
    return_lse: bool = False,
):
    t, h, d = q.shape
    _, page_size, combined, _ = kv_pages.shape
    k_heads = combined // 2
    s, p = page_indices.shape
    bq = num_queries_per_block
    pb = max(1, 128 // page_size)  # pages per 128-token KV span
    span = pb * page_size
    nkb = -(-p // pb)  # kv spans per sequence

    # ---- sequence-aligned q layout (pure XLA) ----------------------------
    q_lens = jnp.diff(cu_q_lens)  # [S]
    pad_lens = ((q_lens + bq - 1) // bq) * bq
    new_cu = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_lens).astype(jnp.int32)]
    )
    nqb = (t + s * (bq - 1)) // bq + 1  # static upper bound on q blocks
    t_pad = nqb * bq

    token_idx = jnp.arange(t, dtype=jnp.int32)
    seq_of = jnp.clip(
        jnp.searchsorted(cu_q_lens, token_idx, side="right") - 1, 0, s - 1
    )
    new_idx = new_cu[seq_of] + (token_idx - cu_q_lens[seq_of])
    is_real = token_idx < cu_q_lens[s]
    new_idx = jnp.where(is_real, new_idx, t_pad - 1)
    q_aligned = jnp.zeros((t_pad, h, d), q.dtype).at[new_idx].set(q)

    # ---- per-q-block schedule arrays -------------------------------------
    blk_idx = jnp.arange(nqb, dtype=jnp.int32)
    blk_seq = jnp.clip(
        jnp.searchsorted(new_cu, blk_idx * bq, side="right") - 1, 0, s - 1
    )
    blk_valid = blk_idx * bq < new_cu[s]
    local_start = blk_idx * bq - new_cu[blk_seq]
    blk_kv_len = kv_lens[blk_seq]
    qpos_start = blk_kv_len - q_lens[blk_seq] + local_start
    # causal upper limit for this block (exclusive)
    kv_hi = jnp.minimum(blk_kv_len, qpos_start + bq)
    kend = jnp.where(blk_valid, (kv_hi + span - 1) // span, 0)
    if sliding_window is not None:
        kv_lo = jnp.maximum(qpos_start - sliding_window + 1, 0)
        kstart = jnp.where(blk_valid, kv_lo // span, 0)
    else:
        kstart = jnp.zeros_like(kend)
    kstart = jnp.minimum(kstart, kend)
    nk = kend - kstart
    cum_active = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nk).astype(jnp.int32)]
    )[:-1]
    # next active q block: suffix scan
    cand = jnp.where(nk > 0, blk_idx, nqb)
    rev_min = jax.lax.cummin(cand[::-1])[::-1]
    next_qi = jnp.concatenate([rev_min[1:], jnp.array([nqb], jnp.int32)])

    sinks_tile = jnp.broadcast_to(
        (sinks if sinks is not None else jnp.zeros((h,)))
        .astype(jnp.float32)[:, None],
        (h, 128),
    )
    alibi_tile = jnp.broadcast_to(
        (alibi_slopes if alibi_slopes is not None else jnp.zeros((h,)))
        .astype(jnp.float32)[:, None],
        (h, 128),
    )

    g = h // k_heads
    kernel = functools.partial(
        _kernel,
        bq=bq,
        pb=pb,
        page_size=page_size,
        pages_per_seq=p,
        num_kv_heads=k_heads,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        use_sinks=sinks is not None,
        use_alibi=alibi_slopes is not None,
        alibi_sqrt=alibi_sqrt,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nqb, nkb),
        in_specs=[
            pl.BlockSpec((bq, h, d), lambda qi, ki, *_: (qi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((h, 128), lambda qi, ki, *_: (0, 0)),
            pl.BlockSpec((h, 128), lambda qi, ki, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bq, h, d), lambda qi, ki, *_: (qi, 0, 0)),
            pl.BlockSpec((bq, h), lambda qi, ki, *_: (qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pb, page_size, combined, d), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pb)),
            pltpu.VMEM((k_heads, bq * g, 128), jnp.float32),
            pltpu.VMEM((k_heads, bq * g, 128), jnp.float32),
            pltpu.VMEM((k_heads, bq * g, d), jnp.float32),
        ],
    )
    out_aligned, lse_aligned = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, h, d), q.dtype),
            jax.ShapeDtypeStruct((t_pad, h), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_kernels(),
        name="ragged_paged_attention_inhouse",
    )(
        blk_seq, qpos_start, kstart, kend, cum_active, next_qi,
        kv_lens, page_indices.reshape(-1),
        q_aligned, kv_pages, sinks_tile, alibi_tile,
    )
    out = out_aligned[new_idx]
    if return_lse:
        return out, lse_aligned[new_idx]
    return out
