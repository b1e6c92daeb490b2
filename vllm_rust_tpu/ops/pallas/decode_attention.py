"""In-house paged decode attention kernel.

TPU-native re-design of the reference's hottest kernel
(paged_attention.cu V1/V2, cuda_kernels.rs:590-2417): one query token
per sequence attends over its paged KV. Design (cf. the JAX paged
kernel's manual double-buffered DMA): the grid walks (seq, page) and the
PAGE INDIRECTION lives in the BlockSpec index map reading the
scalar-prefetched page table — Pallas' grid pipeline then prefetches the
next (non-contiguous) page while the current one is in compute, giving
double buffering without hand-written DMA.

Covers: GQA/MQA, length masking, sliding window, logit softcap, and
quantized KV pools (fp8/int8 payloads dequantized in VMEM with static
scales). Used for pure-decode steps; mixed prefill+decode batches take
the ragged kernel path.
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
    page_indices_ref,  # scalar prefetch [S*P]
    q_ref,  # [1, H, D]
    kv_ref,  # [1, ps, 2K, D] — the page selected by the index map
    sinks_ref,  # [H, 128] f32 (attention-sink logits, or zeros)
    alibi_ref,  # [H, 128] f32 (per-head ALiBi slopes, or zeros)
    o_ref,  # [1, H, D]
    m_ref,  # scratch [H, 128] f32
    l_ref,  # scratch [H, 128] f32
    acc_ref,  # scratch [H, D] f32
    *,
    page_size: int,
    num_kv_heads: int,
    sm_scale: float,
    sliding_window: int | None,
    soft_cap: float | None,
    k_scale: float | None,
    v_scale: float | None,
    use_sinks: bool,
    use_alibi: bool,
):
    s = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    kv_len = kv_lens_ref[s]

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p * page_size < kv_len)
    def _compute():
        h, d = q_ref.shape[1], q_ref.shape[2]
        g = h // num_kv_heads
        q = q_ref[0].astype(jnp.float32)  # [H, D]
        kv = kv_ref[0]  # [ps, 2K, D]
        ps = kv.shape[0]
        kv = kv.reshape(ps, num_kv_heads, 2, d)
        k = kv[:, :, 0, :].astype(jnp.float32)  # [ps, K, D]
        v = kv[:, :, 1, :].astype(jnp.float32)
        if k_scale is not None:
            k = k * k_scale
        if v_scale is not None:
            v = v * v_scale

        # positions covered by this page + masks
        pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, ps), 1
        )  # [1, ps]
        valid = pos < kv_len
        if sliding_window is not None:
            valid &= pos > (kv_len - 1 - sliding_window)

        qh = q.reshape(num_kv_heads, g, d)
        m_prev = m_ref[...]  # [H, 128]
        l_prev = l_ref[...]
        # per-kv-head scores (python loop: K is small and static)
        scores_rows = []
        for kh in range(num_kv_heads):
            s_kh = jax.lax.dot_general(
                qh[kh], k[:, kh, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, ps]
            scores_rows.append(s_kh)
        scores = jnp.concatenate(scores_rows, axis=0) * sm_scale  # [H, ps]
        if use_alibi:
            # decode: the query sits at position kv_len-1; bias is
            # slope_h * (key_pos - q_pos) <= 0 (reference layers/alibi.rs)
            scores = scores + alibi_ref[:, :1] * (
                pos - (kv_len - 1)
            ).astype(jnp.float32)
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        scores = jnp.where(valid, scores, NEG_INF)

        m_cur = jnp.max(scores, axis=1, keepdims=True)  # [H, 1]
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new)  # [H, 1]
        e = jnp.exp(scores - m_new)  # [H, ps]
        l_new = alpha * l_prev[:, :1] + jnp.sum(e, axis=1, keepdims=True)

        # value accumulation per kv head
        acc = acc_ref[...] * alpha  # [H, D]
        pv_rows = []
        for kh in range(num_kv_heads):
            pv = jax.lax.dot_general(
                e[kh * g : (kh + 1) * g, :], v[:, kh, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            pv_rows.append(pv)
        acc = acc + jnp.concatenate(pv_rows, axis=0)

        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        acc_ref[...] = acc

    @pl.when(p == n_pages - 1)
    def _finish():
        l_fin = l_ref[:, :1]
        if use_sinks:
            # attention sink == a virtual key with logit `sink` and a
            # zero value: it only enlarges the softmax denominator
            # (GPT-OSS; reference AttentionConfig sinks knob)
            l_fin = l_fin + jnp.exp(sinks_ref[:, :1] - m_ref[:, :1])
        denom = jnp.maximum(l_fin, 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "soft_cap", "k_scale", "v_scale",
    ),
)
def decode_paged_attention(
    q: jax.Array,  # [S, H, D]
    kv_pages: jax.Array,  # [pages, ps, 2K, D]
    kv_lens: jax.Array,  # [S] i32
    page_indices: jax.Array,  # [S, P] i32
    sinks: jax.Array | None = None,  # [H] f32 attention-sink logits
    alibi_slopes: jax.Array | None = None,  # [H] f32 per-head slopes
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
    use_sinks = sinks is not None
    use_alibi = alibi_slopes is not None
    sinks_tile = jnp.broadcast_to(
        (sinks if use_sinks else jnp.zeros((h,))).astype(jnp.float32)[:, None],
        (h, 128),
    )
    alibi_tile = jnp.broadcast_to(
        (alibi_slopes if use_alibi else jnp.zeros((h,))).astype(jnp.float32)[
            :, None
        ],
        (h, 128),
    )

    kernel = functools.partial(
        _kernel,
        page_size=page_size,
        num_kv_heads=num_kv,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        use_sinks=use_sinks,
        use_alibi=use_alibi,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, p),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda si, pi, lens, pages: (si, 0, 0)),
            pl.BlockSpec(
                (1, page_size, combined, d),
                # the page indirection: scalar-prefetched table drives the
                # block fetch; Pallas prefetches the next page in parallel
                lambda si, pi, lens, pages: (pages[si * p + pi], 0, 0, 0),
            ),
            pl.BlockSpec((h, 128), lambda si, pi, lens, pages: (0, 0)),
            pl.BlockSpec((h, 128), lambda si, pi, lens, pages: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda si, pi, lens, pages: (si, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, h, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_kernels(),
    )(kv_lens, page_indices.reshape(-1), q, kv_pages, sinks_tile, alibi_tile)
