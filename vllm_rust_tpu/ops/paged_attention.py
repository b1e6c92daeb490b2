"""Ragged paged attention: unified mixed prefill+decode attention.

TPU-native replacement for the reference's attention backend stack
(crates/core/kernels/paged_attention.cu V1/V2 decode kernels +
crates/core/src/layers/attention/backend.rs prefill/decode split): on TPU a
single ragged kernel serves chunked prefill and batched decode in one call,
which is what makes the unified flattened-token step possible.

Backends:
  - ``ref``: jittable pure-XLA reference (static shapes, works on CPU) —
    the correctness anchor, analogous to the reference's
    NaiveAttentionBackend (layers/attention/naive.rs).
  - ``jax``: the stock Pallas ragged-paged-attention kernel shipped with
    JAX (jax.experimental.pallas.ops.tpu.ragged_paged_attention).
  - ``pallas``: this repo's own kernel (ops/pallas/ragged_attention.py),
    with inline quantized-KV dequant — the primary production path.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp

from ..utils import on_tpu
from .attn_metadata import AttentionMetadata

# Trace-time hint set by the engine step when the batch is PURE DECODE
# (one token per sequence): routes "auto" to the in-house decode kernel.
_DECODE_ONLY: contextvars.ContextVar = contextvars.ContextVar(
    "decode_only", default=False
)

# Decode-backend override for A/B kernel experiments. Read ONCE at import
# (process-start-only; ADVICE r3: reading it at trace time inside jit is
# invisible to the cache key, so later changes silently did nothing).
_DECODE_BACKEND = os.environ.get("VLLM_TPU_DECODE_BACKEND", "v2")


@contextlib.contextmanager
def decode_mode():
    tok = _DECODE_ONLY.set(True)
    try:
        yield
    finally:
        _DECODE_ONLY.reset(tok)

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _ref_ragged_paged_attention(
    q: jax.Array,  # [T, H, D]
    kv_pages: jax.Array,  # [num_pages, page_size, 2K, D]
    md: AttentionMetadata,
    *,
    sm_scale: float,
    sliding_window: int | None,
    soft_cap: float | None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    sinks: jax.Array | None = None,  # [H] attention-sink logits
    alibi_slopes: jax.Array | None = None,  # [H] per-head ALiBi slopes
    alibi_sqrt: bool = False,  # Step1 sqrt-distance ALiBi
) -> jax.Array:
    """Jittable reference. Gathers each token's full sequence KV — O(T·P)
    memory, fine for tests and tiny batches; not a production path."""
    t, num_q_heads, head_dim = q.shape
    num_pages, page_size, combined, _ = kv_pages.shape
    num_kv_heads = combined // 2
    group = num_q_heads // num_kv_heads
    s = md.kv_lens.shape[0]
    p = md.page_indices.shape[1]
    n = p * page_size

    token_idx = jnp.arange(t, dtype=jnp.int32)
    seq_id = jnp.clip(
        jnp.searchsorted(md.cu_q_lens, token_idx, side="right") - 1, 0, s - 1
    )
    q_start = md.cu_q_lens[seq_id]
    q_len = md.cu_q_lens[seq_id + 1] - q_start
    kv_len = md.kv_lens[seq_id]
    q_pos = kv_len - q_len + (token_idx - q_start)  # [T] absolute kv position

    pages = md.page_indices[seq_id]  # [T, P]
    kv = kv_pages[pages].reshape(t, n, combined, head_dim)
    k = kv[:, :, 0::2, :]  # [T, N, K, D]
    v = kv[:, :, 1::2, :]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale
    if v_scale is not None:
        v = v.astype(jnp.float32) * v_scale
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)

    qf = q.astype(jnp.float32).reshape(t, num_kv_heads, group, head_dim)
    scores = jnp.einsum("tkgd,tnkd->tkgn", qf, k) * sm_scale  # [T, K, G, N]
    if alibi_slopes is not None:
        # bias = slope_h * (key_pos - q_pos), <= 0 under the causal mask
        # (reference layers/alibi.rs build_alibi_bias); the sqrt variant
        # (Step1, reference models/step1.rs build_sqrt_alibi_bias) uses
        # slope_h * (-sqrt(q_pos - key_pos))
        slopes = alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, group)
        dist = (
            jnp.arange(n, dtype=jnp.int32)[None, :] - q_pos[:, None]
        ).astype(jnp.float32)  # [T, N]
        if alibi_sqrt:
            dist = -jnp.sqrt(jnp.maximum(-dist, 0.0))
        scores = scores + slopes[None, :, :, None] * dist[:, None, None, :]
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    kv_span = jnp.arange(n, dtype=jnp.int32)[None, :]  # [1, N]
    valid = kv_span <= q_pos[:, None]  # causal + length (q_pos < kv_len)
    valid &= kv_span < kv_len[:, None]
    if sliding_window is not None:
        valid &= kv_span > (q_pos[:, None] - sliding_window)
    scores = jnp.where(valid[:, None, None, :], scores, DEFAULT_MASK_VALUE)

    if sinks is None:
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("tkgn,tnkd->tkgd", weights, v)
    else:
        # sink == virtual key with logit `sink` and zero value: it joins
        # the max and the denominator but contributes nothing to out
        sk = sinks.astype(jnp.float32).reshape(num_kv_heads, group)
        m = jnp.maximum(scores.max(-1), sk[None])  # [T, K, G]
        e = jnp.exp(scores - m[..., None])
        denom = e.sum(-1) + jnp.exp(sk[None] - m)
        out = jnp.einsum("tkgn,tnkd->tkgd", e, v) / denom[..., None]
    return out.reshape(t, num_q_heads, head_dim).astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "sliding_window",
        "soft_cap",
        "k_scale",
        "v_scale",
        "backend",
        "alibi_sqrt",
    ),
)
def ragged_paged_attention_op(
    q: jax.Array,
    kv_pages: jax.Array,
    md: AttentionMetadata,
    sinks: jax.Array | None = None,  # [H] attention-sink logits (GPT-OSS)
    alibi_slopes: jax.Array | None = None,  # [H] ALiBi slopes (Bloom/MPT/…)
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    soft_cap: float | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    backend: str = "auto",
    alibi_sqrt: bool = False,
) -> jax.Array:
    if backend == "gather":
        # decode-only gather formulation (plain XLA; see below) with
        # the in-house kernel for prefill chunks
        backend = "ref" if _DECODE_ONLY.get() else "pallas"
    if backend == "auto":
        if on_tpu():
            # decode: the in-house v2 kernel (r4) — single-program
            # dynamic chunk loop + lane-aligned head slices + coalesced
            # span DMA — measures 19-24 us/layer vs the stock ragged
            # kernel's 37-42 at serving geometry (benchmarks/decode_lab
            # r4); prefill keeps the in-house ragged kernel
            # (sequence-aligned q blocks win there). Sinks/ALiBi route
            # to the in-house ragged kernel below either way.
            backend = _DECODE_BACKEND if _DECODE_ONLY.get() else "pallas"
        else:
            backend = "ref"
    if backend == "v2":
        from .pallas.decode_v2 import supports as v2_supports

        s = md.kv_lens.shape[0]
        if (
            sinks is not None
            or alibi_slopes is not None
            or not _DECODE_ONLY.get()
            or not v2_supports(
                q.shape[-1], kv_pages.shape[1], kv_pages.dtype,
                kv_pages.shape[2] // 2,
            )
        ):
            # unsupported geometry / features: the in-house ragged kernel
            # covers everything (sinks, ALiBi, any head_dim, packed KV)
            backend = "pallas" if on_tpu() else "ref"
        else:
            from .pallas.decode_v2 import decode_attention_v2

            t = q.shape[0]
            # decode-only batches map token row i -> sequence row i;
            # align the token bucket to the seq bucket
            q_s = (
                q[:s]
                if t >= s
                else jnp.concatenate(
                    [q, jnp.zeros((s - t, *q.shape[1:]), q.dtype)]
                )
            )
            out = decode_attention_v2(
                q_s,
                kv_pages,
                md.kv_lens,
                md.page_indices,
                md.decode_prepared,
                sm_scale=sm_scale,
                sliding_window=sliding_window,
                soft_cap=soft_cap,
                k_scale=k_scale,
                v_scale=v_scale,
            )
            if t > s:
                out = jnp.concatenate(
                    [out, jnp.zeros((t - s, *out.shape[1:]), out.dtype)]
                )
            return out[:t]
    if backend == "jax" and (sinks is not None or alibi_slopes is not None):
        # the stock ragged kernel supports neither; the in-house kernel
        # handles both (incl. sqrt-ALiBi)
        backend = "pallas"
    if backend == "ref":
        return _ref_ragged_paged_attention(
            q,
            kv_pages,
            md,
            sm_scale=sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            k_scale=k_scale,
            v_scale=v_scale,
            sinks=sinks,
            alibi_slopes=alibi_slopes,
            alibi_sqrt=alibi_sqrt,
        )
    if backend == "jax":
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention.kernel import (
            ragged_paged_attention,
        )

        return ragged_paged_attention(
            q,
            kv_pages,
            md.kv_lens,
            md.page_indices,
            md.cu_q_lens,
            md.num_seqs,
            sm_scale=sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            k_scale=k_scale,
            v_scale=v_scale,
            # conservative tiling: the library's tuned defaults assume more
            # scoped VMEM than this target exposes (16 MiB)
            num_kv_pages_per_block=int(
                os.environ.get("VLLM_TPU_JAX_ATTN_KV_BLOCK", "8")
            ),
            num_queries_per_block=int(
                os.environ.get("VLLM_TPU_JAX_ATTN_Q_BLOCK", "32")
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    if backend == "pallas":
        from .pallas.ragged_attention import ragged_paged_attention_pallas

        return ragged_paged_attention_pallas(
            q,
            kv_pages,
            md.kv_lens,
            md.page_indices,
            md.cu_q_lens,
            md.num_seqs,
            sinks,
            alibi_slopes,
            sm_scale=sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            k_scale=k_scale,
            v_scale=v_scale,
            alibi_sqrt=alibi_sqrt,
        )
    raise ValueError(f"unknown attention backend: {backend}")
