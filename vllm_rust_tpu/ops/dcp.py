"""Decode Context Parallelism (DCP): sequence-sharded paged attention.

Reference: distributed/context_parallel.rs (the reference's only
long-context sequence parallelism): the KV cache is sharded across ranks
in interleaved token blocks; each rank computes attention over its LOCAL
KV with a log-sum-exp, then ranks merge:

    m   = max_i lse_i
    out = Σ_i exp(lse_i − m) · out_i  /  Σ_i exp(lse_i − m)

(reference lse_correct_and_reduce; mirrors vLLM cp_lse_ag_out_rs). On
TPU the merge is a few lines of jnp + psum inside shard_map over an
"sp" mesh axis — ICI collectives replace the NCCL all-gather/reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .attn_metadata import AttentionMetadata
from .paged_attention import DEFAULT_MASK_VALUE


def attention_with_lse(
    q: jax.Array,  # [T, H, D]
    kv_pages: jax.Array,  # local shard [pages, ps, 2K, D]
    md: AttentionMetadata,  # LOCAL metadata (local kv_lens / page tables)
    *,
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Reference-backend attention returning (out [T,H,D], lse [T,H]).

    Unnormalized-softmax variant of ops/paged_attention._ref…: the
    normalizer is returned as the log-sum-exp so partial results from
    different KV shards can be merged exactly."""
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
    kv_len = md.kv_lens[seq_id]

    pages = md.page_indices[seq_id]
    kv = kv_pages[pages].reshape(t, n, combined, head_dim)
    k = kv[:, :, 0::2, :].astype(jnp.float32)
    v = kv[:, :, 1::2, :].astype(jnp.float32)

    qf = q.astype(jnp.float32).reshape(t, num_kv_heads, group, head_dim)
    scores = jnp.einsum("tkgd,tnkd->tkgn", qf, k) * sm_scale
    kv_span = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = kv_span < kv_len[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, DEFAULT_MASK_VALUE)

    m = jnp.max(scores, axis=-1, keepdims=True)  # [T,K,G,1]
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.einsum("tkgn,tnkd->tkgd", e, v) / jnp.maximum(denom, 1e-30)
    lse = (m[..., 0] + jnp.log(jnp.maximum(denom[..., 0], 1e-30)))
    # empty local shard (kv_len 0): mask contributes DEFAULT_MASK_VALUE
    has_kv = kv_len > 0
    lse = jnp.where(has_kv[:, None, None], lse, -jnp.inf)
    return (
        out.reshape(t, num_q_heads, head_dim),
        lse.reshape(t, num_q_heads),
    )


def lse_merge(out: jax.Array, lse: jax.Array, axis_name: str) -> jax.Array:
    """Merge per-shard attention results across a mesh axis
    (reference lse_correct_and_reduce)."""
    m = jax.lax.pmax(lse, axis_name)  # [T, H] global max
    w = jnp.exp(jnp.where(jnp.isinf(lse), -jnp.inf, lse) - m)
    w = jnp.where(jnp.isnan(w), 0.0, w)[..., None]  # dead shards → 0
    num = jax.lax.psum(out.astype(jnp.float32) * w, axis_name)
    den = jax.lax.psum(w, axis_name)
    return (num / jnp.maximum(den, 1e-30)).astype(out.dtype)


def dcp_local_assignment(
    kv_len: int, world: int, rank: int, interleave: int = 1
) -> list[int]:
    """Interleaved round-robin token-block → rank assignment (reference
    get_dcp_local_seq_lens / interleave_size). Returns this rank's global
    block indices for a sequence of kv_len tokens in `interleave`-sized
    blocks."""
    n_blocks = -(-kv_len // interleave)
    return [b for b in range(n_blocks) if b % world == rank]


def dcp_attention(
    q: jax.Array,
    kv_pages: jax.Array,  # sharded on axis `sp` over pages? per-shard view
    md: AttentionMetadata,
    *,
    sm_scale: float,
    axis_name: str = "sp",
) -> jax.Array:
    """shard_map body: local attention + cross-rank LSE merge."""
    out, lse = attention_with_lse(q, kv_pages, md, sm_scale=sm_scale)
    return lse_merge(out, lse, axis_name)
