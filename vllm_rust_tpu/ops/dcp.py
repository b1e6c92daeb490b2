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
    kv_positions: jax.Array | None = None,  # [S, P*ps] global kv pos
) -> tuple[jax.Array, jax.Array]:
    """Reference-backend attention returning (out [T,H,D], lse [T,H]).

    Unnormalized-softmax variant of ops/paged_attention._ref…: the
    normalizer is returned as the log-sum-exp so partial results from
    different KV shards can be merged exactly.

    ``kv_positions``: global position of every local KV token (needed
    under DCP where a rank's pages are a compressed subset — causal
    masking for prefill chunks must compare GLOBAL positions; decode
    reduces to the kv_len mask)."""
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
    if kv_positions is not None:
        q_pos = md.positions if md.positions.ndim == 1 else md.positions[0]
        valid = valid & (kv_positions[seq_id] <= q_pos[:t, None])
    scores = jnp.where(valid[:, None, None, :], scores, DEFAULT_MASK_VALUE)

    m = jnp.max(scores, axis=-1, keepdims=True)  # [T,K,G,1]
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.einsum("tkgn,tnkd->tkgd", e, v) / jnp.maximum(denom, 1e-30)
    lse = (m[..., 0] + jnp.log(jnp.maximum(denom[..., 0], 1e-30)))
    # rows with no valid local KV (empty shard, or fully causally
    # masked) must drop out of the cross-rank merge entirely
    any_valid = valid.any(axis=-1)
    lse = jnp.where(any_valid[:, None, None], lse, -jnp.inf)
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


# ---------------------------------------------------------------------------
# Engine integration: shard_map-wrapped write + local attention + merge
# (reference DcpAttentionWrapper, context_parallel.rs:1-120)
# ---------------------------------------------------------------------------

import contextlib
import contextvars

_DCP_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "dcp_mode", default=None
)


@contextlib.contextmanager
def dcp_mode(world: int, axis: str = "sp", mesh=None):
    """Enable decode-context-parallel attention for model calls inside
    this context (the engine enters it when decode_context_parallel_size
    > 1)."""
    tok = _DCP_CTX.set((axis, world, mesh))
    try:
        yield
    finally:
        _DCP_CTX.reset(tok)


def dcp_active():
    return _DCP_CTX.get()


def _local_metadata(md: AttentionMetadata, base, stripe_rows, page_size):
    """This rank's view of the global metadata: owned pages compressed
    to the front of each row (order-preserving — attention is a set
    operation over KV, so compression is exact; only the globally-last
    page can be partial and it stays last among owned slots)."""
    pages = md.page_indices  # [S, P] global ids
    s, p = pages.shape
    slot_idx = jnp.arange(p, dtype=jnp.int32)[None, :]
    valid = slot_idx * page_size < md.kv_lens[:, None]
    owned = valid & (pages >= base) & (pages < base + stripe_rows)
    tokens_per_slot = jnp.clip(
        md.kv_lens[:, None] - slot_idx * page_size, 0, page_size
    )
    local_kv_lens = jnp.sum(
        jnp.where(owned, tokens_per_slot, 0), axis=1
    ).astype(md.kv_lens.dtype)
    key = jnp.where(owned, slot_idx, p + slot_idx)
    order = jnp.argsort(key, axis=1)
    local_pages = jnp.take_along_axis(
        jnp.where(owned, pages - base, 0), order, axis=1
    ).astype(pages.dtype)
    # global position of every local KV token (causal masking under
    # compression): compressed slot m came from original slot order[m]
    slot_orig = jnp.take_along_axis(
        jnp.broadcast_to(slot_idx, owned.shape), order, axis=1
    )
    kv_positions = (
        slot_orig[:, :, None] * page_size
        + jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
    ).reshape(s, p * page_size)
    local_md = AttentionMetadata(
        slot_mapping=md.slot_mapping,  # unused by attention
        kv_lens=local_kv_lens,
        page_indices=local_pages,
        cu_q_lens=md.cu_q_lens,
        num_seqs=md.num_seqs,
        positions=md.positions,
        logits_indices=md.logits_indices,
        slot_ids=md.slot_ids,
    )
    return local_md, kv_positions


def dcp_write_and_attend(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,  # [T, K, D]
    v: jax.Array,
    kv_pages: jax.Array,  # [num_pages, ps, 2K, D] sharded P(axis) on pages
    md: AttentionMetadata,
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    soft_cap: float | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    world: int,
    axis: str = "sp",
    mesh=None,
) -> tuple[jax.Array, jax.Array]:
    """KV write + attention under decode context parallelism.

    The pool's page axis is sharded over ``axis``; each rank scatter-
    writes only the slots whose page lives in its stripe, runs local
    attention with an LSE, and ranks merge exactly (lse_merge). Manual
    only over ``axis`` (jax.shard_map axis_names) — tp/dp stay under
    GSPMD auto sharding."""
    from jax.sharding import PartitionSpec as P

    from .kv_write import write_kv_pages
    from .paged_attention import _DECODE_ONLY, on_tpu

    page_size = kv_pages.shape[1]

    def body(q, k, v, kv_local, *md_leaves):
        md_l = jax.tree_util.tree_unflatten(_md_treedef(md), md_leaves)
        r = jax.lax.axis_index(axis)
        stripe_rows = kv_local.shape[0]
        base = r * stripe_rows
        page = md_l.slot_mapping // page_size
        off = md_l.slot_mapping % page_size
        owned_w = (page >= base) & (page < base + stripe_rows)
        # OOB slot => dropped by the scatter for non-owned tokens
        local_slot = jnp.where(
            owned_w, (page - base) * page_size + off,
            stripe_rows * page_size,
        )
        kv_local = write_kv_pages(
            kv_local, k, v, local_slot, k_scale=k_scale, v_scale=v_scale
        )
        local_md, kv_positions = _local_metadata(
            md_l, base, stripe_rows, page_size
        )
        if on_tpu() and _DECODE_ONLY.get():
            # decode: one query per seq, causality == the kv_len mask,
            # so the in-house kernel's LSE output is exact on the
            # compressed local table. Prefill chunks need GLOBAL-position
            # causal masking (compression breaks the kernel's contiguous
            # assumption) and take the ref path below.
            from .pallas.ragged_attention import (
                ragged_paged_attention_pallas,
            )

            out, lse = ragged_paged_attention_pallas(
                q, kv_local, local_md,
                sm_scale=sm_scale,
                sliding_window=sliding_window,
                soft_cap=soft_cap,
                k_scale=k_scale,
                v_scale=v_scale,
                return_lse=True,
            )
            # rows with zero local KV must drop out of the merge
            lse = jnp.where(
                (local_md.kv_lens > 0)[
                    jnp.clip(
                        jnp.searchsorted(
                            local_md.cu_q_lens,
                            jnp.arange(q.shape[0], dtype=jnp.int32),
                            side="right",
                        )
                        - 1,
                        0,
                        local_md.kv_lens.shape[0] - 1,
                    )
                ][:, None],
                lse,
                -jnp.inf,
            )
        else:
            kvl = kv_local
            if k_scale is not None:
                kvf = kvl.astype(jnp.float32)
                sc = jnp.stack(
                    [jnp.full((), k_scale), jnp.full((), v_scale)]
                )
                kvl = kvf * jnp.tile(
                    sc.repeat(kvl.shape[2] // 2), (1,)
                ).reshape(1, 1, -1, 1)
            out, lse = attention_with_lse(
                q, kvl, local_md, sm_scale=sm_scale,
                kv_positions=kv_positions,
            )
        merged = lse_merge(out, lse, axis)
        return merged.astype(q.dtype), kv_local

    md_leaves = jax.tree_util.tree_leaves(md)
    n_md = len(md_leaves)
    out, kv_pages = jax.shard_map(
        body,
        mesh=mesh,
        axis_names={axis},
        in_specs=(P(), P(), P(), P(axis)) + (P(),) * n_md,
        out_specs=(P(), P(axis)),
        check_vma=False,
    )(q, k, v, kv_pages, *md_leaves)
    return out, kv_pages


def _md_treedef(md: AttentionMetadata):
    return jax.tree_util.tree_structure(md)
