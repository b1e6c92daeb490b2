"""Attention metadata for the unified (mixed prefill+decode) step.

This is the TPU-native replacement for the reference's per-mode execution
strategies (crates/core/src/engine/{standard,helpers}.rs separate
prefill/decode paths + CUDA-graph BatchDescriptor dispatch): a single
flattened-token batch covers chunked prefills and decodes in one jitted
call, with static bucketed shapes.

Layout convention (matches the ragged paged-attention kernel family):
  - tokens of all scheduled sequences are concatenated: ``T`` total slots,
    padded up to a token bucket;
  - per-sequence arrays are padded up to a seq bucket ``S``;
  - page 0 of the KV pool is the *null page*: padded tokens' slot_mapping
    points into it and padded page-table entries reference it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class AttentionMetadata:
    """Static-shape metadata describing one engine step's batch.

    Shapes: T = padded token count, S = padded sequence count,
    P = pages per sequence (static, from max_model_len).
    """

    # [T] physical KV slot (= page * page_size + offset) for each new token.
    slot_mapping: jax.Array
    # [S] total KV length per sequence AFTER this step's tokens are written.
    kv_lens: jax.Array
    # [S, P] physical page ids per sequence.
    page_indices: jax.Array
    # [S+1] cumulative query lengths (cu_q_lens[i+1]-cu_q_lens[i] = #tokens
    # scheduled for sequence i this step).
    cu_q_lens: jax.Array
    # [1] number of real (non-padding) sequences.
    num_seqs: jax.Array
    # [T] absolute position of each token in its sequence.
    positions: jax.Array
    # [S] index into the token axis of the LAST token of each sequence
    # (used to gather hidden states for logits/sampling). Padding rows
    # point at token 0.
    logits_indices: jax.Array
    # [S] engine sequence-slot ids (recurrent-state index for SSM layers;
    # reference ssm/SSMStateManager). None for paths without SSM support.
    slot_ids: jax.Array | None = None
    # Optional compacted live-page arrays for the decode-v2 kernel
    # (pages_flat, meta, contig, n_chunks — see ops/pallas/decode_v2.py
    # compact_decode_pages). Attached once per decode dispatch by the
    # engine step so per-layer attention calls skip the compaction.
    decode_prepared: tuple | None = None

    @property
    def num_tokens(self) -> int:
        return self.slot_mapping.shape[0]

    @property
    def max_num_seqs(self) -> int:
        return self.kv_lens.shape[0]

    @property
    def pages_per_seq(self) -> int:
        return self.page_indices.shape[1]


def make_dummy_metadata(
    num_tokens: int,
    num_seqs_pad: int,
    pages_per_seq: int,
    *,
    num_real_seqs: int = 1,
) -> AttentionMetadata:
    """A trivially-valid metadata batch (used by warmup and tests):
    one sequence owning all tokens, pages 1..N in order."""
    t = num_tokens
    page_size = 16
    slot = jnp.arange(t, dtype=jnp.int32) + page_size  # start at page 1
    kv_lens = jnp.zeros((num_seqs_pad,), jnp.int32).at[0].set(t)
    page_indices = jnp.zeros((num_seqs_pad, pages_per_seq), jnp.int32)
    n_pages = min(pages_per_seq, (t + page_size - 1) // page_size)
    page_indices = page_indices.at[0, :n_pages].set(
        jnp.arange(1, n_pages + 1, dtype=jnp.int32)
    )
    cu = jnp.zeros((num_seqs_pad + 1,), jnp.int32)
    cu = cu.at[1:].set(t)
    return AttentionMetadata(
        slot_mapping=slot,
        kv_lens=kv_lens,
        page_indices=page_indices,
        cu_q_lens=cu,
        num_seqs=jnp.array([num_real_seqs], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        logits_indices=jnp.zeros((num_seqs_pad,), jnp.int32).at[0].set(t - 1),
        slot_ids=jnp.arange(num_seqs_pad, dtype=jnp.int32),
    )
