"""Embeddings: one-shot pooled prefill.

Reference: engine/embedding_forward.rs (Mean/Cls/LastToken/Eos pooling)
+ the engine's embed command path (strategy.rs run_embed_blocking —
embeds bypass the scheduler and run as one-shot prefills). Here: a
dedicated jitted function computes pooled, normalized embeddings for a
padded batch in one call. Pages are borrowed from the block pool for the
duration of the forward (attention reads KV through the pool) and
returned afterwards; the pool arrays are donated through the call so no
copy of the KV arena is made.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attn_metadata import AttentionMetadata
from ..utils import cdiv, pick_bucket


class EmbeddingRunner:
    def __init__(self, model, pooling: str = "mean", normalize: bool = True):
        self.model = model
        self.pooling = pooling
        self.normalize = normalize
        self._jit = jax.jit(
            self._embed_fn,
            static_argnames=("pooling", "normalize"),
            donate_argnames=("kv_pages",),
        )

    def _embed_fn(
        self,
        params,
        kv_pages,
        input_ids,
        md: AttentionMetadata,
        pool_skip,  # [S] i32 — leading tokens per seq excluded from mean
        *,
        pooling: str,
        normalize: bool,
    ):
        hidden, kv_pages = self.model(params, input_ids, md, kv_pages)
        t = hidden.shape[0]
        s = md.max_num_seqs
        token_idx = jnp.arange(t, dtype=jnp.int32)
        seq_id = jnp.clip(
            jnp.searchsorted(md.cu_q_lens, token_idx, side="right") - 1, 0, s - 1
        )
        lengths = (md.cu_q_lens[1:] - md.cu_q_lens[:-1]).astype(jnp.float32)

        if pooling == "mean":
            # instruction-masked mean (GritLM, models/gritlm.py): tokens
            # before cu_q_lens[i] + pool_skip[i] are excluded; plain mean
            # is the pool_skip == 0 special case
            valid = (token_idx < md.cu_q_lens[s]) & (
                token_idx >= md.cu_q_lens[seq_id] + pool_skip[seq_id]
            )
            h = jnp.where(valid[:, None], hidden.astype(jnp.float32), 0.0)
            sums = jnp.zeros((s, hidden.shape[1]), jnp.float32).at[seq_id].add(h)
            eff_len = lengths - pool_skip.astype(jnp.float32)
            emb = sums / jnp.maximum(eff_len, 1.0)[:, None]
        elif pooling in ("last", "eos"):
            emb = hidden[md.logits_indices].astype(jnp.float32)
        elif pooling == "cls":
            emb = hidden[md.cu_q_lens[:-1]].astype(jnp.float32)
        else:
            raise ValueError(f"unknown pooling {pooling}")
        if normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
        return emb, kv_pages


def engine_embed(
    engine,
    inputs: list[list[int]],
    *,
    pooling: str = "mean",
    normalize: bool = True,
) -> np.ndarray:
    """Compute embeddings through an LLMEngine's device state.

    Synchronous; call between generation steps (the async engine routes
    embed commands through the engine thread)."""
    runner = engine._embed_runners.get((pooling, normalize))
    if runner is None:
        runner = EmbeddingRunner(engine.model, pooling, normalize)
        engine._embed_runners[(pooling, normalize)] = runner

    cfg = engine.config
    page_size = cfg.cache.page_size
    pages_per_seq = cfg.pages_per_seq
    s_pad = engine.num_slots
    max_bucket = cfg.token_buckets[-1]

    results: list[np.ndarray] = []
    i = 0
    while i < len(inputs):
        group: list[list[int]] = []
        total = 0
        while i < len(inputs) and len(group) < s_pad:
            n = len(inputs[i])
            if n == 0:
                raise ValueError("cannot embed an empty input")
            if n > max_bucket or n > pages_per_seq * page_size:
                raise ValueError(
                    f"embedding input of {n} tokens exceeds the engine limit"
                )
            if total + n > max_bucket and group:
                break
            group.append(inputs[i])
            total += n
            i += 1

        t_pad = pick_bucket(total, cfg.token_buckets)
        # GritLM-style dual-mode models exclude the instruction prefix
        # from the pool (reference gritlm.rs:152-180 gritlm_mean_pool)
        instr_fn = getattr(engine.model, "embed_instruction_len", None)
        pool_skip = np.zeros(s_pad, np.int32)
        if instr_fn is not None and pooling == "mean":
            for j, toks in enumerate(group):
                pool_skip[j] = min(instr_fn(toks), len(toks) - 1)
        input_ids = np.zeros(t_pad, np.int32)
        positions = np.zeros(t_pad, np.int32)
        slot_mapping = np.zeros(t_pad, np.int32)
        kv_lens = np.zeros(s_pad, np.int32)
        page_indices = np.zeros((s_pad, pages_per_seq), np.int32)
        cu = np.zeros(s_pad + 1, np.int32)
        logits_indices = np.zeros(s_pad, np.int32)

        borrowed: list[int] = []
        off = 0
        for j, toks in enumerate(group):
            n = len(toks)
            pages = engine.kv.pool.allocate(cdiv(n, page_size))
            borrowed.extend(pages)
            input_ids[off : off + n] = toks
            positions[off : off + n] = np.arange(n)
            slot_mapping[off : off + n] = [
                pages[p // page_size] * page_size + p % page_size
                for p in range(n)
            ]
            kv_lens[j] = n
            page_indices[j, : len(pages)] = pages
            cu[j + 1] = cu[j] + n
            logits_indices[j] = off + n - 1
            off += n
        cu[len(group) + 1 :] = cu[len(group)]

        md = AttentionMetadata(
            slot_mapping=jnp.asarray(slot_mapping),
            kv_lens=jnp.asarray(kv_lens),
            page_indices=jnp.asarray(page_indices),
            cu_q_lens=jnp.asarray(cu),
            num_seqs=jnp.asarray([len(group)], jnp.int32),
            positions=jnp.asarray(positions),
            logits_indices=jnp.asarray(logits_indices),
        )
        try:
            emb, engine.kv_pages = runner._jit(
                engine.params,
                engine.kv_pages,
                jnp.asarray(input_ids),
                md,
                jnp.asarray(pool_skip),
                pooling=pooling,
                normalize=normalize,
            )
            results.append(np.asarray(emb)[: len(group)])
        finally:
            engine.kv.pool.free(borrowed)
    return np.concatenate(results, axis=0)
