"""Profiled KV-pool sizing: measure, don't guess.

Reference ADR 0024 + kv_cache/config.rs:249 CacheConfig::from_memory_budget
(profiled headroom): the non-KV memory a serving step needs (weights +
activation scratch at the largest compiled bucket) is MEASURED on the
device, and the remaining HBM becomes the KV pool. Guessing either way
fails: too small wastes context capacity, too large OOMs at the first
big prefill.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

#: fraction of HBM deliberately left free (allocator slack, fragmentation)
DEFAULT_HEADROOM = 0.08


def device_memory_stats(device=None) -> dict | None:
    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats or "bytes_limit" not in stats:
        return None
    return stats


def profile_kv_budget(
    model,
    params,
    *,
    max_tokens_per_step: int,
    max_num_seqs: int,
    pages_per_seq: int,
    page_size: int = 16,
    headroom: float = DEFAULT_HEADROOM,
    device=None,
) -> int | None:
    """Bytes available for the KV pool, or None when the backend exposes
    no memory stats (CPU test meshes).

    Procedure (ADR 0024): with params resident, run ONE forward at the
    largest scheduler bucket against a minimal KV pool, then read the
    device's peak-bytes high-water. scratch = peak - resident;
    budget = limit*(1-headroom) - resident - scratch.
    """
    stats = device_memory_stats(device)
    if stats is None:
        return None
    limit = stats["bytes_limit"]

    from ..ops.attn_metadata import make_dummy_metadata

    info = model.kv_head_info
    if not all(isinstance(e, tuple) for e in info):
        # SSM / heterogeneous pools: skip the forward probe, reserve a
        # flat 10% for scratch
        resident = stats.get("bytes_in_use", 0)
        budget = int(limit * (1 - headroom) * 0.9) - resident
        return max(budget, 0)

    # minimal pool: enough pages for one max-length bucket of tokens
    probe_pages = max(2, (max_tokens_per_step + page_size - 1) // page_size + 1)
    kv_probe = [
        jnp.zeros((probe_pages, page_size, 2 * nkv, hd), model.dtype)
        for nkv, hd in info
    ]

    t = max_tokens_per_step
    md = make_dummy_metadata(t, max_num_seqs, pages_per_seq=probe_pages - 1)
    ids = jnp.zeros((t,), jnp.int32)

    @jax.jit
    def probe(params, kv, ids, md):
        hidden, kv = model(params, ids, md, kv)
        return model.compute_logits(params, hidden[md.logits_indices]), kv

    logits, kv_probe = probe(params, kv_probe, ids, md)
    jax.block_until_ready(logits)
    stats2 = device_memory_stats(device) or stats
    resident = stats.get("bytes_in_use", 0)
    peak = stats2.get("peak_bytes_in_use", resident)
    scratch = max(peak - resident, 0)
    budget = int(limit * (1 - headroom)) - resident - scratch
    logger.info(
        "profiled KV sizing: limit=%.2fGiB resident=%.2fGiB scratch=%.2fGiB "
        "-> KV budget %.2fGiB",
        limit / 2**30, resident / 2**30, scratch / 2**30,
        max(budget, 0) / 2**30,
    )
    return max(budget, 0)
