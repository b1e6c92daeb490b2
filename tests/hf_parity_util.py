"""Shared plumbing for HF-numerics parity tests.

Mirrors the reference's golden comparison strategy
(/root/reference/tests/correctness/reference_comparison.rs:1-13 — engine
output vs Python vLLM goldens): here we go one level deeper and compare
raw logits of our JAX models against HuggingFace transformers (torch CPU,
fp32) on tiny random-weight configs.  A transposed projection, wrong norm
order, or mis-scaled rope in ANY wired family fails these tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

PAGE_SIZE = 16
NUM_PAGES = 64
PAGES_PER_SEQ = 16


def make_kv_pages(model, dtype=jnp.float32):
    """Device pools for any model kind (attention / SSM / MLA / hybrid) via
    the production KVCacheManager spec path."""
    info = model.kv_head_info
    if all(isinstance(e, tuple) for e in info):
        return [
            jnp.zeros((NUM_PAGES, PAGE_SIZE, 2 * nkv, hd), dtype)
            for nkv, hd in info
        ]
    from vllm_rust_tpu.config import CacheConfig
    from vllm_rust_tpu.kv_cache.manager import KVCacheManager

    kvm = KVCacheManager(
        CacheConfig(num_pages=NUM_PAGES, page_size=PAGE_SIZE), info
    )
    return kvm.create_device_pools(dtype, num_slots=4)


def md_prefill(num_tokens: int, s_pad: int = 4) -> AttentionMetadata:
    """Single-sequence full prefill metadata (positions 0..T)."""
    t = num_tokens
    slots = jnp.arange(t, dtype=jnp.int32) + PAGE_SIZE  # page 1 onward
    kv_lens = jnp.zeros((s_pad,), jnp.int32).at[0].set(t)
    pages = jnp.zeros((s_pad, PAGES_PER_SEQ), jnp.int32)
    pages = pages.at[0, :].set(jnp.arange(1, PAGES_PER_SEQ + 1, dtype=jnp.int32))
    cu = jnp.zeros((s_pad + 1,), jnp.int32).at[1:].set(t)
    return AttentionMetadata(
        slot_mapping=slots,
        kv_lens=kv_lens,
        page_indices=pages,
        cu_q_lens=cu,
        num_seqs=jnp.array([1], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        logits_indices=jnp.zeros((s_pad,), jnp.int32).at[0].set(t - 1),
        slot_ids=jnp.arange(s_pad, dtype=jnp.int32),
    )


def hf_state_stream(hf_model):
    """state_dict as an (name, float32 numpy) iterator."""
    for name, tensor in hf_model.state_dict().items():
        yield name, tensor.to("cpu").float().numpy()


def hf_logits(hf_model, ids: np.ndarray, **kw) -> np.ndarray:
    import torch

    hf_model.eval()
    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids[None, :], dtype=torch.long), **kw)
    return out.logits[0].float().numpy()


def run_ours(model, params, ids: np.ndarray, embeds=None) -> np.ndarray:
    kv = make_kv_pages(model, dtype=jnp.float32)
    md = md_prefill(len(ids))
    out = model(
        params, jnp.asarray(ids, jnp.int32), md, kv,
        **({"embeds": embeds} if embeds is not None else {}),
    )
    hidden = out[0]
    logits = model.compute_logits(params, hidden)
    return np.asarray(logits, dtype=np.float32)


def assert_logits_close(ours: np.ndarray, theirs: np.ndarray, atol=2e-4, rtol=2e-4,
                        label=""):
    assert ours.shape == theirs.shape, f"{label}: shape {ours.shape} vs {theirs.shape}"
    # compare in a scale-aware way: logits can be O(10), use max-abs diff
    diff = np.abs(ours - theirs)
    denom = np.maximum(np.abs(theirs), 1.0)
    rel = (diff / denom).max()
    if rel > max(atol, rtol):
        idx = np.unravel_index((diff / denom).argmax(), diff.shape)
        raise AssertionError(
            f"{label}: max rel diff {rel:.3e} at {idx}: ours={ours[idx]:.6f} "
            f"hf={theirs[idx]:.6f}; mean abs diff {diff.mean():.3e}"
        )


def greedy_match(ours: np.ndarray, theirs: np.ndarray, label=""):
    a, b = ours.argmax(-1), theirs.argmax(-1)
    assert (a == b).all(), f"{label}: greedy tokens differ: {a} vs {b}"
