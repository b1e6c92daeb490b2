"""Model forward smoke tests: shapes, KV writing, prefill/decode parity.

Test strategy mirrors the reference (SURVEY.md §4): tiny configs, dummy
weights, CPU only, assert shapes + numerics invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.models import from_config, supported_architectures
from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
from vllm_rust_tpu.testing import tiny_llama_config, tiny_qwen3_config

PAGE_SIZE = 16
NUM_PAGES = 32
PAGES_PER_SEQ = 8


def make_kv_pages(model, dtype=jnp.float32):
    return [
        jnp.zeros((NUM_PAGES, PAGE_SIZE, 2 * nkv, hd), dtype)
        for nkv, hd in model.kv_head_info
    ]


def md_single_seq(num_tokens, start_pos=0, s_pad=4):
    """One sequence, tokens at positions [start_pos, start_pos+num_tokens)."""
    t = num_tokens
    slots = jnp.arange(start_pos, start_pos + t, dtype=jnp.int32) + PAGE_SIZE
    kv_lens = jnp.zeros((s_pad,), jnp.int32).at[0].set(start_pos + t)
    pages = jnp.zeros((s_pad, PAGES_PER_SEQ), jnp.int32)
    pages = pages.at[0, :].set(jnp.arange(1, PAGES_PER_SEQ + 1, dtype=jnp.int32))
    cu = jnp.zeros((s_pad + 1,), jnp.int32).at[1:].set(t)
    return AttentionMetadata(
        slot_mapping=slots,
        kv_lens=kv_lens,
        page_indices=pages,
        cu_q_lens=cu,
        num_seqs=jnp.array([1], jnp.int32),
        positions=jnp.arange(start_pos, start_pos + t, dtype=jnp.int32),
        logits_indices=jnp.zeros((s_pad,), jnp.int32).at[0].set(t - 1),
    )


@pytest.mark.parametrize("cfg_fn", [tiny_llama_config, tiny_qwen3_config])
def test_forward_shapes(cfg_fn):
    cfg = cfg_fn()
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    kv = make_kv_pages(model)
    md = md_single_seq(8)
    ids = jnp.arange(8, dtype=jnp.int32)
    hidden, kv2 = model(params, ids, md, kv)
    assert hidden.shape == (8, cfg.hidden_size)
    logits = model.compute_logits(params, hidden[-1:])
    assert logits.shape == (1, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    # KV must have been written at slots 16..24
    k_written = kv2[0][1, :8, 0, :]  # page 1, first 8 slots, K head 0
    assert not np.allclose(np.asarray(k_written), 0.0)


def test_prefill_then_decode_matches_full_prefill():
    """Incremental decode must produce identical logits to a full prefill —
    the core paged-KV correctness invariant (reference kv_cache tests)."""
    cfg = tiny_llama_config()
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (12,), 0, cfg.vocab_size)

    # full prefill of 12 tokens
    kv = make_kv_pages(model)
    md_full = md_single_seq(12)
    h_full, _ = model(params, ids, md_full, kv)
    logits_full = model.compute_logits(params, h_full[-1:])

    # prefill 8, then decode tokens 8..11 one at a time
    kv = make_kv_pages(model)
    md_p = md_single_seq(8)
    h, kv = model(params, ids[:8], md_p, kv)
    for pos in range(8, 12):
        md_d = md_single_seq(1, start_pos=pos)
        h, kv = model(params, ids[pos : pos + 1], md_d, kv)
    logits_inc = model.compute_logits(params, h[-1:])

    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_inc), rtol=2e-4, atol=2e-4
    )


def test_gqa_and_sliding_window_ref_backend():
    """Sliding window must limit attention to the window."""
    cfg = tiny_llama_config(sliding_window=4, model_type="mistral")
    cfg.architectures = ["MistralForCausalLM"]
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].sliding_window == 4
    params = model.init_params(jax.random.PRNGKey(0))
    kv = make_kv_pages(model)
    md = md_single_seq(10)
    ids = jnp.arange(10, dtype=jnp.int32)
    hidden, _ = model(params, ids, md, kv)
    assert hidden.shape == (10, cfg.hidden_size)


def test_registry():
    archs = supported_architectures()
    assert "LlamaForCausalLM" in archs
    assert "Qwen3ForCausalLM" in archs
    with pytest.raises(ValueError, match="unsupported"):
        from_config(tiny_llama_config(architectures=["NopeForCausalLM"]))
