"""GritLM dual-mode: instruction-masked embedding pooling + generation.

Reference behavior: crates/core/src/models/gritlm.rs (get_instruction_len
token-pattern cases, gritlm_mean_pool exclusion semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.models.gritlm import (
    _EMBED_NEWLINE_PATTERN,
    _EMBED_PATTERN,
    _USER_PATTERN,
    get_instruction_len,
)


def tiny_cfg():
    return ModelConfig(
        architectures=["GritLM"],
        model_type="llama",
        vocab_size=32000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        eos_token_id=2,
    )


def test_instruction_len_with_user_instruction():
    # <s> <|user|>\n INSTR \n<|embed|>\n CONTENT  (gritlm.rs:84-105)
    bos = 1
    instr = [901, 902, 903]
    content = [77, 78, 79, 80]
    toks = [bos, *_USER_PATTERN, *instr, *_EMBED_NEWLINE_PATTERN, *content]
    skip = get_instruction_len(toks)
    assert toks[skip:] == content


def test_instruction_len_without_instruction():
    bos = 1
    content = [77, 78, 79]
    toks = [bos, *_EMBED_PATTERN, *content]
    skip = get_instruction_len(toks)
    assert toks[skip:] == content


def test_instruction_len_no_pattern_skips_bos_only():
    toks = [1, 5, 6, 7]
    assert get_instruction_len(toks) == 1


def test_registry_and_generation():
    model = from_config(tiny_cfg(), dtype=jnp.float32)
    assert type(model).__name__ == "GritLMForCausalLM"
    # generation mode: plain causal LM through the engine
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.request import SamplingParams

    params = model.init_params(jax.random.PRNGKey(0))
    cfg = EngineConfig(
        model=tiny_cfg(),
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
    )
    eng = LLMEngine(model, params, cfg)
    sp = SamplingParams(max_tokens=4, temperature=0.0)
    eng.add_request("g", [1, 5, 6, 7], sp)
    outs = {}
    while eng.has_unfinished:
        for out in eng.step():
            outs.setdefault(out.request_id, []).extend(out.new_token_ids)
    assert len(outs["g"]) >= 1

    # embedding mode: instruction tokens are excluded from the mean pool
    bos = 1
    content = [77, 78, 79]
    with_instr = [bos, *_USER_PATTERN, 901, 902, *_EMBED_NEWLINE_PATTERN, *content]
    emb = eng.embed([with_instr], pooling="mean", normalize=False)
    assert emb.shape == (1, 64)

    # exact check: pooled == mean of hidden states over CONTENT rows only
    skip = get_instruction_len(with_instr)
    assert with_instr[skip:] == content
    t = len(with_instr)
    kv = [
        jnp.zeros((32, 16, 2 * nkv, hd), jnp.float32)
        for nkv, hd in model.kv_head_info
    ]
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

    slots = jnp.arange(t, dtype=jnp.int32) + 16
    md = AttentionMetadata(
        slot_mapping=slots,
        kv_lens=jnp.zeros((4,), jnp.int32).at[0].set(t),
        page_indices=jnp.zeros((4, 8), jnp.int32)
        .at[0, :]
        .set(jnp.arange(1, 9, dtype=jnp.int32)),
        cu_q_lens=jnp.zeros((5,), jnp.int32).at[1:].set(t),
        num_seqs=jnp.array([1], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        logits_indices=jnp.zeros((4,), jnp.int32).at[0].set(t - 1),
    )
    hidden, _ = model(params, jnp.asarray(with_instr, jnp.int32), md, kv)
    want = np.asarray(hidden, np.float32)[skip:].mean(axis=0)
    np.testing.assert_allclose(emb[0], want, atol=1e-4, rtol=1e-4)


def test_known_unsupported_terratorch():
    import pytest

    cfg = tiny_cfg()
    cfg.architectures = ["PrithviGeoSpatialMAE"]
    with pytest.raises(ValueError, match="Terratorch"):
        from_config(cfg)
