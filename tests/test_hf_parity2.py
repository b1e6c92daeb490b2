"""HF-numerics parity, round 2: MLA, SSM/hybrid, exotic MoE, misc archs.

Same gate as test_hf_parity.py (reference
/root/reference/tests/correctness/reference_comparison.rs), harder model
families: DeepSeek MLA, Mamba/Mamba2 recurrences, hybrid layouts, DBRX,
Cohere2, GPT-OSS, Ernie, Dots1.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import transformers

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

from hf_parity_util import (
    assert_logits_close,
    greedy_match,
    hf_logits,
    hf_state_stream,
    run_ours,
)

T = 12


def _seeded(hf_cls, hf_cfg):
    torch.manual_seed(0)
    hf_cfg._attn_implementation = "eager"
    m = hf_cls(hf_cfg)
    m.eval()
    return m


def _ids(vocab):
    rng = np.random.RandomState(7)
    return rng.randint(4, vocab - 4, size=(T,)).astype(np.int64)


def check(config_cls: str, model_cls: str, arch: str, cfg_kw: dict,
          atol=4e-4, our_over: dict | None = None):
    hf_cfg = getattr(transformers, config_cls)(**cfg_kw)
    hf = _seeded(getattr(transformers, model_cls), hf_cfg)
    d = hf_cfg.to_dict()
    d["architectures"] = [arch]
    ours_cfg = ModelConfig.from_dict(d)
    for k, v in (our_over or {}).items():
        setattr(ours_cfg, k, v)
    model = from_config(ours_cfg, dtype=jnp.float32)
    params = model.load_weights(hf_state_stream(hf))
    ids = _ids(ours_cfg.vocab_size)
    ours = run_ours(model, params, ids)
    theirs = hf_logits(hf, ids)
    assert_logits_close(ours, theirs, atol=atol, rtol=atol, label=arch)
    greedy_match(ours, theirs, label=arch)


# ------------------------------------------------------------------
# DeepSeek MLA
# ------------------------------------------------------------------

DS_TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=512, tie_word_embeddings=False,
    q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
    qk_rope_head_dim=8, v_head_dim=16,
    n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
    n_shared_experts=1, first_k_dense_replace=1, moe_layer_freq=1,
    norm_topk_prob=True, n_group=2, topk_group=1, routed_scaling_factor=1.0,
    pad_token_id=0,
)


def test_deepseek_v3_parity():
    check("DeepseekV3Config", "DeepseekV3ForCausalLM",
          "DeepseekV3ForCausalLM", dict(DS_TINY, scoring_func="sigmoid"))


def test_deepseek_v2_parity():
    # real V2 configs: norm_topk_prob=False (the HF V2 gate never
    # normalizes — weights are raw softmax scores x scaling)
    check("DeepseekV2Config", "DeepseekV2ForCausalLM",
          "DeepseekV2ForCausalLM",
          dict(DS_TINY, scoring_func="softmax", topk_method="greedy",
               norm_topk_prob=False))


# ------------------------------------------------------------------
# SSM / hybrid
# ------------------------------------------------------------------

def test_mamba_parity():
    check("MambaConfig", "MambaForCausalLM", "MambaForCausalLM",
          dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
               state_size=8, conv_kernel=4, expand=2, use_bias=False,
               use_conv_bias=True, tie_word_embeddings=True))


def test_mamba2_parity():
    check("Mamba2Config", "Mamba2ForCausalLM", "Mamba2ForCausalLM",
          dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
               state_size=16, conv_kernel=4, expand=2, num_heads=8,
               head_dim=16, n_groups=1, chunk_size=8,
               tie_word_embeddings=True),
          atol=1e-3)


def test_jamba_parity():
    check("JambaConfig", "JambaForCausalLM", "JambaForCausalLM",
          dict(vocab_size=256, hidden_size=64, intermediate_size=128,
               num_hidden_layers=4, num_attention_heads=4,
               num_key_value_heads=2, mamba_d_state=8, mamba_d_conv=4,
               mamba_expand=2, attn_layer_offset=1, attn_layer_period=2,
               expert_layer_offset=1, expert_layer_period=2,
               num_experts=4, num_experts_per_tok=2,
               use_mamba_kernels=False,
               tie_word_embeddings=False),
          atol=1e-3)


# ------------------------------------------------------------------
# misc
# ------------------------------------------------------------------

def test_dbrx_parity():
    from transformers import DbrxConfig
    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=512, vocab_size=256,
        ffn_config=dict(ffn_hidden_size=64, moe_num_experts=4, moe_top_k=2),
        attn_config=dict(kv_n_heads=2, rope_theta=10000.0, clip_qkv=8.0),
    )
    hf = _seeded(transformers.DbrxForCausalLM, cfg)
    d = cfg.to_dict()
    d["architectures"] = ["DbrxForCausalLM"]
    ours_cfg = ModelConfig.from_dict(d)
    model = from_config(ours_cfg, dtype=jnp.float32)
    params = model.load_weights(hf_state_stream(hf))
    ids = _ids(256)
    ours = run_ours(model, params, ids)
    theirs = hf_logits(hf, ids)
    assert_logits_close(ours, theirs, atol=4e-4, rtol=4e-4, label="Dbrx")
    greedy_match(ours, theirs, label="Dbrx")


def test_cohere2_parity():
    check("Cohere2Config", "Cohere2ForCausalLM", "Cohere2ForCausalLM",
          dict(vocab_size=256, hidden_size=64, intermediate_size=128,
               num_hidden_layers=4, num_attention_heads=4,
               num_key_value_heads=2, sliding_window=8,
               sliding_window_pattern=2, logit_scale=0.5,
               tie_word_embeddings=True))


def test_gpt_oss_parity():
    check("GptOssConfig", "GptOssForCausalLM", "GptOssForCausalLM",
          dict(vocab_size=256, hidden_size=64, intermediate_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16,
               num_local_experts=4, num_experts_per_tok=2,
               sliding_window=8, layer_types=["sliding_attention",
                                              "full_attention"],
               tie_word_embeddings=False),
          atol=1e-3)


def test_ernie45_parity():
    check("Ernie4_5Config", "Ernie4_5ForCausalLM", "Ernie4_5ForCausalLM",
          dict(vocab_size=256, hidden_size=64, intermediate_size=128,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, use_bias=False,
               tie_word_embeddings=True))


def test_dots1_parity():
    check("Dots1Config", "Dots1ForCausalLM", "Dots1ForCausalLM",
          dict(vocab_size=256, hidden_size=64, intermediate_size=128,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, n_routed_experts=4,
               num_experts_per_tok=2, moe_intermediate_size=64,
               n_shared_experts=1, first_k_dense_replace=1,
               norm_topk_prob=True, n_group=2, topk_group=1,
               routed_scaling_factor=1.0, scoring_func="sigmoid"),
          atol=1e-3)
