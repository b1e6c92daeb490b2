"""HF-numerics parity: flagship decoder families vs transformers (fp32 CPU).

Reference gate: /root/reference/tests/correctness/reference_comparison.rs:1-13
(greedy-exact / logprob-tolerance vs Python vLLM).  Here: raw-logit closeness
plus greedy-exact on tiny random-weight models, per family.  Configs go
through ``ModelConfig.from_dict(hf_config.to_dict())`` so the HF-config
parsing path is exercised too.
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

T = 12  # prompt length

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, tie_word_embeddings=False,
)


def _seeded(hf_cls, hf_cfg):
    torch.manual_seed(0)
    hf_cfg._attn_implementation = "eager"
    m = hf_cls(hf_cfg)
    m.eval()
    return m


def _ids(vocab):
    rng = np.random.RandomState(7)
    return rng.randint(4, vocab - 4, size=(T,)).astype(np.int64)


def _parity(hf_model, our_cfg: ModelConfig, atol=3e-4, ids=None, **fwd_kw):
    model = from_config(our_cfg, dtype=jnp.float32)
    params = model.load_weights(hf_state_stream(hf_model))
    ids = _ids(our_cfg.vocab_size) if ids is None else ids
    ours = run_ours(model, params, ids, **fwd_kw)
    theirs = hf_logits(hf_model, ids)
    label = our_cfg.architectures[0]
    assert_logits_close(ours, theirs, atol=atol, rtol=atol, label=label)
    greedy_match(ours, theirs, label=label)


def check(config_cls: str, model_cls: str, arch: str, cfg_kw: dict,
          atol=3e-4, our_over: dict | None = None):
    hf_cfg = getattr(transformers, config_cls)(**cfg_kw)
    hf = _seeded(getattr(transformers, model_cls), hf_cfg)
    d = hf_cfg.to_dict()
    d["architectures"] = [arch]
    ours = ModelConfig.from_dict(d)
    for k, v in (our_over or {}).items():
        setattr(ours, k, v)
    _parity(hf, ours, atol=atol)


# ------------------------------------------------------------------
# llama-family sweep (one parametrized test per family)
# ------------------------------------------------------------------

LLAMA_LIKE = {
    "llama": ("LlamaConfig", "LlamaForCausalLM", "LlamaForCausalLM",
              dict(TINY, rms_norm_eps=1e-6, rope_theta=10000.0)),
    "llama_tied": ("LlamaConfig", "LlamaForCausalLM", "LlamaForCausalLM",
                   dict(TINY, num_key_value_heads=4, tie_word_embeddings=True)),
    "llama_rope_llama3": ("LlamaConfig", "LlamaForCausalLM", "LlamaForCausalLM",
                          dict(TINY, rope_scaling=dict(
                              rope_type="llama3", factor=8.0,
                              low_freq_factor=1.0, high_freq_factor=4.0,
                              original_max_position_embeddings=64))),
    "qwen2": ("Qwen2Config", "Qwen2ForCausalLM", "Qwen2ForCausalLM",
              dict(TINY)),
    "qwen3": ("Qwen3Config", "Qwen3ForCausalLM", "Qwen3ForCausalLM",
              dict(TINY, head_dim=32, rope_theta=1000000.0)),
    "mistral": ("MistralConfig", "MistralForCausalLM", "MistralForCausalLM",
                dict(TINY, sliding_window=8)),
    "gemma2": ("Gemma2Config", "Gemma2ForCausalLM", "Gemma2ForCausalLM",
               dict(TINY, head_dim=16, query_pre_attn_scalar=16,
                    sliding_window=8, attn_logit_softcapping=50.0,
                    final_logit_softcapping=30.0, tie_word_embeddings=True)),
    "gemma3": ("Gemma3TextConfig", "Gemma3ForCausalLM", "Gemma3ForCausalLM",
               dict(TINY, head_dim=16, query_pre_attn_scalar=16,
                    sliding_window=8, rope_theta=1000000.0,
                    rope_local_base_freq=10000.0, sliding_window_pattern=2,
                    tie_word_embeddings=True)),
    "olmo2": ("Olmo2Config", "Olmo2ForCausalLM", "Olmo2ForCausalLM",
              dict(TINY)),
    "granite": ("GraniteConfig", "GraniteForCausalLM", "GraniteForCausalLM",
                dict(TINY, embedding_multiplier=2.0, residual_multiplier=0.5,
                     attention_multiplier=0.25, logits_scaling=2.0)),
    "cohere": ("CohereConfig", "CohereForCausalLM", "CohereForCausalLM",
               dict(TINY, num_key_value_heads=4, tie_word_embeddings=True,
                    logit_scale=0.5)),
    "smollm3": ("SmolLM3Config", "SmolLM3ForCausalLM", "SmolLM3ForCausalLM",
                dict(TINY, no_rope_layers=[1, 0],
                    no_rope_layer_interval=2, pad_token_id=0)),
    "glm4": ("Glm4Config", "Glm4ForCausalLM", "Glm4ForCausalLM",
             dict(TINY, partial_rotary_factor=0.5, pad_token_id=0,
                  eos_token_id=2)),
    "starcoder2": ("Starcoder2Config", "Starcoder2ForCausalLM",
                   "Starcoder2ForCausalLM",
                   dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, use_bias=True,
                        tie_word_embeddings=False)),
    "stablelm": ("StableLmConfig", "StableLmForCausalLM", "StablelmForCausalLM",
                 dict(TINY, partial_rotary_factor=0.25)),
    "phi3": ("Phi3Config", "Phi3ForCausalLM", "Phi3ForCausalLM",
             dict(TINY, pad_token_id=0, eos_token_id=2, bos_token_id=1)),
    "phi": ("PhiConfig", "PhiForCausalLM", "PhiForCausalLM",
            dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=4, partial_rotary_factor=0.5)),
    "persimmon": ("PersimmonConfig", "PersimmonForCausalLM",
                  "PersimmonForCausalLM",
                  dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=4, partial_rotary_factor=0.5)),
    "olmo": ("OlmoConfig", "OlmoForCausalLM", "OlmoForCausalLM",
             dict(TINY, clip_qkv=10.0)),
    "nemotron": ("NemotronConfig", "NemotronForCausalLM", "NemotronForCausalLM",
                 dict(TINY, norm_eps=1e-5)),
}


@pytest.mark.parametrize("name", sorted(LLAMA_LIKE))
def test_llama_like_parity(name):
    cfg_cls, mdl_cls, arch, kw = LLAMA_LIKE[name]
    check(cfg_cls, mdl_cls, arch, kw)


# ------------------------------------------------------------------
# pre-llama GPT family
# ------------------------------------------------------------------

GPT_LIKE = {
    "gpt2": ("GPT2Config", "GPT2LMHeadModel", "GPT2LMHeadModel",
             dict(vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=512)),
    "gptj": ("GPTJConfig", "GPTJForCausalLM", "GPTJForCausalLM",
             dict(vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                  rotary_dim=8, n_positions=512)),
    "gpt_neox": ("GPTNeoXConfig", "GPTNeoXForCausalLM", "GPTNeoXForCausalLM",
                 dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      rotary_pct=0.25, use_parallel_residual=True)),
    "opt": ("OPTConfig", "OPTForCausalLM", "OPTForCausalLM",
            dict(vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
                 num_attention_heads=4, max_position_embeddings=512,
                 word_embed_proj_dim=64, do_layer_norm_before=True)),
    "bloom": ("BloomConfig", "BloomForCausalLM", "BloomForCausalLM",
              dict(vocab_size=256, hidden_size=64, n_layer=2, n_head=4)),
    "falcon": ("FalconConfig", "FalconForCausalLM", "FalconForCausalLM",
               dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, new_decoder_architecture=True,
                    num_kv_heads=2)),
    "gpt_bigcode": ("GPTBigCodeConfig", "GPTBigCodeForCausalLM",
                    "GPTBigCodeForCausalLM",
                    dict(vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                         n_positions=512, multi_query=True)),
    "mpt": ("MptConfig", "MptForCausalLM", "MPTForCausalLM",
            dict(vocab_size=256, d_model=64, n_layers=2, n_heads=4)),
}


@pytest.mark.parametrize("name", sorted(GPT_LIKE))
def test_gpt_like_parity(name):
    cfg_cls, mdl_cls, arch, kw = GPT_LIKE[name]
    check(cfg_cls, mdl_cls, arch, kw)


# ------------------------------------------------------------------
# MoE families
# ------------------------------------------------------------------

MOE = {
    "mixtral": ("MixtralConfig", "MixtralForCausalLM", "MixtralForCausalLM",
                dict(TINY, num_local_experts=4, num_experts_per_tok=2)),
    "qwen3_moe": ("Qwen3MoeConfig", "Qwen3MoeForCausalLM", "Qwen3MoeForCausalLM",
                  dict(TINY, head_dim=16, num_experts=4, num_experts_per_tok=2,
                       moe_intermediate_size=64, norm_topk_prob=True,
                       decoder_sparse_step=1, mlp_only_layers=[])),
    "qwen2_moe": ("Qwen2MoeConfig", "Qwen2MoeForCausalLM", "Qwen2MoeForCausalLM",
                  dict(TINY, num_experts=4, num_experts_per_tok=2,
                       moe_intermediate_size=64, norm_topk_prob=False,
                       shared_expert_intermediate_size=64,
                       decoder_sparse_step=1, mlp_only_layers=[])),
}


@pytest.mark.parametrize("name", sorted(MOE))
def test_moe_parity(name):
    cfg_cls, mdl_cls, arch, kw = MOE[name]
    check(cfg_cls, mdl_cls, arch, kw)
