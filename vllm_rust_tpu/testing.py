"""Shared test fixtures.

Reference: crates/core/src/testing/ (tiny_config.rs:5 tiny_llama_config,
mock_model.rs:9 MockModelForward). Tiny configs keep params < 1 MB so the
whole engine can be exercised on CPU in unit tests.
"""

from __future__ import annotations

from .config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig


def tiny_llama_config(**over) -> ModelConfig:
    d = dict(
        architectures=["LlamaForCausalLM"],
        model_type="llama",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        eos_token_id=2,
    )
    d.update(over)
    return ModelConfig(**d)


def tiny_qwen3_config(**over) -> ModelConfig:
    d = dict(
        architectures=["Qwen3ForCausalLM"],
        model_type="qwen3",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,  # qwen3 head_dim decoupled from hidden/heads
        max_position_embeddings=512,
        qk_norm=True,
        eos_token_id=2,
    )
    d.update(over)
    return ModelConfig(**d)


def tiny_engine_config(model: ModelConfig | None = None, **over) -> EngineConfig:
    cfg = EngineConfig(
        model=model or tiny_llama_config(),
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=8, max_tokens_per_step=128),
        max_model_len=256,
        token_buckets=(16, 32, 64, 128),
        seq_buckets=(4, 8),
    )
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg
