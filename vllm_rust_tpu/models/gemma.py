"""Gemma family: Gemma, Gemma-2, Gemma-3.

Reference: models/gemma.rs / gemma2.rs / gemma3.rs (+ the heterogeneous
sliding/full per-layer KV design of ADR 0021). Family quirks handled
here:
  - (1+w) RMSNorm weights and sqrt(hidden) embedding multiplier
  - Gemma-2: pre/post-feedforward norms, attn + final logit softcaps,
    alternating sliding-window layers, query_pre_attn_scalar
  - Gemma-3: per-head QK-RMSNorm, 5:1 sliding:full layer pattern, and
    DUAL RoPE: sliding layers use rope_local_base_freq (10k), full
    layers use the scaled global table
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Any

import jax.numpy as jnp

from ..config import ModelConfig, RopeScalingConfig
from ..layers.attention import AttentionSpec
from ..layers.rotary import RotarySpec, compute_rope_tables
from .llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    """Gemma-1: gelu MLP, (1+w) norms, scaled embeddings, tied lm_head."""

    norm_offset = 1.0

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.tie_word_embeddings = True
        if config.hidden_act == "silu":
            config.hidden_act = "gelu_pytorch_tanh"
        super().__init__(config, dtype)
        self.embedding_multiplier = math.sqrt(config.hidden_size)


class Gemma2ForCausalLM(GemmaForCausalLM):
    """Gemma-2: softcaps, ffn norms, alternating sliding layers."""

    extra_ffn_norms = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        if config.layer_types is None and config.sliding_window:
            # even layers sliding, odd layers full (HF convention)
            config.layer_types = [
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(config.num_hidden_layers)
            ]
        super().__init__(config, dtype)

    def _make_attn_spec(self, layer_idx: int) -> AttentionSpec:
        cfg = self.config
        q_scalar = cfg.extra.get("query_pre_attn_scalar")
        sm_scale = (
            q_scalar**-0.5 if q_scalar else cfg.head_dim**-0.5
        )
        spec = AttentionSpec.from_model_config(cfg, layer_idx, sm_scale=sm_scale)
        return replace(spec, norm_offset=self.norm_offset)


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    """Gemma-3: QK-norm, 5:1 sliding pattern, dual RoPE tables."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = True
        if config.layer_types is None and config.sliding_window:
            pattern = config.extra.get("sliding_window_pattern", 6)
            config.layer_types = [
                "full_attention"
                if (i + 1) % pattern == 0
                else "sliding_attention"
                for i in range(config.num_hidden_layers)
            ]
        super().__init__(config, dtype)
        # local (sliding-layer) rotary: unscaled, local base frequency
        local_base = config.extra.get("rope_local_base_freq", 10000.0)
        self.local_rotary = RotarySpec(
            head_dim=config.head_dim,
            rotary_dim=int(config.head_dim * config.partial_rotary_factor),
            max_position=config.max_position_embeddings,
            base=local_base,
            scaling=None,
        )

    def _make_attn_spec(self, layer_idx: int) -> AttentionSpec:
        spec = super()._make_attn_spec(layer_idx)
        # gemma3 has no attention softcap (only final logit softcap remains
        # in some checkpoints); sliding layers use the local rope table —
        # flagged via the spec's rotary so the forward picks tables
        if spec.sliding_window is not None:
            spec = replace(spec, soft_cap=None)
        return spec

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cos, sin = compute_rope_tables(
            self.local_rotary, self.config.max_position_embeddings
        )
        params["rope_cos_local"] = cos
        params["rope_sin_local"] = sin
        return params

    def rope_tables_for_layer(self, params: dict, layer_idx: int):
        if self.attn_specs[layer_idx].sliding_window is not None:
            return (params["rope_cos_local"], params["rope_sin_local"])
        return (params["rope_cos"], params["rope_sin"])
