"""Additional architectures that ride the Llama-family base via knobs.

Reference: the long tail of models/factories/*.rs one-file archs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import ModelConfig
from .llama import LlamaForCausalLM, Qwen2ForCausalLM


class Glm4ForCausalLM(Qwen2ForCausalLM):
    """GLM-4 (reference models/glm4.rs): qkv bias, partial rotary 0.5
    with INTERLEAVED (rotate-every-two) pairs, post-self-attn / post-mlp
    sublayer norms (verified vs HF numerics)."""

    post_sublayer_norms = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = 0.5
        super().__init__(config, dtype)
        from dataclasses import replace

        self.attn_specs = tuple(
            replace(s, interleaved_rope=True) for s in self.attn_specs
        )


class GraniteForCausalLM(LlamaForCausalLM):
    """IBM Granite (reference models/granite.rs): scalar multipliers on
    embeddings/residual/attention and logit scaling."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        x = config.extra
        # embedding_multiplier / logits_scaling are first-class ModelConfig
        # fields (never land in extra); residual/attention multipliers are
        # extra-only (verified vs HF Granite numerics)
        self.embedding_multiplier = config.embedding_multiplier or x.get(
            "embedding_multiplier"
        )
        self.residual_multiplier = x.get("residual_multiplier", 1.0)
        att_mult = x.get("attention_multiplier")
        if att_mult:
            from dataclasses import replace

            self.attn_specs = tuple(
                replace(s, sm_scale=att_mult) for s in self.attn_specs
            )
        if x.get("logits_scaling"):
            config.logits_scaling = x["logits_scaling"]


class ExaoneForCausalLM(LlamaForCausalLM):
    """LG Exaone — llama skeleton with renamed checkpoint tensors."""

    _RENAMES = {
        "transformer.wte.": "model.embed_tokens.",
        "transformer.ln_f.": "model.norm.",
        ".attn.attention.q_proj": ".self_attn.q_proj",
        ".attn.attention.k_proj": ".self_attn.k_proj",
        ".attn.attention.v_proj": ".self_attn.v_proj",
        ".attn.attention.out_proj": ".self_attn.o_proj",
        ".ln_1.": ".input_layernorm.",
        ".ln_2.": ".post_attention_layernorm.",
        ".mlp.c_fc_0.": ".mlp.gate_proj.",
        ".mlp.c_fc_1.": ".mlp.up_proj.",
        ".mlp.c_proj.": ".mlp.down_proj.",
        "transformer.h.": "model.layers.",
    }

    def load_weights(self, weights):
        def renamed():
            for name, arr in weights:
                for old, new in self._RENAMES.items():
                    name = name.replace(old, new)
                yield name, arr

        return super().load_weights(renamed())


def register_misc(registry: dict) -> None:
    registry.update(
        {
            "Glm4ForCausalLM": Glm4ForCausalLM,
            "GlmForCausalLM": Glm4ForCausalLM,
            "GraniteForCausalLM": GraniteForCausalLM,
            "ExaoneForCausalLM": ExaoneForCausalLM,
            # direct llama-skeleton aliases (same config contract)
            "YiForCausalLM": LlamaForCausalLM,
            "SmolLMForCausalLM": LlamaForCausalLM,
            "OpenELMForCausalLM": LlamaForCausalLM,
            "InternLMForCausalLM": LlamaForCausalLM,
            "AquilaForCausalLM": LlamaForCausalLM,
            "OrionForCausalLM": LlamaForCausalLM,
        }
    )
