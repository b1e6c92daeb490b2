"""Decoder reward / classification models.

Reference: models/{qwen2_reward,...}.rs factory entries
(Qwen2ForRewardModel / Qwen2ForProcessRewardModel grouped under the
Qwen2 family with pooled score heads). A reward model is a decoder
backbone whose "logits" are a small score head over pooled hidden
states; it serves through the pooling/score endpoints, not generation.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


class DecoderRewardModel:
    """Wraps a causal-LM backbone with a score head.

    - Qwen2ForRewardModel: 2-layer gated head? No — HF uses
      score = Linear(h, h) -> ReLU -> Linear(h, num_labels); pooled at
      the LAST token.
    - Qwen2ForProcessRewardModel: per-STEP scores (token-level head);
      served here with last-token pooling per scored position.
    """

    is_reward_model = True
    default_pooling = "last"

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        from . import from_config

        import dataclasses

        self.config = config
        self.dtype = dtype
        self.num_labels = int(config.extra.get("num_labels", 1))
        self.lm = from_config(
            dataclasses.replace(config, architectures=[self.backbone_arch]),
            dtype=dtype,
        )

    backbone_arch = "Qwen2ForCausalLM"

    # engine proxies
    @property
    def kv_head_info(self):
        return self.lm.kv_head_info

    @property
    def num_layers(self):
        return self.lm.num_layers

    @property
    def kv_scales(self):
        return self.lm.kv_scales

    @kv_scales.setter
    def kv_scales(self, v):
        self.lm.kv_scales = v

    @property
    def attention_backend(self):
        return self.lm.attention_backend

    @attention_backend.setter
    def attention_backend(self, v):
        self.lm.attention_backend = v

    def init_params(self, rng=None, scale: float = 0.02):
        h = self.config.hidden_size
        if rng is None:
            r1 = r2 = r3 = None
        else:
            r1, r2, r3 = jax.random.split(rng, 3)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, self.dtype)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(
                self.dtype
            )

        return {
            "backbone": self.lm.init_params(r1, scale),
            "score": {
                "fc1": {"weight": w(r2, (h, h)),
                        "bias": jnp.zeros((h,), self.dtype)},
                "fc2": {"weight": w(r3, (h, self.num_labels))},
            },
        }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        lm_stream = []
        score: dict = {"fc1": {}, "fc2": {}}
        for name, arr in weights:
            a = np.asarray(arr)
            if name.startswith("score."):
                parts = name.split(".")
                if parts[1] in ("0", "fc1"):
                    score["fc1"][parts[-1]] = jnp.asarray(
                        a.T if parts[-1] == "weight" else a, self.dtype
                    )
                elif parts[1] in ("2", "fc2", "1"):
                    score["fc2"][parts[-1]] = jnp.asarray(
                        a.T if parts[-1] == "weight" else a, self.dtype
                    )
            else:
                lm_stream.append((name, a))
        return {"backbone": self.lm.load_weights(lm_stream), "score": score}

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        hidden, kv = self.lm(params["backbone"], input_ids, md, kv_pages)
        return hidden, kv

    def score(self, params, pooled_hidden: jax.Array) -> jax.Array:
        """pooled hidden [S, H] -> reward scores [S, num_labels] f32."""
        p = params["score"]
        x = pooled_hidden @ p["fc1"]["weight"] + p["fc1"]["bias"]
        x = jax.nn.relu(x.astype(jnp.float32)).astype(pooled_hidden.dtype)
        x = x @ p["fc2"]["weight"]
        return x.astype(jnp.float32)

    def compute_logits(self, params, hidden):
        # generation is undefined for reward models; expose scores so the
        # embedding/pooling path can reuse the hook
        return self.score(params, hidden)


class Qwen2ForRewardModel(DecoderRewardModel):
    backbone_arch = "Qwen2ForCausalLM"


class Qwen2ForProcessRewardModel(Qwen2ForRewardModel):
    default_pooling = "all"  # per-step scores


class InternLM2ForRewardModel(DecoderRewardModel):
    backbone_arch = "InternLM2ForCausalLM"

    def load_weights(self, weights):
        renamed = (
            (n.replace("v_head.", "score.0."), a) for n, a in weights
        )
        return super().load_weights(renamed)


def register_reward(registry: dict) -> None:
    registry.update(
        {
            "Qwen2ForRewardModel": Qwen2ForRewardModel,
            "Qwen2ForProcessRewardModel": Qwen2ForProcessRewardModel,
            "InternLM2ForRewardModel": InternLM2ForRewardModel,
        }
    )
