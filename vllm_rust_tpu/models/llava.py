"""LLaVA-family vision-language model.

Reference: crates/core/src/models/llava.rs + multimodal/processor.rs
(process_image → vision tower → projector → merge_embeddings). TPU
design: the vision tower + projector run ONCE per request as a jitted
call at admission; the projected embeddings land in a per-slot device
buffer and the language model's flattened step injects them at image-
token positions (engine/vlm.py) — prefill sees image features with no
re-encode and no per-step host transfer.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vision import CLIPVisionTower, SiglipVisionTower


class LlavaForConditionalGeneration:
    is_multimodal = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        text_cfg = dict(ex.get("text_config", {}))
        if not text_cfg.get("architectures"):  # absent OR explicit None
            text_cfg["architectures"] = ["LlamaForCausalLM"]
        vis_cfg = dict(ex.get("vision_config", {}))
        self.image_token_index = int(ex.get("image_token_index", 32000))
        self.feature_layer = int(ex.get("vision_feature_layer", -2))
        self.select_strategy = ex.get("vision_feature_select_strategy", "default")

        from . import from_config

        self.text_config = ModelConfig.from_dict(text_cfg)
        if "vocab_size" in ex.get("text_config", {}):
            self.text_config.vocab_size = ex["text_config"]["vocab_size"]
        self.lm = from_config(self.text_config, dtype=dtype)
        tower_cls = (
            SiglipVisionTower
            if "siglip" in vis_cfg.get("model_type", "clip")
            else CLIPVisionTower
        )
        self.vision = tower_cls(vis_cfg, dtype=dtype)
        # image tokens produced per image
        n = self.vision.num_patches
        self.tokens_per_image = n

    # expose the text model's interface to the engine
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

    # -- params ---------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        if rng is None:
            r1 = r2 = r3 = None
        else:
            r1, r2, r3 = jax.random.split(rng, 3)
        h_v = self.vision.hidden_size
        h_t = self.text_config.hidden_size

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, self.dtype)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(
                self.dtype
            )

        return {
            "language_model": self.lm.init_params(r1, scale),
            "vision_tower": self.vision.init_params(r2, scale),
            "projector": {
                "linear_1": {"weight": w(r3, (h_v, h_t)),
                             "bias": jnp.zeros((h_t,), self.dtype)},
                "linear_2": {"weight": w(r3, (h_t, h_t)),
                             "bias": jnp.zeros((h_t,), self.dtype)},
            },
        }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        lm_stream, vis_stream = [], []
        proj: dict = {}
        for name, arr in weights:
            # transformers >= 4.52 drops the nested prefixes; accept both
            if name.startswith("language_model."):
                lm_stream.append((name.removeprefix("language_model."), arr))
            elif name.startswith(("model.language_model.",)):
                lm_stream.append(
                    ("model." + name.removeprefix("model.language_model."), arr)
                )
            elif name.startswith(("vision_tower.", "model.vision_tower.")):
                vis_stream.append(
                    (name.split("vision_tower.", 1)[1], arr)
                )
            elif "multi_modal_projector." in name:
                rest = name.split("multi_modal_projector.", 1)[1]
                parts = rest.split(".")
                a = np.asarray(arr)
                proj.setdefault(parts[0], {})[parts[1]] = jnp.asarray(
                    a.T if parts[1] == "weight" else a, self.dtype
                )
            elif name.startswith("lm_head."):
                lm_stream.append((name, arr))
        params = {
            "language_model": self.lm.load_weights(lm_stream),
            "vision_tower": self.vision.load_weights(vis_stream),
            "projector": proj,
        }
        return params

    # -- vision path ------------------------------------------------------------

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, 3, H, W] -> projected embeds
        [B * tokens_per_image, text_hidden]."""
        feats = self.vision(
            params["vision_tower"], pixel_values, feature_layer=self.feature_layer
        )
        if self.select_strategy == "default" and self.vision.use_class_token:
            feats = feats[:, 1:]  # drop CLS
        p = params["projector"]
        x = feats @ p["linear_1"]["weight"] + p["linear_1"]["bias"]
        x = jax.nn.gelu(x)
        x = x @ p["linear_2"]["weight"] + p["linear_2"]["bias"]
        return x.reshape(-1, x.shape[-1])

    # -- ModelForward -------------------------------------------------------------

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        return self.lm(
            params["language_model"], input_ids, md, kv_pages, embeds=embeds
        )

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params["language_model"], hidden)
