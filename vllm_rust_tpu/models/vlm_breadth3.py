"""VLM breadth 3: Qwen3-VL (+MoE), GLM-4.1V (+MoE, GLM-4V aliases),
Keye-VL, AyaVision/Cohere2Vision, Fuyu.

Reference: models/{qwen3_vl.rs, qwen3_vl_moe.rs, glm4_1v.rs, glm4v.rs,
keye_vl.rs, aya_vision.rs, fuyu.rs}. Same TPU design as vlm_breadth.py:
towers run as one jitted call at admission; projected embeddings are
injected at image-token positions by engine/vlm.py. Fixed preprocessor
grid (documented round-1 divergence for dynamic-resolution models).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vision import SiglipVisionTower, _dense, _layer_norm
from .vlm_breadth import (
    Qwen2VLForConditionalGeneration,
    Qwen2VLVisionTower,
    VlmBase,
    _apply_rope_half,
    _rms_norm,
    _rope_2d,
)


# -- Qwen3-VL --------------------------------------------------------------------


class Qwen3VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen3-VL (reference models/qwen3_vl.rs): Qwen2-VL-style ViT with
    SiLU linear_fc MLPs and half-dim 2-D rope, merger with norm +
    linear_fc naming; Qwen3 text backbone (per-head QK norms, no attn
    bias). MRoPE simplification as in Qwen2-VL (module doc)."""

    _text_arch = "Qwen3ForCausalLM"

    def _build(self, ex: dict):
        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, self._text_arch)
        else:
            import dataclasses

            from . import from_config

            self.text_config = dataclasses.replace(
                self.config, architectures=[self._text_arch]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        vc = dict(ex.get("vision_config", {}))
        self.vision = Qwen2VLVisionTower(vc, dtype=self.dtype, v3=True)
        self.image_token_index = int(ex.get("image_token_id", 151655))
        self.tokens_per_image = self.vision.merged_patches


class Qwen3VLMoeForConditionalGeneration(Qwen3VLForConditionalGeneration):
    """Qwen3-VL-MoE (reference models/qwen3_vl_moe.rs): same vision
    stack over the Qwen3-MoE text backbone."""

    _text_arch = "Qwen3MoeForCausalLM"


# -- GLM-4.1V --------------------------------------------------------------------


class Glm41VisionTower:
    """GLM-4.1V ViT (reference glm4_1v.rs:457-640): linear patch embed →
    post_conv RMSNorm → learned 2-D position embeddings (bilinear
    resized) → RMSNorm blocks (no-bias fused qkv, half-dim 2-D rope,
    no-bias SwiGLU with mlp_dim = out_hidden_size) → post RMSNorm →
    conv downsample over merge blocks → merger (proj → LayerNorm →
    GELU → SwiGLU)."""

    # GLM-OCR variant (glm_ocr.rs): per-head q/k norms, biased qkv/proj
    # and biased SwiGLU
    qk_norm = False
    use_bias = False

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 1536))
        self.out_hidden = int(cfg.get("out_hidden_size", 4096))
        self.inter = int(cfg.get("intermediate_size", 11008))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.temporal_patch_size = int(cfg.get("temporal_patch_size", 2))
        self.merge_size = int(cfg.get("spatial_merge_size", 2))
        self.num_layers = int(cfg.get("depth", cfg.get("num_hidden_layers",
                                                       4)))
        self.num_heads = int(cfg.get("num_heads",
                                     cfg.get("num_attention_heads", 12)))
        self.image_size = int(cfg.get("image_size", 336))
        self.eps = float(cfg.get("rms_norm_eps", 1e-5))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads
        # pos-embedding table grid (bilinear-resized to the actual grid)
        self.pos_grid = int(round(
            float(cfg.get("num_position_embeddings",
                          self.num_patches)) ** 0.5))

    @property
    def merged_patches(self) -> int:
        return self.num_patches // (self.merge_size**2)

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h, inter = self.hidden_size, self.inter
        mlp_dim = self.out_hidden  # glm4_1v.rs:400
        n_keys = self.num_layers * 4 + 8
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        layers = []
        hd = self.head_dim
        for _ in range(self.num_layers):
            lp = {
                "norm1": jnp.ones((h,), d),
                "qkv": {"weight": w(next(keys), (h, 3 * h))},
                "proj": {"weight": w(next(keys), (h, h))},
                "norm2": jnp.ones((h,), d),
                "gate_up_proj": {"weight": w(next(keys), (h, 2 * mlp_dim))},
                "down_proj": {"weight": w(next(keys), (mlp_dim, h))},
            }
            if self.use_bias:
                for k in ("qkv", "proj", "gate_up_proj", "down_proj"):
                    lp[k]["bias"] = jnp.zeros(lp[k]["weight"].shape[1], d)
            if self.qk_norm:
                lp["q_norm"] = jnp.ones((hd,), d)
                lp["k_norm"] = jnp.ones((hd,), d)
            layers.append(lp)
        m = self.merge_size
        return {
            "patch_embed": {
                "weight": w(next(keys),
                            (self.temporal_patch_size * self.patch_size
                             * self.patch_size * 3, h)),
                "bias": jnp.zeros((h,), d),
            },
            "post_conv_layernorm": jnp.ones((h,), d),
            "position_embedding": w(next(keys),
                                    (self.pos_grid * self.pos_grid, h)),
            "layers": layers,
            "post_layernorm": jnp.ones((h,), d),
            "downsample": {"weight": w(next(keys),
                                       (m * m * h, self.out_hidden)),
                           "bias": jnp.zeros((self.out_hidden,), d)},
            "merger": {
                "proj": {"weight": w(next(keys),
                                     (self.out_hidden, self.out_hidden))},
                "post_projection_norm": {
                    "weight": jnp.ones((self.out_hidden,), d),
                    "bias": jnp.zeros((self.out_hidden,), d),
                },
                "gate_up_proj": {"weight": w(next(keys),
                                             (self.out_hidden,
                                              2 * self.inter))},
                "down_proj": {"weight": w(next(keys),
                                          (self.inter, self.out_hidden))},
            },
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = jnp.concatenate([x] * self.temporal_patch_size, -1)
        x = _dense(x, params["patch_embed"])
        x = _rms_norm(x, params["post_conv_layernorm"], self.eps)
        # learned pos emb, bilinear-resized to the grid (glm4_1v.rs:195)
        pe = params["position_embedding"].reshape(
            self.pos_grid, self.pos_grid, -1)
        if self.pos_grid != g:
            pe = jax.image.resize(pe.astype(jnp.float32),
                                  (g, g, pe.shape[-1]), "bilinear")
        x = x + pe.reshape(1, g * g, -1).astype(x.dtype)

        rd = self.head_dim // 2
        cos, sin = _rope_2d(g, rd)
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _rms_norm(x, lp["norm1"], self.eps)
            qkv = _dense(h, lp["qkv"]).reshape(b, t, 3, nh, hd)
            q, k, v = (qkv[:, :, 0].astype(jnp.float32),
                       qkv[:, :, 1].astype(jnp.float32), qkv[:, :, 2])
            if self.qk_norm:
                q = _rms_norm(q, lp["q_norm"], self.eps)
                k = _rms_norm(k, lp["k_norm"], self.eps)
            q = jnp.concatenate(
                [_apply_rope_half(q[..., :rd], cos, sin), q[..., rd:]], -1)
            k = jnp.concatenate(
                [_apply_rope_half(k[..., :rd], cos, sin), k[..., rd:]], -1)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs,
                             v.astype(jnp.float32))
            x = res + _dense(ctx.reshape(b, t, -1).astype(x.dtype),
                             lp["proj"])
            res = x
            h = _rms_norm(x, lp["norm2"], self.eps)
            gu = _dense(h, lp["gate_up_proj"])
            gate, up = jnp.split(gu, 2, axis=-1)
            x = res + _dense(jax.nn.silu(gate) * up, lp["down_proj"])

        x = _rms_norm(x, params["post_layernorm"], self.eps)
        # downsample: conv(kernel=m, stride=m) over merge blocks
        m = self.merge_size
        h_ = self.hidden_size
        x = x.reshape(b, g // m, m, g // m, m, h_).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (g // m) ** 2, m * m * h_)
        x = _dense(x, params["downsample"])
        # merger: proj -> LN -> gelu -> SwiGLU (glm4_1v.rs:445-452)
        mp = params["merger"]
        x = _dense(x, mp["proj"])
        x = jax.nn.gelu(_layer_norm(x, mp["post_projection_norm"], 1e-6),
                        approximate=False)
        gu = _dense(x, mp["gate_up_proj"])
        gate, up = jnp.split(gu, 2, axis=-1)
        return _dense(jax.nn.silu(gate) * up, mp["down_proj"])

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            if name == "patch_embed.proj.weight":
                h = a.shape[0]
                tp, ps = self.temporal_patch_size, self.patch_size
                if a.ndim == 2:
                    a = a.reshape(h, 3, tp, ps, ps)
                w = a.transpose(2, 3, 4, 1, 0).reshape(tp, -1, h)
                params["patch_embed"]["weight"] = jnp.asarray(
                    w.reshape(-1, h), self.dtype)
            elif name == "patch_embed.proj.bias":
                params["patch_embed"]["bias"] = jnp.asarray(a, self.dtype)
            elif name in ("post_conv_layernorm.weight",
                          "post_layernorm.weight"):
                params[parts[0]] = jnp.asarray(a, self.dtype)
            elif name == "embeddings.position_embedding.weight":
                params["position_embedding"] = jnp.asarray(a, self.dtype)
            elif name.startswith("downsample."):
                if parts[-1] == "weight":
                    # conv [out, c, m, m] -> dense [(m, m, c) -> out]
                    params["downsample"]["weight"] = jnp.asarray(
                        a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                        self.dtype)
                else:
                    params["downsample"]["bias"] = jnp.asarray(a, self.dtype)
            elif name.startswith("merger."):
                if parts[1] in ("gate_proj", "up_proj"):
                    # HF ships split gate/up; fused here (gate | up)
                    node = params["merger"]["gate_up_proj"]
                    half = node["weight"].shape[1] // 2
                    off = 0 if parts[1] == "gate_proj" else half
                    node["weight"] = (
                        node["weight"]
                        .at[:, off : off + half]
                        .set(jnp.asarray(a.T, self.dtype))
                    )
                else:
                    node = params["merger"][parts[1]]
                    if parts[1] == "post_projection_norm":
                        node[parts[-1]] = jnp.asarray(a, self.dtype)
                    else:
                        node["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("blocks."):
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                if sub in ("norm1", "norm2"):
                    lp[sub] = jnp.asarray(a, self.dtype)
                elif sub == "attn":
                    if parts[3] in ("q_norm", "k_norm"):
                        lp[parts[3]] = jnp.asarray(a, self.dtype)
                    else:
                        lp[parts[3]][parts[-1]] = jnp.asarray(
                            a.T if parts[-1] == "weight" else a, self.dtype)
                elif sub == "mlp":
                    pname = parts[3]
                    if pname in ("gate_proj", "up_proj"):
                        # HF ships split gate/up; our tower fuses them
                        # into gate_up_proj [h, 2*mlp_dim] (gate | up)
                        node = lp["gate_up_proj"]
                        half = node["weight"].shape[1] // 2
                        off = 0 if pname == "gate_proj" else half
                        if parts[-1] == "weight":
                            node["weight"] = (
                                node["weight"]
                                .at[:, off : off + half]
                                .set(jnp.asarray(a.T, self.dtype))
                            )
                        else:
                            node.setdefault(
                                "bias",
                                jnp.zeros(
                                    (node["weight"].shape[1],), self.dtype
                                ),
                            )
                            node["bias"] = (
                                node["bias"]
                                .at[off : off + half]
                                .set(jnp.asarray(a, self.dtype))
                            )
                    else:
                        lp[pname][parts[-1]] = jnp.asarray(
                            a.T if parts[-1] == "weight" else a, self.dtype)
        return params


class Glm4vForConditionalGeneration(VlmBase):
    """GLM-4.1V / GLM-4V (reference models/glm4_1v.rs): GLM-4.1V ViT +
    Glm4ForCausalLM. The reference serves the legacy GLM-4V-9B strings
    through an EVA2-CLIP tower (glm4v.rs); here all GLM-4V strings run
    the 4.1V tower (the checkpoints the registry routes here are the
    4.1V family)."""

    _text_arch = "Glm4ForCausalLM"

    def _build(self, ex: dict):
        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, self._text_arch)
        else:
            import dataclasses

            from . import from_config

            self.text_config = dataclasses.replace(
                self.config, architectures=[self._text_arch]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = Glm41VisionTower(dict(ex.get("vision_config", {})),
                                       dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 151363))
        self.tokens_per_image = self.vision.merged_patches

    def _init_projector(self, rng, scale):
        return {}  # merger lives inside the tower

    def _load_projector(self, raw):
        return {}

    def _route_weight(self, name: str):
        for p in ("model.visual.", "visual."):
            if name.startswith(p):
                return "vision", name.removeprefix(p)
        if name.startswith("model.language_model."):
            return "lm", "model." + name.removeprefix("model.language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision(params["vision_tower"], pixel_values)
        return x.reshape(-1, x.shape[-1])


class Glm4vMoeForConditionalGeneration(Glm4vForConditionalGeneration):
    """GLM-4.5V (reference registry Glm4vMoeForConditionalGeneration):
    the 4.1V vision stack over the GLM-4.5 MoE text backbone."""

    _text_arch = "Glm4MoeForCausalLM"


# -- Keye-VL ---------------------------------------------------------------------


class KeyeVL1_5ForConditionalGeneration(VlmBase):
    """Keye-VL 1.5 (reference models/keye_vl.rs): SigLIP-layout vision
    transformer + `mlp_AR` projector (2×2 spatial merge → LayerNorm →
    linear_1 → GELU → linear_2) into Qwen3. The reference replaces the
    SigLIP fixed positions with 2-D rope; at the fixed preprocessor grid
    the learned position embedding table is used directly (documented
    divergence)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Qwen3ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 151655))
        self.merge = 2
        self.tokens_per_image = self.vision.num_patches // (self.merge**2)

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        md = hv * self.merge**2
        ht = self.text_config.hidden_size
        return {
            "pre_norm": {"weight": jnp.ones((md,), self.dtype),
                         "bias": jnp.zeros((md,), self.dtype)},
            "linear_1": {"weight": self._w(rng, (md, md), scale),
                         "bias": jnp.zeros((md,), self.dtype)},
            "linear_2": {"weight": self._w(rng, (md, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("visual.vision_model."):
            return "vision", name.removeprefix("visual.")
        if name.startswith("mlp_AR."):
            return "proj", name.removeprefix("mlp_AR.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, hv = feats.shape
        g = int(n**0.5)
        m = self.merge
        x = feats.reshape(b, g // m, m, g // m, m, hv)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // m) ** 2,
                                                  m * m * hv)
        p = params["projector"]
        x = _layer_norm(x, p["pre_norm"], 1e-5)
        x = jax.nn.gelu(_dense(x, p["linear_1"]), approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# -- AyaVision / Cohere2Vision -----------------------------------------------------


class AyaVisionForConditionalGeneration(VlmBase):
    """AyaVision (reference models/aya_vision.rs): SigLIP tower → pixel
    shuffle (downsample_factor) → [LayerNorm] → linear_1 → SwiGLU →
    linear_2 → Cohere text model. Cohere2Vision omits the LayerNorm."""

    use_layernorm = True
    _text_arch = "CohereForCausalLM"

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), self._text_arch)
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 255036))
        self.factor = int(ex.get("downsample_factor", 2))
        self.alignment_inter = int(ex.get(
            "alignment_intermediate_size",
            self.text_config.hidden_size * 4))
        self.tokens_per_image = self.vision.num_patches // (self.factor**2)

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size * self.factor**2
        ht = self.text_config.hidden_size
        ai = self.alignment_inter
        p = {
            "linear_1": {"weight": self._w(rng, (hv, ai), scale),
                         "bias": jnp.zeros((ai,), self.dtype)},
            "linear_2": {"weight": self._w(rng, (ai // 2, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }
        if self.use_layernorm:
            p["layernorm"] = {"weight": jnp.ones((hv,), self.dtype),
                              "bias": jnp.zeros((hv,), self.dtype)}
        return p

    def _route_weight(self, name: str):
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if "vision_tower." in name:
            return "vision", name.split("vision_tower.", 1)[1]
        if "multi_modal_projector." in name:
            return "proj", name.split("multi_modal_projector.", 1)[1]
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, c = feats.shape
        g = int(n**0.5)
        f = self.factor
        # pixel shuffle (aya_vision.rs:160-181)
        x = feats.reshape(b, g, g // f, c * f)
        x = x.transpose(0, 2, 1, 3).reshape(b, g // f, g // f, c * f * f)
        x = x.transpose(0, 2, 1, 3).reshape(b, (g // f) ** 2, -1)
        p = params["projector"]
        if "layernorm" in p:
            x = _layer_norm(x, p["layernorm"], 1e-5)
        hidden = _dense(x, p["linear_1"])
        half = hidden.shape[-1] // 2
        x_part, gate = hidden[..., :half], hidden[..., half:]
        x = jax.nn.silu(gate) * x_part
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


class Cohere2VisionForConditionalGeneration(AyaVisionForConditionalGeneration):
    use_layernorm = False
    _text_arch = "Cohere2ForCausalLM"


# -- Fuyu ------------------------------------------------------------------------


class FuyuForCausalLM(VlmBase):
    """Fuyu (reference models/fuyu.rs): a single linear patch embedding
    (`vision_embed_tokens`, patch_size²·channels → hidden) feeds patches
    straight into the Persimmon decoder — no vision transformer."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "PersimmonForCausalLM")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["PersimmonForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.patch_size = int(ex.get("patch_size", 30))
        self.num_channels = int(ex.get("num_channels", 3))
        self.image_token_index = int(ex.get("image_token_id", 71011))
        img = int(ex.get("image_size", 1080))
        self.grid = img // self.patch_size
        self.tokens_per_image = self.grid * self.grid
        self.vision = None

    def init_params(self, rng=None, scale: float = 0.02):
        if rng is None:
            r1 = r3 = None
        else:
            r1, r3 = jax.random.split(rng, 2)
        return {
            "language_model": self.lm.init_params(r1, scale),
            "projector": self._init_projector(r3, scale),
        }

    def _init_projector(self, rng, scale):
        d_in = self.patch_size**2 * self.num_channels
        h = self.text_config.hidden_size
        return {
            "vision_embed_tokens": {
                "weight": self._w(rng, (d_in, h), scale),
                "bias": jnp.zeros((h,), self.dtype),
            }
        }

    def _route_weight(self, name: str):
        n = name.removeprefix("model.")
        if n.startswith("vision_embed_tokens."):
            return "proj", n
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        return "lm", name

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        lm_stream, proj_raw = [], []
        for name, arr in weights:
            dest, new_name = self._route_weight(name)
            (proj_raw if dest == "proj" else lm_stream).append(
                (new_name, arr))
        params = {
            "language_model": self.lm.load_weights(lm_stream),
            "projector": self._init_projector(None, 0.0),
        }
        for name, arr in proj_raw:
            a = np.asarray(arr)
            leaf = name.rsplit(".", 1)[1]
            params["projector"]["vision_embed_tokens"][leaf] = jnp.asarray(
                a.T if leaf == "weight" else a, self.dtype)
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, 3, H, W] → [B·patches, hidden]."""
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, self.num_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, -1)
        x = _dense(x, params["projector"]["vision_embed_tokens"])
        return x.reshape(-1, x.shape[-1])


def register_vlm_breadth3(registry: dict) -> None:
    registry.update({
        "Qwen3VLForConditionalGeneration": Qwen3VLForConditionalGeneration,
        "Qwen3VLMoeForConditionalGeneration":
            Qwen3VLMoeForConditionalGeneration,
        "Glm4vForConditionalGeneration": Glm4vForConditionalGeneration,
        "Glm4VForConditionalGeneration": Glm4vForConditionalGeneration,
        "GLM4VForCausalLM": Glm4vForConditionalGeneration,
        "Glm4vMoeForConditionalGeneration": Glm4vMoeForConditionalGeneration,
        "KeyeForConditionalGeneration": KeyeVL1_5ForConditionalGeneration,
        "KeyeVL1_5ForConditionalGeneration":
            KeyeVL1_5ForConditionalGeneration,
        "AyaVisionForConditionalGeneration": AyaVisionForConditionalGeneration,
        "Cohere2VisionForConditionalGeneration":
            Cohere2VisionForConditionalGeneration,
        "FuyuForCausalLM": FuyuForCausalLM,
    })
