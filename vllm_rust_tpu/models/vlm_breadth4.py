"""VLM breadth 4: DeepSeek-VL2, Kimi-VL/K2.5, ERNIE-4.5-VL, Eagle2.5-VL,
Bagel, NVLM-D, Dots-OCR, HyperCLOVA-X vision.

Reference: models/{deepseek_vl2.rs, kimi_vl.rs + moonvit.rs, kimi_k25.rs,
ernie45_vl.rs, eagle2_5_vl.rs, bagel.rs, nvlm_d.rs, dots_ocr.rs,
hyperclovax_vision.rs}. Fixed preprocessor grid as in vlm_breadth.py.
"""

from __future__ import annotations

import math
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .vision import CLIPVisionTower, SiglipVisionTower, _dense, _layer_norm
from .vlm_breadth import (
    InternVLChatModel,
    VlmBase,
    _apply_rope_half,
    _rms_norm,
    _rope_2d,
)


# -- DeepSeek-VL2 ----------------------------------------------------------------


class DeepseekVL2ForConditionalGeneration(VlmBase):
    """DeepSeek-VL2 (reference models/deepseek_vl2.rs): SigLIP tower →
    2×2 patch grouping → downsample MLP projector (`projector.layers.0`
    linear → GELU → `layers.2` linear) → DeepSeek V2/V3 MoE text."""

    def _build(self, ex: dict):
        lc = ex.get("language_config", ex.get("text_config", {}))
        self._make_text_model(lc, "DeepseekV2ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(
            ex.get("image_token_index", ex.get("image_token_id", 100015)))
        pc = ex.get("projector_config") or {}
        self.ratio = int(pc.get("downsample_ratio", 2))
        self.proj_inter = int(pc.get("depth", 2)) and int(
            pc.get("intermediate_size",
                   self.vision.hidden_size * self.ratio**2))
        self.tokens_per_image = self.vision.num_patches // (self.ratio**2)

    def _init_projector(self, rng, scale):
        d_in = self.vision.hidden_size * self.ratio**2
        ht = self.text_config.hidden_size
        return {
            "layers_0": {"weight": self._w(rng, (d_in, self.proj_inter),
                                           scale),
                         "bias": jnp.zeros((self.proj_inter,), self.dtype)},
            "layers_2": {"weight": self._w(rng, (self.proj_inter, ht),
                                           scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision."):
            return "vision", name.removeprefix("vision.")
        if name.startswith("vision_model."):
            return "vision", name
        if name.startswith("projector.layers."):
            idx = name.split(".")[2]
            return "proj", f"layers_{idx}." + name.rsplit(".", 1)[1]
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            slot, leaf = name.split(".")
            a = np.asarray(arr)
            proj[slot][leaf] = jnp.asarray(
                a.T if leaf == "weight" else a, self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, h = feats.shape
        g = int(n**0.5)
        r = self.ratio
        x = feats.reshape(b, g // r, r, g // r, r, h)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // r) ** 2,
                                                  r * r * h)
        p = params["projector"]
        x = jax.nn.gelu(_dense(x, p["layers_0"]), approximate=False)
        x = _dense(x, p["layers_2"])
        return x.reshape(-1, x.shape[-1])


# -- Kimi-VL (MoonViT) -------------------------------------------------------------


class MoonVitTower:
    """MoonViT (reference models/moonvit.rs): conv patch embed + learned
    interpolated position embeddings + 2-D rope, pre-norm blocks with
    fused `wqkv`/`wo` attention and `fc0`/`fc1` GELU MLP, final
    layernorm. Fixed preprocessor grid."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 1152))
        self.inter = int(cfg.get("intermediate_size", 4304))
        self.num_layers = int(cfg.get("num_hidden_layers",
                                      cfg.get("depth", 4)))
        self.num_heads = int(cfg.get("num_attention_heads",
                                     cfg.get("num_heads", 16)))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.image_size = int(cfg.get("image_size", 448))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads
        self.pos_grid = int(cfg.get("init_pos_emb_height", self.grid))
        mk = cfg.get("merge_kernel_size") or [2, 2]
        self.merge = int(mk[0])

    @property
    def merged_patches(self) -> int:
        return self.num_patches // (self.merge**2)

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h = self.hidden_size
        n_keys = self.num_layers * 4 + 3
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        def dense(key, din, dout):
            return {"weight": w(key, (din, dout)),
                    "bias": jnp.zeros((dout,), d)}

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "norm0": ln(),
                "norm1": ln(),
                "wqkv": dense(next(keys), h, 3 * h),
                "wo": dense(next(keys), h, h),
                "fc0": dense(next(keys), h, self.inter),
                "fc1": dense(next(keys), self.inter, h),
            })
        return {
            "patch_embed": dense(next(keys),
                                 self.patch_size**2 * 3, h),
            "pos_emb": w(next(keys), (self.pos_grid * self.pos_grid, h)),
            "layers": layers,
            "final_layernorm": ln(),
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embed"])
        pe = params["pos_emb"].reshape(self.pos_grid, self.pos_grid, -1)
        if self.pos_grid != g:
            pe = jax.image.resize(pe.astype(jnp.float32),
                                  (g, g, pe.shape[-1]), "bilinear")
        x = x + pe.reshape(1, g * g, -1).astype(x.dtype)

        cos, sin = _rope_2d(g, self.head_dim)
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["norm0"], 1e-5)
            qkv = _dense(h, lp["wqkv"]).reshape(b, t, 3, nh, hd)
            q = _apply_rope_half(qkv[:, :, 0].astype(jnp.float32), cos, sin)
            k = _apply_rope_half(qkv[:, :, 1].astype(jnp.float32), cos, sin)
            v = qkv[:, :, 2].astype(jnp.float32)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v)
            x = res + _dense(ctx.reshape(b, t, -1).astype(x.dtype),
                             lp["wo"])
            res = x
            h = _layer_norm(x, lp["norm1"], 1e-5)
            x = res + _dense(
                jax.nn.gelu(_dense(h, lp["fc0"]), approximate=True),
                lp["fc1"])
        return _layer_norm(x, params["final_layernorm"], 1e-5)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            if name.startswith("patch_embed.proj."):
                leaf = parts[-1]
                if leaf == "weight" and a.ndim == 4:  # conv [h, 3, ps, ps]
                    a = a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0])
                    params["patch_embed"]["weight"] = jnp.asarray(
                        a, self.dtype)
                else:
                    params["patch_embed"][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
            elif name.startswith("patch_embed.pos_emb"):
                params["pos_emb"] = jnp.asarray(
                    a.reshape(-1, a.shape[-1]), self.dtype)
            elif name.startswith("encoder.final_layernorm.") or \
                    name.startswith("final_layernorm."):
                params["final_layernorm"][parts[-1]] = jnp.asarray(
                    a, self.dtype)
            elif ".blocks." in name:
                i = parts.index("blocks")
                lp = params["layers"][int(parts[i + 1])]
                sub = parts[i + 2]
                leaf = parts[-1]
                if sub in ("norm0", "norm1"):
                    lp[sub][leaf] = jnp.asarray(a, self.dtype)
                elif sub in ("wqkv", "wo"):
                    lp[sub][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                elif sub == "mlp":
                    lp[parts[i + 3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class KimiVLForConditionalGeneration(VlmBase):
    """Kimi-VL (reference models/kimi_vl.rs): MoonViT tower + projector
    (per-patch LayerNorm → 2×2 flatten → linear_1 → GELU → linear_2) →
    DeepSeek V2/V3 text. KimiK25 serves the same image path (the
    reference adds a 3-D video tower variant, kimi_k25.rs)."""

    def _build(self, ex: dict):
        tc = ex.get("text_config", {})
        self._make_text_model(tc, "DeepseekV2ForCausalLM")
        self.vision = MoonVitTower(dict(ex.get("vision_config", {})),
                                   dtype=self.dtype)
        self.image_token_index = int(
            ex.get("media_placeholder_token_id",
                   ex.get("image_token_id", 163605)))
        self.tokens_per_image = self.vision.merged_patches

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        m = self.vision.merge
        flat = hv * m * m
        ht = self.text_config.hidden_size
        return {
            "pre_norm": {"weight": jnp.ones((hv,), self.dtype),
                         "bias": jnp.zeros((hv,), self.dtype)},
            "linear_1": {"weight": self._w(rng, (flat, flat), scale),
                         "bias": jnp.zeros((flat,), self.dtype)},
            "linear_2": {"weight": self._w(rng, (flat, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_tower."):
            return "vision", name.removeprefix("vision_tower.")
        if name.startswith("multi_modal_projector."):
            return "proj", name.removeprefix("multi_modal_projector.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        x = _layer_norm(feats, p["pre_norm"], 1e-5)  # per patch
        b, n, hv = x.shape
        g = int(n**0.5)
        m = self.vision.merge
        x = x.reshape(b, g // m, m, g // m, m, hv)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // m) ** 2,
                                                  m * m * hv)
        x = jax.nn.gelu(_dense(x, p["linear_1"]), approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# -- ERNIE-4.5-VL ------------------------------------------------------------------


class Ernie45VLVisionTower:
    """ERNIE-4.5-VL ViT (reference ernie45_vl.rs): linear patch embed,
    half-dim 2-D rope, pre-norm LayerNorm blocks with fused qkv and
    fc1/fc2 GELU MLP, final LayerNorm."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size",
                                       cfg.get("embed_dim", 1280)))
        mlp_ratio = float(cfg.get("mlp_ratio", 4.0))
        self.inter = int(cfg.get("intermediate_size",
                                 self.hidden_size * mlp_ratio))
        self.num_layers = int(cfg.get("depth",
                                      cfg.get("num_hidden_layers", 4)))
        self.num_heads = int(cfg.get("num_heads",
                                     cfg.get("num_attention_heads", 16)))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.image_size = int(cfg.get("image_size", 448))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h = self.hidden_size
        n_keys = self.num_layers * 4 + 2
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        def dense(key, din, dout):
            return {"weight": w(key, (din, dout)),
                    "bias": jnp.zeros((dout,), d)}

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "norm1": ln(),
                "norm2": ln(),
                "qkv": dense(next(keys), h, 3 * h),
                "proj": dense(next(keys), h, h),
                "fc1": dense(next(keys), h, self.inter),
                "fc2": dense(next(keys), self.inter, h),
            })
        return {
            "patch_embed": {"weight": w(next(keys),
                                        (self.patch_size**2 * 3, h))},
            "layers": layers,
            "ln": ln(),
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embed"])
        rd = self.head_dim // 2
        cos, sin = _rope_2d(g, rd)
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["norm1"], 1e-6)
            qkv = _dense(h, lp["qkv"]).reshape(b, t, 3, nh, hd)
            q = qkv[:, :, 0].astype(jnp.float32)
            k = qkv[:, :, 1].astype(jnp.float32)
            v = qkv[:, :, 2].astype(jnp.float32)
            q = jnp.concatenate(
                [_apply_rope_half(q[..., :rd], cos, sin), q[..., rd:]], -1)
            k = jnp.concatenate(
                [_apply_rope_half(k[..., :rd], cos, sin), k[..., rd:]], -1)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v)
            x = res + _dense(ctx.reshape(b, t, -1).astype(x.dtype),
                             lp["proj"])
            res = x
            h = _layer_norm(x, lp["norm2"], 1e-6)
            x = res + _dense(
                jax.nn.gelu(_dense(h, lp["fc1"]), approximate=False),
                lp["fc2"])
        return _layer_norm(x, params["ln"], 1e-6)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            if name.startswith("patch_embed."):
                if parts[-1] == "weight":
                    if a.ndim == 4:
                        a = a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0])
                    else:
                        a = a.T
                    params["patch_embed"]["weight"] = jnp.asarray(
                        a, self.dtype)
            elif name.startswith("ln."):
                params["ln"][parts[-1]] = jnp.asarray(a, self.dtype)
            elif name.startswith("blocks."):
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                leaf = parts[-1]
                if sub in ("norm1", "norm2"):
                    lp[sub][leaf] = jnp.asarray(a, self.dtype)
                elif sub in ("attn", "mlp"):
                    lp[parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class Ernie45VLMoeForConditionalGeneration(VlmBase):
    """ERNIE-4.5-VL (reference models/ernie45_vl.rs): ERNIE ViT +
    variable-resolution resampler (2×2 spatial grouping → linear → GELU
    → linear → LayerNorm → projection → RMSNorm) into the ERNIE-4.5 MoE
    text model (text weights at the checkpoint root)."""

    _text_arch = "Ernie4_5_MoeForCausalLM"

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, self._text_arch)
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=[self._text_arch]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = Ernie45VLVisionTower(
            dict(ex.get("vision_config", {})), dtype=self.dtype)
        self.image_token_index = int(ex.get("im_patch_id",
                                            ex.get("image_token_id",
                                                   100295)))
        self.conv = int(ex.get("spatial_conv_size", 2))
        self.tokens_per_image = self.vision.num_patches // (self.conv**2)

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        sd = hv * self.conv**2
        ht = self.text_config.hidden_size
        return {
            "spatial_linear1": {"weight": self._w(rng, (sd, sd), scale),
                                "bias": jnp.zeros((sd,), self.dtype)},
            "spatial_linear2": {"weight": self._w(rng, (sd, sd), scale),
                                "bias": jnp.zeros((sd,), self.dtype)},
            "spatial_norm": {"weight": jnp.ones((sd,), self.dtype),
                             "bias": jnp.zeros((sd,), self.dtype)},
            "mlp": {"weight": self._w(rng, (sd, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
            "after_norm": jnp.ones((ht,), self.dtype),
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_model."):
            return "vision", name.removeprefix("vision_model.")
        if name.startswith("model.resampler_model."):
            return "proj", name.removeprefix("model.resampler_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        slot_map = {"spatial_linear.0": "spatial_linear1",
                    "spatial_linear.2": "spatial_linear2",
                    "spatial_linear.3": "spatial_norm"}
        for name, arr in raw:
            a = np.asarray(arr)
            leaf = name.rsplit(".", 1)[1]
            stem = name.rsplit(".", 1)[0]
            if stem in slot_map:
                key = slot_map[stem]
                proj[key][leaf] = jnp.asarray(
                    a.T if leaf == "weight" and key != "spatial_norm" else a,
                    self.dtype)
            elif stem == "mlp":
                proj["mlp"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
            elif stem == "after_norm":
                proj["after_norm"] = jnp.asarray(a, self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, hv = feats.shape
        g = int(n**0.5)
        m = self.conv
        x = feats.reshape(b, g // m, m, g // m, m, hv)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // m) ** 2,
                                                  m * m * hv)
        p = params["projector"]
        x = jax.nn.gelu(_dense(x, p["spatial_linear1"]), approximate=False)
        x = _dense(x, p["spatial_linear2"])
        x = _layer_norm(x, p["spatial_norm"], 1e-6)
        x = _dense(x, p["mlp"])
        x = _rms_norm(x, p["after_norm"],
                      self.text_config.rms_norm_eps)
        return x.reshape(-1, x.shape[-1])


# -- Eagle2.5-VL ------------------------------------------------------------------


class Eagle2_5_VLForConditionalGeneration(VlmBase):
    """Eagle2.5-VL (reference models/eagle2_5_vl.rs): SigLIP tower +
    pixel shuffle + mlp1 (LayerNorm `0` → linear `1` → GELU → linear
    `3`) + llama-compatible text model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Qwen2ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.downsample = float(ex.get("downsample_ratio", 0.5))
        self.image_token_index = int(ex.get("img_context_token_id",
                                            ex.get("image_token_index",
                                                   151667)))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.shuffle = max(1, int(round(1.0 / self.downsample)))
        self.tokens_per_image = (g // self.shuffle) ** 2

    def _init_projector(self, rng, scale):
        h_v = self.vision.hidden_size * self.shuffle**2
        h_t = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "norm": {"weight": jnp.ones((h_v,), self.dtype),
                     "bias": jnp.zeros((h_v,), self.dtype)},
            "fc1": {"weight": self._w(r1, (h_v, h_t), scale),
                    "bias": jnp.zeros((h_t,), self.dtype)},
            "fc2": {"weight": self._w(r2, (h_t, h_t), scale),
                    "bias": jnp.zeros((h_t,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_model."):
            return "vision", name
        if name.startswith("mlp1."):
            idx, leaf = name.split(".")[1], name.split(".")[2]
            dest = {"0": "norm", "1": "fc1", "3": "fc2"}.get(idx)
            if dest:
                return "proj", f"{dest}.{leaf}"
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, h = feats.shape
        g, s = self.grid, self.shuffle
        x = feats.reshape(b, g // s, s, g // s, s, h)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // s) ** 2,
                                                  s * s * h)
        p = params["projector"]
        x = _layer_norm(x, p["norm"], 1e-6)
        x = jax.nn.gelu(_dense(x, p["fc1"]), approximate=False)
        return _dense(x, p["fc2"]).reshape(-1,
                                           self.text_config.hidden_size)


# -- Bagel -----------------------------------------------------------------------


class BagelForConditionalGeneration(VlmBase):
    """Bagel (reference models/bagel.rs): SigLIP tower + MLP connector
    (fc1 → gelu_tanh → fc2) + computed 2-D sin-cos position embeddings
    added after the connector, Qwen2 text model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config",
                                     ex.get("llm_config", {})),
                              "Qwen2ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 151654))
        self.tokens_per_image = self.vision.num_patches

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "fc1": {"weight": self._w(r1, (hv, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
            "fc2": {"weight": self._w(r2, (ht, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if "vision_tower." in name or name.startswith("vit_model."):
            return "vision", name.split("vision_tower.", 1)[-1] \
                if "vision_tower." in name else name.removeprefix(
                    "vit_model.")
        if name.startswith("connector."):
            return "proj", name.removeprefix("connector.")
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    @staticmethod
    def _sincos_2d(grid: int, dim: int) -> jax.Array:
        """2-D sin-cos position embedding [grid², dim] (bagel.rs:136)."""
        half = dim // 2

        def axis(pos):
            omega = 1.0 / (10000.0 ** (
                jnp.arange(half // 2, dtype=jnp.float32) / (half // 2)))
            out = pos[:, None] * omega[None, :]
            return jnp.concatenate([jnp.sin(out), jnp.cos(out)], -1)

        pos = jnp.arange(grid, dtype=jnp.float32)
        eh = axis(pos)  # [g, half]
        h_emb = jnp.repeat(eh[:, None, :], grid, axis=1)
        w_emb = jnp.repeat(eh[None, :, :], grid, axis=0)
        return jnp.concatenate([h_emb, w_emb], -1).reshape(grid * grid, dim)

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        x = jax.nn.gelu(_dense(feats, p["fc1"]), approximate=True)
        x = _dense(x, p["fc2"])
        g = int(x.shape[1] ** 0.5)
        x = x + self._sincos_2d(g, x.shape[-1])[None].astype(x.dtype)
        return x.reshape(-1, x.shape[-1])


# -- NVLM-D ----------------------------------------------------------------------


class NVLM_D_Model(InternVLChatModel):
    """NVLM-D (reference models/nvlm_d.rs): InternVL2 with the mlp1
    projector routed through llm_intermediate_size with no-bias
    linears."""

    def _init_projector(self, rng, scale):
        h_v = self.vision.hidden_size * self.shuffle**2
        ex = self.config.extra
        inter = int(ex.get("llm_intermediate_size",
                           self.text_config.intermediate_size))
        h_t = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "norm": {"weight": jnp.ones((h_v,), self.dtype),
                     "bias": jnp.zeros((h_v,), self.dtype)},
            "fc1": {"weight": self._w(r1, (h_v, inter), scale)},
            "fc2": {"weight": self._w(r2, (inter, h_t), scale)},
        }


# -- Dots-OCR --------------------------------------------------------------------


class DotsVisionTower:
    """Dots-OCR ViT (reference models/dots_ocr.rs): conv patch embed
    (`patch_embed.patchifier`), RMSNorm blocks with biased fused qkv and
    SwiGLU fc1/fc3/fc2 MLP, 2-D rope, post_trunk_norm, Qwen-style
    merger (ln_q + mlp.0/mlp.2)."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("embed_dim",
                                       cfg.get("hidden_size", 1536)))
        self.out_hidden = int(cfg.get("hidden_size", 1536))
        self.inter = int(cfg.get("intermediate_size", 4224))
        self.num_layers = int(cfg.get("num_hidden_layers", 4))
        self.num_heads = int(cfg.get("num_attention_heads", 12))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.merge = int(cfg.get("spatial_merge_size", 2))
        self.image_size = int(cfg.get("image_size", 448))
        self.eps = float(cfg.get("rms_norm_eps", 1e-5))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads

    @property
    def merged_patches(self) -> int:
        return self.num_patches // (self.merge**2)

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h = self.hidden_size
        n_keys = self.num_layers * 5 + 4
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        def dense(key, din, dout, bias=True):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "norm1": jnp.ones((h,), d),
                "norm2": jnp.ones((h,), d),
                "qkv": dense(next(keys), h, 3 * h),
                "proj": dense(next(keys), h, h),
                "fc1": dense(next(keys), h, self.inter),
                "fc3": dense(next(keys), h, self.inter),
                "fc2": dense(next(keys), self.inter, h),
            })
        m = self.merge**2
        return {
            "patch_embed": dense(next(keys), self.patch_size**2 * 3, h),
            "layers": layers,
            "post_trunk_norm": jnp.ones((h,), d),
            "merger_ln_q": {"weight": jnp.ones((h,), d),
                            "bias": jnp.zeros((h,), d)},
            "merger_fc1": dense(next(keys), h * m, h * m),
            "merger_fc2": dense(next(keys), h * m, self.out_hidden),
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embed"])
        cos, sin = _rope_2d(g, self.head_dim)
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _rms_norm(x, lp["norm1"], self.eps)
            qkv = _dense(h, lp["qkv"]).reshape(b, t, 3, nh, hd)
            q = _apply_rope_half(qkv[:, :, 0].astype(jnp.float32), cos, sin)
            k = _apply_rope_half(qkv[:, :, 1].astype(jnp.float32), cos, sin)
            v = qkv[:, :, 2].astype(jnp.float32)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v)
            x = res + _dense(ctx.reshape(b, t, -1).astype(x.dtype),
                             lp["proj"])
            res = x
            h = _rms_norm(x, lp["norm2"], self.eps)
            x = res + _dense(jax.nn.silu(_dense(h, lp["fc1"]))
                             * _dense(h, lp["fc3"]), lp["fc2"])
        x = _rms_norm(x, params["post_trunk_norm"], self.eps)
        m = self.merge
        h_ = self.hidden_size
        x = _layer_norm(x, params["merger_ln_q"], 1e-6)
        x = x.reshape(b, g // m, m, g // m, m, h_).transpose(
            0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (g // m) ** 2, m * m * h_)
        return _dense(jax.nn.gelu(_dense(x, params["merger_fc1"])),
                      params["merger_fc2"])

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            if name.startswith("patch_embed.patchifier."):
                leaf = parts[-1]
                if leaf == "weight" and a.ndim == 4:
                    a = a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0])
                    params["patch_embed"]["weight"] = jnp.asarray(
                        a, self.dtype)
                else:
                    params["patch_embed"][leaf] = jnp.asarray(
                        a.T if leaf == "weight" and a.ndim == 2 else a,
                        self.dtype)
            elif name == "post_trunk_norm.weight":
                params["post_trunk_norm"] = jnp.asarray(a, self.dtype)
            elif name.startswith("merger.ln_q."):
                params["merger_ln_q"][parts[-1]] = jnp.asarray(a, self.dtype)
            elif name.startswith("merger.mlp."):
                dest = "merger_fc1" if parts[2] == "0" else "merger_fc2"
                params[dest][parts[-1]] = jnp.asarray(
                    a.T if parts[-1] == "weight" else a, self.dtype)
            elif name.startswith("blocks."):
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                leaf = parts[-1]
                if sub in ("norm1", "norm2"):
                    lp[sub] = jnp.asarray(a, self.dtype)
                elif sub in ("attn", "mlp"):
                    lp[parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class DotsOCRForCausalLM(VlmBase):
    """Dots-OCR (reference models/dots_ocr.rs): Dots ViT at
    `vision_tower.*` + Qwen2 text at standard HF paths."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "Qwen2ForCausalLM")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["Qwen2ForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = DotsVisionTower(dict(ex.get("vision_config", {})),
                                      dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 151665))
        self.tokens_per_image = self.vision.merged_patches

    def _init_projector(self, rng, scale):
        return {}

    def _load_projector(self, raw):
        return {}

    def _route_weight(self, name: str):
        if name.startswith("vision_tower."):
            return "vision", name.removeprefix("vision_tower.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision(params["vision_tower"], pixel_values)
        return x.reshape(-1, x.shape[-1])


# -- HyperCLOVA-X vision ------------------------------------------------------------


class HCXVisionForCausalLM(VlmBase):
    """HyperCLOVA-X vision (reference models/hyperclovax_vision.rs):
    CLIP/SigLIP tower + configurable `mm_projector` (linear | mlp |
    inverted_mlp; the C-Abstractor variant falls back to mlp with a
    documented divergence) + llama-style text model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "LlamaForCausalLM")
        vc = dict(ex.get("vision_config", {}))
        tower = (CLIPVisionTower
                 if "clip" in str(vc.get("model_type", "clip"))
                 else SiglipVisionTower)
        self.vision = tower(vc, dtype=self.dtype)
        self.proj_type = str(ex.get("mm_projector_type", "mlp"))
        self.image_token_index = int(ex.get("image_token_index",
                                            ex.get("img_start_id", 100009)))
        self.tokens_per_image = self.vision.num_patches

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        if self.proj_type == "linear":
            return {"fc1": {"weight": self._w(r1, (hv, ht), scale),
                            "bias": jnp.zeros((ht,), self.dtype)}}
        hidden = 2 * ht if self.proj_type == "inverted_mlp" else ht
        return {
            "fc1": {"weight": self._w(r1, (hv, hidden), scale),
                    "bias": jnp.zeros((hidden,), self.dtype)},
            "fc2": {"weight": self._w(r2, (hidden, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if "vision_model." in name:
            return "vision", name.split("vision_model.", 1)[1]
        if name.startswith("mm_projector."):
            parts = name.split(".")
            slot = {"0": "fc1", "2": "fc2"}.get(parts[1], parts[1])
            return "proj", f"{slot}.{parts[-1]}"
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        if self.vision.use_class_token:
            feats = feats[:, 1:]
        p = params["projector"]
        x = _dense(feats, p["fc1"])
        if "fc2" in p:
            x = _dense(jax.nn.gelu(x, approximate=False), p["fc2"])
        return x.reshape(-1, x.shape[-1])


def register_vlm_breadth4(registry: dict) -> None:
    registry.update({
        "DeepseekVLV2ForCausalLM": DeepseekVL2ForConditionalGeneration,
        "DeepSeekVLV2ForCausalLM": DeepseekVL2ForConditionalGeneration,
        "DeepseekVLV2ForConditionalGeneration":
            DeepseekVL2ForConditionalGeneration,
        "KimiVLForConditionalGeneration": KimiVLForConditionalGeneration,
        "KimiK25ForConditionalGeneration": KimiVLForConditionalGeneration,
        "Ernie4_5_VLMoeForConditionalGeneration":
            Ernie45VLMoeForConditionalGeneration,
        "Ernie4_5_VLMoeForCausalLM": Ernie45VLMoeForConditionalGeneration,
        "Ernie4_5_VLForConditionalGeneration":
            Ernie45VLMoeForConditionalGeneration,
        "Eagle2_5_VLForConditionalGeneration":
            Eagle2_5_VLForConditionalGeneration,
        "BagelForConditionalGeneration": BagelForConditionalGeneration,
        "NVLM_D_Model": NVLM_D_Model,
        "DotsOCRForCausalLM": DotsOCRForCausalLM,
        "HCXVisionForCausalLM": HCXVisionForCausalLM,
    })
