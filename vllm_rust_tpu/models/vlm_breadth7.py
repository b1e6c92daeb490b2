"""VLM breadth 7 — the final registry tail: Ovis/Ovis2.5 (soft visual
tokenizer), Molmo2, KananaV, OpenPangu-VL, MiniMax-VL-01, Nemotron VLs
(Radio tower family), JinaVL ranking, InternS1-Pro (FoPE), DeepSeek-OCR.

Reference files: crates/core/src/models/{ovis,ovis2_5,molmo2,kanana_v,
openpangu_vl,minimax_vl_01,nemotron_vl,nano_nemotron_vl,jina_vl,
interns1_pro,deepseek_ocr,deepseek_ocr2}.rs.

Round-1 documented divergences (reduced, not wrong — same I/O contract):
- Ovis v1's AIMv2 trunk is implemented natively (RMSNorm + SwiGLU,
  no CLS); Ovis2.5's SigLIP-2 NaViT packing is served by the fixed-grid
  SigLIP tower.
- KananaV's RegNet conv stages (s1/s2) are reduced to dense blocks
  around the same PatchMerge; readout MLP is exact.
- OpenPangu-VL's multi-intermediate-merger sum is reduced to the final
  layer merger + vision_projection.
- Radio ViT (Nemotron VLs) is served by the CLIP-topology tower; the
  pixel-shuffle + projector stacks are exact.
- DeepSeek-OCR's dual SAM+CLIP encoder is reduced to a single CLIP
  tower + the documented MLP projector.
- InternS1-Pro implements the shared-coefficient FoPE variant
  (fope_sep_head per-head tables pending).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vision import CLIPVisionTower, SiglipVisionTower, _dense, _layer_norm
from .vlm_breadth import Qwen2VLVisionTower, VlmBase, _rms_norm
from .vlm_breadth3 import Qwen3VLForConditionalGeneration


# ---------------------------------------------------------------------------
# Ovis family — soft visual tokenization (reference ovis.rs / ovis2_5.rs)
# ---------------------------------------------------------------------------


class Aimv2VisionTower:
    """AIMv2 trunk (reference ovis.rs:1-30): linear patch embed +
    RMSNorm + learnable pos embed, blocks of RMSNorm → SDPA → RMSNorm →
    SwiGLU(fc1/fc3/fc2). No CLS token."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 64))
        self.intermediate = int(cfg.get("intermediate_size",
                                        self.hidden_size * 4))
        self.num_layers = int(cfg.get("num_hidden_layers", 2))
        self.num_heads = int(cfg.get("num_attention_heads", 4))
        self.image_size = int(cfg.get("image_size", 28))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.rms_eps = float(cfg.get("rms_norm_eps", 1e-5))

    def init_params(self, rng=None, scale=0.02):
        h, i = self.hidden_size, self.intermediate
        c = [0]

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            c[0] += 1
            return (scale * jax.random.normal(
                jax.random.fold_in(rng, c[0]), shape, jnp.float32
            )).astype(self.dtype)

        pdim = self.patch_size * self.patch_size * 3
        return {
            "patch_embed": {"weight": w((pdim, h)),
                            "bias": jnp.zeros((h,), self.dtype)},
            "patch_norm": jnp.ones((h,), self.dtype),
            "pos_embed": w((self.num_patches, h)),
            "blocks": [
                {
                    "norm1": jnp.ones((h,), self.dtype),
                    "qkv": {"weight": w((h, 3 * h))},
                    "proj": {"weight": w((h, h))},
                    "norm2": jnp.ones((h,), self.dtype),
                    "fc1": {"weight": w((h, i))},
                    "fc3": {"weight": w((h, i))},
                    "fc2": {"weight": w((i, h))},
                }
                for _ in range(self.num_layers)
            ],
            "norm": jnp.ones((h,), self.dtype),
        }

    def load_weights(self, stream):
        params = self.init_params(None)
        for name, arr in stream:
            a = np.asarray(arr)
            n = name.removeprefix("trunk.").removeprefix("vision_model.")
            parts = n.split(".")
            try:
                if n.startswith("preprocessor.patchifier.proj"):
                    if parts[-1] == "weight":
                        params["patch_embed"]["weight"] = jnp.asarray(
                            a.reshape(a.shape[0], -1).T, self.dtype)
                    else:
                        params["patch_embed"]["bias"] = jnp.asarray(
                            a, self.dtype)
                elif "patchifier.norm" in n:
                    params["patch_norm"] = jnp.asarray(a, self.dtype)
                elif "pos_embed" in n:
                    params["pos_embed"] = jnp.asarray(
                        a.reshape(-1, a.shape[-1]), self.dtype)
                elif parts[0] == "blocks":
                    b = params["blocks"][int(parts[1])]
                    leaf = parts[2]
                    if leaf in ("norm_1", "norm1"):
                        b["norm1"] = jnp.asarray(a, self.dtype)
                    elif leaf in ("norm_2", "norm2"):
                        b["norm2"] = jnp.asarray(a, self.dtype)
                    elif leaf == "attn":
                        sub = parts[3]
                        if sub == "qkv":
                            b["qkv"]["weight"] = jnp.asarray(a.T, self.dtype)
                        elif sub == "proj":
                            b["proj"]["weight"] = jnp.asarray(a.T, self.dtype)
                    elif leaf == "mlp":
                        b[parts[3]]["weight"] = jnp.asarray(a.T, self.dtype)
                elif "post_trunk_norm" in n or parts[0] == "norm":
                    params["norm"] = jnp.asarray(a, self.dtype)
            except (KeyError, IndexError, ValueError):
                continue
        return params

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, H, W] -> [B, num_patches, hidden]."""
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embed"])
        x = _rms_norm(x, params["patch_norm"], self.rms_eps)
        x = x + params["pos_embed"][None]
        nh = self.num_heads
        hd = self.hidden_size // nh
        for blk in params["blocks"]:
            h = _rms_norm(x, blk["norm1"], self.rms_eps)
            qkv = _dense(h, blk["qkv"]).reshape(b, -1, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
            att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(x.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(
                b, -1, self.hidden_size)
            x = x + _dense(o, blk["proj"])
            h = _rms_norm(x, blk["norm2"], self.rms_eps)
            x = x + _dense(
                jax.nn.silu(_dense(h, blk["fc1"])) * _dense(h, blk["fc3"]),
                blk["fc2"],
            )
        return _rms_norm(x, params["norm"], self.rms_eps)


class OvisForConditionalGeneration(VlmBase):
    """Ovis (reference ovis.rs): AIMv2 ViT → VisualTokenizer (hidden-
    stride merge → Linear(D·s², visual_vocab−5) + LayerNorm → softmax,
    padded with 5 zero indicator slots) → soft tokens @ vte
    [visual_vocab, hidden] → Llama/Qwen2 backbone."""

    _tower = "aimv2"

    def _build(self, ex: dict):
        llm_cfg = ex.get("llm_config", ex.get("text_config", {}))
        self._make_text_model(dict(llm_cfg), "Qwen2ForCausalLM")
        vt = dict(ex.get("visual_tokenizer_config", {}))
        vis_cfg = dict(vt.get("backbone_config", ex.get("vision_config", {})))
        if self._tower == "aimv2":
            self.vision = Aimv2VisionTower(vis_cfg, dtype=self.dtype)
        else:
            self.vision = SiglipVisionTower(vis_cfg, dtype=self.dtype)
        self.hidden_stride = int(vt.get("hidden_stride",
                                        ex.get("hidden_stride", 1)))
        self.visual_vocab = int(vt.get("vocab_size",
                                       ex.get("visual_vocab_size", 1024)))
        self.image_token_index = int(ex.get("image_token_index", 151665))
        s = self.hidden_stride
        self.tokens_per_image = self.vision.num_patches // (s * s)

    def _init_projector(self, rng, scale):
        s = self.hidden_stride
        din = self.vision.hidden_size * s * s
        nv = self.visual_vocab
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "head": {"weight": self._w(r1, (din, nv - 5), scale)},
            "head_norm": {"weight": jnp.ones((nv - 5,), self.dtype),
                          "bias": jnp.zeros((nv - 5,), self.dtype)},
            "vte": self._w(r2, (nv, self.text_config.hidden_size), scale),
        }

    def _route_weight(self, name: str):
        if name.startswith(("llm.", "language_model.")):
            return "lm", name.split(".", 1)[1]
        if name.startswith("visual_tokenizer.backbone."):
            return "vision", name.removeprefix("visual_tokenizer.backbone.")
        if name.startswith("visual_tokenizer.vit."):
            return "vision", name.removeprefix("visual_tokenizer.vit.")
        if name.startswith("visual_tokenizer.head."):
            n = name.removeprefix("visual_tokenizer.head.")
            if n.startswith("0."):
                return "proj", "head." + n.split(".", 1)[1]
            return "proj", "head_norm." + n.split(".", 1)[1]
        if name.startswith("vte."):
            return "proj", "vte"
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        if feats.shape[1] == self.vision.num_patches + 1:
            feats = feats[:, 1:]  # CLIP-style CLS drop
        b, n, h = feats.shape
        s = self.hidden_stride
        if s > 1:
            g = int(n**0.5)
            feats = feats.reshape(b, g // s, s, g // s, s, h)
            feats = feats.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, (g // s) ** 2, s * s * h)
        p = params["projector"]
        logits = _dense(feats, p["head"])
        logits = _layer_norm(logits, p["head_norm"], 1e-5)
        soft = jax.nn.softmax(logits.astype(jnp.float32), -1)
        # pad the 5 indicator slots with zero probability (ovis.rs:18)
        soft = jnp.pad(soft, ((0, 0), (0, 0), (0, 5)))
        out = soft.astype(self.dtype) @ p["vte"]
        return out.reshape(-1, out.shape[-1])


class Ovis2_5ForConditionalGeneration(OvisForConditionalGeneration):
    """Ovis2.5 (reference ovis2_5.rs): SigLIP-2 tower (NaViT packing
    served at fixed grid), hidden_stride=2 merge, same soft-token
    pipeline into Qwen2/Qwen3."""

    _tower = "siglip"

    def _build(self, ex: dict):
        super()._build(ex)
        if self.hidden_stride == 1:
            self.hidden_stride = int(ex.get("hidden_stride", 2))
            s = self.hidden_stride
            self.tokens_per_image = self.vision.num_patches // (s * s)


# ---------------------------------------------------------------------------
# Molmo2 (reference molmo2.rs)
# ---------------------------------------------------------------------------


class Molmo2ForConditionalGeneration(VlmBase):
    """Molmo2: SigLIP-based ViT with multi-layer feature extraction
    (VIT_LAYERS -3/-9 concatenated), 2×2 pooling (attention pooling
    served by mean, as in Molmo v1), SiLU-MLP projector, Qwen2-style
    backbone with QK norms (reference molmo2.rs:1-12)."""

    def _build(self, ex: dict):
        text_cfg = dict(ex.get("text_config", {}))
        self._make_text_model(text_cfg, "Qwen3ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id",
                                            ex.get("image_token_index",
                                                   152069)))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.tokens_per_image = (-(-g // 2)) ** 2
        self.vit_layers = tuple(ex.get("vit_layers", (-3, -9)))

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size * len(self.vit_layers)
        ht = self.text_config.hidden_size
        r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None
                      else (None, None, None))
        inter = ht * 2
        return {
            "w1": {"weight": self._w(r1, (hv, inter), scale)},
            "w3": {"weight": self._w(r2, (hv, inter), scale)},
            "w2": {"weight": self._w(r3, (inter, ht), scale)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_backbone.image_vit."):
            return "vision", name.removeprefix("vision_backbone.image_vit.")
        if name.startswith("vision_backbone.image_projector."):
            n = name.removeprefix("vision_backbone.image_projector.")
            return "proj", n
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = [
            self.vision(params["vision_tower"], pixel_values,
                        feature_layer=l)
            for l in self.vit_layers
        ]
        x = jnp.concatenate(feats, axis=-1)
        if x.shape[1] == self.vision.num_patches + 1:
            x = x[:, 1:]
        b, n, hv = x.shape
        g = int(n**0.5)
        x = x.reshape(b, g // 2, 2, g // 2, 2, hv).mean(axis=(2, 4))
        x = x.reshape(b, -1, hv)
        p = params["projector"]
        x = _dense(jax.nn.silu(_dense(x, p["w1"])) * _dense(x, p["w3"]),
                   p["w2"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# KananaV (reference kanana_v.rs)
# ---------------------------------------------------------------------------


class KananaVForConditionalGeneration(VlmBase):
    """Kanana-V: Qwen2-VL ViT + DynamicCAbstractor (RegNet s1 →
    PatchMerge m² → RegNet s2 → readout MLP) + Llama backbone. The
    RegNet conv stages are served by dense blocks at the same widths
    (module doc divergence list)."""

    def _build(self, ex: dict):
        self._make_text_model(dict(ex.get("text_config", {})),
                              "LlamaForCausalLM")
        vc = dict(ex.get("vision_config", {}))
        self.vision = Qwen2VLVisionTower(vc, dtype=self.dtype)
        pc = dict(ex.get("projector_config", {}))
        self.merge = int(pc.get("merge_size", 2))
        self.proj_hidden = int(pc.get("hidden_size",
                                      self.vision.out_hidden))
        self.image_token_index = int(ex.get("image_token_index", 151655))
        self.tokens_per_image = max(
            1, self.vision.merged_patches // (self.merge * self.merge))

    def _init_projector(self, rng, scale):
        hv = self.vision.out_hidden
        hp = self.proj_hidden
        ht = self.text_config.hidden_size
        m = self.merge
        r = (jax.random.split(rng, 4) if rng is not None else [None] * 4)
        return {
            "s1": {"weight": self._w(r[0], (hv, hp), scale),
                   "bias": jnp.zeros((hp,), self.dtype)},
            "s2": {"weight": self._w(r[1], (hp * m * m, hp), scale),
                   "bias": jnp.zeros((hp,), self.dtype)},
            "readout_1": {"weight": self._w(r[2], (hp, ht), scale),
                          "bias": jnp.zeros((ht,), self.dtype)},
            "readout_2": {"weight": self._w(r[3], (ht, ht), scale),
                          "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_model."):
            return "vision", name.removeprefix("vision_model.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith("abstractor."):
            return "proj", name.removeprefix("abstractor.")
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, _ = feats.shape
        p = params["projector"]
        x = jax.nn.gelu(_dense(feats, p["s1"]))
        g = int(n**0.5)
        m = self.merge
        g_use = (g // m) * m
        hp = x.shape[-1]
        x = x[:, : g_use * g_use].reshape(b, g_use, g_use, hp) if g_use * g_use <= n else x.reshape(b, g, g, hp)
        gg = x.shape[1]
        x = x[:, : (gg // m) * m, : (gg // m) * m]
        x = x.reshape(b, gg // m, m, gg // m, m, hp)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, m * m * hp)
        x = jax.nn.gelu(_dense(x, p["s2"]))
        x = _dense(jax.nn.gelu(_dense(x, p["readout_1"])), p["readout_2"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# OpenPangu-VL (reference openpangu_vl.rs)
# ---------------------------------------------------------------------------


class OpenPanguVLForConditionalGeneration(VlmBase):
    """OpenPangu-VL: Qwen2.5-VL-adapted ViT + merger(s) +
    vision_projection linear into PanguEmbeddedForCausalLM. The
    multi-intermediate-merger sum is served by the final-layer merger
    (module doc divergence list)."""

    def _build(self, ex: dict):
        self._make_text_model(dict(ex.get("text_config", {})),
                              "PanguEmbeddedForCausalLM")
        vc = dict(ex.get("vision_config", {}))
        self.vision = Qwen2VLVisionTower(vc, dtype=self.dtype, v25=True)
        self.image_token_index = int(ex.get("image_token_id", 151655))
        self.tokens_per_image = self.vision.merged_patches

    def _init_projector(self, rng, scale):
        return {
            "vision_projection": {
                "weight": self._w(
                    rng,
                    (self.vision.out_hidden, self.text_config.hidden_size),
                    scale,
                )
            }
        }

    def _route_weight(self, name: str):
        if name.startswith(("visual.", "vision_model.")):
            return "vision", name.split(".", 1)[1]
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if name.startswith("vision_projection."):
            return "proj", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        x = _dense(feats, params["projector"]["vision_projection"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# MiniMax-VL-01 (reference minimax_vl_01.rs)
# ---------------------------------------------------------------------------


class MiniMaxVL01ForConditionalGeneration(VlmBase):
    """MiniMax-VL-01: CLIP/SigLIP tower → 2-layer MLP projector (with
    bias) + learnable image_newline → MiniMaxText01 hybrid-lightning
    backbone."""

    def _build(self, ex: dict):
        self._make_text_model(dict(ex.get("text_config", {})),
                              "MiniMaxText01ForCausalLM")
        vc = dict(ex.get("vision_config", {}))
        tower = CLIPVisionTower if vc.get("model_type") == "clip_vision_model" \
            else SiglipVisionTower
        self.vision = tower(vc, dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 200021))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.tokens_per_image = g * g + g  # + one newline per row

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None
                      else (None, None, None))
        return {
            "linear_1": {"weight": self._w(r1, (hv, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
            "linear_2": {"weight": self._w(r2, (ht, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
            "image_newline": self._w(r3, (ht,), scale),
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_tower."):
            return "vision", name.removeprefix("vision_tower.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith("multi_modal_projector."):
            return "proj", name.removeprefix("multi_modal_projector.")
        if name == "image_newline":
            return "proj", "image_newline"
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        if feats.shape[1] == self.vision.num_patches + 1:
            feats = feats[:, 1:]
        p = params["projector"]
        x = _dense(jax.nn.gelu(_dense(feats, p["linear_1"])), p["linear_2"])
        b, n, h = x.shape
        g = int(n**0.5)
        x = x.reshape(b, g, g, h)
        nl = jnp.broadcast_to(p["image_newline"], (b, g, 1, h))
        x = jnp.concatenate([x, nl.astype(x.dtype)], axis=2)
        return x.reshape(-1, h)


# ---------------------------------------------------------------------------
# Nemotron VL family — Radio tower + pixel shuffle (reference
# nemotron_vl.rs / nano_nemotron_vl.rs)
# ---------------------------------------------------------------------------


def _pixel_shuffle_half(feats: jax.Array) -> jax.Array:
    """2×2 spatial downsample by channel stacking (scale_factor=0.5)."""
    b, n, h = feats.shape
    g = int(n**0.5)
    x = feats.reshape(b, g // 2, 2, g // 2, 2, h)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // 2) ** 2, 4 * h)
    return x


class LlamaNemotronVLChatModel(VlmBase):
    """Llama-3.1-Nemotron-Nano-VL: Radio ViT (CLIP-topology tower) +
    pixel-shuffle 0.5 + LayerNorm→Linear→GELU→Linear projector + Llama
    backbone (reference nemotron_vl.rs)."""

    def _build(self, ex: dict):
        llm_cfg = ex.get("llm_config", ex.get("text_config", {}))
        self._make_text_model(dict(llm_cfg), "LlamaForCausalLM")
        self.vision = CLIPVisionTower(dict(ex.get("vision_config", {})),
                                      dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index",
                                            ex.get("img_context_token_id",
                                                   128258)))
        g = int(self.vision.num_patches**0.5)
        self.tokens_per_image = (g // 2) ** 2

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size * 4
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "norm": {"weight": jnp.ones((hv,), self.dtype),
                     "bias": jnp.zeros((hv,), self.dtype)},
            "fc1": {"weight": self._w(r1, (hv, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
            "fc2": {"weight": self._w(r2, (ht, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_model."):
            return "vision", name.removeprefix("vision_model.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith("mlp1."):
            idx, leaf = name.split(".")[1], name.split(".")[2]
            dest = {"0": "norm", "1": "fc1", "3": "fc2"}.get(idx)
            if dest:
                return "proj", f"{dest}.{leaf}"
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        if feats.shape[1] == self.vision.num_patches + 1:
            feats = feats[:, 1:]
        x = _pixel_shuffle_half(feats)
        p = params["projector"]
        x = _layer_norm(x, p["norm"], 1e-5)
        x = _dense(jax.nn.gelu(_dense(x, p["fc1"])), p["fc2"])
        return x.reshape(-1, x.shape[-1])


class NemotronHNanoVLV2(LlamaNemotronVLChatModel):
    """NemotronH_Nano_VL_V2: same Radio tower + pixel shuffle, but the
    projector is RMSNorm → Linear → ReLU² → Linear and the backbone is
    the NemotronH SSM-transformer hybrid (reference
    nano_nemotron_vl.rs)."""

    def _build(self, ex: dict):
        llm_cfg = ex.get("llm_config", ex.get("text_config", {}))
        self._make_text_model(dict(llm_cfg), "NemotronHForCausalLM")
        self.vision = CLIPVisionTower(dict(ex.get("vision_config", {})),
                                      dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 131072))
        g = int(self.vision.num_patches**0.5)
        self.tokens_per_image = (g // 2) ** 2

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size * 4
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "norm": jnp.ones((hv,), self.dtype),
            "fc1": {"weight": self._w(r1, (hv, ht), scale)},
            "fc2": {"weight": self._w(r2, (ht, ht), scale)},
        }

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        if feats.shape[1] == self.vision.num_patches + 1:
            feats = feats[:, 1:]
        x = _pixel_shuffle_half(feats)
        p = params["projector"]
        x = _rms_norm(x, p["norm"], 1e-5)
        x = _dense(x, p["fc1"])
        x = jnp.square(jax.nn.relu(x))
        x = _dense(x, p["fc2"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# JinaVL ranking (reference jina_vl.rs)
# ---------------------------------------------------------------------------


class JinaVLForRanking(VlmBase):
    """Qwen2-VL backbone with the generation head replaced by a scoring
    head (dense[H→H] → ReLU → out_proj[H→1]); last-token pooling
    (reference jina_vl.rs)."""

    is_scoring = True

    def _build(self, ex: dict):
        from .vlm_breadth import Qwen2VLForConditionalGeneration

        self.inner = Qwen2VLForConditionalGeneration(self.config,
                                                     dtype=self.dtype)
        self.lm = self.inner.lm
        self.text_config = self.inner.text_config
        self.vision = self.inner.vision
        self.image_token_index = self.inner.image_token_index
        self.tokens_per_image = self.inner.tokens_per_image
        self.num_labels = int(ex.get("num_labels", 1))

    def _init_projector(self, rng, scale):
        h = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "inner": self.inner._init_projector(r1, scale),
            "score_dense": {"weight": self._w(r1, (h, h), scale),
                            "bias": jnp.zeros((h,), self.dtype)},
            "score_out": {"weight": self._w(r2, (h, self.num_labels), scale),
                          "bias": jnp.zeros((self.num_labels,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("score."):
            n = name.removeprefix("score.")
            if n.startswith(("dense.", "0.")):
                return "proj", "score_dense." + n.split(".", 1)[1]
            return "proj", "score_out." + n.split(".", 1)[1]
        return self.inner._route_weight(name)

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        inner_raw = []
        for name, arr in raw:
            a = np.asarray(arr)
            if name.startswith("score_dense."):
                proj["score_dense"][name.split(".")[1]] = jnp.asarray(
                    a.T if name.endswith("weight") else a, self.dtype)
            elif name.startswith("score_out."):
                proj["score_out"][name.split(".")[1]] = jnp.asarray(
                    a.T if name.endswith("weight") else a, self.dtype)
            else:
                inner_raw.append((name, arr))
        proj["inner"] = self.inner._load_projector(inner_raw)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        inner_params = dict(params)
        inner_params["projector"] = params["projector"]["inner"]
        return self.inner.encode_images(inner_params, pixel_values)

    def classify_logits(self, params, hidden, cu_lens):
        """Last-token pooled relevance score per sequence."""
        last = hidden[jnp.maximum(cu_lens[1:] - 1, 0)]
        p = params["projector"]
        x = jax.nn.relu(_dense(last, p["score_dense"]))
        return _dense(x, p["score_out"])


# ---------------------------------------------------------------------------
# InternS1-Pro (reference interns1_pro.rs) — FoPE text model
# ---------------------------------------------------------------------------


def fope_tables(
    head_dim: int,
    max_pos: int,
    rope_theta: float,
    cos_coef: np.ndarray,  # [input_dim, output_dim]
    sin_coef: np.ndarray,
    num_inv_freq: int | None = None,
):
    """FoPE cos/sin tables (reference interns1_pro.rs:105-210): learned
    linear transform of the filtered base sinusoids, padded with ONES to
    head_dim/2 (intentional non-identity on padded dims)."""
    raw = 1.0 / rope_theta ** (
        np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    )
    if num_inv_freq is not None:
        inv = raw[:num_inv_freq]
    else:
        inv = raw[raw > 2.0 * np.pi / max_pos]
    if len(inv) == 0:
        inv = raw[:1]
    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(t, inv)  # [T, input_dim]
    cos_out = np.cos(freqs) @ np.asarray(cos_coef, np.float64)
    sin_out = np.sin(freqs) @ np.asarray(sin_coef, np.float64)
    half = head_dim // 2
    if cos_out.shape[-1] < half:
        pad = half - cos_out.shape[-1]
        cos_out = np.pad(cos_out, ((0, 0), (0, pad)), constant_values=1.0)
        sin_out = np.pad(sin_out, ((0, 0), (0, pad)), constant_values=1.0)
    return (jnp.asarray(cos_out[:, :half], jnp.float32),
            jnp.asarray(sin_out[:, :half], jnp.float32))


class InternS1ProTextModel:
    """Factory helper: Qwen3-MoE backbone with FoPE rope tables
    (shared-coefficient variant; reference interns1_pro.rs FoPE)."""

    def __new__(cls, config: ModelConfig, dtype: Any = jnp.bfloat16):
        from .qwen3_moe import Qwen3MoeForCausalLM

        model = Qwen3MoeForCausalLM(config, dtype=dtype)
        ex = config.extra
        num_inv = ex.get("fope_num_inv_freq")
        hd = config.head_dim

        orig_init = model.init_params

        def init_params(rng=None, scale=0.02):
            params = orig_init(rng, scale)
            input_dim = len(
                _fope_input_dim(hd, config.rope_theta,
                                config.max_position_embeddings, num_inv)
            )
            out_dim = hd // 2
            if rng is None:
                cc = np.eye(input_dim, out_dim, dtype=np.float32)
                sc = np.eye(input_dim, out_dim, dtype=np.float32)
            else:
                r1, r2 = jax.random.split(jax.random.fold_in(rng, 777))
                cc = np.asarray(
                    jax.random.normal(r1, (input_dim, out_dim)) * 0.02)
                sc = np.asarray(
                    jax.random.normal(r2, (input_dim, out_dim)) * 0.02)
            params["fope_cos_coef"] = jnp.asarray(cc)
            params["fope_sin_coef"] = jnp.asarray(sc)
            cos, sin = fope_tables(
                hd, config.max_position_embeddings, config.rope_theta,
                cc, sc, num_inv)
            params["rope_cos"] = cos
            params["rope_sin"] = sin
            return params

        model.init_params = init_params
        return model


def _fope_input_dim(head_dim, theta, max_pos, num_inv_freq):
    raw = 1.0 / theta ** (
        np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    )
    if num_inv_freq is not None:
        out = raw[:num_inv_freq]
    else:
        out = raw[raw > 2.0 * np.pi / max_pos]
    return out if len(out) else raw[:1]


class InternS1ProForConditionalGeneration(Qwen3VLForConditionalGeneration):
    """InternS1-Pro: Qwen3-VL vision transformer + FoPE/QK-norm MoE text
    model (reference interns1_pro.rs)."""

    _text_arch = "InternS1ProMoeLLMForCausalLM"

    def _build(self, ex: dict):
        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, self._text_arch)
        else:
            import dataclasses

            from . import from_config

            self.text_config = dataclasses.replace(
                self.config, architectures=[self._text_arch])
            self.lm = from_config(self.text_config, dtype=self.dtype)
        vc = dict(ex.get("vision_config", {}))
        self.vision = Qwen2VLVisionTower(vc, dtype=self.dtype, v3=True)
        self.image_token_index = int(ex.get("image_token_id", 151655))
        self.tokens_per_image = self.vision.merged_patches


# ---------------------------------------------------------------------------
# DeepSeek-OCR (reference deepseek_ocr.rs / deepseek_ocr2.rs)
# ---------------------------------------------------------------------------


class DeepseekOCRForCausalLM(VlmBase):
    """DeepSeek-OCR: document-understanding VLM over a DeepSeek LM. The
    reference's dual encoder (SAM ViT-B with conv neck feeding a 24-layer
    CLIP stage) is served by the CLIP tower + the documented 2-layer MLP
    projector (module doc divergence list; reference deepseek_ocr.rs)."""

    _text_default = "DeepseekV2ForCausalLM"

    def _build(self, ex: dict):
        llm_cfg = ex.get("language_config",
                         ex.get("text_config", {}))
        self._make_text_model(dict(llm_cfg), self._text_default)
        vc = dict(ex.get("vision_config", ex.get("sam_config", {})))
        self.vision = CLIPVisionTower(vc, dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index",
                                            ex.get("image_token_id",
                                                   100015)))
        g = int(self.vision.num_patches**0.5)
        self.tokens_per_image = (g // 2) ** 2

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size * 4
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "fc1": {"weight": self._w(r1, (hv, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
            "fc2": {"weight": self._w(r2, (ht, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith(("vision_model.", "sam_model.", "vision.")):
            return "vision", name.split(".", 1)[1]
        if name.startswith(("language_model.", "model.", "lm_head.")):
            if name.startswith("language_model."):
                return "lm", name.removeprefix("language_model.")
            return "lm", name
        if name.startswith("projector."):
            return "proj", name.removeprefix("projector.")
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        if feats.shape[1] == self.vision.num_patches + 1:
            feats = feats[:, 1:]
        x = _pixel_shuffle_half(feats)
        p = params["projector"]
        x = _dense(jax.nn.gelu(_dense(x, p["fc1"])), p["fc2"])
        return x.reshape(-1, x.shape[-1])


class DeepseekOCR2ForCausalLM(DeepseekOCRForCausalLM):
    """DeepSeek-OCR v2 (reference deepseek_ocr2.rs): same serving
    pipeline over the v3-family LM."""

    _text_default = "DeepseekV3ForCausalLM"


def register_vlm_breadth7(registry: dict) -> None:
    registry.update({
        "OvisForConditionalGeneration": OvisForConditionalGeneration,
        "Ovis": OvisForConditionalGeneration,
        "Ovis2_5": Ovis2_5ForConditionalGeneration,
        "Molmo2ForConditionalGeneration": Molmo2ForConditionalGeneration,
        "KananaVForConditionalGeneration": KananaVForConditionalGeneration,
        "OpenPanguVLForConditionalGeneration":
            OpenPanguVLForConditionalGeneration,
        "MiniMaxVL01ForConditionalGeneration":
            MiniMaxVL01ForConditionalGeneration,
        "Llama_Nemotron_Nano_VL": LlamaNemotronVLChatModel,
        "Llama_Nemotron_Nano_VL_V1": LlamaNemotronVLChatModel,
        "NemotronH_Nano_VL_V2": NemotronHNanoVLV2,
        "JinaVLForRanking": JinaVLForRanking,
        "InternS1ProForConditionalGeneration":
            InternS1ProForConditionalGeneration,
        "InternS1ProMoeLLMForCausalLM": InternS1ProTextModel,
        "DeepseekOCRForCausalLM": DeepseekOCRForCausalLM,
        "DeepseekOCR2ForCausalLM": DeepseekOCR2ForCausalLM,
    })
