"""VLM breadth 5: GLM-OCR, PaddleOCR-VL, LFM2-VL, Phi-4-MM, BLIP-2,
MiniCPM-O.

Reference: models/{glm_ocr.rs, paddleocr_vl.rs, lfm2_vl.rs, phi4mm.rs,
blip2.rs, minicpmo.rs}.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .vision import SiglipVisionTower, _dense, _layer_norm
from .vlm_breadth import VlmBase
from .vlm_breadth3 import Glm41VisionTower, Glm4vForConditionalGeneration


# -- GLM-OCR ---------------------------------------------------------------------


class GlmOcrVisionTower(Glm41VisionTower):
    """GLM-OCR ViT (reference glm_ocr.rs): the GLM-4.1V layout with
    per-head q/k RMSNorms, biased qkv/proj and biased SwiGLU."""

    qk_norm = True
    use_bias = True


class GlmOcrForConditionalGeneration(Glm4vForConditionalGeneration):
    """GLM-OCR (reference models/glm_ocr.rs): GLM-OCR ViT +
    Glm4ForCausalLM."""

    def _build(self, ex: dict):
        super()._build(ex)
        self.vision = GlmOcrVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.tokens_per_image = self.vision.merged_patches


# -- PaddleOCR-VL -----------------------------------------------------------------


class PaddleOCRVLForConditionalGeneration(VlmBase):
    """PaddleOCR-VL (reference models/paddleocr_vl.rs): SigLIP-layout
    ViT (the reference swaps fixed positions for 2-D rope — fixed grid
    here, documented divergence) + projector (per-patch LayerNorm →
    2×2 merge → linear_1 GELU → linear_2) → dense ERNIE-4.5 text."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Ernie4_5ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 100295))
        self.merge = int(ex.get("spatial_merge_size", 2))
        self.tokens_per_image = self.vision.num_patches // (self.merge**2)

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        md = hv * self.merge**2
        ht = self.text_config.hidden_size
        return {
            "pre_norm": {"weight": jnp.ones((hv,), self.dtype),
                         "bias": jnp.zeros((hv,), self.dtype)},
            "linear_1": {"weight": self._w(rng, (md, md), scale),
                         "bias": jnp.zeros((md,), self.dtype)},
            "linear_2": {"weight": self._w(rng, (md, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        n = name.removeprefix("model.")
        if "vision_model." in n:
            return "vision", "vision_model." + n.split("vision_model.", 1)[1]
        if n.startswith(("projector.", "mlp_AR.")):
            return "proj", n.split(".", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        x = _layer_norm(feats, p["pre_norm"], 1e-5)
        b, n, hv = x.shape
        g = int(n**0.5)
        m = self.merge
        x = x.reshape(b, g // m, m, g // m, m, hv)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // m) ** 2,
                                                  m * m * hv)
        x = jax.nn.gelu(_dense(x, p["linear_1"]), approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# -- LFM2-VL ---------------------------------------------------------------------


class Lfm2VLForConditionalGeneration(VlmBase):
    """LFM2-VL (reference models/lfm2_vl.rs): SigLIP2 tower (standard
    SigLIP layout) + pixel unshuffle by `downsample_factor` + optional
    LayerNorm + linear_1 GELU linear_2 projector → LFM2 hybrid text
    model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Lfm2ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.factor = int(ex.get("downsample_factor", 2))
        self.proj_hidden = int(ex.get("projector_hidden_size",
                                      self.text_config.hidden_size))
        self.proj_bias = bool(ex.get("projector_bias", True))
        self.use_ln = bool(ex.get("projector_use_layernorm", True))
        self.image_token_index = int(ex.get("image_token_id", 396))
        self.tokens_per_image = self.vision.num_patches // (self.factor**2)

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size * self.factor**2
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        p = {
            "linear_1": {"weight": self._w(r1, (hv, self.proj_hidden),
                                           scale)},
            "linear_2": {"weight": self._w(r2, (self.proj_hidden, ht),
                                           scale)},
        }
        if self.proj_bias:
            p["linear_1"]["bias"] = jnp.zeros((self.proj_hidden,),
                                              self.dtype)
            p["linear_2"]["bias"] = jnp.zeros((ht,), self.dtype)
        if self.use_ln:
            p["layer_norm"] = {"weight": jnp.ones((hv,), self.dtype),
                               "bias": jnp.zeros((hv,), self.dtype)}
        return p

    def _route_weight(self, name: str):
        n = name.removeprefix("model.")
        if "vision_tower." in n:
            return "vision", n.split("vision_tower.", 1)[1]
        if n.startswith("multi_modal_projector."):
            return "proj", n.removeprefix("multi_modal_projector.")
        if name.startswith("model.language_model."):
            return "lm", "model." + name.removeprefix(
                "model.language_model.")
        if n.startswith("language_model."):
            return "lm", n.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, c = feats.shape
        g = int(n**0.5)
        f = self.factor
        x = feats.reshape(b, g // f, f, g // f, f, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // f) ** 2,
                                                  f * f * c)
        p = params["projector"]
        if "layer_norm" in p:
            x = _layer_norm(x, p["layer_norm"], 1e-5)
        x = jax.nn.gelu(_dense(x, p["linear_1"]), approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# -- Phi-4-MM ---------------------------------------------------------------------


class Phi4MMForCausalLM(VlmBase):
    """Phi-4-multimodal (reference models/phi4mm.rs): SigLIP tower →
    2×2 average pool → img_projection 2-layer MLP (`0` / `2`) → Phi-3
    text model. The speech LoRA/audio stack (phi4mm_audio.rs) is a
    preprocessing-only path in the reference."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "Phi3ForCausalLM")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["Phi3ForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        vc = ex.get("img_processor") or ex.get("vision_config") or {}
        self.vision = SiglipVisionTower(dict(vc), dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 200010))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.tokens_per_image = (g // 2) ** 2

    def _init_projector(self, rng, scale):
        ht = self.text_config.hidden_size
        hv = self.vision.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "fc1": {"weight": self._w(r1, (hv, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
            "fc2": {"weight": self._w(r2, (ht, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        n = name.removeprefix("model.")
        if "img_processor." in n:  # ...embd.img_processor.<SigLIP names>
            return "vision", n.split("img_processor.", 1)[1]
        if "img_projection." in n:
            parts = n.split("img_projection.", 1)[1].split(".")
            dest = {"0": "fc1", "2": "fc2"}.get(parts[0])
            if dest:
                return "proj", f"{dest}.{parts[1]}"
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, c = feats.shape
        g = int(n**0.5)
        # 2x2 average pool (phi4mm.rs:128 avg_pool2x2)
        x = feats.reshape(b, g // 2, 2, g // 2, 2, c).mean(axis=(2, 4))
        x = x.reshape(b, (g // 2) ** 2, c)
        p = params["projector"]
        x = jax.nn.gelu(_dense(x, p["fc1"]), approximate=True)
        x = _dense(x, p["fc2"])
        return x.reshape(-1, x.shape[-1])


# -- BLIP-2 ----------------------------------------------------------------------


class Blip2ForConditionalGeneration(VlmBase):
    """BLIP-2 (reference models/blip2.rs): CLIP-style ViT + Q-Former
    (learnable queries cross-attending to vision features every other
    layer) + language projection into a llama-style text model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "LlamaForCausalLM")
        vc = dict(ex.get("vision_config", {}))
        self.vision = SiglipVisionTower(vc, dtype=self.dtype)
        qc = dict(ex.get("qformer_config", {}))
        self.q_hidden = int(qc.get("hidden_size", 768))
        self.q_layers = int(qc.get("num_hidden_layers", 2))
        self.q_heads = int(qc.get("num_attention_heads", 4))
        self.q_inter = int(qc.get("intermediate_size", 4 * self.q_hidden))
        self.cross_freq = int(qc.get("cross_attention_frequency", 2))
        self.num_query = int(ex.get("num_query_tokens", 32))
        self.image_token_index = int(ex.get("image_token_index", 50265))
        self.tokens_per_image = self.num_query

    def _init_projector(self, rng, scale):
        d = self.dtype
        qh, qi = self.q_hidden, self.q_inter
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        n_keys = self.q_layers * 8 + 3
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            return self._w(key, shape, scale)

        def dense(key, din, dout):
            return {"weight": w(key, (din, dout)),
                    "bias": jnp.zeros((dout,), d)}

        def ln(size=qh):
            return {"weight": jnp.ones((size,), d),
                    "bias": jnp.zeros((size,), d)}

        layers = []
        for i in range(self.q_layers):
            lp = {
                "q": dense(next(keys), qh, qh),
                "k": dense(next(keys), qh, qh),
                "v": dense(next(keys), qh, qh),
                "attn_out": dense(next(keys), qh, qh),
                "attn_ln": ln(),
                "fc1": dense(next(keys), qh, qi),
                "fc2": dense(next(keys), qi, qh),
                "ffn_ln": ln(),
            }
            if i % self.cross_freq == 0:
                lp["xq"] = dense(next(keys), qh, qh)
                lp["xk"] = dense(next(keys), hv, qh)
                lp["xv"] = dense(next(keys), hv, qh)
                lp["x_out"] = dense(next(keys), qh, qh)
                lp["x_ln"] = ln()
            layers.append(lp)
        return {
            "query_tokens": w(next(keys), (self.num_query, qh)),
            "emb_ln": ln(),
            "layers": layers,
            "language_projection": dense(next(keys), qh, ht),
        }

    def _route_weight(self, name: str):
        if "vision_model." in name:
            return "vision", name.split("vision_model.", 1)[1]
        if name.startswith(("qformer.", "query_tokens",
                            "language_projection.")):
            return "proj", name
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            a = np.asarray(arr)
            leaf = name.rsplit(".", 1)[1]
            if name.startswith("query_tokens"):
                proj["query_tokens"] = jnp.asarray(
                    a.reshape(-1, a.shape[-1]), self.dtype)
            elif name.startswith("language_projection."):
                proj["language_projection"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
            elif name.startswith("qformer.layernorm."):
                proj["emb_ln"][leaf] = jnp.asarray(a, self.dtype)
            elif ".layer." in name:
                parts = name.split(".")
                i = parts.index("layer")
                lp = proj["layers"][int(parts[i + 1])]
                rest = parts[i + 2:]
                slot_map = {
                    ("attention", "attention", "query"): "q",
                    ("attention", "attention", "key"): "k",
                    ("attention", "attention", "value"): "v",
                    ("attention", "output", "dense"): "attn_out",
                    ("attention", "output", "LayerNorm"): "attn_ln",
                    ("crossattention", "attention", "query"): "xq",
                    ("crossattention", "attention", "key"): "xk",
                    ("crossattention", "attention", "value"): "xv",
                    ("crossattention", "output", "dense"): "x_out",
                    ("crossattention", "output", "LayerNorm"): "x_ln",
                    ("intermediate_query", "dense"): "fc1",
                    ("output_query", "dense"): "fc2",
                    ("output_query", "LayerNorm"): "ffn_ln",
                }
                slot = slot_map.get(tuple(rest[:-1]))
                if slot and slot in lp:
                    lp[slot][rest[-1]] = jnp.asarray(
                        a.T if rest[-1] == "weight" and a.ndim == 2 else a,
                        self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        b = feats.shape[0]
        nq, qh = self.num_query, self.q_hidden
        nh = self.q_heads
        hd = qh // nh
        x = jnp.broadcast_to(p["query_tokens"][None], (b, nq, qh))
        x = _layer_norm(x, p["emb_ln"], 1e-12)

        def mha(q_in, kv_in, wq, wk, wv, wo, ln):
            q = _dense(q_in, wq).reshape(b, -1, nh, hd)
            k = _dense(kv_in, wk).reshape(b, -1, nh, hd)
            v = _dense(kv_in, wv).reshape(b, -1, nh, hd)
            s = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            pr = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", pr, v).reshape(b, -1, qh)
            return _layer_norm(q_in + _dense(ctx, wo), ln, 1e-12)

        for lp in p["layers"]:
            x = mha(x, x, lp["q"], lp["k"], lp["v"], lp["attn_out"],
                    lp["attn_ln"])
            if "xq" in lp:
                x = mha(x, feats, lp["xq"], lp["xk"], lp["xv"],
                        lp["x_out"], lp["x_ln"])
            inner = jax.nn.gelu(_dense(x, lp["fc1"]), approximate=False)
            x = _layer_norm(x + _dense(inner, lp["fc2"]), lp["ffn_ln"],
                            1e-12)
        x = _dense(x, p["language_projection"])
        return x.reshape(-1, x.shape[-1])


def register_vlm_breadth5(registry: dict) -> None:
    from .vlm_breadth2 import MiniCPMVForCausalLM

    registry.update({
        "GlmOcrForConditionalGeneration": GlmOcrForConditionalGeneration,
        "PaddleOCRVLForConditionalGeneration":
            PaddleOCRVLForConditionalGeneration,
        "Lfm2VLForConditionalGeneration": Lfm2VLForConditionalGeneration,
        "Lfm2VlForConditionalGeneration": Lfm2VLForConditionalGeneration,
        "Phi4MMForCausalLM": Phi4MMForCausalLM,
        "Blip2ForConditionalGeneration": Blip2ForConditionalGeneration,
        # MiniCPM-O = MiniCPM-V vision + preprocessing-time audio
        # (reference minicpmo.rs extends minicpmv.rs; the audio encoder
        # runs at Python preprocessing time)
        "MiniCPMOForCausalLM": MiniCPMVForCausalLM,
        "MiniCPMO": MiniCPMVForCausalLM,
    })
