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


# -- Qwen-VL v1 ------------------------------------------------------------------


class QwenVLVisionTower:
    """Legacy Qwen-VL CLIP-style ViT (reference models/qwen_vl.rs):
    conv patch embed (no bias) + interpolated learnable positions →
    ln_pre → resblocks (ln_1/attn(in_proj fused)/ln_2/c_fc-gelu-c_proj)
    → cross-attention resampler (`attn_pool`, n_queries learnable
    queries + sincos positions) → ln_post → right-multiplied `proj`."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.width = int(cfg.get("width", cfg.get("hidden_size", 1664)))
        self.layers = int(cfg.get("layers", cfg.get("num_hidden_layers",
                                                    4)))
        self.heads = int(cfg.get("heads", cfg.get("num_attention_heads",
                                                  16)))
        ratio = float(cfg.get("mlp_ratio", 4.0))
        self.mlp_width = int(cfg.get("mlp_width", self.width * ratio))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.image_size = int(cfg.get("image_size",
                                      cfg.get("image_start_size", 448)))
        self.output_dim = int(cfg.get("output_dim", 4096))
        self.n_queries = int(cfg.get("n_queries", 256))
        self.pool_heads = int(cfg.get("pool_heads",
                                      self.output_dim // 128))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.hidden_size = self.output_dim

    @property
    def merged_patches(self) -> int:
        return self.n_queries

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        w_, od = self.width, self.output_dim
        n_keys = self.layers * 4 + 8
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

        def ln(size):
            return {"weight": jnp.ones((size,), d),
                    "bias": jnp.zeros((size,), d)}

        layers = []
        for _ in range(self.layers):
            layers.append({
                "ln_1": ln(w_), "ln_2": ln(w_),
                "in_proj": dense(next(keys), w_, 3 * w_),
                "out_proj": dense(next(keys), w_, w_),
                "c_fc": dense(next(keys), w_, self.mlp_width),
                "c_proj": dense(next(keys), self.mlp_width, w_),
            })
        return {
            "conv1": {"weight": w(next(keys),
                                  (self.patch_size**2 * 3, w_))},
            "positional_embedding": w(next(keys), (self.n_queries, w_)),
            "ln_pre": ln(w_),
            "layers": layers,
            "attn_pool": {
                "query": w(next(keys), (self.n_queries, od)),
                "pos_embed": w(next(keys), (self.n_queries, od)),
                "kv_proj": {"weight": w(next(keys), (w_, od))},
                "ln_q": ln(od), "ln_kv": ln(od),
                "in_proj": dense(next(keys), od, 3 * od),
                "out_proj": dense(next(keys), od, od),
            },
            "ln_post": ln(od),
            "proj": w(next(keys), (od, od)),
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = x @ params["conv1"]["weight"]
        # interpolate the [n_queries, width] table to the patch grid
        pe = params["positional_embedding"]
        pg = int(pe.shape[0] ** 0.5)
        pe2 = pe.reshape(pg, pg, -1)
        if pg != g:
            pe2 = jax.image.resize(pe2.astype(jnp.float32),
                                   (g, g, pe2.shape[-1]), "bilinear")
        x = x + pe2.reshape(1, g * g, -1).astype(x.dtype)
        x = _layer_norm(x, params["ln_pre"], 1e-6)

        nh = self.heads
        hd = self.width // nh
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["ln_1"], 1e-6)
            qkv = _dense(h, lp["in_proj"]).reshape(b, t, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * (hd**-0.5)
            pr = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", pr,
                             v.astype(jnp.float32)).reshape(b, t, -1)
            x = res + _dense(ctx.astype(x.dtype), lp["out_proj"])
            res = x
            h = _layer_norm(x, lp["ln_2"], 1e-6)
            x = res + _dense(jax.nn.gelu(_dense(h, lp["c_fc"])),
                             lp["c_proj"])

        # resampler: queries cross-attend to projected patches
        ap = params["attn_pool"]
        od = self.output_dim
        kv = _layer_norm(x @ ap["kv_proj"]["weight"], ap["ln_kv"], 1e-6)
        # interpolated key positions from the query pos table
        kp = ap["pos_embed"]
        kg = int(kp.shape[0] ** 0.5)
        kp2 = kp.reshape(kg, kg, -1)
        if kg != g:
            kp2 = jax.image.resize(kp2.astype(jnp.float32),
                                   (g, g, kp2.shape[-1]), "bilinear")
        k_in = kv + kp2.reshape(1, g * g, -1).astype(kv.dtype)
        q_in = _layer_norm(ap["query"], ap["ln_q"], 1e-6)[None] \
            + ap["pos_embed"][None]
        q_in = jnp.broadcast_to(q_in, (b, self.n_queries, od))
        ph = self.pool_heads
        phd = od // ph
        wq, wk, wv = jnp.split(ap["in_proj"]["weight"], 3, axis=1)
        bq, bk, bv = jnp.split(ap["in_proj"]["bias"], 3)
        q = (q_in @ wq + bq).reshape(b, -1, ph, phd)
        k = (k_in @ wk + bk).reshape(b, -1, ph, phd)
        v = (kv @ wv + bv).reshape(b, -1, ph, phd)
        s = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (phd**-0.5)
        pr = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhij,bjhd->bihd", pr,
                         v.astype(jnp.float32)).reshape(b, -1, od)
        x = _dense(ctx.astype(kv.dtype), ap["out_proj"])
        x = _layer_norm(x, params["ln_post"], 1e-6)
        return x @ params["proj"]

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            leaf = parts[-1]
            if name == "conv1.weight":  # [w, 3, ps, ps] no bias
                params["conv1"]["weight"] = jnp.asarray(
                    a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                    self.dtype)
            elif name == "positional_embedding":
                params["positional_embedding"] = jnp.asarray(a, self.dtype)
            elif name == "proj":
                params["proj"] = jnp.asarray(a, self.dtype)
            elif parts[0] in ("ln_pre", "ln_post"):
                params[parts[0]][leaf] = jnp.asarray(a, self.dtype)
            elif parts[0] == "attn_pool":
                ap = params["attn_pool"]
                if parts[1] in ("query", "pos_embed"):
                    ap[parts[1]] = jnp.asarray(a, self.dtype)
                elif parts[1] == "kv_proj":
                    ap["kv_proj"]["weight"] = jnp.asarray(a.T, self.dtype)
                elif parts[1] in ("ln_q", "ln_kv"):
                    ap[parts[1]][leaf] = jnp.asarray(a, self.dtype)
                elif parts[1] == "attn":
                    if leaf == "in_proj_weight":
                        ap["in_proj"]["weight"] = jnp.asarray(a.T,
                                                              self.dtype)
                    elif leaf == "in_proj_bias":
                        ap["in_proj"]["bias"] = jnp.asarray(a, self.dtype)
                    else:
                        ap["out_proj"][leaf] = jnp.asarray(
                            a.T if leaf == "weight" else a, self.dtype)
            elif parts[0] == "transformer" and parts[1] == "resblocks":
                lp = params["layers"][int(parts[2])]
                sub = parts[3]
                if sub in ("ln_1", "ln_2"):
                    lp[sub][leaf] = jnp.asarray(a, self.dtype)
                elif sub == "attn":
                    if leaf == "in_proj_weight":
                        lp["in_proj"]["weight"] = jnp.asarray(a.T,
                                                              self.dtype)
                    elif leaf == "in_proj_bias":
                        lp["in_proj"]["bias"] = jnp.asarray(a, self.dtype)
                    else:
                        lp["out_proj"][leaf] = jnp.asarray(
                            a.T if leaf == "weight" else a, self.dtype)
                elif sub == "mlp":
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class QwenVLForConditionalGeneration(VlmBase):
    """Legacy Qwen-VL (reference models/qwen_vl.rs): the CLIP-style
    visual encoder with the cross-attention resampler feeding the
    original Qwen-v1 language model (weights under
    `transformer.visual.*`)."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "QWenLMHeadModel")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["QWenLMHeadModel"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = QwenVLVisionTower(dict(ex.get("visual",
                                                    ex.get("vision_config",
                                                           {}))),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_start_id", 151857)) + 1
        self.tokens_per_image = self.vision.n_queries

    def _init_projector(self, rng, scale):
        return {}

    def _load_projector(self, raw):
        return {}

    def _route_weight(self, name: str):
        if name.startswith("transformer.visual."):
            return "vision", name.removeprefix("transformer.visual.")
        return "lm", name

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision(params["vision_tower"], pixel_values)
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
        "QwenVLForConditionalGeneration": QwenVLForConditionalGeneration,
        "QWenVLForConditionalGeneration": QwenVLForConditionalGeneration,
    })
