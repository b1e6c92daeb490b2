"""VLM breadth 2: Phi-3 Vision, MiniCPM-V (perceiver resampler).

Reference: crates/core/src/models/{phi3v,minicpmv}.rs. Same injection
design as vlm_breadth.py.

Round-1 simplifications: Phi3V serves the global 336px view (HD tiling
with glb/sub newline separators is a preprocessing extension);
MiniCPM-V uses the fixed preprocessor grid (dynamic slicing ditto).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vision import CLIPVisionTower, SiglipVisionTower, _dense, _layer_norm
from .vlm_breadth import VlmBase


class Phi3VForCausalLM(VlmBase):
    """Phi-3 Vision (reference models/phi3v.rs): CLIP ViT-L @336 at
    feature layer -2 (skip CLS), 2x2 patch merge (4x channel concat),
    2-layer GELU MLP projection into Phi3."""

    def _build(self, ex: dict):
        # Phi3V keeps text config at top level
        import dataclasses

        from . import from_config

        self.text_config = dataclasses.replace(
            self.config, architectures=["Phi3ForCausalLM"]
        )
        self.lm = from_config(self.text_config, dtype=self.dtype)
        img_cfg = dict(ex.get("img_processor", {}) or {})
        vis_cfg = {
            "hidden_size": img_cfg.get("image_dim_out", 1024),
            "image_size": img_cfg.get("image_size", 336),
            "patch_size": img_cfg.get("patch_size", 14),
            "num_hidden_layers": img_cfg.get("num_hidden_layers", 24),
            "num_attention_heads": img_cfg.get("num_attention_heads", 16),
            "intermediate_size": img_cfg.get("intermediate_size", 4096),
            "model_type": "clip",
        }
        vis_cfg.update(ex.get("vision_config", {}) or {})
        self.vision = CLIPVisionTower(vis_cfg, dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 32044))
        g = int(self.vision.num_patches**0.5)
        assert g % 2 == 0, g
        self.grid = g
        self.tokens_per_image = (g // 2) ** 2

    def _init_projector(self, rng, scale):
        d_in = self.vision.hidden_size * 4  # 2x2 merge
        h = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "fc1": {"weight": self._w(r1, (d_in, h), scale),
                    "bias": jnp.zeros((h,), self.dtype)},
            "fc2": {"weight": self._w(r2, (h, h), scale),
                    "bias": jnp.zeros((h,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if "vision_embed_tokens.img_processor.vision_model." in name:
            return "vision", name.split("img_processor.", 1)[1]
        if ".vision_embed_tokens.img_projection." in name:
            rest = name.split("img_projection.", 1)[1]
            idx, leaf = rest.split(".")
            return "proj", f"{'fc1' if idx == '0' else 'fc2'}.{leaf}"
        if "vision_embed_tokens" in name:
            return None  # glb_GN / sub_GN separators (HD tiling path)
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values,
                            feature_layer=-2)
        feats = feats[:, 1:]  # type_feature="patch": skip CLS
        b, n, c = feats.shape
        g = self.grid
        # 2x2 patch merge: concat each quad's channels
        x = feats.reshape(b, g // 2, 2, g // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // 2) ** 2, 4 * c)
        p = params["projector"]
        x = _dense(x, p["fc1"])
        x = jax.nn.gelu(x)
        x = _dense(x, p["fc2"])
        return x.reshape(-1, x.shape[-1])


def _sincos_2d(grid: int, dim: int) -> jnp.ndarray:
    """2-D sincos position embedding [grid*grid, dim] (MiniCPM-V
    resampler positions)."""
    half = dim // 2
    omega = 1.0 / (10000 ** (np.arange(half // 2) / (half / 2.0)))
    pos = np.arange(grid, dtype=np.float32)
    out = np.einsum("p,f->pf", pos, omega)
    emb1d = np.concatenate([np.sin(out), np.cos(out)], axis=1)  # [g, half]
    row = np.repeat(emb1d[:, None, :], grid, axis=1)
    col = np.repeat(emb1d[None, :, :], grid, axis=0)
    return jnp.asarray(
        np.concatenate([row, col], axis=-1).reshape(grid * grid, dim),
        jnp.float32,
    )


class MiniCPMVForCausalLM(VlmBase):
    """MiniCPM-V 2.6 (reference models/minicpmv.rs): SigLIP/Idefics2-
    style vision encoder → perceiver resampler (learned queries cross-
    attend to vision features with 2-D sincos positions) → Qwen2 LM."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = ex.get("text_config") or {}
        if text_cfg:
            self._make_text_model(text_cfg, "Qwen2ForCausalLM")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["Qwen2ForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.num_queries = int(ex.get("query_num", 64))
        self.image_token_index = int(ex.get("image_token_index", 128244))
        self.tokens_per_image = self.num_queries
        self.kv_dim = self.vision.hidden_size
        self.grid = int(self.vision.num_patches**0.5)

    def _init_projector(self, rng, scale):
        h = self.text_config.hidden_size
        q = self.num_queries
        n_k = 5
        keys = iter(jax.random.split(rng, n_k) if rng is not None
                    else [None] * n_k)
        d = self.dtype

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        return {
            "query": self._w(next(keys), (q, h), scale),
            "kv_proj": {"weight": self._w(next(keys), (self.kv_dim, h), scale)},
            "q_proj": {"weight": self._w(next(keys), (h, h), scale),
                       "bias": jnp.zeros((h,), d)},
            "k_proj": {"weight": jnp.eye(h, dtype=d),
                       "bias": jnp.zeros((h,), d)},
            "v_proj": {"weight": jnp.eye(h, dtype=d),
                       "bias": jnp.zeros((h,), d)},
            "out_proj": {"weight": self._w(next(keys), (h, h), scale),
                         "bias": jnp.zeros((h,), d)},
            "ln_q": ln(),
            "ln_kv": ln(),
            "ln_post": ln(),
            "proj": self._w(next(keys), (h, h), scale),
        }

    def _route_weight(self, name: str):
        if name.startswith("vpm."):
            return "vision", name.removeprefix("vpm.")
        if name.startswith("resampler."):
            n = name.removeprefix("resampler.")
            n = n.replace("attn.in_proj_", "in_proj_")  # torch MHA naming
            return "proj", n
        if name.startswith("llm."):
            return "lm", name.removeprefix("llm.")
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        h = self.text_config.hidden_size
        for name, arr in raw:
            a = np.asarray(arr)
            if name == "query":
                proj["query"] = jnp.asarray(a, self.dtype)
            elif name == "proj":
                proj["proj"] = jnp.asarray(a, self.dtype)
            elif name.startswith("kv_proj."):
                proj["kv_proj"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("in_proj_weight"):
                q, k, v = np.split(a, 3, axis=0)
                proj["q_proj"]["weight"] = jnp.asarray(q.T, self.dtype)
                proj["k_proj"]["weight"] = jnp.asarray(k.T, self.dtype)
                proj["v_proj"]["weight"] = jnp.asarray(v.T, self.dtype)
            elif name.startswith("in_proj_bias"):
                q, k, v = np.split(a, 3, axis=0)
                proj["q_proj"]["bias"] = jnp.asarray(q, self.dtype)
                proj["k_proj"]["bias"] = jnp.asarray(k, self.dtype)
                proj["v_proj"]["bias"] = jnp.asarray(v, self.dtype)
            elif name.startswith("attn.out_proj."):
                leaf = name.rsplit(".", 1)[1]
                proj["out_proj"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype
                )
            elif name.startswith(("ln_q.", "ln_kv.", "ln_post.")):
                block, leaf = name.split(".")
                proj[block][leaf] = jnp.asarray(a, self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        h = self.text_config.hidden_size
        kv = _dense(feats, p["kv_proj"])  # [B, N, h]
        kv = kv + _sincos_2d(self.grid, h)[None].astype(kv.dtype)
        kv = _layer_norm(kv, p["ln_kv"], 1e-6)
        q = _layer_norm(p["query"][None], p["ln_q"], 1e-6)  # [1, Q, h]
        b = kv.shape[0]
        qq = _dense(jnp.broadcast_to(q, (b, *q.shape[1:])), p["q_proj"])
        kk = _dense(kv, p["k_proj"])
        vv = _dense(kv, p["v_proj"])
        scores = jnp.einsum("bqh,bnh->bqn", qq.astype(jnp.float32),
                            kk.astype(jnp.float32)) * (h**-0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bqn,bnh->bqh", probs, vv.astype(jnp.float32))
        x = _dense(ctx.astype(kv.dtype), p["out_proj"])
        x = _layer_norm(x, p["ln_post"], 1e-6)
        x = x @ p["proj"]
        return x.reshape(-1, x.shape[-1])


def register_vlm_breadth2(registry: dict) -> None:
    registry.update(
        {
            "Phi3VForCausalLM": Phi3VForCausalLM,
            "MiniCPMV": MiniCPMVForCausalLM,
            "MiniCPMVForCausalLM": MiniCPMVForCausalLM,
        }
    )
