"""VLM breadth: PaliGemma, Gemma3 (multimodal), Qwen2-VL / Qwen2.5-VL,
InternVL, Idefics3/SmolVLM, Pixtral/Mistral3, LLaVA-NeXT.

Reference: crates/core/src/models/{paligemma,gemma3_mm,qwen2_vl,
qwen2_5_vl,internvl,idefics3,pixtral,llava_next}.rs + the multimodal
processor (multimodal/processor.rs merge_embeddings). Same TPU design
as llava.py: the vision tower + projector run once per request as a
jitted call at admission, projected embeddings are injected at
image-token positions by the VLM engine (engine/vlm.py).

Qwen2-VL runs TRUE 3-axis mrope (r3): positions travel as [3, T] rows
in the packed batch (engine/batch_pack.py mrope layout), computed at
admission by multimodal/mrope.py (== HF get_rope_index, anchored
end-to-end greedy-exact vs transformers with a real image in
tests/test_mrope.py).

Known simplification (documented divergence, not a bug):
- Dynamic-resolution models (Qwen2-VL, LLaVA-NeXT anyres, Pixtral
  native-aspect) process a fixed preprocessor grid per image.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vision import SiglipVisionTower, CLIPVisionTower, _dense, _layer_norm


def _rms_norm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps) * w).astype(
        x.dtype
    )


class VlmBase:
    """Shared VLM plumbing: text-model proxying, param-tree shape.

    Subclasses implement ``_build`` (set self.lm / self.vision /
    tokens_per_image / image_token_index), ``encode_images``,
    ``_init_projector`` and ``_route_weight``.
    """

    is_multimodal = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        self._build(config.extra)

    # -- text-model proxies (engine drives the LM through the wrapper) ------

    @property
    def kv_head_info(self):
        return self.lm.kv_head_info

    @property
    def mrope_section(self):
        return getattr(self.lm, "mrope_section", None)

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

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        return self.lm(params["language_model"], input_ids, md, kv_pages,
                       embeds=embeds)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params["language_model"], hidden)

    def _make_text_model(self, text_cfg: dict, default_arch: str):
        from . import from_config

        text_cfg = dict(text_cfg)
        if not text_cfg.get("architectures"):  # absent OR explicit None
            text_cfg["architectures"] = [default_arch]
        self.text_config = ModelConfig.from_dict(text_cfg)
        self.lm = from_config(self.text_config, dtype=self.dtype)

    def init_params(self, rng=None, scale: float = 0.02):
        if rng is None:
            r1 = r2 = r3 = None
        else:
            r1, r2, r3 = jax.random.split(rng, 3)
        return {
            "language_model": self.lm.init_params(r1, scale),
            "vision_tower": self.vision.init_params(r2, scale),
            "projector": self._init_projector(r3, scale),
        }

    def _w(self, key, shape, scale=0.02):
        if key is None:
            return jnp.zeros(shape, self.dtype)
        return (scale * jax.random.normal(key, shape, jnp.float32)).astype(self.dtype)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        lm_stream, vis_stream = [], []
        proj_raw: list[tuple[str, np.ndarray]] = []
        for name, arr in weights:
            route = self._route_weight(name)
            if route is None:
                continue
            dest, new_name = route
            if dest == "lm":
                lm_stream.append((new_name, arr))
            elif dest == "vision":
                vis_stream.append((new_name, arr))
            else:
                proj_raw.append((new_name, arr))
        return {
            "language_model": self.lm.load_weights(lm_stream),
            "vision_tower": self.vision.load_weights(vis_stream),
            "projector": self._load_projector(proj_raw),
        }

    def _load_projector(self, raw: list[tuple[str, np.ndarray]]) -> dict:
        """Default: nested {block: {leaf}} with dense weights transposed."""
        proj: dict = {}
        for name, arr in raw:
            parts = name.split(".")
            a = np.asarray(arr)
            node = proj
            for p in parts[:-2]:
                node = node.setdefault(p, {})
            if len(parts) >= 2:
                node.setdefault(parts[-2], {})[parts[-1]] = jnp.asarray(
                    a.T if parts[-1] == "weight" and a.ndim == 2 else a, self.dtype
                )
            else:
                proj[parts[0]] = jnp.asarray(a, self.dtype)
        return proj


# ---------------------------------------------------------------------------
# PaliGemma / Gemma3 multimodal
# ---------------------------------------------------------------------------


class PaliGemmaForConditionalGeneration(VlmBase):
    """SigLIP tower + single linear projector scaled by 1/sqrt(H), Gemma LM
    (reference models/paligemma.rs)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "GemmaForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 257152))
        self.tokens_per_image = self.vision.num_patches

    def _init_projector(self, rng, scale):
        return {
            "linear": {
                "weight": self._w(rng, (self.vision.hidden_size,
                                        self.text_config.hidden_size), scale),
                "bias": jnp.zeros((self.text_config.hidden_size,), self.dtype),
            }
        }

    def _route_weight(self, name: str):
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if "vision_tower." in name:
            return "vision", name.split("vision_tower.", 1)[1]
        if "multi_modal_projector." in name:
            return "proj", "linear." + name.rsplit(".", 1)[1]
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        x = _dense(feats, params["projector"]["linear"])
        # PaliGemma normalizes projected image embeds like text embeds
        x = x * (self.text_config.hidden_size**-0.5)
        return x.reshape(-1, x.shape[-1])


class Gemma3MMForConditionalGeneration(VlmBase):
    """Gemma 3 multimodal: SigLIP tower → 4x4 average pool → RMSNorm →
    linear projection into the Gemma3 text model
    (reference models/gemma3_mm.rs; HF Gemma3ForConditionalGeneration)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "Gemma3ForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 262144))
        self.tokens_per_image = int(ex.get("mm_tokens_per_image", 256))
        g = int(self.vision.num_patches**0.5)
        out = int(self.tokens_per_image**0.5)
        assert g % out == 0, (g, out)
        self.pool = g // out
        self.grid = g

    def _init_projector(self, rng, scale):
        return {
            "mm_input_projection_weight": self._w(
                rng, (self.vision.hidden_size, self.text_config.hidden_size), scale
            ),
            "mm_soft_emb_norm": jnp.ones((self.vision.hidden_size,), self.dtype),
        }

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

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            a = np.asarray(arr)
            if name == "mm_input_projection_weight":
                proj[name] = jnp.asarray(a, self.dtype)  # already [V, T]
            elif name.startswith("mm_soft_emb_norm"):
                proj["mm_soft_emb_norm"] = jnp.asarray(a, self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, h = feats.shape
        g, p = self.grid, self.pool
        x = feats.reshape(b, g // p, p, g // p, p, h).mean(axis=(2, 4))
        x = x.reshape(b, -1, h)
        x = _rms_norm(x, params["projector"]["mm_soft_emb_norm"],
                      eps=1e-6)
        x = x @ params["projector"]["mm_input_projection_weight"]
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# Qwen2-VL family vision tower
# ---------------------------------------------------------------------------


def _rope_2d(grid: int, head_dim: int, theta: float = 10000.0):
    """Pixtral/Qwen2-VL style 2-D rope: half the rotary dims encode the
    row index, half the column index."""
    quarter = head_dim // 4
    freqs = theta ** (-jnp.arange(0, quarter, dtype=jnp.float32) / quarter)
    pos = jnp.arange(grid, dtype=jnp.float32)
    ang = pos[:, None] * freqs[None, :]  # [g, quarter]
    row = jnp.broadcast_to(ang[:, None, :], (grid, grid, quarter))
    col = jnp.broadcast_to(ang[None, :, :], (grid, grid, quarter))
    ang2 = jnp.concatenate([row, col], -1).reshape(grid * grid, head_dim // 2)
    return jnp.cos(ang2), jnp.sin(ang2)


def _apply_rope_half(x, cos, sin):
    """x [b, t, nh, hd]; rotate-half convention over hd."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)


class Qwen2VLVisionTower:
    """Qwen2-VL / Qwen2.5-VL ViT: conv patch embed (temporal 2),
    2-D rope attention, spatial merger (reference models/qwen2_vl.rs
    vision encoder). Qwen2.5 variant uses RMSNorm + SwiGLU blocks."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32, v25: bool = False,
                 v3: bool = False):
        self.cfg = cfg
        self.dtype = dtype
        self.v25 = v25
        self.v3 = v3
        if v25 or v3:
            # Qwen2.5/3-VL: hidden_size = ViT width, out_hidden_size = LM width
            self.hidden_size = int(cfg.get("hidden_size",
                                           cfg.get("embed_dim", 1280)))
            self.out_hidden = int(cfg.get("out_hidden_size", 3584))
        else:
            # Qwen2-VL: embed_dim = ViT width, hidden_size = LM width
            self.hidden_size = int(cfg.get("embed_dim", 1280))
            self.out_hidden = int(cfg.get("hidden_size", 3584))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.temporal_patch_size = int(cfg.get("temporal_patch_size", 2))
        self.merge_size = int(cfg.get("spatial_merge_size", 2))
        self.num_layers = int(cfg.get("depth", cfg.get("num_hidden_layers", 4)))
        self.num_heads = int(cfg.get("num_heads", cfg.get("num_attention_heads", 16)))
        mlp_ratio = float(cfg.get("mlp_ratio", 4.0))
        self.intermediate_size = int(cfg.get("intermediate_size",
                                             self.hidden_size * mlp_ratio))
        self.image_size = int(cfg.get("image_size", 448))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads

    @property
    def merged_patches(self) -> int:
        return self.num_patches // (self.merge_size**2)

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h, inter = self.hidden_size, self.intermediate_size
        n_keys = self.num_layers * 7 + 4
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def dense(key, din, dout, bias=True):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def norm():
            if self.v25:
                return {"weight": jnp.ones((h,), d)}
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(self.num_layers):
            lp = {
                "norm1": norm(),
                "qkv": dense(next(keys), h, 3 * h),
                "proj": dense(next(keys), h, h),
                "norm2": norm(),
            }
            if self.v3:
                # Qwen3-VL: SiLU MLP, linear_fc naming (qwen3_vl.rs:321-344)
                lp["fc1"] = dense(next(keys), h, inter)
                lp["fc2"] = dense(next(keys), inter, h)
            elif self.v25:
                lp["gate_proj"] = dense(next(keys), h, inter)
                lp["up_proj"] = dense(next(keys), h, inter)
                lp["down_proj"] = dense(next(keys), inter, h)
            else:
                lp["fc1"] = dense(next(keys), h, inter)
                lp["fc2"] = dense(next(keys), inter, h)
            layers.append(lp)
        m = self.merge_size**2
        return {
            "patch_embed": {
                "weight": w(next(keys),
                            (self.temporal_patch_size * self.patch_size
                             * self.patch_size * 3, h)),
            },
            "layers": layers,
            "merger_ln_q": norm(),
            "merger_fc1": dense(next(keys), h * m, h * m),
            "merger_fc2": dense(next(keys), h * m, self.out_hidden),
        }

    def _norm(self, x, p):
        if self.v25:
            return _rms_norm(x, p["weight"])
        return _layer_norm(x, p, 1e-6)

    @property
    def _rope_frac(self) -> float:
        # Qwen3-VL rotates only the first half of head_dim
        # (qwen3_vl.rs:456-463 partial_rotary_factor=0.5)
        return 0.5 if self.v3 else 1.0

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, 3, H, W] -> merged features [B, merged, out]."""
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)  # BHWC
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        # temporal patch: a still image repeats the frame
        x = jnp.concatenate([x] * self.temporal_patch_size, -1)
        x = _dense(x, params["patch_embed"])

        rd = int(self.head_dim * self._rope_frac)
        cos, sin = _rope_2d(g, rd)
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = self._norm(x, lp["norm1"])
            qkv = _dense(h, lp["qkv"]).reshape(b, t, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = q.astype(jnp.float32)
            k = k.astype(jnp.float32)
            if rd < hd:
                q = jnp.concatenate(
                    [_apply_rope_half(q[..., :rd], cos, sin), q[..., rd:]],
                    -1)
                k = jnp.concatenate(
                    [_apply_rope_half(k[..., :rd], cos, sin), k[..., rd:]],
                    -1)
            else:
                q = _apply_rope_half(q, cos, sin)
                k = _apply_rope_half(k, cos, sin)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
            x = res + _dense(ctx.reshape(b, t, -1).astype(x.dtype), lp["proj"])
            res = x
            h = self._norm(x, lp["norm2"])
            if self.v3:
                x = res + _dense(jax.nn.silu(_dense(h, lp["fc1"])), lp["fc2"])
            elif self.v25:
                gate = jax.nn.silu(_dense(h, lp["gate_proj"]))
                x = res + _dense(gate * _dense(h, lp["up_proj"]), lp["down_proj"])
            else:
                x = res + _dense(jax.nn.gelu(_dense(h, lp["fc1"])), lp["fc2"])

        # spatial merger: group merge_size x merge_size neighborhoods
        m = self.merge_size
        h_ = self.hidden_size
        x = self._norm(x, params["merger_ln_q"])
        x = x.reshape(b, g // m, m, g // m, m, h_).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (g // m) * (g // m), m * m * h_)
        x = _dense(jax.nn.gelu(_dense(x, params["merger_fc1"])),
                   params["merger_fc2"])
        return x

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            # Qwen3-VL naming: mlp.linear_fc1/2, merger.norm/linear_fc1/2
            name = (name.replace(".linear_fc1.", ".fc1." if ".mlp." in name
                                 else ".linear_fc1.")
                    .replace(".linear_fc2.", ".fc2." if ".mlp." in name
                             else ".linear_fc2."))
            name = name.replace("merger.norm.", "merger.ln_q.")
            name = name.replace("merger.linear_fc1.", "merger.mlp.0.")
            name = name.replace("merger.linear_fc2.", "merger.mlp.2.")
            a = np.asarray(arr)
            if name == "patch_embed.proj.weight" and a.ndim == 2:
                # Qwen3-VL linear proj [h, C*T*P*P] -> conv layout
                h = a.shape[0]
                tp, ps = self.temporal_patch_size, self.patch_size
                a = a.reshape(h, 3, tp, ps, ps)
                w = a.transpose(2, 3, 4, 1, 0).reshape(tp, -1, h)
                params["patch_embed"]["weight"] = jnp.asarray(
                    w.reshape(-1, h), self.dtype
                )
            elif name == "patch_embed.proj.bias":
                params["patch_embed"]["bias"] = jnp.asarray(a, self.dtype)
            elif name == "patch_embed.proj.weight":
                # conv3d [h, 3, tp, ps, ps] -> dense [tp*ps*ps*3, h]
                # our patch layout is [ps*ps*3] repeated tp times
                h = a.shape[0]
                tp = a.shape[2]
                w = a.transpose(2, 3, 4, 1, 0).reshape(tp, -1, h)  # [tp, ps*ps*3, h]
                params["patch_embed"]["weight"] = jnp.asarray(
                    w.reshape(-1, h), self.dtype
                )
            elif name.startswith("blocks."):
                parts = name.split(".")
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                if sub in ("norm1", "norm2"):
                    lp[sub][parts[3]] = jnp.asarray(a, self.dtype)
                elif sub == "attn":
                    leaf = parts[4]
                    if parts[3] in ("q", "k", "v"):
                        # Qwen2.5-Omni ViT ships split q/k/v; fuse into
                        # the qkv tensor ([h, 3h] weight / [3h] bias)
                        node = lp["qkv"]
                        h3 = node["weight"].shape[1]
                        off = ("q", "k", "v").index(parts[3]) * (h3 // 3)
                        if leaf == "weight":
                            node["weight"] = (
                                node["weight"]
                                .at[:, off : off + h3 // 3]
                                .set(jnp.asarray(a.T, self.dtype))
                            )
                        else:
                            node.setdefault(
                                "bias", jnp.zeros((h3,), self.dtype)
                            )
                            node["bias"] = (
                                node["bias"]
                                .at[off : off + h3 // 3]
                                .set(jnp.asarray(a, self.dtype))
                            )
                    else:
                        lp[parts[3]][leaf] = jnp.asarray(
                            a.T if leaf == "weight" else a, self.dtype
                        )
                elif sub == "mlp":
                    leaf = parts[4]
                    lp[parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
            elif name.startswith("merger."):
                parts = name.split(".")
                if parts[1] == "ln_q":
                    params["merger_ln_q"][parts[2]] = jnp.asarray(a, self.dtype)
                elif parts[1] == "mlp":
                    dest = "merger_fc1" if parts[2] == "0" else "merger_fc2"
                    params[dest][parts[3]] = jnp.asarray(
                        a.T if parts[3] == "weight" else a, self.dtype
                    )
        return params


class Qwen2VLForConditionalGeneration(VlmBase):
    """Qwen2-VL (reference models/qwen2_vl.rs). Text side = Qwen2; vision
    side = Qwen2VLVisionTower. mrope simplification noted in module doc."""

    _v25 = False

    def _build(self, ex: dict):
        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "Qwen2ForCausalLM")
        else:
            # Qwen2-VL keeps text keys at the top level of config.json;
            # reuse the parsed parent config with the text architecture.
            import dataclasses

            from . import from_config

            self.text_config = dataclasses.replace(
                self.config, architectures=["Qwen2ForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = Qwen2VLVisionTower(dict(ex.get("vision_config", {})),
                                         dtype=self.dtype, v25=self._v25)
        self.image_token_index = int(ex.get("image_token_id", 151655))
        self.tokens_per_image = self.vision.merged_patches

    def _init_projector(self, rng, scale):
        return {}  # merger lives inside the tower

    def _route_weight(self, name: str):
        if name.startswith("visual."):
            return "vision", name.removeprefix("visual.")
        if name.startswith("model.visual."):
            return "vision", name.removeprefix("model.visual.")
        if name.startswith("model.language_model."):
            return "lm", "model." + name.removeprefix("model.language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def _load_projector(self, raw):
        return {}

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision(params["vision_tower"], pixel_values)
        return x.reshape(-1, x.shape[-1])


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen2.5-VL: RMSNorm + SwiGLU ViT blocks, window attention folded
    into full attention at the fixed preprocessor grid
    (reference models/qwen2_5_vl.rs)."""

    _v25 = True


# ---------------------------------------------------------------------------
# InternVL
# ---------------------------------------------------------------------------


class InternVLChatModel(VlmBase):
    """InternViT (BEiT-style tower, vision.py InternVLVisionTower) +
    HF-exact pixel-shuffle 0.5 + LayerNorm/MLP projector + Qwen2/
    InternLM2 LM (reference models/internvl.rs). Anchored greedy-exact
    vs transformers InternVLForConditionalGeneration with a real image
    in tests/test_hf_parity_vlm2.py (r4)."""

    def _build(self, ex: dict):
        llm_cfg = ex.get("llm_config", ex.get("text_config", {}))
        self._make_text_model(llm_cfg, "Qwen2ForCausalLM")
        from .vision import InternVLVisionTower

        vis_cfg = dict(ex.get("vision_config", {}))
        self.vision = InternVLVisionTower(vis_cfg, dtype=self.dtype)
        self.downsample = float(ex.get("downsample_ratio", 0.5))
        self.image_token_index = int(
            ex.get("image_token_id",
                   ex.get("image_token_index",
                          ex.get("img_context_token_id", 151667)))
        )
        g = int(self.vision.num_patches**0.5)
        out = int(g * self.downsample)
        self.grid = g
        self.out_grid = out
        self.tokens_per_image = out * out
        self.shuffle = g // out

    def _init_projector(self, rng, scale):
        h_v = self.vision.hidden_size * self.shuffle**2
        h_t = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "norm": {"weight": jnp.ones((h_v,), self.dtype),
                     "bias": jnp.zeros((h_v,), self.dtype)},
            "fc1": {"weight": self._w(r1, (h_v, h_t), scale),
                    "bias": jnp.zeros((h_t,), self.dtype)},
            "fc2": {"weight": self._w(r2, (h_t, h_t), scale),
                    "bias": jnp.zeros((h_t,), self.dtype)},
        }

    def _route_weight(self, name: str):
        # current HF naming (InternVLForConditionalGeneration)
        if name.startswith("model.vision_tower."):
            return "vision", name.removeprefix("model.vision_tower.")
        if name.startswith("model.language_model."):
            return "lm", "model." + name.removeprefix("model.language_model.")
        if name.startswith("lm_head."):
            return "lm", name
        if name.startswith("model.multi_modal_projector."):
            rest = name.removeprefix("model.multi_modal_projector.")
            mod, leaf = rest.split(".", 1)
            dest = {"layer_norm": "norm", "linear_1": "fc1",
                    "linear_2": "fc2"}.get(mod)
            if dest:
                return "proj", f"{dest}.{leaf}"
            return None
        # legacy community naming (OpenGVLab InternVLChatModel)
        if name.startswith("vision_model."):
            return "vision", name.removeprefix("vision_model.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith("mlp1."):
            idx = name.split(".")[1]
            leaf = name.split(".")[2]
            dest = {"0": "norm", "1": "fc1", "3": "fc2"}.get(idx)
            if dest:
                return "proj", f"{dest}.{leaf}"
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        feats = feats[:, 1:, :]  # drop CLS ("default" select strategy)
        b, n, c = feats.shape
        g = self.grid
        s = self.downsample  # 0.5
        # HF InternVLModel.pixel_shuffle, translated verbatim
        x = feats.reshape(b, g, g, c)
        x = x.reshape(b, g, int(g * s), int(c / s))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, int(g * s), int(g * s), int(c / (s * s)))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, self.tokens_per_image, int(c / (s * s)))
        p = params["projector"]
        x = _layer_norm(x, p["norm"], 1e-5)
        x = _dense(x, p["fc1"])
        x = jax.nn.gelu(x, approximate=False)  # HF ACT2FN["gelu"] = erf
        x = _dense(x, p["fc2"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# Idefics3 / SmolVLM
# ---------------------------------------------------------------------------


class Idefics3ForConditionalGeneration(VlmBase):
    """SigLIP + pixel-shuffle connector + Llama LM
    (reference models/idefics3.rs). SmolVLM shares the arch."""

    def _build(self, ex: dict):
        from .vision import Idefics3VisionTower

        self._make_text_model(ex.get("text_config", {}), "LlamaForCausalLM")
        self.vision = Idefics3VisionTower(dict(ex.get("vision_config", {})),
                                          dtype=self.dtype)
        self.scale_factor = int(ex.get("scale_factor", 2))
        self.image_token_index = int(ex.get("image_token_id", 128257))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.tokens_per_image = (g // self.scale_factor) ** 2

    def _init_projector(self, rng, scale):
        h_in = self.vision.hidden_size * self.scale_factor**2
        return {
            "proj": {"weight": self._w(rng, (h_in, self.text_config.hidden_size),
                                       scale)}
        }

    def _route_weight(self, name: str):
        if "vision_model." in name:
            return "vision", name.split("vision_model.", 1)[1]
        if name.startswith("model.text_model."):
            return "lm", "model." + name.removeprefix("model.text_model.")
        if name.startswith("lm_head."):
            return "lm", name
        if "connector.modality_projection.proj" in name:
            return "proj", "proj." + name.rsplit(".", 1)[1]
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, h = feats.shape
        g, s = self.grid, self.scale_factor
        # HF Idefics3Connector.pixel_shuffle, translated verbatim (the
        # final permute restores row-major (h/s, w/s) token order — r4
        # fix caught by the parity anchor)
        x = feats.reshape(b, g, g // s, s * h)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, g // s, g // s, s * s * h)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, (g // s) ** 2, s * s * h)
        x = _dense(x, params["projector"]["proj"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# Pixtral / Mistral3
# ---------------------------------------------------------------------------


class PixtralVisionTower:
    """Pixtral ViT: RMSNorm, 2-D rope attention, SwiGLU MLP
    (reference models/pixtral.rs)."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 1024))
        self.image_size = int(cfg.get("image_size", 1024))
        self.patch_size = int(cfg.get("patch_size", 16))
        self.num_layers = int(cfg.get("num_hidden_layers", 24))
        self.num_heads = int(cfg.get("num_attention_heads", 16))
        self.intermediate_size = int(cfg.get("intermediate_size", 4096))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h, inter = self.hidden_size, self.intermediate_size
        n_keys = self.num_layers * 7 + 1
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "attention_norm": jnp.ones((h,), d),
                "wq": w(next(keys), (h, h)),
                "wk": w(next(keys), (h, h)),
                "wv": w(next(keys), (h, h)),
                "wo": w(next(keys), (h, h)),
                "ffn_norm": jnp.ones((h,), d),
                "w1": w(next(keys), (h, inter)),
                "w3": w(next(keys), (h, inter)),
                "w2": w(next(keys), (inter, h)),
            })
        return {
            "patch_conv": w(next(keys), (self.patch_size * self.patch_size * 3, h)),
            "ln_pre": jnp.ones((h,), d),
            "layers": layers,
        }

    def load_weights(self, weights):
        params = self.init_params(rng=None)
        name_map = {"q_proj": "wq", "k_proj": "wk", "v_proj": "wv",
                    "o_proj": "wo", "gate_proj": "w1", "up_proj": "w3",
                    "down_proj": "w2"}
        for name, arr in weights:
            a = np.asarray(arr)
            if name == "patch_conv.weight":
                params["patch_conv"] = jnp.asarray(
                    a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]), self.dtype
                )
            elif name == "ln_pre.weight":
                params["ln_pre"] = jnp.asarray(a, self.dtype)
            elif name.startswith("transformer.layers."):
                parts = name.split(".")
                lp = params["layers"][int(parts[2])]
                if parts[3] in ("attention_norm", "ffn_norm"):
                    lp[parts[3]] = jnp.asarray(a, self.dtype)
                elif parts[3] in ("attention", "feed_forward"):
                    key = name_map.get(parts[4], parts[4])
                    lp[key] = jnp.asarray(a.T, self.dtype)
        return params

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = x @ params["patch_conv"]
        x = _rms_norm(x, params["ln_pre"])
        cos, sin = _rope_2d(g, self.head_dim)
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _rms_norm(x, lp["attention_norm"])
            q = (h @ lp["wq"]).reshape(b, t, nh, hd)
            k = (h @ lp["wk"]).reshape(b, t, nh, hd)
            v = (h @ lp["wv"]).reshape(b, t, nh, hd)
            q = _apply_rope_half(q.astype(jnp.float32), cos, sin)
            k = _apply_rope_half(k.astype(jnp.float32), cos, sin)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
            x = res + ctx.reshape(b, t, -1).astype(x.dtype) @ lp["wo"]
            res = x
            h = _rms_norm(x, lp["ffn_norm"])
            x = res + (jax.nn.silu(h @ lp["w1"]) * (h @ lp["w3"])) @ lp["w2"]
        return x


class PixtralForConditionalGeneration(VlmBase):
    """Pixtral tower + LLaVA-style 2-layer projector + Mistral LM
    (reference models/pixtral.rs). Mistral3 shares the arch with an
    extra pre-projector spatial merge handled by the fixed grid here."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "MistralForCausalLM")
        self.vision = PixtralVisionTower(dict(ex.get("vision_config", {})),
                                         dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 10))
        self.tokens_per_image = self.vision.num_patches

    def _init_projector(self, rng, scale):
        h_v, h_t = self.vision.hidden_size, self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "linear_1": {"weight": self._w(r1, (h_v, h_t), scale),
                         "bias": jnp.zeros((h_t,), self.dtype)},
            "linear_2": {"weight": self._w(r2, (h_t, h_t), scale),
                         "bias": jnp.zeros((h_t,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if "vision_tower." in name:  # Mistral3 nests under model.
            return "vision", name.split("vision_tower.", 1)[1]
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if "multi_modal_projector." in name:
            return "proj", name.split("multi_modal_projector.", 1)[1]
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        x = _dense(feats, p["linear_1"])
        x = jax.nn.gelu(x, approximate=False)  # HF ACT2FN["gelu"] is exact
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


class Mistral3ForConditionalGeneration(PixtralForConditionalGeneration):
    """Mistral-Small-3.1 vision: Pixtral tower, then (unlike Pixtral)
    RMSNorm over vision features -> spatial patch merger (unfold m x m
    blocks, channel-major, through merging_layer) -> 2-layer projector
    (HF Mistral3MultiModalProjector / Mistral3PatchMerger; reference
    models/pixtral.rs Mistral3 branch). r5 anchor caught the previous
    pass-through (no norm/merger, 4x token overcount)."""

    def _build(self, ex: dict):
        super()._build(ex)
        self.merge = int(ex.get("spatial_merge_size", 2))
        self.proj_bias = bool(ex.get("multimodal_projector_bias", False))
        self.tokens_per_image = self.vision.num_patches // self.merge**2

    def _init_projector(self, rng, scale):
        h_v, h_t = self.vision.hidden_size, self.text_config.hidden_size
        m = self.merge
        r1, r2, r3 = (
            jax.random.split(rng, 3) if rng is not None else (None,) * 3
        )
        proj = {
            "norm": jnp.ones((h_v,), self.dtype),
            "merging_layer": {
                "weight": self._w(r3, (h_v * m * m, h_v), scale)
            },
            "linear_1": {"weight": self._w(r1, (h_v, h_t), scale)},
            "linear_2": {"weight": self._w(r2, (h_t, h_t), scale)},
        }
        if self.proj_bias:
            proj["linear_1"]["bias"] = jnp.zeros((h_t,), self.dtype)
            proj["linear_2"]["bias"] = jnp.zeros((h_t,), self.dtype)
        return proj

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            a = np.asarray(arr)
            if name == "norm.weight":
                proj["norm"] = jnp.asarray(a, self.dtype)
            elif name.startswith("patch_merger.merging_layer."):
                leaf = name.rsplit(".", 1)[1]
                proj["merging_layer"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype
                )
            else:
                block, leaf = name.split(".", 1)
                if block in proj and isinstance(proj[block], dict):
                    proj[block][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, d = feats.shape
        p = params["projector"]
        x = _rms_norm(feats, p["norm"], eps=1e-5)
        # PatchMerger: unfold m x m spatial blocks, channel-major rows
        # (torch.nn.functional.unfold layout: d outer, then ki, kj)
        g = int(n**0.5)
        m = self.merge
        x = x.reshape(b, g, g, d).transpose(0, 3, 1, 2)  # [b, d, g, g]
        x = x.reshape(b, d, g // m, m, g // m, m)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, (g // m) ** 2, d * m * m
        )
        x = _dense(x, p["merging_layer"])
        x = _dense(x, p["linear_1"])
        x = jax.nn.gelu(x, approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# LLaVA-NeXT (base-resolution path)
# ---------------------------------------------------------------------------


class LlavaNextForConditionalGeneration(VlmBase):
    """LLaVA-NeXT with full anyres serving (r4): plain [3, S, S] inputs
    run the base-resolution path; (pixel_values [P, 3, S, S], image_size)
    inputs run the HF-exact anyres pipeline — per-tile tower+projector,
    spatial re-stitch, aspect unpad, image_newline rows — via
    ``encode_anyres`` (multimodal/anyres.py; reference
    models/llava_next.rs). Anchored greedy-exact vs transformers in
    tests/test_hf_parity_vlm2.py."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "LlamaForCausalLM")
        vis_cfg = dict(ex.get("vision_config", {}))
        tower_cls = (SiglipVisionTower
                     if "siglip" in vis_cfg.get("model_type", "clip")
                     else CLIPVisionTower)
        self.vision = tower_cls(vis_cfg, dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_index", 32000))
        self.feature_layer = int(ex.get("vision_feature_layer", -2))
        self.select_strategy = ex.get("vision_feature_select_strategy", "default")
        self.tokens_per_image = self.vision.num_patches
        s = self.vision.image_size
        self.grid_pinpoints = [
            tuple(p) for p in ex.get("image_grid_pinpoints") or [(s, 2 * s), (2 * s, s), (2 * s, 2 * s)]
        ]

    @property
    def max_image_tokens(self) -> int:
        """Worst-case anyres token count: base + largest tile grid +
        one newline per stitched row (engine mm-buffer sizing)."""
        n = self.tokens_per_image
        g = int(self.vision.num_patches ** 0.5)
        s = self.vision.image_size
        max_tiles = max((h // s) * (w // s) for h, w in self.grid_pinpoints)
        max_rows = max((h // s) * g for h, w in self.grid_pinpoints)
        return n + max_tiles * n + max_rows

    def _init_projector(self, rng, scale):
        h_v, h_t = self.vision.hidden_size, self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "linear_1": {"weight": self._w(r1, (h_v, h_t), scale),
                         "bias": jnp.zeros((h_t,), self.dtype)},
            "linear_2": {"weight": self._w(r2, (h_t, h_t), scale),
                         "bias": jnp.zeros((h_t,), self.dtype)},
            "image_newline": jnp.zeros((h_t,), self.dtype),
        }

    def _route_weight(self, name: str):
        if "vision_tower." in name:
            return "vision", name.split("vision_tower.", 1)[1]
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if "multi_modal_projector." in name:
            return "proj", name.split("multi_modal_projector.", 1)[1]
        if "image_newline" in name:
            return "proj", "image_newline"
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            a = np.asarray(arr)
            if name == "image_newline":
                proj["image_newline"] = jnp.asarray(a, self.dtype)
            else:
                block, leaf = name.split(".", 1)
                proj[block][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype
                )
        return proj

    def _project(self, params, pixel_values: jax.Array) -> jax.Array:
        """tower + projector, per patch: [P, 3, S, S] -> [P, n, Ht]."""
        feats = self.vision(params["vision_tower"], pixel_values,
                            feature_layer=self.feature_layer)
        if self.select_strategy == "default" and self.vision.use_class_token:
            feats = feats[:, 1:]
        p = params["projector"]
        x = _dense(feats, p["linear_1"])
        x = jax.nn.gelu(x, approximate=False)  # HF ACT2FN["gelu"] = erf
        return _dense(x, p["linear_2"])

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self._project(params, pixel_values)
        return x.reshape(-1, x.shape[-1])

    def encode_anyres(self, params, pixel_values: jax.Array,
                      image_size: tuple[int, int]) -> jax.Array:
        """Full anyres serving: patch 0 is the base view, patches 1..P
        the best-fit grid tiles (HF pack_image_features semantics)."""
        from ..multimodal.anyres import pack_anyres_features

        per_patch = np.asarray(
            self._project(params, pixel_values), np.float32
        )
        packed = pack_anyres_features(
            per_patch,
            tuple(image_size),
            self.grid_pinpoints,
            self.vision.image_size,
            int(self.vision.num_patches ** 0.5),
            np.asarray(params["projector"]["image_newline"], np.float32),
        )
        return jnp.asarray(packed, self.dtype)


def register_vlm_breadth(registry: dict) -> None:
    registry.update(
        {
            "PaliGemmaForConditionalGeneration": PaliGemmaForConditionalGeneration,
            "Qwen2VLForConditionalGeneration": Qwen2VLForConditionalGeneration,
            "Qwen2_5_VLForConditionalGeneration": Qwen2_5_VLForConditionalGeneration,
            "InternVLChatModel": InternVLChatModel,
            "InternVLForConditionalGeneration": InternVLChatModel,
            "Idefics3ForConditionalGeneration": Idefics3ForConditionalGeneration,
            "SmolVLMForConditionalGeneration": Idefics3ForConditionalGeneration,
            "PixtralForConditionalGeneration": PixtralForConditionalGeneration,
            "Mistral3ForConditionalGeneration": Mistral3ForConditionalGeneration,
            "LlavaNextForConditionalGeneration": LlavaNextForConditionalGeneration,
            "LlavaOnevisionForConditionalGeneration": LlavaNextForConditionalGeneration,
        }
    )
