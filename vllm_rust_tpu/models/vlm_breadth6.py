"""VLM breadth 6: Aria, Step3-VL.

Reference: models/{aria.rs, step3_vl.rs}.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.moe import MoESpec
from .qwen3_moe import Qwen3MoeForCausalLM
from .vision import SiglipVisionTower, _dense, _layer_norm
from .vlm_breadth import VlmBase


# -- Aria ------------------------------------------------------------------------


class AriaTextMoeForCausalLM(Qwen3MoeForCausalLM):
    """Aria text model (reference aria.rs:447-520): Llama decoder with
    every MLP replaced by an MoE layer — router [E, h], always-active
    shared SwiGLU experts, sparse experts with fused fc1 (gate|up) and
    fc2 weights."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        config.qk_norm = False
        self.attn_specs = tuple(
            self._make_attn_spec(i) for i in range(config.num_hidden_layers)
        )
        inter = config.moe_intermediate_size or config.intermediate_size
        n_shared = int(ex.get("moe_num_shared_experts", 2))
        config.shared_expert_intermediate_size = inter * n_shared
        self.moe_spec = MoESpec(
            num_experts=int(ex.get("moe_num_experts", 8)),
            top_k=int(ex.get("moe_topk", 2)),
            norm_topk_prob=True,
            scoring="softmax",
            act="silu",
            has_shared_expert=n_shared > 0,
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        for lp in params["layers"]:
            sa = lp["self_attn"]
            sa.pop("q_norm", None)
            sa.pop("k_norm", None)
            lp["mlp"].pop("shared_expert_gate", None)
        return params

    def load_weights(self, weights):
        # aria expert naming: experts.fc1 (fused gate|up, [E, 2I, h]) and
        # experts.fc2 ([E, h, I]); router at mlp.router.weight; shared
        # experts at mlp.shared_experts.*
        def gen():
            for name, arr in weights:
                if ".mlp.experts.fc1." in name:
                    a = np.asarray(arr)
                    g, u = np.split(a, 2, axis=1)  # [E, I, h] each
                    for j in range(a.shape[0]):
                        yield (name.replace("experts.fc1",
                                            f"experts.{j}.gate_proj"), g[j])
                        yield (name.replace("experts.fc1",
                                            f"experts.{j}.up_proj"), u[j])
                elif ".mlp.experts.fc2." in name:
                    a = np.asarray(arr)
                    for j in range(a.shape[0]):
                        yield (name.replace("experts.fc2",
                                            f"experts.{j}.down_proj"), a[j])
                else:
                    yield (name.replace(".mlp.shared_experts.",
                                        ".mlp.shared_expert."), arr)
        return super().load_weights(gen())

    def _param_path(self, name: str):
        parts = name.removeprefix("model.").split(".")
        if len(parts) >= 5 and parts[2] == "mlp" and \
                parts[3] == "shared_expert":
            return (["layers", int(parts[1]), "mlp", "shared_expert",
                     parts[4], "weight"], True)
        return super()._param_path(name)


class AriaForConditionalGeneration(VlmBase):
    """Aria (reference models/aria.rs): SigLIP tower (identity
    post-norm) + cross-attention projector (learnable queries with
    external q/k/v projections feeding a fused MHA, then LN + MLP) into
    the Aria Llama-MoE text model."""

    def _build(self, ex: dict):
        self._make_text_model(
            dict(ex.get("text_config", {}),
                 architectures=["AriaTextMoeForCausalLM"]),
            "AriaTextMoeForCausalLM")
        self.vision = SiglipVisionTower(dict(ex.get("vision_config", {})),
                                        dtype=self.dtype)
        self.vision.post_ln_on_output = False  # aria.rs identity post-norm
        self.image_token_index = int(ex.get("image_token_index", 9))
        p2q = ex.get("projector_patch_to_query_dict") or {}
        self.queries = int(
            p2q.get(str(self.vision.num_patches),
                    next(iter(p2q.values()), 128)))
        self.tokens_per_image = self.queries

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        ff = int(self.config.extra.get("vision_feature_hidden",
                                       4 * hv))

        def w(shape):
            return self._w(rng, shape, scale)

        def dense(din, dout, bias=True):
            p = {"weight": w((din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), self.dtype)
            return p

        def ln(size=hv):
            return {"weight": jnp.ones((size,), self.dtype),
                    "bias": jnp.zeros((size,), self.dtype)}

        return {
            "query": w((self.queries, hv)),
            "cross_q": dense(hv, hv, bias=False),
            "cross_k": dense(hv, hv, bias=False),
            "cross_v": dense(hv, hv, bias=False),
            "mha_in": dense(hv, 3 * hv),
            "mha_out": dense(hv, hv),
            "cross_linear": dense(hv, hv),
            "cross_ln": ln(),
            "cross_ln_kv": ln(),
            "post_ln": ln(),
            "ff_in": dense(hv, ff, bias=False),
            "ff_out": dense(ff, ht, bias=False),
        }

    def _route_weight(self, name: str):
        if "vision_tower." in name:
            return "vision", name.split("vision_tower.", 1)[1]
        if name.startswith("multi_modal_projector."):
            return "proj", name.removeprefix("multi_modal_projector.")
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        slot = {
            "query": "query",
            "cross_attn.q_proj": "cross_q",
            "cross_attn.k_proj": "cross_k",
            "cross_attn.v_proj": "cross_v",
            "cross_attn.multihead_attn.out_proj": "mha_out",
            "cross_attn.linear": "cross_linear",
            "cross_attn.layer_norm": "cross_ln",
            "cross_attn.layer_norm_kv": "cross_ln_kv",
            "layer_norm": "post_ln",
            "feed_forward.linear_in": "ff_in",
            "feed_forward.linear_out": "ff_out",
        }
        for name, arr in raw:
            a = np.asarray(arr)
            if name == "query":
                proj["query"] = jnp.asarray(a, self.dtype)
                continue
            if name.startswith("cross_attn.multihead_attn.in_proj"):
                leaf = "weight" if name.endswith("weight") else "bias"
                proj["mha_in"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
                continue
            stem, leaf = name.rsplit(".", 1)
            dest = slot.get(stem)
            if dest:
                proj[dest][leaf] = jnp.asarray(
                    a.T if leaf == "weight" and a.ndim == 2 else a,
                    self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        p = params["projector"]
        b = feats.shape[0]
        hv = self.vision.hidden_size
        nh = max(1, hv // 64)
        hd = hv // nh
        q = _dense(_layer_norm(
            jnp.broadcast_to(p["query"][None], (b, self.queries, hv)),
            p["cross_ln"], 1e-5), p["cross_q"])
        kvn = _layer_norm(feats, p["cross_ln_kv"], 1e-5)
        k = _dense(kvn, p["cross_k"])
        v = _dense(kvn, p["cross_v"])
        wq, wk, wv = jnp.split(p["mha_in"]["weight"], 3, axis=1)
        bq, bk, bv = jnp.split(p["mha_in"]["bias"], 3)
        q2 = (q @ wq + bq).reshape(b, -1, nh, hd)
        k2 = (k @ wk + bk).reshape(b, -1, nh, hd)
        v2 = (v @ wv + bv).reshape(b, -1, nh, hd)
        s = jnp.einsum("bihd,bjhd->bhij", q2.astype(jnp.float32),
                       k2.astype(jnp.float32)) * (hd**-0.5)
        pr = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhij,bjhd->bihd", pr,
                         v2.astype(jnp.float32)).reshape(b, -1, hv)
        out = _dense(_dense(ctx.astype(feats.dtype), p["mha_out"]),
                     p["cross_linear"])
        out = _layer_norm(out, p["post_ln"], 1e-5)
        # MLP: linear_in -> gelu -> linear_out (aria.rs AriaProjectorMlp)
        out = jax.nn.gelu(_dense(out, p["ff_in"]), approximate=False)
        out = _dense(out, p["ff_out"])
        return out.reshape(-1, out.shape[-1])


# -- Step3-VL --------------------------------------------------------------------


class Step3VisionTower:
    """Step3 ViT (reference step3_vl.rs:161-384): conv patch embed + CLS
    + learned positions, pre-norm layers with fused qkv_proj/out_proj
    attention and QuickGELU fc1/fc2 MLP."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 1792))
        self.inter = int(cfg.get("intermediate_size",
                                 self.hidden_size * 4))
        self.num_layers = int(cfg.get("num_hidden_layers",
                                      cfg.get("layers", 4)))
        self.num_heads = int(cfg.get("num_attention_heads",
                                     cfg.get("heads", 16)))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.image_size = int(cfg.get("image_size", 728))
        self.eps = float(cfg.get("layer_norm_eps", 1e-5))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h = self.hidden_size
        n_keys = self.num_layers * 4 + 4
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
                "layer_norm1": ln(), "layer_norm2": ln(),
                "qkv_proj": dense(next(keys), h, 3 * h),
                "out_proj": dense(next(keys), h, h),
                "fc1": dense(next(keys), h, self.inter),
                "fc2": dense(next(keys), self.inter, h),
            })
        return {
            "patch_embedding": dense(next(keys),
                                     self.patch_size**2 * 3, h),
            "class_embedding": w(next(keys), (h,)),
            "position_embedding": w(next(keys), (self.num_patches + 1, h)),
            "layers": layers,
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, H, W] → [B, num_patches, hidden] (CLS dropped)."""
        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embedding"])
        cls = jnp.broadcast_to(params["class_embedding"],
                               (b, 1, self.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["position_embedding"][None]
        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["layer_norm1"], self.eps)
            qkv = _dense(h, lp["qkv_proj"]).reshape(b, t, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * (hd**-0.5)
            pr = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", pr,
                             v.astype(jnp.float32)).reshape(b, t, -1)
            x = res + _dense(ctx.astype(x.dtype), lp["out_proj"])
            res = x
            h = _layer_norm(x, lp["layer_norm2"], self.eps)
            inner = _dense(h, lp["fc1"])
            inner = inner * jax.nn.sigmoid(1.702 * inner)  # QuickGELU
            x = res + _dense(inner, lp["fc2"])
        return x[:, 1:]  # drop CLS (reference drops CLS + 3 TP pads)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            leaf = parts[-1]
            if name.startswith("embeddings.patch_embedding."):
                if leaf == "weight":
                    params["patch_embedding"]["weight"] = jnp.asarray(
                        a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                        self.dtype)
                else:
                    params["patch_embedding"]["bias"] = jnp.asarray(
                        a, self.dtype)
            elif name == "embeddings.class_embedding":
                params["class_embedding"] = jnp.asarray(
                    a.reshape(-1), self.dtype)
            elif name.startswith("embeddings.position_embedding"):
                params["position_embedding"] = jnp.asarray(a, self.dtype)
            elif name.startswith("transformer.layers."):
                lp = params["layers"][int(parts[2])]
                sub = parts[3]
                if sub in ("layer_norm1", "layer_norm2"):
                    lp[sub][leaf] = jnp.asarray(a, self.dtype)
                elif sub == "self_attn":
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                elif sub == "mlp":
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class Step3VLForConditionalGeneration(VlmBase):
    """Step3-VL (reference models/step3_vl.rs): Step3 ViT → Conv2d
    downsampler (kernel 2, stride 1) → Conv2d downsampler2 (kernel 3,
    stride 2, pad 1) → linear projector → Step3-Text MoE."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "Step3TextForCausalLM")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["Step3TextForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = Step3VisionTower(dict(ex.get("vision_config", {})),
                                       dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 128001))
        self.ds_hidden = int(ex.get("understand_projector_stride", 0)) or \
            self.vision.hidden_size * 2
        g = self.vision.grid
        self.tokens_per_image = ((g - 1 + 1) // 2) ** 2  # after both convs

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        d1 = hv * 2  # step3_vl.rs: 1792 -> 4096-ish (2x)
        d2 = d1 * 2

        def w(shape):
            return self._w(rng, shape, scale)

        return {
            "downsampler1": {"weight": w((2 * 2 * hv, d1)),
                             "bias": jnp.zeros((d1,), self.dtype)},
            "downsampler2": {"weight": w((3 * 3 * d1, d2)),
                             "bias": jnp.zeros((d2,), self.dtype)},
            "projector": {"weight": w((d2, ht))},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_model."):
            return "vision", name.removeprefix("vision_model.")
        if name.startswith(("vit_downsampler.", "vit_downsampler2.",
                            "vit_large_projector.")):
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
            if name.startswith("vit_downsampler."):
                if leaf == "weight":  # conv [out, in, 2, 2]
                    proj["downsampler1"]["weight"] = jnp.asarray(
                        a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                        self.dtype)
                else:
                    proj["downsampler1"]["bias"] = jnp.asarray(a, self.dtype)
            elif name.startswith("vit_downsampler2."):
                if leaf == "weight":
                    proj["downsampler2"]["weight"] = jnp.asarray(
                        a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                        self.dtype)
                else:
                    proj["downsampler2"]["bias"] = jnp.asarray(a, self.dtype)
            elif name.startswith("vit_large_projector."):
                proj["projector"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
        return proj

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, hv = feats.shape
        g = int(n**0.5)
        p = params["projector"]
        # conv1: kernel 2, stride 1 -> (g-1)^2 via NHWC lax.conv
        x = feats.reshape(b, g, g, hv)
        w1 = p["downsampler1"]["weight"].reshape(2, 2, hv, -1)
        x = jax.lax.conv_general_dilated(
            x, w1.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p["downsampler1"]["bias"]
        d1 = x.shape[-1]
        # conv2: kernel 3, stride 2, pad 1
        w2 = p["downsampler2"]["weight"].reshape(3, 3, d1, -1)
        x = jax.lax.conv_general_dilated(
            x, w2.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p["downsampler2"]["bias"]
        gm = x.shape[1]
        x = x.reshape(b, gm * gm, -1)
        x = _dense(x, p["projector"])
        return x.reshape(-1, x.shape[-1])


# -- Molmo -----------------------------------------------------------------------


class MolmoForCausalLM(VlmBase):
    """Molmo (reference models/molmo.rs): CLIP tower at
    `vision_backbone.*` + 2×2 spatial pooling + `image_projector` MLP
    into an OLMo-2 text model. The reference's per-pixel attention
    pooling is approximated with mean pooling at the fixed grid
    (documented divergence; the Rust reference also reduces the
    multi-layer VIT_LAYERS extraction to a plain MLP projector)."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config
        from .vision import CLIPVisionTower

        text_cfg = dict(ex.get("text_config", {}))
        if text_cfg:
            self._make_text_model(text_cfg, "Olmo2ForCausalLM")
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=["Olmo2ForCausalLM"]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = CLIPVisionTower(dict(ex.get("vision_config", {})),
                                      dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 152066))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.tokens_per_image = (-(-g // 2)) ** 2

    def _init_projector(self, rng, scale):
        hv = self.vision.hidden_size
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "linear_1": {"weight": self._w(r1, (hv, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
            "linear_2": {"weight": self._w(r2, (ht, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("vision_backbone."):
            return "vision", name.removeprefix("vision_backbone.")
        if name.startswith("image_projector."):
            n = (name.removeprefix("image_projector.")
                 .replace("linear.", "linear_1."))
            return "proj", n
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values,
                            feature_layer=-2)
        feats = feats[:, 1:]  # drop CLS
        b, n, hv = feats.shape
        g = int(n**0.5)
        x = feats.reshape(b, g // 2, 2, g // 2, 2, hv).mean(axis=(2, 4))
        x = x.reshape(b, -1, hv)
        p = params["projector"]
        x = jax.nn.gelu(_dense(x, p["linear_1"]), approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# -- Chameleon -------------------------------------------------------------------


class ChameleonForConditionalGeneration:
    """Chameleon (reference models/chameleon.rs): a llama decoder with
    fused biased qkv, per-head-INDIVIDUAL q/k RMSNorm weights (one
    [head_dim] vector per head, applied before RoPE) and biased MLP.
    Images arrive as discrete VQ-GAN BPE tokens in `input_ids` (the
    reference runs its VQVAE at preprocessing time; `model.vqmodel.*`
    weights are skipped here and images are expected pre-tokenized)."""

    def __new__(cls, config: ModelConfig, dtype: Any = jnp.bfloat16):
        from .llama import LlamaForCausalLM

        class _Chameleon(LlamaForCausalLM):
            qkv_bias = True

            def __init__(self, cfg, dt):
                cfg.qk_norm = True
                super().__init__(cfg, dt)
                scale = float(cfg.extra.get("logit_scale", 1.0))
                if scale and scale != 1.0:
                    # llama compute_logits divides by logits_scaling
                    cfg.logits_scaling = 1.0 / scale

            def init_params(self, rng=None, scale: float = 0.02):
                params = super().init_params(rng, scale)
                cfg = self.config
                h, hd = cfg.hidden_size, cfg.head_dim
                nh, nkv = (cfg.num_attention_heads,
                           cfg.num_key_value_heads)

                def w(shape):
                    if rng is None:
                        return jnp.zeros(shape, self.dtype)
                    return (scale * jax.random.normal(
                        jax.random.PRNGKey(23), shape)).astype(self.dtype)

                for lp in params["layers"]:
                    sa = lp["self_attn"]
                    for key in ("q_proj", "k_proj", "v_proj"):
                        sa.pop(key, None)
                    sa["qkv_proj"] = {
                        "weight": w((h, (nh + 2 * nkv) * hd)),
                        "bias": jnp.zeros(((nh + 2 * nkv) * hd,),
                                          self.dtype),
                    }
                    # per-head-individual norm weights [heads, head_dim]
                    sa["q_norm"] = jnp.ones((nh, hd), self.dtype)
                    sa["k_norm"] = jnp.ones((nkv, hd), self.dtype)
                    for key in ("gate_proj", "up_proj", "down_proj"):
                        lp["mlp"][key]["bias"] = jnp.zeros(
                            lp["mlp"][key]["weight"].shape[1], self.dtype)
                return params

            def load_weights(self, weights):
                cfg = self.config
                params = self.init_params(rng=None)
                for name, arr in weights:
                    if name.startswith("model.vqmodel."):
                        continue  # VQVAE runs at preprocessing time
                    n = name.removeprefix("model.")
                    a = np.asarray(arr)
                    parts = n.split(".")
                    if (len(parts) >= 5 and parts[0] == "layers"
                            and parts[2] == "self_attn"
                            and parts[3] in ("q_norm", "k_norm")):
                        # q_norm.{i}.weight — one row per head
                        sa = params["layers"][int(parts[1])]["self_attn"]
                        sa[parts[3]] = sa[parts[3]].at[int(parts[4])].set(
                            jnp.asarray(a, self.dtype))
                        continue
                    path = self._param_path(name)
                    if path is None:
                        continue
                    tree_path, transpose = path
                    node = params
                    for p in tree_path[:-1]:
                        node = node[p]
                    node[tree_path[-1]] = jnp.asarray(
                        a.T if transpose else a, self.dtype)
                return params

        return _Chameleon(config, dtype)


# -- Isaac -----------------------------------------------------------------------


class IsaacForConditionalGeneration(VlmBase):
    """Isaac (reference models/isaac.rs): SigLIP2 ViT (linear patch
    embed, q/k/v/out attention, fc1/fc2 GELU) → pixel shuffle →
    no-bias linear_fc1 (4× expand) → GELU → linear_fc2 → Qwen3."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Qwen3ForCausalLM")
        vc = dict(ex.get("vision_config", {}))
        self.vision = SiglipVisionTower(vc, dtype=self.dtype)
        self.scale = int(vc.get("pixel_shuffle_scale_factor",
                                ex.get("pixel_shuffle_scale_factor", 2)))
        self.image_token_index = int(ex.get("image_token_id", 9))
        g = int(self.vision.num_patches**0.5)
        self.grid = g
        self.tokens_per_image = (g // self.scale) ** 2

    def _init_projector(self, rng, scale):
        hd = self.vision.hidden_size * self.scale**2
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "linear_fc1": {"weight": self._w(r1, (hd, 4 * hd), scale)},
            "linear_fc2": {"weight": self._w(r2, (4 * hd, ht), scale)},
        }

    def _route_weight(self, name: str):
        n = name.removeprefix("model.")
        for p in ("vision_embedding.transformer.", "vision_tower."):
            if n.startswith(p):
                return "vision", "vision_model." + n.removeprefix(p)
        if n.startswith("vision_embedding."):
            return "proj", n.removeprefix("vision_embedding.")
        if name.startswith(("model.language_model.",)):
            return "lm", "model." + name.removeprefix(
                "model.language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        b, n, c = feats.shape
        g = int(n**0.5)
        s = self.scale
        x = feats.reshape(b, g // s, s, g // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (g // s) ** 2,
                                                  s * s * c)
        p = params["projector"]
        x = jax.nn.gelu(_dense(x, p["linear_fc1"]), approximate=False)
        x = _dense(x, p["linear_fc2"])
        return x.reshape(-1, x.shape[-1])


# -- HunYuan-VL ------------------------------------------------------------------


class HunYuanVisionTower:
    """HunYuan-VL ViT (reference models/hunyuan_vision.rs): conv patch
    embed + bilinear-resized learned positions, pre-norm LayerNorm
    blocks (fused qkv, no-bias o_proj, dense_h_to_4h/4h_to_h GELU), then
    the `perceive` merger: RMS → Conv2d(k=s,s=s)→GELU→Conv2d(k=1) →
    image_newline column per row → linear `mlp` → begin/end tokens →
    RMS."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 1152))
        self.out_hidden = int(cfg.get("out_hidden_size", 4096))
        self.inter = int(cfg.get("intermediate_size",
                                 4 * self.hidden_size))
        self.num_layers = int(cfg.get("num_hidden_layers", 4))
        self.num_heads = int(cfg.get("num_attention_heads", 16))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.merge = int(cfg.get("spatial_merge_size", 2))
        self.image_size = int(cfg.get("image_size", 448))
        self.eps = float(cfg.get("norm_eps", 1e-5))
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid
        self.head_dim = self.hidden_size // self.num_heads
        self.pos_grid = int(cfg.get("num_position_embeddings",
                                    self.num_patches) ** 0.5)

    @property
    def merged_patches(self) -> int:
        gm = self.grid // self.merge
        return gm * (gm + 1) + 2  # + newline column + begin/end

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h = self.hidden_size
        n_keys = self.num_layers * 4 + 8
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

        def ln(size=h):
            return {"weight": jnp.ones((size,), d),
                    "bias": jnp.zeros((size,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "input_layernorm": ln(), "post_attention_layernorm": ln(),
                "qkv": dense(next(keys), h, 3 * h),
                "o_proj": dense(next(keys), h, h, bias=False),
                "dense_h_to_4h": dense(next(keys), h, self.inter),
                "dense_4h_to_h": dense(next(keys), self.inter, h),
            })
        s = self.merge
        return {
            "patch_embed": dense(next(keys), self.patch_size**2 * 3, h),
            "position_embedding": w(next(keys),
                                    (self.pos_grid**2, h)),
            "layers": layers,
            "perceive": {
                "before_rms": jnp.ones((h,), d),
                "conv1": dense(next(keys), s * s * h, 2 * h),
                "conv2": dense(next(keys), 2 * h, 4 * h),
                "mlp": dense(next(keys), 4 * h, self.out_hidden),
                "image_newline": w(next(keys), (4 * h,)),
                "image_begin": w(next(keys), (self.out_hidden,)),
                "image_end": w(next(keys), (self.out_hidden,)),
                "after_rms": jnp.ones((self.out_hidden,), d),
            },
        }

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        from .vlm_breadth import _rms_norm

        b = pixel_values.shape[0]
        ps, g = self.patch_size, self.grid
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embed"])
        pe = params["position_embedding"].reshape(self.pos_grid,
                                                  self.pos_grid, -1)
        if self.pos_grid != g:
            pe = jax.image.resize(pe.astype(jnp.float32),
                                  (g, g, pe.shape[-1]), "bilinear")
        x = x + pe.reshape(1, g * g, -1).astype(x.dtype)

        nh, hd = self.num_heads, self.head_dim
        t = x.shape[1]
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["input_layernorm"], self.eps)
            qkv = _dense(h, lp["qkv"]).reshape(b, t, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * (hd**-0.5)
            pr = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", pr,
                             v.astype(jnp.float32)).reshape(b, t, -1)
            x = res + _dense(ctx.astype(x.dtype), lp["o_proj"])
            res = x
            h = _layer_norm(x, lp["post_attention_layernorm"], self.eps)
            x = res + _dense(
                jax.nn.gelu(_dense(h, lp["dense_h_to_4h"]),
                            approximate=False),
                lp["dense_4h_to_h"])

        pv = params["perceive"]
        x = _rms_norm(x, pv["before_rms"], self.eps)
        m = self.merge
        h_ = self.hidden_size
        gm = g // m
        x = x.reshape(b, gm, m, gm, m, h_).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gm * gm, m * m * h_)
        x = jax.nn.gelu(_dense(x, pv["conv1"]), approximate=False)
        x = _dense(x, pv["conv2"])  # [b, gm*gm, 4h]
        # append the newline separator to every row (hunyuan_vision.rs)
        x = x.reshape(b, gm, gm, -1)
        nl = jnp.broadcast_to(pv["image_newline"],
                              (b, gm, 1, x.shape[-1])).astype(x.dtype)
        x = jnp.concatenate([x, nl], axis=2).reshape(b, gm * (gm + 1), -1)
        x = _dense(x, pv["mlp"])
        x = _rms_norm(x, pv["after_rms"], self.eps)
        begin = jnp.broadcast_to(pv["image_begin"],
                                 (b, 1, self.out_hidden)).astype(x.dtype)
        end = jnp.broadcast_to(pv["image_end"],
                               (b, 1, self.out_hidden)).astype(x.dtype)
        return jnp.concatenate([begin, x, end], axis=1)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            leaf = parts[-1]
            if name.startswith("embeddings.patch_embed") or \
                    name.startswith("embeddings.proj"):
                if leaf == "weight" and a.ndim == 4:
                    params["patch_embed"]["weight"] = jnp.asarray(
                        a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                        self.dtype)
                else:
                    params["patch_embed"][leaf] = jnp.asarray(a, self.dtype)
            elif "position_embedding" in name:
                params["position_embedding"] = jnp.asarray(
                    a.reshape(-1, a.shape[-1]), self.dtype)
            elif name.startswith("layers."):
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                if sub in ("input_layernorm", "post_attention_layernorm"):
                    lp[sub][leaf] = jnp.asarray(a, self.dtype)
                elif sub in ("self_attn", "attn"):
                    slot = "qkv" if parts[3] in ("qkv", "qkv_proj") \
                        else "o_proj"
                    lp[slot][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                elif sub == "mlp":
                    lp[parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
            elif name.startswith("perceive."):
                pv = params["perceive"]
                if parts[1] in ("before_rms", "after_rms"):
                    pv[parts[1]] = jnp.asarray(a, self.dtype)
                elif parts[1] in ("image_newline", "image_begin",
                                  "image_end"):
                    pv[parts[1]] = jnp.asarray(a.reshape(-1), self.dtype)
                elif parts[1] == "proj":
                    slot = "conv1" if parts[2] == "0" else "conv2"
                    if leaf == "weight":  # conv [out, in, k, k]
                        pv[slot]["weight"] = jnp.asarray(
                            a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]),
                            self.dtype)
                    else:
                        pv[slot]["bias"] = jnp.asarray(a, self.dtype)
                elif parts[1] == "mlp":
                    pv["mlp"][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class HunYuanVLForConditionalGeneration(VlmBase):
    """HunYuan-VL (reference models/hunyuan_vision.rs): HunYuan ViT +
    perceive merger into the HunYuan dense/MoE text model (MoE when
    the config carries expert counts)."""

    def _build(self, ex: dict):
        import dataclasses

        from . import from_config

        text_cfg = dict(ex.get("text_config", {}))
        arch = ("HunYuanMoEV1ForCausalLM"
                if (text_cfg.get("num_experts")
                    or ex.get("num_experts")
                    or text_cfg.get("moe_topk") or ex.get("moe_topk"))
                else "HunYuanDenseV1ForCausalLM")
        if text_cfg:
            self._make_text_model(text_cfg, arch)
        else:
            self.text_config = dataclasses.replace(
                self.config, architectures=[arch]
            )
            self.lm = from_config(self.text_config, dtype=self.dtype)
        self.vision = HunYuanVisionTower(dict(ex.get("vision_config", {})),
                                         dtype=self.dtype)
        self.image_token_index = int(ex.get("image_token_id", 127962))
        self.tokens_per_image = self.vision.merged_patches

    def _init_projector(self, rng, scale):
        return {}

    def _load_projector(self, raw):
        return {}

    def _route_weight(self, name: str):
        for p in ("visual.", "model.visual."):
            if name.startswith(p):
                return "vision", name.removeprefix(p)
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision(params["vision_tower"], pixel_values)
        return x.reshape(-1, x.shape[-1])


def register_vlm_breadth6(registry: dict) -> None:
    registry.update({
        "AriaForConditionalGeneration": AriaForConditionalGeneration,
        "AriaTextMoeForCausalLM": AriaTextMoeForCausalLM,
        "Step3VLForConditionalGeneration": Step3VLForConditionalGeneration,
        "StepVLForConditionalGeneration": Step3VLForConditionalGeneration,
        "MolmoForCausalLM": MolmoForCausalLM,
        "ChameleonForConditionalGeneration":
            ChameleonForConditionalGeneration,
        "IsaacForConditionalGeneration": IsaacForConditionalGeneration,
        "HunYuanVLForConditionalGeneration":
            HunYuanVLForConditionalGeneration,
    })
