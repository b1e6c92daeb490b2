"""Vision towers: CLIP and SigLIP ViT encoders.

Reference: crates/core/src/models/{clip,siglip}.rs (the vision encoders
behind ~40 VLM archs, multimodal/vision.rs preprocessing). One-shot
bidirectional transformers over image patches — jitted per image batch,
run once per request at admission (the engine caches the projected
embeddings per slot; see engine/vlm.py).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def _layer_norm(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]).astype(
        x.dtype
    )


def _dense(x, p):
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    # HF ACT2FN["gelu"] is the exact (erf) GELU; jax.nn.gelu defaults to
    # the tanh approximation, which breaks greedy-exact parity
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": jax.nn.gelu,
    "gelu_pytorch_tanh": jax.nn.gelu,
    "quick_gelu": _quick_gelu,
}


class VisionTower:
    """Shared ViT encoder for CLIP (class token, pre-layernorm) and
    SigLIP (no class token) variants."""

    use_class_token = False
    use_pre_layernorm = False
    # CLIP applies post_layernorm only to the pooled CLS token; its
    # last_hidden_state is un-normalized. SigLIP normalizes the sequence.
    post_ln_on_output = True
    default_act = "gelu_pytorch_tanh"

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 768))
        self.image_size = int(cfg.get("image_size", 224))
        self.patch_size = int(cfg.get("patch_size", 14))
        self.num_layers = int(cfg.get("num_hidden_layers", 12))
        self.num_heads = int(cfg.get("num_attention_heads", 12))
        self.intermediate_size = int(cfg.get("intermediate_size", 3072))
        self.eps = float(cfg.get("layer_norm_eps", 1e-6))
        self.act = _ACTS[cfg.get("hidden_act", self.default_act)]
        self.num_patches = (self.image_size // self.patch_size) ** 2
        self.num_positions = self.num_patches + (1 if self.use_class_token else 0)

    # -- params ---------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h, inter = self.hidden_size, self.intermediate_size
        p, ps = self.patch_size, self.patch_size

        n_keys = self.num_layers * 6 + 3
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def dense(key, din, dout):
            return {"weight": w(key, (din, dout)), "bias": jnp.zeros((dout,), d)}

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append(
                {
                    "layer_norm1": ln(),
                    "q_proj": dense(next(keys), h, h),
                    "k_proj": dense(next(keys), h, h),
                    "v_proj": dense(next(keys), h, h),
                    "out_proj": dense(next(keys), h, h),
                    "layer_norm2": ln(),
                    "fc1": dense(next(keys), h, inter),
                    "fc2": dense(next(keys), inter, h),
                }
            )
        params = {
            # conv patch embed as a dense over flattened patches [ps*ps*3, h]
            "patch_embedding": {
                "weight": w(next(keys), (ps * ps * 3, h)),
                "bias": jnp.zeros((h,), d),
            },
            "position_embedding": w(next(keys), (self.num_positions, h)),
            "layers": layers,
            "post_layernorm": ln(),
        }
        if self.use_class_token:
            params["class_embedding"] = w(next(keys), (h,))
        if self.use_pre_layernorm:
            params["pre_layernorm"] = ln()
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """HF CLIPVisionModel / SiglipVisionModel naming."""
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = (
                name.removeprefix("vision_model.")
                .removeprefix("vision_tower.")
                .removeprefix("vision_model.")
            )
            a = np.asarray(arr)
            if name == "embeddings.patch_embedding.weight":
                # HF conv2d [h, 3, ps, ps] -> dense over [ps, ps, 3] patches
                params["patch_embedding"]["weight"] = jnp.asarray(
                    a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]), self.dtype
                )
            elif name == "embeddings.patch_embedding.bias":
                params["patch_embedding"]["bias"] = jnp.asarray(a, self.dtype)
            elif name == "embeddings.position_embedding.weight":
                params["position_embedding"] = jnp.asarray(a, self.dtype)
            elif name == "embeddings.class_embedding":
                params["class_embedding"] = jnp.asarray(a, self.dtype)
            elif name.startswith(("pre_layrnorm.", "pre_layernorm.")):
                params["pre_layernorm"][name.split(".")[1]] = jnp.asarray(
                    a, self.dtype
                )
            elif name.startswith("post_layernorm."):
                params["post_layernorm"][name.split(".")[1]] = jnp.asarray(
                    a, self.dtype
                )
            elif name.startswith("encoder.layers."):
                parts = name.split(".")
                lp = params["layers"][int(parts[2])]
                sub = parts[3]
                if sub == "self_attn":
                    leaf = parts[5]
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                elif sub == "mlp":
                    leaf = parts[5]
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                else:  # layer_norm1 / layer_norm2
                    lp[sub][parts[4]] = jnp.asarray(a, self.dtype)
        return params

    def _position_ids(self, t):
        """Optional override: explicit position-embedding row per patch
        (None = identity / arange)."""
        return None

    # -- forward ----------------------------------------------------------------

    def __call__(
        self, params, pixel_values: jax.Array, *, feature_layer: int | None = None
    ) -> jax.Array:
        """pixel_values [B, 3, H, W] -> hidden [B, positions, hidden].

        ``feature_layer``: stop at this layer index (negative from end,
        LLaVA uses -2) and skip the post layernorm."""
        b = pixel_values.shape[0]
        ps = self.patch_size
        g = self.image_size // ps
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)  # BHWC
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embedding"])
        if self.use_class_token:
            cls = jnp.broadcast_to(
                params["class_embedding"], (b, 1, self.hidden_size)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
        pos_ids = self._position_ids(x.shape[1])
        if pos_ids is None:
            x = x + params["position_embedding"][None, : x.shape[1]]
        else:
            x = x + params["position_embedding"][jnp.asarray(pos_ids)][None]
        if self.use_pre_layernorm:
            x = _layer_norm(x, params["pre_layernorm"], self.eps)

        nh = self.num_heads
        hd = self.hidden_size // nh
        t = x.shape[1]
        n_layers = self.num_layers
        if feature_layer is not None:
            n_layers = feature_layer % self.num_layers + 1

        for lp in params["layers"][:n_layers]:
            res = x
            h = _layer_norm(x, lp["layer_norm1"], self.eps)
            q = _dense(h, lp["q_proj"]).reshape(b, t, nh, hd) * (hd**-0.5)
            k = _dense(h, lp["k_proj"]).reshape(b, t, nh, hd)
            v = _dense(h, lp["v_proj"]).reshape(b, t, nh, hd)
            scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                                k.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
            x = res + _dense(ctx.reshape(b, t, -1).astype(x.dtype),
                             lp["out_proj"])
            res = x
            h = _layer_norm(x, lp["layer_norm2"], self.eps)
            x = res + _dense(self.act(_dense(h, lp["fc1"])), lp["fc2"])
        if feature_layer is None and self.post_ln_on_output:
            x = _layer_norm(x, params["post_layernorm"], self.eps)
        return x


class CLIPVisionTower(VisionTower):
    use_class_token = True
    use_pre_layernorm = True
    post_ln_on_output = False
    default_act = "quick_gelu"


class SiglipVisionTower(VisionTower):
    use_class_token = False
    use_pre_layernorm = False
    default_act = "gelu_pytorch_tanh"


class Idefics3VisionTower(SiglipVisionTower):
    """Idefics3/SmolVLM vision transformer: SigLIP body, but position
    ids come from HF's fractional-coordinate bucketization
    (modeling_idefics3.py Idefics3VisionEmbeddings.forward) — which for
    an n x n grid with n == num_patches_per_side yields [0, 0, 1, ...,
    n-2] per axis (the *(1-1e-6) shrink drops every coordinate just
    below its own boundary). Greedy parity requires replicating it."""

    def _position_ids(self, t):
        import math

        n = int(math.isqrt(t))
        side = self.image_size // self.patch_size
        frac = np.arange(n) / n * (1 - 1e-6)
        boundaries = np.arange(1, side) / side
        bucket = np.searchsorted(boundaries, frac, side="right")
        return (bucket[:, None] * side + bucket[None, :]).reshape(-1)


class InternVLVisionTower:
    """InternViT (BEiT-style) encoder behind InternVL / NVLM-D.

    Reference: crates/core/src/models/internvl.rs vision half; HF
    `InternVLVisionModel` semantics matched op-for-op: conv patch embed,
    CLS token, absolute position embeddings over [1+P], pre-LN blocks
    with layer-scale (lambda_1/lambda_2), separate q/k/v (optional
    full-width qk RMSNorm), and an Identity final norm when
    use_mean_pooling (the default for InternVL checkpoints)."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.hidden_size = int(cfg.get("hidden_size", 1024))
        self.image_size = int(
            cfg.get("image_size", 448)
            if not isinstance(cfg.get("image_size"), (list, tuple))
            else cfg["image_size"][0]
        )
        self.patch_size = int(
            cfg.get("patch_size", 14)
            if not isinstance(cfg.get("patch_size"), (list, tuple))
            else cfg["patch_size"][0]
        )
        self.num_layers = int(cfg.get("num_hidden_layers", 24))
        self.num_heads = int(cfg.get("num_attention_heads", 16))
        self.intermediate_size = int(cfg.get("intermediate_size", 4096))
        self.eps = float(cfg.get("layer_norm_eps", 1e-6))
        self.act = _ACTS[cfg.get("hidden_act", "gelu")]
        self.qk_norm = bool(cfg.get("use_qk_norm", False))
        self.attention_bias = bool(cfg.get("attention_bias", False))
        self.mean_pooling = bool(cfg.get("use_mean_pooling", True))
        self.num_patches = (self.image_size // self.patch_size) ** 2
        self.num_positions = self.num_patches + 1  # + CLS

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h, inter = self.hidden_size, self.intermediate_size
        ps = self.patch_size
        n_keys = self.num_layers * 6 + 2
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def dense(key, din, dout, bias=True):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(self.num_layers):
            lp = {
                "layernorm_before": ln(),
                "layernorm_after": ln(),
                "q_proj": dense(next(keys), h, h, self.attention_bias),
                "k_proj": dense(next(keys), h, h, self.attention_bias),
                "v_proj": dense(next(keys), h, h, self.attention_bias),
                "projection_layer": dense(next(keys), h, h),
                "fc1": dense(next(keys), h, inter),
                "fc2": dense(next(keys), inter, h),
                "lambda_1": jnp.full((h,), 0.1, d),
                "lambda_2": jnp.full((h,), 0.1, d),
            }
            if self.qk_norm:
                lp["q_norm"] = {"weight": jnp.ones((h,), d)}
                lp["k_norm"] = {"weight": jnp.ones((h,), d)}
            layers.append(lp)
        params = {
            "patch_embedding": {
                "weight": w(next(keys), (ps * ps * 3, h)),
                "bias": jnp.zeros((h,), d),
            },
            "cls_token": jnp.zeros((h,), d),
            "position_embeddings": w(next(keys), (self.num_positions, h)),
            "layers": layers,
        }
        if not self.mean_pooling:
            params["final_layernorm"] = ln()
        return params

    def load_weights(self, weights):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            if name == "embeddings.patch_embeddings.projection.weight":
                params["patch_embedding"]["weight"] = jnp.asarray(
                    a.transpose(2, 3, 1, 0).reshape(-1, a.shape[0]), self.dtype
                )
            elif name == "embeddings.patch_embeddings.projection.bias":
                params["patch_embedding"]["bias"] = jnp.asarray(a, self.dtype)
            elif name == "embeddings.cls_token":
                params["cls_token"] = jnp.asarray(a.reshape(-1), self.dtype)
            elif name == "embeddings.position_embeddings":
                params["position_embeddings"] = jnp.asarray(
                    a.reshape(-1, a.shape[-1]), self.dtype
                )
            elif name.startswith("layernorm."):
                if "final_layernorm" in params:
                    params["final_layernorm"][name.split(".")[1]] = jnp.asarray(
                        a, self.dtype
                    )
            elif name.startswith("encoder.layer."):
                parts = name.split(".")
                lp = params["layers"][int(parts[2])]
                sub = parts[3]
                if sub in ("lambda_1", "lambda_2"):
                    lp[sub] = jnp.asarray(a, self.dtype)
                elif sub == "attention":
                    mod, leaf = parts[4], parts[5]
                    if mod in ("q_norm", "k_norm"):
                        lp.setdefault(mod, {})[leaf] = jnp.asarray(a, self.dtype)
                    else:
                        lp[mod][leaf] = jnp.asarray(
                            a.T if leaf == "weight" else a, self.dtype
                        )
                elif sub == "mlp":
                    leaf = parts[5]
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                else:  # layernorm_before / layernorm_after
                    lp[sub][parts[4]] = jnp.asarray(a, self.dtype)
        return params

    def _rms(self, x, w):
        xf = x.astype(jnp.float32)
        return (
            xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + self.eps) * w
        ).astype(x.dtype)

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, 3, H, W] -> hidden [B, 1+P, hidden]
        (row 0 is the CLS token; callers drop it per HF's "default"
        feature-select strategy)."""
        b = pixel_values.shape[0]
        ps = self.patch_size
        g = self.image_size // ps
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, ps * ps * 3)
        x = _dense(x, params["patch_embedding"])
        cls = jnp.broadcast_to(
            params["cls_token"], (b, 1, self.hidden_size)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["position_embeddings"][None, : x.shape[1]]

        nh = self.num_heads
        hd = self.hidden_size // nh
        t = x.shape[1]
        for lp in params["layers"]:
            h = _layer_norm(x, lp["layernorm_before"], self.eps)
            q = _dense(h, lp["q_proj"])
            k = _dense(h, lp["k_proj"])
            v = _dense(h, lp["v_proj"])
            if "q_norm" in lp:  # full-width RMS before the head split
                q = self._rms(q, lp["q_norm"]["weight"])
                k = self._rms(k, lp["k_norm"]["weight"])
            q = q.reshape(b, t, nh, hd) * (hd**-0.5)
            k = k.reshape(b, t, nh, hd)
            v = v.reshape(b, t, nh, hd)
            scores = jnp.einsum(
                "bihd,bjhd->bhij", q.astype(jnp.float32), k.astype(jnp.float32)
            )
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
            attn = _dense(
                ctx.reshape(b, t, -1).astype(x.dtype), lp["projection_layer"]
            )
            x = x + lp["lambda_1"] * attn
            h = _layer_norm(x, lp["layernorm_after"], self.eps)
            mlp = _dense(self.act(_dense(h, lp["fc1"])), lp["fc2"])
            x = x + lp["lambda_2"] * mlp
        if "final_layernorm" in params:
            x = _layer_norm(x, params["final_layernorm"], self.eps)
        return x
