"""Audio LMM breadth 3: IBM Granite Speech (Conformer CTC encoder +
windowed Q-Former projector) and MiDashengLM (Dasheng audio ViT).

Reference: crates/core/src/models/granite_speech.rs (Macaron conformer:
``0.5*FF1 + Attn + Conv + 0.5*FF2 + PostNorm``, Shaw relative-position
attention with context_size block attention, GLU conv module; BLIP2
Q-Former windowed projector) and midashenglm.rs (ViT-style audio encoder
with 2-D patch embed, separable time×freq positional embeddings,
LayerScale blocks; subsample-k projector; Qwen2 backbone).

Round-1 documented divergences: Shaw relative-position attention and the
conformer's BatchNorm1d are served by plain softmax attention and an
affine (loaded-statistics) norm respectively; the Q-Former projector is
a single cross-attention block per window rather than the full BLIP2
stack.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .vision import _dense, _layer_norm
from .audio_lmm import AudioLmmBase
from .vlm_breadth import _rms_norm


class GraniteSpeechCTCEncoder:
    """Conformer encoder (granite_speech.rs): input_linear → N Macaron
    blocks → hidden."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.input_dim = int(cfg.get("input_dim", 160))
        self.hidden = int(cfg.get("hidden_dim", 64))
        self.num_layers = int(cfg.get("num_layers", 2))
        self.num_heads = int(cfg.get("num_heads", 4))
        self.ff_mult = int(cfg.get("feedforward_mult", 4))
        self.conv_kernel = int(cfg.get("conv_kernel_size", 9))
        self.d_model = self.hidden

    def init_params(self, rng=None, scale=0.02):
        h = self.hidden
        ff = h * self.ff_mult
        c = [0]

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            c[0] += 1
            return (scale * jax.random.normal(
                jax.random.fold_in(rng, c[0]), shape, jnp.float32
            )).astype(self.dtype)

        def ln():
            return {"weight": jnp.ones((h,), self.dtype),
                    "bias": jnp.zeros((h,), self.dtype)}

        blocks = []
        for _ in range(self.num_layers):
            blocks.append({
                "ff1_norm": ln(),
                "ff1_up": {"weight": w((h, ff)),
                           "bias": jnp.zeros((ff,), self.dtype)},
                "ff1_down": {"weight": w((ff, h)),
                             "bias": jnp.zeros((h,), self.dtype)},
                "attn_norm": ln(),
                "qkv": {"weight": w((h, 3 * h))},
                "attn_out": {"weight": w((h, h))},
                "conv_norm": ln(),
                "conv_up": {"weight": w((h, 2 * h))},
                "conv_dw": w((self.conv_kernel, h)),
                "conv_bn": {"weight": jnp.ones((h,), self.dtype),
                            "bias": jnp.zeros((h,), self.dtype)},
                "conv_down": {"weight": w((h, h))},
                "ff2_norm": ln(),
                "ff2_up": {"weight": w((h, ff)),
                           "bias": jnp.zeros((ff,), self.dtype)},
                "ff2_down": {"weight": w((ff, h)),
                             "bias": jnp.zeros((h,), self.dtype)},
                "post_norm": ln(),
            })
        return {
            "input_linear": {"weight": w((self.input_dim, h)),
                             "bias": jnp.zeros((h,), self.dtype)},
            "blocks": blocks,
        }

    def load_weights(self, stream):
        params = self.init_params(None)
        for name, arr in stream:
            a = np.asarray(arr)
            n = name.removeprefix("encoder.")
            parts = n.split(".")
            try:
                if parts[0] == "input_linear":
                    params["input_linear"][parts[-1]] = jnp.asarray(
                        a.T if parts[-1] == "weight" else a, self.dtype)
                elif parts[0] in ("blocks", "layers"):
                    b = params["blocks"][int(parts[1])]
                    key = ".".join(parts[2:-1])
                    leaf = parts[-1]
                    route = {
                        "ff1.pre_norm": "ff1_norm", "ff1.up_proj": "ff1_up",
                        "ff1.down_proj": "ff1_down",
                        "attn.pre_norm": "attn_norm",
                        "attn.to_qkv": "qkv", "attn.to_out": "attn_out",
                        "conv.norm": "conv_norm",
                        "conv.up_conv": "conv_up",
                        "conv.depth_conv": "conv_dw",
                        "conv.batch_norm": "conv_bn",
                        "conv.down_conv": "conv_down",
                        "ff2.pre_norm": "ff2_norm", "ff2.up_proj": "ff2_up",
                        "ff2.down_proj": "ff2_down",
                        "post_norm": "post_norm",
                    }.get(key)
                    if route is None:
                        continue
                    dst = b[route]
                    if isinstance(dst, dict):
                        dst[leaf] = jnp.asarray(
                            a.T if leaf == "weight" and a.ndim == 2 else a,
                            self.dtype)
                    else:
                        b[route] = jnp.asarray(
                            a.reshape(self.conv_kernel, -1), self.dtype)
            except (KeyError, IndexError, ValueError):
                continue
        return params

    def __call__(self, params, mel: jax.Array) -> jax.Array:
        """mel [T, input_dim] -> [T, hidden]."""
        x = _dense(mel.astype(self.dtype), params["input_linear"])
        nh = self.num_heads
        hd = self.hidden // nh
        for b in params["blocks"]:
            # Macaron FF1 (half residual)
            h = _layer_norm(x, b["ff1_norm"], 1e-5)
            h = _dense(jax.nn.silu(_dense(h, b["ff1_up"])), b["ff1_down"])
            x = x + 0.5 * h
            # self attention
            h = _layer_norm(x, b["attn_norm"], 1e-5)
            t = h.shape[0]
            qkv = _dense(h, b["qkv"]).reshape(t, 3, nh, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            att = jnp.einsum("qhd,khd->hqk", q, k) * hd**-0.5
            att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(t, self.hidden)
            x = x + _dense(o, b["attn_out"])
            # conv module: ln → up (2h) → GLU → depthwise → norm → SiLU → down
            h = _layer_norm(x, b["conv_norm"], 1e-5)
            h = _dense(h, b["conv_up"])
            a, g = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(g)
            k_sz = self.conv_kernel
            pad = k_sz // 2
            hp = jnp.pad(h, ((pad, k_sz - 1 - pad), (0, 0)))
            # depthwise conv as a windowed weighted sum
            idx = jnp.arange(t)[:, None] + jnp.arange(k_sz)[None, :]
            h = jnp.einsum("tkc,kc->tc", hp[idx], b["conv_dw"])
            h = h * b["conv_bn"]["weight"] + b["conv_bn"]["bias"]
            h = jax.nn.silu(h)
            x = x + _dense(h, b["conv_down"])
            # Macaron FF2 (half residual) + post norm
            h = _layer_norm(x, b["ff2_norm"], 1e-5)
            h = _dense(jax.nn.silu(_dense(h, b["ff2_up"])), b["ff2_down"])
            x = x + 0.5 * h
            x = _layer_norm(x, b["post_norm"], 1e-5)
        return x


class GraniteSpeechForConditionalGeneration(AudioLmmBase):
    """Granite Speech (granite_speech.rs): Conformer encoder → windowed
    Q-Former projector (query tokens cross-attend per window) → linear →
    Granite LM; audio embeddings scattered at <|audio|> positions."""

    def _build(self, ex: dict):
        self._make_text_model(dict(ex.get("text_config", {})),
                              "GraniteForCausalLM")
        enc_cfg = dict(ex.get("encoder_config", ex.get("audio_config", {})))
        self.vision = GraniteSpeechCTCEncoder(enc_cfg, dtype=self.dtype)
        pc = dict(ex.get("projector_config", {}))
        self.window = int(pc.get("window_size", ex.get("window_size", 15)))
        self.num_queries = int(pc.get("downsample_rate",
                                      ex.get("downsample_rate", 5)))
        self.qf_hidden = int(pc.get("hidden_size", self.vision.hidden))
        self.image_token_index = int(ex.get("audio_token_index", 49155))
        frames = int(ex.get("max_audio_frames", 2 * self.window))
        self.tokens_per_image = (frames // self.window) * self.num_queries

    def _init_projector(self, rng, scale):
        hq = self.qf_hidden
        he = self.vision.hidden
        ht = self.text_config.hidden_size
        r = (jax.random.split(rng, 6) if rng is not None else [None] * 6)
        return {
            "query": self._w(r[0], (self.num_queries, hq), scale),
            "q_proj": {"weight": self._w(r[1], (hq, hq), scale)},
            "kv_proj": {"weight": self._w(r[2], (he, 2 * hq), scale)},
            "o_proj": {"weight": self._w(r[3], (hq, hq), scale)},
            "norm": {"weight": jnp.ones((hq,), self.dtype),
                     "bias": jnp.zeros((hq,), self.dtype)},
            "fc1": {"weight": self._w(r[4], (hq, hq * 4), scale)},
            "fc2": {"weight": self._w(r[5], (hq * 4, hq), scale)},
            "out": {"weight": self._w(r[0], (hq, ht), scale),
                    "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("encoder."):
            return "vision", name
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if name.startswith("projector."):
            return "proj", name.removeprefix("projector.")
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        """mels [B, T, input_dim] -> [B * tokens, lm_hidden]."""
        enc = jax.vmap(
            lambda m: self.vision(params["vision_tower"], m))(mels)
        b, t, he = enc.shape
        ws = self.window
        nw = t // ws
        enc = enc[:, : nw * ws].reshape(b * nw, ws, he)
        p = params["projector"]
        nq, hq = self.num_queries, self.qf_hidden
        q = jnp.broadcast_to(p["query"], (b * nw, nq, hq))
        q = q @ p["q_proj"]["weight"]
        kv = jnp.einsum("bwe,eh->bwh", enc, p["kv_proj"]["weight"])
        k, v = jnp.split(kv, 2, axis=-1)
        att = jnp.einsum("bqh,bwh->bqw", q, k) * hq**-0.5
        att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(enc.dtype)
        x = jnp.einsum("bqw,bwh->bqh", att, v) @ p["o_proj"]["weight"]
        x = _layer_norm(x + jnp.broadcast_to(p["query"], x.shape),
                        p["norm"], 1e-5)
        x = x + (jax.nn.gelu(x @ p["fc1"]["weight"]) @ p["fc2"]["weight"])
        x = _dense(x, p["out"])
        return x.reshape(-1, x.shape[-1])


class DashengAudioTransformer:
    """Dasheng audio ViT (midashenglm.rs): 2-D patch embed over the mel
    spectrogram, separable time/freq positional embeddings, LayerScale
    pre-norm blocks."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.n_mels = int(cfg.get("n_mels", 64))
        self.target_frames = int(cfg.get("target_length",
                                         cfg.get("target_frames", 64)))
        self.hidden = int(cfg.get("embed_dim", cfg.get("hidden_size", 64)))
        self.num_layers = int(cfg.get("depth", cfg.get("num_hidden_layers", 2)))
        self.num_heads = int(cfg.get("num_heads",
                                     cfg.get("num_attention_heads", 4)))
        ps = cfg.get("patch_size", (16, 4))
        if isinstance(ps, int):
            ps = (ps, ps)
        self.f_patch, self.t_patch = int(ps[0]), int(ps[1])
        self.f_grid = self.n_mels // self.f_patch
        self.t_grid = self.target_frames // self.t_patch
        self.num_patches = self.f_grid * self.t_grid
        self.d_model = self.hidden

    def init_params(self, rng=None, scale=0.02):
        h = self.hidden
        c = [0]

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            c[0] += 1
            return (scale * jax.random.normal(
                jax.random.fold_in(rng, c[0]), shape, jnp.float32
            )).astype(self.dtype)

        def ln():
            return {"weight": jnp.ones((h,), self.dtype),
                    "bias": jnp.zeros((h,), self.dtype)}

        return {
            "init_bn": {"weight": jnp.ones((self.n_mels,), self.dtype),
                        "bias": jnp.zeros((self.n_mels,), self.dtype)},
            "patch_embed": {
                "weight": w((self.f_patch * self.t_patch, h)),
                "bias": jnp.zeros((h,), self.dtype)},
            "time_pos_embed": w((self.t_grid, h)),
            "freq_pos_embed": w((self.f_grid, h)),
            "blocks": [
                {
                    "norm1": ln(),
                    "qkv": {"weight": w((h, 3 * h)),
                            "bias": jnp.zeros((3 * h,), self.dtype)},
                    "proj": {"weight": w((h, h)),
                             "bias": jnp.zeros((h,), self.dtype)},
                    "ls1": jnp.ones((h,), self.dtype),
                    "norm2": ln(),
                    "fc1": {"weight": w((h, 4 * h)),
                            "bias": jnp.zeros((4 * h,), self.dtype)},
                    "fc2": {"weight": w((4 * h, h)),
                            "bias": jnp.zeros((h,), self.dtype)},
                    "ls2": jnp.ones((h,), self.dtype),
                }
                for _ in range(self.num_layers)
            ],
            "norm": ln(),
        }

    def load_weights(self, stream):
        params = self.init_params(None)
        for name, arr in stream:
            a = np.asarray(arr)
            parts = name.split(".")
            try:
                if parts[0] == "init_bn" and parts[1] in ("weight", "bias"):
                    params["init_bn"][parts[1]] = jnp.asarray(a, self.dtype)
                elif name.startswith("patch_embed.proj"):
                    if parts[-1] == "weight":
                        params["patch_embed"]["weight"] = jnp.asarray(
                            a.reshape(a.shape[0], -1).T, self.dtype)
                    else:
                        params["patch_embed"]["bias"] = jnp.asarray(
                            a, self.dtype)
                elif parts[0] in ("time_pos_embed", "freq_pos_embed"):
                    params[parts[0]] = jnp.asarray(
                        a.reshape(-1, a.shape[-1])
                        if a.ndim > 2 else a, self.dtype)
                elif parts[0] == "blocks":
                    b = params["blocks"][int(parts[1])]
                    sub = parts[2]
                    if sub in ("norm1", "norm2"):
                        b[sub][parts[-1]] = jnp.asarray(a, self.dtype)
                    elif sub == "attn":
                        b[parts[3]][parts[-1]] = jnp.asarray(
                            a.T if parts[-1] == "weight" else a, self.dtype)
                    elif sub == "mlp":
                        b[parts[3]][parts[-1]] = jnp.asarray(
                            a.T if parts[-1] == "weight" else a, self.dtype)
                    elif sub in ("ls1", "ls2"):
                        b[sub] = jnp.asarray(a, self.dtype)
                elif parts[0] == "norm":
                    params["norm"][parts[-1]] = jnp.asarray(a, self.dtype)
            except (KeyError, IndexError, ValueError):
                continue
        return params

    def __call__(self, params, mel: jax.Array) -> jax.Array:
        """mel [n_mels, T] -> [t_grid * f_grid, hidden]."""
        x = (mel.astype(self.dtype).T * params["init_bn"]["weight"]
             + params["init_bn"]["bias"]).T  # per-mel affine (loaded BN)
        fg, tg = self.f_grid, self.t_grid
        fp, tp = self.f_patch, self.t_patch
        x = x[: fg * fp, : tg * tp]
        x = x.reshape(fg, fp, tg, tp).transpose(2, 0, 1, 3)  # [tg, fg, fp, tp]
        x = x.reshape(tg, fg, fp * tp)
        x = _dense(x, params["patch_embed"])  # [tg, fg, h]
        x = x + params["time_pos_embed"][:, None, :]
        x = x + params["freq_pos_embed"][None, :, :]
        x = x.reshape(tg * fg, self.hidden)
        nh = self.num_heads
        hd = self.hidden // nh
        t = x.shape[0]
        for b in params["blocks"]:
            h = _layer_norm(x, b["norm1"], 1e-6)
            qkv = _dense(h, b["qkv"]).reshape(t, 3, nh, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            att = jnp.einsum("qhd,khd->hqk", q, k) * hd**-0.5
            att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(t, self.hidden)
            x = x + b["ls1"] * _dense(o, b["proj"])
            h = _layer_norm(x, b["norm2"], 1e-6)
            h = _dense(jax.nn.gelu(_dense(h, b["fc1"])), b["fc2"])
            x = x + b["ls2"] * h
        return _layer_norm(x, params["norm"], 1e-6)


class MiDashengLMModel(AudioLmmBase):
    """MiDashengLM (midashenglm.rs): Dasheng audio ViT → subsample-k
    projector (reshape k frames → Linear → GELU → Linear) → Qwen2."""

    def _build(self, ex: dict):
        self._make_text_model(dict(ex.get("text_config", {})),
                              "Qwen2ForCausalLM")
        ac = dict(ex.get("audio_encoder_config", ex.get("audio_config", {})))
        self.vision = DashengAudioTransformer(ac, dtype=self.dtype)
        self.subsample = int(ex.get("subsample_factor", 5))
        self.image_token_index = int(ex.get("audio_token_id",
                                            ex.get("audio_token_index",
                                                   151646)))
        self.tokens_per_image = max(
            1, self.vision.num_patches // self.subsample)

    def _init_projector(self, rng, scale):
        k = self.subsample
        din = self.vision.hidden * k
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "net_1": {"weight": self._w(r1, (din, ht), scale),
                      "bias": jnp.zeros((ht,), self.dtype)},
            "net_2": {"weight": self._w(r2, (ht, ht), scale),
                      "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("audio_encoder."):
            return "vision", name.removeprefix("audio_encoder.")
        if name.startswith(("decoder.", "language_model.")):
            return "lm", name.split(".", 1)[1]
        if name.startswith("audio_projector."):
            n = name.removeprefix("audio_projector.")
            n = n.replace("net.0.", "net_1.").replace("net.2.", "net_2.")
            return "proj", n
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        """mels [B, n_mels, T] -> [B * tokens, lm_hidden]."""
        enc = jax.vmap(
            lambda m: self.vision(params["vision_tower"], m))(mels)
        b, t, h = enc.shape
        k = self.subsample
        n = t // k
        x = enc[:, : n * k].reshape(b, n, k * h)
        p = params["projector"]
        x = _dense(jax.nn.gelu(_dense(x, p["net_1"])), p["net_2"])
        return x.reshape(-1, x.shape[-1])


def register_audio_lmm3(registry: dict) -> None:
    registry.update({
        "GraniteSpeechForConditionalGeneration":
            GraniteSpeechForConditionalGeneration,
        "MiDashengLMModel": MiDashengLMModel,
        "MiDashengLMForConditionalGeneration": MiDashengLMModel,
    })
