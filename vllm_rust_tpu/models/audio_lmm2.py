"""Audio LMM breadth 2: Qwen2.5-Omni / Qwen3-Omni-MoE thinkers,
Qwen3-ASR, AudioFlamingo3 (+MusicFlamingo), GLM-ASR, FunAudioChat.

Reference: models/{qwen2_5_omni_thinker.rs, qwen3_omni_moe_thinker.rs,
qwen3_asr.rs, audioflamingo3.rs, musicflamingo.rs, glmasr.rs,
funaudiochat.rs}. Audio models serve through the multimodal engine with
the mel spectrogram as the media payload (audio_lmm.py convention); the
Omni thinkers additionally expose the vision tower via encode_images.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.norm import rms_norm
from .audio_lmm import AudioLmmBase, WhisperStyleAudioEncoder
from .vision import _dense, _layer_norm
from .vlm_breadth import Qwen2VLVisionTower


# -- Qwen2.5-Omni thinker -----------------------------------------------------------


class Qwen2_5OmniThinkerForConditionalGeneration(AudioLmmBase):
    """Qwen2.5-Omni thinker (reference qwen2_5_omni_thinker.rs): the
    Qwen2-Audio encoder + the Qwen2.5-VL vision transformer around a
    Qwen2 text model. The talker/TTS stack is not part of serving (the
    reference loads only the thinker). Audio path: encoder → stride-2
    mean pool → `audio_tower.proj` → text hidden."""

    def _build(self, ex: dict):
        tc = ex.get("text_config", ex.get("thinker_config", {}))
        if isinstance(tc, dict) and "text_config" in tc:
            tc = tc["text_config"]
        self._make_text_model(tc, "Qwen2ForCausalLM")
        self.audio = WhisperStyleAudioEncoder(
            dict(ex.get("audio_config", {})), dtype=self.dtype)
        self.vision = Qwen2VLVisionTower(dict(ex.get("vision_config", {})),
                                         dtype=self.dtype, v25=True)
        self.image_token_index = int(ex.get("image_token_index",
                                            ex.get("image_token_id",
                                                   151655)))
        self.audio_token_id = int(ex.get("audio_token_index", 151646))
        self.tokens_per_image = self.vision.merged_patches
        self.tokens_per_audio = self.audio.output_len // 2

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        params["audio_tower"] = self.audio.init_params(rng, scale)
        return params

    def _init_projector(self, rng, scale):
        return {
            "proj": {"weight": self._w(rng, (self.audio.d_model,
                                             self.text_config.hidden_size),
                                       scale),
                     "bias": jnp.zeros((self.text_config.hidden_size,),
                                       self.dtype)},
        }

    def _route_weight(self, name: str):
        n = name.removeprefix("thinker.")
        if n.startswith("audio_tower.proj."):
            return "proj", "proj." + n.rsplit(".", 1)[1]
        if n.startswith("audio_tower."):
            return "audio", n.removeprefix("audio_tower.")
        if n.startswith(("visual.", "model.visual.")):
            return "vision", n.split("visual.", 1)[1]
        if n.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + n.split("language_model.", 1)[1]
        if n.startswith(("model.", "lm_head.")):
            return "lm", n
        return None

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        streams: dict = {"lm": [], "vision": [], "proj": [], "audio": []}
        for name, arr in weights:
            route = self._route_weight(name)
            if route is None:
                continue
            streams[route[0]].append((route[1], arr))
        params = {
            "language_model": self.lm.load_weights(streams["lm"]),
            "vision_tower": self.vision.load_weights(streams["vision"]),
            "audio_tower": self.audio.load_weights(streams["audio"]),
            "projector": self._init_projector(None, 0.0),
        }
        for name, arr in streams["proj"]:
            a = np.asarray(arr)
            leaf = name.rsplit(".", 1)[1]
            params["projector"]["proj"][leaf] = jnp.asarray(
                a.T if leaf == "weight" else a, self.dtype)
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision(params["vision_tower"], pixel_values)
        return x.reshape(-1, x.shape[-1])

    def encode_audio(self, params, mels: jax.Array) -> jax.Array:
        hidden = jax.vmap(
            lambda m: self.audio(params["audio_tower"], m))(mels)
        b, t, d = hidden.shape
        hidden = hidden.reshape(b, t // 2, 2, d).mean(axis=2)
        x = _dense(hidden, params["projector"]["proj"])
        return x.reshape(-1, x.shape[-1])


# -- Qwen3-Omni audio encoder --------------------------------------------------------


class Qwen3OmniAudioEncoder:
    """Qwen3-Omni audio encoder (reference qwen3_omni_moe_thinker.rs):
    Conv2d×3 (stride 2, GELU) over the mel spectrogram → flatten
    freq×channels → linear → sinusoidal positions → pre-LN transformer
    (separate q/k/v/out projections) → ln_post → proj1 → GELU → proj2."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        self.d_model = int(cfg.get("d_model", 1536))
        self.num_layers = int(cfg.get("encoder_layers", 4))
        self.num_heads = int(cfg.get("encoder_attention_heads", 4))
        self.ffn = int(cfg.get("encoder_ffn_dim", 4 * self.d_model))
        self.n_mels = int(cfg.get("num_mel_bins", 128))
        self.positions = int(cfg.get("max_source_positions", 1500))
        self.dh = int(cfg.get("downsample_hidden_size", 32))
        self.output_dim = int(cfg.get("output_dim", self.d_model))
        f = self.n_mels
        for _ in range(3):
            f = -(-f // 2)
        self.freq_out = f

    @property
    def output_len(self) -> int:
        return self.positions

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        dm = self.d_model
        n_keys = self.num_layers * 6 + 8
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

        def ln(size=dm):
            return {"weight": jnp.ones((size,), d),
                    "bias": jnp.zeros((size,), d)}

        def conv(key, cin, cout):
            # [kh, kw, cin, cout]
            return {"weight": w(key, (3, 3, cin, cout)),
                    "bias": jnp.zeros((cout,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "q_proj": dense(next(keys), dm, dm),
                "k_proj": dense(next(keys), dm, dm),
                "v_proj": dense(next(keys), dm, dm),
                "out_proj": dense(next(keys), dm, dm),
                "self_attn_layer_norm": ln(),
                "final_layer_norm": ln(),
                "fc1": dense(next(keys), dm, self.ffn),
                "fc2": dense(next(keys), self.ffn, dm),
            })
        return {
            "conv2d1": conv(next(keys), 1, self.dh),
            "conv2d2": conv(next(keys), self.dh, self.dh),
            "conv2d3": conv(next(keys), self.dh, self.dh),
            "conv_out": dense(next(keys), self.dh * self.freq_out, dm),
            "layers": layers,
            "ln_post": ln(),
            "proj1": dense(next(keys), dm, dm),
            "proj2": dense(next(keys), dm, self.output_dim),
        }

    def __call__(self, params, mel: jax.Array) -> jax.Array:
        """mel [n_mels, T] → [T/8, output_dim]."""
        x = mel.astype(self.dtype)[None, :, :, None]  # NHWC [1, F, T, 1]

        def conv2(x, p):
            y = jax.lax.conv_general_dilated(
                x, p["weight"].astype(x.dtype), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.gelu(y + p["bias"], approximate=True)

        x = conv2(x, params["conv2d1"])
        x = conv2(x, params["conv2d2"])
        x = conv2(x, params["conv2d3"])  # [1, F/8, T/8, dh]
        f, t = x.shape[1], x.shape[2]
        x = x.transpose(0, 2, 1, 3).reshape(t, f * x.shape[3])
        x = _dense(x, params["conv_out"])  # [T/8, dm]
        # sinusoidal positions
        dm = self.d_model
        half = dm // 2
        pos = jnp.arange(t, dtype=jnp.float32)
        inv = jnp.exp(-jnp.arange(half, dtype=jnp.float32)
                      * (jnp.log(10000.0) / (half - 1)))
        ang = pos[:, None] * inv[None, :]
        pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
        x = x + pe[:, :dm].astype(x.dtype)

        nh = self.num_heads
        hd = dm // nh
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["self_attn_layer_norm"], 1e-5)
            q = _dense(h, lp["q_proj"]).reshape(t, nh, hd)
            k = _dense(h, lp["k_proj"]).reshape(t, nh, hd)
            v = _dense(h, lp["v_proj"]).reshape(t, nh, hd)
            scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
            x = res + _dense(ctx, lp["out_proj"])
            res = x
            h = _layer_norm(x, lp["final_layer_norm"], 1e-5)
            x = res + _dense(
                jax.nn.gelu(_dense(h, lp["fc1"]), approximate=True),
                lp["fc2"])
        x = _layer_norm(x, params["ln_post"], 1e-5)
        x = jax.nn.gelu(_dense(x, params["proj1"]), approximate=True)
        return _dense(x, params["proj2"])

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            leaf = parts[-1]
            if parts[0] in ("conv2d1", "conv2d2", "conv2d3"):
                if leaf == "weight":  # torch conv [out, in, kh, kw]
                    params[parts[0]]["weight"] = jnp.asarray(
                        a.transpose(2, 3, 1, 0), self.dtype)
                else:
                    params[parts[0]]["bias"] = jnp.asarray(a, self.dtype)
            elif parts[0] in ("conv_out", "proj1", "proj2"):
                params[parts[0]][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
            elif parts[0] == "ln_post":
                params["ln_post"][leaf] = jnp.asarray(a, self.dtype)
            elif parts[0] == "layers":
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                if sub == "self_attn":
                    lp[parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                elif sub in ("self_attn_layer_norm", "final_layer_norm"):
                    lp[sub][leaf] = jnp.asarray(a, self.dtype)
                elif sub in ("fc1", "fc2"):
                    lp[sub][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
        return params


class Qwen3OmniMoeThinkerForConditionalGeneration(
        Qwen2_5OmniThinkerForConditionalGeneration):
    """Qwen3-Omni-MoE thinker (reference qwen3_omni_moe_thinker.rs):
    the Conv2d×3 audio encoder + Qwen3-VL vision transformer around the
    Qwen3-MoE text model."""

    _text_arch = "Qwen3MoeForCausalLM"

    def _build(self, ex: dict):
        tc = ex.get("text_config", ex.get("thinker_config", {}))
        if isinstance(tc, dict) and "text_config" in tc:
            tc = tc["text_config"]
        self._make_text_model(tc, self._text_arch)
        self.audio = Qwen3OmniAudioEncoder(
            dict(ex.get("audio_config", {})), dtype=self.dtype)
        self.vision = Qwen2VLVisionTower(dict(ex.get("vision_config", {})),
                                         dtype=self.dtype, v3=True)
        self.image_token_index = int(ex.get("image_token_index",
                                            ex.get("image_token_id",
                                                   151655)))
        self.audio_token_id = int(ex.get("audio_token_index", 151646))
        self.tokens_per_image = self.vision.merged_patches
        self.tokens_per_audio = self.audio.output_len // 8

    def _init_projector(self, rng, scale):
        return {}

    def _route_weight(self, name: str):
        n = name.removeprefix("thinker.")
        if n.startswith("audio_tower."):
            return "audio", n.removeprefix("audio_tower.")
        if n.startswith(("visual.", "model.visual.")):
            return "vision", n.split("visual.", 1)[1]
        if n.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + n.split("language_model.", 1)[1]
        if n.startswith(("model.", "lm_head.")):
            return "lm", n
        return None

    def encode_audio(self, params, mels: jax.Array) -> jax.Array:
        x = jax.vmap(lambda m: self.audio(params["audio_tower"], m))(mels)
        return x.reshape(-1, x.shape[-1])


class Qwen3ASRForConditionalGeneration(AudioLmmBase):
    """Qwen3-ASR (reference models/qwen3_asr.rs): the Qwen3-Omni audio
    encoder paired with a Qwen3 text model (audio-only tower)."""

    def _build(self, ex: dict):
        tc = ex.get("text_config", {})
        self._make_text_model(tc, "Qwen3ForCausalLM")
        self.vision = Qwen3OmniAudioEncoder(
            dict(ex.get("audio_config", {})), dtype=self.dtype)
        self.image_token_index = int(ex.get("audio_token_index", 151646))
        self.tokens_per_image = self.vision.output_len // 8

    def _init_projector(self, rng, scale):
        return {}

    def _load_projector(self, raw):
        return {}

    def _route_weight(self, name: str):
        if name.startswith("audio_tower."):
            return "vision", name.removeprefix("audio_tower.")
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        x = jax.vmap(lambda m: self.vision(params["vision_tower"], m))(mels)
        return x.reshape(-1, x.shape[-1])


# -- AudioFlamingo3 / MusicFlamingo ---------------------------------------------------


class AudioFlamingo3ForConditionalGeneration(AudioLmmBase):
    """AudioFlamingo3 (reference models/audioflamingo3.rs): Whisper-style
    audio encoder (Qwen2Audio layout) → stride-2 mean pool → projector
    (linear_1 → GELU → linear_2) → Qwen2 text model. MusicFlamingo is
    the same architecture (musicflamingo.rs re-export)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Qwen2ForCausalLM")
        self.vision = WhisperStyleAudioEncoder(
            dict(ex.get("audio_config", {})), dtype=self.dtype)
        self.image_token_index = int(ex.get("audio_token_index",
                                            ex.get("sound_token_id",
                                                   151646)))
        self.tokens_per_image = self.vision.output_len // 2

    def _init_projector(self, rng, scale):
        ht = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None
                  else (None, None))
        return {
            "linear_1": {"weight": self._w(r1, (self.vision.d_model, ht),
                                           scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
            "linear_2": {"weight": self._w(r2, (ht, ht), scale),
                         "bias": jnp.zeros((ht,), self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("audio_tower."):
            if "pos_emb.freqs" in name:
                return None  # dummy parameter (audioflamingo3.rs:128)
            return "vision", name.removeprefix("audio_tower.")
        if name.startswith("multi_modal_projector."):
            return "proj", name.removeprefix("multi_modal_projector.")
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        hidden = jax.vmap(
            lambda m: self.vision(params["vision_tower"], m))(mels)
        b, t, d = hidden.shape
        hidden = hidden.reshape(b, t // 2, 2, d).mean(axis=2)
        p = params["projector"]
        x = jax.nn.gelu(_dense(hidden, p["linear_1"]), approximate=False)
        x = _dense(x, p["linear_2"])
        return x.reshape(-1, x.shape[-1])


# -- GLM-ASR ---------------------------------------------------------------------


class GlmAsrForConditionalGeneration(AudioLmmBase):
    """GLM-ASR (reference models/glmasr.rs): conv front-end + llama-style
    audio encoder (RMS norms, biased q/v, bias-free k), T/2 merged by
    `merge_factor` into flattened groups, bias-free linear_1/linear_2
    projector → Llama text model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "LlamaForCausalLM")
        ac = dict(ex.get("audio_config", {}))
        self.d_model = int(ac.get("hidden_size", ac.get("d_model", 768)))
        self.enc_layers = int(ac.get("num_hidden_layers",
                                     ac.get("encoder_layers", 4)))
        self.num_heads = int(ac.get("num_attention_heads", 4))
        self.ffn = int(ac.get("intermediate_size", 4 * self.d_model))
        self.n_mels = int(ac.get("num_mel_bins", 128))
        self.positions = int(ac.get("max_source_positions", 1500))
        self.eps = float(ac.get("rms_norm_eps", 1e-5))
        self.merge = int(ex.get("merge_factor", 4))
        self.image_token_index = int(ex.get("audio_token_id", 151646))
        self.tokens_per_image = self.positions // self.merge
        self.vision = None

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        dm = self.d_model
        n_keys = self.enc_layers * 6 + 6
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
        for _ in range(self.enc_layers):
            layers.append({
                "input_layernorm": jnp.ones((dm,), d),
                "post_attention_layernorm": jnp.ones((dm,), d),
                "q_proj": dense(next(keys), dm, dm),
                "k_proj": dense(next(keys), dm, dm, bias=False),
                "v_proj": dense(next(keys), dm, dm),
                "o_proj": dense(next(keys), dm, dm),
                "fc1": dense(next(keys), dm, self.ffn),
                "fc2": dense(next(keys), self.ffn, dm),
            })
        ht = self.text_config.hidden_size
        tower = {
            "conv1": dense(next(keys), self.n_mels * 3, dm),
            "conv2": dense(next(keys), dm * 3, dm),
            "layers": layers,
        }
        return {
            "language_model": self.lm.init_params(rng, scale),
            "vision_tower": tower,
            "projector": {
                "linear_1": dense(next(keys), dm * self.merge, ht,
                                  bias=False),
                "linear_2": dense(next(keys), ht, ht, bias=False),
            },
        }

    def _conv1d(self, x, p, k, stride):
        """conv1d over [T, C] flattened as a dense over k-neighborhoods."""
        t, c = x.shape
        pad = k // 2
        xp = jnp.pad(x, ((pad, pad), (0, 0)))
        idx = jnp.arange(0, t, stride)
        window = jnp.stack([xp[idx + j] for j in range(k)], axis=1)
        return _dense(window.reshape(idx.shape[0], k * c), p)

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        tower = params["vision_tower"]

        def one(mel):
            x = mel.astype(self.dtype).T  # [T, n_mels]
            x = jax.nn.gelu(self._conv1d(x, tower["conv1"], 3, 1),
                            approximate=True)
            x = jax.nn.gelu(self._conv1d(x, tower["conv2"], 3, 2),
                            approximate=True)
            t = x.shape[0]
            nh = self.num_heads
            hd = self.d_model // nh
            for lp in tower["layers"]:
                res = x
                h = rms_norm(x, lp["input_layernorm"], self.eps)
                q = _dense(h, lp["q_proj"]).reshape(t, nh, hd)
                k = _dense(h, lp["k_proj"]).reshape(t, nh, hd)
                v = _dense(h, lp["v_proj"]).reshape(t, nh, hd)
                scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
                probs = jax.nn.softmax(scores, axis=-1)
                ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
                x = res + _dense(ctx, lp["o_proj"])
                res = x
                h = rms_norm(x, lp["post_attention_layernorm"], self.eps)
                x = res + _dense(
                    jax.nn.gelu(_dense(h, lp["fc1"]), approximate=True),
                    lp["fc2"])
            m = self.merge
            tm = (x.shape[0] // m) * m
            x = x[:tm].reshape(tm // m, m * self.d_model)
            p = params["projector"]
            x = jax.nn.gelu(_dense(x, p["linear_1"]), approximate=True)
            return _dense(x, p["linear_2"])

        return jax.vmap(one)(mels).reshape(-1,
                                           self.text_config.hidden_size)

    def _route_weight(self, name: str):
        return None  # custom load below

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        lm_stream = []
        for name, arr in weights:
            a = np.asarray(arr)
            parts = name.split(".")
            leaf = parts[-1]
            if name.startswith("audio_tower.conv"):
                slot = parts[1]
                if leaf == "weight":  # torch conv1d [out, in, k]
                    params["vision_tower"][slot]["weight"] = jnp.asarray(
                        a.transpose(2, 1, 0).reshape(-1, a.shape[0]),
                        self.dtype)
                else:
                    params["vision_tower"][slot]["bias"] = jnp.asarray(
                        a, self.dtype)
            elif name.startswith("audio_tower.layers."):
                lp = params["vision_tower"]["layers"][int(parts[2])]
                sub = parts[3]
                if sub == "self_attn":
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                elif sub in ("input_layernorm",
                             "post_attention_layernorm"):
                    lp[sub] = jnp.asarray(a, self.dtype)
                elif sub == "mlp":
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
            elif name.startswith("multi_modal_projector."):
                params["projector"][parts[1]]["weight"] = jnp.asarray(
                    a.T, self.dtype)
            elif name.startswith("language_model."):
                lm_stream.append((name.removeprefix("language_model."),
                                  arr))
            elif name.startswith(("model.", "lm_head.")):
                lm_stream.append((name, arr))
        params["language_model"] = self.lm.load_weights(lm_stream)
        return params


# -- FunAudioChat ----------------------------------------------------------------


class FunAudioChatForConditionalGeneration(AudioLmmBase):
    """FunAudioChat (reference models/funaudiochat.rs): Whisper-style
    encoder at the `audio_config.*` weight prefix (bias-free k_proj) →
    ln_post → stride-2 mean pool → `proj` → Qwen3 text model."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Qwen3ForCausalLM")
        self.vision = WhisperStyleAudioEncoder(
            dict(ex.get("audio_config", {})), dtype=self.dtype)
        self.image_token_index = int(ex.get("audio_token_index", 151646))
        self.tokens_per_image = self.vision.output_len // 2

    def _init_projector(self, rng, scale):
        return {
            "proj": {"weight": self._w(rng, (self.vision.d_model,
                                             self.text_config.hidden_size),
                                       scale),
                     "bias": jnp.zeros((self.text_config.hidden_size,),
                                       self.dtype)},
        }

    def _route_weight(self, name: str):
        if name.startswith("audio_config.proj."):
            return "proj", "proj." + name.rsplit(".", 1)[1]
        if name.startswith("audio_config."):
            return "vision", name.removeprefix("audio_config.")
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", "model." + name.split("language_model.", 1)[1]
        if name.startswith(("model.", "lm_head.")):
            return "lm", name
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        hidden = jax.vmap(
            lambda m: self.vision(params["vision_tower"], m))(mels)
        b, t, d = hidden.shape
        hidden = hidden.reshape(b, t // 2, 2, d).mean(axis=2)
        x = _dense(hidden, params["projector"]["proj"])
        return x.reshape(-1, x.shape[-1])


def register_audio_lmm2(registry: dict) -> None:
    registry.update({
        "Qwen2_5OmniThinkerForConditionalGeneration":
            Qwen2_5OmniThinkerForConditionalGeneration,
        "Qwen2_5OmniForConditionalGeneration":
            Qwen2_5OmniThinkerForConditionalGeneration,
        "Qwen2_5OmniModel": Qwen2_5OmniThinkerForConditionalGeneration,
        "Qwen3OmniMoeThinkerForConditionalGeneration":
            Qwen3OmniMoeThinkerForConditionalGeneration,
        "Qwen3OmniMoeForConditionalGeneration":
            Qwen3OmniMoeThinkerForConditionalGeneration,
        "Qwen3ASRForConditionalGeneration": Qwen3ASRForConditionalGeneration,
        "AudioFlamingo3ForConditionalGeneration":
            AudioFlamingo3ForConditionalGeneration,
        "MusicFlamingoForConditionalGeneration":
            AudioFlamingo3ForConditionalGeneration,
        "GlmAsrForConditionalGeneration": GlmAsrForConditionalGeneration,
        "FunAudioChatForConditionalGeneration":
            FunAudioChatForConditionalGeneration,
    })
