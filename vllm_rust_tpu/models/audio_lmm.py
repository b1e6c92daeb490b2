"""Audio language models: Qwen2-Audio, Ultravox, Voxtral.

Reference: crates/core/src/models/{qwen2_audio,ultravox,voxtral}.rs +
multimodal/audio.rs. Same injection design as the VLMs (llava.py): a
Whisper-style audio encoder + projector run once per request at
admission; the engine treats the projected audio embeddings exactly
like image embeddings (engine/vlm.py), so these models expose the
image-model interface (``encode_images`` takes mel features
``[B, n_mels, frames]``, ``image_token_index`` is the audio token).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .vlm_breadth import VlmBase, _rms_norm
from .whisper import _conv1d, _layer_norm, _sinusoids, linear

def _gelu_exact(x):
    """HF ACT2FN["gelu"] (erf form) — Whisper's activation; jax.nn.gelu
    defaults to the tanh approximation, which breaks exact parity."""
    import jax.nn
    return jax.nn.gelu(x, approximate=False)



class WhisperStyleAudioEncoder:
    """Standalone Whisper audio encoder (conv1 → conv2/stride2 →
    bidirectional transformer → final LayerNorm). Mirrors
    WhisperForConditionalGeneration.encode_hidden (whisper.py) but owns
    only encoder weights — the audio LMMs have no speech decoder."""

    def __init__(self, cfg: dict, dtype: Any = jnp.float32):
        self.dtype = dtype
        # Whisper-lineage configs use d_model/encoder_* names; Voxtral's
        # encoder config exports hidden_size/num_hidden_layers/... (r5
        # wave-3 anchor caught the mismatch)
        self.d_model = int(cfg.get("d_model", cfg.get("hidden_size", 384)))
        self.num_layers = int(
            cfg.get("encoder_layers", cfg.get("num_hidden_layers", 4))
        )
        self.num_heads = int(
            cfg.get("encoder_attention_heads",
                    cfg.get("num_attention_heads", 4))
        )
        self.n_mels = int(cfg.get("num_mel_bins", 80))
        self.positions = int(cfg.get("max_source_positions", 1500))
        self.ffn_dim = int(
            cfg.get("encoder_ffn_dim",
                    cfg.get("intermediate_size", 4 * self.d_model))
        )
        # in-encoder average pooling before the final LN (Qwen2-Audio's
        # avg_pooler); 1 = off (plain Whisper encoder)
        self.pool_stride = 1

    @property
    def output_len(self) -> int:
        return self.positions

    def init_params(self, rng=None, scale: float = 0.02):
        d, dm, ffn = self.dtype, self.d_model, self.ffn_dim
        n_keys = self.num_layers * 6 + 2
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def dense(key, din, dout):
            return {"weight": w(key, (din, dout)), "bias": jnp.zeros((dout,), d)}

        def ln():
            return {"weight": jnp.ones((dm,), d), "bias": jnp.zeros((dm,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "self_attn_layer_norm": ln(),
                "self_attn": {
                    "q_proj": dense(next(keys), dm, dm),
                    "k_proj": {"weight": w(next(keys), (dm, dm))},
                    "v_proj": dense(next(keys), dm, dm),
                    "out_proj": dense(next(keys), dm, dm),
                },
                "final_layer_norm": ln(),
                "fc1": dense(next(keys), dm, ffn),
                "fc2": dense(next(keys), ffn, dm),
            })
        return {
            "conv1": {"weight": w(next(keys), (3, self.n_mels, dm)),
                      "bias": jnp.zeros((dm,), d)},
            "conv2": {"weight": w(next(keys), (3, dm, dm)),
                      "bias": jnp.zeros((dm,), d)},
            "embed_positions": _sinusoids(self.positions, dm).astype(d),
            "layers": layers,
            "layer_norm": ln(),
        }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("encoder.")
            a = np.asarray(arr)
            parts = name.split(".")
            if parts[0] in ("conv1", "conv2"):
                if parts[1] == "weight":
                    params[parts[0]]["weight"] = jnp.asarray(
                        a.transpose(2, 1, 0), self.dtype
                    )
                else:
                    params[parts[0]]["bias"] = jnp.asarray(a, self.dtype)
            elif parts[0] == "embed_positions":
                params["embed_positions"] = jnp.asarray(a, self.dtype)
            elif parts[0] == "layer_norm":
                params["layer_norm"][parts[1]] = jnp.asarray(a, self.dtype)
            elif parts[0] == "layers":
                lp = params["layers"][int(parts[1])]
                sub = parts[2]
                if sub == "self_attn":
                    leaf = parts[4]
                    lp[sub][parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                elif sub in ("fc1", "fc2"):
                    leaf = parts[3]
                    lp[sub][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                else:
                    lp[sub][parts[3]] = jnp.asarray(a, self.dtype)
        return params

    def __call__(self, params, mel: jax.Array) -> jax.Array:
        """mel [n_mels, frames] -> hidden [positions, d_model]."""
        x = mel.T.astype(self.dtype)
        x = _gelu_exact(_conv1d(x, params["conv1"], stride=1))
        x = _gelu_exact(_conv1d(x, params["conv2"], stride=2))
        x = x + params["embed_positions"][: x.shape[0]].astype(x.dtype)
        nh = self.num_heads
        hd = self.d_model // nh
        t = x.shape[0]
        for lp in params["layers"]:
            res = x
            h = _layer_norm(x, lp["self_attn_layer_norm"])
            q = linear(h, lp["self_attn"]["q_proj"]).reshape(t, nh, hd) * (hd**-0.5)
            k = linear(h, lp["self_attn"]["k_proj"]).reshape(t, nh, hd)
            v = linear(h, lp["self_attn"]["v_proj"]).reshape(t, nh, hd)
            scores = jnp.einsum("ihd,jhd->hij", q.astype(jnp.float32),
                                k.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v.astype(jnp.float32))
            x = res + linear(ctx.reshape(t, -1).astype(x.dtype),
                             lp["self_attn"]["out_proj"])
            res = x
            h = _layer_norm(x, lp["final_layer_norm"])
            x = res + linear(_gelu_exact(linear(h, lp["fc1"])), lp["fc2"])
        if self.pool_stride > 1:
            # Qwen2-Audio pools BEFORE the final layer norm (HF
            # Qwen2AudioEncoder.forward: avg_pooler then layer_norm)
            s = self.pool_stride
            t2 = x.shape[0]
            x = x.reshape(t2 // s, s, -1).mean(axis=1)
        return _layer_norm(x, params["layer_norm"])


class AudioLmmBase(VlmBase):
    """Audio models plug into the VLM engine: the 'image' payload is the
    mel spectrogram and ``tokens_per_image`` is the per-clip token count."""

    is_multimodal = True

    @property
    def audio_token_index(self):
        return self.image_token_index

    def encode_audio(self, params, mels):
        return self.encode_images(params, mels)


class Qwen2AudioForConditionalGeneration(AudioLmmBase):
    """Whisper-style audio tower → stride-2 average pool → linear
    projector → Qwen2 LM (reference models/qwen2_audio.rs)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "Qwen2ForCausalLM")
        self.vision = WhisperStyleAudioEncoder(dict(ex.get("audio_config", {})),
                                               dtype=self.dtype)
        self.vision.pool_stride = 2  # HF avg_pooler sits before the final LN
        self.image_token_index = int(ex.get("audio_token_index", 151646))
        self.tokens_per_image = self.vision.output_len // 2

    def _init_projector(self, rng, scale):
        return {
            "linear": {
                "weight": self._w(rng, (self.vision.d_model,
                                        self.text_config.hidden_size), scale),
                "bias": jnp.zeros((self.text_config.hidden_size,), self.dtype),
            }
        }

    def _route_weight(self, name: str):
        if name.startswith("audio_tower."):
            return "vision", name.removeprefix("audio_tower.")
        if name.startswith("model.language_model."):
            # new-style HF: model.language_model.layers.* (no inner model.)
            return "lm", "model." + name.removeprefix("model.language_model.")
        if name.startswith("language_model."):
            # old-style HF: language_model.{model.*, lm_head.*} as-is
            return "lm", name.removeprefix("language_model.")
        if name.startswith("lm_head."):
            return "lm", name
        if "multi_modal_projector.linear." in name:
            return "proj", "linear." + name.rsplit(".", 1)[1]
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        """mels [B, n_mels, frames] -> [B * tokens, lm_hidden]."""
        hidden = jax.vmap(lambda m: self.vision(params["vision_tower"], m))(mels)
        p = params["projector"]["linear"]
        x = hidden @ p["weight"] + p["bias"]
        return x.reshape(-1, x.shape[-1])


class UltravoxModel(AudioLmmBase):
    """Whisper encoder → stack_factor frame stacking → RMSNorm →
    linear → SwiGLU → linear → Llama (reference models/ultravox.rs)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "LlamaForCausalLM")
        self.vision = WhisperStyleAudioEncoder(dict(ex.get("audio_config", {})),
                                               dtype=self.dtype)
        self.stack_factor = int(ex.get("stack_factor", 8))
        self.image_token_index = int(ex.get("audio_token_index", 32000))
        self.tokens_per_image = self.vision.output_len // self.stack_factor
        # Ultravox's top-level hidden_size is the projector intermediate
        self.proj_hidden = int(ex.get("hidden_size", self.config.hidden_size))

    def _init_projector(self, rng, scale):
        d_in = self.vision.d_model * self.stack_factor
        mid = self.proj_hidden
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "ln_pre": jnp.ones((d_in,), self.dtype),
            "linear_1": {"weight": self._w(r1, (d_in, mid), scale)},
            "ln_mid": jnp.ones((mid // 2,), self.dtype),
            "linear_2": {"weight": self._w(r2, (mid // 2,
                                                self.text_config.hidden_size),
                                           scale)},
        }

    def _route_weight(self, name: str):
        if name.startswith("audio_tower."):
            return "vision", name.removeprefix("audio_tower.")
        if name.startswith("language_model."):
            return "lm", name.removeprefix("language_model.")
        if name.startswith("multi_modal_projector."):
            return "proj", name.removeprefix("multi_modal_projector.")
        return None

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            a = np.asarray(arr)
            if name.startswith("ln_pre"):
                proj["ln_pre"] = jnp.asarray(a, self.dtype)
            elif name.startswith("ln_mid") or name.startswith("ln_post"):
                proj["ln_mid"] = jnp.asarray(a, self.dtype)
            elif name.startswith("linear_1"):
                proj["linear_1"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("linear_2"):
                proj["linear_2"]["weight"] = jnp.asarray(a.T, self.dtype)
        return proj

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        hidden = jax.vmap(lambda m: self.vision(params["vision_tower"], m))(mels)
        b, t, d = hidden.shape
        s = self.stack_factor
        x = hidden.reshape(b, t // s, s * d)
        p = params["projector"]
        x = _rms_norm(x, p["ln_pre"])
        x = x @ p["linear_1"]["weight"]
        # SwiGLU activation: split in half, silu(a) * b
        a, g = jnp.split(x, 2, axis=-1)
        x = jax.nn.silu(a) * g
        x = _rms_norm(x, p["ln_mid"])
        x = x @ p["linear_2"]["weight"]
        return x.reshape(-1, x.shape[-1])


class VoxtralForConditionalGeneration(AudioLmmBase):
    """Whisper-large encoder → 4-frame reshape downsample → 2-layer MLP →
    Mistral LM (reference models/voxtral.rs)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}), "MistralForCausalLM")
        self.vision = WhisperStyleAudioEncoder(dict(ex.get("audio_config", {})),
                                               dtype=self.dtype)
        # HF groups encoder frames so each projector input row is
        # audio_config.intermediate_size wide (modeling_voxtral.py:452):
        # 5120/1280 = 4 on the real checkpoint; derive, don't hardcode
        default_ds = max(1, self.vision.ffn_dim // self.vision.d_model)
        self.downsample = int(ex.get("downsample_factor", default_ds))
        self.image_token_index = int(
            ex.get("audio_token_index", ex.get("audio_token_id", 24) or 24)
        )
        self.tokens_per_image = self.vision.output_len // self.downsample

    def _init_projector(self, rng, scale):
        d_in = self.vision.d_model * self.downsample
        h_t = self.text_config.hidden_size
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        return {
            "linear_1": {"weight": self._w(r1, (d_in, h_t), scale)},
            "linear_2": {"weight": self._w(r2, (h_t, h_t), scale)},
        }

    def _route_weight(self, name: str):
        if name.startswith("audio_tower."):
            return "vision", name.removeprefix("audio_tower.")
        if name.startswith(("language_model.", "model.language_model.")):
            # Voxtral checkpoints nest a full CausalLM under
            # language_model. ("language_model.model.embed_tokens...",
            # "language_model.lm_head.") — don't re-prefix those
            sub = name.split("language_model.", 1)[1]
            if not sub.startswith(("model.", "lm_head.")):
                sub = "model." + sub
            return "lm", sub
        if name.startswith("lm_head."):
            return "lm", name
        if name.startswith("multi_modal_projector."):
            return "proj", name.removeprefix("multi_modal_projector.")
        return None

    def encode_images(self, params, mels: jax.Array) -> jax.Array:
        hidden = jax.vmap(lambda m: self.vision(params["vision_tower"], m))(mels)
        b, t, d = hidden.shape
        x = hidden.reshape(b, t // self.downsample, self.downsample * d)
        p = params["projector"]
        x = jax.nn.gelu(x @ p["linear_1"]["weight"])
        x = x @ p["linear_2"]["weight"]
        return x.reshape(-1, x.shape[-1])


def register_audio_lmm(registry: dict) -> None:
    registry.update(
        {
            "Qwen2AudioForConditionalGeneration": Qwen2AudioForConditionalGeneration,
            "UltravoxModel": UltravoxModel,
            "VoxtralForConditionalGeneration": VoxtralForConditionalGeneration,
        }
    )
