"""NemotronParse: encoder-decoder OCR/document model.

Reference: crates/core/src/models/nemotron_parse.rs — RadioWithNeck
image encoder (RADIO ViT + Conv1d/Conv2d neck + sum_proj Linear + LNs)
feeding an MBart decoder WITHOUT positional embeddings (pre-norm,
Whisper-style self/cross attention), untied lm_head.

TPU design: same serving shape as Whisper (models/whisper.py) — the
encoder runs once per request as a jitted call producing per-decoder-
layer cross K/V scattered into the slot buffer; the decoder runs in the
continuous-batching step. Round-1 documented divergence: the RADIO ViT
is served by the CLIP-topology tower and the conv neck is reduced to
its sum_proj Linear + LayerNorm tail (same output geometry).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..ops.attn_metadata import AttentionMetadata
from .vision import CLIPVisionTower, _dense
from .whisper import _layer_norm, cross_attention


class NemotronParseForConditionalGeneration:
    is_encoder_decoder = True
    is_multimodal = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        self.vision = CLIPVisionTower(dict(ex.get("vision_config", {})),
                                      dtype=dtype)
        dec = dict(ex.get("decoder_config", ex.get("text_config", {})))
        self.d_model = int(dec.get("d_model",
                                   dec.get("hidden_size", config.hidden_size)))
        self.dec_layers = int(dec.get("decoder_layers",
                                      dec.get("num_hidden_layers",
                                              config.num_hidden_layers)))
        self.dec_heads = int(dec.get("decoder_attention_heads",
                                     dec.get("num_attention_heads",
                                             config.num_attention_heads)))
        self.ffn_dim = int(dec.get("decoder_ffn_dim", 4 * self.d_model))
        self.vocab_size = int(dec.get("vocab_size", config.vocab_size))
        self.neck_dim = int(ex.get("neck_hidden_size", self.d_model))
        self.head_dim = self.d_model // self.dec_heads
        # encoder output length = ViT patch count (neck keeps geometry)
        self.enc_positions = self.vision.num_patches
        self.attn_spec = AttentionSpec(
            num_heads=self.dec_heads,
            num_kv_heads=self.dec_heads,
            head_dim=self.head_dim,
            rotary=None,
            sm_scale=self.head_dim**-0.5,
        )
        self.kv_scales = None
        self.attention_backend = "auto"

    @property
    def num_layers(self) -> int:
        return self.dec_layers

    @property
    def kv_head_info(self) -> list:
        return [
            {
                "kv": (self.dec_heads, self.head_dim),
                "cross": (self.enc_positions, 2 * self.dec_heads,
                          self.head_dim),
            }
            for _ in range(self.dec_layers)
        ]

    # -- params ---------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        dm, ffn = self.d_model, self.ffn_dim
        c = [0]

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            c[0] += 1
            return (scale * jax.random.normal(
                jax.random.fold_in(rng, c[0]), shape, jnp.float32)).astype(d)

        def dense(din, dout, bias=True):
            p = {"weight": w((din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def ln(dim=dm):
            return {"weight": jnp.ones((dim,), d),
                    "bias": jnp.zeros((dim,), d)}

        def attn():
            return {
                "q_proj": dense(dm, dm),
                "k_proj": dense(dm, dm, bias=False),
                "v_proj": dense(dm, dm),
                "out_proj": dense(dm, dm),
            }

        layers = [
            {
                "self_attn": attn(),
                "self_attn_layer_norm": ln(),
                "encoder_attn": attn(),
                "encoder_attn_layer_norm": ln(),
                "fc1": dense(dm, ffn),
                "fc2": dense(ffn, dm),
                "final_layer_norm": ln(),
            }
            for _ in range(self.dec_layers)
        ]
        return {
            "vision_tower": self.vision.init_params(
                jax.random.fold_in(rng, 999) if rng is not None else None,
                scale),
            "neck": {
                "sum_proj": dense(self.vision.hidden_size, dm),
                "layer_norm": ln(),
            },
            "decoder": {
                "embed_tokens": {"weight": w((self.vocab_size, dm))},
                "layernorm_embedding": ln(),
                "layers": layers,
                "layer_norm": ln(),
            },
            "lm_head": {"weight": w((dm, self.vocab_size))},
        }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        vis_stream = []
        for name, arr in weights:
            a = np.asarray(arr)
            if name.startswith("encoder.model_encoder."):
                vis_stream.append(
                    (name.removeprefix("encoder.model_encoder."), a))
                continue
            if name == "lm_head.weight":
                params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
                continue
            if name.startswith("encoder.sum_proj."):
                leaf = name.rsplit(".", 1)[1]
                params["neck"]["sum_proj"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
                continue
            if name.startswith("encoder.layer_norm3."):
                params["neck"]["layer_norm"][name.rsplit(".", 1)[1]] = (
                    jnp.asarray(a, self.dtype))
                continue
            if not name.startswith("decoder."):
                continue
            parts = name.split(".")[1:]
            node = params["decoder"]
            if parts[0] == "embed_tokens":
                node["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif parts[0] in ("layernorm_embedding", "layer_norm"):
                node[parts[0]][parts[1]] = jnp.asarray(a, self.dtype)
            elif parts[0] == "layers":
                lp = node["layers"][int(parts[1])]
                sub = parts[2]
                if sub in ("self_attn", "encoder_attn"):
                    leaf = parts[4]
                    lp[sub][parts[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                elif sub in ("fc1", "fc2"):
                    lp[sub][parts[3]] = jnp.asarray(
                        a.T if parts[3] == "weight" else a, self.dtype)
                else:
                    lp[sub][parts[3]] = jnp.asarray(a, self.dtype)
        if vis_stream:
            params["vision_tower"] = self.vision.load_weights(vis_stream)
        return params

    # -- encoder ---------------------------------------------------------------

    def encode(self, params, pixel_values: jax.Array) -> list[jax.Array]:
        """pixel_values [3, H, W] -> per-decoder-layer cross K/V."""
        return self.cross_kv(params, self.encode_hidden(params, pixel_values))

    def encode_hidden(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values[None])
        if feats.shape[1] == self.vision.num_patches + 1:
            feats = feats[:, 1:]
        x = _dense(feats[0], params["neck"]["sum_proj"])
        return _layer_norm(x, params["neck"]["layer_norm"])

    def cross_kv(self, params, enc_hidden: jax.Array) -> list[jax.Array]:
        t = enc_hidden.shape[0]
        nh, hd = self.dec_heads, self.head_dim
        out = []
        for lp in params["decoder"]["layers"]:
            k = linear(enc_hidden, lp["encoder_attn"]["k_proj"]).reshape(
                t, nh, hd)
            v = linear(enc_hidden, lp["encoder_attn"]["v_proj"]).reshape(
                t, nh, hd)
            out.append(jnp.concatenate([k, v], axis=1))
        return out

    # -- decoder (ModelForward interface) ---------------------------------------

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        dec = params["decoder"]
        x = dec["embed_tokens"]["weight"][input_ids]
        # MBartDecoderNoPos: layernorm_embedding, no positional embedding
        x = _layer_norm(x, dec["layernorm_embedding"])
        new_states = []
        for i, lp in enumerate(dec["layers"]):
            st = states[i]
            res = x
            h = _layer_norm(x, lp["self_attn_layer_norm"])
            attn_out, kv = attention_block(
                self.attn_spec,
                {
                    "q_proj": lp["self_attn"]["q_proj"],
                    "k_proj": lp["self_attn"]["k_proj"],
                    "v_proj": lp["self_attn"]["v_proj"],
                    "o_proj": lp["self_attn"]["out_proj"],
                },
                h,
                md,
                st["kv"],
                None,
                attention_backend=self.attention_backend,
            )
            x = res + attn_out
            res = x
            h = _layer_norm(x, lp["encoder_attn_layer_norm"])
            x = res + cross_attention(
                lp["encoder_attn"], h, md, st["cross"], self.dec_heads,
                st["enc_len"],
            )
            res = x
            h = _layer_norm(x, lp["final_layer_norm"])
            x = res + linear(jax.nn.gelu(linear(h, lp["fc1"])), lp["fc2"])
            new_states.append(
                {"kv": kv, "cross": st["cross"], "enc_len": st["enc_len"]}
            )
        x = _layer_norm(x, dec["layer_norm"])
        return x, new_states

    def compute_logits(self, params, hidden):
        return linear(hidden, params["lm_head"]).astype(jnp.float32)
