"""Gemma-3n: Gemma-3 wrapped in Alternating Updates (AltUp).

Reference: models/gemma3n.rs. On top of the Gemma-3 decoder (offset
norms, QK-norm, sliding/full layer pattern with a local rope table) the
3n variants add:
  - AltUp (gemma3n.rs:222-372): `altup_num_inputs` parallel hidden
    streams; a predict step mixes streams through learned per-token
    coefficients, the transformer layer runs on the active stream, and a
    correct step propagates the innovation back to all streams.
  - Laurel (gemma3n.rs:375-412): a low-rank residual path parallel to
    attention.
  - Per-layer inputs (gemma3n.rs:1102-1123): a projection of the token
    embedding sliced per layer, gated into the non-active streams after
    the correct step.
  - Unweighted per-head RMSNorm on V, attention scale 1.0
    (gemma3n.rs:576, :598), per-layer intermediate sizes.

Like the reference, this implementation derives per-layer inputs from
the projection only (no separate `embed_tokens_per_layer` vocabulary,
gemma3n.rs:1102) and does not sparsify MLP activations.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.norm import rms_norm
from ..layers.rotary import RotarySpec, compute_rope_tables
from .gemma import Gemma3ForCausalLM


def _magnitude_match(x: jax.Array, target: jax.Array) -> jax.Array:
    """Scale x so its per-token RMS magnitude matches target's
    (gemma3n.rs:1056-1070 altup_embed normalization)."""
    tm = jnp.sqrt(jnp.mean(jnp.square(target.astype(jnp.float32)), -1,
                           keepdims=True))
    nm = jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), -1,
                           keepdims=True))
    tiny = jnp.finfo(jnp.float32).tiny
    return (x.astype(jnp.float32) * (tm / jnp.maximum(nm, tiny))).astype(
        x.dtype
    )


class Gemma3nForCausalLM(Gemma3ForCausalLM):
    supports_pp = False  # multi-stream hidden state — no stage hooks

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        if config.layer_types is None:
            # gemma3n default: every `sliding_window_pattern`-th layer
            # (i % p == 0) is sliding (gemma3n.rs:165-180)
            p = int(ex.get("sliding_window_pattern", 2))
            config.layer_types = [
                "sliding_attention" if (p > 0 and i % p == 0)
                else "full_attention"
                for i in range(config.num_hidden_layers)
            ]
        super().__init__(config, dtype)
        self.n_altup = int(ex.get("altup_num_inputs", 4))
        self.altup_active = int(ex.get("altup_active_idx", 0))
        self.laurel_rank = int(ex.get("laurel_rank", 128))
        self.pli_dim = int(ex.get("hidden_size_per_layer_input", 128))
        inter = ex.get("intermediate_size", config.intermediate_size)
        n = config.num_hidden_layers
        if isinstance(inter, (list, tuple)):
            self.intermediate_sizes = [int(v) for v in inter]
        else:
            self.intermediate_sizes = [int(inter)] * n

    def _make_attn_spec(self, layer_idx: int) -> AttentionSpec:
        spec = super()._make_attn_spec(layer_idx)
        # raw q·k logits — no 1/sqrt(d) (gemma3n.rs:598); softcap kept
        # even on sliding layers, unlike Gemma3
        return replace(
            spec, sm_scale=1.0, v_norm_unweighted=True,
            soft_cap=self.config.attn_logit_softcapping,
        )

    # -- params ---------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        h, d = cfg.hidden_size, self.dtype
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        na, r, pli = self.n_altup, self.laurel_rank, self.pli_dim

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(jax.random.PRNGKey(11), shape)
                    ).astype(d)

        def norm(size=h):
            # gemma (1+w) norms: stored weights default 0
            return jnp.zeros((size,), d)

        layers = []
        for i in range(cfg.num_hidden_layers):
            inter = self.intermediate_sizes[i]
            layers.append({
                "input_layernorm": norm(),
                "post_attention_layernorm": norm(),
                "pre_feedforward_layernorm": norm(),
                "post_feedforward_layernorm": norm(),
                "post_per_layer_input_norm": norm(),
                "self_attn": {
                    "q_proj": {"weight": w((h, nh * hd))},
                    "k_proj": {"weight": w((h, nkv * hd))},
                    "v_proj": {"weight": w((h, nkv * hd))},
                    "o_proj": {"weight": w((nh * hd, h))},
                    "q_norm": norm(hd),
                    "k_norm": norm(hd),
                },
                "mlp": {
                    "gate_proj": {"weight": w((h, inter))},
                    "up_proj": {"weight": w((h, inter))},
                    "down_proj": {"weight": w((inter, h))},
                },
                "laurel": {
                    "linear_left": {"weight": w((h, r))},
                    "linear_right": {"weight": w((r, h))},
                    "post_laurel_norm": norm(),
                },
                "altup": {
                    "correction_coefs": {"weight": w((na, na))},
                    "prediction_coefs": {"weight": w((na, na * na))},
                    "modality_router": {"weight": w((h, na))},
                    "router_norm": norm(),
                    "correct_output_scale": jnp.ones((h,), jnp.float32),
                },
                "per_layer_input_gate": {"weight": w((h, pli))},
                "per_layer_projection": {"weight": w((pli, h))},
            })
        params = {
            "embed_tokens": {"weight": w((cfg.vocab_size, h))},
            "layers": layers,
            "norm": norm(),
            "altup_projections": [
                {"weight": w((h, h))} for _ in range(na - 1)
            ],
            "altup_unembed_projections": [
                {"weight": w((h, h))} for _ in range(na - 1)
            ],
            "per_layer_model_projection": {
                "weight": w((h, cfg.num_hidden_layers * pli))
            },
            "per_layer_projection_norm": norm(pli),
        }
        cos, sin = compute_rope_tables(self.rotary, cfg.max_position_embeddings)
        params["rope_cos"], params["rope_sin"] = cos, sin
        cos, sin = compute_rope_tables(
            self.local_rotary, cfg.max_position_embeddings
        )
        params["rope_cos_local"], params["rope_sin_local"] = cos, sin
        return params

    # -- altup ----------------------------------------------------------------

    def _router_modalities(self, ap, x):
        eps = self.config.rms_norm_eps
        r = rms_norm(x, ap["router_norm"], eps, weight_offset=1.0)
        r = r.astype(jnp.float32) / float(self.config.hidden_size)
        routed = linear(r.astype(x.dtype), ap["modality_router"])
        return jnp.tanh(routed.astype(jnp.float32)).astype(x.dtype)

    def _altup_predict(self, ap, hs):
        """hs [n, T, h] → predictions [n, T, h] (gemma3n.rs:292-332)."""
        na = self.n_altup
        modalities = self._router_modalities(ap, hs[self.altup_active])
        coefs = linear(modalities, ap["prediction_coefs"])  # [T, n*n]
        coefs = coefs.reshape(-1, na, na)  # [T, i, j]
        pred = jnp.einsum("tij,jth->ith", coefs.astype(jnp.float32),
                          hs.astype(jnp.float32))
        return (pred + hs.astype(jnp.float32)).astype(hs.dtype)

    def _altup_correct(self, ap, preds, activated):
        """preds [n, T, h], activated [T, h] → corrected [n, T, h]
        (gemma3n.rs:337-371)."""
        modalities = self._router_modalities(ap, activated)
        coefs = linear(modalities, ap["correction_coefs"]).astype(
            jnp.float32
        ) + 1.0  # [T, n]
        innovation = (activated - preds[self.altup_active]).astype(
            jnp.float32
        )
        corrected = (innovation[None] * coefs.T[:, :, None]
                     + preds.astype(jnp.float32))
        return corrected.astype(activated.dtype)

    # -- forward --------------------------------------------------------------

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        cfg = self.config
        eps = cfg.rms_norm_eps
        x0 = params["embed_tokens"]["weight"][input_ids]
        if embeds is not None:
            # multimodal injection BEFORE the sqrt(h) multiplier
            # (engine/vlm.py convention; reference gemma3n_vlm.rs:269
            # merges post-scale with pre-scaled projections — same result)
            mask, override = embeds
            x0 = jnp.where(mask[:, None], override.astype(x0.dtype), x0)
        x0 = (x0.astype(jnp.float32) * math.sqrt(cfg.hidden_size)
              ).astype(self.dtype)
        t = x0.shape[0]

        # per-layer inputs: [T, L, pli], each slice RMS-normed
        pli = linear(x0, params["per_layer_model_projection"]).reshape(
            t, cfg.num_hidden_layers, self.pli_dim
        )
        pli = rms_norm(pli, params["per_layer_projection_norm"], eps,
                       weight_offset=1.0)

        # altup embed: n streams, magnitude-matched to the active one
        streams = [x0]
        for i in range(1, self.n_altup):
            s = linear(x0, params["altup_projections"][i - 1])
            streams.append(_magnitude_match(s, x0))
        hs = jnp.stack(streams, axis=0)  # [n, T, h]

        new_kv = []
        sqrt2 = math.sqrt(2.0)
        for i, lp in enumerate(params["layers"]):
            ap = lp["altup"]
            preds = self._altup_predict(ap, hs)
            active = preds[self.altup_active]
            a_norm = rms_norm(active, lp["input_layernorm"], eps,
                              weight_offset=1.0)
            # laurel low-rank residual
            lr = linear(linear(a_norm, lp["laurel"]["linear_left"]),
                        lp["laurel"]["linear_right"])
            laurel_out = a_norm + rms_norm(
                lr, lp["laurel"]["post_laurel_norm"], eps, weight_offset=1.0
            )
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], a_norm, md, kv_pages[i],
                self.rope_tables_for_layer(params, i),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            attn = rms_norm(attn_out, lp["post_attention_layernorm"], eps,
                            weight_offset=1.0)
            attn_laurel = ((attn + active) + laurel_out) / sqrt2
            h = rms_norm(attn_laurel, lp["pre_feedforward_layernorm"], eps,
                         weight_offset=1.0)
            ffw = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            ffw = rms_norm(ffw, lp["post_feedforward_layernorm"], eps,
                           weight_offset=1.0)
            out = attn_laurel + ffw

            corrected = self._altup_correct(ap, preds, out)
            scaled = (corrected[self.altup_active].astype(jnp.float32)
                      * ap["correct_output_scale"][None, :]).astype(
                          self.dtype)
            gated = jax.nn.gelu(
                linear(scaled, lp["per_layer_input_gate"]), approximate=True
            ) * pli[:, i, :]
            projected = rms_norm(
                linear(gated, lp["per_layer_projection"]),
                lp["post_per_layer_input_norm"], eps, weight_offset=1.0,
            )
            # add to all non-active streams (gemma3n.rs:886-891)
            mask = jnp.arange(self.n_altup) != self.altup_active
            hs = corrected + jnp.where(
                mask[:, None, None], projected[None], 0.0
            ).astype(corrected.dtype)

        # altup unembed: project streams 1..n back, average
        outs = [hs[0]]
        for i in range(1, self.n_altup):
            u = linear(hs[i], params["altup_unembed_projections"][i - 1])
            outs.append(_magnitude_match(u, hs[0]))
        x = jnp.mean(jnp.stack(outs, 0).astype(jnp.float32), axis=0).astype(
            self.dtype
        )
        x = rms_norm(x, params["norm"], eps, weight_offset=1.0)
        return x, new_kv

    # -- weights --------------------------------------------------------------

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            # some exports nest AltUp tops under `self_decoder.`
            # (gemma3n.rs:969, :989); also accept `language_model.` (VLM)
            n = (name.removeprefix("language_model.")
                 .removeprefix("model.")
                 .replace("self_decoder.", ""))
            a = np.asarray(arr)
            if n == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif n == "norm.weight":
                params["norm"] = jnp.asarray(a, self.dtype)
            elif n == "per_layer_model_projection.weight":
                params["per_layer_model_projection"]["weight"] = jnp.asarray(
                    a.T, self.dtype)
            elif n == "per_layer_projection_norm.weight":
                params["per_layer_projection_norm"] = jnp.asarray(
                    a, self.dtype)
            elif n.startswith(("altup_projections.",
                               "altup_unembed_projections.")):
                parts = n.split(".")
                params[parts[0]][int(parts[1])]["weight"] = jnp.asarray(
                    a.T, self.dtype)
            elif n.startswith("layers."):
                parts = n.split(".")
                self._load_layer_3n(params["layers"][int(parts[1])],
                                    parts[2:], a)
        return params

    _layer_norms = (
        "input_layernorm", "post_attention_layernorm",
        "pre_feedforward_layernorm", "post_feedforward_layernorm",
        "post_per_layer_input_norm",
    )

    def _load_layer_3n(self, lp, rest, a):
        if rest[0] in self._layer_norms:
            lp[rest[0]] = jnp.asarray(a, self.dtype)
        elif rest[0] in ("self_attn", "mlp"):
            tgt = lp[rest[0]]
            if rest[1] in ("q_norm", "k_norm"):
                tgt[rest[1]] = jnp.asarray(a, self.dtype)
            else:
                tgt[rest[1]][rest[2]] = jnp.asarray(
                    a.T if rest[2] == "weight" else a, self.dtype
                )
        elif rest[0] == "laurel":
            if rest[1] == "post_laurel_norm":
                lp["laurel"]["post_laurel_norm"] = jnp.asarray(a, self.dtype)
            else:
                lp["laurel"][rest[1]]["weight"] = jnp.asarray(a.T, self.dtype)
        elif rest[0] == "altup":
            ap = lp["altup"]
            if rest[1] == "router_norm":
                ap["router_norm"] = jnp.asarray(a, self.dtype)
            elif rest[1] == "correct_output_scale":
                ap["correct_output_scale"] = jnp.asarray(a, jnp.float32)
            else:
                ap[rest[1]]["weight"] = jnp.asarray(a.T, self.dtype)
        elif rest[0] in ("per_layer_input_gate", "per_layer_projection"):
            lp[rest[0]]["weight"] = jnp.asarray(a.T, self.dtype)


from .vision import SiglipVisionTower, _dense  # noqa: E402
from .vlm_breadth import VlmBase, _rms_norm as _plain_rms  # noqa: E402


class Gemma3nForConditionalGeneration(VlmBase):
    """Gemma3n VLM (reference models/gemma3n_vlm.rs): SigLIP vision tower
    + a multimodal embedder (soft_embedding_norm → embedding_projection →
    embedding_post_projection_norm, gemma3n_vlm.rs:166-206) into the
    AltUp language model. The audio path accepts pre-encoded embeddings
    through the same embedder shape (`embed_audio`), matching the
    reference's preprocessing-only audio tower (gemma3n_vlm.rs:145-163)."""

    def _build(self, ex: dict):
        self._make_text_model(ex.get("text_config", {}),
                              "Gemma3nForCausalLM")
        self.vision = SiglipVisionTower(
            dict(ex.get("vision_config", {})), dtype=self.dtype
        )
        self.image_token_index = int(
            ex.get("image_token_index", ex.get("image_token_id", 262145))
        )
        self.tokens_per_image = int(
            ex.get("vision_soft_tokens_per_image", self.vision.num_patches)
        )
        ac = ex.get("audio_config") or {}
        self.audio_hidden = int(ac.get("hidden_size", 1536))

    def _embedder(self, rng, scale, d_in, d_out):
        return {
            "soft_embedding_norm": jnp.ones((d_in,), self.dtype),
            "embedding_projection": {
                "weight": self._w(rng, (d_in, d_out), scale),
                "bias": jnp.zeros((d_out,), self.dtype),
            },
            "embedding_post_projection_norm": jnp.ones((d_out,), self.dtype),
        }

    def _init_projector(self, rng, scale):
        ht = self.text_config.hidden_size
        return {
            "embed_vision": self._embedder(
                rng, scale, self.vision.hidden_size, ht),
            "embed_audio": self._embedder(rng, scale, self.audio_hidden, ht),
        }

    def _route_weight(self, name: str):
        if name.startswith(("language_model.", "model.language_model.")):
            return "lm", name.split("language_model.", 1)[1]
        if name.startswith("lm_head."):
            return "lm", name
        if "vision_tower." in name:
            return "vision", name.split("vision_tower.", 1)[1]
        if name.startswith(("embed_vision.", "embed_audio.",
                            "model.embed_vision.", "model.embed_audio.")):
            return "proj", name.removeprefix("model.")
        return None  # audio_tower.* — preprocessing-only

    def _load_projector(self, raw):
        proj = self._init_projector(None, 0.0)
        for name, arr in raw:
            parts = name.split(".")
            a = np.asarray(arr)
            node = proj[parts[0]]
            if parts[1] == "embedding_projection":
                node["embedding_projection"][parts[2]] = jnp.asarray(
                    a.T if parts[2] == "weight" else a, self.dtype
                )
            else:
                node[parts[1]] = jnp.asarray(a, self.dtype)
        return proj

    def _apply_embedder(self, p, x):
        x = _plain_rms(x, p["soft_embedding_norm"])
        x = _dense(x, p["embedding_projection"])
        return _plain_rms(x, p["embedding_post_projection_norm"])

    def encode_images(self, params, pixel_values):
        feats = self.vision(params["vision_tower"], pixel_values)
        x = self._apply_embedder(params["projector"]["embed_vision"], feats)
        return x.reshape(-1, x.shape[-1])

    def encode_audio(self, params, audio_embeds):
        x = self._apply_embedder(
            params["projector"]["embed_audio"], audio_embeds
        )
        return x.reshape(-1, x.shape[-1])


def register_gemma3n(registry: dict) -> None:
    registry.update({
        "Gemma3nForCausalLM": Gemma3nForCausalLM,
        "Gemma3nTextModel": Gemma3nForCausalLM,
        "Gemma3nForConditionalGeneration": Gemma3nForConditionalGeneration,
    })
