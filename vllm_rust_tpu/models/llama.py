"""Llama-family decoder: the workhorse architecture.

Covers Llama/2/3, Qwen2/2.5, Qwen3, Mistral and close relatives through
config knobs — the same consolidation the reference reaches via its
AttentionBlock (reference per-arch files models/llama.rs, models/qwen3.rs:
21-428, models/mistral.rs all delegate to one block; here a single class
does, with subclass hooks only where weights/structure differ).

Design: the model object holds ONLY static config (hashable); parameters
are an explicit pytree threaded through pure functions, so `jax.jit`
closes over the model and donates params/KV buffers.
"""

from __future__ import annotations

import math
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
from ..ops.attn_metadata import AttentionMetadata


class LlamaForCausalLM:
    """Functional Llama-family causal LM."""

    # subclass knobs
    qkv_bias: bool = False
    norm_offset: float = 0.0  # 1.0 => Gemma (1+w) norms
    embedding_multiplier: float | None = None
    extra_ffn_norms: bool = False  # Gemma2/3 pre/post feedforward norms
    # GLM4-style norms applied to sublayer OUTPUTS before the residual add
    post_sublayer_norms: bool = False
    residual_multiplier: float = 1.0  # Granite
    # EAGLE-3 support: residual-stream captures after these layer indices
    # are concatenated and returned as a third output (set by the spec
    # engine when an Eagle3 proposer is attached)
    aux_hidden_layers: tuple = ()
    # pipeline-parallel stage hooks available (subclasses that override
    # __call__ with structure the hooks don't cover must clear this —
    # reference models/factory.rs Capabilities::PP)
    supports_pp: bool = True

    def _norm(self, x, w):
        """Hidden-state norm hook (DBRX overrides with LayerNorm)."""
        return rms_norm(
            x, w, self.config.rms_norm_eps, weight_offset=self.norm_offset
        )

    def _ffn(self, mlp_params, h):
        """FFN hook (Apertus overrides with an ungated xIELU MLP)."""
        return swiglu_mlp(h, mlp_params, self.config.hidden_act)

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        if config.attention_bias:
            self.qkv_bias = True
        self.attn_specs = tuple(
            self._make_attn_spec(i) for i in range(config.num_hidden_layers)
        )
        self.rotary = RotarySpec.from_model_config(config)
        self.attention_backend = "auto"
        # set by the engine when the KV pool is quantized (fp8/int8):
        # (k_scale, v_scale) as static floats
        self.kv_scales: tuple | None = None

    # -- static structure ---------------------------------------------------

    def _make_attn_spec(self, layer_idx: int) -> AttentionSpec:
        spec = AttentionSpec.from_model_config(self.config, layer_idx)
        if self.norm_offset:
            spec = AttentionSpec(
                **{**spec.__dict__, "norm_offset": self.norm_offset}
            )
        return spec

    @property
    def mrope_section(self):
        """3-axis mrope half-dim sections, or None (engine selector)."""
        return self.rotary.mrope_section

    @property
    def num_layers(self) -> int:
        return self.config.num_hidden_layers

    @property
    def kv_head_info(self) -> list[tuple[int, int]]:
        """Per-layer (num_kv_heads, head_dim) — drives KV pool geometry
        (reference: kv_cache/config.rs KvLayerSpec)."""
        return [
            (s.num_kv_heads, s.head_dim) for s in self.attn_specs
        ]

    # -- parameter init / loading ------------------------------------------

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        """Random (or zero) params with the final tree structure — the
        dummy-weight boot path (reference loader.rs:205 load_dummy_weights)."""
        cfg = self.config
        d = self.dtype

        def w(key, shape):
            if rng is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = cfg.num_hidden_layers * 8 + 4
        if rng is not None:
            _k = jax.random.split(rng, n_keys)
            keys = iter([_k[i] for i in range(n_keys)])
        else:
            keys = iter([None] * n_keys)
        h, hd = cfg.hidden_size, cfg.head_dim
        nh = cfg.num_attention_heads
        inter = cfg.intermediate_size

        def linear_p(key, din, dout, bias=False):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        layers = []
        for i in range(cfg.num_hidden_layers):
            nkv = self.attn_specs[i].num_kv_heads  # per-layer GQA (DeciLM)
            lp = {
                "input_layernorm": jnp.ones((h,), d) - self.norm_offset,
                "post_attention_layernorm": jnp.ones((h,), d) - self.norm_offset,
                "self_attn": {
                    "q_proj": linear_p(next(keys), h, nh * hd, self.qkv_bias),
                    "k_proj": linear_p(next(keys), h, nkv * hd, self.qkv_bias),
                    "v_proj": linear_p(next(keys), h, nkv * hd, self.qkv_bias),
                    "o_proj": linear_p(next(keys), nh * hd, h),
                },
                "mlp": {
                    "gate_proj": linear_p(next(keys), h, inter),
                    "up_proj": linear_p(next(keys), h, inter),
                    "down_proj": linear_p(next(keys), inter, h),
                },
            }
            if self.attn_specs[i].qk_norm:
                lp["self_attn"]["q_norm"] = jnp.ones((hd,), d) - self.norm_offset
                lp["self_attn"]["k_norm"] = jnp.ones((hd,), d) - self.norm_offset
            if self.extra_ffn_norms:
                lp["pre_feedforward_layernorm"] = jnp.ones((h,), d) - self.norm_offset
                lp["post_feedforward_layernorm"] = jnp.ones((h,), d) - self.norm_offset
            if self.post_sublayer_norms:
                lp["post_self_attn_layernorm"] = jnp.ones((h,), d)
                lp["post_mlp_layernorm"] = jnp.ones((h,), d)
            layers.append(lp)

        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, h))},
            "layers": layers,
            "norm": jnp.ones((h,), d) - self.norm_offset,
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = linear_p(next(keys), h, cfg.vocab_size)
        cos, sin = compute_rope_tables(self.rotary, cfg.max_position_embeddings)
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        return params

    # HF safetensors name -> (path in tree, transpose?)
    def _param_path(self, name: str) -> tuple[list, bool] | None:
        name = name.removeprefix("model.")
        if name == "embed_tokens.weight":
            return ["embed_tokens", "weight"], False
        if name == "norm.weight":
            return ["norm"], False
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return None
            return ["lm_head", "weight"], True
        parts = name.split(".")
        if parts[0] == "layers":
            idx = int(parts[1])
            rest = parts[2:]
            if rest[-1] == "weight" and rest[-2].endswith("_proj"):
                return ["layers", idx, *rest[:-1], "weight"], True
            if rest[-1] == "bias":
                return ["layers", idx, *rest[:-1], "bias"], False
            if rest[-1] == "weight":  # norms
                return ["layers", idx, *rest[:-1]], False
        return None

    def _split_fused(self, weights):
        """Split fused qkv_proj / gate_up_proj checkpoint tensors into the
        canonical per-projection names (Phi-3, GLM-4, InternLM2 layouts)."""
        cfg = self.config
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )
        for name, arr in weights:
            a = np.asarray(arr)
            if ".self_attn.qkv_proj." in name:
                base, leaf = name.rsplit("qkv_proj.", 1)
                q, k, v = np.split(a, [nh * hd, (nh + nkv) * hd], axis=0)
                yield base + "q_proj." + leaf, q
                yield base + "k_proj." + leaf, k
                yield base + "v_proj." + leaf, v
            elif ".mlp.gate_up_proj." in name:
                base, leaf = name.rsplit("gate_up_proj.", 1)
                g, u = np.split(a, 2, axis=0)
                yield base + "gate_proj." + leaf, g
                yield base + "up_proj." + leaf, u
            else:
                yield name, a

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """Build the param tree from an (name, array) stream.

        Reference: loader.rs:115 fetch + VarBuilder mmap; here arrays come
        from safetensors numpy and are device_put once, pre-transposed to
        [in, out]."""
        params = self.init_params(rng=None)
        seen = set()
        for name, arr in self._split_fused(weights):
            path = self._param_path(name)
            if path is None:
                continue
            tree_path, transpose = path
            a = np.asarray(arr)
            if transpose:
                a = a.T
            node = params
            for p in tree_path[:-1]:
                node = node[p]
            leaf = tree_path[-1]
            expected = node[leaf]
            if expected.shape != a.shape:
                raise ValueError(
                    f"shape mismatch for {name}: checkpoint {a.shape} vs model {expected.shape}"
                )
            node[leaf] = jnp.asarray(a, self.dtype)
            seen.add(name)
        return params

    # -- forward ------------------------------------------------------------

    def embed(self, params: dict, input_ids: jax.Array, embeds=None) -> jax.Array:
        """Pipeline stage hook: token embedding (reference
        distributed/pipeline.rs — stage 0 hosts the embedding).
        ``embeds``: multimodal injection (mask [T] bool, override [T, H])
        applied BEFORE the embedding multiplier (reference
        multimodal/processor.rs merge_embeddings)."""
        x = params["embed_tokens"]["weight"][input_ids]
        if embeds is not None:
            mask, override = embeds
            x = jnp.where(mask[:, None], override.astype(x.dtype), x)
        if self.embedding_multiplier is not None:
            x = (x.astype(jnp.float32) * self.embedding_multiplier).astype(self.dtype)
        return x

    def _layer_step(self, params, i, lp, x, md, kv_page):
        """One decoder layer. Shared by __call__ and the pipeline-stage
        hook run_layers."""
        cfg = self.config
        rope_tables = self.rope_tables_for_layer(params, i)
        residual = x
        h = rms_norm(
            x, lp["input_layernorm"], cfg.rms_norm_eps, weight_offset=self.norm_offset
        )
        ks, vs = self.kv_scales if self.kv_scales else (None, None)
        attn_out, kv = attention_block(
            self.attn_specs[i],
            lp["self_attn"],
            h,
            md,
            kv_page,
            rope_tables,
            attention_backend=self.attention_backend,
            k_scale=ks,
            v_scale=vs,
        )
        if self.post_sublayer_norms:
            attn_out = rms_norm(
                attn_out, lp["post_self_attn_layernorm"], cfg.rms_norm_eps
            )
        if self.extra_ffn_norms:
            # Gemma2/3 sandwich norms: post_attention_layernorm normalizes
            # the attention OUTPUT before the residual add, and
            # pre_feedforward_layernorm is the MLP pre-norm (HF
            # Gemma2DecoderLayer order; verified vs transformers numerics).
            attn_out = rms_norm(
                attn_out,
                lp["post_attention_layernorm"],
                cfg.rms_norm_eps,
                weight_offset=self.norm_offset,
            )
        x = residual + attn_out * self.residual_multiplier

        residual = x
        h = rms_norm(
            x,
            lp["pre_feedforward_layernorm"]
            if self.extra_ffn_norms
            else lp["post_attention_layernorm"],
            cfg.rms_norm_eps,
            weight_offset=self.norm_offset,
        )
        ffn = self._ffn(lp["mlp"], h)
        if self.extra_ffn_norms:
            ffn = rms_norm(
                ffn,
                lp["post_feedforward_layernorm"],
                cfg.rms_norm_eps,
                weight_offset=self.norm_offset,
            )
        if self.post_sublayer_norms:
            ffn = rms_norm(ffn, lp["post_mlp_layernorm"], cfg.rms_norm_eps)
        x = residual + ffn * self.residual_multiplier
        return x, kv

    def run_layers(
        self, params, x, md, kv_pages, lo: int, hi: int
    ) -> tuple[jax.Array, list[jax.Array]]:
        """Pipeline stage hook: layers [lo, hi) on an already-embedded
        activation. kv_pages is the STAGE slice (index 0 = layer lo)."""
        new_kv = []
        for i in range(lo, hi):
            x, kv = self._layer_step(
                params, i, params["layers"][i], x, md, kv_pages[i - lo]
            )
            new_kv.append(kv)
        return x, new_kv

    def final_norm(self, params, x: jax.Array) -> jax.Array:
        """Pipeline stage hook: final norm (last stage, before lm_head)."""
        return rms_norm(
            x, params["norm"], self.config.rms_norm_eps,
            weight_offset=self.norm_offset,
        )

    def __call__(
        self,
        params: dict,
        input_ids: jax.Array,  # [T]
        md: AttentionMetadata,
        kv_pages: list[jax.Array],  # per layer
        embeds: tuple[jax.Array, jax.Array] | None = None,
    ) -> tuple[jax.Array, list[jax.Array]]:
        x = self.embed(params, input_ids, embeds)
        new_kv = []
        aux_feats = []
        for i, lp in enumerate(params["layers"]):
            x, kv = self._layer_step(params, i, lp, x, md, kv_pages[i])
            new_kv.append(kv)
            for _ in range(self.aux_hidden_layers.count(i)):
                aux_feats.append(x)

        x = self.final_norm(params, x)
        if self.aux_hidden_layers:
            return x, new_kv, jnp.concatenate(aux_feats, axis=-1)
        return x, new_kv

    def rope_tables_for_layer(self, params: dict, layer_idx: int):
        """Per-layer RoPE table selection (Gemma-3 overrides: sliding
        layers use a local-frequency table)."""
        return (params["rope_cos"], params["rope_sin"])

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        """hidden [S, H] -> logits [S, V] (float32)."""
        if self.config.tie_word_embeddings:
            logits = hidden @ params["embed_tokens"]["weight"].T
        else:
            logits = linear(hidden, params["lm_head"])
        logits = logits.astype(jnp.float32)
        cap = self.config.final_logit_softcapping
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        if self.config.logits_scaling:
            logits = logits / self.config.logits_scaling
        return logits


class Qwen2ForCausalLM(LlamaForCausalLM):
    """Qwen2/2.5: qkv bias, no o bias (reference models/qwen2.rs)."""

    qkv_bias = True


class Qwen3ForCausalLM(LlamaForCausalLM):
    """Qwen3: per-head QK-RMSNorm, explicit head_dim
    (reference models/qwen3.rs:21-428)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = True
        super().__init__(config, dtype)


class MistralForCausalLM(LlamaForCausalLM):
    """Mistral: global sliding window (reference models/mistral.rs)."""
