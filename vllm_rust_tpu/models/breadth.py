"""Architecture breadth batch 2: Cohere, OLMo family, Baichuan,
InternLM2, MiniCPM, DeciLM, SmolLM3, ChatGLM, Arcee, Exaone4.

Reference: the corresponding models/{cohere,olmo,olmo2,baichuan,
internlm2,minicpm,decilm,smollm3,chatglm,arcee,exaone4}.rs factory
files. Each class here is a thin knob/rename layer over the shared
Llama (RMSNorm) or LNTransformer (LayerNorm) bases — the consolidation
the reference reaches via its AttentionBlock config."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.linear import linear
from ..layers.mlp import _ACTS
from ..layers.norm import rms_norm
from .gpt_family import LNTransformer, split_qkv_falcon, split_qkv_sequential
from .llama import LlamaForCausalLM, Qwen2ForCausalLM


# -- Cohere Command-R -------------------------------------------------------


class CohereForCausalLM(LNTransformer):
    """Cohere Command-R (reference models/cohere.rs): parallel residual
    over one shared LayerNorm (no bias), gated SiLU MLP, tied embeddings,
    logit_scale, optional per-head q/k LayerNorm, interleaved rope."""

    parallel_residual = True
    single_ln = True
    norm_has_bias = False
    mlp_gated = True
    attn_bias = False
    o_bias = False
    mlp_bias = False
    interleaved_rope = True

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.norm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        self.logit_scale = float(x.get("logit_scale", 1.0))
        self.qk_layernorm = bool(x.get("use_qk_norm", False))
        config.tie_word_embeddings = True
        config.hidden_act = "silu"
        if bool(x.get("attention_bias", config.attention_bias)):
            self.attn_bias = True
        super().__init__(config, dtype)

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        if self.qk_layernorm:
            # Cohere q/k norms carry distinct per-head weights
            cfg, d = self.config, self.dtype
            nh, nkv, hd = (
                cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
            )
            for lp in params["layers"]:
                lp["self_attn"]["q_norm"] = {"weight": jnp.ones((nh, hd), d)}
                lp["self_attn"]["k_norm"] = {"weight": jnp.ones((nkv, hd), d)}
        return params

    def compute_logits(self, params, hidden):
        logits = hidden @ params["embed_tokens"]["weight"].T
        return (logits * self.logit_scale).astype(jnp.float32)


class Cohere2ForCausalLM(CohereForCausalLM):
    """Command-R7B (reference models/cohere2.rs): sliding-window layers
    with rope; every `sliding_window_pattern`-th layer is global and
    uses NO positional encoding."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        pattern = int(x.get("sliding_window_pattern", 4))
        if config.sliding_window and config.layer_types is None:
            config.layer_types = [
                "full_attention" if (i + 1) % pattern == 0 else "sliding_attention"
                for i in range(config.num_hidden_layers)
            ]
        super().__init__(config, dtype)
        # global layers: no rope (NoPE); sliding layers keep rope
        self.attn_specs = tuple(
            dataclasses.replace(s, rotary=None)
            if s.sliding_window is None
            else s
            for s in self.attn_specs
        )


# -- OLMo family ------------------------------------------------------------


class OlmoForCausalLM(LNTransformer):
    """AllenAI OLMo-1 (reference models/olmo.rs): non-parametric
    LayerNorm, bias-free linears, gated SiLU MLP, optional clip_qkv."""

    norm_affine = False
    mlp_gated = True
    attn_bias = False
    o_bias = False
    mlp_bias = False

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.norm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.hidden_act = "silu"
        super().__init__(config, dtype)
        clip = config.extra.get("clip_qkv")
        if clip:
            self.attn_specs = tuple(
                dataclasses.replace(s, qkv_clip=float(clip))
                for s in self.attn_specs
            )


class PostNormLlama(LlamaForCausalLM):
    supports_pp = False  # custom __call__ (post-norm residual order)
    """Post-LN RMSNorm skeleton shared by OLMo-2/3 and EXAONE-4
    (reference models/olmo2.rs, exaone4.rs:96-153): the sublayer output
    is normalized BEFORE the residual add; there are no pre-norms.

        x = x + post_attention_layernorm(attn(x))
        x = x + post_feedforward_layernorm(mlp(x))
    """

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h = cfg.hidden_size
        for lp in params["layers"]:
            lp.pop("input_layernorm", None)
            lp["post_attention_layernorm"] = jnp.ones((h,), d)
            lp["post_feedforward_layernorm"] = jnp.ones((h,), d)
        return params

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        from ..layers.attention import attention_block
        from ..layers.mlp import swiglu_mlp

        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            rope_tables = self.rope_tables_for_layer(params, i)
            ks, vs = self.kv_scales if self.kv_scales else (None, None)
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], x, md, kv_pages[i],
                rope_tables, attention_backend=self.attention_backend,
                k_scale=ks, v_scale=vs,
            )
            new_kv.append(kv)
            x = x + rms_norm(
                attn_out, lp["post_attention_layernorm"], cfg.rms_norm_eps
            )
            ffn = swiglu_mlp(x, lp["mlp"], cfg.hidden_act)
            x = x + rms_norm(
                ffn, lp["post_feedforward_layernorm"], cfg.rms_norm_eps
            )
        x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
        return x, new_kv


class Olmo2ForCausalLM(PostNormLlama):
    """OLMo-2 (reference models/olmo2.rs): post-LN + full-projection
    q/k RMSNorm."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = True
        super().__init__(config, dtype)
        self.attn_specs = tuple(
            dataclasses.replace(s, qk_norm_full=True) for s in self.attn_specs
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )
        for lp in params["layers"]:
            lp["self_attn"]["q_norm"] = jnp.ones((nh * hd,), d)
            lp["self_attn"]["k_norm"] = jnp.ones((nkv * hd,), d)
        return params


class Olmo3ForCausalLM(Olmo2ForCausalLM):
    """OLMo-3: OLMo-2 + sliding-window layer pattern (layer_types from
    config drive per-layer windows via AttentionSpec)."""


class Exaone4ForCausalLM(PostNormLlama):
    """LG EXAONE-4.0 (reference models/exaone4.rs): post-LN + per-head
    qk RMSNorm + LLLG sliding pattern."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = True
        x = config.extra
        pattern = x.get("sliding_window_pattern", "LLLG")
        if (
            config.sliding_window
            and config.layer_types is None
            and isinstance(pattern, str)
        ):
            config.layer_types = [
                "sliding_attention" if pattern[i % len(pattern)] == "L"
                else "full_attention"
                for i in range(config.num_hidden_layers)
            ]
        super().__init__(config, dtype)


# -- Baichuan ---------------------------------------------------------------


class BaichuanForCausalLM(LlamaForCausalLM):
    """Baichuan 1/2 (reference models/baichuan.rs): fused W_pack QKV;
    the 13B variants (hidden 5120) use ALiBi instead of rope."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        if config.hidden_size >= 5120:  # 13B: ALiBi, no rope
            self.attn_specs = tuple(
                dataclasses.replace(s, rotary=None, use_alibi=True)
                for s in self.attn_specs
            )

    def load_weights(self, weights):
        cfg = self.config
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )

        def split(stream):
            for name, arr in stream:
                if ".self_attn.W_pack." in name:
                    a = np.asarray(arr)
                    q, k, v = split_qkv_sequential(a, nh, nkv, hd)
                    leaf = name.rsplit(".", 1)[1]
                    base = name[: name.index("W_pack.")]
                    yield f"{base}q_proj.{leaf}", q
                    yield f"{base}k_proj.{leaf}", k
                    yield f"{base}v_proj.{leaf}", v
                else:
                    yield name, arr

        return super().load_weights(split(weights))


# -- InternLM2 --------------------------------------------------------------


class InternLM2ForCausalLM(LlamaForCausalLM):
    """InternLM2/2.5 (reference models/internlm2.rs): renamed tensors and
    Falcon-style grouped fused wqkv [nkv, g+2, hd]."""

    _RENAMES = (
        ("model.tok_embeddings", "model.embed_tokens"),
        ("output.weight", "lm_head.weight"),
        (".attention_norm.", ".input_layernorm."),
        (".ffn_norm.", ".post_attention_layernorm."),
        (".attention.wo.", ".self_attn.o_proj."),
        (".feed_forward.w1.", ".mlp.gate_proj."),
        (".feed_forward.w3.", ".mlp.up_proj."),
        (".feed_forward.w2.", ".mlp.down_proj."),
    )

    def load_weights(self, weights):
        cfg = self.config
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )

        def conv(stream):
            for name, arr in stream:
                if ".attention.wqkv." in name:
                    a = np.asarray(arr)
                    q, k, v = split_qkv_falcon(a, nh, nkv, hd, True)
                    leaf = name.rsplit(".", 1)[1]
                    base = name[: name.index("attention.wqkv.")]
                    yield f"{base}self_attn.q_proj.{leaf}", q
                    yield f"{base}self_attn.k_proj.{leaf}", k
                    yield f"{base}self_attn.v_proj.{leaf}", v
                    continue
                for old, new in self._RENAMES:
                    name = name.replace(old, new)
                yield name, arr

        return super().load_weights(conv(weights))


# -- MiniCPM ----------------------------------------------------------------


class MiniCPMForCausalLM(LlamaForCausalLM):
    """MiniCPM 1/2 (reference models/minicpm.rs): muP-style scaling —
    scale_emb on embeddings, scale_depth/sqrt(L) on residual branches,
    hidden/dim_model_base on logits."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        x = config.extra
        self.embedding_multiplier = float(x.get("scale_emb", 1.0))
        depth = float(x.get("scale_depth", 1.0))
        self.residual_multiplier = depth / float(
            np.sqrt(config.num_hidden_layers)
        )
        base = x.get("dim_model_base")
        if base:
            config.logits_scaling = config.hidden_size / float(base)


# -- DeciLM (variable GQA) --------------------------------------------------


class DeciLMForCausalLM(LlamaForCausalLM):
    """DeciLM (reference models/decilm.rs): per-layer KV head counts via
    num_key_value_heads_per_layer — exercises the heterogeneous KV pool
    (per-layer kv_head_info)."""

    def _make_attn_spec(self, layer_idx: int):
        spec = super()._make_attn_spec(layer_idx)
        per_layer = self.config.extra.get("num_key_value_heads_per_layer")
        if per_layer:
            spec = dataclasses.replace(
                spec, num_kv_heads=int(per_layer[layer_idx])
            )
        return spec


# -- SmolLM3 ----------------------------------------------------------------


class SmolLM3ForCausalLM(LlamaForCausalLM):
    """SmolLM3 (reference models/smollm3.rs): llama skeleton with NoPE —
    every `no_rope_layer_interval`-th layer skips rope."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        x = config.extra
        flags = x.get("no_rope_layers")  # 1 = rope, 0 = nope
        interval = x.get("no_rope_layer_interval")
        nope = []
        for i in range(config.num_hidden_layers):
            if flags is not None:
                nope.append(not flags[i])
            elif interval:
                nope.append((i + 1) % int(interval) == 0)
            else:
                nope.append(False)
        self.attn_specs = tuple(
            dataclasses.replace(s, rotary=None) if n else s
            for s, n in zip(self.attn_specs, nope)
        )


# -- ChatGLM ----------------------------------------------------------------


class ChatGLMForCausalLM(LlamaForCausalLM):
    """ChatGLM2/3 & GLM-4 legacy format (reference models/chatglm.rs):
    RMSNorm + swiglu with packed tensors, sequential fused QKV with bias,
    half-dim interleaved rope."""

    qkv_bias = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if "padded_vocab_size" in x:
            config.vocab_size = x["padded_vocab_size"]
        if "ffn_hidden_size" in x:
            config.intermediate_size = x["ffn_hidden_size"]
        if "num_layers" in x:
            config.num_hidden_layers = x["num_layers"]
        if "kv_channels" in x:
            config.head_dim = x["kv_channels"]
        if x.get("multi_query_attention"):
            config.num_key_value_heads = x.get(
                "multi_query_group_num", config.num_attention_heads
            )
        if "layernorm_epsilon" in x:
            config.rms_norm_eps = x["layernorm_epsilon"]
        self.qkv_bias = bool(x.get("add_qkv_bias", True))
        config.partial_rotary_factor = 0.5
        config.hidden_act = "silu"
        super().__init__(config, dtype)
        self.attn_specs = tuple(
            dataclasses.replace(s, interleaved_rope=True)
            for s in self.attn_specs
        )

    _RENAMES = (
        ("transformer.embedding.word_embeddings", "model.embed_tokens"),
        ("transformer.encoder.final_layernorm", "model.norm"),
        ("transformer.output_layer", "lm_head"),
        ("transformer.encoder.layers.", "model.layers."),
        (".self_attention.dense.", ".self_attn.o_proj."),
        (".mlp.dense_4h_to_h.", ".mlp.down_proj."),
    )

    def load_weights(self, weights):
        cfg = self.config
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )

        def conv(stream):
            for name, arr in stream:
                if ".self_attention.query_key_value." in name:
                    a = np.asarray(arr)
                    q, k, v = split_qkv_sequential(a, nh, nkv, hd)
                    leaf = name.rsplit(".", 1)[1]
                    base = name[: name.index("self_attention.")]
                    base = base.replace(
                        "transformer.encoder.layers.", "model.layers."
                    )
                    yield f"{base}self_attn.q_proj.{leaf}", q
                    yield f"{base}self_attn.k_proj.{leaf}", k
                    yield f"{base}self_attn.v_proj.{leaf}", v
                    continue
                if ".mlp.dense_h_to_4h." in name:
                    # packed [gate; up]
                    a = np.asarray(arr)
                    g, u = np.split(a, 2, axis=0)
                    base = name[: name.index("mlp.dense_h_to_4h.")]
                    base = base.replace(
                        "transformer.encoder.layers.", "model.layers."
                    )
                    leaf = name.rsplit(".", 1)[1]
                    yield f"{base}mlp.gate_proj.{leaf}", g
                    yield f"{base}mlp.up_proj.{leaf}", u
                    continue
                for old, new in self._RENAMES:
                    name = name.replace(old, new)
                yield name, arr

        return super().load_weights(conv(weights))


# -- Arcee ------------------------------------------------------------------


class ArceeForCausalLM(LNTransformer):
    """Arcee AFM (reference models/arcee.rs): llama attention with a
    non-gated squared-ReLU MLP and RMSNorm."""

    norm_kind = "rms"
    attn_bias = False
    o_bias = False
    mlp_bias = False

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.norm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
        (".mlp.up_proj.", ".mlp.fc_in."),
        (".mlp.down_proj.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        if config.hidden_act not in _ACTS or config.hidden_act == "silu":
            config.hidden_act = "relu2"
        super().__init__(config, dtype)


def register_breadth(registry: dict) -> None:
    from .gemma import Gemma2ForCausalLM, Gemma3ForCausalLM
    from .llama import MistralForCausalLM, Qwen3ForCausalLM

    registry.update(
        {
            "CohereForCausalLM": CohereForCausalLM,
            "Cohere2ForCausalLM": Cohere2ForCausalLM,
            "OlmoForCausalLM": OlmoForCausalLM,
            "Olmo2ForCausalLM": Olmo2ForCausalLM,
            "Olmo3ForCausalLM": Olmo3ForCausalLM,
            "Exaone4ForCausalLM": Exaone4ForCausalLM,
            "BaichuanForCausalLM": BaichuanForCausalLM,
            "BaiChuanForCausalLM": BaichuanForCausalLM,
            "InternLM2ForCausalLM": InternLM2ForCausalLM,
            "InternLM3ForCausalLM": LlamaForCausalLM,
            "MiniCPMForCausalLM": MiniCPMForCausalLM,
            "DeciLMForCausalLM": DeciLMForCausalLM,
            "SmolLM3ForCausalLM": SmolLM3ForCausalLM,
            "ChatGLMForCausalLM": ChatGLMForCausalLM,
            "ChatGLMModel": ChatGLMForCausalLM,
            "ChatGLMForConditionalGeneration": ChatGLMForCausalLM,
            "ArceeForCausalLM": ArceeForCausalLM,
            # direct skeleton aliases
            "SolarForCausalLM": LlamaForCausalLM,
            "CwmForCausalLM": LlamaForCausalLM,
            "XverseForCausalLM": LlamaForCausalLM,
            "MiMoForCausalLM": LlamaForCausalLM,
            "SeedOssForCausalLM": LlamaForCausalLM,
            "Fairseq2LlamaForCausalLM": LlamaForCausalLM,
            "LLaMAForCausalLM": LlamaForCausalLM,
            # bare-encoder aliases (embeddings path pools hidden states)
            "LlamaModel": LlamaForCausalLM,
            "LlamaBidirectionalModel": LlamaForCausalLM,
            "MistralModel": MistralForCausalLM,
            "E5MistralModel": MistralForCausalLM,
            "Qwen2Model": Qwen2ForCausalLM,
            "Qwen3Model": Qwen3ForCausalLM,
            "Gemma2Model": Gemma2ForCausalLM,
            "Gemma3TextModel": Gemma3ForCausalLM,
            "AquilaModel": LlamaForCausalLM,
        }
    )
