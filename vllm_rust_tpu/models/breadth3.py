"""Breadth batch 3: QWen v1, Dots1, BailingMoE (v1/v2).

Reference: models/{qwen,dots1,bailing_moe}.rs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.moe import MoESpec
from .gpt_family import split_qkv_sequential
from .deepseek import deepseek_moe_ffn
from .llama import LlamaForCausalLM
from .qwen3_moe import Qwen3MoeForCausalLM


class QWenLMHeadModel(LlamaForCausalLM):
    """QWen v1 (reference models/qwen.rs): fused biased c_attn, MHA only,
    w1/w2/c_proj MLP with halved intermediate (gate = w2, up = w1),
    transformer.h.* naming, RMSNorm under ln_1/ln_2 names."""

    qkv_bias = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.num_key_value_heads = config.num_attention_heads  # MHA
        # config stores 2x the actual per-branch width
        config.intermediate_size = config.intermediate_size // 2
        if "layer_norm_epsilon" in ex:
            config.rms_norm_eps = float(ex["layer_norm_epsilon"])
        super().__init__(config, dtype)

    _RENAMES = (
        ("transformer.wte.", "model.embed_tokens."),
        ("transformer.ln_f.", "model.norm."),
        ("transformer.h.", "model.layers."),
        (".ln_1.", ".input_layernorm."),
        (".ln_2.", ".post_attention_layernorm."),
        (".attn.c_proj.", ".self_attn.o_proj."),
        (".mlp.w2.", ".mlp.gate_proj."),
        (".mlp.w1.", ".mlp.up_proj."),
        (".mlp.c_proj.", ".mlp.down_proj."),
    )

    def load_weights(self, weights):
        cfg = self.config
        nh, hd = cfg.num_attention_heads, cfg.head_dim

        def conv(stream):
            for name, arr in stream:
                if ".attn.c_attn." in name:
                    a = np.asarray(arr)
                    q, k, v = split_qkv_sequential(a, nh, nh, hd)
                    leaf = name.rsplit(".", 1)[1]
                    base = name[: name.index("attn.c_attn")].replace(
                        "transformer.h.", "model.layers."
                    )
                    yield f"{base}self_attn.q_proj.{leaf}", q
                    yield f"{base}self_attn.k_proj.{leaf}", k
                    yield f"{base}self_attn.v_proj.{leaf}", v
                    continue
                for old, new in self._RENAMES:
                    name = name.replace(old, new)
                yield name, arr

        return super().load_weights(conv(weights))


class Dots1ForCausalLM(Qwen3MoeForCausalLM):
    """rednote dots.llm1 (reference models/dots1.rs): per-head qk norms,
    DeepSeek-style shared MoE (grouped top-k, sigmoid scoring with
    correction bias, routed scaling, first_k_dense_replace)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = True
        if config.num_shared_experts and not config.shared_expert_intermediate_size:
            config.shared_expert_intermediate_size = (
                config.moe_intermediate_size or config.intermediate_size
            ) * config.num_shared_experts
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts or 64,
            top_k=config.num_experts_per_tok or 6,
            norm_topk_prob=config.norm_topk_prob,
            scoring=config.scoring_func,
            act=config.hidden_act,
            has_shared_expert=bool(config.num_shared_experts),
            routed_scaling_factor=config.routed_scaling_factor,
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        if layer_idx < self.config.first_k_dense_replace:
            return False
        freq = int(self.config.extra.get("moe_layer_freq", 1))
        return (layer_idx % max(1, freq)) == 0 if freq > 1 else True

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h = cfg.hidden_size
        e = self.moe_spec.num_experts
        for i, lp in enumerate(params["layers"]):
            if not self.is_moe_layer(i):
                continue
            moe = lp["mlp"]
            if cfg.scoring_func == "sigmoid":
                moe["e_score_correction_bias"] = jnp.zeros((e,), jnp.float32)
            if self.moe_spec.has_shared_expert:
                moe.pop("shared_expert_gate", None)
                si = cfg.shared_expert_intermediate_size
                moe["shared_expert"] = {
                    "gate_proj": {"weight": jnp.zeros((h, si), d)},
                    "up_proj": {"weight": jnp.zeros((h, si), d)},
                    "down_proj": {"weight": jnp.zeros((si, h), d)},
                }
        return params

    def _moe_ffn(self, lp_mlp, h):
        return deepseek_moe_ffn(self.config, self.moe_spec, lp_mlp, h)

    def _param_path(self, name: str):
        name = name.replace(".mlp.shared_experts.", ".mlp.shared_expert.")
        if name.endswith(".mlp.gate.e_score_correction_bias"):
            parts = name.split(".")
            return (["layers", int(parts[2]), "mlp", "e_score_correction_bias"],
                    False)
        return super()._param_path(name)


class BailingMoeForCausalLM(Dots1ForCausalLM):
    """inclusionAI Ling / BailingMoE v1+v2 (reference models/bailing_moe.rs):
    Dots1-style shared MoE with a fused biased query_key_value projection,
    word_embeddings naming, optional partial rotary."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = bool(ex.get("use_qk_norm", False))
        if ex.get("num_experts"):
            config.num_experts = int(ex["num_experts"])
        if ex.get("num_shared_experts"):
            config.num_shared_experts = int(ex["num_shared_experts"])
        config.attention_bias = bool(
            ex.get("use_qkv_bias", ex.get("use_bias", False))
        )
        super().__init__(config, dtype)
        self.config.qk_norm = bool(ex.get("use_qk_norm", False))
        if not self.config.qk_norm:
            self.attn_specs = tuple(
                dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
            )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        if not self.config.qk_norm:
            for lp in params["layers"]:
                lp["self_attn"].pop("q_norm", None)
                lp["self_attn"].pop("k_norm", None)
        return params

    _RENAMES = (
        ("model.word_embeddings.", "model.embed_tokens."),
        (".attention.dense.", ".self_attn.o_proj."),
        (".attention.query_layernorm.", ".self_attn.q_norm_x."),
        (".attention.key_layernorm.", ".self_attn.k_norm_x."),
    )

    def _param_path(self, name: str):
        for old, new in self._RENAMES:
            name = name.replace(old, new)
        parts = name.removeprefix("model.").split(".")
        if len(parts) == 5 and parts[3] in ("q_norm_x", "k_norm_x"):
            leaf = "q_norm" if parts[3][0] == "q" else "k_norm"
            return ["layers", int(parts[1]), "self_attn", leaf], False
        return super()._param_path(name)

    def load_weights(self, weights):
        cfg = self.config
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )

        def conv(stream):
            for name, arr in stream:
                if ".attention.query_key_value." in name:
                    a = np.asarray(arr)
                    q, k, v = split_qkv_sequential(a, nh, nkv, hd)
                    leaf = name.rsplit(".", 1)[1]
                    base = name[: name.index("attention.query_key_value")]
                    yield f"{base}self_attn.q_proj.{leaf}", q
                    yield f"{base}self_attn.k_proj.{leaf}", k
                    yield f"{base}self_attn.v_proj.{leaf}", v
                    continue
                yield name, arr

        return super().load_weights(conv(weights))


def register_breadth3(registry: dict) -> None:
    registry.update(
        {
            "QWenLMHeadModel": QWenLMHeadModel,
            "Dots1ForCausalLM": Dots1ForCausalLM,
            "BailingMoeForCausalLM": BailingMoeForCausalLM,
            "BailingMoeV2ForCausalLM": BailingMoeForCausalLM,
            "ApertusForCausalLM": ApertusForCausalLM,
            "ArcticForCausalLM": ArcticForCausalLM,
        }
    )


class ApertusForCausalLM(LlamaForCausalLM):
    """Swiss AI Apertus (reference models/apertus.rs): per-head qk
    RMSNorm and an UNGATED MLP with the xIELU activation
    x * (sigmoid(x) + eps * x + beta)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = True
        super().__init__(config, dtype)
        ex = config.extra
        self.xielu_eps = float(ex.get("xielu_eps", 1e-7))
        self.xielu_beta = float(ex.get("xielu_beta", 0.5))

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        # ungated MLP: drop gate_proj
        for lp in params["layers"]:
            lp["mlp"].pop("gate_proj", None)
        return params

    def _ffn(self, mlp_params, h):
        from ..layers.linear import linear as _linear
        import jax as _jax

        x = _linear(h, mlp_params["up_proj"]).astype(jnp.float32)
        x = x * (_jax.nn.sigmoid(x) + self.xielu_eps * x + self.xielu_beta)
        return _linear(x.astype(h.dtype), mlp_params["down_proj"])


class ArcticForCausalLM(Qwen3MoeForCausalLM):
    """Snowflake Arctic (reference models/arctic.rs): dense/MoE layers
    alternating by moe_layer_frequency; MoE layers optionally add a
    PARALLEL residual MLP (use_residual) to the expert output."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = False
        if ex.get("num_local_experts"):
            config.num_experts = int(ex["num_local_experts"])
        super().__init__(config, dtype)
        self.config.qk_norm = False
        self.moe_freq = int(ex.get("moe_layer_frequency", 2))
        self.use_residual = bool(ex.get("use_residual", True))
        self.attn_specs = tuple(
            dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return (layer_idx % max(1, self.moe_freq)) == (self.moe_freq - 1) \
            if self.moe_freq > 1 else True

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h, inter = cfg.hidden_size, cfg.intermediate_size
        for i, lp in enumerate(params["layers"]):
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
            if self.is_moe_layer(i) and self.use_residual:
                lp["residual_mlp"] = {
                    "gate_proj": {"weight": jnp.zeros((h, inter), d)},
                    "up_proj": {"weight": jnp.zeros((h, inter), d)},
                    "down_proj": {"weight": jnp.zeros((inter, h), d)},
                }
                lp["residual_layernorm"] = jnp.ones((h,), d)
        return params

    def __call__(self, params, input_ids, md, kv_pages):
        from ..layers.attention import attention_block
        from ..layers.mlp import swiglu_mlp as _swiglu
        from ..layers.norm import rms_norm as _rms

        cfg = self.config
        eps = cfg.rms_norm_eps
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = _rms(x, lp["input_layernorm"], eps)
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                (params["rope_cos"], params["rope_sin"]),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            x = residual + attn_out

            residual = x
            h = _rms(x, lp["post_attention_layernorm"], eps)
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
                if "residual_mlp" in lp:
                    # parallel residual MLP over its own norm of x
                    rh = _rms(x, lp["residual_layernorm"], eps)
                    ffn = ffn + _swiglu(rh, lp["residual_mlp"],
                                        cfg.hidden_act)
            else:
                ffn = _swiglu(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn
        return _rms(x, params["norm"], eps), new_kv
