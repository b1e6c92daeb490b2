"""MoE architecture breadth: GLM-4.5-MoE, OLMoE, DBRX, GraniteMoE.

Reference: models/{glm4_moe,olmoe,dbrx,granitemoe}.rs. All ride the
shared grouped-matmul expert path (layers/moe.py) with per-arch routing
and checkpoint-layout differences."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.moe import MoESpec
from ..layers.norm import layer_norm
from .deepseek import deepseek_moe_ffn
from .llama import LlamaForCausalLM
from .qwen3_moe import Qwen3MoeForCausalLM


class Glm4MoeForCausalLM(Qwen3MoeForCausalLM):
    """GLM-4.5 / GLM-4.6 MoE (reference models/glm4_moe.rs): standard GQA
    attention (partial rotary 0.5, optional qk-norm) + DeepSeek-style MoE
    (sigmoid scoring, e-score correction bias, grouped top-k, gateless
    shared expert, first_k_dense_replace)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = float(
                x.get("partial_rotary_factor", 0.5)
            )
        config.qk_norm = bool(x.get("use_qk_norm", False))
        if config.num_shared_experts and not config.shared_expert_intermediate_size:
            # let the base class size the (gateless) shared expert
            config.shared_expert_intermediate_size = (
                config.moe_intermediate_size or config.intermediate_size
            ) * config.num_shared_experts
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts or 128,
            top_k=config.num_experts_per_tok or 8,
            norm_topk_prob=config.norm_topk_prob,
            scoring=config.scoring_func,
            act=config.hidden_act,
            has_shared_expert=bool(config.num_shared_experts),
            routed_scaling_factor=config.routed_scaling_factor,
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return layer_idx >= self.config.first_k_dense_replace

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
                # gateless DeepSeek-style shared experts
                moe.pop("shared_expert_gate", None)
                si = (cfg.moe_intermediate_size or cfg.intermediate_size) * (
                    cfg.num_shared_experts or 1
                )
                moe["shared_expert"] = {
                    "gate_proj": {"weight": jnp.zeros((h, si), d)},
                    "up_proj": {"weight": jnp.zeros((h, si), d)},
                    "down_proj": {"weight": jnp.zeros((si, h), d)},
                }
        return params

    def _moe_ffn(self, lp_mlp, h):
        return deepseek_moe_ffn(self.config, self.moe_spec, lp_mlp, h)

    def _param_path(self, name: str):
        # GLM names shared experts "shared_experts", bias "gate.e_score_..."
        name = name.replace(".mlp.shared_experts.", ".mlp.shared_expert.")
        if name.endswith(".mlp.gate.e_score_correction_bias"):
            parts = name.split(".")
            return ["layers", int(parts[2]), "mlp", "e_score_correction_bias"], False
        return super()._param_path(name)


class OlmoeForCausalLM(Qwen3MoeForCausalLM):
    """AllenAI OLMoE (reference models/olmoe.rs): full-projection q/k
    RMSNorm, 64 experts top-8."""

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


class DbrxForCausalLM(Qwen3MoeForCausalLM):
    """Databricks DBRX (reference models/dbrx.rs): LayerNorm (no bias),
    sequential fused Wqkv with clip, experts stored as flat stacked
    [E*inter, hidden] tensors (w1=gate, v1=up, w2=down)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if "d_model" in x:
            config.hidden_size = x["d_model"]
        if "n_heads" in x:
            config.num_attention_heads = x["n_heads"]
        if "n_layers" in x:
            config.num_hidden_layers = x["n_layers"]
        if "max_seq_len" in x:
            config.max_position_embeddings = x["max_seq_len"]
        attn_cfg = x.get("attn_config") or {}
        ffn_cfg = x.get("ffn_config") or {}
        config.num_key_value_heads = attn_cfg.get(
            "kv_n_heads", config.num_attention_heads
        )
        config.head_dim = config.hidden_size // config.num_attention_heads
        if "rope_theta" in attn_cfg:
            config.rope_theta = float(attn_cfg["rope_theta"])
        config.num_experts = ffn_cfg.get("moe_num_experts", 16)
        config.num_experts_per_tok = ffn_cfg.get("moe_top_k", 4)
        config.moe_intermediate_size = ffn_cfg.get("ffn_hidden_size", 10752)
        config.intermediate_size = config.moe_intermediate_size
        config.norm_topk_prob = bool(
            ffn_cfg.get("moe_normalize_expert_weights", 1)
        )
        config.hidden_act = "silu"
        super().__init__(config, dtype)
        config.qk_norm = False
        clip = attn_cfg.get("clip_qkv")
        if clip:
            self.attn_specs = tuple(
                dataclasses.replace(s, qkv_clip=float(clip), qk_norm=False)
                for s in self.attn_specs
            )
        else:
            self.attn_specs = tuple(
                dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
            )

    def _norm(self, x, w):
        # DBRX LayerNorm has weight only (bias=False)
        return layer_norm(x, w, None, 1e-5)

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        for lp in params["layers"]:
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
        return params

    def load_weights(self, weights):
        cfg = self.config
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )
        e = cfg.num_experts
        inter = cfg.moe_intermediate_size

        def conv(stream):
            for name, arr in stream:
                a = np.asarray(arr)
                if ".attn.Wqkv.weight" in name:
                    li = name.split(".")[2]
                    q, k, v = np.split(a, [nh * hd, (nh + nkv) * hd], axis=0)
                    pre = f"model.layers.{li}.self_attn."
                    yield pre + "q_proj.weight", q
                    yield pre + "k_proj.weight", k
                    yield pre + "v_proj.weight", v
                elif ".ffn.experts.mlp." in name:
                    li = name.split(".")[2]
                    kind = name.rsplit(".", 1)[1]  # w1 | v1 | w2
                    pre = f"model.layers.{li}.mlp.experts."
                    if kind == "w1":  # [E*inter, h] -> gate [E, h, inter]
                        yield pre + "gate_proj.stacked", a.reshape(
                            e, inter, -1
                        ).transpose(0, 2, 1)
                    elif kind == "v1":
                        yield pre + "up_proj.stacked", a.reshape(
                            e, inter, -1
                        ).transpose(0, 2, 1)
                    else:  # w2 stored [E*inter, h] row-major = down [E, inter, h]
                        yield pre + "down_proj.stacked", a.reshape(e, inter, -1)
                elif ".ffn.router.layer.weight" in name:
                    li = name.split(".")[2]
                    yield f"model.layers.{li}.mlp.gate.weight", a
                elif ".norm_attn_norm.norm_1.weight" in name:
                    li = name.split(".")[2]
                    yield f"model.layers.{li}.input_layernorm.weight", a
                elif ".norm_attn_norm.norm_2.weight" in name:
                    li = name.split(".")[2]
                    yield f"model.layers.{li}.post_attention_layernorm.weight", a
                elif ".norm_attn_norm.attn.out_proj.weight" in name:
                    li = name.split(".")[2]
                    yield f"model.layers.{li}.self_attn.o_proj.weight", a
                elif name == "transformer.wte.weight":
                    yield "model.embed_tokens.weight", a
                elif name == "transformer.norm_f.weight":
                    yield "model.norm.weight", a
                else:
                    yield name, a

        params = self.init_params(rng=None)
        pre_stacked = []
        regular = []
        for name, a in conv(weights):
            if name.endswith(".stacked"):
                pre_stacked.append((name, a))
            else:
                regular.append((name, a))
        params2 = super().load_weights(iter(regular))
        # merge: super().load_weights built from scratch; place stacked
        for name, a in pre_stacked:
            parts = name.split(".")
            li = int(parts[2])
            pname = parts[-2]
            params2["layers"][li]["mlp"]["experts"][pname] = {
                "weight": jnp.asarray(a, self.dtype)
            }
        del params
        return params2


class GraniteMoeForCausalLM(Qwen3MoeForCausalLM):
    """IBM Granite MoE (reference models/granitemoe.rs): Granite scalar
    multipliers + experts stored pre-stacked with fused gate_up
    (input_linear [E, 2*inter, h], output_linear [E, h, inter])."""

    has_shared_mlp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        self.config.qk_norm = False
        x = config.extra
        self.embedding_multiplier = x.get("embedding_multiplier")
        self.residual_multiplier = x.get("residual_multiplier", 1.0)
        att_mult = x.get("attention_multiplier")
        if att_mult:
            self.attn_specs = tuple(
                dataclasses.replace(s, sm_scale=att_mult, qk_norm=False)
                for s in self.attn_specs
            )
        else:
            self.attn_specs = tuple(
                dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
            )
        if x.get("logits_scaling"):
            config.logits_scaling = x["logits_scaling"]

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        for lp in params["layers"]:
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
        if self.has_shared_mlp:
            cfg, d = self.config, self.dtype
            h = cfg.hidden_size
            si = cfg.shared_expert_intermediate_size or cfg.intermediate_size
            for lp in params["layers"]:
                lp["mlp"]["shared_expert"] = {
                    "gate_proj": {"weight": jnp.zeros((h, si), d)},
                    "up_proj": {"weight": jnp.zeros((h, si), d)},
                    "down_proj": {"weight": jnp.zeros((si, h), d)},
                }
        return params

    def _moe_ffn(self, lp_mlp, h):
        from ..layers.mlp import swiglu_mlp

        out = super()._moe_ffn(
            {k: v for k, v in lp_mlp.items() if k != "shared_expert"}, h
        )
        if "shared_expert" in lp_mlp:
            # GraniteMoeShared: gateless shared MLP added to expert output
            out = out + swiglu_mlp(h, lp_mlp["shared_expert"], "silu")
        return out

    def load_weights(self, weights):
        cfg = self.config
        e = cfg.num_experts or 8
        inter = cfg.moe_intermediate_size or cfg.intermediate_size

        def conv(stream):
            for name, arr in stream:
                a = np.asarray(arr)
                if ".block_sparse_moe.input_linear.weight" in name:
                    li = name.split(".")[2]
                    # [E, 2*inter, h]: rows are [gate; up] per expert
                    g = a[:, :inter, :].transpose(0, 2, 1)  # [E, h, inter]
                    u = a[:, inter:, :].transpose(0, 2, 1)
                    pre = f"model.layers.{li}.mlp.experts."
                    yield pre + "gate_proj.stacked", g
                    yield pre + "up_proj.stacked", u
                elif ".block_sparse_moe.output_linear.weight" in name:
                    li = name.split(".")[2]
                    # [E, h, inter] -> down [E, inter, h]
                    yield (
                        f"model.layers.{li}.mlp.experts.down_proj.stacked",
                        a.transpose(0, 2, 1),
                    )
                elif ".block_sparse_moe.router.layer.weight" in name:
                    li = name.split(".")[2]
                    yield f"model.layers.{li}.mlp.gate.weight", a
                elif ".shared_mlp.input_linear.weight" in name:
                    li = name.split(".")[2]
                    si = a.shape[0] // 2
                    pre = f"model.layers.{li}.mlp.shared_expert."
                    yield pre + "gate_proj.weight", a[:si]
                    yield pre + "up_proj.weight", a[si:]
                elif ".shared_mlp.output_linear.weight" in name:
                    li = name.split(".")[2]
                    yield (
                        f"model.layers.{li}.mlp.shared_expert.down_proj.weight",
                        a,
                    )
                else:
                    yield name, a

        pre_stacked = []
        regular = []
        for name, a in conv(weights):
            if name.endswith(".stacked"):
                pre_stacked.append((name, a))
            else:
                regular.append((name, a))
        params = super().load_weights(iter(regular))
        for name, a in pre_stacked:
            parts = name.split(".")
            li = int(parts[2])
            pname = parts[-2]
            params["layers"][li]["mlp"]["experts"][pname] = {
                "weight": jnp.asarray(a, self.dtype)
            }
        return params


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    has_shared_mlp = True


def register_moe_breadth(registry: dict) -> None:
    registry.update(
        {
            "Glm4MoeForCausalLM": Glm4MoeForCausalLM,
            "OlmoeForCausalLM": OlmoeForCausalLM,
            "FlexOlmoForCausalLM": OlmoeForCausalLM,
            "DbrxForCausalLM": DbrxForCausalLM,
            "GraniteMoeForCausalLM": GraniteMoeForCausalLM,
            "GraniteMoeSharedForCausalLM": GraniteMoeSharedForCausalLM,
        }
    )
