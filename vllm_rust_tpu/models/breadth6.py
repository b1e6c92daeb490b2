"""Breadth batch 6: AfMoE.

Reference: models/afmoe.rs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..layers.attention import attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.moe import MoESpec
from ..layers.norm import rms_norm
from ..utils import on_tpu
from .deepseek import grouped_topk
from .qwen3_moe import Qwen3MoeForCausalLM


class AfmoeForCausalLM(Qwen3MoeForCausalLM):
    """AfMoE (reference models/afmoe.rs): Llama-based MoE with per-layer
    sliding/global attention (RoPE ONLY on sliding layers — global layers
    are NoPE, afmoe.rs:249-259), per-channel sigmoid attention gate,
    per-head QK norms, a four-norm residual pattern (afmoe.rs:764-812),
    grouped-top-k sigmoid router with a learnable expert bias and
    route_scale, shared experts, first `num_dense_layers` dense, and
    optional muP sqrt(hidden) input scaling."""

    supports_pp = False
    post_sublayer_norms = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)  # qk_norm=True like Qwen3
        n = config.num_hidden_layers
        lt = ex.get("layer_types") or []
        self._sliding = [
            (lt[i] == "sliding_attention") if i < len(lt) else False
            for i in range(n)
        ]
        window = config.sliding_window or ex.get("sliding_window")
        specs = []
        for i, s in enumerate(self.attn_specs):
            if self._sliding[i]:
                specs.append(dataclasses.replace(
                    s, sliding_window=int(window) if window else None))
            else:
                specs.append(dataclasses.replace(
                    s, rotary=None, sliding_window=None))
        self.attn_specs = tuple(specs)
        self.num_dense = int(ex.get("num_dense_layers", 0))
        self.n_group = int(ex.get("n_group", 1))
        self.topk_group = int(ex.get("topk_group", 1))
        self.route_scale = float(ex.get("route_scale", 1.0))
        scoring = str(ex.get("score_func", "sigmoid"))
        route_norm = bool(ex.get("route_norm", True))
        self.num_shared = int(ex.get("num_shared_experts", 0))
        moe_inter = config.moe_intermediate_size or config.intermediate_size
        if self.num_shared:
            config.shared_expert_intermediate_size = (
                moe_inter * self.num_shared
            )
        self.moe_spec = MoESpec(
            num_experts=int(ex.get("num_experts", 16)),
            top_k=int(ex.get("num_experts_per_tok", 4)),
            norm_topk_prob=route_norm if scoring == "sigmoid" else False,
            scoring=scoring,
            act="silu",
            has_shared_expert=self.num_shared > 0,
        )
        if ex.get("mup_enabled"):
            self.embedding_multiplier = math.sqrt(config.hidden_size)

    def is_moe_layer(self, layer_idx: int) -> bool:
        return layer_idx >= self.num_dense

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            return (scale * jax.random.normal(jax.random.PRNGKey(13), shape)
                    ).astype(self.dtype)

        for lp in params["layers"]:
            sa = lp["self_attn"]
            for key in ("q_proj", "k_proj", "v_proj"):
                sa.pop(key, None)
            sa["qkv_proj"] = {"weight": w((h, (nh + 2 * nkv) * hd))}
            sa["g_proj"] = {"weight": w((h, nh * hd))}  # per-channel gate
            if "experts" in lp["mlp"]:
                lp["mlp"]["e_score_correction_bias"] = jnp.zeros(
                    (self.moe_spec.num_experts,), jnp.float32
                )
                lp["mlp"].pop("shared_expert_gate", None)
        return params

    def _moe_ffn(self, lp_mlp, h):
        from ..layers.moe import _dense_experts, _gmm_experts

        spec = self.moe_spec
        logits = linear(h, lp_mlp["router"]).astype(jnp.float32)
        if spec.scoring == "sigmoid":
            scores = jax.nn.sigmoid(logits)
        else:
            scores = jax.nn.softmax(logits, axis=-1)
        bias = lp_mlp.get("e_score_correction_bias")
        if self.n_group > 1:
            topv, topi = grouped_topk(
                scores, bias, spec.top_k, self.n_group, self.topk_group
            )
        else:
            sel = scores if bias is None else scores + bias[None, :]
            _, topi = jax.lax.top_k(sel, spec.top_k)
            topi = topi.astype(jnp.int32)
            topv = jnp.take_along_axis(scores, topi, axis=-1)
        if spec.norm_topk_prob:
            topv = topv / (topv.sum(-1, keepdims=True) + 1e-20)
        topv = topv * self.route_scale
        experts = _gmm_experts if on_tpu() else _dense_experts
        out = experts(spec, lp_mlp, h, topv, topi).astype(h.dtype)
        if "shared_expert" in lp_mlp:
            out = out + swiglu_mlp(h, lp_mlp["shared_expert"], "silu")
        return out

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        eps = cfg.rms_norm_eps
        x = self.embed(params, input_ids)
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = rms_norm(x, lp["input_layernorm"], eps)
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                self.rope_tables_for_layer(params, i),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            x = residual + rms_norm(attn_out, lp["post_self_attn_layernorm"],
                                    eps)
            residual = x
            h = rms_norm(x, lp["post_attention_layernorm"], eps)  # pre-MLP
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + rms_norm(ffn, lp["post_mlp_layernorm"], eps)
        return rms_norm(x, params["norm"], eps), new_kv

    def load_weights(self, weights):
        def gen():
            for name, arr in weights:
                n = name.replace(".self_attn.gate_proj.",
                                 ".self_attn.g_proj.")
                n = n.replace(".mlp.shared_experts.", ".mlp.shared_expert.")
                # ckpt 4-norm names -> llama post-sublayer slots (order
                # matters: post_attention_layernorm first)
                n = n.replace("post_attention_layernorm",
                              "post_self_attn_layernorm")
                n = n.replace("pre_mlp_layernorm", "post_attention_layernorm")
                n = n.replace(".mlp.expert_bias",
                              ".mlp.gate.e_score_correction_bias")
                yield n, arr
        return super().load_weights(gen())

    def _param_path(self, name: str):
        parts = name.removeprefix("model.").split(".")
        if len(parts) >= 4 and parts[0] == "layers":
            idx = int(parts[1])
            if parts[2] == "mlp" and parts[3] == "shared_expert":
                return (["layers", idx, "mlp", "shared_expert", parts[4],
                         "weight"], True)
            if (parts[2] == "mlp" and parts[3] == "gate"
                    and parts[4] == "e_score_correction_bias"):
                return (["layers", idx, "mlp", "e_score_correction_bias"],
                        False)
        return super()._param_path(name)


def register_breadth6(registry: dict) -> None:
    registry.update({
        "AfmoeForCausalLM": AfmoeForCausalLM,
    })
