"""Qwen3-MoE and Mixtral.

Reference: models/qwen3_moe.rs, models/mixtral.rs. Both are the Llama
decoder with MoE FFNs; they differ in checkpoint names and routing knobs:
  - Qwen3-MoE: qk_norm, norm_topk_prob, optional dense layers
    (mlp_only_layers / decoder_sparse_step), experts under
    mlp.experts.{j}.{gate,up,down}_proj
  - Mixtral: 8 experts, top-2, experts under
    block_sparse_moe.experts.{j}.w1/w3/w2 (gate/up/down), router under
    block_sparse_moe.gate
Expert weights are stacked [E, in, out] at load so the layer runs as one
grouped matmul.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.moe import MoESpec, moe_layer
from ..layers.norm import rms_norm
from ..layers.mlp import swiglu_mlp
from ..layers.attention import attention_block
from .llama import LlamaForCausalLM


class Qwen3MoeForCausalLM(LlamaForCausalLM):
    moe_backend = "auto"
    supports_pp = False  # custom __call__ (MoE layers) — no stage hooks yet
    use_qk_norm = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = self.use_qk_norm
        super().__init__(config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts or 8,
            top_k=config.num_experts_per_tok or 2,
            norm_topk_prob=config.norm_topk_prob,
            scoring=config.scoring_func,
            act=config.hidden_act,
            has_shared_expert=bool(config.shared_expert_intermediate_size),
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        cfg = self.config
        if layer_idx in cfg.mlp_only_layers:
            return False
        step = max(1, cfg.decoder_sparse_step)
        return (layer_idx + 1) % step == 0 if step > 1 else True

    # -- params ---------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        h = cfg.hidden_size
        e = self.moe_spec.num_experts
        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        d = self.dtype

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(jax.random.PRNGKey(0), shape)).astype(d)

        for i, lp in enumerate(params["layers"]):
            if not self.is_moe_layer(i):
                continue
            moe = {
                "router": {"weight": w((h, e))},
                "experts": {
                    "gate_proj": {"weight": w((e, h, inter))},
                    "up_proj": {"weight": w((e, h, inter))},
                    "down_proj": {"weight": w((e, inter, h))},
                },
            }
            if self.moe_spec.has_shared_expert:
                si = cfg.shared_expert_intermediate_size
                moe["shared_expert"] = {
                    "gate_proj": {"weight": w((h, si))},
                    "up_proj": {"weight": w((h, si))},
                    "down_proj": {"weight": w((si, h))},
                }
                moe["shared_expert_gate"] = {"weight": w((h, 1))}
            lp["mlp"] = moe
        return params

    # -- weight name mapping ---------------------------------------------------

    def _param_path(self, name: str):
        # expert weights handled by load_weights directly (stacking)
        if ".mlp.experts." in name or ".block_sparse_moe.experts." in name:
            return None
        name2 = (
            name.replace("block_sparse_moe.gate", "mlp.router")
            .replace("mlp.gate.weight", "mlp.router.weight")
            .replace("mlp.shared_expert_gate", "mlp.shared_expert_gate")
        )
        n = name2.removeprefix("model.")
        parts = n.split(".")
        if parts[0] == "layers" and len(parts) >= 4 and parts[2] == "mlp":
            idx = int(parts[1])
            rest = parts[3:]
            if rest[-1] == "weight":
                return ["layers", idx, "mlp", *rest[:-1], "weight"], True
        return super()._param_path(name2)

    def load_weights(self, weights):
        cfg = self.config
        e = self.moe_spec.num_experts
        params = self.init_params(rng=None)
        expert_parts: dict[tuple[int, str, int], np.ndarray] = {}
        mixtral_map = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}

        for name, arr in weights:
            if ".experts." in name:
                # model.layers.L.mlp.experts.J.gate_proj.weight (or wN)
                parts = name.split(".")
                li = int(parts[2])
                ji = int(parts[parts.index("experts") + 1])
                pname = parts[-2]
                pname = mixtral_map.get(pname, pname)
                expert_parts[(li, pname, ji)] = np.asarray(arr).T  # [in, out]
                continue
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
            node[tree_path[-1]] = jnp.asarray(a, self.dtype)

        # stack experts
        by_layer: dict[tuple[int, str], list] = {}
        for (li, pname, ji), a in expert_parts.items():
            by_layer.setdefault((li, pname), [None] * e)[ji] = a
        for (li, pname), lst in by_layer.items():
            stacked = np.stack(lst, axis=0)  # [E, in, out]
            params["layers"][li]["mlp"]["experts"][pname] = {
                "weight": jnp.asarray(stacked, self.dtype)
            }
        return params

    # -- forward --------------------------------------------------------------

    def _moe_ffn(self, lp_mlp, h):
        """MoE FFN hook (Glm4Moe overrides with DeepSeek-style routing)."""
        return moe_layer(self.moe_spec, lp_mlp, h, backend=self.moe_backend)

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        cfg = self.config
        x = self.embed(params, input_ids, embeds)
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            rope_tables = self.rope_tables_for_layer(params, i)
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            ks, vs = self.kv_scales if self.kv_scales else (None, None)
            attn_out, kv = attention_block(
                self.attn_specs[i],
                lp["self_attn"],
                h,
                md,
                kv_pages[i],
                rope_tables,
                attention_backend=self.attention_backend,
                k_scale=ks,
                v_scale=vs,
            )
            new_kv.append(kv)
            x = residual + attn_out * self.residual_multiplier

            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn * self.residual_multiplier

        x = self._norm(x, params["norm"])
        return x, new_kv


class Qwen2MoeForCausalLM(Qwen3MoeForCausalLM):
    """Qwen1.5/2-MoE (reference models/qwen2_moe.rs): no qk-norm, qkv
    bias, sigmoid-gated shared expert (verified vs HF numerics)."""

    use_qk_norm = False
    qkv_bias = True


class MixtralForCausalLM(Qwen3MoeForCausalLM):
    """Mixtral 8x7B/8x22B (reference models/mixtral.rs)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = False
        # HF mixtral: num_local_experts / num_experts_per_tok already
        # normalized by ModelConfig.from_dict
        config.norm_topk_prob = True  # mixtral renormalizes top-k weights
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts or 8,
            top_k=config.num_experts_per_tok or 2,
            norm_topk_prob=True,
            act=config.hidden_act,
        )
