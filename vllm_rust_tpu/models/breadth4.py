"""Breadth batch 4: TeleFLM, InternLM2-VE, MiniCPM3, MiMo-V2-Flash,
ExaoneMoE, Pangu (Embedded/ProMoEV2/UltraMoE), Ouro, Step1, LFM2-MoE.

Reference: models/{llama.rs TeleFLM section, internlm2_ve.rs,
minicpm3.rs, mimo_v2_flash.rs, exaone_moe.rs, pangu.rs, ouro.rs,
step1.rs, lfm2.rs MoE sections}.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.moe import MoESpec, moe_layer
from ..layers.norm import rms_norm
from ..layers.rotary import apply_rope
from ..ops.kv_write import write_kv_pages
from ..ops.paged_attention import ragged_paged_attention_op
from .breadth import InternLM2ForCausalLM, MiniCPMForCausalLM
from .hybrid_ssm import Lfm2ForCausalLM
from .llama import LlamaForCausalLM
from .qwen3_moe import Qwen3MoeForCausalLM


def padded_v_attention(
    q, k, v, md, kv_page, *, sm_scale, sliding_window=None, backend="auto"
):
    """Paged attention with an asymmetric value head dim: V is zero-padded
    to the K head dim in the cache and sliced back after attention
    (reference minicpm3.rs "V is zero-padded to qk_head_dim",
    mimo_v2_flash.rs asymmetric v_head_dim)."""
    d = q.shape[-1]
    dv = v.shape[-1]
    if dv < d:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, d - dv)))
    kv_page = write_kv_pages(kv_page, k, v, md.slot_mapping)
    out = ragged_paged_attention_op(
        q, kv_page, md,
        sm_scale=sm_scale, sliding_window=sliding_window, backend=backend,
    )
    return out[..., :dv], kv_page


# -- TeleFLM ------------------------------------------------------------------


class TeleFLMForCausalLM(LlamaForCausalLM):
    """TeleFLM (reference models/llama.rs:660-690): Llama with optional
    muP/µScaling — embeddings × input_mult, logits ×
    output_mult / mup_scale_factor."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        if bool(ex.get("use_mup", False)):
            self.embedding_multiplier = float(ex.get("input_mult", 1.0))
            out_mult = float(ex.get("output_mult", 1.0))
            mup_scale = float(ex.get("mup_scale_factor", 1.0))
            # compute_logits DIVIDES by logits_scaling
            config.logits_scaling = mup_scale / out_mult


# -- InternLM2-VE -------------------------------------------------------------


class InternLM2VEForCausalLM(InternLM2ForCausalLM):
    """InternLM2 with Visual Expert (reference models/internlm2_ve.rs):
    a second MLP (`feed_forward_ve`) for visual tokens, routed by a
    visual_token_mask. Without a mask (text-only serving) every token
    takes the text MLP — the reference's default path; the VE weights
    are loaded so multimodal wrappers can route per-modality."""

    _RENAMES = InternLM2ForCausalLM._RENAMES + (
        (".feed_forward_ve.w1.", ".mlp_ve.gate_proj."),
        (".feed_forward_ve.w3.", ".mlp_ve.up_proj."),
        (".feed_forward_ve.w2.", ".mlp_ve.down_proj."),
    )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h, inter = cfg.hidden_size, cfg.intermediate_size
        z = (lambda s: jnp.zeros(s, d)) if rng is None else (
            lambda s: jnp.zeros(s, d)
        )
        for lp in params["layers"]:
            lp["mlp_ve"] = {
                "gate_proj": {"weight": z((h, inter))},
                "up_proj": {"weight": z((h, inter))},
                "down_proj": {"weight": z((inter, h))},
            }
        return params


# -- MiniCPM3 -----------------------------------------------------------------


class MiniCPM3ForCausalLM(MiniCPMForCausalLM):
    """MiniCPM3 (reference models/minicpm3.rs): DeepSeek-style low-rank
    Q/KV factorization with partial RoPE, but the expanded K/V are
    cached in the standard paged pool (not the compressed MLA cache) —
    kimi to minicpm3.rs:13-15. V is zero-padded to qk_head_dim."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        self.q_lora_rank = int(ex.get("q_lora_rank", 768))
        self.kv_lora_rank = int(ex.get("kv_lora_rank", 256))
        self.d_nope = int(ex.get("qk_nope_head_dim", 64))
        self.d_rope = int(ex.get("qk_rope_head_dim", 32))
        self.d_v = int(ex.get("v_head_dim", ex.get("qk_nope_head_dim", 64)))
        config.head_dim = self.d_nope + self.d_rope
        config.partial_rotary_factor = self.d_rope / config.head_dim
        config.num_key_value_heads = config.num_attention_heads
        super().__init__(config, dtype)

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h = cfg.hidden_size
        nh = cfg.num_attention_heads
        qk = self.d_nope + self.d_rope

        def w(shape):
            return jnp.zeros(shape, d) if rng is None else (
                scale * jax.random.normal(
                    jax.random.PRNGKey(hash(str(shape)) % (2**31)), shape
                )
            ).astype(d)

        for lp in params["layers"]:
            lp["self_attn"] = {
                "q_a_proj": {"weight": w((h, self.q_lora_rank))},
                "q_a_layernorm": jnp.ones((self.q_lora_rank,), d),
                "q_b_proj": {"weight": w((self.q_lora_rank, nh * qk))},
                "kv_a_proj_with_mqa": {
                    "weight": w((h, self.kv_lora_rank + self.d_rope))
                },
                "kv_a_layernorm": jnp.ones((self.kv_lora_rank,), d),
                "kv_b_proj": {
                    "weight": w(
                        (self.kv_lora_rank, nh * (self.d_nope + self.d_v))
                    )
                },
                "o_proj": {"weight": w((nh * self.d_v, h))},
            }
        return params

    def _attention(self, sa, x, md, kv_page, rope_tables):
        t = x.shape[0]
        cfg = self.config
        nh = cfg.num_attention_heads
        dn, dr, dv = self.d_nope, self.d_rope, self.d_v
        eps = cfg.rms_norm_eps

        q = linear(rms_norm(linear(x, sa["q_a_proj"]), sa["q_a_layernorm"],
                            eps), sa["q_b_proj"]).reshape(t, nh, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        ckv = linear(x, sa["kv_a_proj_with_mqa"])
        c_kv = rms_norm(ckv[:, : self.kv_lora_rank], sa["kv_a_layernorm"], eps)
        k_pe = ckv[:, self.kv_lora_rank :][:, None, :]  # [T, 1, dr]
        kv = linear(c_kv, sa["kv_b_proj"]).reshape(t, nh, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]

        cos, sin = rope_tables
        q_pe, k_pe = apply_rope(q_pe, k_pe, md.positions, cos, sin,
                                rotary_dim=dr)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (t, nh, dr))], axis=-1
        )
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        out, kv_page = padded_v_attention(
            q, k, v, md, kv_page,
            sm_scale=(dn + dr) ** -0.5, backend=self.attention_backend,
        )
        return linear(out.reshape(t, nh * dv), sa["o_proj"]), kv_page

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        x = self.embed(params, input_ids)
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            out, kv = self._attention(
                lp["self_attn"], h, md, kv_pages[i],
                (params["rope_cos"], params["rope_sin"]),
            )
            new_kv.append(kv)
            x = residual + out * self.residual_multiplier
            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn * self.residual_multiplier
        return self._norm(x, params["norm"]), new_kv


# -- MiMo-V2-Flash ------------------------------------------------------------


class MiMoV2FlashForCausalLM(Qwen3MoeForCausalLM):
    """MiMo V2 Flash (reference models/mimo_v2_flash.rs): hybrid
    full/sliding-window attention (`hybrid_layer_pattern`, 1 = SWA),
    optional asymmetric v_head_dim + value scaling, per-layer MoE via
    `moe_layer_freq` list."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        n = config.num_hidden_layers
        pattern = ex.get("hybrid_layer_pattern") or [0] * n
        window = ex.get("sliding_window") or config.sliding_window
        self.attn_specs = tuple(
            dataclasses.replace(
                s,
                sliding_window=(int(window) if pattern[i] == 1 and window
                                else None),
            )
            for i, s in enumerate(self.attn_specs)
        )
        self.d_v = int(ex.get("v_head_dim") or config.head_dim)
        self.v_scale = ex.get("v_scale")
        freq = ex.get("moe_layer_freq")
        if isinstance(freq, list):
            self._moe_layers = [bool(v) for v in freq]
        else:
            self._moe_layers = [True] * n

    def is_moe_layer(self, layer_idx: int) -> bool:
        if self.config.num_experts is None:
            return False
        return self._moe_layers[layer_idx]

    @property
    def kv_head_info(self):
        cfg = self.config
        return [(cfg.num_key_value_heads, cfg.head_dim)] * cfg.num_hidden_layers

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        if self.d_v != cfg.head_dim:
            nh, nkv, h = (cfg.num_attention_heads, cfg.num_key_value_heads,
                          cfg.hidden_size)
            for lp in params["layers"]:
                sa = lp["self_attn"]
                sa["v_proj"]["weight"] = jnp.zeros(
                    (h, nkv * self.d_v), self.dtype
                )
                sa["o_proj"]["weight"] = jnp.zeros(
                    (nh * self.d_v, h), self.dtype
                )
        return params

    def _attention(self, spec, sa, x, md, kv_page, rope_tables):
        t = x.shape[0]
        nh, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
        q = linear(x, sa["q_proj"]).reshape(t, nh, hd)
        k = linear(x, sa["k_proj"]).reshape(t, nkv, hd)
        v = linear(x, sa["v_proj"]).reshape(t, nkv, self.d_v)
        if self.v_scale:
            v = (v.astype(jnp.float32) * float(self.v_scale)).astype(v.dtype)
        cos, sin = rope_tables
        q, k = apply_rope(q, k, md.positions, cos, sin,
                          rotary_dim=spec.rotary.rotary_dim)
        out, kv_page = padded_v_attention(
            q, k, v, md, kv_page,
            sm_scale=spec.sm_scale, sliding_window=spec.sliding_window,
            backend=self.attention_backend,
        )
        return linear(out.reshape(t, nh * self.d_v), sa["o_proj"]), kv_page

    def __call__(self, params, input_ids, md, kv_pages):
        if self.d_v == self.config.head_dim and not self.v_scale:
            return super().__call__(params, input_ids, md, kv_pages)
        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            out, kv = self._attention(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                (params["rope_cos"], params["rope_sin"]),
            )
            new_kv.append(kv)
            x = residual + out
            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn
        return self._norm(x, params["norm"]), new_kv


# -- ExaoneMoE ----------------------------------------------------------------


class ExaoneMoeForCausalLM(Qwen3MoeForCausalLM):
    """K-EXAONE MoE (reference models/exaone_moe.rs): per-head QK norms,
    pre-LN, selective MoE via `is_moe_layer` list, sigmoid scoring with
    optional grouped top-k, shared experts, routed scaling factor."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = True
        super().__init__(config, dtype)
        n = config.num_hidden_layers
        self._moe_layers = ex.get("is_moe_layer") or [True] * n
        self.n_group = ex.get("n_group")
        self.topk_group = ex.get("topk_group")
        self.routed_scaling = float(ex.get("routed_scaling_factor", 1.0))
        self.num_shared = int(ex.get("num_shared_experts", 0))
        self.moe_spec = dataclasses.replace(
            self.moe_spec,
            num_experts=int(config.num_experts or ex.get("num_experts", 8)),
            scoring="sigmoid",
            norm_topk_prob=bool(config.norm_topk_prob),
            has_shared_expert=False,  # gateless shared: handled by params
            routed_scaling_factor=self.routed_scaling,
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return bool(self._moe_layers[layer_idx])

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        if self.num_shared > 0:
            h = cfg.hidden_size
            si = (cfg.moe_intermediate_size or cfg.intermediate_size) * (
                self.num_shared
            )
            for i, lp in enumerate(params["layers"]):
                if self.is_moe_layer(i):
                    lp["mlp"]["shared_expert"] = {
                        "gate_proj": {"weight": jnp.zeros((h, si), d)},
                        "up_proj": {"weight": jnp.zeros((h, si), d)},
                        "down_proj": {"weight": jnp.zeros((si, h), d)},
                    }
        return params

    def _moe_ffn(self, lp_mlp, h):
        from .deepseek import deepseek_moe_ffn

        return deepseek_moe_ffn(self.config, self.moe_spec, lp_mlp, h)

    def _param_path(self, name: str):
        n = name.removeprefix("model.")
        parts = n.split(".")
        if (
            len(parts) >= 5
            and parts[0] == "layers"
            and parts[2] == "mlp"
            and parts[3] in ("shared_expert", "shared_experts")
        ):
            return (
                ["layers", int(parts[1]), "mlp", "shared_expert", parts[4],
                 "weight"],
                True,
            )
        return super()._param_path(name)


# -- Pangu --------------------------------------------------------------------


class PanguForCausalLM(Qwen3MoeForCausalLM):
    """OpenPangu family (reference models/pangu.rs): GQA + RoPE, dense or
    sigmoid-routed MoE with plain-sum shared experts and routed scaling,
    optional sandwich norm (pre_mlp/post_mlp layernorms around the FFN)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        config.qk_norm = False
        self.attn_specs = tuple(
            dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
        )
        n = config.num_hidden_layers
        self.n_routed = ex.get("n_routed_experts") or config.num_experts
        self.first_k_dense = int(
            ex.get("first_k_dense_replace", n if not self.n_routed else 0)
        )
        self.n_shared = ex.get("n_shared_experts")
        self.routed_scaling = float(ex.get("routed_scaling_factor", 1.0))
        self.sandwich = bool(ex.get("sandwich_norm", False))
        self.moe_spec = dataclasses.replace(
            self.moe_spec,
            num_experts=int(self.n_routed or 8),
            top_k=int(config.num_experts_per_tok or 2),
            scoring="sigmoid",
            norm_topk_prob=bool(ex.get("norm_topk_prob", False)),
            has_shared_expert=False,  # plain-sum shared handled manually
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return bool(self.n_routed) and layer_idx >= self.first_k_dense

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h = cfg.hidden_size
        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        for i, lp in enumerate(params["layers"]):
            if self.sandwich:
                lp["pre_mlp_layernorm"] = jnp.ones((h,), d)
                lp["post_mlp_layernorm"] = jnp.ones((h,), d)
            if self.is_moe_layer(i):
                lp["mlp"].pop("shared_expert_gate", None)
                if self.n_shared:
                    si = inter * int(self.n_shared)
                    lp["mlp"]["shared_expert"] = {
                        "gate_proj": {"weight": jnp.zeros((h, si), d)},
                        "up_proj": {"weight": jnp.zeros((h, si), d)},
                        "down_proj": {"weight": jnp.zeros((si, h), d)},
                    }
        return params

    def _moe_ffn(self, lp_mlp, h):
        routed = moe_layer(
            dataclasses.replace(self.moe_spec, has_shared_expert=False),
            {k: v for k, v in lp_mlp.items() if k != "shared_expert"},
            h, backend=self.moe_backend,
        )
        out = routed.astype(jnp.float32) * self.routed_scaling
        if "shared_expert" in lp_mlp:
            out = out + swiglu_mlp(
                h, lp_mlp["shared_expert"], self.config.hidden_act
            ).astype(jnp.float32)
        return out.astype(h.dtype)

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                (params["rope_cos"], params["rope_sin"]),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            x = residual + out
            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            if self.sandwich:
                h = self._norm(h, lp["pre_mlp_layernorm"])
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            if self.sandwich:
                ffn = self._norm(ffn, lp["post_mlp_layernorm"])
            x = residual + ffn
        return self._norm(x, params["norm"]), new_kv

    def _param_path(self, name: str):
        n = name.removeprefix("model.")
        parts = n.split(".")
        if (
            len(parts) >= 4
            and parts[0] == "layers"
            and parts[2] == "mlp"
            and parts[3] == "shared_experts"
        ):
            idx = int(parts[1])
            return (
                ["layers", idx, "mlp", "shared_expert", parts[4], "weight"],
                True,
            )
        return super()._param_path(name)


# -- Ouro (multi-pass UT) -------------------------------------------------------


class OuroForCausalLM(LlamaForCausalLM):
    """Ouro (reference models/ouro.rs): Unroll-and-Think — the decoder
    layers run `total_ut_steps` times per forward, each UT step with its
    OWN per-layer KV cache (cache index = step·L + layer,
    ouro.rs:84-90); dual layernorms around attention and MLP; fused
    gate_up MLP; early-exit gate weights loaded (serving runs all
    steps, as the reference does)."""

    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        self.ut_steps = int(config.extra.get("total_ut_steps", 4))

    @property
    def kv_head_info(self):
        cfg = self.config
        per = [(cfg.num_key_value_heads, cfg.head_dim)] * cfg.num_hidden_layers
        return per * self.ut_steps

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h, inter = cfg.hidden_size, cfg.intermediate_size
        for lp in params["layers"]:
            lp["input_layernorm_2"] = jnp.ones((h,), d)
            lp["post_attention_layernorm_2"] = jnp.ones((h,), d)
            lp["mlp"] = {
                "gate_up_proj": {"weight": jnp.zeros((h, 2 * inter), d)},
                "down_proj": {"weight": jnp.zeros((inter, h), d)},
            }
        params["early_exit_gate"] = {
            "weight": jnp.zeros((h, 1), d),
            "bias": jnp.zeros((1,), d),
        }
        return params

    def _param_path(self, name: str):
        if name.startswith("model.early_exit_gate") or name.startswith(
            "early_exit_gate"
        ):
            leaf = name.rsplit(".", 1)[1]
            return ["early_exit_gate", leaf], leaf == "weight"
        return super()._param_path(name)

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        nl = cfg.num_hidden_layers
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = list(kv_pages)
        for step in range(self.ut_steps):
            for i, lp in enumerate(params["layers"]):
                ci = step * nl + i
                residual = x
                h = self._norm(x, lp["input_layernorm"])
                out, kv = attention_block(
                    self.attn_specs[i], lp["self_attn"], h, md, new_kv[ci],
                    (params["rope_cos"], params["rope_sin"]),
                    attention_backend=self.attention_backend,
                )
                new_kv[ci] = kv
                out = self._norm(out, lp["input_layernorm_2"])
                x = residual + out
                residual = x
                h = self._norm(x, lp["post_attention_layernorm"])
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
                ffn = self._norm(ffn, lp["post_attention_layernorm_2"])
                x = residual + ffn
        return self._norm(x, params["norm"]), new_kv


# -- Step1 --------------------------------------------------------------------


class Step1ForCausalLM(LlamaForCausalLM):
    """Step1 (reference models/step1.rs): no RoPE; sqrt-distance ALiBi
    bias slope·(-sqrt(i-j)); GQA via `num_attention_groups`."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        groups = config.extra.get("num_attention_groups")
        if groups:
            config.num_key_value_heads = int(groups)
        super().__init__(config, dtype)
        self.attn_specs = tuple(
            dataclasses.replace(s, rotary=None, use_alibi=True,
                                alibi_sqrt=True)
            for s in self.attn_specs
        )


# -- LFM2-MoE -----------------------------------------------------------------


class Lfm2MoeForCausalLM(Lfm2ForCausalLM):
    """LFM2 MoE (reference models/lfm2.rs Lfm2SparseMoeBlock): first
    `num_dense_layers` keep the dense w1/w2 MLP; the rest route top-k
    experts with sigmoid scoring, optional expert bias, norm_topk_prob
    and routed scaling. Experts under feed_forward.experts.{i}.w1/w3/w2,
    router under feed_forward.gate."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        self.num_dense = int(ex.get("num_dense_layers", 0))
        self.moe_spec = MoESpec(
            num_experts=int(config.num_experts or 8),
            top_k=int(ex.get("num_experts_per_tok", 2)),
            norm_topk_prob=bool(ex.get("norm_topk_prob", True)),
            scoring="sigmoid",
            act=config.hidden_act,
        )
        self.routed_scaling = float(ex.get("routed_scaling_factor", 1.0))
        self.use_expert_bias = bool(ex.get("use_expert_bias", False))
        self.moe_inter = int(
            config.moe_intermediate_size or config.intermediate_size
        )

    def _ffn_params(self, w, keys, layer_idx):
        if layer_idx < self.num_dense:
            return super()._ffn_params(w, keys, layer_idx)
        h = self.config.hidden_size
        e, inter = self.moe_spec.num_experts, self.moe_inter
        p = {
            "router": {"weight": w(next(keys), (h, e))},
            "experts": {
                "gate_proj": {"weight": w(next(keys), (e, h, inter))},
                "up_proj": {"weight": w(next(keys), (e, h, inter))},
                "down_proj": {"weight": w(next(keys), (e, inter, h))},
            },
        }
        if self.use_expert_bias:
            p["e_score_correction_bias"] = jnp.zeros((e,), jnp.float32)
        return p

    def _ffn(self, lp, h, layer_idx):
        ff = lp["feed_forward"]
        if "experts" not in ff:
            return super()._ffn(lp, h, layer_idx)
        spec = self.moe_spec
        mlp = dict(ff)
        if "e_score_correction_bias" in mlp:
            # sigmoid + additive expert bias routing (bias only for
            # selection, like DeepSeek's e-score correction)
            return (
                self._biased_moe(spec, mlp, h) * self.routed_scaling
            ).astype(h.dtype)
        out = moe_layer(spec, mlp, h)
        return (out.astype(jnp.float32) * self.routed_scaling).astype(h.dtype)

    def _biased_moe(self, spec, mlp, h):
        from ..layers.moe import _dense_experts

        scores = jax.nn.sigmoid(
            linear(h.astype(jnp.float32), mlp["router"]).astype(jnp.float32)
        )
        biased = scores + mlp["e_score_correction_bias"][None, :]
        _, idx = jax.lax.top_k(biased, spec.top_k)
        idx = idx.astype(jnp.int32)
        wts = jnp.take_along_axis(scores, idx, axis=-1)
        if spec.norm_topk_prob:
            wts = wts / (wts.sum(-1, keepdims=True) + 1e-20)
        return _dense_experts(spec, mlp, h, wts, idx).astype(jnp.float32)

    def _load_layer(self, lp, rest, a, layer_idx):
        if rest[0] == "feed_forward" and rest[1] in (
            "gate", "router", "expert_bias", "e_score_correction_bias",
        ):
            ff = lp["feed_forward"]
            if rest[1] in ("gate", "router"):
                ff["router"]["weight"] = jnp.asarray(a.T, self.dtype)
            else:
                ff["e_score_correction_bias"] = jnp.asarray(a, jnp.float32)
            return
        if rest[0] == "feed_forward" and rest[1] == "experts":
            ff = lp["feed_forward"]
            j = int(rest[2])
            pname = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}[
                rest[3]
            ]
            ff["experts"][pname]["weight"] = (
                ff["experts"][pname]["weight"]
                .at[j]
                .set(jnp.asarray(a.T, self.dtype))
            )
            return
        super()._load_layer(lp, rest, a, layer_idx)


def register_breadth4(registry: dict) -> None:
    from .moe_breadth import Glm4MoeForCausalLM
    from .deepseek import DeepseekV3ForCausalLM
    from .hybrid_ssm import NemotronHForCausalLM

    registry.update(
        {
            "TeleFLMForCausalLM": TeleFLMForCausalLM,
            "InternLM2VEForCausalLM": InternLM2VEForCausalLM,
            "MiniCPM3ForCausalLM": MiniCPM3ForCausalLM,
            "MiMoV2FlashForCausalLM": MiMoV2FlashForCausalLM,
            "ExaoneMoeForCausalLM": ExaoneMoeForCausalLM,
            "ExaoneMoEForCausalLM": ExaoneMoeForCausalLM,
            "PanguEmbeddedForCausalLM": PanguForCausalLM,
            "PanguProMoEV2ForCausalLM": PanguForCausalLM,
            "PanguUltraMoEForCausalLM": PanguForCausalLM,
            "OuroForCausalLM": OuroForCausalLM,
            "Step1ForCausalLM": Step1ForCausalLM,
            "Lfm2MoeForCausalLM": Lfm2MoeForCausalLM,
            # reference-grouped aliases (registry.rs):
            # Glm4MoeLite shares the Glm4Moe factory (factories/glm4_moe.rs)
            "Glm4MoeLiteForCausalLM": Glm4MoeForCausalLM,
            # GlmMoeDsa ships the DeepSeek factory (factories/deepseek.rs)
            "GlmMoeDsaForCausalLM": DeepseekV3ForCausalLM,
            # NemotronHPuzzle = NemotronH with per-layer block_configs
            "NemotronHPuzzleForCausalLM": NemotronHForCausalLM,
        }
    )
