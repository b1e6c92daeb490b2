"""Breadth batch 5: Step3-Text, Step-3.5-Flash, LongCat-Flash, PLaMo-2,
PLaMo-3, IQuest LoopCoder.

Reference: models/{step3_text.rs, step3p5.rs, longcat_flash.rs, plamo2.rs,
plamo3.rs, iquest_loopcoder.rs}.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.moe import MoESpec
from ..layers.norm import rms_norm
from ..layers.rotary import RotarySpec, apply_rope, compute_rope_tables
from ..ops.attn_metadata import AttentionMetadata
from ..ops.kv_write import write_kv_pages
from ..ops.paged_attention import ragged_paged_attention_op
from ..ops.ssm import causal_conv1d, selective_scan
from ..utils import on_tpu
from .hybrid_ssm import HybridMamba2Base
from .llama import LlamaForCausalLM
from .qwen3_moe import Qwen3MoeForCausalLM


def _parse_moe_layers(extra: dict, n: int) -> set[int]:
    """Parse `moe_layers_enum` ("1,2,5" comma string) with the reference
    default of every layer but 0 (step3_text.rs:86-97, step3p5.rs:84-95)."""
    s = extra.get("moe_layers_enum")
    if isinstance(s, str):
        return {int(p) for p in s.split(",") if p.strip()}
    if isinstance(s, (list, tuple)):
        return {int(p) for p in s}
    return set(range(1, n))


def biased_topk_moe(
    spec: MoESpec, mlp: dict, h: jax.Array, *, scoring: str = "sigmoid"
) -> jax.Array:
    """Routed experts with a DeepSeek-style e-score correction bias: the
    bias steers SELECTION only, weights come from the unbiased scores
    (reference moe/router.rs TopKRouter::new_with_bias; used by
    step3p5.rs:604-616 and longcat_flash.rs:228-234)."""
    from ..layers.moe import _dense_experts, _gmm_experts

    logits = linear(h, mlp["router"]).astype(jnp.float32)
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    bias = mlp.get("e_score_correction_bias")
    sel = scores if bias is None else scores + bias[None, :]
    _, idx = jax.lax.top_k(sel, spec.top_k)
    idx = idx.astype(jnp.int32)
    wts = jnp.take_along_axis(scores, idx, axis=-1)
    if spec.norm_topk_prob:
        wts = wts / (wts.sum(-1, keepdims=True) + 1e-20)
    experts = _gmm_experts if on_tpu() else _dense_experts
    return experts(spec, mlp, h, wts, idx)


def clipped_swiglu(x: jax.Array, p: dict, limit: float) -> jax.Array:
    """Step-3.5 clipped SwiGLU: min/max-clamp silu(gate) and up to
    [-L, L] before the product (reference tp_layers.rs:500-518
    TpFusedSwiGluMlp limit knob)."""
    g = jnp.clip(
        jax.nn.silu(linear(x, p["gate_proj"]).astype(jnp.float32)),
        -limit, limit,
    )
    u = jnp.clip(linear(x, p["up_proj"]).astype(jnp.float32), -limit, limit)
    return linear((g * u).astype(x.dtype), p["down_proj"])


def _split_fused_gate_up(name: str, arr) -> list[tuple[str, np.ndarray]]:
    """Split a fused `gate_up_proj.weight` [2I, H] into gate/up halves."""
    a = np.asarray(arr)
    g, u = np.split(a, 2, axis=0)
    return [
        (name.replace("gate_up_proj", "gate_proj"), g),
        (name.replace("gate_up_proj", "up_proj"), u),
    ]


# -- Step3-Text ----------------------------------------------------------------


class Step3TextForCausalLM(Qwen3MoeForCausalLM):
    """Step3-Text (reference models/step3_text.rs): hybrid MoE with a
    shared (compressed) Q dimension — qkv_proj emits [share_q_dim + 2·hd],
    the compressed Q is RMS-normed (`inter_norm`) then expanded by `wq`
    to num_heads·head_dim — single KV head, softmax router with an
    always-on shared expert, layer 0 dense by default
    (step3_text.rs:343-534 attention, :218-320 MoE block)."""

    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.num_key_value_heads = 1  # step3_text.rs:370 enforces MQA
        super().__init__(config, dtype)
        config.qk_norm = False  # inter_norm replaces per-head qk-norm
        self.attn_specs = tuple(
            self._make_attn_spec(i) for i in range(config.num_hidden_layers)
        )
        self.share_q_dim = int(ex.get("share_q_dim") or config.hidden_size)
        self._moe_layers = _parse_moe_layers(ex, config.num_hidden_layers)
        moe_inter = config.moe_intermediate_size or config.intermediate_size
        self.share_expert_dim = int(ex.get("share_expert_dim") or moe_inter)
        config.shared_expert_intermediate_size = self.share_expert_dim
        self.moe_spec = MoESpec(
            num_experts=int(ex.get("moe_num_experts", 16)),
            top_k=int(ex.get("moe_top_k", 3)),
            norm_topk_prob=bool(ex.get("norm_expert_weight", False)),
            scoring="softmax",
            act="silu",
            has_shared_expert=True,
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return layer_idx in self._moe_layers

    @property
    def kv_head_info(self):
        return [(1, self.config.head_dim)] * self.config.num_hidden_layers

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        h, hd, nh = cfg.hidden_size, cfg.head_dim, cfg.num_attention_heads
        sq = self.share_q_dim

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            return (scale * jax.random.normal(jax.random.PRNGKey(3), shape)
                    ).astype(self.dtype)

        for lp in params["layers"]:
            lp["self_attn"] = {
                "qkv_proj": {"weight": w((h, sq + 2 * hd))},
                "inter_norm": jnp.ones((sq,), self.dtype),
                "wq": {"weight": w((sq, nh * hd))},
                "o_proj": {"weight": w((nh * hd, h))},
            }
            # Step3 shared expert has no sigmoid gate (step3_text.rs:258)
            if "shared_expert_gate" in lp["mlp"]:
                del lp["mlp"]["shared_expert_gate"]
        return params

    def _attention(self, spec, sa, x, md, kv_page, rope_tables):
        t = x.shape[0]
        nh, hd = spec.num_heads, spec.head_dim
        qkv = linear(x, sa["qkv_proj"])
        qc, k, v = jnp.split(
            qkv, [self.share_q_dim, self.share_q_dim + hd], axis=-1
        )
        qc = rms_norm(qc, sa["inter_norm"], self.config.rms_norm_eps)
        q = linear(qc, sa["wq"]).reshape(t, nh, hd)
        k = k.reshape(t, 1, hd)
        v = v.reshape(t, 1, hd)
        cos, sin = rope_tables
        q, k = apply_rope(q, k, md.positions, cos, sin,
                          rotary_dim=spec.rotary.rotary_dim)
        kv_page = write_kv_pages(kv_page, k, v, md.slot_mapping)
        out = ragged_paged_attention_op(
            q, kv_page, md, sm_scale=spec.sm_scale,
            backend=self.attention_backend,
        )
        return linear(out.reshape(t, nh * hd), sa["o_proj"]), kv_page

    def __call__(self, params, input_ids, md, kv_pages):
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

    def load_weights(self, weights):
        # checkpoint layout: self_attn.{qkv_proj,wq,inter_norm,o_proj},
        # dense mlp.gate_up_proj (fused), moe.{gate,experts.J.*,
        # share_expert.{gate_up_proj,down_proj}} (step3_text.rs:622-650)
        def gen():
            for name, arr in weights:
                n = name.replace(".moe.share_expert.", ".mlp.shared_expert.")
                n = n.replace(".moe.gate.", ".mlp.gate.")
                n = n.replace(".moe.experts.", ".mlp.experts.")
                if "gate_up_proj.weight" in n:
                    yield from _split_fused_gate_up(n, arr)
                else:
                    yield n, arr
        return super().load_weights(gen())

    def _param_path(self, name: str):
        parts = name.removeprefix("model.").split(".")
        # wq is a linear despite not ending in `_proj`
        if (len(parts) == 5 and parts[0] == "layers"
                and parts[2] == "self_attn" and parts[3] == "wq"):
            return ["layers", int(parts[1]), "self_attn", "wq", "weight"], True
        return super()._param_path(name)


# -- Step-3.5-Flash -------------------------------------------------------------


class Step3p5ForCausalLM(Qwen3MoeForCausalLM):
    """Step-3.5-Flash (reference models/step3p5.rs): per-head QK norms,
    fused qkv, per-layer partial-rotary factors and RoPE on/off toggles,
    optional head-wise sigmoid attention gate (g_proj), mixed dense/MoE
    layers, FP32 sigmoid router with e-score correction bias, clipped
    SwiGLU shared expert with per-layer limits."""

    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)  # sets qk_norm=True like Qwen3
        n = config.num_hidden_layers
        factors = ex.get("partial_rotary_factors") or []
        rope_on = ex.get("use_rope_layers") or []
        self._rope_factor = [
            float(factors[i]) if i < len(factors) else 1.0 for i in range(n)
        ]
        self._use_rope = [
            bool(rope_on[i]) if i < len(rope_on) else True for i in range(n)
        ]
        specs = []
        for i, s in enumerate(self.attn_specs):
            if not self._use_rope[i]:
                specs.append(dataclasses.replace(s, rotary=None))
            elif self._rope_factor[i] < 1.0:
                rs = dataclasses.replace(
                    s.rotary,
                    rotary_dim=int(s.head_dim * self._rope_factor[i]),
                )
                specs.append(dataclasses.replace(s, rotary=rs))
            else:
                specs.append(s)
        self.attn_specs = tuple(specs)
        self.use_head_gate = bool(ex.get("use_head_wise_attn_gate", False))
        self._moe_layers = _parse_moe_layers(ex, n)
        moe_inter = config.moe_intermediate_size or config.intermediate_size
        top_k = int(ex.get("moe_top_k", 4))
        self.share_expert_dim = int(
            ex.get("share_expert_dim") or moe_inter * top_k
        )
        config.shared_expert_intermediate_size = self.share_expert_dim
        self.moe_spec = MoESpec(
            num_experts=int(ex.get("moe_num_experts", 16)),
            top_k=top_k,
            norm_topk_prob=bool(ex.get("norm_expert_weight", True)),
            scoring=str(ex.get("moe_router_activation", "sigmoid")),
            act="silu",
            has_shared_expert=True,
        )
        limits = ex.get("swiglu_limits_shared") or []
        self._shared_limits = [
            (float(limits[i]) if i < len(limits) and limits[i] else None)
            for i in range(n)
        ]

    def is_moe_layer(self, layer_idx: int) -> bool:
        return layer_idx in self._moe_layers

    def _distinct_partial_factors(self):
        return sorted({f for f in self._rope_factor if f < 1.0})

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            return (scale * jax.random.normal(jax.random.PRNGKey(5), shape)
                    ).astype(self.dtype)

        for lp in params["layers"]:
            sa = lp["self_attn"]
            for key in ("q_proj", "k_proj", "v_proj"):
                sa.pop(key, None)
            sa["qkv_proj"] = {"weight": w((h, (nh + 2 * nkv) * hd))}
            if self.use_head_gate:
                sa["g_proj"] = {"weight": w((h, nh))}
            if "experts" in lp["mlp"]:
                lp["mlp"]["e_score_correction_bias"] = jnp.zeros(
                    (self.moe_spec.num_experts,), jnp.float32
                )
                lp["mlp"].pop("shared_expert_gate", None)
        # one cos/sin table per distinct partial-rotary factor
        for f in self._distinct_partial_factors():
            rs = dataclasses.replace(
                self.rotary, rotary_dim=int(hd * f)
            )
            cos, sin = compute_rope_tables(rs, cfg.max_position_embeddings)
            key = f"rope_p{int(round(f * 1000))}"
            params[key + "_cos"] = cos
            params[key + "_sin"] = sin
        return params

    def rope_tables_for_layer(self, params, layer_idx):
        f = self._rope_factor[layer_idx]
        if not self._use_rope[layer_idx]:
            return None
        if f < 1.0:
            key = f"rope_p{int(round(f * 1000))}"
            return params[key + "_cos"], params[key + "_sin"]
        return params["rope_cos"], params["rope_sin"]

    def _moe_ffn_at(self, lp_mlp, h, layer_idx):
        out = biased_topk_moe(
            self.moe_spec, lp_mlp, h, scoring=self.moe_spec.scoring
        ).astype(h.dtype)
        limit = self._shared_limits[layer_idx]
        if limit is not None:
            shared = clipped_swiglu(h, lp_mlp["shared_expert"], limit)
        else:
            shared = swiglu_mlp(h, lp_mlp["shared_expert"], "silu")
        return out + shared

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                self.rope_tables_for_layer(params, i),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            x = residual + attn_out
            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn_at(lp["mlp"], h, i)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn
        return self._norm(x, params["norm"]), new_kv

    def load_weights(self, weights):
        # moe.* prefix for routed/shared experts, fused qkv + gate_up,
        # router bias loaded via set_e_score_correction_bias
        # (step3p5.rs:613-616, factories/step3p5.rs)
        def gen():
            for name, arr in weights:
                n = name.replace(".moe.share_expert.", ".mlp.shared_expert.")
                n = n.replace(".moe.gate.", ".mlp.gate.")
                n = n.replace(".moe.experts.", ".mlp.experts.")
                if "gate_up_proj.weight" in n:
                    yield from _split_fused_gate_up(n, arr)
                else:
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


# -- LongCat-Flash --------------------------------------------------------------


class LongcatFlashForCausalLM(LlamaForCausalLM):
    """LongCat-Flash (reference models/longcat_flash.rs): every decoder
    layer holds TWO attention blocks + TWO dense MLPs + one MoE, wired as
    the shortcut-connected MoE dataflow of longcat_flash.rs:461-527:

        x1 = x + attn0(ln0_0(x))
        normed = post_ln0(x1); moe = MoE(normed); m = mlp0(normed)
        h2 = x1 + attn1(ln1_1(m + x1))
        out = mlp1(post_ln1(h2)) + moe

    The reference shares one KV-cache layer between both attentions
    (longcat_flash.rs:483-486, which lets attn1 overwrite attn0's K/V at
    the same slots); here each attention gets its own KV page pool —
    kv_head_info reports 2 entries per layer."""

    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        self.n_experts = int(ex.get("n_routed_experts", 8))
        self.moe_top_k = int(
            ex.get("moe_topk", ex.get("num_experts_per_tok", 2))
        )
        self.moe_inter = int(
            config.moe_intermediate_size or config.intermediate_size
        )
        self.moe_spec = MoESpec(
            num_experts=self.n_experts, top_k=self.moe_top_k,
            norm_topk_prob=False, scoring="softmax", act="silu",
        )

    @property
    def kv_head_info(self):
        cfg = self.config
        return [(cfg.num_key_value_heads, cfg.head_dim)] * (
            2 * cfg.num_hidden_layers
        )

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        inter, e = cfg.intermediate_size, self.n_experts
        d = self.dtype

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(jax.random.PRNGKey(7), shape)
                    ).astype(d)

        def attn_p():
            p = {
                "q_proj": {"weight": w((h, nh * hd))},
                "k_proj": {"weight": w((h, nkv * hd))},
                "v_proj": {"weight": w((h, nkv * hd))},
                "o_proj": {"weight": w((nh * hd, h))},
            }
            if cfg.attention_bias:
                for k in ("q_proj", "k_proj", "v_proj"):
                    p[k]["bias"] = jnp.zeros(p[k]["weight"].shape[1], d)
            return p

        def mlp_p(i_sz):
            return {
                "gate_proj": {"weight": w((h, i_sz))},
                "up_proj": {"weight": w((h, i_sz))},
                "down_proj": {"weight": w((i_sz, h))},
            }

        layers = []
        for _ in range(cfg.num_hidden_layers):
            layers.append({
                "self_attn_0": attn_p(),
                "self_attn_1": attn_p(),
                "mlps_0": mlp_p(inter),
                "mlps_1": mlp_p(inter),
                "mlp": {
                    "router": {"weight": w((h, e))},
                    "e_score_correction_bias": jnp.zeros((e,), jnp.float32),
                    "experts": {
                        "gate_proj": {"weight": w((e, h, self.moe_inter))},
                        "up_proj": {"weight": w((e, h, self.moe_inter))},
                        "down_proj": {"weight": w((e, self.moe_inter, h))},
                    },
                },
                "input_layernorm_0": jnp.ones((h,), d),
                "input_layernorm_1": jnp.ones((h,), d),
                "post_attention_layernorm_0": jnp.ones((h,), d),
                "post_attention_layernorm_1": jnp.ones((h,), d),
            })
        params = {
            "embed_tokens": {"weight": w((cfg.vocab_size, h))},
            "layers": layers,
            "norm": jnp.ones((h,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w((h, cfg.vocab_size))}
        cos, sin = compute_rope_tables(self.rotary, cfg.max_position_embeddings)
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        return params

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        eps = cfg.rms_norm_eps
        x = params["embed_tokens"]["weight"][input_ids]
        rope = (params["rope_cos"], params["rope_sin"])
        new_kv = list(kv_pages)
        for i, lp in enumerate(params["layers"]):
            spec = self.attn_specs[i]
            a0, kv0 = attention_block(
                spec, lp["self_attn_0"],
                rms_norm(x, lp["input_layernorm_0"], eps),
                md, kv_pages[2 * i], rope,
                attention_backend=self.attention_backend,
            )
            new_kv[2 * i] = kv0
            x1 = x + a0
            normed = rms_norm(x1, lp["post_attention_layernorm_0"], eps)
            moe_out = biased_topk_moe(
                self.moe_spec, lp["mlp"], normed, scoring="softmax"
            ).astype(x.dtype)
            m = swiglu_mlp(normed, lp["mlps_0"], cfg.hidden_act)
            a1, kv1 = attention_block(
                spec, lp["self_attn_1"],
                rms_norm(m + x1, lp["input_layernorm_1"], eps),
                md, kv_pages[2 * i + 1], rope,
                attention_backend=self.attention_backend,
            )
            new_kv[2 * i + 1] = kv1
            h2 = x1 + a1
            x = swiglu_mlp(
                rms_norm(h2, lp["post_attention_layernorm_1"], eps),
                lp["mlps_1"], cfg.hidden_act,
            ) + moe_out
        return rms_norm(x, params["norm"], eps), new_kv

    def load_weights(self, weights):
        cfg = self.config
        params = self.init_params(rng=None)
        e = self.n_experts
        for name, arr in weights:
            n = name.removeprefix("model.")
            a = np.asarray(arr)
            if n == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif n == "norm.weight":
                params["norm"] = jnp.asarray(a, self.dtype)
            elif n == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif n.startswith("layers."):
                parts = n.split(".")
                lp = params["layers"][int(parts[1])]
                rest = parts[2:]
                if rest[0] in ("self_attn", "mlps"):
                    # self_attn.0.q_proj.weight / mlps.1.down_proj.weight
                    slot = ("self_attn_" if rest[0] == "self_attn"
                            else "mlps_") + rest[1]
                    leaf = rest[-1]
                    lp[slot][rest[2]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                elif rest[0] in ("input_layernorm",
                                 "post_attention_layernorm"):
                    lp[rest[0] + "_" + rest[1]] = jnp.asarray(a, self.dtype)
                elif rest[:2] == ["mlp", "gate"]:
                    if rest[2] == "weight":
                        lp["mlp"]["router"]["weight"] = jnp.asarray(
                            a.T, self.dtype
                        )
                    else:  # e_score_correction_bias
                        lp["mlp"]["e_score_correction_bias"] = jnp.asarray(
                            a, jnp.float32
                        )
                elif rest[:2] == ["mlp", "experts"]:
                    j, pname = int(rest[2]), rest[3]
                    exp = lp["mlp"]["experts"][pname]
                    exp["weight"] = exp["weight"].at[j].set(
                        jnp.asarray(a.T, self.dtype)
                    )
        return params


# -- PLaMo-2 --------------------------------------------------------------------


class Plamo2ForCausalLM(HybridMamba2Base):
    """PLaMo-2 (reference models/plamo2.rs): hybrid Mamba/attention with a
    4-norm residual pattern per layer (pre_mixer_norm → mixer →
    post_mixer_norm → +res; pre_mlp_norm → SwiGLU → post_mlp_norm → +res,
    plamo2.rs:682-728). The Mamba mixer is a selective scan with per-head
    A/dt/D, RMS-normed B/C/dt projections from a single bcdt_proj, and
    split gate/hidden in_proj (plamo2.rs:144-240).

    Note: the reference applies softplus(dt) BEFORE adding dt_bias
    (plamo2.rs:276-279); mirrored here for parity."""

    has_per_layer_ffn = False  # 4-norm flow handled in __call__

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        if ex.get("hidden_size_per_head"):
            config.head_dim = int(ex["hidden_size_per_head"])
        self.mamba_step = int(ex.get("mamba_step", 2))
        super().__init__(config, dtype)
        self.d_state = int(ex.get("mamba_d_state", 64))
        self.d_conv = int(ex.get("mamba_d_conv", 4))
        self.num_heads = int(ex.get("mamba_num_heads", 64))
        self.head_dim = int(ex.get("hidden_size_per_head", config.head_dim))
        self.d_inner = self.num_heads * self.head_dim
        self.dt_rank = max(64, config.hidden_size // 16)
        self.kinds = self._layer_kinds()
        self.attn_spec = dataclasses.replace(
            self.attn_spec,
            head_dim=config.head_dim,
            qk_norm=True,
            rotary=RotarySpec.from_model_config(config),
            sm_scale=config.head_dim**-0.5,
        )

    def _layer_kinds(self) -> list[str]:
        # plamo2.rs:112-120 is_mamba
        n = self.config.num_hidden_layers
        step = self.mamba_step
        if step <= 1:
            return ["attention"] * n
        if n <= step // 2:
            return ["attention" if i == n - 1 else "mamba" for i in range(n)]
        return ["attention" if (i % step) == (step // 2) else "mamba"
                for i in range(n)]

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        out = []
        for kind in self.kinds:
            if kind == "attention":
                out.append((cfg.num_key_value_heads, cfg.head_dim))
            else:
                out.append({"conv": (self.d_inner, self.d_conv - 1),
                            "ssm": (self.d_inner, self.d_state)})
        return out

    def _mixer_params(self, w, keys):
        h = self.config.hidden_size
        di, n, r = self.d_inner, self.d_state, self.dt_rank
        return {
            "in_proj_gate": {"weight": w(next(keys), (h, di))},
            "in_proj_hidden": {"weight": w(next(keys), (h, di))},
            "conv1d": {"weight": w(next(keys), (di, self.d_conv)),
                       "bias": jnp.zeros((di,), self.dtype)},
            "bcdt_proj": {"weight": w(next(keys), (di, r + 2 * n))},
            "dt_proj": {"weight": w(next(keys), (r, self.num_heads))},
            "dt_norm": jnp.ones((r,), self.dtype),
            "B_norm": jnp.ones((n,), self.dtype),
            "C_norm": jnp.ones((n,), self.dtype),
            "A_log": jnp.zeros((self.num_heads,), jnp.float32),
            "D": jnp.ones((self.num_heads,), jnp.float32),
            "dt_bias": jnp.zeros((self.num_heads,), jnp.float32),
            "out_proj": {"weight": w(next(keys), (di, h))},
        }

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h = cfg.hidden_size

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        n_keys = cfg.num_hidden_layers * 16 + 2
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)
        layers = []
        for kind in self.kinds:
            lp: dict = {
                "pre_mixer_norm": jnp.ones((h,), d),
                "post_mixer_norm": jnp.ones((h,), d),
                "pre_mlp_norm": jnp.ones((h,), d),
                "post_mlp_norm": jnp.ones((h,), d),
                "mlp": self._mlp_params(w, keys),
            }
            if kind == "attention":
                lp["self_attn"] = self._attn_params(w, keys)
                hd = cfg.head_dim
                lp["self_attn"]["q_norm"] = jnp.ones((hd,), d)
                lp["self_attn"]["k_norm"] = jnp.ones((hd,), d)
            else:
                lp["mamba"] = self._mixer_params(w, keys)
            layers.append(lp)
        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, h))},
            "layers": layers,
            "norm_f": jnp.ones((h,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w(next(keys), (h, cfg.vocab_size))}
        cos, sin = compute_rope_tables(
            self.attn_spec.rotary, cfg.max_position_embeddings
        )
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        return params

    def _mixer(self, mp, x, md, state):
        di, n, r = self.d_inner, self.d_state, self.dt_rank
        eps = self.config.rms_norm_eps
        gate = linear(x, mp["in_proj_gate"])
        hidden = linear(x, mp["in_proj_hidden"])
        hidden, conv_state = causal_conv1d(
            hidden, mp["conv1d"]["weight"], mp["conv1d"].get("bias"),
            state["conv"], md,
        )
        bcdt = linear(hidden, mp["bcdt_proj"])
        # bcdt order: B, C, dt (plamo2.rs:229-233)
        b, c, dt_r = jnp.split(bcdt, [n, 2 * n], axis=-1)
        b = rms_norm(b, mp["B_norm"], eps)
        c = rms_norm(c, mp["C_norm"], eps)
        dt_r = rms_norm(dt_r, mp["dt_norm"], eps)
        dt = linear(dt_r, mp["dt_proj"]).astype(jnp.float32)  # [T, H]
        dt = jax.nn.softplus(dt) + mp["dt_bias"][None, :]
        dt = jnp.repeat(dt, self.head_dim, axis=-1)  # [T, d_inner]
        # per-head A_log/D broadcast over head_dim channels and d_state
        a_log = jnp.broadcast_to(
            jnp.repeat(mp["A_log"], self.head_dim)[:, None], (di, n)
        )
        d_skip = jnp.repeat(mp["D"], self.head_dim)
        y, ssm_state = selective_scan(
            hidden, dt, a_log, b, c, d_skip, state["ssm"], md
        )
        y = y * jax.nn.silu(gate.astype(jnp.float32)).astype(y.dtype)
        return linear(y, mp["out_proj"]), {"conv": conv_state,
                                           "ssm": ssm_state}

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        eps = self.config.rms_norm_eps
        x = params["embed_tokens"]["weight"][input_ids]
        rope_tables = (params["rope_cos"], params["rope_sin"])
        new_states = []
        for i, lp in enumerate(params["layers"]):
            kind = self.kinds[i]
            residual = x
            h = rms_norm(x, lp["pre_mixer_norm"], eps)
            if kind == "attention":
                out, st = attention_block(
                    self.attn_spec, lp["self_attn"], h, md, states[i],
                    rope_tables, attention_backend=self.attention_backend,
                )
            else:
                out, st = self._mixer(lp["mamba"], h, md, states[i])
            new_states.append(st)
            x = residual + rms_norm(out, lp["post_mixer_norm"], eps)
            residual = x
            h = rms_norm(x, lp["pre_mlp_norm"], eps)
            mlp_out = swiglu_mlp(h, lp["mlp"], "silu")
            x = residual + rms_norm(mlp_out, lp["post_mlp_norm"], eps)
        x = rms_norm(x, params["norm_f"], eps)
        return x, new_states

    _norm_names = ("pre_mixer_norm", "post_mixer_norm", "pre_mlp_norm",
                   "post_mlp_norm")

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            # PLaMo checkpoints nest decoder layers twice:
            # model.layers.layers.N (plamo2.rs:604 vb "layers.layers")
            n = name.removeprefix("model.").replace("layers.layers.",
                                                    "layers.")
            a = np.asarray(arr)
            if n == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif n == "norm.weight":
                params["norm_f"] = jnp.asarray(a, self.dtype)
            elif n == "lm_head.weight":
                if not self.config.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif n.startswith("layers."):
                parts = n.split(".")
                self._load_layer(params["layers"][int(parts[1])], parts[2:],
                                 a, int(parts[1]))
        return params

    def _load_layer(self, lp, rest, a, layer_idx):
        kind = self.kinds[layer_idx]
        if rest[0] in self._norm_names:
            lp[rest[0]] = jnp.asarray(a, self.dtype)
        elif rest[0] == "mlp":
            if rest[1] == "gate_up_proj":
                if rest[-2] in ("gate", "up"):  # split tensors
                    lp["mlp"][rest[-2] + "_proj"]["weight"] = jnp.asarray(
                        a.T, self.dtype
                    )
                else:  # fused [2I, H]
                    g, u = np.split(a, 2, axis=0)
                    lp["mlp"]["gate_proj"]["weight"] = jnp.asarray(
                        g.T, self.dtype)
                    lp["mlp"]["up_proj"]["weight"] = jnp.asarray(
                        u.T, self.dtype)
            else:
                lp["mlp"][rest[1]]["weight"] = jnp.asarray(a.T, self.dtype)
        elif rest[0] == "mixer" and kind == "attention":
            sa = lp["self_attn"]
            if rest[1] in ("q_norm", "k_norm"):
                sa[rest[1]] = jnp.asarray(a, self.dtype)
            else:
                sa[rest[1]][rest[2]] = jnp.asarray(
                    a.T if rest[2] == "weight" else a, self.dtype
                )
        elif rest[0] == "mixer":
            m = lp["mamba"]
            key = rest[1]
            if key == "in_proj":
                if rest[2] in ("gate", "hidden"):
                    m["in_proj_" + rest[2]]["weight"] = jnp.asarray(
                        a.T, self.dtype)
                else:  # fused [2*d_inner, h]: gate rows first, then hidden
                    g, h = np.split(a, 2, axis=0)
                    m["in_proj_gate"]["weight"] = jnp.asarray(g.T, self.dtype)
                    m["in_proj_hidden"]["weight"] = jnp.asarray(
                        h.T, self.dtype)
            elif key == "conv1d":
                if rest[2] == "weight":
                    m["conv1d"]["weight"] = jnp.asarray(a[:, 0, :], self.dtype)
                else:
                    m["conv1d"]["bias"] = jnp.asarray(a, self.dtype)
            elif key in ("bcdt_proj", "dt_proj", "out_proj"):
                m[key]["weight"] = jnp.asarray(a.T, self.dtype)
            elif key in ("dt_norm", "B_norm", "C_norm"):
                m[key] = jnp.asarray(a, self.dtype)
            elif key == "A":
                # stored as A_log; the scan uses -exp(A_log)
                # (plamo2.rs:156 intent; selective_scan a_log input)
                m["A_log"] = jnp.asarray(a, jnp.float32)
            elif key in ("D", "dt_bias"):
                m[key] = jnp.asarray(a, jnp.float32)


# -- PLaMo-3 --------------------------------------------------------------------


class Plamo3ForCausalLM(LlamaForCausalLM):
    """PLaMo-3 (reference models/plamo3.rs): dense GQA transformer with
    per-head QK RMSNorm and the PLaMo 4-norm residual pattern — post-norms
    on the attention/MLP OUTPUTS before the residual add
    (plamo3.rs:136-169). Decoder weights nest under model.layers.layers.N
    with the attention named `mixer` and a fused/split gate_up MLP."""

    post_sublayer_norms = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        if ex.get("hidden_size_per_head"):
            config.head_dim = int(ex["hidden_size_per_head"])
        config.qk_norm = True
        super().__init__(config, dtype)

    def _param_path(self, name: str):
        n = name.replace("layers.layers.", "layers.")
        n = n.replace(".mixer.", ".self_attn.")
        n = (n.replace("pre_mixer_norm", "input_layernorm")
             .replace("post_mixer_norm", "post_self_attn_layernorm")
             .replace("pre_mlp_norm", "post_attention_layernorm")
             .replace("post_mlp_norm", "post_mlp_layernorm"))
        return super()._param_path(n)

    def load_weights(self, weights):
        def gen():
            for name, arr in weights:
                if name.endswith("gate_up_proj.weight"):
                    yield from _split_fused_gate_up(name, arr)
                elif ".gate_up_proj.gate." in name:
                    yield name.replace("gate_up_proj.gate",
                                       "gate_proj"), arr
                elif ".gate_up_proj.up." in name:
                    yield name.replace("gate_up_proj.up", "up_proj"), arr
                else:
                    yield name, arr
        return super().load_weights(gen())


# -- IQuest LoopCoder ------------------------------------------------------------


class IQuestLoopCoderForCausalLM(LlamaForCausalLM):
    """IQuest LoopCoder (reference models/iquest_loopcoder.rs): the same
    decoder stack is applied `loop_num` times. Loop 0 runs global
    attention; loops > 0 blend global attention (queries against the
    loop-0 KV) with local sliding-window attention through a learned
    per-head sigmoid gate on the query (iquest_loopcoder.rs:29-93).

    The reference collapses the blend to a single attention — its
    g·attn + (1-g)·attn is an identity (iquest_loopcoder.rs:267-278) —
    here the documented semantics run for real: each (layer, loop) pair
    owns a KV page pool, loops > 0 attend both globally (reusing the
    loop-0 pool, read-only) and locally (own pool, window
    `loop_window_size`), gated per head."""

    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        self.loop_num = int(ex.get("loop_num", 2))
        self.loop_window = int(ex.get("loop_window_size", 64))

    @property
    def kv_head_info(self):
        cfg = self.config
        return [(cfg.num_key_value_heads, cfg.head_dim)] * (
            cfg.num_hidden_layers * self.loop_num
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        hd, nh = cfg.head_dim, cfg.num_attention_heads

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, self.dtype)
            return (scale * jax.random.normal(jax.random.PRNGKey(9), shape)
                    ).astype(self.dtype)

        params["gate_projections"] = [
            {"weight": w((hd, nh)), "bias": jnp.zeros((nh,), self.dtype)}
            for _ in range(cfg.num_hidden_layers)
        ]
        return params

    def _param_path(self, name: str):
        n = name.removeprefix("model.")
        if n.startswith("gate_projections."):
            parts = n.split(".")  # gate_projections.N.gate_proj.{weight,bias}
            leaf = parts[-1]
            return ["gate_projections", int(parts[1]), leaf], leaf == "weight"
        return super()._param_path(name)

    def __call__(self, params, input_ids, md, kv_pages):
        cfg = self.config
        eps = cfg.rms_norm_eps
        n = cfg.num_hidden_layers
        x = params["embed_tokens"]["weight"][input_ids]
        cos, sin = params["rope_cos"], params["rope_sin"]
        new_kv = list(kv_pages)
        t = input_ids.shape[0]
        for loop in range(self.loop_num):
            for i, lp in enumerate(params["layers"]):
                spec = self.attn_specs[i]
                nh, nkv, hd = (spec.num_heads, spec.num_kv_heads,
                               spec.head_dim)
                sa = lp["self_attn"]
                residual = x
                h = rms_norm(x, lp["input_layernorm"], eps)
                q = linear(h, sa["q_proj"]).reshape(t, nh, hd)
                k = linear(h, sa["k_proj"]).reshape(t, nkv, hd)
                v = linear(h, sa["v_proj"]).reshape(t, nkv, hd)
                q, k = apply_rope(q, k, md.positions, cos, sin,
                                  rotary_dim=spec.rotary.rotary_dim)
                page_idx = loop * n + i
                if loop == 0:
                    new_kv[page_idx] = write_kv_pages(
                        new_kv[page_idx], k, v, md.slot_mapping
                    )
                    out = ragged_paged_attention_op(
                        q, new_kv[page_idx], md, sm_scale=spec.sm_scale,
                        backend=self.attention_backend,
                    )
                else:
                    # global: q against the loop-0 pool (read-only)
                    g_out = ragged_paged_attention_op(
                        q, new_kv[i], md, sm_scale=spec.sm_scale,
                        backend=self.attention_backend,
                    )
                    # local: own pool, sliding window
                    new_kv[page_idx] = write_kv_pages(
                        new_kv[page_idx], k, v, md.slot_mapping
                    )
                    l_out = ragged_paged_attention_op(
                        q, new_kv[page_idx], md, sm_scale=spec.sm_scale,
                        sliding_window=self.loop_window,
                        backend=self.attention_backend,
                    )
                    gp = params["gate_projections"][i]
                    # gate[t,h] = sigmoid(q[t,h,:]·W[:,h] + b[h])
                    # (iquest_loopcoder.rs:53-93 diagonal extraction)
                    gate = jax.nn.sigmoid(
                        jnp.einsum("thd,dh->th",
                                   q.astype(jnp.float32),
                                   gp["weight"].astype(jnp.float32))
                        + gp["bias"].astype(jnp.float32)[None, :]
                    )
                    out = (gate[:, :, None] * g_out.astype(jnp.float32)
                           + (1.0 - gate[:, :, None])
                           * l_out.astype(jnp.float32)).astype(x.dtype)
                attn_out = linear(out.reshape(t, nh * hd), sa["o_proj"])
                x = residual + attn_out
                residual = x
                h = rms_norm(x, lp["post_attention_layernorm"], eps)
                x = residual + swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
        return rms_norm(x, params["norm"], eps), new_kv


def register_breadth5(registry: dict) -> None:
    registry.update(
        {
            "Step3TextForCausalLM": Step3TextForCausalLM,
            "Step3p5ForCausalLM": Step3p5ForCausalLM,
            "LongcatFlashForCausalLM": LongcatFlashForCausalLM,
            "Plamo2ForCausalLM": Plamo2ForCausalLM,
            "Plamo3ForCausalLM": Plamo3ForCausalLM,
            "IQuestLoopCoderForCausalLM": IQuestLoopCoderForCausalLM,
        }
    )
