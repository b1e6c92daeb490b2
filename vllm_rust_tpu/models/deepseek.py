"""DeepSeek V2/V3: Multi-head Latent Attention + grouped-top-k MoE.

Reference: models/deepseek*.rs + kv_cache/mla_cache_engine.rs (the MLA
compressed-latent cache: per token only kv_lora_rank + rope_dim values,
~42x smaller than MHA KV) + layers/attention/mla.rs.

TPU formulation — "MLA as MQA with absorption":
  cache entry  k = [c_kv (normed latent, r dims) ; k_pe (roped, d_r)]
               v = [c_kv ; 0]                       (same pool layout)
  query        q_eff = [q_nope @ W_uk  ;  q_pe]     (absorb W_uk into q)
  attention    MQA (1 kv head, head_dim r + d_r) through the SAME paged
               kernel as every other model; output[..., :r] @ W_uv per
               head restores the value projection.
This keeps the unified cache, scheduler and kernel untouched — MLA is
just a per-layer (1, r + d_r) KvLayerSpec (ADR 0021 heterogeneity).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.linear import linear
from ..layers.moe import MoESpec, _dense_experts, _gmm_experts, moe_layer
from ..layers.norm import rms_norm
from ..layers.mlp import swiglu_mlp
from ..layers.rotary import RotarySpec, apply_rope, compute_rope_tables
from ..ops.kv_write import write_kv_pages
from ..ops.paged_attention import ragged_paged_attention_op
from .llama import LlamaForCausalLM


@dataclass(frozen=True)
class MLASpec:
    num_heads: int
    q_lora_rank: int | None
    kv_lora_rank: int  # r
    qk_nope_head_dim: int
    qk_rope_head_dim: int  # d_r
    v_head_dim: int
    sm_scale: float
    rms_eps: float
    # DeepSeek rope pairs are INTERLEAVED (HF V2 complex-mul rope / V3
    # rope_interleave=True; verified vs HF numerics)
    rope_interleave: bool = True

    @property
    def cache_dim(self) -> int:
        return self.kv_lora_rank + self.qk_rope_head_dim


def mla_attention(
    spec: MLASpec,
    params: dict,
    x: jax.Array,  # [T, hidden]
    md,
    kv_page: jax.Array,  # [pages, ps, 2, r + d_r]
    rope_tables,
    *,
    attention_backend: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    t = x.shape[0]
    h = spec.num_heads
    r = spec.kv_lora_rank
    d_n, d_r, d_v = spec.qk_nope_head_dim, spec.qk_rope_head_dim, spec.v_head_dim

    # -- queries --------------------------------------------------------------
    if spec.q_lora_rank:
        q_c = linear(x, params["q_a_proj"])
        q_c = rms_norm(q_c, params["q_a_layernorm"], spec.rms_eps)
        q = linear(q_c, params["q_b_proj"])
    else:
        q = linear(x, params["q_proj"])
    q = q.reshape(t, h, d_n + d_r)
    q_nope, q_pe = q[..., :d_n], q[..., d_n:]

    # -- compressed KV --------------------------------------------------------
    ckv_pe = linear(x, params["kv_a_proj_with_mqa"])  # [T, r + d_r]
    c_kv = rms_norm(ckv_pe[:, :r], params["kv_a_layernorm"], spec.rms_eps)
    k_pe = ckv_pe[:, r:][:, None, :]  # [T, 1, d_r]

    cos, sin = rope_tables
    q_pe, k_pe = apply_rope(
        q_pe, k_pe, md.positions, cos, sin, rotary_dim=d_r,
        interleaved=spec.rope_interleave,
    )

    # -- absorption: q_nope @ W_uk  -> latent space ---------------------------
    # kv_b_proj weight [r, H*(d_n + d_v)] reshaped to per-head blocks
    w_kv_b = params["kv_b_proj"]["weight"].reshape(r, h, d_n + d_v)
    w_uk = w_kv_b[..., :d_n]  # [r, H, d_n]
    w_uv = w_kv_b[..., d_n:]  # [r, H, d_v]
    q_lat = jnp.einsum("thd,rhd->thr", q_nope, w_uk)  # [T, H, r]
    q_eff = jnp.concatenate([q_lat, q_pe], axis=-1)  # [T, H, r + d_r]

    # -- cache write (MQA: 1 kv head, dim r + d_r) ----------------------------
    k_entry = jnp.concatenate([c_kv[:, None, :], k_pe], axis=-1)  # [T,1,r+d_r]
    v_entry = jnp.concatenate(
        [c_kv[:, None, :], jnp.zeros_like(k_pe)], axis=-1
    )
    kv_page = write_kv_pages(kv_page, k_entry, v_entry, md.slot_mapping)

    out = ragged_paged_attention_op(
        q_eff,
        kv_page,
        md,
        sm_scale=spec.sm_scale,
        backend=attention_backend,
    )  # [T, H, r + d_r]; the padded-zero value tail contributes nothing
    o_lat = out[..., :r]  # weighted sum of c_kv
    o = jnp.einsum("thr,rhd->thd", o_lat, w_uv)  # [T, H, d_v]
    return linear(o.reshape(t, h * d_v), params["o_proj"]), kv_page


def deepseek_moe_ffn(cfg, spec, params, x):
    """DeepSeek-style MoE FFN: sigmoid/softmax scoring, optional
    e-score correction bias + grouped top-k, routed scaling, gateless
    shared experts. Shared by DeepSeek V2/V3, GLM-4.5-MoE, and friends
    (reference moe/router.rs grouped top-k + expert_layer.rs shared)."""
    router_logits = linear(x, params["router"]).astype(jnp.float32)
    if spec.scoring == "sigmoid":
        scores = jax.nn.sigmoid(router_logits)
    else:
        scores = jax.nn.softmax(router_logits, axis=-1)
    # topk_method governs whether the group restriction applies: V2's
    # "greedy" is a plain top-k even when n_group is configured
    # (HF DeepseekV2MoEGate; verified vs HF numerics)
    topk_method = cfg.extra.get("topk_method")
    use_groups = bool(cfg.n_group and cfg.topk_group) and topk_method != "greedy"
    if use_groups:
        bias = params.get("e_score_correction_bias")
        topv, topi = grouped_topk(
            scores, bias, spec.top_k, cfg.n_group, cfg.topk_group
        )
    else:
        scores_b = scores
        if params.get("e_score_correction_bias") is not None:
            scores_b = scores + params["e_score_correction_bias"]
        _, topi = jax.lax.top_k(scores_b, spec.top_k)
        topi = topi.astype(jnp.int32)
        topv = jnp.take_along_axis(scores, topi, axis=-1)
    if spec.norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-20)
    if spec.routed_scaling_factor:
        topv = topv * spec.routed_scaling_factor
    from ..layers.moe import _COUNTS_SINK
    from ..utils import on_tpu

    sink = _COUNTS_SINK.get()
    if sink is not None:
        e_log = params["router"]["weight"].shape[-1]
        sink.append(
            jnp.zeros((e_log,), jnp.int32).at[topi.reshape(-1)].add(
                1, mode="drop"
            )
        )
    if "eplb_table" in params:
        table, counts = params["eplb_table"], params["eplb_counts"]
        t_ = topi.shape[0]
        stride = jnp.arange(t_, dtype=jnp.int32).reshape(
            (t_,) + (1,) * (topi.ndim - 1)
        )
        rep = jnp.broadcast_to(stride, topi.shape) % jnp.maximum(
            counts[topi], 1
        )
        topi = table[topi, rep]

    fn = _gmm_experts if on_tpu() else _dense_experts
    out = fn(spec, params, x, topv, topi)
    if "shared_expert" in params:
        out = out + swiglu_mlp(x, params["shared_expert"], spec.act)
    return out


def grouped_topk(
    scores: jax.Array,  # [T, E] (post-scoring)
    bias: jax.Array | None,  # e_score_correction_bias [E] or None
    top_k: int,
    n_group: int,
    topk_group: int,
):
    """DeepSeek grouped routing (reference moe/router.rs grouped top-k):
    pick topk_group groups by group score, then top-k experts within."""
    t, e = scores.shape
    sel = scores if bias is None else scores + bias[None, :]
    g = sel.reshape(t, n_group, e // n_group)
    # group score: sum of top-2 within the group (V3 convention)
    top2 = jax.lax.top_k(g, min(2, e // n_group))[0].sum(-1)  # [T, G]
    _, gidx = jax.lax.top_k(top2, topk_group)  # [T, topk_group]
    gmask = jnp.zeros((t, n_group), bool).at[
        jnp.arange(t)[:, None], gidx
    ].set(True)
    emask = jnp.repeat(gmask, e // n_group, axis=1)  # [T, E]
    masked = jnp.where(emask, sel, -jnp.inf)
    _, topi = jax.lax.top_k(masked, top_k)
    topv = jnp.take_along_axis(scores, topi, axis=1)  # weights w/o bias
    return topv, topi.astype(jnp.int32)


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    supports_pp = False  # custom __call__ (MLA + MoE)
    """DeepSeek V2/V3 (MLA + optionally MoE layers)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.mla = MLASpec(
            num_heads=config.num_attention_heads,
            q_lora_rank=config.q_lora_rank,
            kv_lora_rank=config.kv_lora_rank or 512,
            qk_nope_head_dim=config.qk_nope_head_dim or 128,
            qk_rope_head_dim=config.qk_rope_head_dim or 64,
            v_head_dim=config.v_head_dim or 128,
            sm_scale=self._mla_scale(config),
            rms_eps=config.rms_norm_eps,
            rope_interleave=bool(config.extra.get("rope_interleave", True)),
        )
        super().__init__(config, dtype)
        self.rotary = RotarySpec(
            head_dim=self.mla.qk_rope_head_dim,
            rotary_dim=self.mla.qk_rope_head_dim,
            max_position=config.max_position_embeddings,
            base=config.rope_theta,
            scaling=config.rope_scaling,
        )
        if config.num_experts:
            self.moe_spec = MoESpec(
                num_experts=config.num_experts,
                top_k=config.num_experts_per_tok or 8,
                norm_topk_prob=config.norm_topk_prob,
                scoring=config.scoring_func,
                act=config.hidden_act,
                has_shared_expert=bool(config.num_shared_experts),
                routed_scaling_factor=config.routed_scaling_factor,
            )
        else:
            self.moe_spec = None
        self.moe_backend = "auto"

    @staticmethod
    def _mla_scale(config: ModelConfig) -> float:
        d = (config.qk_nope_head_dim or 128) + (config.qk_rope_head_dim or 64)
        scale = d**-0.5
        s = config.rope_scaling
        if s is not None and s.rope_type in ("yarn", "deepseek_yarn") and s.mscale_all_dim:
            m = 0.1 * s.mscale_all_dim * math.log(s.factor) + 1.0
            scale = scale * m * m
        return scale

    def _make_attn_spec(self, layer_idx):
        # unused for MLA models, but the base class builds kv_head_info
        # from attn_specs — override kv_head_info instead
        return super()._make_attn_spec(layer_idx)

    @property
    def kv_head_info(self) -> list[tuple[int, int]]:
        """MLA: one latent 'head' of r + d_r per layer (the ~42x cache
        saving; reference mla_cache_engine.rs)."""
        return [
            (1, self.mla.cache_dim) for _ in range(self.config.num_hidden_layers)
        ]

    def is_moe_layer(self, layer_idx: int) -> bool:
        return (
            self.moe_spec is not None
            and layer_idx >= self.config.first_k_dense_replace
        )

    # -- params ---------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        m = self.mla
        h = cfg.hidden_size

        n_keys = cfg.num_hidden_layers * 16 + 8
        if rng is not None:
            _k = jax.random.split(rng, n_keys)
            ki = iter([_k[i] for i in range(n_keys)])
        else:
            ki = iter([None] * n_keys)

        def w(shape):
            k = next(ki)
            if k is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(k, shape, jnp.float32)).astype(d)

        def lin(din, dout):
            return {"weight": w((din, dout))}

        layers = []
        for i in range(cfg.num_hidden_layers):
            attn = {
                "kv_a_proj_with_mqa": lin(h, m.kv_lora_rank + m.qk_rope_head_dim),
                "kv_a_layernorm": jnp.ones((m.kv_lora_rank,), d),
                "kv_b_proj": lin(
                    m.kv_lora_rank, m.num_heads * (m.qk_nope_head_dim + m.v_head_dim)
                ),
                "o_proj": lin(m.num_heads * m.v_head_dim, h),
            }
            if m.q_lora_rank:
                attn["q_a_proj"] = lin(h, m.q_lora_rank)
                attn["q_a_layernorm"] = jnp.ones((m.q_lora_rank,), d)
                attn["q_b_proj"] = lin(
                    m.q_lora_rank,
                    m.num_heads * (m.qk_nope_head_dim + m.qk_rope_head_dim),
                )
            else:
                attn["q_proj"] = lin(
                    h, m.num_heads * (m.qk_nope_head_dim + m.qk_rope_head_dim)
                )
            lp = {
                "input_layernorm": jnp.ones((h,), d),
                "post_attention_layernorm": jnp.ones((h,), d),
                "self_attn": attn,
            }
            if self.is_moe_layer(i):
                e = self.moe_spec.num_experts
                inter = cfg.moe_intermediate_size or cfg.intermediate_size
                moe = {
                    "router": lin(h, e),
                    "experts": {
                        "gate_proj": {"weight": w((e, h, inter))},
                        "up_proj": {"weight": w((e, h, inter))},
                        "down_proj": {"weight": w((e, inter, h))},
                    },
                }
                if cfg.extra.get("e_score_correction_bias", True) and (
                    cfg.scoring_func == "sigmoid"
                ):
                    moe["e_score_correction_bias"] = jnp.zeros((e,), jnp.float32)
                if self.moe_spec.has_shared_expert:
                    si = (cfg.moe_intermediate_size or cfg.intermediate_size) * (
                        cfg.num_shared_experts or 1
                    )
                    moe["shared_expert"] = {
                        "gate_proj": lin(h, si),
                        "up_proj": lin(h, si),
                        "down_proj": lin(si, h),
                    }
                lp["mlp"] = moe
            else:
                lp["mlp"] = {
                    "gate_proj": lin(h, cfg.intermediate_size),
                    "up_proj": lin(h, cfg.intermediate_size),
                    "down_proj": lin(cfg.intermediate_size, h),
                }
            layers.append(lp)

        params = {
            "embed_tokens": {"weight": w((cfg.vocab_size, h))},
            "layers": layers,
            "norm": jnp.ones((h,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = lin(h, cfg.vocab_size)
        cos, sin = compute_rope_tables(self.rotary, cfg.max_position_embeddings)
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        return params

    def _param_path(self, name: str):
        n = name.removeprefix("model.")
        n = n.replace(".mlp.shared_experts.", ".mlp.shared_expert.")
        parts = n.split(".")
        if parts[0] == "layers" and len(parts) >= 4:
            idx = int(parts[1])
            rest = parts[2:]
            if rest[0] == "mlp" and rest[1] == "gate":
                if rest[-1] == "e_score_correction_bias":
                    return ["layers", idx, "mlp", "e_score_correction_bias"], False
                return ["layers", idx, "mlp", "router", "weight"], True
            if rest[-1] == "weight" and (
                rest[-2].endswith("_proj") or rest[-2] == "kv_a_proj_with_mqa"
            ):
                return ["layers", idx, *rest[:-1], "weight"], True
            if rest[-1] == "weight":
                return ["layers", idx, *rest[:-1]], False
        return super()._param_path(name)

    def load_weights(self, weights):
        """Stack per-expert HF tensors (model.layers.L.mlp.experts.J.*)
        into [E, in, out] grouped-matmul weights; everything else rides
        the base-class path."""
        expert_parts: dict[tuple[int, str, int], np.ndarray] = {}

        def stream():
            for name, arr in weights:
                if ".mlp.experts." in name:
                    parts = name.split(".")
                    li = int(parts[parts.index("layers") + 1])
                    ji = int(parts[parts.index("experts") + 1])
                    expert_parts[(li, parts[-2], ji)] = np.asarray(arr).T
                    continue
                yield name, arr

        params = super().load_weights(stream())
        e = self.moe_spec.num_experts
        by_layer: dict[tuple[int, str], list] = {}
        for (li, pname, ji), a in expert_parts.items():
            by_layer.setdefault((li, pname), [None] * e)[ji] = a
        for (li, pname), lst in by_layer.items():
            params["layers"][li]["mlp"]["experts"][pname] = {
                "weight": jnp.asarray(np.stack(lst, axis=0), self.dtype)
            }
        return params

    def _moe(self, spec, params, x):
        return deepseek_moe_ffn(self.config, spec, params, x)

    # -- forward --------------------------------------------------------------

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        if embeds is not None:
            # multimodal injection (DeepSeek-VL2/Kimi-VL wrappers)
            mask, override = embeds
            x = jnp.where(mask[:, None], override.astype(x.dtype), x)
        rope_tables = (params["rope_cos"], params["rope_sin"])
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            attn_out, kv = mla_attention(
                self.mla,
                lp["self_attn"],
                h,
                md,
                kv_pages[i],
                rope_tables,
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            x = residual + attn_out

            residual = x
            h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            if self.is_moe_layer(i) and "experts" in lp["mlp"]:
                ffn = self._moe(self.moe_spec, lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn

        x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
        return x, new_kv


class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    pass
