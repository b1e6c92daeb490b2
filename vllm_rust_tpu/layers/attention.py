"""Config-driven attention block.

Re-design of the reference's AttentionBlock (crates/core/src/layers/
attention/block.rs:451 AttentionConfig, :630 AttentionBlock) — one
parameterized module covering ~80% of decoder architectures via knobs:
GQA, per-head QK-RMSNorm (before/after RoPE), logit softcap, sliding
window, bias subsets, partial rotary, fused QKV. TPU-first: the block is a
pure function; TP sharding comes from NamedSharding on the param tree, not
from per-arch parallel layer types (reference parallel_layers.rs
dissolves under SPMD).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attn_metadata import AttentionMetadata
from ..ops.kv_write import write_kv_pages
from ..ops.paged_attention import ragged_paged_attention_op
from .linear import linear
from .norm import layer_norm, rms_norm
from .rotary import RotarySpec, apply_rope


@functools.lru_cache(maxsize=None)
def alibi_slopes(num_heads: int) -> tuple[float, ...]:
    """Per-head ALiBi slopes (Press et al.; reference layers/alibi.rs):
    geometric sequence from 2^(-8/n) for the nearest power of two, with
    odd-stride interpolation for non-power-of-two head counts."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        return tuple(pow2_slopes(num_heads))
    closest = 2 ** math.floor(math.log2(num_heads))
    extra = pow2_slopes(2 * closest)[0::2][: num_heads - closest]
    return tuple(pow2_slopes(closest) + extra)


@dataclass(frozen=True)
class AttentionSpec:
    """Static per-layer attention description (hashable, closed over jit)."""

    num_heads: int
    num_kv_heads: int
    head_dim: int
    rotary: RotarySpec | None
    sm_scale: float
    qk_norm: bool = False  # per-head RMSNorm on q/k (Qwen3, Gemma2/3)
    qk_norm_after_rope: bool = False
    rms_eps: float = 1e-6
    sliding_window: int | None = None
    soft_cap: float | None = None
    interleaved_rope: bool = False
    norm_offset: float = 0.0  # 1.0 for Gemma-style (1+w) norms
    use_alibi: bool = False  # per-head ALiBi bias (Bloom/MPT/Baichuan-13B)
    alibi_sqrt: bool = False  # sqrt-distance ALiBi (Step1, step1.rs:53-76)
    # per-head q/k LayerNorm with bias over head_dim (Persimmon/Fuyu) —
    # qk_norm must also be set
    qk_norm_layernorm: bool = False
    # q/k norm computed over the FULL projection dim (OLMo-2), not per head
    qk_norm_full: bool = False
    # clamp q/k/v projections to [-clip, clip] (OLMo-1 clip_qkv)
    qkv_clip: float | None = None
    # weightless per-head RMSNorm on V (Gemma3n v_norm, gemma3n.rs:576)
    v_norm_unweighted: bool = False

    @staticmethod
    def from_model_config(
        cfg: ModelConfig, layer_idx: int, *, sm_scale: float | None = None
    ) -> "AttentionSpec":
        return AttentionSpec(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            rotary=RotarySpec.from_model_config(cfg),
            sm_scale=sm_scale if sm_scale is not None else cfg.head_dim**-0.5,
            qk_norm=cfg.qk_norm,
            rms_eps=cfg.rms_norm_eps,
            sliding_window=cfg.layer_sliding_window(layer_idx),
            soft_cap=cfg.attn_logit_softcapping,
        )


def attention_block(
    spec: AttentionSpec,
    params: dict,
    x: jax.Array,  # [T, hidden]
    md: AttentionMetadata,
    kv_page: jax.Array,  # [num_pages, page_size, 2*K, D] — this layer's pool
    rope_tables: tuple[jax.Array, jax.Array] | None,
    *,
    attention_backend: str = "auto",
    k_scale: float | None = None,
    v_scale: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full attention layer: qkv proj → qk-norm/rope → KV write → ragged
    paged attention → output proj. Returns (output [T, hidden], updated
    kv_page)."""
    t = x.shape[0]
    h, k_heads, d = spec.num_heads, spec.num_kv_heads, spec.head_dim

    if "qkv_proj" in params:
        qkv = linear(x, params["qkv_proj"])
        q, k, v = jnp.split(
            qkv, [h * d, (h + k_heads) * d], axis=-1
        )
    else:
        q = linear(x, params["q_proj"])
        k = linear(x, params["k_proj"])
        v = linear(x, params["v_proj"])
    if spec.qkv_clip is not None:
        q = jnp.clip(q, -spec.qkv_clip, spec.qkv_clip)
        k = jnp.clip(k, -spec.qkv_clip, spec.qkv_clip)
        v = jnp.clip(v, -spec.qkv_clip, spec.qkv_clip)
    if spec.qk_norm and spec.qk_norm_full:
        # OLMo-2: RMSNorm over the flat [heads*head_dim] projection,
        # before head split and rope
        q = rms_norm(q, params["q_norm"], spec.rms_eps)
        k = rms_norm(k, params["k_norm"], spec.rms_eps)
    q = q.reshape(t, h, d)
    k = k.reshape(t, k_heads, d)
    v = v.reshape(t, k_heads, d)
    if spec.v_norm_unweighted:
        vf = v.astype(jnp.float32)
        v = (vf * jax.lax.rsqrt(
            jnp.mean(jnp.square(vf), axis=-1, keepdims=True) + spec.rms_eps
        )).astype(v.dtype)

    def qk_normalize(q, k):
        if spec.qk_norm_full:
            return q, k  # already applied pre-reshape
        if spec.qk_norm_layernorm:
            q = layer_norm(
                q, params["q_norm"]["weight"], params["q_norm"].get("bias"),
                spec.rms_eps,
            )
            k = layer_norm(
                k, params["k_norm"]["weight"], params["k_norm"].get("bias"),
                spec.rms_eps,
            )
            return q, k
        q = rms_norm(q, params["q_norm"], spec.rms_eps, weight_offset=spec.norm_offset)
        k = rms_norm(k, params["k_norm"], spec.rms_eps, weight_offset=spec.norm_offset)
        return q, k

    if spec.qk_norm and not spec.qk_norm_after_rope:
        q, k = qk_normalize(q, k)
    if spec.rotary is not None and rope_tables is not None:
        cos, sin = rope_tables
        pos = md.positions
        if pos.ndim == 2 and spec.rotary.mrope_section is None:
            pos = pos[0]  # non-mrope layer fed 3-axis positions: 1-D axis
        q, k = apply_rope(
            q,
            k,
            pos,
            cos,
            sin,
            rotary_dim=spec.rotary.rotary_dim,
            interleaved=spec.interleaved_rope,
            mrope_section=spec.rotary.mrope_section,
        )
    if spec.qk_norm and spec.qk_norm_after_rope:
        q, k = qk_normalize(q, k)

    from ..ops.dcp import dcp_active

    dcp_ctx = dcp_active()
    if dcp_ctx is not None:
        # decode context parallelism: KV stripes live on their "sp"
        # rank; masked local write + local attention + LSE merge
        # (reference DcpAttentionWrapper, context_parallel.rs)
        from ..ops.dcp import dcp_write_and_attend

        axis, world, mesh = dcp_ctx
        assert not spec.use_alibi and params.get("sinks") is None, (
            "ALiBi / attention sinks unsupported under DCP"
        )
        out, kv_page = dcp_write_and_attend(
            q, k, v, kv_page, md,
            sm_scale=spec.sm_scale,
            sliding_window=spec.sliding_window,
            soft_cap=spec.soft_cap,
            k_scale=k_scale,
            v_scale=v_scale,
            world=world,
            axis=axis,
            mesh=mesh,
        )
        out = out.reshape(t, h * d)
        return _attn_output(spec, params, out, x, md), kv_page

    kv_page = write_kv_pages(
        kv_page, k, v, md.slot_mapping, k_scale=k_scale, v_scale=v_scale
    )

    slopes = (
        jnp.asarray(alibi_slopes(h), jnp.float32) if spec.use_alibi else None
    )
    out = ragged_paged_attention_op(
        q,
        kv_page,
        md,
        params.get("sinks"),  # learned attention-sink logits (GPT-OSS)
        slopes,
        sm_scale=spec.sm_scale,
        sliding_window=spec.sliding_window,
        soft_cap=spec.soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        backend=attention_backend,
        alibi_sqrt=spec.alibi_sqrt,
    )
    out = out.reshape(t, h * d)
    return _attn_output(spec, params, out, x, md), kv_page


def _attn_output(spec: AttentionSpec, params: dict, out, x, md):
    """Post-attention tail: optional sigmoid output gate + o_proj."""
    h, d = spec.num_heads, spec.head_dim
    if "g_proj" in params:
        # sigmoid output gate on the attention output — per channel
        # (Qwen3-Next attn_output_gate; reference qwen3_next.rs:174-190)
        # or per HEAD when the projection is hidden -> num_heads
        # (Step-3.5 use_head_wise_attn_gate; reference step3p5.rs:379-390)
        gate = jax.nn.sigmoid(
            linear(x, params["g_proj"]).astype(jnp.float32)
        )
        if gate.shape[-1] == h:  # per-head: broadcast over head_dim
            gate = jnp.repeat(gate, d, axis=-1)
        out = out * gate.astype(out.dtype)
    return linear(out, params["o_proj"])
