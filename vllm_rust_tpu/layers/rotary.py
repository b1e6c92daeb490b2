"""Rotary position embeddings with scaling variants.

Reference: crates/core/src/layers/rotary.rs:37 (RotaryEmbedding incl.
new_partial + llama3/yarn/linear/dynamic-NTK scaling) and the rope.cu /
qknorm_rope.cu CUDA kernels. TPU-first design: cos/sin tables are
precomputed host-side once (static), gathered by position inside the
jitted step, and the rotation is plain XLA elementwise math that fuses
with the surrounding projections.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RopeScalingConfig


@dataclass(frozen=True)
class RotarySpec:
    """Static description of a model's RoPE (hashable; closed over in jit)."""

    head_dim: int
    rotary_dim: int
    max_position: int
    base: float = 10000.0
    scaling: RopeScalingConfig | None = None
    # attention scaling applied to cos/sin (yarn/longrope mscale)
    attn_scale: float = 1.0
    # 3-axis multimodal RoPE (Qwen2-VL family): per-axis half-dim counts
    # (temporal, height, width), summing to rotary_dim // 2
    mrope_section: tuple[int, ...] | None = None

    @staticmethod
    def from_model_config(cfg: ModelConfig) -> "RotarySpec":
        rotary_dim = int(cfg.head_dim * cfg.partial_rotary_factor)
        sec = None
        if cfg.rope_scaling is not None and cfg.rope_scaling.mrope_section:
            sec = tuple(cfg.rope_scaling.mrope_section)
        return RotarySpec(
            head_dim=cfg.head_dim,
            rotary_dim=rotary_dim,
            max_position=cfg.max_position_embeddings,
            base=cfg.rope_theta,
            scaling=cfg.rope_scaling,
            mrope_section=sec,
        )


def _yarn_find_correction_dim(
    num_rotations: float, dim: int, base: float, max_pos: int
) -> float:
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base)
    )


def _yarn_correction_range(
    low_rot: float, high_rot: float, dim: int, base: float, max_pos: int
) -> tuple[int, int]:
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(lo: float, hi: float, dim: int) -> np.ndarray:
    if lo == hi:
        hi += 0.001
    ramp = (np.arange(dim, dtype=np.float32) - lo) / (hi - lo)
    return np.clip(ramp, 0, 1)


def compute_inv_freq(spec: RotarySpec) -> np.ndarray:
    """Per-dimension inverse frequencies with scaling applied."""
    rd = spec.rotary_dim
    base = spec.base
    inv_freq = 1.0 / (
        base ** (np.arange(0, rd, 2, dtype=np.float64) / rd)
    )
    s = spec.scaling
    if s is None or s.rope_type in ("default", "mrope"):
        return inv_freq.astype(np.float32)
    if s.rope_type == "linear":
        return (inv_freq / s.factor).astype(np.float32)
    if s.rope_type == "llama3":
        # reference rotary.rs llama3 branch; matches HF Llama-3.1 scaling
        orig = s.original_max_position_embeddings or 8192
        low_wl = orig / s.low_freq_factor
        high_wl = orig / s.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        scaled = np.where(wavelen > low_wl, inv_freq / s.factor, inv_freq)
        smooth = (orig / wavelen - s.low_freq_factor) / (
            s.high_freq_factor - s.low_freq_factor
        )
        mid = (1 - smooth) * inv_freq / s.factor + smooth * inv_freq
        is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
        return np.where(is_mid, mid, scaled).astype(np.float32)
    if s.rope_type in ("yarn", "deepseek_yarn"):
        orig = s.original_max_position_embeddings or spec.max_position
        lo, hi = _yarn_correction_range(s.beta_fast, s.beta_slow, rd, base, orig)
        ramp = 1 - _yarn_linear_ramp(lo, hi, rd // 2)
        ramp = ramp * s.extrapolation_factor
        inter = inv_freq / s.factor
        return (inter * (1 - ramp) + inv_freq * ramp).astype(np.float32)
    if s.rope_type == "dynamic":
        # dynamic NTK at max length (static shapes force precomputation at
        # the engine's max_model_len — equivalent at full context)
        alpha = s.factor
        scaled_base = base * alpha ** (rd / (rd - 2))
        return (
            1.0 / (scaled_base ** (np.arange(0, rd, 2, dtype=np.float64) / rd))
        ).astype(np.float32)
    raise NotImplementedError(f"rope scaling type {s.rope_type}")


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def compute_rope_tables(spec: RotarySpec, max_len: int) -> tuple[jax.Array, jax.Array]:
    """Precompute cos/sin tables [max_len, rotary_dim/2] (float32)."""
    inv_freq = compute_inv_freq(spec)
    t = np.arange(max_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [L, rd/2]
    scale = spec.attn_scale
    s = spec.scaling
    if s is not None and s.rope_type in ("yarn", "deepseek_yarn"):
        if s.mscale is not None and s.mscale_all_dim is not None:
            scale *= _yarn_mscale(s.factor, s.mscale) / _yarn_mscale(
                s.factor, s.mscale_all_dim
            )
        else:
            scale *= _yarn_mscale(s.factor) * s.attn_factor
    cos = np.cos(freqs) * scale
    sin = np.sin(freqs) * scale
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,  # [T, K, D]
    positions: jax.Array,  # [T], or [3, T] for mrope
    cos_table: jax.Array,  # [L, rd/2]
    sin_table: jax.Array,
    *,
    rotary_dim: int,
    interleaved: bool = False,
    mrope_section: tuple[int, ...] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Apply rotary embedding (HF 'neox' split-half convention by default;
    ``interleaved=True`` is GPT-J style, reference rotary.rs is_neox flag).

    mrope (reference rotary.rs mrope scaling + models/qwen2_vl.rs): with
    ``positions`` of shape [3, T] (temporal/height/width) each frequency
    section gathers cos/sin at its own axis' positions — a static
    concat of three table gathers, fully fused by XLA."""
    if positions.ndim == 2:
        assert mrope_section is not None, "3-axis positions need sections"
        c3 = cos_table[positions]  # [3, T, rd/2]
        s3 = sin_table[positions]
        lo = 0
        cs, ss = [], []
        for ax, n in enumerate(mrope_section):
            cs.append(c3[ax, :, lo : lo + n])
            ss.append(s3[ax, :, lo : lo + n])
            lo += n
        cos = jnp.concatenate(cs, axis=-1)[:, None, :]
        sin = jnp.concatenate(ss, axis=-1)[:, None, :]
    else:
        cos = cos_table[positions][:, None, :]  # [T, 1, rd/2]
        sin = sin_table[positions][:, None, :]

    def rot(x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xr, xpass = x[..., :rotary_dim], x[..., rotary_dim:]
        xr = xr.astype(jnp.float32)
        if interleaved:
            x1 = xr[..., 0::2]
            x2 = xr[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
        else:
            half = rotary_dim // 2
            x1 = xr[..., :half]
            x2 = xr[..., half:]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        out = out.astype(dtype)
        if xpass.shape[-1]:
            out = jnp.concatenate([out, xpass], axis=-1)
        return out

    return rot(q), rot(k)
