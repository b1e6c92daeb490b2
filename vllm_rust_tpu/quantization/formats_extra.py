"""Additional quantization formats: ModelOpt (FP8 / NVFP4), FBGEMM-FP8,
PTPC-FP8, Quark, experts_int8, moe_wna16, checkpoint KV scales.

Reference: quantization/{modelopt,fbgemm_fp8,ptpc_fp8,quark,
experts_int8,moe_wna16,kv_cache_scales}.rs (README.md:133-141 "other
formats"). The FP8 families share the fp8 storage path (fp8_e4m3 is a
native TPU dtype); NVFP4 and wna16 experts dequantize to dense on host
at load; experts_int8 is an ONLINE quantization applied after load.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .mxfp4 import FP4_VALUES


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------


def resolve_method(hf_config: dict) -> str | None:
    """Normalize quantization_config across vendor formats (reference
    quantization/detection.rs:16)."""
    qc = hf_config.get("quantization_config") or {}
    method = (qc.get("quant_method") or "").lower().replace("-", "_")
    if method == "modelopt":
        algo = (qc.get("quant_algo") or qc.get("quantization")
                or "FP8").upper()
        return "modelopt_fp4" if "FP4" in algo else "modelopt_fp8"
    if method == "quark":
        # Quark nests the scheme under global_quant_config
        g = qc.get("global_quant_config") or {}
        w = (g.get("weight") or {}).get("dtype", "fp8_e4m3")
        if "fp8" in str(w):
            return "quark_fp8"
        raise NotImplementedError(f"quark scheme {w!r} not supported")
    if method == "torchao":
        # torchao checkpoints store standard bf16/f32 tensors; the library
        # applies its transforms at inference time. Serving them dense is
        # the reference behavior (quantization/torchao.rs:1-16 — detect,
        # load as standard tensors, standard matmul).
        return None
    if method in ("inc", "auto_round"):
        # INC / AutoRound are meta-configs routing to gptq or awq by
        # packing_format (reference quantization/inc.rs IncBackend)
        backend = str(qc.get("backend") or qc.get("vllm_backend") or "auto")
        packing = str(qc.get("packing_format") or "auto_round:auto_gptq")
        if "awq" in backend or ("awq" in packing and "awq" not in backend):
            return "awq"
        return "gptq"
    return method or None


# FP8 variants that reuse the fp8 linear storage verbatim: they differ
# only in scale granularity, which load_fp8_linear already covers
# (per-tensor / per-channel / block).
FP8_ALIASES = {"modelopt_fp8", "fbgemm_fp8", "ptpc_fp8", "quark_fp8"}


# ---------------------------------------------------------------------------
# ModelOpt NVFP4
# ---------------------------------------------------------------------------


def dequant_nvfp4(
    packed: np.ndarray,  # [N, K/2] uint8, two e2m1 codes per byte
    block_scale: np.ndarray,  # [N, K/16] fp8-e4m3 per-16-element block scale
    global_scale: np.ndarray,  # scalar fp32 (weight_scale_2)
) -> np.ndarray:
    """NVFP4: w = e2m1_code * e4m3_block_scale * global_scale
    (reference quantization/modelopt.rs NVFP4 path). Returns [N, K] f32."""
    n, kh = packed.shape
    lo = FP4_VALUES[packed & 0xF]
    hi = FP4_VALUES[packed >> 4]
    vals = np.stack([lo, hi], axis=-1).reshape(n, kh * 2)  # [N, K]
    bs = np.asarray(block_scale)
    if bs.dtype == np.uint8:
        bs = bs.view(np.dtype("float8_e4m3fn"))
    bs = bs.astype(np.float32)
    k = kh * 2
    block = k // bs.shape[1]  # 16 for NVFP4; derived so tiny shapes work
    vals = vals.reshape(n, k // block, block) * bs[:, :, None]
    return (vals.reshape(n, k) * float(np.asarray(global_scale))).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# experts_int8 — online per-channel int8 quantization of stacked experts
# ---------------------------------------------------------------------------


def quantize_experts_int8(expert_params: dict) -> dict:
    """Convert stacked [E, in, out] expert weights to int8 + per-(expert,
    out-channel) scales (reference quantization/experts_int8.rs — online
    quantization at load; halves MoE HBM and doubles effective expert
    bandwidth). The MoE layer dequantizes inside the expert matmul."""

    def q(leaf):
        w = np.asarray(leaf, np.float32)
        amax = np.abs(w).max(axis=1, keepdims=True)  # [E, 1, out]
        scale = np.maximum(amax, 1e-8) / 127.0
        qw = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {
            "qweight": jnp.asarray(qw),
            "scale": jnp.asarray(scale[:, 0, :], jnp.float32),  # [E, out]
        }

    out = {}
    for pname, node in expert_params.items():
        if isinstance(node, dict) and "weight" in node and getattr(
            node["weight"], "ndim", 0
        ) == 3:
            out[pname] = q(node["weight"])
        else:
            out[pname] = node
    return out


def dequant_expert_int8(node: dict) -> jax.Array:
    """[E, in, out] f32 view of an int8-quantized expert stack."""
    return node["qweight"].astype(jnp.float32) * node["scale"][:, None, :]


# ---------------------------------------------------------------------------
# moe_wna16 — AWQ/GPTQ int4 expert weights, dequantized to stacks at load
# ---------------------------------------------------------------------------


def dequant_wna16_expert(
    qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
    fmt: str = "awq",
) -> np.ndarray:
    """One expert's int4 tensor -> dense [K, N] f32 (reference
    quantization/moe_wna16.rs)."""
    if fmt == "awq":
        from .awq import unpack_awq_int32

        q = unpack_awq_int32(qweight)  # [K, N]
        z = unpack_awq_int32(qzeros)  # [K/g, N]
    else:
        from .gptq import unpack_gptq_cols, unpack_gptq_rows

        q = unpack_gptq_rows(qweight)  # [K, N]
        z = unpack_gptq_cols(qzeros) + 1  # gptq zeros are stored -1
    k = q.shape[0]
    g = k // z.shape[0]
    s = np.asarray(scales, np.float32)
    return (q.astype(np.float32) - np.repeat(z, g, axis=0)) * np.repeat(
        s, g, axis=0
    )


# ---------------------------------------------------------------------------
# checkpoint-provided KV cache scales
# ---------------------------------------------------------------------------


def load_kv_cache_scales(
    model_dir_or_cfg, num_layers: int
) -> tuple[float, float] | None:
    """Read pre-calibrated K/V scales (reference
    quantization/kv_cache_scales.rs + server/main.rs:2285 pinning —
    scales MUST pin before engine start, SURVEY.md appendix A.10).

    Accepts a kv_cache_scales.json path/dir ({"kv_cache": {"scaling_factor":
    {layer: s}}} vLLM schema) or an hf config dict with kv_scale entries.
    Returns a single (k_scale, v_scale) — the engine pins one static pair.
    """
    data = None
    if isinstance(model_dir_or_cfg, dict):
        qc = model_dir_or_cfg.get("quantization_config") or {}
        if "kv_cache_scheme" in qc or "kv_scale" in qc:
            s = float(qc.get("kv_scale", 1.0))
            return (s, s)
        return None
    path = model_dir_or_cfg
    if os.path.isdir(path):
        path = os.path.join(path, "kv_cache_scales.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    factors = (data.get("kv_cache") or {}).get("scaling_factor") or {}
    if not factors:
        return None
    # vLLM schema: per-layer (often rank-keyed) scalar factors; pin the max
    # so no layer's cached values clip
    vals = []
    for v in factors.values():
        if isinstance(v, dict):
            vals.extend(float(x) for x in v.values())
        else:
            vals.append(float(v))
    s = max(vals) if vals else 1.0
    return (s, s)
