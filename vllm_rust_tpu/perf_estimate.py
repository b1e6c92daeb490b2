"""Roofline performance estimator.

Reference: crates/core/src/perf_estimate/ (roofline.rs:119 TTFT/tok/s
estimator, GPU profile detection, VRAM fitness) backing the admin
"will it fit" endpoints (server/api/admin/estimate.rs:19-22). TPU
version: chip profiles from public specs; decode is HBM-bandwidth-bound
(weights + KV read per token), prefill is MXU-flops-bound.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from .config import ModelConfig


@dataclass(frozen=True)
class ChipProfile:
    name: str
    hbm_gib: float
    hbm_gbps: float  # GB/s
    bf16_tflops: float


# public spec sheets
CHIP_PROFILES = {
    "v4": ChipProfile("TPU v4", 32, 1228, 275),
    "v5e": ChipProfile("TPU v5e", 16, 819, 197),
    "v5p": ChipProfile("TPU v5p", 95, 2765, 459),
    "v6e": ChipProfile("TPU v6e", 32, 1640, 918),
}

_DTYPE_BYTES = {
    "bfloat16": 2.0, "float16": 2.0, "float32": 4.0,
    "fp8": 1.0, "int8": 1.0, "awq": 0.5, "gptq": 0.5, "int4": 0.5,
    "gguf_q4k": 0.5625,  # 4.5 bpw
}


def detect_chip() -> ChipProfile:
    """Profile the attached device (reference: GPU detect)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    for key, prof in CHIP_PROFILES.items():
        if key in kind:
            return prof
    if "v5 lite" in kind or "v5litepod" in kind:
        return CHIP_PROFILES["v5e"]
    return CHIP_PROFILES["v5e"]


@dataclass
class ModelProfile:
    num_params: float
    weight_bytes: float
    kv_bytes_per_token: float

    @staticmethod
    def from_config(
        cfg: ModelConfig, weight_dtype: str = "bfloat16", kv_dtype: str = "auto"
    ) -> "ModelProfile":
        h, L = cfg.hidden_size, cfg.num_hidden_layers
        inter = cfg.intermediate_size
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        attn = h * (nh * hd) + 2 * h * (nkv * hd) + (nh * hd) * h
        if cfg.num_experts:
            ffn = 3 * h * (cfg.moe_intermediate_size or inter) * cfg.num_experts
        else:
            ffn = 3 * h * inter
        embed = cfg.vocab_size * h * (1 if cfg.tie_word_embeddings else 2)
        n_params = L * (attn + ffn) + embed
        wb = _DTYPE_BYTES.get(weight_dtype, 2.0)
        kvb = 1.0 if kv_dtype in ("fp8_e4m3", "fp8_e5m2", "int8") else 2.0
        kv_per_tok = 2 * nkv * hd * L * kvb
        return ModelProfile(n_params, n_params * wb, kv_per_tok)


def estimate(
    cfg: ModelConfig,
    *,
    chip: ChipProfile | None = None,
    weight_dtype: str = "bfloat16",
    kv_dtype: str = "auto",
    prompt_tokens: int = 512,
    context_tokens: int = 1024,
    batch_size: int = 1,
    mfu: float = 0.5,
    bw_efficiency: float = 0.8,
) -> dict:
    """Roofline TTFT / decode tok/s / HBM fitness (reference roofline.rs).

    Decode: every token reads all weights once (amortized over the batch)
    plus the sequence's KV; prefill: 2*N_params flops per token at `mfu`
    MXU utilization."""
    chip = chip or detect_chip()
    mp = ModelProfile.from_config(cfg, weight_dtype, kv_dtype)

    bw = chip.hbm_gbps * 1e9 * bw_efficiency
    # decode step time: weights once per step + per-seq KV reads
    step_bytes = mp.weight_bytes + batch_size * context_tokens * mp.kv_bytes_per_token
    step_s = step_bytes / bw
    decode_tps_per_seq = 1.0 / step_s
    aggregate_tps = batch_size / step_s

    prefill_flops = 2.0 * mp.num_params * prompt_tokens
    ttft_s = prefill_flops / (chip.bf16_tflops * 1e12 * mfu) + step_s

    hbm = chip.hbm_gib * (1 << 30)
    kv_budget = hbm * 0.9 - mp.weight_bytes
    max_kv_tokens = max(0, int(kv_budget / mp.kv_bytes_per_token))
    fits = mp.weight_bytes < hbm * 0.9

    return {
        "chip": asdict(chip),
        "model": {
            "num_params": mp.num_params,
            "weight_gib": mp.weight_bytes / (1 << 30),
            "kv_bytes_per_token": mp.kv_bytes_per_token,
        },
        "fits": fits,
        "max_kv_tokens": max_kv_tokens,
        "ttft_s": ttft_s,
        "decode_tok_s_per_seq": decode_tps_per_seq,
        "aggregate_tok_s": aggregate_tps,
        "assumptions": {
            "mfu": mfu,
            "bw_efficiency": bw_efficiency,
            "prompt_tokens": prompt_tokens,
            "context_tokens": context_tokens,
            "batch_size": batch_size,
        },
    }
