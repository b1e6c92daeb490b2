"""Typed configuration objects.

Mirrors the capability surface of the reference's config layer
(reference: crates/core/src/config.rs — ModelConfig parsed from HF
config.json with an `extra` map; crates/core/src/scheduler.rs:335
SchedulerConfig; crates/core/src/kv_cache/config.rs:249 CacheConfig;
crates/core/src/engine/types.rs:164 EngineConfig) re-designed for a
JAX/XLA engine: static shape buckets replace CUDA-graph batch descriptors.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any

from .utils import cdiv


# ---------------------------------------------------------------------------
# Model config
# ---------------------------------------------------------------------------


@dataclass
class RopeScalingConfig:
    """RoPE scaling variants (reference: layers/rotary.rs:75 scaling enum)."""

    rope_type: str = "default"  # default|linear|dynamic|yarn|llama3|longrope
    factor: float = 1.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int | None = None
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    attn_factor: float = 1.0
    mscale: float | None = None
    mscale_all_dim: float | None = None
    extrapolation_factor: float = 1.0
    # 3-axis multimodal RoPE half-dim counts (Qwen2-VL family)
    mrope_section: tuple[int, ...] | None = None

    @staticmethod
    def from_hf(d: dict | None) -> "RopeScalingConfig | None":
        if not d:
            return None
        kind = d.get("rope_type", d.get("type", "default"))
        cfg = RopeScalingConfig(rope_type=kind)
        for f in dataclasses.fields(RopeScalingConfig):
            if f.name in d and f.name != "rope_type":
                setattr(cfg, f.name, d[f.name])
        if cfg.mrope_section is not None:
            cfg.mrope_section = tuple(cfg.mrope_section)
        return cfg


@dataclass
class ModelConfig:
    """Parsed HF config.json.

    Only common decoder fields are first-class; everything else lands in
    ``extra`` (same approach as reference config.rs `extra` map).
    """

    architectures: list[str] = field(default_factory=lambda: ["LlamaForCausalLM"])
    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int | None = None
    head_dim: int | None = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: RopeScalingConfig | None = None
    partial_rotary_factor: float = 1.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    o_proj_bias: bool | None = None  # some archs bias only qkv
    qk_norm: bool = False  # per-head RMSNorm on q/k (Qwen3, Gemma3)
    sliding_window: int | None = None
    # layer_types: per-layer attention kind, e.g. ["full_attention",
    # "sliding_attention", ...] (Gemma3/Qwen3-Next style)
    layer_types: list[str] | None = None
    attn_logit_softcapping: float | None = None
    final_logit_softcapping: float | None = None
    hidden_act: str = "silu"
    eos_token_id: int | list[int] | None = None
    bos_token_id: int | None = None
    dtype: str = "bfloat16"
    # embedding multiplier (Gemma scales embeddings by sqrt(hidden))
    embedding_multiplier: float | None = None
    logits_scaling: float | None = None
    # MoE fields
    num_experts: int | None = None
    num_experts_per_tok: int | None = None
    moe_intermediate_size: int | None = None
    num_shared_experts: int | None = None
    norm_topk_prob: bool = False
    decoder_sparse_step: int = 1
    mlp_only_layers: list[int] = field(default_factory=list)
    shared_expert_intermediate_size: int | None = None
    scoring_func: str = "softmax"
    routed_scaling_factor: float | None = None
    n_group: int | None = None
    topk_group: int | None = None
    first_k_dense_replace: int = 0
    # MLA (DeepseekV2/V3)
    q_lora_rank: int | None = None
    kv_lora_rank: int | None = None
    qk_nope_head_dim: int | None = None
    qk_rope_head_dim: int | None = None
    v_head_dim: int | None = None
    # everything not recognized
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads

    @property
    def architecture(self) -> str:
        return self.architectures[0] if self.architectures else "LlamaForCausalLM"

    @property
    def eos_token_ids(self) -> list[int]:
        if self.eos_token_id is None:
            return []
        if isinstance(self.eos_token_id, int):
            return [self.eos_token_id]
        return list(self.eos_token_id)

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        kwargs: dict[str, Any] = {}
        extra: dict[str, Any] = {}
        d = dict(d)
        # HF uses torch_dtype; also accept dtype
        if "torch_dtype" in d:
            d.setdefault("dtype", d.pop("torch_dtype"))
        # Qwen3 moe naming
        if "num_local_experts" in d:
            d.setdefault("num_experts", d.pop("num_local_experts"))
        if "n_routed_experts" in d:
            d.setdefault("num_experts", d.pop("n_routed_experts"))
        if "n_shared_experts" in d:
            d.setdefault("num_shared_experts", d.pop("n_shared_experts"))
        for k, v in d.items():
            if k == "rope_scaling":
                kwargs["rope_scaling"] = RopeScalingConfig.from_hf(v)
            elif k in known and k != "extra":
                kwargs[k] = v
            else:
                extra[k] = v
        cfg = ModelConfig(**kwargs)
        cfg.extra = extra
        return cfg

    @staticmethod
    def from_json_file(path: str) -> "ModelConfig":
        with open(path) as f:
            return ModelConfig.from_dict(json.load(f))

    @staticmethod
    def from_pretrained(model_path: str) -> "ModelConfig":
        return ModelConfig.from_json_file(os.path.join(model_path, "config.json"))

    def uses_sliding_window_layer(self, layer_idx: int) -> bool:
        """Whether a given layer uses sliding-window attention.

        Mirrors the reference's per-layer heterogeneous KV spec
        (kv_cache/config.rs KvLayerSpec + ADR 0021).
        """
        if self.layer_types is not None:
            return self.layer_types[layer_idx] == "sliding_attention"
        return False

    def layer_sliding_window(self, layer_idx: int) -> int | None:
        if self.sliding_window and self.uses_sliding_window_layer(layer_idx):
            return self.sliding_window
        if self.sliding_window and self.layer_types is None and self.model_type in (
            "mistral",
        ):
            return self.sliding_window
        return None


# ---------------------------------------------------------------------------
# Cache config
# ---------------------------------------------------------------------------


@dataclass
class CacheConfig:
    """KV cache geometry (reference: kv_cache/config.rs:249).

    The KV pool is ``num_pages`` physical pages of ``page_size`` tokens.
    Page 0 is reserved as the *null page*: padded tokens write their K/V
    there and padded page-table entries point at it, so the jitted step
    never needs dynamic shapes for partial batches.
    """

    num_pages: int = 512
    page_size: int = 16
    kv_dtype: str = "auto"  # auto | fp8_e4m3 | fp8_e5m2 | int8
    # page-id stripes for decode context parallelism (set by the engine
    # from decode_context_parallel_size; allocator balances stripes)
    dcp_stripes: int = 1
    # static K/V quantization scales (reference kv_cache/quantization.rs
    # calibrates on first write then pins; static scales keep cached bytes
    # valid for the cache lifetime — contract #10). stored = value/scale.
    k_scale: float = 1.0
    v_scale: float = 1.0
    # first-write calibration (r4): when serving a quantized KV dtype with
    # no checkpoint scales (k/v_scale left at 1.0), measure per-batch K/V
    # amax on the first prefill and pin amax/qmax as the scales.
    kv_calibrate: bool = True

    @property
    def num_usable_pages(self) -> int:
        return self.num_pages - 1  # page 0 reserved (null page)

    def pages_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.page_size)

    @staticmethod
    def from_memory_budget(
        budget_bytes: int,
        model: "ModelConfig",
        page_size: int = 16,
        kv_dtype: str = "auto",
    ) -> "CacheConfig":
        """Size the pool from an HBM byte budget (reference ADR 0024:
        measure non-KV memory first, then give the rest to KV)."""
        bytes_per_el = 1 if kv_dtype in ("fp8_e4m3", "fp8_e5m2", "int8") else 2
        per_page = (
            2
            * model.num_key_value_heads
            * model.head_dim
            * page_size
            * model.num_hidden_layers
            * bytes_per_el
        )
        num_pages = max(2, budget_bytes // per_page)
        return CacheConfig(num_pages=int(num_pages), page_size=page_size, kv_dtype=kv_dtype)


# ---------------------------------------------------------------------------
# Scheduler config
# ---------------------------------------------------------------------------


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler knobs (reference: scheduler.rs:335).

    Chunked prefill is ON by default — required for the admission guarantee
    (reference Appendix-A contract #1: any admitted prompt must eventually be
    schedulable)."""

    max_num_seqs: int = 64
    max_tokens_per_step: int = 1024
    enable_chunked_prefill: bool = True
    max_num_partial_prefills: int = 1
    policy: str = "fcfs"  # fcfs | priority
    preemption_mode: str = "recompute"


# ---------------------------------------------------------------------------
# Speculative decoding config
# ---------------------------------------------------------------------------


@dataclass
class SpeculativeConfig:
    """Reference: engine/types.rs SpeculativeConfig + AcceptanceMethod."""

    method: str = "ngram"  # ngram | suffix | draft_model | eagle | medusa | mtp
    num_draft_tokens: int = 4
    # "sample" = lossless (greedy-exact / rejection); "typical" = typical
    # acceptance (reference AcceptanceMethod, engine/types.rs:133)
    acceptance_method: str = "sample"
    # ngram / suffix
    min_ngram: int = 1
    max_ngram: int = 4
    # draft_model | eagle | medusa | mtp: checkpoint path
    draft_model: str | None = None


# ---------------------------------------------------------------------------
# Engine config
# ---------------------------------------------------------------------------

DEFAULT_TOKEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)
DEFAULT_SEQ_BUCKETS = (8, 16, 32, 64, 128, 256)


@dataclass
class EngineConfig:
    """Top-level engine configuration (reference: engine/types.rs:164).

    Shape buckets replace the reference's CUDA-graph BatchDescriptor
    machinery: each (token_bucket, seq_bucket) pair is one XLA compilation,
    warmed up at boot."""

    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    max_model_len: int = 4096
    token_buckets: tuple[int, ...] = DEFAULT_TOKEN_BUCKETS
    seq_buckets: tuple[int, ...] = DEFAULT_SEQ_BUCKETS
    attention_backend: str = "auto"  # auto | pallas | ref | jax
    enable_prefix_caching: bool = False
    seed: int = 0
    # steps per token-ring cycle: results are fetched from the device in
    # one transfer every `fetch_interval` steps (ADR 0008/0017 analogue).
    # Larger = higher throughput (round-trip amortized), smaller = lower
    # stop-condition latency. Minimum 2. 0 = AUTO (r5): run at the
    # throughput bound (32) but rotate whenever the open cycle is older
    # than `itl_budget_ms` or any latency signal fires (first token /
    # device stop / budget-reached / blocked seq) — closes the
    # fi2-vs-fi32 tradeoff table without an operator knob. The ring
    # buffer is a fixed 64 rows regardless, so fi is a pure runtime
    # policy (no per-fi recompiles).
    fetch_interval: int = 8
    # auto-fi rotation deadline: an open cycle older than this is
    # rotated so a steadily-decoding stream sees tokens at least this
    # often (paced SSE smooths within the burst)
    itl_budget_ms: float = 45.0
    # multi-step decode windows (engine/step_fn.py n_steps): one
    # dispatch runs up to this many decode steps with metadata evolved
    # on device — removes the per-step packed-metadata H2D (~2.7 ms
    # each over the axon tunnel, the largest c=16 decode cost) and the
    # per-step dispatch. 1 = off. Reference: multi_step_count decode
    # (engine/strategy.rs hot loop).
    decode_window: int = 8
    # token-ring buffer pool size (r4): the host may lag the device by up
    # to ring_buffers-1 UNFETCHED cycles, so result transfers overlap
    # dispatch instead of stalling it (the r3 triple-buffer blocked on
    # the ~25 ms tunnel round trip every cycle — at fetch_interval=2
    # that collapsed mixed/latency serving to 82 tok/s). 0 = auto:
    # enough depth to cover one round trip at short fetch intervals.
    ring_buffers: int = 0
    speculative: "SpeculativeConfig | None" = None
    # SPMD parallelism (reference distributed/process_group.rs ParallelConfig
    # — here just mesh axis sizes; XLA owns the collectives)
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # pipeline stages (reference config.rs pipeline_parallel_size);
    # served via parallel/pipeline.py PipelineRunner
    pipeline_parallel_size: int = 1
    # decode context parallelism: KV pages striped over an "sp" mesh
    # axis, per-rank local attention + LSE merge (reference
    # distributed/context_parallel.rs; ops/dcp.py)
    decode_context_parallel_size: int = 1

    def __post_init__(self):
        # Clamp bucket lists to configured maxima so we never compile
        # shapes the scheduler cannot produce.
        tb = [b for b in self.token_buckets if b <= self.scheduler.max_tokens_per_step]
        if not tb or tb[-1] < self.scheduler.max_tokens_per_step:
            tb.append(self.scheduler.max_tokens_per_step)
        self.token_buckets = tuple(sorted(set(tb)))
        sb = [b for b in self.seq_buckets if b <= self.scheduler.max_num_seqs]
        if not sb or sb[-1] < self.scheduler.max_num_seqs:
            sb.append(self.scheduler.max_num_seqs)
        self.seq_buckets = tuple(sorted(set(sb)))

    @property
    def pages_per_seq(self) -> int:
        return cdiv(self.max_model_len, self.cache.page_size)
