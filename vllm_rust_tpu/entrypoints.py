"""High-level offline API.

Reference: the `generate` CLI one-shot path (crates/server/src/main.rs:3447
run_generate) and the library-level start_engine+generate flow
(crates/core/src/engine/mod.rs:110-410). `LLM` wires loader → model →
engine with sane defaults; the HTTP server builds on the same pieces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from .engine import LLMEngine
from .loader import load_model, resolve_model_path
from .request import RequestOutput, SamplingParams
from .testing import tiny_llama_config, tiny_qwen3_config
from .tokenizer import MockTokenizer, load_tokenizer

_DUMMY_CONFIGS = {
    "dummy:tiny-llama": tiny_llama_config,
    "dummy:tiny-qwen3": tiny_qwen3_config,
}


class LLM:
    def __init__(
        self,
        model: str,
        *,
        max_model_len: int | None = None,
        max_num_seqs: int = 64,
        max_tokens_per_step: int = 2048,
        kv_cache_memory_bytes: int | None = None,
        num_pages: int | None = None,
        page_size: int = 16,
        kv_cache_dtype: str = "auto",
        dtype=None,
        dummy_weights: bool = False,
        seed: int = 0,
        fetch_interval: int = 8,
        ring_buffers: int = 0,
        speculative: "SpeculativeConfig | dict | None" = None,
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
        pipeline_parallel_size: int = 1,
        decode_context_parallel_size: int = 1,
        quantization: str | None = None,
        tokenizer: str | None = None,
        enable_chunked_prefill: bool = True,
        max_num_partial_prefills: int = 1,
        scheduling_policy: str = "fcfs",
        preemption_mode: str = "recompute",
        swap_space_gb: float | None = None,
        enable_prefix_caching: bool = False,
        attention_backend: str = "auto",
        enable_lora: bool = False,
        max_loras: int = 8,
        max_lora_rank: int = 16,
    ):
        if pipeline_parallel_size > 1:
            raise NotImplementedError(
                "pipeline-parallel serving rides PipelineRunner "
                "(parallel/pipeline.py); the LLM entrypoint supports "
                "tensor_parallel_size / data_parallel_size"
            )
        tokenizer_path = tokenizer
        if model in _DUMMY_CONFIGS:
            model_cfg = _DUMMY_CONFIGS[model]()
            from .models import from_config

            m = from_config(model_cfg, dtype=dtype or jnp.float32)
            params = m.init_params(jax.random.PRNGKey(seed))
            tokenizer = MockTokenizer(model_cfg.vocab_size)
        else:
            m, params, model_cfg = load_model(
                model, dtype=dtype, dummy=dummy_weights, seed=seed,
                quantization=quantization,
            )
            tokenizer = load_tokenizer(
                resolve_model_path(tokenizer_path or model)
            )

        if max_model_len is None:
            max_model_len = min(model_cfg.max_position_embeddings, 8192)

        if num_pages is None:
            if kv_cache_memory_bytes is None:
                # ADR 0024: profile the device (params resident + one
                # largest-bucket forward) and give the remaining HBM to KV;
                # backends without memory stats fall back to a 4 GiB default
                from .kv_cache.sizing import profile_kv_budget
                from .utils import cdiv

                budget = None
                try:
                    budget = profile_kv_budget(
                        m, params,
                        max_tokens_per_step=max_tokens_per_step,
                        max_num_seqs=max_num_seqs,
                        pages_per_seq=cdiv(max_model_len, page_size),
                        page_size=page_size,
                    )
                except Exception as e:  # profiling must never block boot
                    import logging

                    logging.getLogger(__name__).warning(
                        "profiled KV sizing failed (%s); using default", e
                    )
                cache = CacheConfig.from_memory_budget(
                    budget if budget else 4 << 30,
                    model_cfg, page_size=page_size, kv_dtype=kv_cache_dtype,
                )
            else:
                cache = CacheConfig.from_memory_budget(
                    kv_cache_memory_bytes,
                    model_cfg,
                    page_size=page_size,
                    kv_dtype=kv_cache_dtype,
                )
        else:
            cache = CacheConfig(
                num_pages=num_pages, page_size=page_size, kv_dtype=kv_cache_dtype
            )

        cfg = EngineConfig(
            model=model_cfg,
            cache=cache,
            scheduler=SchedulerConfig(
                max_num_seqs=max_num_seqs,
                max_tokens_per_step=max_tokens_per_step,
                enable_chunked_prefill=enable_chunked_prefill,
                max_num_partial_prefills=max_num_partial_prefills,
                policy=scheduling_policy,
                preemption_mode=preemption_mode,
            ),
            max_model_len=max_model_len,
            seed=seed,
            fetch_interval=fetch_interval,
            ring_buffers=ring_buffers,
            attention_backend=attention_backend,
            enable_prefix_caching=enable_prefix_caching,
            tensor_parallel_size=tensor_parallel_size,
            data_parallel_size=data_parallel_size,
            pipeline_parallel_size=pipeline_parallel_size,
            decode_context_parallel_size=decode_context_parallel_size,
        )
        if isinstance(speculative, dict):
            speculative = SpeculativeConfig(**speculative)
        cfg.speculative = speculative
        if speculative is not None:
            from .spec_decode.engine import SpecLLMEngine

            proposer = _build_proposer(speculative, model_cfg, dtype, seed)
            self.engine = SpecLLMEngine(
                m, params, cfg, tokenizer=tokenizer, proposer=proposer,
                acceptance_method=speculative.acceptance_method,
            )
        elif cfg.data_parallel_size > 1:
            from .engine.dp import DataParallelLLMEngine

            self.engine = DataParallelLLMEngine(
                m, params, cfg, tokenizer=tokenizer
            )
        else:
            self.engine = LLMEngine(m, params, cfg, tokenizer=tokenizer)
        if swap_space_gb is not None and getattr(
            getattr(self.engine, "kv", None), "offload", None
        ) is not None:
            self.engine.kv.offload.max_bytes = int(swap_space_gb * (1 << 30))
        if enable_lora and hasattr(self.engine, "enable_lora"):
            self.engine.enable_lora(max_loras=max_loras, max_rank=max_lora_rank)
        self.tokenizer = tokenizer

    def generate(
        self,
        prompts: list[str | list[int]] | str,
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, str):
            prompts = [prompts]
        return self.engine.generate(prompts, sampling_params)


def _build_proposer(spec: SpeculativeConfig, model_cfg, dtype, seed):
    """Construct the configured draft proposer (reference: engine/mod.rs
    start_engine_with_draft / _with_proposer dispatch)."""
    from . import spec_decode as sd

    k = spec.num_draft_tokens
    if spec.method == "ngram":
        return sd.NgramProposer(
            num_draft_tokens=k, min_ngram=spec.min_ngram, max_ngram=spec.max_ngram
        )
    if spec.method == "suffix":
        return sd.SuffixProposer(num_draft_tokens=k, min_match=spec.min_ngram)
    if spec.method == "draft_model":
        if not spec.draft_model:
            raise ValueError("speculative.draft_model path required")
        dm, dparams, _ = load_model(spec.draft_model, dtype=dtype, seed=seed)
        return sd.DraftModelProposer(dm, dparams, num_draft_tokens=k)
    if spec.method in ("medusa", "eagle", "mtp"):
        if not spec.draft_model:
            raise ValueError(f"speculative.draft_model path required for {spec.method}")
        path = resolve_model_path(spec.draft_model)
        draft_cfg = ModelConfig.from_pretrained(path)
        if spec.method == "medusa":
            ex = draft_cfg.extra
            p = sd.MedusaProposer(
                draft_cfg,
                num_heads=min(k, int(ex.get("medusa_num_heads", k))),
                num_layers_per_head=int(ex.get("medusa_num_layers", 1)),
                dtype=dtype or jnp.bfloat16,
            )
        else:
            cls = sd.EagleProposer if spec.method == "eagle" else sd.MtpProposer
            p = cls(draft_cfg, num_draft_tokens=k, dtype=dtype or jnp.bfloat16)
        from .loader import iter_safetensors

        p.load_weights(iter_safetensors(path))
        return p
    raise ValueError(f"unknown speculative method {spec.method}")


class Encoder:
    """Offline API for encoder (BERT-family) models: embeddings, score,
    rerank, classify (reference: the embeddings/score endpoints backed by
    encoder archs)."""

    def __init__(
        self,
        model: str,
        *,
        dtype=None,
        dummy_weights: bool = False,
        seed: int = 0,
        max_batch_tokens: int = 8192,
    ):
        from .engine.encoder import EncoderRunner

        m, params, model_cfg = load_model(
            model, dtype=dtype or jnp.float32, dummy=dummy_weights, seed=seed
        )
        if not hasattr(m, "encode"):
            raise ValueError(
                f"{model_cfg.architecture} is a decoder model — use LLM"
            )
        try:
            tokenizer = load_tokenizer(resolve_model_path(model))
        except Exception:
            tokenizer = MockTokenizer(model_cfg.vocab_size)
        buckets = tuple(
            b for b in (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
            if b <= max_batch_tokens
        )
        self.runner = EncoderRunner(
            m, params, tokenizer, token_buckets=buckets,
            max_batch_tokens=max_batch_tokens,
        )
        self.tokenizer = tokenizer
        self.config = model_cfg

    def embed(self, inputs, **kw):
        return self.runner.embed(inputs, **kw)

    def score(self, pairs):
        return self.runner.score(pairs)

    def rerank(self, query, documents):
        return self.runner.rerank(query, documents)

    def classify(self, inputs):
        return self.runner.classify(inputs)


def is_encoder_model(model: str) -> bool:
    """Best-effort arch sniff for --task auto (server CLI)."""
    try:
        cfg = ModelConfig.from_pretrained(resolve_model_path(model))
    except Exception:
        return False
    return any(
        a.endswith(("Model", "ForMaskedLM", "ForSequenceClassification"))
        and ("Bert" in a or "Roberta" in a)
        for a in cfg.architectures
    )
