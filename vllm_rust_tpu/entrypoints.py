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
        speculative: "SpeculativeConfig | dict | None" = None,
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
    ):
        if model in _DUMMY_CONFIGS:
            model_cfg = _DUMMY_CONFIGS[model]()
            from .models import from_config

            m = from_config(model_cfg, dtype=dtype or jnp.float32)
            params = m.init_params(jax.random.PRNGKey(seed))
            tokenizer = MockTokenizer(model_cfg.vocab_size)
        else:
            m, params, model_cfg = load_model(
                model, dtype=dtype, dummy=dummy_weights, seed=seed
            )
            tokenizer = load_tokenizer(resolve_model_path(model))

        if max_model_len is None:
            max_model_len = min(model_cfg.max_position_embeddings, 8192)

        if num_pages is None:
            if kv_cache_memory_bytes is None:
                # modest default: enough for max_num_seqs full-length seqs,
                # capped at 4 GiB worth of pages
                cache = CacheConfig.from_memory_budget(
                    4 << 30, model_cfg, page_size=page_size, kv_dtype=kv_cache_dtype
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
            ),
            max_model_len=max_model_len,
            seed=seed,
            fetch_interval=fetch_interval,
            tensor_parallel_size=tensor_parallel_size,
            data_parallel_size=data_parallel_size,
        )
        if isinstance(speculative, dict):
            speculative = SpeculativeConfig(**speculative)
        cfg.speculative = speculative
        if speculative is not None:
            from .spec_decode import NgramProposer
            from .spec_decode.engine import SpecLLMEngine

            if speculative.method != "ngram":
                raise NotImplementedError(
                    f"speculative method {speculative.method} not yet available"
                )
            proposer = NgramProposer(
                num_draft_tokens=speculative.num_draft_tokens,
                min_ngram=speculative.min_ngram,
                max_ngram=speculative.max_ngram,
            )
            self.engine = SpecLLMEngine(
                m, params, cfg, tokenizer=tokenizer, proposer=proposer
            )
        else:
            self.engine = LLMEngine(m, params, cfg, tokenizer=tokenizer)
        self.tokenizer = tokenizer

    def generate(
        self,
        prompts: list[str | list[int]] | str,
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, str):
            prompts = [prompts]
        return self.engine.generate(prompts, sampling_params)
