"""vllm_rust_tpu — a TPU-native LLM inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
vasia123/vllm-rust (paged KV cache, continuous batching, speculative
decoding, broad quantization, OpenAI/Anthropic-compatible serving),
designed TPU-first: SPMD over device meshes, static bucketed shapes, one
unified jitted step for mixed chunked-prefill + decode, Pallas kernels
for paged attention and fused dequant-matmul.
"""

__version__ = "0.1.0"

from .config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "SchedulerConfig",
    "__version__",
]
