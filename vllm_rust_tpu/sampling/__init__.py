"""Sampling: on-device token selection.

Reference: crates/core/src/sampling/ (CPU sampler mod.rs:38-120, GPU
sampler gpu.rs — ADR 0007/0017: keep sampling on device so only one
int per sequence crosses to the host each step). Here the sampler is a
jitted function fused into the engine step; the host sees only the
sampled token ids [S] (+ optional logprobs).
"""

from .sampler import SamplerInputs, sample_tokens

__all__ = ["SamplerInputs", "sample_tokens"]
