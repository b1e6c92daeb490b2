"""Engine: continuous-batching loop around one jitted step.

Reference: crates/core/src/engine/ (run_engine_loop strategy.rs:426,
helpers.rs execution bodies, CUDA-graph runner + output pool). The TPU
design collapses the reference's strategy/graph/pool machinery into:
  - one jitted unified step (model forward + gather + sample) with
    donated KV buffers, compiled per (token_bucket, seq_bucket);
  - a pure-Python host loop (scheduler + batch building + detokenize).
"""

from .engine import LLMEngine

__all__ = ["LLMEngine", "DataParallelLLMEngine"]


def __getattr__(name):
    if name == "DataParallelLLMEngine":
        from .dp import DataParallelLLMEngine

        return DataParallelLLMEngine
    raise AttributeError(name)
