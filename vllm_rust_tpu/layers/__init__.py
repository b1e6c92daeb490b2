"""Functional NN layers.

Re-design of the reference's layer stack (crates/core/src/layers/ — RmsNorm
normalization.rs:33, RotaryEmbedding rotary.rs:37, SwiGluMlp mlp.rs:60,
AttentionBlock block.rs:630) as pure functions over param pytrees: no module
state, so the whole model is one jittable function and sharding is applied
to the param tree with NamedSharding.
"""

from .norm import rms_norm
from .rotary import RotarySpec, apply_rope, compute_rope_tables
from .attention import AttentionSpec, attention_block
from .mlp import swiglu_mlp

__all__ = [
    "rms_norm",
    "RotarySpec",
    "apply_rope",
    "compute_rope_tables",
    "AttentionSpec",
    "attention_block",
    "swiglu_mlp",
]
