"""TPU compute ops: Pallas kernels + jittable references.

Every CUDA kernel in the reference (crates/core/kernels/*.cu, inventory in
SURVEY.md §2.11) maps to an op here, implemented TPU-first: Pallas where a
custom kernel wins, plain XLA where the compiler already fuses optimally
(rmsnorm, rope, activations are XLA-fused into neighboring matmuls — the
reference needed .cu files for those only because of CUDA's eager execution
model).
"""

from .attn_metadata import AttentionMetadata
from .kv_write import write_kv_pages
from .paged_attention import ragged_paged_attention_op

__all__ = [
    "AttentionMetadata",
    "write_kv_pages",
    "ragged_paged_attention_op",
]
