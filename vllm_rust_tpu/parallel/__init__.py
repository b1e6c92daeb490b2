"""Mesh + sharding: SPMD parallelism.

Reference: crates/core/src/distributed/ (ProcessGroup/NCCL/parallel
layers/lockstep TP worker loop — SURVEY.md §2.8). On TPU the entire
subsystem collapses into `jax.sharding`: a Mesh with named axes, param
PartitionSpecs per weight role, and XLA-inserted collectives over ICI.
No NCCL bootstrap, no broadcast protocol, no per-arch parallel layers.
"""

from .mesh import make_mesh, shard_params, kv_pages_sharding, PARAM_RULES

__all__ = ["make_mesh", "shard_params", "kv_pages_sharding", "PARAM_RULES"]
