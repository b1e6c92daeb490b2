"""Paged KV cache management.

Reference: crates/core/src/kv_cache/ (BlockPool block_pool.rs:12,
BlockTable block_table.rs:5, KVCacheManager mod.rs:147). Host-side page
accounting is pure Python (it is control-plane work, off the device hot
path); device pools live in the engine as donated jit buffers.
"""

from .block_pool import BlockPool, BlockTable
from .manager import KVCacheManager

__all__ = ["BlockPool", "BlockTable", "KVCacheManager"]
