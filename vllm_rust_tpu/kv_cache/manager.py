"""KV cache manager: pool + per-request tables + device pool creation.

Reference: kv_cache/mod.rs:147 KVCacheManager (BlockPool + per-layer
CacheEngines; heterogeneous layer_to_engine map, ADR 0021). TPU design:
one device array per layer, shape [num_pages, page_size, 2*kv_heads,
head_dim]; heterogeneous models (sliding/full, KV-sharing) share the SAME
page pool — a page is a unit of accounting across all layers, as in the
reference's unified allocator.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import CacheConfig
from ..request import Sequence
from .block_pool import BlockPool, BlockTable

_KV_DTYPES = {
    "auto": None,  # model dtype
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
    "int8": jnp.int8,
}


class KVCacheManager:
    def __init__(self, config: CacheConfig, kv_head_info: list[tuple[int, int]]):
        self.config = config
        self.kv_head_info = kv_head_info
        self.pool = BlockPool(config.num_pages, config.page_size)
        self.tables: dict[str, BlockTable] = {}

    # -- device pools -------------------------------------------------------

    def kv_cache_dtype(self, model_dtype: Any) -> Any:
        dt = _KV_DTYPES[self.config.kv_dtype]
        return model_dtype if dt is None else dt

    def create_device_pools(
        self, model_dtype: Any = jnp.bfloat16, sharding=None
    ) -> list[jax.Array]:
        dt = self.kv_cache_dtype(model_dtype)
        cfg = self.config
        pools = []
        for nkv, hd in self.kv_head_info:
            shape = (cfg.num_pages, cfg.page_size, 2 * nkv, hd)
            arr = jnp.zeros(shape, dt)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            pools.append(arr)
        return pools

    # -- accounting ---------------------------------------------------------

    @property
    def num_free_pages(self) -> int:
        return self.pool.num_free

    def get_table(self, seq: Sequence) -> BlockTable:
        t = self.tables.get(seq.request_id)
        if t is None:
            t = BlockTable(self.pool)
            self.tables[seq.request_id] = t
        return t

    def can_allocate(self, seq: Sequence, num_new_tokens: int) -> bool:
        t = self.get_table(seq)
        return t.pages_needed(seq.num_computed_tokens + num_new_tokens) <= self.pool.num_free

    def allocate(self, seq: Sequence, num_new_tokens: int) -> None:
        self.get_table(seq).ensure_capacity(seq.num_computed_tokens + num_new_tokens)

    def fits_at_all(self, total_tokens: int) -> bool:
        """Admission guard: could this sequence EVER fit in the whole pool
        (reference contract #1 prompt_unschedulable_reason)."""
        from ..utils import cdiv

        return cdiv(total_tokens, self.config.page_size) <= self.pool.total_usable

    def free(self, seq: Sequence) -> None:
        t = self.tables.pop(seq.request_id, None)
        if t is not None:
            t.release()

    def free_for_recompute(self, seq: Sequence) -> None:
        """Preemption (recompute mode): return all pages, keep the request."""
        t = self.tables.get(seq.request_id)
        if t is not None:
            t.release()
