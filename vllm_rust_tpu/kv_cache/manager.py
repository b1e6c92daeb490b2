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
    def __init__(
        self,
        config: CacheConfig,
        kv_head_info: list[tuple[int, int]],
        enable_prefix_caching: bool = False,
    ):
        self.config = config
        self.kv_head_info = kv_head_info
        self.pool = BlockPool(config.num_pages, config.page_size,
                              stripes=getattr(config, "dcp_stripes", 1))
        self.tables: dict[str, BlockTable] = {}
        self.prefix = None
        if enable_prefix_caching:
            from .prefix_cache import PrefixCache

            self.prefix = PrefixCache()
            self.pool.evict_source = self.prefix.evict
        # request_id -> number of pages already registered in the cache
        self._registered: dict[str, int] = {}
        # CpuOffloadManager when swap-mode preemption is enabled
        self.offload = None

    # -- device pools -------------------------------------------------------

    def kv_cache_dtype(self, model_dtype: Any) -> Any:
        dt = _KV_DTYPES[self.config.kv_dtype]
        return model_dtype if dt is None else dt

    def create_device_pools(
        self,
        model_dtype: Any = jnp.bfloat16,
        sharding=None,
        num_slots: int = 0,
    ) -> list[Any]:
        """Per-layer device state. Attention layers: paged KV arrays
        [num_pages, page_size, 2*kv_heads, head_dim]. SSM layers (dict
        entries in kv_head_info, reference ssm/SSMStateManager): per-slot
        recurrent state {"conv": [num_slots+1, C, K-1], "ssm":
        [num_slots+1, ...] f32} — slot num_slots is the null slot for
        padding rows."""
        dt = self.kv_cache_dtype(model_dtype)
        cfg = self.config
        pools: list[Any] = []
        for entry in self.kv_head_info:
            if isinstance(entry, dict):
                assert num_slots > 0, "stateful layers need num_slots"
                if "cross" in entry:
                    # encoder-decoder layer: paged self KV + per-slot
                    # cross-attention KV (encoder outputs projected once
                    # per request — reference engine/encoder_decoder.rs)
                    # + per-slot valid encoder length for masking
                    nkv, hd = entry["kv"]
                    pools.append(
                        {
                            "kv": jnp.zeros(
                                (cfg.num_pages, cfg.page_size, 2 * nkv, hd),
                                dt,
                            ),
                            "cross": jnp.zeros(
                                (num_slots + 1, *entry["cross"]), model_dtype
                            ),
                            "enc_len": jnp.zeros((num_slots + 1,), jnp.int32),
                        }
                    )
                else:
                    pool = {
                        "ssm": jnp.zeros(
                            (num_slots + 1, *entry["ssm"]), jnp.float32
                        ),
                    }
                    if "conv" in entry:
                        # conv-free linear attention (MiniMax lightning)
                        # has only the matrix state
                        pool["conv"] = jnp.zeros(
                            (num_slots + 1, *entry["conv"]), model_dtype
                        )
                    if "kv" in entry:
                        # parallel-hybrid layer (FalconH1): attention AND
                        # mamba in one layer — paged KV + recurrent state
                        nkv, hd = entry["kv"]
                        pool["kv"] = jnp.zeros(
                            (cfg.num_pages, cfg.page_size, 2 * nkv, hd), dt
                        )
                    pools.append(pool)
                continue
            nkv, hd = entry
            shape = (cfg.num_pages, cfg.page_size, 2 * nkv, hd)
            arr = jnp.zeros(shape, dt)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            pools.append(arr)
        return pools

    # -- accounting ---------------------------------------------------------

    @property
    def num_free_pages(self) -> int:
        n = self.pool.num_free
        if self.prefix is not None:
            n += self.prefix.num_evictable
        return n

    def get_table(self, seq: Sequence) -> BlockTable:
        t = self.tables.get(seq.request_id)
        if t is None:
            t = BlockTable(self.pool)
            self.tables[seq.request_id] = t
        return t

    def can_allocate(self, seq: Sequence, num_new_tokens: int) -> bool:
        t = self.get_table(seq)
        return (
            t.pages_needed(seq.num_computed_tokens + num_new_tokens)
            <= self.num_free_pages
        )

    def allocate(self, seq: Sequence, num_new_tokens: int) -> None:
        self.get_table(seq).ensure_capacity(seq.num_computed_tokens + num_new_tokens)

    def fits_at_all(self, total_tokens: int) -> bool:
        """Admission guard: could this sequence EVER fit in the whole pool
        (reference contract #1 prompt_unschedulable_reason)."""
        from ..utils import cdiv

        return cdiv(total_tokens, self.config.page_size) <= self.pool.total_usable

    def free(self, seq: Sequence) -> None:
        t = self.tables.pop(seq.request_id, None)
        self._registered.pop(seq.request_id, None)
        if self.offload is not None:
            self.offload.drop(seq.request_id)
        if t is not None:
            self._release_pages(t)

    def try_swap_out(self, seq: Sequence) -> bool:
        """Swap-mode preemption: host-copy the pages, then release them.
        Returns False when the host budget rejects (fallback: recompute)."""
        if self.offload is None:
            return False
        t = self.tables.get(seq.request_id)
        if t is None or not t.pages:
            return False
        if not self.offload.swap_out(seq.request_id, list(t.pages)):
            return False
        self._registered.pop(seq.request_id, None)
        self._release_pages(t)
        return True

    def free_for_recompute(self, seq: Sequence) -> None:
        """Preemption (recompute mode): return all pages, keep the request."""
        t = self.tables.get(seq.request_id)
        self._registered.pop(seq.request_id, None)
        if t is not None:
            self._release_pages(t)

    def _release_pages(self, table: BlockTable) -> None:
        if self.prefix is None:
            table.release()
            return
        plain = [p for p in table.pages if not self.prefix.release(p)]
        self.pool.free(plain)
        table.pages = []

    # -- prefix caching -------------------------------------------------------

    def match_prefix(self, seq: Sequence) -> None:
        """At (re)admission: adopt cached pages covering the longest known
        prefix; always leave >= 1 token to prefill (contract #5)."""
        if self.prefix is None or seq.num_computed_tokens > 0:
            return
        table = self.get_table(seq)
        if table.pages:
            return
        ps = self.config.page_size
        known = [t for t in seq.all_token_ids if t >= 0]
        usable = len(known) - 1  # leave at least one token
        n_full = usable // ps
        if n_full <= 0:
            return
        from .prefix_cache import chunk_hash

        hashes = []
        h = 0
        for i in range(n_full):
            h = chunk_hash(h, tuple(known[i * ps : (i + 1) * ps]))
            hashes.append(h)
        pages = self.prefix.match(hashes)
        if pages:
            table.pages = pages
            seq.num_computed_tokens = len(pages) * ps
            seq.num_cached_tokens = max(
                seq.num_cached_tokens, len(pages) * ps
            )
            # cached pages count as already registered
            self._registered[seq.request_id] = len(pages)

    def register_computed(self, seq: Sequence) -> None:
        """Register newly-completed full pages (called after the engine
        advances num_computed_tokens)."""
        if self.prefix is None:
            return
        table = self.tables.get(seq.request_id)
        if table is None:
            return
        from .prefix_cache import chunk_hash

        ps = self.config.page_size
        done = self._registered.get(seq.request_id, 0)
        target = seq.num_computed_tokens // ps
        ids = seq.all_token_ids
        # recompute the chain up to `done` lazily (cheap: hash of hashes)
        h = 0
        for i in range(done):
            h = chunk_hash(h, tuple(ids[i * ps : (i + 1) * ps]))
        for i in range(done, min(target, len(table.pages))):
            chunk = ids[i * ps : (i + 1) * ps]
            if len(chunk) < ps or any(t < 0 for t in chunk):
                break  # unresolved ring placeholders: retry next step
            h = chunk_hash(h, tuple(chunk))
            self.prefix.register(h, table.pages[i])
            done = i + 1
        self._registered[seq.request_id] = done

    def reset_prefix_cache(self) -> int:
        if self.prefix is None:
            return 0
        pages = self.prefix.reset()
        self.pool.free(pages)
        return len(pages)
