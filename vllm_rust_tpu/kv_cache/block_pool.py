"""Physical page pool + per-request page tables.

Reference semantics: kv_cache/block_pool.rs (free list), block_table.rs
(logical→physical mapping, slot math: slot = page_id * page_size +
pos % page_size — block_table.rs:63-71). Page 0 is reserved as the null
page for padded tokens (TPU static-shape design) and is never allocated.
"""

from __future__ import annotations

from collections import deque

from ..utils import cdiv


class BlockPool:
    """Free-list allocator over physical pages 1..num_pages-1.

    ``evict_source`` (set by the KV manager when prefix caching is on)
    supplies reclaimable cached pages when the free list runs dry —
    the reference's eviction-aware allocation (prefix_cache.rs evict)."""

    def __init__(self, num_pages: int, page_size: int, stripes: int = 1):
        self.num_pages = num_pages
        self.page_size = page_size
        # ``stripes`` > 1: pages are partitioned into contiguous id
        # ranges matching a GSPMD shard over an "sp" mesh axis (decode
        # context parallelism, ops/dcp.py); allocation round-robins the
        # stripes so each sequence's KV spreads evenly across ranks
        # (reference context_parallel.rs interleaved assignment)
        self.stripes = stripes
        self.stripe_rows = num_pages // stripes
        self._free_by_stripe: list[deque[int]] = [
            deque() for _ in range(stripes)
        ]
        for p in range(1, num_pages):
            self._free_by_stripe[self._stripe(p)].append(p)
        self.evict_source = None  # callable -> page id | None

    def _stripe(self, page: int) -> int:
        return min(page // self.stripe_rows, self.stripes - 1)

    @property
    def num_free(self) -> int:
        return sum(len(d) for d in self._free_by_stripe)

    @property
    def total_usable(self) -> int:
        return self.num_pages - 1

    def allocate(self, n: int, start_stripe: int = 0) -> list[int]:
        out: list[int] = []
        s = start_stripe % self.stripes
        while len(out) < n:
            picked = None
            for j in range(self.stripes):  # preferred stripe first
                d = self._free_by_stripe[(s + j) % self.stripes]
                if d:
                    picked = d.popleft()
                    break
            if picked is None and self.evict_source is not None:
                picked = self.evict_source()
            if picked is None:
                self.free(out)
                raise MemoryError(
                    f"requested {n} pages, only {self.num_free} free"
                )
            out.append(picked)
            s += 1
        return out

    def free(self, pages: list[int]) -> None:
        for p in pages:
            assert 0 < p < self.num_pages, p
            self._free_by_stripe[self._stripe(p)].append(p)


class BlockTable:
    """Logical→physical page mapping for one sequence."""

    def __init__(self, pool: BlockPool):
        self._pool = pool
        self.pages: list[int] = []

    def __len__(self) -> int:
        return len(self.pages)

    @property
    def capacity_tokens(self) -> int:
        return len(self.pages) * self._pool.page_size

    def pages_needed(self, total_tokens: int) -> int:
        """Additional pages required to hold ``total_tokens``."""
        return max(0, cdiv(total_tokens, self._pool.page_size) - len(self.pages))

    def ensure_capacity(self, total_tokens: int) -> None:
        need = self.pages_needed(total_tokens)
        if need:
            # stripe rotation by logical slot index keeps each seq's KV
            # balanced across DCP ranks
            self.pages.extend(
                self._pool.allocate(need, start_stripe=len(self.pages))
            )

    def slot(self, pos: int) -> int:
        ps = self._pool.page_size
        return self.pages[pos // ps] * ps + pos % ps

    def slots(self, start: int, end: int) -> list[int]:
        """Physical slots for token positions [start, end)."""
        ps = self._pool.page_size
        return [self.pages[p // ps] * ps + p % ps for p in range(start, end)]

    def release(self) -> None:
        self._pool.free(self.pages)
        self.pages = []
