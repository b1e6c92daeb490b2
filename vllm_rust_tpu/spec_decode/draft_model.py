"""Draft-model proposer: a full small LM with its own paged KV cache.

Reference: spec_decode/draft_proposer.rs (478) + draft_model.rs (292) —
the draft model keeps its own KV cache and block tables, prefills
lazily, proposes K tokens autoregressively, and rolls back to the
verified length after each target verification.

TPU design differences:
- The draft's KV pools use the SAME page geometry (num_pages, page_size)
  as the target, so the target's page tables and slot mappings are
  reused verbatim — no second allocator, no drift between the two block
  tables (the reference maintains a parallel BlockTable per proposer).
- All decode sequences propose together: one jitted call runs the K
  autoregressive draft forwards UNROLLED (each a [S]-token batched
  decode), so a whole propose phase is a single dispatch and a single
  device→host fetch of the [S, K] draft matrix.
- Rejected-draft KV entries are overwritten on the next propose (same
  slots, recomputed mapping), mirroring the target's trim-to-accepted
  contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kv_cache.manager import KVCacheManager
from ..ops.attn_metadata import AttentionMetadata
from ..request import Sequence
from ..utils import pick_bucket


class DraftModelProposer:
    def __init__(self, model, params, num_draft_tokens: int = 4):
        self.model = model
        self.params = params
        self.max_draft_tokens = num_draft_tokens
        self.engine = None
        self._computed: dict[str, int] = {}  # rid -> draft KV valid length

    # -- engine binding -------------------------------------------------------

    def bind(self, engine) -> None:
        """Attach to an engine: create draft KV pools with the target's
        page geometry and jit the two device functions."""
        self.engine = engine
        kvm = KVCacheManager(engine.config.cache, self.model.kv_head_info)
        self.kv_pages = kvm.create_device_pools(self.model.dtype)
        self._prefill_jit = jax.jit(
            self._prefill_fn, donate_argnames=("kv_pages",)
        )
        self._propose_jit = jax.jit(
            self._propose_fn, static_argnames=("k",), donate_argnames=("kv_pages",)
        )

    # -- device functions -----------------------------------------------------

    def _prefill_fn(self, params, kv_pages, input_ids, md):
        _, kv_pages = self.model(params, input_ids, md, kv_pages)
        return kv_pages

    def _propose_fn(
        self,
        params,
        kv_pages,
        first_tokens: jax.Array,  # [S] the last verified token per row
        slot_mat: jax.Array,  # [S, K] KV slots for positions start..start+K-1
        kv_len0: jax.Array,  # [S] verified length (= start); 0 for pad rows
        positions0: jax.Array,  # [S] start position; 0 for pad rows
        page_indices: jax.Array,  # [S, P]
        cu_q_lens: jax.Array,  # [S+1] one token per real row
        num_real: jax.Array,  # [1]
        *,
        k: int,
    ):
        s = first_tokens.shape[0]
        real = kv_len0 > 0
        tokens = first_tokens
        drafts = []
        for r in range(k):
            md = AttentionMetadata(
                slot_mapping=slot_mat[:, r],
                kv_lens=jnp.where(real, kv_len0 + r + 1, 0),
                page_indices=page_indices,
                cu_q_lens=cu_q_lens,
                num_seqs=num_real,
                positions=positions0 + r,
                logits_indices=jnp.arange(s, dtype=jnp.int32),
            )
            hidden, kv_pages = self.model(params, tokens, md, kv_pages)
            logits = self.model.compute_logits(params, hidden)  # [S, V]
            tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            drafts.append(tokens)
        return kv_pages, jnp.stack(drafts, axis=1)  # [S, K]

    # -- proposer protocol ----------------------------------------------------

    def propose(self, seq: Sequence) -> list[int]:
        return self.propose_batch([(seq, self.max_draft_tokens + 1)])[0]

    def propose_batch(self, items: list[tuple[Sequence, int]]) -> list[list[int]]:
        """Propose drafts for every decode sequence in one device pass."""
        assert self.engine is not None, "DraftModelProposer not bound"
        eng = self.engine
        s_pad = eng.num_slots
        if len(items) > s_pad:
            # propose in slot-sized groups (cannot happen with the default
            # scheduler, which caps the batch at max_num_seqs)
            return (
                self.propose_batch(items[:s_pad])
                + self.propose_batch(items[s_pad:])
            )
        k = self.max_draft_tokens
        ps = eng.config.cache.page_size
        p_full = eng.config.pages_per_seq

        self._catch_up(items)

        slot_mat = np.zeros((s_pad, k), np.int32)
        kv_len0 = np.zeros(s_pad, np.int32)
        positions0 = np.zeros(s_pad, np.int32)
        page_indices = np.zeros((s_pad, p_full), np.int32)
        first_tokens = np.zeros(s_pad, np.int32)
        cu = np.zeros(s_pad + 1, np.int32)
        for i, (seq, _n) in enumerate(items):
            start = seq.num_computed_tokens
            table = eng.kv.get_table(seq)
            cap = table.capacity_tokens
            for r in range(k):
                pos = start + r
                slot_mat[i, r] = table.slot(pos) if pos < cap else 0
            kv_len0[i] = start
            positions0[i] = start
            page_indices[i, : len(table.pages)] = table.pages
            first_tokens[i] = seq.all_token_ids[start]
            cu[i + 1] = i + 1
        cu[len(items) + 1 :] = cu[len(items)]

        self.kv_pages, drafts = self._propose_jit(
            self.params,
            self.kv_pages,
            jnp.asarray(first_tokens),
            jnp.asarray(slot_mat),
            jnp.asarray(kv_len0),
            jnp.asarray(positions0),
            jnp.asarray(page_indices),
            jnp.asarray(cu),
            jnp.asarray([len(items)], jnp.int32),
            k=k,
        )
        drafts_h = np.asarray(drafts)
        out: list[list[int]] = []
        for i, (seq, n) in enumerate(items):
            self._computed[seq.request_id] = seq.num_computed_tokens + k
            out.append([int(t) for t in drafts_h[i, : max(0, n - 1)]])
        return out

    def _catch_up(self, items: list[tuple[Sequence, int]]) -> None:
        """Prefill the draft KV for any positions the target has verified
        but the draft has not yet seen (prompt chunks, post-preemption
        recompute, and the bonus token of the previous window)."""
        eng = self.engine
        buckets = eng.config.token_buckets
        max_bucket = buckets[-1]
        s_pad = eng.num_slots
        p_full = eng.config.pages_per_seq

        pending: list[tuple[Sequence, int, int]] = []  # (seq, from, to)
        for seq, _n in items:
            start = seq.num_computed_tokens
            done = self._computed.get(seq.request_id, 0)
            if done > start:
                # verification rolled back past our speculative writes —
                # positions [?, start) with real tokens are still valid
                done = min(done, start)
                self._computed[seq.request_id] = done
            lo = done
            while lo < start:
                hi = min(start, lo + max_bucket)
                pending.append((seq, lo, hi))
                lo = hi

        while pending:
            group: list[tuple[Sequence, int, int]] = []
            total = 0
            while pending and len(group) < s_pad:
                seq, lo, hi = pending[0]
                n = hi - lo
                if total + n > max_bucket and group:
                    break
                group.append(pending.pop(0))
                total += n

            t_pad = pick_bucket(total, buckets)
            input_ids = np.zeros(t_pad, np.int32)
            positions = np.zeros(t_pad, np.int32)
            slot_mapping = np.zeros(t_pad, np.int32)
            kv_lens = np.zeros(s_pad, np.int32)
            page_indices = np.zeros((s_pad, p_full), np.int32)
            cu = np.zeros(s_pad + 1, np.int32)
            logits_indices = np.zeros(s_pad, np.int32)
            off = 0
            for j, (seq, lo, hi) in enumerate(group):
                n = hi - lo
                table = eng.kv.get_table(seq)
                input_ids[off : off + n] = seq.all_token_ids[lo:hi]
                positions[off : off + n] = np.arange(lo, hi)
                slot_mapping[off : off + n] = table.slots(lo, hi)
                kv_lens[j] = hi
                page_indices[j, : len(table.pages)] = table.pages
                cu[j + 1] = cu[j] + n
                logits_indices[j] = off + n - 1
                off += n
                self._computed[seq.request_id] = hi
            cu[len(group) + 1 :] = cu[len(group)]

            md = AttentionMetadata(
                slot_mapping=jnp.asarray(slot_mapping),
                kv_lens=jnp.asarray(kv_lens),
                page_indices=jnp.asarray(page_indices),
                cu_q_lens=jnp.asarray(cu),
                num_seqs=jnp.asarray([len(group)], jnp.int32),
                positions=jnp.asarray(positions),
                logits_indices=jnp.asarray(logits_indices),
            )
            self.kv_pages = self._prefill_jit(
                self.params, self.kv_pages, jnp.asarray(input_ids), md
            )

    # -- lifecycle hooks ------------------------------------------------------

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        # the propose pass wrote positions [start, start+K); entries up to
        # the accepted length held verified tokens. When every draft was
        # accepted the target advances one position PAST our last write
        # (the K-th draft was proposed but never fed back), so clamp to
        # what we actually wrote — the gap is re-fed by the next catch-up.
        self._computed[seq.request_id] = min(
            self._computed.get(seq.request_id, 0), seq.num_computed_tokens
        )

    def on_preempt(self, seq: Sequence) -> None:
        # pages were released (recompute) or host-swapped (the draft KV is
        # not offloaded): rebuild from scratch on the next propose
        self._computed.pop(seq.request_id, None)

    def on_request_complete(self, seq: Sequence) -> None:
        self._computed.pop(seq.request_id, None)
