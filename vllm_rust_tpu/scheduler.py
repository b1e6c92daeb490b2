"""Continuous-batching scheduler: FCFS/priority, chunked prefill, preemption.

Reference: crates/core/src/scheduler.rs (SchedulerConfig :335,
compute_schedule :512-758, preemption ordering, long-prefill throttling,
starvation tripwire :707-738). The scheduling-order contract
(SURVEY.md Appendix A #2) is preserved exactly:

  (a) running requests first, in arrival order — continued prefill chunks
      take min(remaining, budget); decodes take 1 token; anything that
      cannot get pages triggers preemption;
  (b) preemption victims newest-first (FCFS) or lowest-priority-first,
      pages credited back;
  (c) waiting-queue admission head-first, stopping at the first request
      that does not fit (long-prefill-throttled requests are skipped, not
      blocking).

Pure data-structure code — runs on host, off the device hot path.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from . import metrics
from .config import SchedulerConfig
from .kv_cache.manager import KVCacheManager
from .request import RequestStatus, Sequence

logger = logging.getLogger(__name__)


@dataclass
class ScheduledSeq:
    seq: Sequence
    num_tokens: int  # tokens to run this step (chunk size, or 1 for decode)

    @property
    def is_final_prompt_chunk(self) -> bool:
        """True when after this step the whole prompt (and any recomputed
        generated tokens) is in KV — i.e. the step's last position produces
        a REAL next-token sample."""
        return (
            self.seq.num_computed_tokens + self.num_tokens >= self.seq.total_len
        )


@dataclass
class ScheduleDecision:
    scheduled: list[ScheduledSeq] = field(default_factory=list)
    preempted: list[Sequence] = field(default_factory=list)
    # running seqs skipped this step because their last sampled token is
    # still unresolved on device (constrained decoding wave scheduling —
    # they must not serialize the pipeline for everyone else)
    blocked: int = 0

    @property
    def total_tokens(self) -> int:
        return sum(s.num_tokens for s in self.scheduled)


class Scheduler:
    def __init__(self, config: SchedulerConfig, kv: KVCacheManager, max_model_len: int):
        self.config = config
        self.kv = kv
        self.max_model_len = max_model_len
        self.waiting: list[Sequence] = []
        self.running: list[Sequence] = []
        self._idle_rounds = 0
        # tokens a decode step claims (speculative engines override to K+1)
        self.decode_width = lambda seq: 1

    # -- admission ----------------------------------------------------------

    def prompt_unschedulable_reason(self, seq: Sequence) -> str | None:
        """Reject-at-admission guard (reference engine/helpers.rs:550-580,
        contract #1): anything this configuration could never schedule."""
        n = seq.num_prompt_tokens
        if n == 0:
            return "empty prompt"
        if n + seq.params.max_tokens > self.max_model_len and n >= self.max_model_len:
            return (
                f"prompt length {n} >= max_model_len {self.max_model_len}"
            )
        if not self.kv.fits_at_all(min(n + 1, self.max_model_len)):
            return (
                f"prompt needs more KV pages than the whole pool has "
                f"({self.kv.pool.total_usable} usable pages)"
            )
        if not self.config.enable_chunked_prefill and n > self.config.max_tokens_per_step:
            return (
                f"prompt length {n} exceeds max_tokens_per_step "
                f"{self.config.max_tokens_per_step} and chunked prefill is off"
            )
        return None

    def add_request(self, seq: Sequence) -> None:
        reason = self.prompt_unschedulable_reason(seq)
        if reason is not None:
            raise ValueError(f"request {seq.request_id} unschedulable: {reason}")
        seq.status = RequestStatus.WAITING
        if self.config.policy == "priority":
            self.waiting.append(seq)
            self.waiting.sort(key=lambda s: (s.priority, s.arrival_time))
        else:
            self.waiting.append(seq)

    def remove(self, seq: Sequence) -> None:
        if seq in self.running:
            self.running.remove(seq)
        if seq in self.waiting:
            self.waiting.remove(seq)

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def num_unfinished(self) -> int:
        return len(self.waiting) + len(self.running)

    # -- scheduling ---------------------------------------------------------

    def schedule(self) -> ScheduleDecision:
        cfg = self.config
        d = ScheduleDecision()
        budget = cfg.max_tokens_per_step
        partial_prefills = 0

        # (a) running requests, arrival order
        no_fit: list[Sequence] = []
        for seq in list(self.running):
            if seq.status != RequestStatus.RUNNING:
                # preempted as a victim earlier in THIS loop (the snapshot
                # is stale); it is back in the waiting queue now
                continue
            if budget <= 0:
                break  # stays running, scheduled next step
            if (
                seq.num_generated >= seq.params.max_tokens
                or seq.total_len >= self.max_model_len
            ):
                # at budget; finish happens when the lagging in-flight
                # results are processed (async pipelined stepping)
                continue
            if seq.resolve_before_schedule and seq.pending:
                # constrained (grammar / multi-token bad-words) seq whose
                # last token is still on device: the next mask needs the
                # advanced DFA state, so it sits this step out instead of
                # forcing a host sync on the whole batch (VERDICT r2 #5;
                # reference ADR 0020 + engine/helpers.rs:1170-1230)
                d.blocked += 1
                continue
            remaining = seq.remaining_prefill
            if remaining <= 1:  # decode (possibly a speculative window)
                n = max(1, min(self.decode_width(seq), budget))
            else:  # continued (chunked) prefill
                if partial_prefills >= max(1, cfg.max_num_partial_prefills) and (
                    remaining > budget
                ):
                    continue  # throttled this step, stays running
                n = min(remaining, budget)
            if not self._try_allocate(seq, n, d):
                no_fit.append(seq)
                continue
            if remaining > 0 and n < remaining:
                partial_prefills += 1
            budget -= n
            d.scheduled.append(ScheduledSeq(seq, n))

        # (b) running requests whose pages could not be found even after
        # preempting newer victims: preempt them too (recompute mode).
        for seq in no_fit:
            self._preempt(seq, d)

        # (c) waiting queue admission, head-first
        admitted: list[Sequence] = []
        for seq in list(self.waiting):
            if len(self.running) + len(admitted) - len(d.preempted) >= cfg.max_num_seqs:
                break
            if budget <= 0:
                break
            self.kv.match_prefix(seq)  # prefix-cache adoption (no-op if off)
            remaining = seq.remaining_prefill
            if remaining == 0:
                # resumed swap case: straight to decode (reference
                # scheduler.rs:650-668)
                n = 1
            else:
                if not cfg.enable_chunked_prefill and remaining > budget:
                    break  # head-of-line blocks (chunked prefill off)
                n = min(remaining, budget)
                if n < remaining:
                    if partial_prefills >= max(1, cfg.max_num_partial_prefills):
                        continue  # skipped, not blocking (long-prefill throttle)
                    partial_prefills += 1
            if not self._try_allocate(seq, n, d, allow_preempt=False):
                if n < remaining:
                    partial_prefills -= 1
                break  # first request that doesn't fit stops admission
            budget -= n
            admitted.append(seq)
            d.scheduled.append(ScheduledSeq(seq, n))

        for seq in admitted:
            self.waiting.remove(seq)
            seq.status = RequestStatus.RUNNING
            if seq.first_scheduled_time is None:
                seq.first_scheduled_time = time.monotonic()
                metrics.QUEUE_TIME.observe(
                    seq.first_scheduled_time - seq.arrival_time
                )
            self.running.append(seq)

        # starvation tripwire (reference scheduler.rs:707-738)
        if not d.scheduled and self.waiting:
            self._idle_rounds += 1
            if self._idle_rounds % 100 == 0:
                logger.warning(
                    "scheduler made no progress for %d rounds with %d waiting "
                    "requests — possible accounting bug",
                    self._idle_rounds,
                    len(self.waiting),
                )
        else:
            self._idle_rounds = 0
        return d

    def _try_allocate(
        self,
        seq: Sequence,
        num_tokens: int,
        d: ScheduleDecision,
        *,
        allow_preempt: bool = True,
    ) -> bool:
        while not self.kv.can_allocate(seq, num_tokens):
            if not allow_preempt:
                return False
            victim = self._pick_victim(exclude=seq, decision=d)
            if victim is None:
                return False
            self._preempt(victim, d)
        self.kv.allocate(seq, num_tokens)
        return True

    def _pick_victim(self, exclude: Sequence, decision: ScheduleDecision):
        """Newest-first (FCFS) or lowest-priority-first victim among running
        seqs not already scheduled this step."""
        scheduled_ids = {s.seq.request_id for s in decision.scheduled}
        candidates = [
            s
            for s in self.running
            if s is not exclude and s.request_id not in scheduled_ids
        ]
        if not candidates:
            return None
        if self.config.policy == "priority":
            return max(candidates, key=lambda s: (s.priority, s.arrival_time))
        return max(candidates, key=lambda s: s.arrival_time)

    def _preempt(self, seq: Sequence, d: ScheduleDecision) -> None:
        """Preemption: swap (host-copy KV, keep num_computed_tokens) when
        configured and within budget, else recompute (contract #3: free
        pages, reset computed, keep generated tokens). Requeue at head."""
        if self.config.preemption_mode == "swap" and self.kv.try_swap_out(seq):
            seq.swapped = True
            seq.status = RequestStatus.PREEMPTED
        else:
            self.kv.free_for_recompute(seq)
            seq.reset_for_recompute()
        if seq in self.running:
            self.running.remove(seq)
        self.waiting.insert(0, seq)
        d.preempted.append(seq)
