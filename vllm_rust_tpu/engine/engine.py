"""LLMEngine: the continuous-batching host loop with pipelined dispatch.

Reference: crates/core/src/engine/strategy.rs:426 run_engine_loop +
helpers.rs (admission, batch build, sampling glue) + ADR 0008 (async
scheduling overlap) + ADR 0017 (deferred DtoH / device-side feedback).

TPU design — the token-ring pipeline (r4: ring POOL):
  - Steps are dispatched without waiting for results; sampled tokens stay
    on device in a ring buffer and feed later steps' inputs via in-kernel
    gathers.
  - The host fetches one WHOLE ring (K steps × S seqs of packed
    token+logprob) in a single transfer per cycle, then detokenizes,
    checks stop conditions and finishes requests.
  - Rings rotate through an N-buffer POOL: the host may lag the device by
    up to N-1 unfetched cycles, so the D2H round trip (~25 ms over the
    tunnel) overlaps dispatch instead of stalling it (processing is
    RTT-paced via an adaptive estimate). Device token feedback only ever
    reads the current + previous ring; older references (preempted or
    throttled seqs) resolve through a host-side ring cache.

Stop conditions: multi-step windows check model-EOS ON DEVICE (null-page
the overshoot KV, early-exit when every watched seq stopped, and export a
stop count the host polls to rotate/fetch early). Host-side stop strings
and custom ids still resolve at ring processing: a sequence may overshoot
those by up to K·(pool lag) decode steps, discarded at processing time.
Set fetch_interval small for latency-sensitive serving, 8+ for
throughput; the pool keeps short intervals from serializing on the RTT.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
import zlib
from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..ops.dcp import dcp_mode as _dcp_mode
from ..detokenizer import detokenize_incrementally, find_stop
from ..kv_cache.manager import KVCacheManager
from ..request import (
    FinishReason,
    RequestOutput,
    RequestStatus,
    SamplingParams,
    Sequence,
)
from ..scheduler import ScheduledSeq, Scheduler
from ..utils import pick_bucket
from .batch_pack import HostBatch
from .step_fn import StepFunction

logger = logging.getLogger(__name__)

PLACEHOLDER = -1  # unresolved sampled token (still on device)


@dataclass
class StepRecord:
    """One dispatched, possibly still-executing step."""

    cycle_id: int
    ring_slot: int
    # (seq, row in sampler axis, index into generated_token_ids)
    entries: list[tuple[Sequence, int, int]]
    # this step wrote the ring's top-logprob columns
    has_toplp: bool = False


class LLMEngine:
    def __init__(
        self,
        model,
        params,
        config: EngineConfig,
        tokenizer=None,
        devices=None,
    ):
        self.model = model
        self.params = params
        self.config = config
        self.tokenizer = tokenizer

        # SPMD: shard params/KV over a tp mesh (reference distributed/
        # parallel_layers.rs + engine/tensor_parallel.rs lockstep loop —
        # all of which dissolves into NamedSharding + XLA collectives).
        # ``devices``: explicit submesh for this engine — the DP router
        # (engine/dp.py) places each replica on a disjoint device set,
        # replacing the reference's rank-lockstep DP
        # (distributed/data_parallel.rs) with independent engines.
        self.mesh = None
        kv_sharding = None
        self.dcp = max(1, config.decode_context_parallel_size)
        if (
            config.tensor_parallel_size > 1
            or self.dcp > 1
            or devices is not None
        ):
            from ..parallel.mesh import kv_pages_sharding, make_mesh, shard_params

            self.mesh = make_mesh(
                tp=config.tensor_parallel_size, dp=1, sp=self.dcp,
                devices=devices,
            )
            self.params = params = shard_params(params, self.mesh)
            kv_sharding = kv_pages_sharding(self.mesh)
            if self.dcp > 1:
                # page stripes must divide evenly for the GSPMD shard
                # AND the allocator's stripe math
                config.cache.num_pages -= (
                    config.cache.num_pages % self.dcp
                )
                config.cache.dcp_stripes = self.dcp

        has_ssm = any(isinstance(e, dict) for e in model.kv_head_info)
        if has_ssm and config.enable_prefix_caching:
            # cached pages would skip prefill, leaving recurrent state
            # unbuilt (reference: SSM models have no prefix reuse either)
            raise ValueError("prefix caching is unsupported for SSM models")
        if has_ssm and config.scheduler.preemption_mode == "swap":
            # swap-in restores KV pages but not recurrent state; only
            # recompute preemption rebuilds SSM state correctly
            raise ValueError("SSM models require preemption_mode='recompute'")
        # OOM graceful degradation (reference ADR 0022): if the configured
        # pool does not fit, boot with progressively smaller pools and
        # serve degraded rather than crash
        self.degraded_kv = False
        num_pages = config.cache.num_pages
        while True:
            try:
                self.kv = KVCacheManager(
                    config.cache,
                    model.kv_head_info,
                    enable_prefix_caching=config.enable_prefix_caching,
                )
                self.kv_pages = self.kv.create_device_pools(
                    model.dtype,
                    sharding=kv_sharding,
                    num_slots=config.scheduler.max_num_seqs,
                )
                jax.block_until_ready(jax.tree_util.tree_leaves(self.kv_pages))
                break
            except (RuntimeError, jax.errors.JaxRuntimeError) as e:
                if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
                    raise
                if num_pages <= 16:
                    raise
                num_pages = max(16, num_pages // 4)
                logger.warning(
                    "KV pool allocation OOM; degrading to %d pages "
                    "(tiny-pool boot, ADR 0022) — throughput will suffer",
                    num_pages,
                )
                config.cache.num_pages = num_pages
                self.degraded_kv = True
        self._kv_calib_pending = False
        if config.cache.kv_dtype != "auto":
            # quantized KV: model passes static scales into the attention
            # write/read paths (pinned for the cache lifetime, contract #10)
            model.kv_scales = (config.cache.k_scale, config.cache.v_scale)
            if (
                config.cache.k_scale == 1.0
                and config.cache.v_scale == 1.0
                and config.cache.kv_calibrate
            ):
                # no checkpoint scales (kv_cache_scales.json): calibrate
                # amax -> scale on the FIRST prefill batch, then pin
                # (reference kv_cache/quantization.rs:80-100). int8 at
                # scale 1.0 silently clips anything outside +-127.
                self._kv_calib_pending = True
                logger.warning(
                    "kv_dtype=%s with no checkpoint scales: will calibrate "
                    "K/V scales from the first prefill batch (one-time "
                    "recompile of touched step variants)",
                    config.cache.kv_dtype,
                )
        self.scheduler = Scheduler(config.scheduler, self.kv, config.max_model_len)
        if config.scheduler.preemption_mode == "swap":
            from ..kv_cache.offload import CpuOffloadManager

            self.kv.offload = CpuOffloadManager(self)

        eos_ids = set(config.model.eos_token_ids)
        if tokenizer is not None and getattr(tokenizer, "eos_token_id", None) is not None:
            eos_ids.add(tokenizer.eos_token_id)
        self.eos_ids = tuple(sorted(eos_ids))
        if config.attention_backend != "auto" and hasattr(
            model, "attention_backend"
        ):
            # propagate --attention-backend to the model (was silently
            # ignored before r3)
            model.attention_backend = config.attention_backend
        self.top_logprobs_k = 8  # device top-k width for top_logprobs
        self.step_fn = StepFunction(
            model, self.eos_ids, top_logprobs_k=self.top_logprobs_k
        )

        self.num_slots = config.scheduler.max_num_seqs
        self._free_slots = list(range(self.num_slots))
        # 3-axis multimodal RoPE (Qwen2-VL family): the packed batch
        # carries height/width position rows and the step unpacks [3, T]
        self._use_mrope = bool(getattr(model, "mrope_section", None))

        def _place(x):
            """Commit per-engine device state to this engine's submesh so
            DP replicas (engine/dp.py) keep ALL their state on their own
            disjoint devices."""
            if self.mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                x, NamedSharding(self.mesh, PartitionSpec())
            )

        self.token_counts = _place(
            jnp.zeros((self.num_slots, config.model.vocab_size), jnp.int32)
        )
        self.requests: dict[str, Sequence] = {}

        # token-ring pipeline state; ring rows carry
        # [tokens S | logprobs S | top ids S*K | top lps S*K]
        self._fi_auto = config.fetch_interval == 0
        self.fetch_interval = (
            32 if self._fi_auto else max(2, config.fetch_interval)
        )
        self._itl_budget = config.itl_budget_ms / 1e3
        self._cycle_t0 = time.monotonic()
        # ring rows are FIXED (>= 64) regardless of fetch_interval: the
        # ring shape is baked into every jitted step variant, and an
        # fi-sized ring made each fi value recompile the whole variant
        # lattice (~70 graphs x 20-60 s over the tunnel — the r4 serving
        # bench spent most of its wall in exactly that). A 64-row ring
        # is a few hundred KB; fetch_interval is now a pure runtime
        # rotation policy.
        self._ring_rows = max(64, self.fetch_interval)
        ring_shape = (
            self._ring_rows,
            (2 + 2 * self.top_logprobs_k) * self.num_slots,
        )
        # Ring POOL (r4): N rotating buffers. The host may lag the device
        # by up to N-1 unfetched cycles, so the D2H round trip (~25 ms
        # over the tunnel) overlaps dispatch instead of stalling it.
        # Token feedback only ever references the current + previous
        # cycle's rings (continuously-scheduled seqs), so extra depth is
        # free; stale references from preempted/throttled seqs resolve
        # through the host-side ring cache (_resolve_stale_pending).
        # 6 deep regardless of interval: early rotations (stops, first
        # tokens, budget-reached) make short effective cycles common
        # even at large fetch_interval, and a ring is a few KB
        self._num_rings = config.ring_buffers or 6
        self._num_rings = max(3, self._num_rings)
        self._rings = [
            _place(jnp.zeros(ring_shape, jnp.int32))
            for _ in range(self._num_rings)
        ]
        self._ring_idx = 0
        # (cycle_id, ring array, fetch-start monotonic time), oldest first
        self._pending_fetches: deque[tuple[int, jax.Array, float]] = deque()
        self._ring_cache: dict[int, np.ndarray] = {}  # cycle -> host copy
        # adaptive estimate of the D2H round trip: process a cycle's
        # results once its transfer has had this long to land, so
        # np.asarray doesn't block the dispatch loop
        self._rtt_est = 0.03
        self._place = _place
        self._cycle_id = 0
        self._cycle_pos = 0
        self._in_flight: deque[StepRecord] = deque()
        self._pending_outputs: list[RequestOutput] = []
        # on-device stop summaries awaiting an async poll (window steps)
        self._stop_flags: deque = deque()
        self._rotate_asap = False
        self._host_batches: dict[int, HostBatch] = {}

        self._step_count = 0
        self._embed_runners: dict = {}
        self._constraints: dict = {}
        self.lora = None  # LoraManager (enable_lora())
        self.eplb = None  # EplbState (enable_eplb())
        self.multihost = None  # MultihostCoordinator (rank 0, DCN serving)
        self._eplb_counts = None
        self._eplb_interval = 0
        self._dummy_eplb = _place(jnp.zeros((1,), jnp.int32))
        self._mask_words = (config.model.vocab_size + 31) // 32
        self._dummy_mask = _place(jnp.zeros((1, 1), jnp.int32))
        self.stats = {
            "num_steps": 0,
            "num_preemptions": 0,
            "prompt_tokens": 0,
            "generated_tokens": 0,
        }

    # -- request admission ---------------------------------------------------

    def add_request(
        self,
        request_id: str,
        prompt: str | list[int],
        params: SamplingParams | None = None,
        priority: int = 0,
    ) -> None:
        params = params or SamplingParams()
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompt requires a tokenizer")
            token_ids = self.tokenizer.encode(prompt)
        else:
            token_ids = list(prompt)
        seq = Sequence(
            request_id=request_id,
            prompt_token_ids=token_ids,
            params=params,
            priority=priority,
        )
        if params.constraint is not None:
            seq.constraint = self._get_constraint(params.constraint)
            seq.constraint_state = seq.constraint.initial_state()
            seq.resolve_before_schedule = True
        if params.bad_words:
            # normalize to token-id lists once (strings need a tokenizer)
            norm = []
            for w in params.bad_words:
                if isinstance(w, str):
                    if self.tokenizer is None:
                        raise ValueError("bad_words strings require a tokenizer")
                    ids = self.tokenizer.encode(w)
                else:
                    ids = list(w)
                if ids:
                    norm.append([int(x) for x in ids])
            params.bad_words = norm
            if any(len(w) > 1 for w in norm):
                # multi-token bans need the generated tail resolved
                # before the next step's bias slots can be filled
                seq.resolve_before_schedule = True
        if params.allowed_token_ids:
            # whitelist rides the grammar-bitmask path (ADR 0020 analogue)
            words = np.zeros((self._mask_words,), np.uint32)
            for tid in params.allowed_token_ids:
                if 0 <= tid < self.config.model.vocab_size:
                    words[tid // 32] |= np.uint32(1 << (tid % 32))
            seq.allowed_mask = words.view(np.int32)
        if params.lora_name is not None:
            if self.lora is None:
                raise ValueError("LoRA is not enabled on this engine")
            seq.lora_slot = self.lora.slot_of(params.lora_name)
        self.scheduler.add_request(seq)  # raises on unschedulable
        self.requests[request_id] = seq
        self.stats["prompt_tokens"] += len(token_ids)

    def abort_request(self, request_id: str) -> None:
        seq = self.requests.get(request_id)
        if seq is None or seq.is_finished:
            return
        self._finish(seq, FinishReason.ABORT)

    @property
    def has_unfinished(self) -> bool:
        if self._pending_outputs:
            # outputs parked by a rotation-forced consume: the caller
            # must step() once more to receive them (else a request's
            # final STOP output would be silently swallowed)
            return True
        if self.scheduler.has_work:
            return True
        return any(
            seq.finish_reason is None
            for rec in self._in_flight
            for seq, _, _ in rec.entries
        )

    # -- the step ------------------------------------------------------------

    @property
    def _ring_write(self):
        return self._rings[self._ring_idx]

    @_ring_write.setter
    def _ring_write(self, value):
        self._rings[self._ring_idx] = value

    @property
    def _ring_prev(self):
        return self._rings[(self._ring_idx - 1) % self._num_rings]

    def step(self) -> list[RequestOutput]:
        outputs: list[RequestOutput] = []
        # process any cycle whose D2H transfer has had time to land —
        # non-blocking in steady state (RTT-paced), never stalls dispatch
        outputs.extend(self._process_arrived())
        self._poll_stop_flags()

        # prefetch host-resident KV of swapped seqs near the queue head:
        # their H2D overlaps this step's dispatch instead of sitting on
        # the restore's critical path (reference offload.rs:59)
        offload = getattr(self.kv, "offload", None)
        if offload is not None and offload.store:
            for seq in self.scheduler.waiting[:2]:
                if seq.swapped:
                    offload.prefetch(seq.request_id)

        decision = self.scheduler.schedule()
        self.stats["num_preemptions"] += len(decision.preempted)
        for seq in decision.preempted:
            self._release_slot(seq)
        if decision.scheduled:
            # blocked (constrained) seqs wait on a ring fetch: rotate
            # early so their tokens resolve within ~2 steps instead of
            # a full fetch_interval, while unconstrained seqs keep the
            # pipeline busy (wave scheduling, VERDICT r2 #5)
            rotate_at = 2 if decision.blocked else self.fetch_interval
            if self._rotate_asap:
                # stop / first-token signal: fetch early, but keep the
                # 2-step floor so arrival-heavy traffic doesn't degrade
                # into per-step fetches
                rotate_at = 2
            elif (
                self._fi_auto
                and time.monotonic() - self._cycle_t0 >= self._itl_budget
            ):
                # auto-fi ITL deadline: a steadily-decoding stream gets
                # its tokens at least every itl_budget_ms even with no
                # stop/arrival signal in flight
                rotate_at = 2
            if self._cycle_pos >= rotate_at:
                self._rotate_rings()
                self._rotate_asap = False
            for s in decision.scheduled:
                # rotation may have force-consumed results that FINISHED
                # this seq (its slot is released); assigning it another
                # would leak the slot (_dispatch filters it out anyway)
                if s.seq.finish_reason is None and s.seq.slot < 0:
                    self._assign_slot(s.seq)
            recs = self._dispatch(decision.scheduled)
            self._in_flight.extend(recs)
            self._step_count += len(recs)
            self.stats["num_steps"] += len(recs)
        elif self._in_flight:
            # nothing schedulable until lagging results are processed:
            # consume the OLDEST landed cycle (one bounded wait) rather
            # than draining every in-flight window — wave-blocked seqs
            # unblock as soon as their cycle arrives
            if self._pending_fetches:
                outputs.extend(self._consume_fetch())
            else:
                outputs.extend(self._flush())
        return outputs

    def _rotate_rings(self) -> None:
        ring = self._rings[self._ring_idx]
        # Start the D2H of the just-finished ring NOW: the transfer's
        # round trip (~25 ms over the axon tunnel) overlaps subsequent
        # dispatches; _process_arrived consumes it once it has landed.
        try:
            ring.copy_to_host_async()
        except AttributeError:  # older jax / non-jax arrays in tests
            pass
        self._pending_fetches.append((self._cycle_id, ring, time.monotonic()))
        self._cycle_id += 1
        self._cycle_pos = 0
        self._cycle_t0 = time.monotonic()
        self._ring_idx = (self._ring_idx + 1) % self._num_rings
        # the buffer now becoming the write target holds the results of
        # cycle (current - (num_rings-1)); they must be consumed before
        # the device overwrites (and jit donation invalidates) it
        reuse_cycle = self._cycle_id - (self._num_rings - 1)
        while self._pending_fetches and self._pending_fetches[0][0] <= reuse_cycle:
            self._pending_outputs.extend(self._consume_fetch())

    def _poll_stop_flags(self) -> None:
        """Non-blocking check of per-window on-device stop summaries: a
        positive count means some watched seq hit a stop mid-window, so
        the ring should rotate/fetch early instead of decoding out the
        cycle (stop-overshoot fix; reference checks stops per step
        in-loop, engine/helpers.rs:2746-2795). The scalar's D2H still
        costs a round trip over the tunnel, so it is only read after
        compute-ready + one RTT of grace — never stalling dispatch."""
        now = time.monotonic()
        while self._stop_flags:
            arr, ready_since = self._stop_flags[0]
            try:
                if not arr.is_ready():
                    break
            except AttributeError:
                pass  # non-jax arrays in tests: treat as ready
            if ready_since is None:
                self._stop_flags[0] = (arr, now)
                break
            if now - ready_since < self._rtt_est:
                break
            self._stop_flags.popleft()
            if int(np.asarray(arr)[0]) > 0:
                self._rotate_asap = True

    def _process_arrived(self, force: bool = False) -> list[RequestOutput]:
        """Consume pending ring fetches whose transfer should have landed
        (fetch-start older than the adaptive RTT estimate), plus anything
        queued by a forced consume."""
        outputs: list[RequestOutput] = []
        if self._pending_outputs:
            outputs.extend(self._pending_outputs)
            self._pending_outputs.clear()
        now = time.monotonic()
        while self._pending_fetches:
            _, ring, t0 = self._pending_fetches[0]
            if not force:
                if (now - t0) < self._rtt_est:
                    break
                # the RTT clock starts at rotation, not at compute
                # completion: under device-bound load the array may not
                # even be produced yet, and np.asarray would block the
                # dispatch loop on COMPUTE (ADVICE r4 #5) — defer until
                # the device has actually materialized it
                try:
                    if not ring.is_ready():
                        break
                except AttributeError:
                    pass  # non-jax arrays in tests
            outputs.extend(self._consume_fetch())
        return outputs

    def _consume_fetch(self) -> list[RequestOutput]:
        """Blocking-fetch the oldest pending ring and process its records;
        adapts the RTT estimate from (transfer age + observed block) —
        an upper bound on the actual round trip. A pure multiplicative
        ratchet is wrong here: forced fetches (flush, pool reuse) always
        block, and would drive the estimate to its cap (seen r4)."""
        cyc, ring, t0 = self._pending_fetches.popleft()
        tb = time.monotonic()
        try:
            computed = ring.is_ready()
        except AttributeError:
            computed = True
        ring_h = np.asarray(ring)
        now = time.monotonic()
        blocked = now - tb
        if not computed:
            # the device hadn't even produced the ring yet (forced fetch
            # at a drain): the block measures compute, not transfer —
            # not an RTT sample
            pass
        elif blocked > 0.002:
            # the transfer wasn't done at age (tb - t0): rtt ~ age + block
            sample = min(now - t0, 0.25)
            self._rtt_est = min(0.25, 0.7 * self._rtt_est + 0.3 * sample)
        else:
            # landed before we asked: our estimate is at/above the truth
            self._rtt_est = max(0.004, self._rtt_est * 0.98)
        self._ring_cache[cyc] = ring_h
        for old in [c for c in self._ring_cache if c < cyc - self._num_rings]:
            del self._ring_cache[old]
        outputs: list[RequestOutput] = []
        while self._in_flight and self._in_flight[0].cycle_id <= cyc:
            outputs.extend(self._process_record(self._in_flight.popleft(), ring_h))
        return outputs

    # -- batch building / dispatch --------------------------------------------

    def _host_batch(self, t_pad: int) -> HostBatch:
        hb = self._host_batches.get(t_pad)
        if hb is None:
            hb = HostBatch(t_pad, self.num_slots, self.config.pages_per_seq,
                           mrope=self._use_mrope)
            self._host_batches[t_pad] = hb
        hb.reset()
        return hb

    def _calibrate_kv_scales(self, scheduled: list[ScheduledSeq]) -> None:
        """First-write KV scale calibration (reference
        kv_cache/quantization.rs:80-100): run the first real prompt chunk
        through the model with a throwaway bf16 pool, collect per-layer
        K/V amax via the kv_write tracing sink, pin scale = amax/qmax for
        the cache lifetime (contract #10), and refresh the step-function
        jit cache (the old cache baked scale 1.0 at trace time)."""
        from ..ops.attn_metadata import AttentionMetadata
        from ..ops.kv_write import amax_sink
        from ..utils import cdiv

        seq = max(scheduled, key=lambda s: s.num_tokens).seq
        toks = seq.all_token_ids[: min(seq.num_prompt_tokens, 128)]
        if len(toks) < 2:
            return
        ps = self.config.cache.page_size
        n = len(toks)
        npg = cdiv(n, ps)
        pools = []
        for p in self.kv_pages:
            if hasattr(p, "ndim") and p.ndim == 4:
                pools.append(
                    jnp.zeros((npg + 1, *p.shape[1:]), jnp.bfloat16)
                )
            else:  # SSM recurrent-state dicts
                pools.append(jax.tree_util.tree_map(jnp.zeros_like, p))
        md = AttentionMetadata(
            slot_mapping=jnp.arange(n, dtype=jnp.int32) + ps,
            kv_lens=jnp.asarray([n], jnp.int32),
            page_indices=jnp.arange(1, npg + 1, dtype=jnp.int32)[None, :],
            cu_q_lens=jnp.asarray([0, n], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
            positions=jnp.arange(n, dtype=jnp.int32),
            logits_indices=jnp.asarray([n - 1], jnp.int32),
            slot_ids=jnp.asarray([0], jnp.int32),
        )
        saved_scales = self.model.kv_scales
        self.model.kv_scales = (None, None)  # bf16 probe pool: no scaling

        def calib_fn(params, ids, pools):
            with amax_sink() as sink:
                self.model(params, ids, md, pools)
            ks = jnp.stack([a for a, _ in sink]) if sink else jnp.ones((1,))
            vs = jnp.stack([b for _, b in sink]) if sink else jnp.ones((1,))
            return jnp.max(ks), jnp.max(vs)

        k_amax, v_amax = jax.jit(calib_fn)(
            self.params, jnp.asarray(toks, jnp.int32), pools
        )
        self.model.kv_scales = saved_scales
        qmax = {"int8": 127.0, "fp8_e4m3": 448.0, "fp8_e5m2": 57344.0}[
            self.config.cache.kv_dtype
        ]
        k_scale = max(float(k_amax) / qmax, 1e-8)
        v_scale = max(float(v_amax) / qmax, 1e-8)
        self.config.cache.k_scale = k_scale
        self.config.cache.v_scale = v_scale
        self.model.kv_scales = (k_scale, v_scale)
        # old jit cache traced with the boot scales — rebuild so every
        # variant retraces with the pinned values
        self.step_fn = StepFunction(
            self.model, self.eos_ids, top_logprobs_k=self.top_logprobs_k
        )
        self._kv_calib_pending = False
        logger.info(
            "KV scale calibration: amax k=%.4g v=%.4g -> scales "
            "k=%.4g v=%.4g (pinned; step variants retrace)",
            float(k_amax), float(v_amax), k_scale, v_scale,
        )

    def _dispatch(self, scheduled: list[ScheduledSeq]) -> StepRecord:
        # ring rotation between schedule() and here may force-consume a
        # pending fetch (pool reuse) whose results FINISH a scheduled
        # seq (its pages are freed, its overshoot tokens truncated) —
        # dispatching it would read past its trimmed token list
        scheduled = [s for s in scheduled if s.seq.finish_reason is None]
        if not scheduled:
            return []
        if (
            self._kv_calib_pending
            and not getattr(self, "_in_warmup", False)
            and any(s.num_tokens > 1 for s in scheduled)
        ):
            # calibrate on the first REAL prefill batch — warmup's
            # synthetic (i % vocab)+1 prompts have arbitrary token
            # statistics (and ~0 amax under dummy weights), which would
            # pin garbage scales (ADVICE r4 #2)
            self._calibrate_kv_scales(scheduled)
        cfg = self.config
        s_pad = self.num_slots
        k = self._ring_rows  # feedback flat-index space (ring row count)
        ring_slot = self._cycle_pos

        total_tokens = sum(s.num_tokens for s in scheduled)
        t_pad = pick_bucket(total_tokens, cfg.token_buckets)
        hb = self._host_batch(t_pad)
        hb.header[0] = ring_slot
        hb.header[1] = len(scheduled)

        use_penalties = False
        use_top_filters = False
        use_lora = False
        use_bias = False
        use_typical = False
        use_toplp = False
        use_badwords = False
        use_grammar = any(
            s.seq.constraint is not None or s.seq.allowed_mask is not None
            for s in scheduled
        )
        use_prompt_lps = False
        plp_jobs: list[tuple[Sequence, int, int, int]] = []
        if use_grammar:
            # unconstrained rows: all-ones (padded vocab tail stays 0-free
            # via the bitmask width); constrained rows fill below
            grammar_mask = np.full(
                (s_pad, self._mask_words), -1, np.int32
            )
        entries: list[tuple[Sequence, int, int]] = []

        offset = 0
        for i, s in enumerate(scheduled):
            seq, n = s.seq, s.num_tokens
            if seq.swapped:
                # restore host-resident KV into the freshly allocated pages
                self.kv.offload.swap_in(
                    seq.request_id, self.kv.get_table(seq).pages
                )
                seq.swapped = False
            start = seq.num_computed_tokens
            end = start + n
            chunk = seq.all_token_ids[start:end]
            hb.input_ids[offset : offset + n] = chunk
            for j, tok in enumerate(chunk):
                if tok == PLACEHOLDER:
                    gen_idx = start + j - seq.num_prompt_tokens
                    c, slot, row = seq.pending[gen_idx]
                    if c == self._cycle_id:
                        sel = 0
                    elif c == self._cycle_id - 1:
                        sel = 1
                    else:
                        # stale (>=2 cycles old): the seq skipped cycles
                        # (preempted / throttled / wave-blocked) while
                        # the host lagged. Feed the concrete value from
                        # the host-side ring cache instead of device
                        # feedback (which only spans 2 rings).
                        hb.input_ids[offset + j] = int(
                            self._ring_host(c)[slot][row]
                        )
                        continue
                    hb.feedback_src[offset + j] = (sel * k + slot) * s_pad + row
                    hb.input_ids[offset + j] = 0
            hb.positions[offset : offset + n] = np.arange(start, end)
            if self._use_mrope:
                self._fill_mrope(hb, offset, n, start, end, seq)
            table = self.kv.get_table(seq)
            hb.slot_mapping[offset : offset + n] = table.slots(start, end)
            hb.kv_lens[i] = end
            pages = table.pages
            hb.page_indices[i, : len(pages)] = pages
            hb.cu_q_lens[i + 1] = hb.cu_q_lens[i] + n
            hb.logits_indices[i] = offset + n - 1
            hb.slot_ids[i] = seq.slot
            is_final_chunk = s.is_final_prompt_chunk
            hb.sample_mask[i] = is_final_chunk

            p = seq.params
            hb.temperature[i] = p.temperature
            hb.top_k[i] = p.top_k
            hb.top_p[i] = p.top_p
            hb.min_p[i] = p.min_p
            hb.repetition_penalty[i] = p.repetition_penalty
            hb.presence_penalty[i] = p.presence_penalty
            hb.frequency_penalty[i] = p.frequency_penalty
            hb.seeds[i] = self._seq_seed(seq)
            hb.rng_pos[i] = end
            # tri-state (batch_pack): 2 = ban EOS (min_tokens active),
            # 1 = watch EOS on device (normal stop-at-EOS traffic),
            # 0 = neither (ignore_eos)
            banning = seq.num_generated < p.min_tokens
            hb.ban_eos[i] = 2 if banning else (0 if p.ignore_eos else 1)
            if (
                p.stop_token_ids
                and not banning
                and p.stop_token_ids[0] >= 0
            ):
                # the device additionally watches ONE custom stop id per
                # seq in decode windows; further ids / stop strings
                # resolve host-side as before
                hb.watch_stop[i] = p.stop_token_ids[0]
            hb.typical_p[i] = p.typical_p
            use_penalties |= p.uses_penalties
            use_top_filters |= (not p.greedy) and (
                p.top_k > 0 or p.top_p < 1.0 or p.min_p > 0.0
            )
            use_typical |= p.typical_p < 1.0
            use_toplp |= bool(p.top_logprobs)
            if p.logit_bias or p.bad_words:
                use_bias = True
                use_badwords |= bool(p.bad_words)
                self._fill_bias_slots(hb, i, seq)
            if seq.constraint is not None:
                assert not seq.pending, (
                    "constrained sequence scheduled with unresolved tokens"
                )
                grammar_mask[i] = seq.constraint.mask(seq.constraint_state)
                if seq.allowed_mask is not None:
                    grammar_mask[i] &= seq.allowed_mask
            elif seq.allowed_mask is not None:
                grammar_mask[i] = seq.allowed_mask
            if seq.lora_slot >= 0:
                hb.lora_idx[offset : offset + n] = seq.lora_slot
                use_lora = True
            if p.prompt_logprobs and start < seq.num_prompt_tokens:
                # echo logprobs for this prefill chunk's positions
                # (dedupe below keeps only the ORIGINAL prefill's values
                # across recompute-preemption — contract #4)
                use_prompt_lps = True
                for j in range(n):
                    nxt = start + j + 1
                    if nxt < seq.num_prompt_tokens:
                        hb.lp_targets[offset + j] = seq.prompt_token_ids[nxt]
                plp_jobs.append((seq, offset, start, n))
            offset += n

            # advance state optimistically (async scheduling)
            seq.num_computed_tokens = end
            self.kv.register_computed(seq)
            if is_final_chunk:
                gen_idx = seq.num_generated
                seq.generated_token_ids.append(PLACEHOLDER)
                seq.pending[gen_idx] = (self._cycle_id, ring_slot, i)
                entries.append((seq, i, gen_idx))

        hb.cu_q_lens[len(scheduled) + 1 :] = hb.cu_q_lens[len(scheduled)]

        use_eplb = self.eplb is not None
        decode_only = all(s.num_tokens == 1 for s in scheduled)

        # -- multi-step decode window (config.decode_window; step_fn
        # n_steps): metadata for steps 2..W evolves ON DEVICE, so one
        # dispatch covers W steps — kills (W-1)/W of the packed-meta H2D
        # (~2.7 ms/transfer over the tunnel) and dispatch overhead ------
        window = 1
        if (
            decode_only
            and self.config.decode_window > 1
            and len(scheduled) > 0
            and not (use_grammar or use_bias or use_lora or use_toplp
                     or use_prompt_lps or use_eplb)
            and self.multihost is None
        ):
            win_cap = self.config.decode_window
            if self._fi_auto:
                # one window must not bust the ITL deadline (~5-6 ms per
                # step at bench geometry -> 8 steps ~ 45 ms)
                win_cap = min(win_cap, 8)
            hard = min(
                win_cap,
                self.fetch_interval - self._cycle_pos,  # ring room
            )
            soft = hard
            for s_ in scheduled:
                seq = s_.seq
                p = seq.params
                # max_tokens is a SOFT cap: overshoot steps are discarded
                # at processing (LENGTH truncation), so the window may
                # round up past it when that saves dispatch boundaries
                soft = min(soft, p.max_tokens - seq.num_generated + 1)
                # model_len / min_tokens caps are HARD: page tables end
                # at max_model_len, and ban_eos must stay valid all window
                hard = min(
                    hard, self.config.max_model_len - seq.total_len + 1
                )
                mt = p.min_tokens - seq.num_generated
                if 0 < mt < hard:
                    hard = max(1, mt)
            window = min(hard, soft)
            if 1 < window < hard and (window & (window - 1)):
                # Budget-bound non-pow2 remainder: quantizing DOWN emits
                # a descending dispatch ramp (e.g. 15 -> 8,4,2,1 = 4
                # dispatch boundaries at ~7 ms each, r5 engine trace);
                # rounding UP runs (c - window) overshoot steps (~6.6 ms
                # each, results discarded at LENGTH truncation) in ONE
                # dispatch. Round up when the waste costs less than the
                # boundaries it removes.
                c = 1 << window.bit_length()
                waste = c - window
                saved = bin(window).count("1") - 1
                if c <= hard and waste <= saved:
                    window = c
            # quantize DOWN to a power of two: every distinct n_steps is
            # its own jitted variant (a 36-layer graph, 20-60 s to
            # compile over the tunnel) — arbitrary 1..W windows near
            # budget/ring boundaries were compiling mid-serve and
            # collapsing mixed-traffic throughput (r4 serving bench)
            while window & (window - 1):
                window &= window - 1
            if window > 1:
                # preallocate the window's pages so the device-side slot
                # lookup never runs off the table
                try:
                    for s_ in scheduled:
                        self.kv.get_table(s_.seq).ensure_capacity(
                            s_.seq.total_len + window - 1
                        )
                except MemoryError:
                    window = 1
        extra_entries: list[list] = []
        if window > 1:
            # page tables may have grown: rewrite the packed rows
            for i, s_ in enumerate(scheduled):
                pages = self.kv.get_table(s_.seq).pages
                hb.page_indices[i, : len(pages)] = pages
            # extra window steps: placeholders + ring rows i of
            # ring_slot + w (same row index per seq each step)
            for w in range(1, window):
                step_entries = []
                for i, s_ in enumerate(scheduled):
                    seq = s_.seq
                    gen_idx = seq.num_generated
                    seq.generated_token_ids.append(PLACEHOLDER)
                    seq.pending[gen_idx] = (
                        self._cycle_id, ring_slot + w, i
                    )
                    seq.num_computed_tokens += 1
                    self.kv.register_computed(seq)
                    step_entries.append((seq, i, gen_idx))
                extra_entries.append(step_entries)

        p_bucket = self._page_bucket(scheduled, extra=window - 1)
        if self.multihost is not None:
            # lockstep the worker processes: ship the packed buffer +
            # static jit selectors before dispatching ours (reference
            # engine/tensor_parallel.rs coordinator broadcast)
            pend_reset = getattr(self, "_eplb_pending_reset", False)
            pend_plan = getattr(self, "_eplb_pending_plan", None)
            self.multihost.broadcast_dispatch(
                hb, grammar_mask if use_grammar else None,
                p_bucket=p_bucket, cycle_id=self._cycle_id,
                use_penalties=use_penalties,
                use_top_filters=use_top_filters,
                use_grammar=use_grammar, use_lora=use_lora,
                decode_only=decode_only, use_bias=use_bias,
                use_typical=use_typical, use_top_logprobs=use_toplp,
                use_prompt_logprobs=use_prompt_lps, use_eplb=use_eplb,
            )
            # apply the shipped EPLB sync locally at the same boundary
            # the workers do (right before this step's dispatch)
            if pend_reset:
                self._eplb_counts = self._place(
                    jnp.zeros_like(self._eplb_counts)
                )
            if pend_plan is not None:
                self._apply_eplb_plan(pend_plan)
        # DCP: enter the context so traces of the step take the
        # shard_map attention path (ops/dcp.py); no-op per call after
        # the variant is compiled
        with (
            _dcp_mode(self.dcp, mesh=self.mesh)
            if self.dcp > 1
            else contextlib.nullcontext()
        ):
            step_out = self.step_fn(
                self.params,
                self.kv_pages,
                # single h2d transfer; copy because jnp.asarray may alias
                # the (reused) host buffer zero-copy on the CPU backend
                jnp.asarray(hb.buf.copy()),
                self.token_counts,
                self._ring_write,
                self._ring_prev,
                jnp.asarray(grammar_mask) if use_grammar else self._dummy_mask,
                self._eplb_counts if use_eplb else self._dummy_eplb,
                layout=hb.layout,
                p_bucket=p_bucket,
                use_penalties=use_penalties,
                use_top_filters=use_top_filters,
                use_grammar=use_grammar,
                use_lora=use_lora,
                decode_only=decode_only,
                use_bias=use_bias,
                use_typical=use_typical,
                use_top_logprobs=use_toplp,
                use_prompt_logprobs=use_prompt_lps,
                use_eplb=use_eplb,
                n_steps=window,
                # EOS-watching window variant (while_loop + early exit)
                # only when some scheduled seq actually stops at EOS;
                # ignore_eos traffic gets the unrolled fori variant
                # (cross-step weight-prefetch pipelining)
                # VLLM_TPU_FORCE_WATCH=1: A/B knob for the unrolled
                # no-watch window variant (benchmarks/ab_decode.py)
                watch_stops=window > 1
                and (
                    os.environ.get("VLLM_TPU_FORCE_WATCH") == "1"
                    or any(
                        not s_.seq.params.ignore_eos
                        or s_.seq.params.stop_token_ids
                        for s_ in scheduled
                    )
                ),
            )
        step_out = list(step_out)
        if window > 1:
            # per-window on-device stop summary: poll it asynchronously so
            # a mid-window EOS triggers an early rotation/fetch instead of
            # decoding to the cycle's end (stop-overshoot, VERDICT r3 #3)
            n_stopped = step_out.pop()
            # poll whenever the window was dispatched with stop watching
            # (same predicate as watch_stops below): stop-id-only traffic
            # with ignore_eos=True still early-exits on device and must
            # trigger the early rotate/fetch, or finished seqs hold
            # slots/pages until cycle end (ADVICE r4 #3)
            if any(
                not s_.seq.params.ignore_eos or s_.seq.params.stop_token_ids
                for s_ in scheduled
            ):
                try:
                    n_stopped.copy_to_host_async()
                except AttributeError:
                    pass
                self._stop_flags.append((n_stopped, None))
        if use_eplb:
            self._eplb_counts = step_out.pop()
        if use_prompt_lps:
            self.kv_pages, self.token_counts, self._ring_write, plp_dev = (
                step_out
            )
            plp = np.asarray(plp_dev)  # sync fetch — echo is a slow path
            for seq, off, start, n in plp_jobs:
                if seq.prompt_logprobs_acc is None:
                    # position 0 has no conditional logprob
                    seq.prompt_logprobs_acc = [None]
                acc = seq.prompt_logprobs_acc
                for j in range(n):
                    nxt = start + j + 1
                    if nxt < seq.num_prompt_tokens and len(acc) <= nxt:
                        while len(acc) < nxt:
                            acc.append(None)
                        acc.append(float(plp[off + j]))
        else:
            self.kv_pages, self.token_counts, self._ring_write = step_out
        if use_eplb:
            self._eplb_step_count += 1
            if self._eplb_step_count % self._eplb_interval == 0:
                self._eplb_refresh()
        # Constrained seqs no longer serialize the pipeline (VERDICT r2
        # #5): the scheduler holds them out while their token is
        # unresolved (wave scheduling) and the ring rotates early when
        # any seq is blocked, so unconstrained traffic keeps streaming.
        recs = [
            StepRecord(
                cycle_id=self._cycle_id, ring_slot=ring_slot,
                entries=entries, has_toplp=use_toplp,
            )
        ]
        for w, step_entries in enumerate(extra_entries, start=1):
            recs.append(
                StepRecord(
                    cycle_id=self._cycle_id, ring_slot=ring_slot + w,
                    entries=step_entries,
                )
            )
        self._cycle_pos += window
        if any(s.is_final_prompt_chunk for s in scheduled) or any(
            s.seq.num_generated >= s.seq.params.max_tokens
            for s in scheduled
        ):
            # Close the cycle early (2-step floor) when latency-critical
            # results were just produced: a prompt's FIRST token (TTFT
            # pays ~one rotation + RTT instead of the remaining
            # fetch_interval) or a sequence REACHING its token budget —
            # finished-but-unfetched seqs hold their slot and pages until
            # the host processes them, which at fetch_interval=32 starved
            # admissions and inverted the mixed-traffic throughput curve
            # (r4 serving bench: fi32 37 tok/s < fi2 129 before this).
            self._rotate_asap = True
        return recs

    def _fill_mrope(
        self, hb: HostBatch, offset: int, n: int, start: int, end: int,
        seq: Sequence,
    ) -> None:
        """3-axis mrope rows (reference rotary.rs mrope + qwen2_vl.rs
        get_rope_index): prompt positions come from the triple computed
        at admission; generated positions are 1-D shifted by the per-seq
        delta (all three axes equal after the prompt)."""
        ar = np.arange(start, end)
        mp = seq.mrope_pos
        if mp is None:  # text-only request on an mrope model
            hb.positions_h[offset : offset + n] = ar
            hb.positions_w[offset : offset + n] = ar
            return
        pl = mp.shape[1]
        clamped = np.minimum(ar, pl - 1)
        tail = ar + seq.mrope_delta
        for row, dst in (
            (0, hb.positions),
            (1, hb.positions_h),
            (2, hb.positions_w),
        ):
            dst[offset : offset + n] = np.where(
                ar < pl, mp[row][clamped], tail
            )

    def _fill_bias_slots(self, hb: HostBatch, i: int, seq: Sequence) -> None:
        """Pack user logit_bias entries plus this step's bad-word bans
        into the per-seq sparse bias slots (reference
        logits_processor.rs LogitBias + BadWords)."""
        p = seq.params
        entries: list[tuple[int, float]] = []
        for tid, val in p.logit_bias.items():
            entries.append((int(tid), float(val)))
        # a bad word [w0..wn] bans wn when the generated tail == w0..w(n-1)
        gen = seq.generated_token_ids[: seq.num_generated]
        for w in p.bad_words:
            if len(w) == 1:
                entries.append((w[0], -1e9))
            else:
                prefix = w[:-1]
                if len(gen) >= len(prefix) and gen[-len(prefix):] == prefix:
                    entries.append((w[-1], -1e9))
        b = hb.bias_ids.shape[1]
        if len(entries) > b:
            logger.warning(
                "request %s: %d bias/ban entries exceed %d slots; clipping",
                seq.request_id, len(entries), b,
            )
            entries = entries[:b]
        for j, (tid, val) in enumerate(entries):
            hb.bias_ids[i, j] = tid
            hb.bias_vals[i, j] = val

    # grammar-compile deadline (reference ADR 0023, grammar/compiler.rs:
    # async compile with single-flight cache + deadline + watchdog after
    # the 2026-06-10 runaway-compile incident)
    GRAMMAR_COMPILE_DEADLINE_S = 15.0

    def _get_constraint(self, spec: dict):
        """Single-flight compile cache with a deadline: identical specs
        share one compilation; a compile that exceeds the deadline fails
        the REQUEST (not the engine) and is remembered as poisoned."""
        import concurrent.futures
        import json as _json

        from ..grammar import Constraint

        key = _json.dumps(spec, sort_keys=True)
        cached = self._constraints.get(key)
        if isinstance(cached, Exception):
            raise ValueError(f"grammar compile failed: {cached}")
        if cached is not None and not isinstance(
            cached, concurrent.futures.Future
        ):
            return cached
        if self.tokenizer is None:
            raise ValueError("structured output requires a tokenizer")
        fut = cached
        if fut is None:
            if not hasattr(self, "_grammar_pool"):
                self._grammar_pool = concurrent.futures.ThreadPoolExecutor(
                    max_workers=2, thread_name_prefix="grammar-compile"
                )
            fut = self._grammar_pool.submit(
                Constraint.from_spec,
                spec, self.tokenizer, self.config.model.vocab_size,
                self.eos_ids,
            )
            self._constraints[key] = fut
        try:
            c = fut.result(timeout=self.GRAMMAR_COMPILE_DEADLINE_S)
        except concurrent.futures.TimeoutError:
            err = TimeoutError(
                f"grammar compile exceeded {self.GRAMMAR_COMPILE_DEADLINE_S}s"
            )
            self._constraints[key] = err
            raise ValueError(str(err)) from None
        except Exception as e:
            self._constraints[key] = e
            raise ValueError(f"grammar compile failed: {e}") from None
        self._constraints[key] = c
        return c

    def _page_bucket(self, scheduled, extra: int = 0) -> int:
        """Bucketed page-table width for this batch (static per variant):
        kernels scan only page slots that can be live. ``extra``: tokens
        beyond the packed batch (multi-step decode windows)."""
        ps = self.config.cache.page_size
        full = self.config.pages_per_seq
        max_pages = max(
            (s.seq.num_computed_tokens + s.num_tokens + extra + ps - 1)
            // ps
            for s in scheduled
        )
        for b in (8, 16, 32, 64, 128, 256):
            if b >= max_pages and b <= full:
                return b
        return full

    def _seq_seed(self, seq: Sequence) -> int:
        if seq.params.seed is not None:
            return seq.params.seed & 0xFFFFFFFF
        return (zlib.crc32(seq.request_id.encode()) ^ self.config.seed) & 0xFFFFFFFF

    # -- output processing -----------------------------------------------------

    def _flush(self) -> list[RequestOutput]:
        """Drain everything in flight (used when the scheduler has nothing
        to dispatch — e.g. all sequences awaiting finish processing)."""
        outputs: list[RequestOutput] = self._process_arrived(force=True)
        if self._in_flight:
            # records of the still-open current cycle: read the write ring
            ring_h = np.asarray(self._ring_write)
            while self._in_flight:
                rec = self._in_flight.popleft()
                outputs.extend(self._process_record(rec, ring_h))
        return outputs

    def _ring_host(self, cycle: int) -> np.ndarray:
        """Host copy of a past cycle's ring, for resolving stale pending
        tokens of seqs that skipped >=2 cycles (preempted / throttled /
        wave-blocked). Reading the ring does NOT process its records —
        that still happens in fetch order."""
        h = self._ring_cache.get(cycle)
        if h is not None:
            return h
        for cyc, ring, _ in self._pending_fetches:
            if cyc == cycle:
                h = np.asarray(ring)
                self._ring_cache[cycle] = h
                return h
        raise AssertionError(
            f"ring for cycle {cycle} is gone (lag exceeded the ring pool)"
        )

    def _process_record(
        self, record: StepRecord, ring_h: np.ndarray
    ) -> list[RequestOutput]:
        s = self.num_slots
        k = self.top_logprobs_k
        row_data = ring_h[record.ring_slot]
        tokens = row_data[:s]
        logprobs = row_data[s : 2 * s].view(np.float32)
        top_ids = top_lps = None
        if record.has_toplp:
            top_ids = row_data[2 * s : (2 + k) * s].reshape(s, k)
            top_lps = row_data[(2 + k) * s :].view(np.float32).reshape(s, k)

        outputs: list[RequestOutput] = []
        for seq, row, gen_idx in record.entries:
            if seq.finish_reason is not None:
                continue  # finished/aborted while this step was in flight
            token = int(tokens[row])
            assert seq.generated_token_ids[gen_idx] == PLACEHOLDER
            seq.generated_token_ids[gen_idx] = token
            seq.pending.pop(gen_idx, None)
            self.stats["generated_tokens"] += 1
            if seq.constraint is not None and token not in self.eos_ids:
                seq.constraint_state = seq.constraint.advance(
                    seq.constraint_state, token
                )

            new_text = ""
            if self.tokenizer is not None:
                new_text, seq.prefix_offset, seq.read_offset = (
                    detokenize_incrementally(
                        self.tokenizer,
                        seq.all_token_ids[: seq.num_prompt_tokens + gen_idx + 1],
                        seq.prefix_offset or seq.num_prompt_tokens,
                        seq.read_offset or seq.num_prompt_tokens,
                    )
                )

            finish, stop_reason, emit_text = self._check_stop(
                seq, token, new_text, num_generated=gen_idx + 1
            )
            seq.output_text += emit_text

            if seq.params.logprobs is not None:
                if seq.logprobs_acc is None:
                    seq.logprobs_acc = []
                while len(seq.logprobs_acc) <= gen_idx:
                    seq.logprobs_acc.append(None)
                seq.logprobs_acc[gen_idx] = float(logprobs[row])

            step_toplp = None
            if seq.params.top_logprobs and top_ids is not None:
                n = min(int(seq.params.top_logprobs), self.top_logprobs_k)
                step_toplp = [
                    (int(top_ids[row, j]), float(top_lps[row, j]))
                    for j in range(n)
                ]
                if seq.top_logprobs_acc is None:
                    seq.top_logprobs_acc = []
                while len(seq.top_logprobs_acc) <= gen_idx:
                    seq.top_logprobs_acc.append(None)
                seq.top_logprobs_acc[gen_idx] = step_toplp

            outputs.append(
                RequestOutput(
                    request_id=seq.request_id,
                    new_token_ids=[token],
                    new_text=emit_text,
                    finished=finish is not None,
                    finish_reason=finish,
                    stop_reason=stop_reason,
                    output_text=seq.output_text,
                    token_ids=list(seq.generated_token_ids[: gen_idx + 1]),
                    logprobs=[float(logprobs[row])]
                    if seq.params.logprobs is not None
                    else None,
                    top_logprobs=[step_toplp] if step_toplp is not None else None,
                    prompt_logprobs=seq.prompt_logprobs_acc
                    if finish is not None
                    else None,
                )
            )
            if finish is not None:
                # drop in-flight overshoot samples beyond this token
                del seq.generated_token_ids[gen_idx + 1 :]
                self._finish(seq, finish, stop_reason)
        return outputs

    def _check_stop(
        self, seq: Sequence, token: int, new_text: str, num_generated: int
    ) -> tuple[FinishReason | None, str | int | None, str]:
        p = seq.params
        min_ok = num_generated >= p.min_tokens
        if min_ok and not p.ignore_eos and token in self.eos_ids:
            return FinishReason.STOP, None, ""
        if min_ok and token in p.stop_token_ids:
            return FinishReason.STOP, token, ""
        if p.stop and min_ok:
            stop_str, idx = find_stop(seq.output_text, new_text, p.stop)
            if stop_str is not None:
                keep = idx - len(seq.output_text)
                return FinishReason.STOP, stop_str, new_text[: max(keep, 0)]
        if num_generated >= p.max_tokens:
            return FinishReason.LENGTH, None, new_text
        if seq.num_prompt_tokens + num_generated >= self.config.max_model_len:
            return FinishReason.LENGTH, None, new_text
        return None, None, new_text

    def _finish(
        self,
        seq: Sequence,
        reason: FinishReason,
        stop_reason: str | int | None = None,
    ) -> None:
        """Error/finish paths must free KV pages (reference contract #8 —
        the 2026-05-08 block-leak deadlock)."""
        seq.status = RequestStatus.FINISHED
        seq.finish_reason = reason
        seq.stop_reason = stop_reason
        seq.pending.clear()
        self.kv.free(seq)
        self._release_slot(seq)
        self.scheduler.remove(seq)

    # -- slots -----------------------------------------------------------------

    def _assign_slot(self, seq: Sequence) -> None:
        seq.slot = self._free_slots.pop()
        if seq.params.uses_penalties and seq.generated_token_ids:
            # re-materialize penalty counts after preemption/slot reuse
            row = np.zeros(self.config.model.vocab_size, np.int32)
            for t in seq.generated_token_ids:
                if t >= 0:
                    row[t] += 1
            self.token_counts = self.token_counts.at[seq.slot].set(jnp.asarray(row))
        else:
            self.token_counts = self.token_counts.at[seq.slot].set(0)

    def _release_slot(self, seq: Sequence) -> None:
        if seq.slot >= 0:
            self._free_slots.append(seq.slot)
            seq.slot = -1

    # -- EPLB executor (reference moe/eplb_execute.rs) -----------------------

    def enable_eplb(self, num_ranks: int | None = None, interval: int = 128,
                    slots_per_rank: int | None = None):
        """Live expert-load balancing: routing counts accumulate on
        device, are fetched every ``interval`` steps, and a rebalance
        gathers hot experts into replica slots and swaps the physical
        expert tables into the live params."""
        from ..parallel.eplb import EplbState, plan_rebalance

        e = self.config.model.num_experts
        if not e:
            raise ValueError("EPLB requires an MoE model")
        if num_ranks is None:
            num_ranks = max(self.config.tensor_parallel_size, 1)
        self.eplb = EplbState(num_experts=e, num_ranks=num_ranks)
        if slots_per_rank is not None:
            self.eplb.plan = plan_rebalance(
                np.ones(e), num_ranks, slots_per_rank
            )
        self._eplb_interval = max(2, interval)
        self._eplb_step_count = 0
        self._eplb_counts = self._place(jnp.zeros((e,), jnp.int32))
        # keep the ORIGINAL logical expert weights: every plan gathers
        # from these, never from a previous physical table
        self._eplb_logical = [
            (li, lp["mlp"]["experts"])
            for li, lp in enumerate(self.params["layers"])
            if isinstance(lp.get("mlp"), dict) and "experts" in lp["mlp"]
        ]
        self.stats["eplb_rebalances"] = 0
        return self.eplb

    def _eplb_refresh(self) -> None:
        counts = np.asarray(self._eplb_counts)
        self.eplb.observe(counts)
        plan = self.eplb.maybe_rebalance()
        if self.multihost is not None:
            # defer both the counts reset and any replan to the next
            # dispatch: they ship with the step broadcast and every
            # process (coordinator included) applies them at the same
            # step boundary — no divergence window (ADVICE r2)
            self._eplb_pending_reset = True
            self._eplb_pending_plan = plan
            return
        self._eplb_counts = self._place(jnp.zeros_like(self._eplb_counts))
        if plan is not None:
            self._apply_eplb_plan(plan)

    def _apply_eplb_plan(self, plan) -> None:
        """Swap the physical expert tables into the live params
        (one gather per layer — "moving an expert" on TPU)."""
        from ..parallel.eplb import apply_plan_to_experts

        max_r = max(len(sl) for sl in plan.logical_to_phys)
        table = np.zeros((len(plan.logical_to_phys), max_r), np.int32)
        counts = np.zeros((len(plan.logical_to_phys),), np.int32)
        for logical, slots in enumerate(plan.logical_to_phys):
            counts[logical] = len(slots)
            for j in range(max_r):
                table[logical, j] = slots[j % len(slots)]
        table_j = self._place(jnp.asarray(table))
        counts_j = self._place(jnp.asarray(counts))
        for li, logical_experts in self._eplb_logical:
            mlp = self.params["layers"][li]["mlp"]
            mlp["experts"] = apply_plan_to_experts(logical_experts, plan)
            mlp["eplb_table"] = table_j
            mlp["eplb_counts"] = counts_j
        self.stats["eplb_rebalances"] = self.stats.get("eplb_rebalances", 0) + 1
        logger.info(
            "EPLB rebalance #%d applied: imbalance %.2f -> physical table "
            "%d slots", self.stats["eplb_rebalances"],
            self.eplb.imbalance() if self.eplb is not None else -1.0,
            plan.num_physical,
        )

    def reset_prefix_cache(self) -> int:
        return self.kv.reset_prefix_cache()

    def enable_lora(self, max_loras: int = 4, max_rank: int = 64):
        """Attach LoRA slots to the param tree (reference LoraManager)."""
        if self.lora is None:
            from ..lora import LoraManager

            self.lora = LoraManager(self, max_loras=max_loras, max_rank=max_rank)
        return self.lora

    def warmup(self, gen_tokens: int = 2, variants: bool = True) -> float:
        """Precompile the step for every token bucket plus the sampler
        feature variants (reference warmup.rs: JIT matrix over batch
        sizes AND modes). ``variants`` also compiles the penalties /
        top-filter / grammar / logit-bias step variants at the smallest
        bucket, so the first such request at serving time does not pay a
        compile spike. Returns seconds spent."""
        t0 = time.monotonic()
        self._in_warmup = True
        vocab = self.config.model.vocab_size
        for t in self.config.token_buckets:
            n = min(t, self.config.max_model_len - gen_tokens - 1)
            if n < 1:
                continue
            prompt = [(i % (vocab - 2)) + 1 for i in range(n)]
            self.generate(
                [prompt],
                SamplingParams(
                    max_tokens=gen_tokens, temperature=0.0, ignore_eos=True
                ),
            )
        n_variants = 0
        if variants and self.config.decode_window > 1:
            # decode-window variants: every power-of-two n_steps the
            # engine can emit, with and without on-device stop watching
            # (each is its own jitted step; compiling one mid-serve costs
            # 20-60 s over the tunnel — r4 serving-bench finding)
            n0 = min(self.config.token_buckets[0], 8)
            prompt = [(i % (vocab - 2)) + 1 for i in range(max(n0 - 4, 1))]
            wtoks = 2 * self.config.decode_window + 2
            for sp in (
                SamplingParams(max_tokens=wtoks, temperature=0.0,
                               ignore_eos=True),
                SamplingParams(max_tokens=wtoks, temperature=0.0,
                               ignore_eos=True,
                               stop_token_ids=[vocab - 1]),
            ):
                try:
                    self.generate([prompt], [sp])
                    n_variants += 1
                except Exception as e:
                    logger.warning("warmup window variant failed: %s", e)
            # page-bucket growth: decode windows recompile when the
            # bucketed page-table width crosses 8 -> 16 -> 32; touch the
            # widths real contexts will hit (a mid-serve compile of one
            # of these cost a measured ~24 s stall)
            ps = self.config.cache.page_size
            for pages in (12, 24):
                plen = pages * ps - self.config.decode_window - 4
                if plen + wtoks + 2 >= self.config.max_model_len:
                    continue
                try:
                    self.generate(
                        [[(i % (vocab - 2)) + 1 for i in range(plen)]],
                        [SamplingParams(max_tokens=wtoks, temperature=0.0,
                                        ignore_eos=True)],
                    )
                    n_variants += 1
                except Exception as e:
                    logger.warning("warmup page-bucket variant failed: %s", e)
            # mixed prefill+decode: a long prompt admitted while another
            # request decodes (decode_only=False at a bigger bucket)
            try:
                long_n = min(
                    self.config.token_buckets[min(1, len(self.config.token_buckets) - 1)],
                    self.config.max_model_len - 8,
                )
                sp_mix = SamplingParams(max_tokens=4, temperature=0.0,
                                        ignore_eos=True)
                self.add_request("warm-mix-a", prompt, sp_mix)
                self.step()
                self.add_request(
                    "warm-mix-b",
                    [(i % (vocab - 2)) + 1 for i in range(max(long_n, 1))],
                    sp_mix,
                )
                while self.has_unfinished:
                    self.step()
                n_variants += 1
            except Exception as e:
                logger.warning("warmup mixed variant failed: %s", e)
        if variants:
            n0 = min(self.config.token_buckets[0], 8)
            prompt = [(i % (vocab - 2)) + 1 for i in range(max(n0 - 4, 1))]
            variant_params = [
                # penalties + top filters (stochastic serving default)
                SamplingParams(
                    max_tokens=gen_tokens, temperature=0.8, top_p=0.9,
                    repetition_penalty=1.1, ignore_eos=True, seed=0,
                ),
                # logit bias path
                SamplingParams(
                    max_tokens=gen_tokens, temperature=0.0,
                    logit_bias={1: 0.0}, ignore_eos=True,
                ),
                # grammar-constrained path (tokenizer required)
            ]
            for p in variant_params:
                try:
                    self.generate([prompt], [p])
                    n_variants += 1
                except Exception as e:  # warmup must never block boot
                    logger.warning("warmup variant failed: %s", e)
            if self.tokenizer is not None:
                try:
                    self.generate(
                        [prompt],
                        [SamplingParams(
                            max_tokens=gen_tokens, temperature=0.0,
                            constraint={"choice": ["0", "1"]},
                        )],
                    )
                    n_variants += 1
                except Exception as e:
                    logger.warning("warmup grammar variant failed: %s", e)
        self._in_warmup = False
        dt = time.monotonic() - t0
        logger.info("warmup compiled %d buckets + %d variants in %.1fs",
                    len(self.config.token_buckets), n_variants, dt)
        return dt

    def _warm_step_variant(
        self, *, t_pad: int, p_bucket: int, n_steps: int = 1,
        watch: bool = False, decode_only: bool = False,
    ) -> None:
        """Compile ONE jitted step variant via a minimal fake dispatch:
        a single padded sequence whose KV writes land on the null page
        (page 0 — the overshoot sink) and whose ring row is slot 0 of an
        idle engine. Orders of magnitude cheaper than driving generate()
        shapes into each combination, and exact: the variant key IS the
        (layout, p_bucket, flags, n_steps, watch) tuple."""
        hb = self._host_batch(t_pad)
        hb.header[0] = 0
        hb.header[1] = 1
        hb.input_ids[0] = 1
        hb.kv_lens[0] = 1
        hb.cu_q_lens[1:] = 1
        hb.sample_mask[0] = 1
        if watch:
            hb.ban_eos[0] = 1
        step_out = self.step_fn(
            self.params,
            self.kv_pages,
            jnp.asarray(hb.buf.copy()),
            self.token_counts,
            self._ring_write,
            self._ring_prev,
            self._dummy_mask,
            self._dummy_eplb,
            layout=hb.layout,
            p_bucket=p_bucket,
            use_penalties=False,
            use_top_filters=False,
            decode_only=decode_only,
            n_steps=n_steps,
            watch_stops=watch and n_steps > 1,
        )
        step_out = list(step_out)
        if n_steps > 1:
            step_out.pop()  # n_stopped summary
        self.kv_pages, self.token_counts, self._ring_write = step_out

    def warmup_variants(
        self, page_buckets: tuple[int, ...] | None = None
    ) -> int:
        """Exhaustively compile the decode-window and mixed-step variant
        lattice (r5 serving forensics: the Poisson round was losing
        ~2.5 s per UNWARMED variant — a decode_w2 at a new page bucket,
        a mixed batch at a new token bucket — and the old generate()-
        driven warmup could not reach every combination). Every variant
        the serving engine can emit is compiled here:
          - decode windows: pow2 n_steps <= decode_window, watch and
            no-watch, per page bucket;
          - mixed/prefill single steps per token bucket x page bucket.
        With the persistent XLA cache, repeat boots load instead of
        compiling. Returns the number of variants touched."""
        if page_buckets is None:
            max_pages = min(
                self.config.pages_per_seq,
                (self.config.max_model_len + self.config.cache.page_size - 1)
                // self.config.cache.page_size,
            )
            page_buckets = tuple(
                b for b in (8, 16, 32, 64, 128, 256) if b <= max_pages
            ) or (self.config.pages_per_seq,)
        n = 0
        w = 2
        windows = []
        while w <= self.config.decode_window:
            windows.append(w)
            w *= 2
        t0 = self.config.token_buckets[0]
        for pb in page_buckets:
            for ns in windows:
                for watch in (False, True):
                    self._warm_step_variant(
                        t_pad=t0, p_bucket=pb, n_steps=ns, watch=watch,
                        decode_only=True,
                    )
                    n += 1
            # single-step decode (window truncated to 1) + mixed/prefill
            self._warm_step_variant(
                t_pad=t0, p_bucket=pb, n_steps=1, decode_only=True
            )
            n += 1
            for t_pad in self.config.token_buckets:
                self._warm_step_variant(
                    t_pad=t_pad, p_bucket=pb, n_steps=1, decode_only=False
                )
                n += 1
        return n

    def beam_search(self, prompt, **kw):
        """Beam search (reference sampling/beam.rs; see engine/beam_search)."""
        from .beam_search import beam_search

        return beam_search(self, prompt, **kw)

    # -- embeddings ------------------------------------------------------------

    def embed(
        self,
        inputs: list[str | list[int]],
        *,
        pooling: str = "mean",
        normalize: bool = True,
    ) -> np.ndarray:
        """Pooled embeddings (reference handle.rs embed / EngineCommand::
        Embed one-shot path)."""
        from .embedding import engine_embed

        token_lists = []
        for x in inputs:
            if isinstance(x, str):
                if self.tokenizer is None:
                    raise ValueError("string input requires a tokenizer")
                token_lists.append(self.tokenizer.encode(x))
            else:
                token_lists.append(list(x))
        return engine_embed(
            self, token_lists, pooling=pooling, normalize=normalize
        )

    # -- convenience -----------------------------------------------------------

    def generate(
        self,
        prompts: list[str | list[int]],
        params: SamplingParams | list[SamplingParams] | None = None,
        *,
        timeout_s: float = 600.0,
    ) -> list[RequestOutput]:
        """Synchronous batch generation (reference engine/mod.rs generate)."""
        if params is None:
            params = SamplingParams()
        param_list = params if isinstance(params, list) else [params] * len(prompts)
        finals: dict[str, RequestOutput] = {}
        tag = self._step_count
        for i, (prompt, p) in enumerate(zip(prompts, param_list)):
            self.add_request(f"gen-{tag}-{i}", prompt, p)
        deadline = time.monotonic() + timeout_s
        while self.has_unfinished:
            if time.monotonic() > deadline:
                raise TimeoutError("generate() exceeded timeout")
            for out in self.step():
                if out.finished:
                    finals[out.request_id] = out
        ordered = sorted(
            finals.values(), key=lambda o: int(o.request_id.rsplit("-", 1)[1])
        )
        return ordered
