"""LLMEngine: the continuous-batching host loop.

Reference: crates/core/src/engine/strategy.rs:426 run_engine_loop +
helpers.rs (admission, batch build, sampling glue). Per step:
schedule → build padded batch (numpy, host) → jitted unified step
(device) → sync sampled tokens [S] (the only per-step DtoH) → update
request state, detokenize, finish.

Shape discipline: token count padded to a token bucket, sequence count
to a seq bucket — each (T, S) pair is one XLA compilation, warmed at
boot (replaces CUDA-graph capture at batch sizes {1..32}, reference
warmup.rs).
"""

from __future__ import annotations

import logging
import time
import zlib
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..detokenizer import detokenize_incrementally, find_stop
from ..kv_cache.manager import KVCacheManager
from ..ops.attn_metadata import AttentionMetadata
from ..request import (
    FinishReason,
    RequestOutput,
    RequestStatus,
    SamplingParams,
    Sequence,
)
from ..sampling.sampler import SamplerInputs
from ..scheduler import ScheduledSeq, Scheduler
from ..utils import cdiv, pick_bucket
from .step_fn import StepFunction

logger = logging.getLogger(__name__)


class LLMEngine:
    def __init__(
        self,
        model,
        params,
        config: EngineConfig,
        tokenizer=None,
    ):
        self.model = model
        self.params = params
        self.config = config
        self.tokenizer = tokenizer

        self.kv = KVCacheManager(config.cache, model.kv_head_info)
        self.kv_pages = self.kv.create_device_pools(model.dtype)
        self.scheduler = Scheduler(config.scheduler, self.kv, config.max_model_len)

        eos_ids = set(config.model.eos_token_ids)
        if tokenizer is not None and getattr(tokenizer, "eos_token_id", None) is not None:
            eos_ids.add(tokenizer.eos_token_id)
        self.eos_ids = tuple(sorted(eos_ids))
        self.step_fn = StepFunction(model, self.eos_ids)

        n_slots = config.scheduler.max_num_seqs
        self._free_slots = list(range(n_slots))
        self.token_counts = jnp.zeros(
            (n_slots, config.model.vocab_size), jnp.int32
        )
        self.requests: dict[str, Sequence] = {}
        self._step_count = 0
        # engine stats (reference EngineStats, types.rs:392)
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
        return self.scheduler.has_work

    # -- the step ------------------------------------------------------------

    def step(self) -> list[RequestOutput]:
        decision = self.scheduler.schedule()
        self.stats["num_preemptions"] += len(decision.preempted)
        for seq in decision.preempted:
            self._release_slot(seq)
        if not decision.scheduled:
            return []

        scheduled = decision.scheduled
        for s in scheduled:
            if s.seq.slot < 0:
                self._assign_slot(s.seq)

        batch = self._build_batch(scheduled)
        (md, input_ids, sampler_inputs, slot_ids, sample_mask,
         use_penalties, use_top_filters) = batch

        self.kv_pages, self.token_counts, tokens, logprobs = self.step_fn(
            self.params,
            self.kv_pages,
            input_ids,
            md,
            sampler_inputs,
            slot_ids,
            sample_mask,
            self.token_counts,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
        )
        # the only per-step device→host transfer: S ints + S floats
        tokens_h = np.asarray(tokens)
        logprobs_h = np.asarray(logprobs)

        self._step_count += 1
        self.stats["num_steps"] += 1
        return self._process_outputs(scheduled, tokens_h, logprobs_h)

    # -- batch building --------------------------------------------------------

    def _build_batch(self, scheduled: list[ScheduledSeq]):
        cfg = self.config
        page_size = cfg.cache.page_size
        pages_per_seq = cfg.pages_per_seq

        total_tokens = sum(s.num_tokens for s in scheduled)
        t_pad = pick_bucket(total_tokens, cfg.token_buckets)
        s_pad = pick_bucket(len(scheduled), cfg.seq_buckets)

        input_ids = np.zeros(t_pad, np.int32)
        positions = np.zeros(t_pad, np.int32)
        slot_mapping = np.zeros(t_pad, np.int32)
        kv_lens = np.zeros(s_pad, np.int32)
        page_indices = np.zeros((s_pad, pages_per_seq), np.int32)
        cu_q_lens = np.zeros(s_pad + 1, np.int32)
        logits_indices = np.zeros(s_pad, np.int32)
        slot_ids = np.zeros(s_pad, np.int32)
        sample_mask = np.zeros(s_pad, bool)

        temperature = np.full(s_pad, 1.0, np.float32)
        top_k = np.zeros(s_pad, np.int32)
        top_p = np.ones(s_pad, np.float32)
        min_p = np.zeros(s_pad, np.float32)
        rep_pen = np.ones(s_pad, np.float32)
        pres_pen = np.zeros(s_pad, np.float32)
        freq_pen = np.zeros(s_pad, np.float32)
        seeds = np.zeros(s_pad, np.uint32)
        rng_pos = np.zeros(s_pad, np.int32)
        ban_eos = np.zeros(s_pad, bool)

        use_penalties = False
        use_top_filters = False

        offset = 0
        for i, s in enumerate(scheduled):
            seq, n = s.seq, s.num_tokens
            start = seq.num_computed_tokens
            end = start + n
            all_ids = seq.all_token_ids
            input_ids[offset : offset + n] = all_ids[start:end]
            positions[offset : offset + n] = np.arange(start, end)
            table = self.kv.get_table(seq)
            slot_mapping[offset : offset + n] = table.slots(start, end)
            kv_lens[i] = end
            pages = table.pages
            page_indices[i, : len(pages)] = pages
            cu_q_lens[i + 1] = cu_q_lens[i] + n
            logits_indices[i] = offset + n - 1
            slot_ids[i] = seq.slot
            sample_mask[i] = s.is_final_prompt_chunk

            p = seq.params
            temperature[i] = p.temperature
            top_k[i] = p.top_k
            top_p[i] = p.top_p
            min_p[i] = p.min_p
            rep_pen[i] = p.repetition_penalty
            pres_pen[i] = p.presence_penalty
            freq_pen[i] = p.frequency_penalty
            seeds[i] = self._seq_seed(seq)
            rng_pos[i] = end
            ban_eos[i] = seq.num_generated < p.min_tokens
            use_penalties |= p.uses_penalties
            use_top_filters |= (not p.greedy) and (
                p.top_k > 0 or p.top_p < 1.0 or p.min_p > 0.0
            )
            offset += n
        cu_q_lens[len(scheduled) + 1 :] = cu_q_lens[len(scheduled)]

        md = AttentionMetadata(
            slot_mapping=jnp.asarray(slot_mapping),
            kv_lens=jnp.asarray(kv_lens),
            page_indices=jnp.asarray(page_indices),
            cu_q_lens=jnp.asarray(cu_q_lens),
            num_seqs=jnp.asarray([len(scheduled)], jnp.int32),
            positions=jnp.asarray(positions),
            logits_indices=jnp.asarray(logits_indices),
        )
        sampler_inputs = SamplerInputs(
            temperature=jnp.asarray(temperature),
            top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p),
            min_p=jnp.asarray(min_p),
            repetition_penalty=jnp.asarray(rep_pen),
            presence_penalty=jnp.asarray(pres_pen),
            frequency_penalty=jnp.asarray(freq_pen),
            seed=jnp.asarray(seeds),
            position=jnp.asarray(rng_pos),
            ban_eos=jnp.asarray(ban_eos),
        )
        return (
            md,
            jnp.asarray(input_ids),
            sampler_inputs,
            jnp.asarray(slot_ids),
            jnp.asarray(sample_mask),
            use_penalties,
            use_top_filters,
        )

    def _seq_seed(self, seq: Sequence) -> int:
        if seq.params.seed is not None:
            return seq.params.seed & 0xFFFFFFFF
        # stable per-request default seed (stable across preemption)
        return (
            zlib.crc32(seq.request_id.encode()) ^ self.config.seed
        ) & 0xFFFFFFFF

    # -- output processing -----------------------------------------------------

    def _process_outputs(
        self,
        scheduled: list[ScheduledSeq],
        tokens: np.ndarray,
        logprobs: np.ndarray,
    ) -> list[RequestOutput]:
        outputs: list[RequestOutput] = []
        for i, s in enumerate(scheduled):
            seq = s.seq
            is_final_chunk = s.is_final_prompt_chunk  # BEFORE advancing state
            seq.num_computed_tokens += s.num_tokens
            if not is_final_chunk:
                continue  # mid-prompt chunk: sampled token is meaningless
            token = int(tokens[i])
            seq.generated_token_ids.append(token)
            self.stats["generated_tokens"] += 1

            new_text = ""
            if self.tokenizer is not None:
                new_text, seq.prefix_offset, seq.read_offset = (
                    detokenize_incrementally(
                        self.tokenizer,
                        seq.all_token_ids,
                        seq.prefix_offset or seq.num_prompt_tokens,
                        seq.read_offset or seq.num_prompt_tokens,
                    )
                )

            finish, stop_reason, emit_text = self._check_stop(seq, token, new_text)
            seq.output_text += emit_text

            out = RequestOutput(
                request_id=seq.request_id,
                new_token_ids=[token],
                new_text=emit_text,
                finished=finish is not None,
                finish_reason=finish,
                stop_reason=stop_reason,
                output_text=seq.output_text,
                token_ids=list(seq.generated_token_ids),
                logprobs=[float(logprobs[i])]
                if seq.params.logprobs is not None
                else None,
            )
            outputs.append(out)
            if finish is not None:
                self._finish(seq, finish, stop_reason)
        return outputs

    def _check_stop(
        self, seq: Sequence, token: int, new_text: str
    ) -> tuple[FinishReason | None, str | int | None, str]:
        p = seq.params
        min_ok = seq.num_generated >= p.min_tokens
        if min_ok and not p.ignore_eos and token in self.eos_ids:
            return FinishReason.STOP, None, ""
        if min_ok and token in p.stop_token_ids:
            return FinishReason.STOP, token, ""
        if p.stop and min_ok:
            stop_str, idx = find_stop(seq.output_text, new_text, p.stop)
            if stop_str is not None:
                keep = idx - len(seq.output_text)
                return FinishReason.STOP, stop_str, new_text[:max(keep, 0)]
        if seq.num_generated >= p.max_tokens:
            return FinishReason.LENGTH, None, new_text
        if seq.total_len >= self.config.max_model_len:
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
                row[t] += 1
            self.token_counts = self.token_counts.at[seq.slot].set(
                jnp.asarray(row)
            )
        else:
            self.token_counts = self.token_counts.at[seq.slot].set(0)

    def _release_slot(self, seq: Sequence) -> None:
        if seq.slot >= 0:
            self._free_slots.append(seq.slot)
            seq.slot = -1

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
        param_list = (
            params if isinstance(params, list) else [params] * len(prompts)
        )
        finals: dict[str, RequestOutput] = {}
        for i, (prompt, p) in enumerate(zip(prompts, param_list)):
            self.add_request(f"gen-{self._step_count}-{i}", prompt, p)
        deadline = time.monotonic() + timeout_s
        while self.has_unfinished:
            if time.monotonic() > deadline:
                raise TimeoutError("generate() exceeded timeout")
            for out in self.step():
                if out.finished:
                    finals[out.request_id] = out
        ordered = sorted(finals.values(), key=lambda o: int(o.request_id.rsplit("-", 1)[1]))
        return ordered
