"""The unified jitted engine step.

One call = model forward over the flattened mixed batch + last-position
gather + on-device sampling + penalty-count update. KV pools and the
count matrix are donated, so XLA updates them in place. This replaces
the reference's per-mode execution strategies + CUDA-graph capture
(engine/standard.rs, cuda_graph_runner.rs): bucketed static shapes give
the same "compile once, replay forever" property natively.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.attn_metadata import AttentionMetadata
from ..sampling.sampler import SamplerInputs, sample_tokens


class StepFunction:
    def __init__(self, model, eos_ids: tuple[int, ...] = ()):
        self.model = model
        self.eos_ids = eos_ids
        self._jit = jax.jit(
            self._step,
            static_argnames=("use_penalties", "use_top_filters"),
            donate_argnames=("kv_pages", "token_counts"),
        )

    def _step(
        self,
        params,
        kv_pages: list[jax.Array],
        input_ids: jax.Array,  # [T]
        md: AttentionMetadata,
        sampler_inputs: SamplerInputs,  # [S]
        slot_ids: jax.Array,  # [S] i32 persistent engine slots
        sample_mask: jax.Array,  # [S] bool — real sample this step
        token_counts: jax.Array,  # [num_slots, V] i32
        *,
        use_penalties: bool,
        use_top_filters: bool,
    ):
        hidden, kv_pages = self.model(params, input_ids, md, kv_pages)
        sel = hidden[md.logits_indices]  # [S, H]
        logits = self.model.compute_logits(params, sel)  # [S, V] f32

        counts = token_counts[slot_ids] if use_penalties else None
        tokens, logprobs = sample_tokens(
            logits,
            sampler_inputs,
            counts,
            self.eos_ids,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
        )
        if use_penalties:
            token_counts = token_counts.at[slot_ids, tokens].add(
                sample_mask.astype(jnp.int32), mode="drop"
            )
        return kv_pages, token_counts, tokens, logprobs

    def __call__(
        self,
        params,
        kv_pages,
        input_ids,
        md,
        sampler_inputs,
        slot_ids,
        sample_mask,
        token_counts,
        *,
        use_penalties: bool,
        use_top_filters: bool,
    ):
        return self._jit(
            params,
            kv_pages,
            input_ids,
            md,
            sampler_inputs,
            slot_ids,
            sample_mask,
            token_counts,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
        )
