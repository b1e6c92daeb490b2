"""Jitted speculative verification step.

The target model scores the whole [last_token, d_1..d_K] window in one
forward (reference speculative.rs:763 execute_decodes); verification is
on-device greedy prefix-acceptance (AcceptanceMethod::Greedy,
types.rs:133): draft j is accepted iff it equals the model's sample at
position j-1 and all earlier drafts were accepted. The step returns, in
ONE packed fetch: sampled tokens at every position [S, K+1], accepted
counts [S], and chosen logprobs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.batch_pack import PackLayout, unpack_device
from ..sampling.sampler import sample_tokens


class SpecStepFunction:
    def __init__(self, model, eos_ids: tuple[int, ...] = ()):
        self.model = model
        self.eos_ids = eos_ids
        self._jit = jax.jit(
            self._step,
            static_argnames=("layout", "k1", "use_penalties", "use_top_filters"),
            donate_argnames=("kv_pages", "token_counts"),
        )

    def _step(
        self,
        params,
        kv_pages,
        meta: jax.Array,
        gather_idx: jax.Array,  # [S, K1] token-axis indices for logits
        drafts: jax.Array,  # [S, K] draft token ids (-1 = none)
        token_counts: jax.Array,
        *,
        layout: PackLayout,
        k1: int,
        use_penalties: bool,
        use_top_filters: bool,
    ):
        (
            _ring_slot,
            input_ids,
            _feedback,
            md,
            sampler_inputs,
            slot_ids,
            sample_mask,
            _lora_idx,
        ) = unpack_device(meta, layout)  # full page width (sync path)
        s = slot_ids.shape[0]

        hidden, kv_pages = self.model(params, input_ids, md, kv_pages)
        sel = hidden[gather_idx.reshape(-1)]  # [S*K1, H]
        logits = self.model.compute_logits(params, sel).reshape(s, k1, -1)

        # greedy samples at every position
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [S, K1]
        # position 0 honours the request's full sampling params
        counts = token_counts[slot_ids] if use_penalties else None
        first, _ = sample_tokens(
            logits[:, 0, :],
            sampler_inputs,
            counts,
            self.eos_ids,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
        )
        sampled = jnp.concatenate([first[:, None], greedy[:, 1:]], axis=1)

        # greedy prefix acceptance
        match = drafts == sampled[:, : k1 - 1]  # [S, K]
        acc_len = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)

        # chosen logprobs: logit - logsumexp per gathered row
        lse = jax.nn.logsumexp(logits, axis=-1)  # [S, K1]
        chosen = jnp.take_along_axis(logits, sampled[:, :, None], axis=-1)[..., 0]
        logprobs = chosen - lse

        if use_penalties:
            token_counts = token_counts.at[slot_ids, sampled[:, 0]].add(
                sample_mask.astype(jnp.int32), mode="drop"
            )
        packed = jnp.concatenate(
            [
                sampled.reshape(-1),
                acc_len.astype(jnp.int32),
                jax.lax.bitcast_convert_type(logprobs, jnp.int32).reshape(-1),
            ]
        )
        return kv_pages, token_counts, packed

    def __call__(self, *args, layout, k1, use_penalties, use_top_filters):
        return self._jit(
            *args,
            layout=layout,
            k1=k1,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
        )
