"""Jitted speculative verification step.

The target model scores the whole [last_token, d_1..d_K] window in one
forward (reference speculative.rs:763 execute_decodes); verification and
the correction/bonus sample happen on device, and the step returns ONE
packed fetch: sampled tokens at every position [S, K+1], accepted counts
[S], chosen logprobs, and (optionally) next-step drafts from in-step
draft heads (Medusa/EAGLE-style).

Acceptance (reference AcceptanceMethod, engine/types.rs:133):

- ``sample`` (default): every window position j draws a full sample from
  the request's sampling distribution, seeded statelessly at the token's
  absolute position; draft j is accepted iff it equals that sample. For
  greedy rows this is exact-prefix greedy verification; for stochastic
  rows it is rejection sampling specialised to deterministic (delta)
  proposals — accept with prob p(d_j), and on rejection the emitted
  sample is already distributed as the residual p conditioned on != d_j.
  Because the sampler RNG is a pure function of (seed, position), the
  emitted stream is BYTE-IDENTICAL to the non-speculative engine.
- ``typical``: typical acceptance (reference gpu_verify_typical,
  speculative.rs:230-358) — accept d_j iff p(d_j) >= min(threshold,
  alpha * exp(-entropy(p_j))); recovery token is the argmax. Applies to
  stochastic rows only (greedy rows keep exact matching).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..engine.batch_pack import PackLayout, unpack_device
from ..sampling.sampler import apply_grammar_mask, sample_tokens

TYPICAL_THRESHOLD = 0.09  # posterior_threshold (vLLM defaults)
TYPICAL_ALPHA = 0.3  # posterior_alpha


class SpecStepFunction:
    def __init__(
        self,
        model,
        eos_ids: tuple[int, ...] = (),
        head_fn=None,
        aux=None,
        acceptance: str = "sample",
    ):
        self.model = model
        self.eos_ids = eos_ids
        self.head_fn = head_fn  # (head_params, hidden [S,H]) -> drafts [S,Kn]
        self.aux = aux  # in-step draft module (EAGLE/MTP): device_run(...)
        assert head_fn is None or aux is None
        assert acceptance in ("sample", "typical")
        self.acceptance = acceptance
        self._jit = jax.jit(
            self._step,
            static_argnames=(
                "layout", "k1", "use_penalties", "use_top_filters", "use_mm",
                "use_grammar", "use_tree",
            ),
            donate_argnames=("kv_pages", "token_counts", "aux_kv"),
        )

    def _step(
        self,
        params,
        kv_pages,
        meta: jax.Array,
        gather_idx: jax.Array,  # [S, K1] token-axis indices for logits
        drafts: jax.Array,  # [S, K] draft token ids (-1 = none)
        ban_rem: jax.Array,  # [S] i32 remaining min_tokens (EOS ban horizon)
        next_hint: jax.Array,  # [S] next known token (-1 = use the sample)
        token_counts: jax.Array,
        head_params,
        aux_kv,
        mm_buf: jax.Array,  # [num_slots+1, max_mm, H] multimodal embeds
        mm_idx: jax.Array,  # [T] index into the row's mm embeds (-1 none)
        grammar_masks: jax.Array,  # [S, K1, words] per-position masks
        copy_pairs: jax.Array,  # [MAXP, 2] (src_page, dst_page) for tree rows
        *,
        layout: PackLayout,
        k1: int,
        use_penalties: bool,
        use_top_filters: bool,
        use_mm: bool = False,
        use_grammar: bool = False,
        use_tree: bool = False,
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
            _lp_targets,
            _watch_eos,
            _watch_stop,
        ) = unpack_device(meta, layout)  # full page width (sync path)
        s = slot_ids.shape[0]

        model_kwargs = {}
        if use_mm:
            # multimodal embedding injection: image-span tokens take their
            # slot's projected vision embeddings (engine/vlm.py fills the
            # buffer once per request at slot assignment)
            t = input_ids.shape[0]
            tok_idx = jnp.arange(t, dtype=jnp.int32)
            seq_of = jnp.clip(
                jnp.searchsorted(md.cu_q_lens, tok_idx, side="right") - 1,
                0,
                s - 1,
            )
            null_row = mm_buf.shape[0] - 1
            slot_of = jnp.where(mm_idx >= 0, slot_ids[seq_of], null_row)
            override = mm_buf[slot_of, jnp.maximum(mm_idx, 0)]
            model_kwargs["embeds"] = (mm_idx >= 0, override)
        if use_tree:
            # tree verification (reference tree_attention.rs, re-designed
            # as root-path batch rows): alternate paths write their window
            # KV into scratch pages; a window that starts mid-page needs
            # the committed tokens of that boundary page copied into the
            # scratch copy first. Null pairs are (0, 0) — a no-op on the
            # null page.
            src, dst = copy_pairs[:, 0], copy_pairs[:, 1]
            kv_pages = [p.at[dst].set(p[src]) for p in kv_pages]
        out = self.model(params, input_ids, md, kv_pages, **model_kwargs)
        if len(out) == 3:
            # EAGLE-3: concatenated aux residual-stream features ride along
            hidden, kv_pages, aux_feats = out
        else:
            hidden, kv_pages = out
            aux_feats = None
        sel = hidden[gather_idx.reshape(-1)]  # [S*K1, H]
        logits = self.model.compute_logits(params, sel).reshape(s, k1, -1)

        if use_grammar:
            # spec x grammar (reference speculative.rs grammar rollback):
            # position j's logits are masked with the DFA state reached
            # after accepting drafts 1..j (host-advanced along the draft
            # path); a grammar-violating draft then mismatches the masked
            # sample and is rejected by prefix acceptance — the standard
            # trim-to-accepted rollback needs no extra machinery
            logits = jnp.stack(
                [
                    apply_grammar_mask(logits[:, j, :], grammar_masks[:, j, :])
                    for j in range(k1)
                ],
                axis=1,
            )

        # position 0 honours the request's full sampling params + penalty
        # counts (identical to the non-spec sampler call for this token)
        counts = token_counts[slot_ids] if use_penalties else None
        cols = [
            sample_tokens(
                logits[:, 0, :],
                sampler_inputs,
                counts,
                self.eos_ids,
                use_penalties=use_penalties,
                use_top_filters=use_top_filters,
            )[0]
        ]
        # positions 1..K: same params, RNG position advanced by j so the
        # stream matches what the non-spec engine would draw token-by-token
        for j in range(1, k1):
            si_j = replace(
                sampler_inputs,
                position=sampler_inputs.position + j,
                ban_eos=ban_rem > j,
            )
            cols.append(
                sample_tokens(
                    logits[:, j, :],
                    si_j,
                    None,
                    self.eos_ids,
                    use_penalties=False,
                    use_top_filters=use_top_filters,
                )[0]
            )
        sampled = jnp.stack(cols, axis=1)  # [S, K1]

        if self.acceptance == "typical" and k1 > 1:
            # typical acceptance for stochastic rows: threshold test on the
            # draft's posterior prob; recovery token = argmax
            temp = jnp.maximum(sampler_inputs.temperature, 1e-6)[:, None, None]
            probs = jax.nn.softmax(logits / temp, axis=-1)  # [S, K1, V]
            entropy = -jnp.sum(
                probs * jnp.log(jnp.clip(probs, 1e-20, None)), axis=-1
            )  # [S, K1]
            d_safe = jnp.maximum(drafts, 0)
            p_d = jnp.take_along_axis(
                probs[:, :-1, :], d_safe[:, :, None], axis=-1
            )[..., 0]  # [S, K]
            thr = jnp.minimum(
                TYPICAL_THRESHOLD, TYPICAL_ALPHA * jnp.exp(-entropy[:, :-1])
            )
            ok = (p_d >= thr) & (drafts >= 0)
            argmax_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            stoch = sampler_inputs.temperature[:, None] > 0.0
            # rejected REAL drafts recover with the argmax; positions with
            # no draft (padding -1: correction/bonus slots) and the final
            # bonus position keep the full seeded sample
            recovery = jnp.where(drafts >= 0, argmax_tok[:, :-1], sampled[:, :-1])
            typ_sampled = jnp.concatenate(
                [jnp.where(ok, drafts, recovery), sampled[:, -1:]], axis=1
            )
            sampled = jnp.where(stoch, typ_sampled, sampled)

        # prefix acceptance: draft j is accepted iff it equals the sample
        # at position j-1 and all earlier drafts were accepted
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
        parts = [
            sampled.reshape(-1),
            acc_len.astype(jnp.int32),
            jax.lax.bitcast_convert_type(logprobs, jnp.int32).reshape(-1),
        ]
        acc_idx = jnp.minimum(acc_len, k1 - 1)
        last_emitted = jnp.where(
            next_hint >= 0, next_hint, sampled[jnp.arange(s), acc_idx]
        )
        if self.head_fn is not None:
            # in-step draft heads (Medusa / MLP speculator): drafts for the
            # NEXT window come from the hidden state of the last emitted
            # position — no extra forward, no host round-trip
            hid = hidden[gather_idx[jnp.arange(s), acc_idx]]
            next_drafts = self.head_fn(head_params, hid, last_emitted)
            parts.append(next_drafts.astype(jnp.int32).reshape(-1))
        elif self.aux is not None:
            # in-step autoregressive draft module (EAGLE/MTP/EAGLE-3):
            # window pass over the target hiddens + K-round propose chain
            aux_kv, next_drafts = self.aux.device_run(
                head_params,
                params,
                aux_kv,
                aux_feats if aux_feats is not None else hidden,
                input_ids,
                md,
                last_emitted,
                acc_idx,
                gather_idx,
            )
            parts.append(next_drafts.astype(jnp.int32).reshape(-1))
        packed = jnp.concatenate(parts)
        return kv_pages, token_counts, aux_kv, packed

    def __call__(
        self, *args, layout, k1, use_penalties, use_top_filters,
        use_mm=False, use_grammar=False, use_tree=False,
    ):
        return self._jit(
            *args,
            layout=layout,
            k1=k1,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
            use_mm=use_mm,
            use_grammar=use_grammar,
            use_tree=use_tree,
        )
