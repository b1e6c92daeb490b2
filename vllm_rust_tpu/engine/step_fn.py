"""The unified jitted engine step with an on-device token ring.

One call = model forward over the flattened mixed batch + last-position
gather + on-device sampling + penalty-count update. KV pools, the count
matrix and the token ring are donated, so XLA updates them in place.

Token ring: sampled (token, logprob) rows accumulate in a device-resident
ring buffer [K, 2S]. The next step's decode inputs gather directly from
the ring (device-side token feedback — the reference's ADR 0017 deferred-
DtoH design taken further), and the host fetches a WHOLE ring in one
transfer every K steps instead of syncing per step. This amortizes the
dispatch→fetch round-trip (~27 ms over the axon tunnel, measured) across
K steps; the reference pays an analogous cost per CUDA-graph replay sync.

Multi-step decode windows (``n_steps`` > 1, r3): one dispatch runs
``n_steps`` decode iterations in a lax.fori_loop, evolving positions /
kv_lens / slot mappings ON DEVICE (the page tables are already
device-resident, so the next token's slot is one gather) and feeding
each iteration's sampled token straight into the next forward. This
removes the per-step packed-metadata H2D (~2.7 ms per transfer over the
tunnel — the single largest decode cost at c=16) and the per-step
dispatch. The reference's multi_step_count decode loop
(engine/strategy.rs hot loop) is the analogous design under CUDA graphs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..sampling.sampler import sample_tokens
from .batch_pack import PackLayout, unpack_device


class StepFunction:
    def __init__(
        self, model, eos_ids: tuple[int, ...] = (), top_logprobs_k: int = 8
    ):
        self.model = model
        self.eos_ids = eos_ids
        self.top_logprobs_k = top_logprobs_k
        self._jit = jax.jit(
            self._step,
            static_argnames=(
                "layout", "p_bucket", "use_penalties", "use_top_filters",
                "use_grammar", "use_lora", "decode_only", "use_bias",
                "use_typical", "use_top_logprobs", "use_prompt_logprobs",
                "use_eplb", "n_steps", "watch_stops",
            ),
            donate_argnames=("kv_pages", "token_counts", "ring",
                             "eplb_counts"),
        )

    def _forward_sample(
        self,
        params,
        kv_pages,
        input_ids,
        md,
        sampler_inputs,
        slot_ids,
        sample_mask,
        token_counts,
        grammar_mask,
        lora_idx,
        eplb_counts,
        *,
        use_penalties,
        use_top_filters,
        use_grammar,
        use_lora,
        decode_only,
        use_bias,
        use_typical,
        use_top_logprobs,
        use_eplb,
    ):
        """One forward + sample. Returns (kv_pages, token_counts,
        eplb_counts, hidden, res tuple)."""
        import contextlib

        from ..layers.linear import lora_context
        from ..ops.paged_attention import decode_mode

        ctx = contextlib.ExitStack()
        with ctx:
            if use_lora:
                ctx.enter_context(lora_context(lora_idx))
            if decode_only:
                ctx.enter_context(decode_mode())
            if use_eplb:
                # tracing-time sink: every moe_layer call contributes its
                # routing counts (parallel/eplb.py executor)
                from ..layers.moe import counts_sink

                sink = ctx.enter_context(counts_sink())
            hidden, kv_pages = self.model(params, input_ids, md, kv_pages)
        if use_eplb and sink:
            eplb_counts = eplb_counts + sum(sink)
        sel = hidden[md.logits_indices]  # [S, H]
        logits = self.model.compute_logits(params, sel)  # [S, V] f32

        counts = token_counts[slot_ids] if use_penalties else None
        res = sample_tokens(
            logits,
            sampler_inputs,
            counts,
            self.eos_ids,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
            grammar_mask=grammar_mask if use_grammar else None,
            use_bias=use_bias,
            use_typical=use_typical,
            top_logprobs_k=self.top_logprobs_k if use_top_logprobs else 0,
        )
        tokens = res[0]
        if use_penalties:
            token_counts = token_counts.at[slot_ids, tokens].add(
                sample_mask.astype(jnp.int32), mode="drop"
            )
        return kv_pages, token_counts, eplb_counts, hidden, res

    @staticmethod
    def _ring_row(res, use_top_logprobs: bool):
        tokens, logprobs = res[0], res[1]
        row = jnp.concatenate(
            [tokens, jax.lax.bitcast_convert_type(logprobs, jnp.int32)]
        )
        if use_top_logprobs:
            top_ids, top_lps = res[2], res[3]
            row = jnp.concatenate(
                [
                    row,
                    top_ids.reshape(-1),
                    jax.lax.bitcast_convert_type(
                        top_lps, jnp.int32
                    ).reshape(-1),
                ]
            )
        return row

    def _step(
        self,
        params,
        kv_pages: list[jax.Array],
        meta: jax.Array,  # packed int32 vector (batch_pack.PackLayout)
        token_counts: jax.Array,  # [num_slots, V] i32
        ring: jax.Array,  # [K, 2S] i32 — this cycle's output ring (donated)
        prev_ring: jax.Array,  # [K, 2S] i32 — previous cycle's ring (read)
        grammar_mask: jax.Array,  # [S, ceil(V/32)] i32 (dummy [1,1] when off)
        eplb_counts: jax.Array,  # [E] i32 accumulated expert loads (donated)
        *,
        layout: PackLayout,
        p_bucket: int,
        use_penalties: bool,
        use_top_filters: bool,
        use_grammar: bool,
        use_lora: bool,
        decode_only: bool,
        use_bias: bool,
        use_typical: bool,
        use_top_logprobs: bool,
        use_prompt_logprobs: bool,
        use_eplb: bool,
        n_steps: int = 1,
        watch_stops: bool = False,
    ):
        (
            ring_slot,
            input_ids,
            feedback_src,
            md,
            sampler_inputs,
            slot_ids,
            sample_mask,
            lora_idx,
            lp_targets,
            watch_eos,
            watch_stop,
        ) = unpack_device(meta, layout, p_bucket)
        s = slot_ids.shape[0]
        k = ring.shape[0]
        # Device-side token feedback: token slots whose id was produced by a
        # still-unfetched step gather from the ring. Flat index space:
        # [0, K*S) = current ring, [K*S, 2*K*S) = previous cycle's ring.
        ring_tokens = jnp.concatenate(
            [ring[:, :s].reshape(k * s), prev_ring[:, :s].reshape(k * s)]
        )
        fed = ring_tokens[jnp.clip(feedback_src, 0, 2 * k * s - 1)]
        input_ids = jnp.where(feedback_src >= 0, fed, input_ids)

        # paged-attention pools are rank-4 arrays in the kv_pages list;
        # SSM/hybrid layers contribute dicts of recurrent state (skip)
        first_paged = next(
            (p for p in kv_pages if hasattr(p, "ndim") and p.ndim == 4),
            None,
        )
        if decode_only and first_paged is not None:
            # Compact the live page list ONCE per dispatch for the
            # decode-v2 kernel (XLA won't hoist this out of the window
            # fori_loop below, and per-layer recompute defeats CSE in
            # scanned callers). End-of-window lens make one compaction
            # valid for every step: pages that fill mid-window are
            # masked per step by the kernel's kvpos < len check.
            from ..ops.pallas.decode_v2 import compact_decode_pages

            md = dataclasses.replace(
                md,
                decode_prepared=compact_decode_pages(
                    md.kv_lens + (n_steps - 1),
                    md.page_indices,
                    page_size=first_paged.shape[1],
                ),
            )

        fwd_flags = dict(
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
            use_grammar=use_grammar,
            use_lora=use_lora,
            decode_only=decode_only,
            use_bias=use_bias,
            use_typical=use_typical,
            use_top_logprobs=use_top_logprobs,
            use_eplb=use_eplb,
        )

        if n_steps > 1:
            # -- multi-step decode window -------------------------------
            # Requires: decode-only batch, token row j == scheduled seq
            # row j (one token per seq), no grammar / bias / lora /
            # logprob extras / eplb (the engine gates this).
            # SSM/hybrid pools are dicts of recurrent state — page size
            # comes from the first paged-attention pool (rank-4 array);
            # pure-SSM models never read slot_mapping, any value works.
            page_size = next(
                (p.shape[1] for p in kv_pages
                 if hasattr(p, "ndim") and p.ndim == 4),
                16,
            )
            t = input_ids.shape[0]
            m = min(t, md.page_indices.shape[0])
            mask_m = (jnp.arange(t, dtype=jnp.int32) < m) & (
                jnp.arange(t, dtype=jnp.int32)
                < md.num_seqs[0]
            )

            s = slot_ids.shape[0]
            real_seq = jnp.arange(s, dtype=jnp.int32) < md.num_seqs[0]
            eos_ids = tuple(self.eos_ids)

            def one(carry):
                (i, kv_pages, token_counts, ring, ids, positions, kv_lens,
                 slot_mapping, rng_pos, stopped) = carry
                md_i = dataclasses.replace(
                    md,
                    positions=positions,
                    kv_lens=kv_lens,
                    slot_mapping=slot_mapping,
                )
                si = dataclasses.replace(sampler_inputs, position=rng_pos)
                kv_pages, token_counts, _, _, res = self._forward_sample(
                    params, kv_pages, ids, md_i, si, slot_ids,
                    sample_mask, token_counts, grammar_mask, lora_idx,
                    eplb_counts, **fwd_flags,
                )
                row = self._ring_row(res, use_top_logprobs)
                ring = ring.at[ring_slot + i, : row.shape[0]].set(row)
                tokens = res[0]
                # on-device stop (reference helpers.rs:2746-2795 per-step
                # stop checks): a watched seq that just sampled EOS is
                # finished — its later window iterations stop writing KV
                # (null page) and, once EVERY real seq has stopped, the
                # while_loop exits instead of burning the window's tail.
                # Host-side stop strings/custom ids still resolve at ring
                # processing; this covers the model-EOS common case.
                is_eos = jnp.zeros((s,), bool)
                for e in eos_ids:
                    is_eos |= tokens == e
                hit = (watch_eos & is_eos) | (
                    (watch_stop >= 0) & (tokens == watch_stop)
                )
                stopped = stopped | (hit & real_seq)
                # evolve next-step metadata ON DEVICE: the next token of
                # seq j lands at position kv_lens[j]; its page comes from
                # the device-resident table (host preallocated the window)
                pg_slot = jnp.clip(
                    kv_lens // page_size, 0, md.page_indices.shape[1] - 1
                )
                page = jnp.take_along_axis(
                    md.page_indices, pg_slot[:, None], axis=1
                )[:, 0]
                seq_slots = jnp.where(
                    stopped[: page.shape[0]],
                    0,  # stopped seqs: overshoot KV goes to the null page
                    page * page_size + kv_lens % page_size,
                )
                next_slot_mapping = jnp.where(
                    mask_m,
                    jnp.zeros((t,), jnp.int32).at[:m].set(seq_slots[:m]),
                    jnp.zeros((t,), jnp.int32),  # padded rows: null page
                )
                next_ids = jnp.where(
                    mask_m,
                    jnp.zeros((t,), jnp.int32).at[:m].set(tokens[:m]),
                    0,
                )
                return (i + 1, kv_pages, token_counts, ring, next_ids,
                        positions + 1, kv_lens + 1, next_slot_mapping,
                        rng_pos + 1, stopped)

            def cond(carry):
                i, stopped = carry[0], carry[-1]
                return (i < n_steps) & ~jnp.all(stopped | ~real_seq)

            carry = (
                jnp.int32(0), kv_pages, token_counts, ring, input_ids,
                md.positions, md.kv_lens, md.slot_mapping,
                sampler_inputs.position, jnp.zeros((s,), bool),
            )
            if watch_stops:
                carry = jax.lax.while_loop(cond, one, carry)
            else:
                # nothing to stop on (ignore_eos traffic): a partially
                # UNROLLED fori lets XLA pipeline the next step's weight
                # prefetch across the iteration boundary (the while_loop
                # body is a pipeline barrier — r3 attributed ~1.3 ms/step
                # of window-boundary DMA waits)
                carry = jax.lax.fori_loop(
                    0, n_steps, lambda _i, c: one(c), carry,
                    unroll=min(4, n_steps),
                )
            kv_pages, token_counts, ring = carry[1], carry[2], carry[3]
            stopped = carry[-1]
            # tiny per-window stop summary: the engine polls it (async)
            # to rotate/fetch early instead of decoding to the cycle end
            n_stopped = jnp.sum(stopped.astype(jnp.int32)).reshape(1)
            return (kv_pages, token_counts, ring, n_stopped)

        kv_pages, token_counts, eplb_counts, hidden, res = (
            self._forward_sample(
                params, kv_pages, input_ids, md, sampler_inputs, slot_ids,
                sample_mask, token_counts, grammar_mask, lora_idx,
                eplb_counts, **fwd_flags,
            )
        )

        prompt_lps = None
        if use_prompt_logprobs:
            # echo / prompt logprobs (reference contract #4: only on the
            # original prefill): logprob of each position's NEXT prompt
            # token. Chunked over the token axis to bound the [chunk, V]
            # logits materialization for huge vocabularies.
            t = hidden.shape[0]
            chunk = min(128, t)

            def one_chunk(args):
                h_c, tgt_c = args
                lg = self.model.compute_logits(params, h_c)
                lp = jax.nn.log_softmax(lg, axis=-1)
                safe = jnp.clip(tgt_c, 0, lg.shape[-1] - 1)
                out = jnp.take_along_axis(lp, safe[:, None], axis=-1)[:, 0]
                return jnp.where(tgt_c >= 0, out, 0.0)

            prompt_lps = jax.lax.map(
                one_chunk,
                (
                    hidden.reshape(t // chunk, chunk, -1),
                    lp_targets.reshape(t // chunk, chunk),
                ),
            ).reshape(t)

        row = self._ring_row(res, use_top_logprobs)
        if use_top_logprobs:
            ring = ring.at[ring_slot].set(row)
        else:
            # top-logprob columns keep stale values — only read on steps
            # that set use_top_logprobs
            ring = ring.at[ring_slot, : row.shape[0]].set(row)
        outs = [kv_pages, token_counts, ring]
        if use_prompt_logprobs:
            outs.append(prompt_lps)
        if use_eplb:
            outs.append(eplb_counts)
        return tuple(outs)

    def __call__(
        self,
        *args,
        layout: PackLayout,
        p_bucket: int,
        use_penalties: bool,
        use_top_filters: bool,
        use_grammar: bool = False,
        use_lora: bool = False,
        decode_only: bool = False,
        use_bias: bool = False,
        use_typical: bool = False,
        use_top_logprobs: bool = False,
        use_prompt_logprobs: bool = False,
        use_eplb: bool = False,
        n_steps: int = 1,
        watch_stops: bool = False,
    ):
        return self._jit(
            *args,
            layout=layout,
            p_bucket=p_bucket,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
            use_grammar=use_grammar,
            use_lora=use_lora,
            decode_only=decode_only,
            use_bias=use_bias,
            use_typical=use_typical,
            use_top_logprobs=use_top_logprobs,
            use_prompt_logprobs=use_prompt_logprobs,
            use_eplb=use_eplb,
            n_steps=n_steps,
            watch_stops=watch_stops,
        )
