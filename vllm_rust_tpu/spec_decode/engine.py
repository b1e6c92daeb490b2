"""Speculative engine: synchronous propose → score → verify loop.

Reference: crates/core/src/engine/speculative.rs (SpeculativeExecution
:439, execute_decodes :763) + the KV-trim-to-accepted contract. The
engine steps synchronously (no token ring): each step proposes drafts
(host n-gram scan, batched draft-model pass, or stored in-step head
output), scores the [last, d_1..d_K] window on device, fetches the
packed (samples, accepted, logprobs, next-drafts) result, emits up to
K+1 tokens per sequence and rolls `num_computed_tokens` back to the
accepted length — rejected-draft KV entries are simply overwritten by
the next step (same pages, recomputed slot mapping).

Verification modes (see spec_decode/step.py): "sample" (greedy-exact for
greedy rows, rejection sampling for stochastic rows — both lossless) and
"typical" (threshold acceptance for stochastic rows).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import EngineConfig
from ..engine.engine import LLMEngine
from ..request import RequestOutput, Sequence
from ..scheduler import ScheduledSeq
from ..utils import pick_bucket
from .step import SpecStepFunction


class SpecLLMEngine(LLMEngine):
    def __init__(
        self,
        model,
        params,
        config: EngineConfig,
        tokenizer=None,
        proposer=None,
        acceptance_method: str = "sample",
    ):
        super().__init__(model, params, config, tokenizer)
        assert proposer is not None
        self.proposer = proposer
        if getattr(proposer, "wants_aux_hiddens", False):
            # EAGLE-3: the target must surface multi-layer features
            model.aux_hidden_layers = tuple(
                proposer.aux_layer_ids(model.num_layers)
            )
        if hasattr(proposer, "bind"):
            proposer.bind(self)
        self.k = proposer.max_draft_tokens
        head_fn = getattr(proposer, "device_head_fn", None)
        aux = getattr(proposer, "device_aux", None)
        self.head_params = getattr(proposer, "device_params", None)
        if (head_fn is not None or aux is not None) and self.head_params is None:
            raise ValueError("proposer has device heads but no params loaded")
        self.spec_step_fn = SpecStepFunction(
            model, self.eos_ids, head_fn=head_fn, aux=aux,
            acceptance=acceptance_method,
        )
        self._has_heads = head_fn is not None or aux is not None
        self._has_aux = aux is not None
        # tree verification (reference tree_attention.rs): proposers that
        # expose propose_paths get multi-branch verification via extra
        # batch rows on scratch pages (greedy, unconstrained seqs only)
        self.tree_mode = bool(getattr(proposer, "proposes_trees", False))
        self.MAX_COPY_PAIRS = 16
        # decode steps claim a K+1 token window (penalty-free requests;
        # clamped near max_model_len). Penalized requests fall back to
        # width 1: penalty counts would change within the window.
        def _width(seq):
            if seq.params.uses_penalties:
                return 1
            return max(
                1,
                min(self.k + 1, self.config.max_model_len - seq.num_computed_tokens),
            )

        self.scheduler.decode_width = _width
        self.stats["draft_tokens"] = 0
        self.stats["accepted_tokens"] = 0
        self.stats["tree_alt_rows"] = 0


    # -- synchronous spec stepping --------------------------------------------

    def step(self) -> list[RequestOutput]:
        decision = self.scheduler.schedule()
        self.stats["num_preemptions"] += len(decision.preempted)
        for seq in decision.preempted:
            self._release_slot(seq)
            if hasattr(self.proposer, "on_preempt"):
                self.proposer.on_preempt(seq)
        if not decision.scheduled:
            return []
        for s in decision.scheduled:
            if s.seq.slot < 0:
                self._assign_slot(s.seq)
        return self._spec_dispatch_and_process(decision.scheduled)

    def _build_mm(self, scheduled: list[ScheduledSeq], t_pad: int):
        """Multimodal hook: (mm_buf, mm_idx [t_pad]) or None. Overridden
        by the VLM engine (engine/vlm.py)."""
        return None

    def _propose_all(
        self, scheduled: list[ScheduledSeq]
    ) -> dict[int, list[int]]:
        """Collect decode windows and propose for all of them at once
        (one device pass for model-based proposers)."""
        windows: list[tuple[int, Sequence, int]] = []
        for i, sch in enumerate(scheduled):
            seq, n = sch.seq, sch.num_tokens
            if seq.num_computed_tokens == seq.total_len - 1 and n > 1:
                windows.append((i, seq, n))
        if not windows:
            return {}
        if hasattr(self.proposer, "propose_batch"):
            drafts = self.proposer.propose_batch([(s, n) for _, s, n in windows])
        else:
            drafts = [self.proposer.propose(s)[: n - 1] for _, s, n in windows]
        return {i: d[: n - 1] for (i, _, n), d in zip(windows, drafts)}

    def _spec_dispatch_and_process(
        self, scheduled: list[ScheduledSeq]
    ) -> list[RequestOutput]:
        cfg = self.config
        s_pad = self.num_slots
        k1 = self.k + 1

        proposed = self._propose_all(scheduled)

        # plan alternate tree paths (row/token budget permitting)
        alt_plan: list[tuple[int, list[int]]] = []  # (scheduled idx, path)
        if self.tree_mode:
            rows_left = s_pad - len(scheduled)
            pairs_left = self.MAX_COPY_PAIRS
            for i, sch in enumerate(scheduled):
                seq, n = sch.seq, sch.num_tokens
                if (
                    n <= 1
                    or seq.num_computed_tokens != seq.total_len - 1
                    or seq.constraint is not None
                    or not seq.params.greedy
                    or seq.params.uses_penalties
                ):
                    continue
                for path in self.proposer.propose_paths(seq)[1:]:
                    path = [t for t in path[: n - 1]]
                    if not path or rows_left <= 0 or pairs_left <= 0:
                        break
                    alt_plan.append((i, path))
                    rows_left -= 1
                    pairs_left -= 1

        total_tokens = sum(s.num_tokens for s in scheduled) + sum(
            scheduled[i].num_tokens for i, _ in alt_plan
        )
        t_pad = pick_bucket(total_tokens, cfg.token_buckets)
        hb = self._host_batch(t_pad)
        hb.header[1] = len(scheduled) + len(alt_plan)

        gather_idx = np.zeros((s_pad, k1), np.int32)
        drafts = np.full((s_pad, self.k), -1, np.int32)
        ban_rem = np.zeros(s_pad, np.int32)
        next_hint = np.full(s_pad, -1, np.int32)
        use_penalties = False
        use_top_filters = False
        use_grammar = any(s.seq.constraint is not None for s in scheduled)
        grammar_masks = None
        if use_grammar:
            # per-position masks; unconstrained rows/positions all-ones
            grammar_masks = np.full(
                (s_pad, k1, self._mask_words), -1, np.int32
            )
        entries = []  # (seq, row, start, n, n_drafts, is_final_chunk, is_decode)
        row_env: dict[int, tuple] = {}  # i -> (start, n, table) for alt rows

        offset = 0
        for i, sch in enumerate(scheduled):
            seq, n = sch.seq, sch.num_tokens
            if seq.swapped:
                self.kv.offload.swap_in(
                    seq.request_id, self.kv.get_table(seq).pages
                )
                seq.swapped = False
            start = seq.num_computed_tokens
            is_decode = start == seq.total_len - 1
            if is_decode and n > 1:
                # fill the window with drafts (pad -1 → never accepted)
                d = proposed.get(i, [])
                if seq.constraint is not None:
                    # truncate the draft chain at the first grammar-dead
                    # token; masks follow the host-advanced DFA states
                    c, st = seq.constraint, seq.constraint_state
                    grammar_masks[i, 0] = c.mask(st)
                    kept = []
                    for j, dj in enumerate(d):
                        nxt = (
                            st if dj in self.eos_ids
                            else c.advance(st, int(dj))
                        )
                        if nxt == c.dfa.DEAD:
                            break
                        kept.append(dj)
                        st = nxt
                        grammar_masks[i, j + 1] = c.mask(st)
                    d = kept
                drafts[i, : len(d)] = d
                n_drafts = n - 1
                chunk = [seq.all_token_ids[start]] + [
                    int(drafts[i, j]) if drafts[i, j] >= 0 else 0
                    for j in range(n - 1)
                ]
                self.stats["draft_tokens"] += len(d)
            else:
                n_drafts = 0
                chunk = seq.all_token_ids[start : start + n]
                if seq.constraint is not None:
                    grammar_masks[i, 0] = seq.constraint.mask(
                        seq.constraint_state
                    )
            end = start + n

            hb.input_ids[offset : offset + n] = chunk
            hb.positions[offset : offset + n] = np.arange(start, end)
            if self._use_mrope:
                self._fill_mrope(hb, offset, n, start, end, seq)
            table = self.kv.get_table(seq)
            hb.slot_mapping[offset : offset + n] = table.slots(start, end)
            hb.kv_lens[i] = end
            hb.page_indices[i, : len(table.pages)] = table.pages
            hb.cu_q_lens[i + 1] = hb.cu_q_lens[i] + n
            hb.logits_indices[i] = offset + n - 1
            hb.slot_ids[i] = seq.slot
            is_final_chunk = sch.is_final_prompt_chunk
            hb.sample_mask[i] = is_final_chunk

            if is_decode:
                gather_idx[i] = offset + np.arange(k1).clip(0, n - 1)
            else:
                gather_idx[i] = offset + n - 1  # duplicate last position

            p = seq.params
            hb.temperature[i] = p.temperature
            hb.top_k[i] = p.top_k
            hb.top_p[i] = p.top_p
            hb.min_p[i] = p.min_p
            hb.repetition_penalty[i] = p.repetition_penalty
            hb.presence_penalty[i] = p.presence_penalty
            hb.frequency_penalty[i] = p.frequency_penalty
            hb.seeds[i] = self._seq_seed(seq)
            hb.rng_pos[i] = seq.total_len
            # tri-state (batch_pack): 2 = ban EOS; spec decode never uses
            # the device EOS-watch (1), so 0 otherwise
            hb.ban_eos[i] = 2 if seq.num_generated < p.min_tokens else 0
            ban_rem[i] = max(0, p.min_tokens - seq.num_generated)
            if not is_final_chunk and not is_decode:
                # non-final prefill chunk: the draft module's next-token
                # stream ends with a KNOWN token, not this step's sample
                next_hint[i] = seq.all_token_ids[end]
            use_penalties |= p.uses_penalties
            use_top_filters |= (not p.greedy) and (
                p.top_k > 0 or p.top_p < 1.0 or p.min_p > 0.0
            )
            entries.append((seq, i, start, n, n_drafts, is_final_chunk, is_decode))
            row_env[i] = (start, n, table)
            offset += n
        # ---- alternate tree-path rows (scratch-page writes) ----------
        copy_pairs = np.zeros((self.MAX_COPY_PAIRS, 2), np.int32)
        tree_alt: dict[int, list[tuple[int, int]]] = {}  # i -> [(row, nd)]
        scratch_allocated: list[int] = []
        ps = cfg.cache.page_size
        r = len(scheduled)
        n_pairs = 0
        kept_plan = []
        for i, path in alt_plan:
            seq = scheduled[i].seq
            start, n, table = row_env[i]
            end = start + n
            first_pg, last_pg = start // ps, (end - 1) // ps
            need = last_pg - first_pg + 1
            if self.kv.pool.num_free < need:
                continue  # no scratch room: this path is skipped
            spages = self.kv.pool.allocate(need)
            scratch_allocated.extend(spages)
            kept_plan.append((i, path, r))

            chunk = [seq.all_token_ids[start]] + [int(t) for t in path]
            chunk += [0] * (n - len(chunk))
            hb.input_ids[offset : offset + n] = chunk
            hb.positions[offset : offset + n] = np.arange(start, end)
            if self._use_mrope:
                self._fill_mrope(hb, offset, n, start, end, seq)
            pages_row = np.array(hb.page_indices[i], np.int32)
            for k_, pg in enumerate(range(first_pg, last_pg + 1)):
                pages_row[pg] = spages[k_]
            hb.page_indices[r, : len(pages_row)] = pages_row
            hb.slot_mapping[offset : offset + n] = [
                pages_row[p_ // ps] * ps + p_ % ps for p_ in range(start, end)
            ]
            if start % ps != 0:
                # boundary page holds committed tokens: copy it into the
                # scratch page so attention sees them
                copy_pairs[n_pairs] = (table.pages[first_pg], spages[0])
                n_pairs += 1
            hb.kv_lens[r] = end
            hb.cu_q_lens[r + 1] = hb.cu_q_lens[r] + n
            hb.logits_indices[r] = offset + n - 1
            hb.slot_ids[r] = seq.slot
            hb.sample_mask[r] = 0  # counts updated by the primary row only
            gather_idx[r] = offset + np.arange(k1).clip(0, n - 1)
            nd = len(path)
            drafts[r, :nd] = path
            p = seq.params
            hb.temperature[r] = p.temperature
            hb.top_k[r] = p.top_k
            hb.top_p[r] = p.top_p
            hb.min_p[r] = p.min_p
            hb.seeds[r] = self._seq_seed(seq)
            hb.rng_pos[r] = seq.total_len
            hb.ban_eos[r] = 2 if seq.num_generated < p.min_tokens else 0
            ban_rem[r] = max(0, p.min_tokens - seq.num_generated)
            tree_alt.setdefault(i, []).append((r, nd))
            self.stats["draft_tokens"] += nd
            self.stats["tree_alt_rows"] += 1
            offset += n
            r += 1
        use_tree = bool(kept_plan)
        hb.header[1] = r
        hb.cu_q_lens[r + 1 :] = hb.cu_q_lens[r]

        aux_kv = self.proposer.kv_pages if self._has_aux else ()
        mm = self._build_mm(scheduled, t_pad)
        self.kv_pages, self.token_counts, aux_kv, packed = self.spec_step_fn(
            self.params,
            self.kv_pages,
            jnp.asarray(hb.buf.copy()),
            jnp.asarray(gather_idx),
            jnp.asarray(drafts),
            jnp.asarray(ban_rem),
            jnp.asarray(next_hint),
            self.token_counts,
            self.head_params,
            aux_kv,
            mm[0] if mm else self._dummy_mask,
            mm[1] if mm else self._dummy_mask[0],
            jnp.asarray(grammar_masks)
            if use_grammar
            else self._dummy_mask[None],
            jnp.asarray(copy_pairs),
            layout=hb.layout,
            k1=k1,
            use_penalties=use_penalties,
            use_top_filters=use_top_filters,
            use_mm=mm is not None,
            use_grammar=use_grammar,
            use_tree=use_tree,
        )
        if self._has_aux:
            self.proposer.kv_pages = aux_kv
        packed_h = np.asarray(packed)
        sampled = packed_h[: s_pad * k1].reshape(s_pad, k1)
        acc = packed_h[s_pad * k1 : s_pad * k1 + s_pad]
        lp_end = s_pad * k1 + s_pad + s_pad * k1
        logprobs = (
            packed_h[s_pad * k1 + s_pad : lp_end].view(np.float32).reshape(s_pad, k1)
        )
        next_drafts = (
            packed_h[lp_end:].reshape(s_pad, -1) if self._has_heads else None
        )

        if scratch_allocated:
            # synchronous engine: the packed result is already fetched,
            # scratch KV is no longer referenced
            self.kv.pool.free(scratch_allocated)

        self._step_count += 1
        self.stats["num_steps"] += 1
        return self._process_spec(
            entries, sampled, acc, logprobs, next_drafts, tree_alt
        )

    def _process_spec(self, entries, sampled, acc, logprobs, next_drafts,
                      tree_alt=None):
        outputs: list[RequestOutput] = []
        for seq, row, start, n, n_drafts, is_final_chunk, is_decode in entries:
            if not is_final_chunk:
                seq.num_computed_tokens = start + n
                continue
            a = int(min(acc[row], n_drafts)) if is_decode else 0
            alt_won = False
            if tree_alt and is_decode and row in tree_alt:
                # pick the path with the longest accepted prefix; ties go
                # to the primary path (its KV lives in the real pages)
                for r2, nd2 in tree_alt[row]:
                    a2 = int(min(acc[r2], nd2))
                    if a2 > a:
                        a, row, alt_won = a2, r2, True
            self.stats["accepted_tokens"] += a
            emit = [int(sampled[row, j]) for j in range(a + 1)]
            if is_decode and alt_won:
                # winning KV lives in freed scratch pages: roll back and
                # let the next step recompute the emitted tokens into the
                # real pages (recompute-preemption semantics, contract #3)
                seq.num_computed_tokens = start
            elif is_decode:
                # KV valid up to last accepted draft + 1 (trim-to-accepted)
                seq.num_computed_tokens = start + a + 1
            else:
                # prefill final chunk: whole chunk valid, 1 token emitted
                seq.num_computed_tokens = start + n
            self.kv.register_computed(seq)
            if next_drafts is not None:
                # in-step heads proposed for the NEXT window, conditioned on
                # the hidden state of the last emitted position
                self.proposer.store(seq, [int(t) for t in next_drafts[row]])
            out = self._emit_tokens(
                seq, emit, [float(logprobs[row, j]) for j in range(a + 1)]
            )
            outputs.extend(out)
            self.proposer.on_tokens_verified(seq, a)
        return outputs

    def _emit_tokens(self, seq: Sequence, tokens, lps) -> list[RequestOutput]:
        outs = []
        from ..request import FinishReason

        for tok, lp in zip(tokens, lps):
            if seq.finish_reason is not None:
                break
            seq.generated_token_ids.append(tok)
            self.stats["generated_tokens"] += 1
            if seq.constraint is not None and tok not in self.eos_ids:
                seq.constraint_state = seq.constraint.advance(
                    seq.constraint_state, tok
                )
            new_text = ""
            if self.tokenizer is not None:
                from ..detokenizer import detokenize_incrementally

                new_text, seq.prefix_offset, seq.read_offset = (
                    detokenize_incrementally(
                        self.tokenizer,
                        seq.all_token_ids,
                        seq.prefix_offset or seq.num_prompt_tokens,
                        seq.read_offset or seq.num_prompt_tokens,
                    )
                )
            finish, stop_reason, emit_text = self._check_stop(
                seq, tok, new_text, num_generated=seq.num_generated
            )
            seq.output_text += emit_text
            outs.append(
                RequestOutput(
                    request_id=seq.request_id,
                    new_token_ids=[tok],
                    new_text=emit_text,
                    finished=finish is not None,
                    finish_reason=finish,
                    stop_reason=stop_reason,
                    output_text=seq.output_text,
                    token_ids=list(seq.generated_token_ids),
                    logprobs=[lp] if seq.params.logprobs is not None else None,
                )
            )
            if finish is not None:
                # trim computed to the finished token (drop later drafts)
                seq.num_computed_tokens = min(
                    seq.num_computed_tokens, seq.total_len - 1
                )
                self.proposer.on_request_complete(seq)
                self._finish(seq, finish, stop_reason)
                break
        return outs

    @property
    def acceptance_rate(self) -> float:
        d = self.stats["draft_tokens"]
        return self.stats["accepted_tokens"] / d if d else 0.0
