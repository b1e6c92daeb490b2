"""Beam search.

Reference: sampling/beam.rs (514 LoC) + per-beam block tables decoding
outside the regular batched path (engine/context.rs:18-26,
standard.rs:553-582). Synchronous one-shot routine (like embeddings):

  - the prompt is prefilled ONCE; its full KV pages are SHARED read-only
    across beams; only the partial tail page is copied per beam (beam
    writes land at positions >= prompt_len, which live in beam-private
    pages);
  - each step scores all live beams in one batched decode, takes
    per-beam top-W candidates on device, and re-ranks W*W candidates on
    host by cumulative logprob;
  - beam forks copy the parent's private tail page (device page copy);
  - finished beams (EOS) are set aside with length-penalty-normalized
    scores; search ends when no live beam can beat the worst kept
    finished score (or max_tokens).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attn_metadata import AttentionMetadata
from ..utils import cdiv, pick_bucket


@dataclass
class _Beam:
    tokens: list[int]  # generated tokens
    score: float  # cumulative logprob
    pages: list[int]  # private pages (beyond the shared prompt pages)


@dataclass
class BeamResult:
    token_ids: list[int]
    score: float  # length-normalized
    cumulative_logprob: float
    text: str | None = None


class _BeamRunner:
    def __init__(self, engine):
        self.engine = engine
        self._score_jit = jax.jit(self._score, static_argnames=("width",))
        self._copy_jit = jax.jit(self._copy_pages, donate_argnums=(0,))

    def _score(self, params, kv_pages, input_ids, md, *, width):
        hidden, kv_pages = self.engine.model(params, input_ids, md, kv_pages)
        logits = self.engine.model.compute_logits(
            params, hidden[md.logits_indices]
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        top_lp, top_id = jax.lax.top_k(logprobs, width)
        return kv_pages, top_lp, top_id.astype(jnp.int32)

    @staticmethod
    def _copy_pages(kv_pages, src, dst):
        return [pool.at[dst].set(pool[src]) for pool in kv_pages]


def beam_search(
    engine,
    prompt: list[int] | str,
    *,
    beam_width: int = 4,
    max_tokens: int = 64,
    length_penalty: float = 1.0,
    ignore_eos: bool = False,
) -> list[BeamResult]:
    """Run beam search against an (otherwise idle) engine's device state."""
    if isinstance(prompt, str):
        prompt = engine.tokenizer.encode(prompt)
    runner = engine._beam_runner if hasattr(engine, "_beam_runner") else None
    if runner is None:
        runner = _BeamRunner(engine)
        engine._beam_runner = runner

    cfg = engine.config
    ps = cfg.cache.page_size
    pages_per_seq = cfg.pages_per_seq
    s_pad = engine.num_slots
    n_prompt = len(prompt)
    eos = set(engine.eos_ids)

    def md_for(rows, offset_of, kv_len_of, positions, slot_mapping, n_tok, logits_at):
        t_pad = pick_bucket(n_tok, cfg.token_buckets)
        pad = lambda a, n, fill=0: np.concatenate(
            [np.asarray(a, np.int32), np.full(n - len(a), fill, np.int32)]
        )
        kv_lens = np.zeros(s_pad, np.int32)
        pg = np.zeros((s_pad, pages_per_seq), np.int32)
        cu = np.zeros(s_pad + 1, np.int32)
        li = np.zeros(s_pad, np.int32)
        for i, row in enumerate(rows):
            kv_lens[i] = kv_len_of[i]
            pg[i, : len(row)] = row
            cu[i + 1] = cu[i] + offset_of[i]
            li[i] = logits_at[i]
        cu[len(rows) + 1 :] = cu[len(rows)]
        return AttentionMetadata(
            slot_mapping=jnp.asarray(pad(slot_mapping, t_pad)),
            kv_lens=jnp.asarray(kv_lens),
            page_indices=jnp.asarray(pg),
            cu_q_lens=jnp.asarray(cu),
            num_seqs=jnp.asarray([len(rows)], jnp.int32),
            positions=jnp.asarray(pad(positions, t_pad)),
            logits_indices=jnp.asarray(li),
        ), t_pad

    pool = engine.kv.pool
    # -- prefill the prompt once ----------------------------------------------
    n_pages = cdiv(n_prompt, ps)
    prompt_pages = pool.allocate(n_pages)
    full_prompt_pages = prompt_pages[: n_prompt // ps]  # shared read-only
    tail_page = prompt_pages[len(full_prompt_pages):]  # 0 or 1 partial page
    slot_map = [
        prompt_pages[p // ps] * ps + p % ps for p in range(n_prompt)
    ]
    md, t_pad = md_for(
        rows=[prompt_pages],
        offset_of=[n_prompt],
        kv_len_of=[n_prompt],
        positions=list(range(n_prompt)),
        slot_mapping=slot_map,
        n_tok=n_prompt,
        logits_at=[n_prompt - 1],
    )
    ids = np.zeros(t_pad, np.int32)
    ids[:n_prompt] = prompt
    engine.kv_pages, top_lp, top_id = runner._score_jit(
        engine.params, engine.kv_pages, jnp.asarray(ids), md, width=beam_width
    )
    top_lp = np.asarray(top_lp)[0]
    top_id = np.asarray(top_id)[0]

    borrowed = list(prompt_pages)
    beams: list[_Beam] = []
    finished: list[BeamResult] = []
    try:
        for w in range(beam_width):
            tok = int(top_id[w])
            sc = float(top_lp[w])
            if tok in eos and not ignore_eos:
                finished.append(BeamResult([tok], sc, sc))
                continue
            own = list(pool.allocate(len(tail_page)))
            borrowed += own
            if own:
                engine.kv_pages = runner._copy_jit(
                    engine.kv_pages,
                    jnp.asarray(tail_page, jnp.int32),
                    jnp.asarray(own, jnp.int32),
                )
            beams.append(_Beam([tok], sc, own))

        # -- decode loop -------------------------------------------------------
        for step in range(1, max_tokens):
            if not beams:
                break
            w_live = len(beams)
            pos = n_prompt + step - 1  # position of the token being fed
            rows, kv_lens, slots, positions, logits_at, in_ids = [], [], [], [], [], []
            for i, b in enumerate(beams):
                need = cdiv(pos + 1, ps) - len(full_prompt_pages) - len(b.pages)
                if need > 0:
                    newp = pool.allocate(need)
                    borrowed.extend(newp)
                    b.pages.extend(newp)
                table = full_prompt_pages + b.pages
                rows.append(table)
                kv_lens.append(pos + 1)
                slots.append(table[pos // ps] * ps + pos % ps)
                positions.append(pos)
                logits_at.append(i)
                in_ids.append(b.tokens[-1])
            md, t_pad = md_for(rows, [1] * w_live, kv_lens, positions, slots,
                               w_live, logits_at)
            ids = np.zeros(t_pad, np.int32)
            ids[:w_live] = in_ids
            engine.kv_pages, top_lp, top_id = runner._score_jit(
                engine.params, engine.kv_pages, jnp.asarray(ids), md,
                width=beam_width,
            )
            top_lp = np.asarray(top_lp)[:w_live]
            top_id = np.asarray(top_id)[:w_live]

            # host re-rank of W*W candidates
            cands = []  # (total_score, beam_idx, token, logprob)
            for i, b in enumerate(beams):
                for w in range(beam_width):
                    cands.append(
                        (b.score + float(top_lp[i, w]), i, int(top_id[i, w]))
                    )
            cands.sort(reverse=True)
            new_beams: list[_Beam] = []
            used_parent: dict[int, int] = {}
            for sc, bi, tok in cands:
                if len(new_beams) >= beam_width:
                    break
                parent = beams[bi]
                if tok in eos and not ignore_eos:
                    norm = sc / ((len(parent.tokens) + 1) ** length_penalty)
                    finished.append(
                        BeamResult(parent.tokens + [tok], norm, sc)
                    )
                    continue
                count = used_parent.get(bi, 0)
                used_parent[bi] = count + 1
                if count == 0:
                    parent.tokens.append(tok)
                    parent.score = sc
                    new_beams.append(parent)
                else:
                    # fork: copy the parent's private pages
                    own = list(pool.allocate(len(parent.pages)))
                    borrowed.extend(own)
                    if own:
                        engine.kv_pages = runner._copy_jit(
                            engine.kv_pages,
                            jnp.asarray(parent.pages, jnp.int32),
                            jnp.asarray(own, jnp.int32),
                        )
                    new_beams.append(
                        _Beam(parent.tokens[:-1] + [tok], sc, own)
                    )
            beams = new_beams
            # prune: stop when the best live beam cannot beat kept finished
            if len(finished) >= beam_width:
                worst_kept = sorted(
                    (f.score for f in finished), reverse=True
                )[beam_width - 1]
                best_live = max(
                    (b.score / ((len(b.tokens) + 1) ** length_penalty)
                     for b in beams), default=-np.inf,
                )
                if best_live < worst_kept:
                    break

        for b in beams:
            norm = b.score / (len(b.tokens) ** length_penalty)
            finished.append(BeamResult(b.tokens, norm, b.score))
    finally:
        pool.free(borrowed)

    finished.sort(key=lambda r: r.score, reverse=True)
    out = finished[:beam_width]
    if engine.tokenizer is not None:
        for r in out:
            r.text = engine.tokenizer.decode(r.token_ids)
    return out
