"""Per-DFA-state token bitmasks via a vocabulary trie.

Reference: sampling/grammar/{bitmask.rs, vocabulary.rs} — packed i32
bitmask rows applied in-place on device (ADR 0020). The mask for a DFA
state is computed by walking the token trie in lockstep with the DFA:
every trie node reachable through live DFA transitions contributes its
tokens. Masks are cached per DFA state (grammar-constrained generation
revisits a small set of states).
"""

from __future__ import annotations

import numpy as np


class TokenTrie:
    """Trie over token strings; built once per tokenizer."""

    def __init__(self, vocab_strings: list[str | None]):
        # nodes as dicts: char -> node index; tokens ending at node
        self.children: list[dict[str, int]] = [{}]
        self.tokens_at: list[list[int]] = [[]]
        for tid, s in enumerate(vocab_strings):
            if not s:
                continue
            node = 0
            for ch in s:
                nxt = self.children[node].get(ch)
                if nxt is None:
                    nxt = len(self.children)
                    self.children[node][ch] = nxt
                    self.children.append({})
                    self.tokens_at.append([])
                node = nxt
            self.tokens_at[node].append(tid)

    @staticmethod
    def from_tokenizer(tokenizer, vocab_size: int) -> "TokenTrie":
        strings: list[str | None] = []
        for i in range(vocab_size):
            try:
                s = tokenizer.decode([i])
            except Exception:
                s = None
            # tokens that decode to the replacement char are partial-byte
            # artifacts; exclude them from constrained decoding
            if s and "�" in s:
                s = None
            strings.append(s)
        return TokenTrie(strings)


class MaskCache:
    """(dfa, trie) → per-state packed bitmask [ceil(V/32)] int32."""

    def __init__(self, dfa, trie: TokenTrie, vocab_size: int,
                 eos_ids: tuple[int, ...]):
        self.dfa = dfa
        self.trie = trie
        self.vocab_size = vocab_size
        self.eos_ids = eos_ids
        self.words = (vocab_size + 31) // 32
        self._cache: dict[int, np.ndarray] = {}

    def mask_for(self, state: int) -> np.ndarray:
        m = self._cache.get(state)
        if m is None:
            m = self._compute(state)
            self._cache[state] = m
        return m

    def _compute(self, state: int) -> np.ndarray:
        bits = np.zeros(self.words, np.uint32)

        def allow(tid: int):
            bits[tid >> 5] |= np.uint32(1) << np.uint32(tid & 31)

        # DFS trie × DFA
        stack = [(0, state)]
        any_continuation = False
        while stack:
            node, st = stack.pop()
            for tid in self.trie.tokens_at[node]:
                allow(tid)
                any_continuation = True
            for ch, child in self.trie.children[node].items():
                nxt = self.dfa.step(st, ch)
                if nxt != self.dfa.DEAD:
                    stack.append((child, nxt))
        if self.dfa.is_accepting(state):
            for e in self.eos_ids:
                if e < self.vocab_size:
                    allow(e)
            any_continuation = True
        if not any_continuation:
            # dead grammar state: allow EOS so the request can terminate
            # with an error rather than hang
            for e in self.eos_ids:
                if e < self.vocab_size:
                    allow(e)
        return bits.view(np.int32)
