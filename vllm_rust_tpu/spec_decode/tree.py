"""Speculation trees: multi-branch draft verification.

Reference: engine/spec_decode/tree_attention.rs (SpeculationTree:
from_linear :40, from_medusa_candidates :80, build_attention_mask :138,
verify_and_accept :175). A node attends to its ancestors and itself;
acceptance walks the longest root path where each node's token equals
the target's (greedy) choice at its parent.

The mask composes with a dense verification forward; the paged engine's
hot path verifies linear chains (spec_decode/engine.py) and trees are
scored through `tree_logits_positions` + an explicit additive bias.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SpeculationTree:
    """Tokens + parent indices (-1 for root). Root = last accepted token."""

    tokens: np.ndarray  # [N] int32
    parents: np.ndarray  # [N] int32, -1 for root
    depths: np.ndarray  # [N] int32, 0 for root

    @staticmethod
    def from_linear(tokens) -> "SpeculationTree":
        """Degenerate chain: node i+1 is the child of node i."""
        n = len(tokens)
        return SpeculationTree(
            tokens=np.asarray(tokens, np.int32),
            parents=np.arange(-1, n - 1, dtype=np.int32),
            depths=np.arange(n, dtype=np.int32),
        )

    @staticmethod
    def from_medusa_candidates(
        root_token: int, candidates: list[list[int]]
    ) -> "SpeculationTree":
        """Breadth-first expansion: every head-k candidate branches from
        every node at level k (head k predicts position k+1)."""
        tokens = [int(root_token)]
        parents = [-1]
        depths = [0]
        level = [0]  # node ids at the previous level
        for k, cands in enumerate(candidates):
            nxt = []
            for parent in level:
                for tok in cands:
                    tokens.append(int(tok))
                    parents.append(parent)
                    depths.append(k + 1)
                    nxt.append(len(tokens) - 1)
            level = nxt
        return SpeculationTree(
            tokens=np.asarray(tokens, np.int32),
            parents=np.asarray(parents, np.int32),
            depths=np.asarray(depths, np.int32),
        )

    @property
    def num_nodes(self) -> int:
        return int(self.tokens.shape[0])

    def ancestor_matrix(self) -> np.ndarray:
        """[N, N] bool: anc[i, j] == node j is an ancestor of i (or i)."""
        n = self.num_nodes
        anc = np.eye(n, dtype=bool)
        for i in range(n):
            p = int(self.parents[i])
            while p >= 0:
                anc[i, p] = True
                p = int(self.parents[p])
        return anc

    def build_attention_mask(self, neg: float = -1e9) -> np.ndarray:
        """Additive bias [N, N]: 0 where node i may attend to j (its
        ancestors + itself), `neg` elsewhere. Prepend zeros columns for
        the committed context when composing with a full sequence."""
        return np.where(self.ancestor_matrix(), 0.0, neg).astype(np.float32)

    def positions(self, base: int) -> np.ndarray:
        """Absolute positions for RoPE/KV: base + depth."""
        return base + self.depths

    def verify_and_accept(self, logits: np.ndarray) -> list[int]:
        """Greedy root-path acceptance.

        `logits` [N, V]: the target's logits at every node position.
        Walk from the root: at each node, the target's argmax picks the
        next token; if a child carries exactly that token, accept it and
        continue from there; otherwise stop. Returns the accepted+
        correction tokens to emit (always ends with the target's choice
        at the last accepted node — the bonus/correction token)."""
        logits = np.asarray(logits)
        children: dict[int, list[int]] = {}
        for i, p in enumerate(self.parents):
            if p >= 0:
                children.setdefault(int(p), []).append(i)
        out: list[int] = []
        node = 0
        while True:
            target_tok = int(np.argmax(logits[node]))
            out.append(target_tok)
            nxt = None
            for c in children.get(node, []):
                if int(self.tokens[c]) == target_tok:
                    nxt = c
                    break
            if nxt is None:
                return out
            node = nxt
