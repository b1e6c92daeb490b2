"""Speculative decoding.

Reference: crates/core/src/engine/spec_decode/ (DraftProposer trait
mod.rs:75, ngram.rs, draft/eagle/medusa/mtp proposers) + speculative.rs
verification. Round-1 scope: host-side proposers (n-gram prompt lookup)
with on-device greedy verification in a single unified step — the target
model scores [last_token, d_1..d_K] in one pass and the accepted prefix
plus the bonus token are emitted together (emitting up to K+1 tokens per
step; on the tunneled TPU this also amortizes the per-step round-trip).
"""

from .ngram import NgramProposer
from .proposer import DraftProposer

__all__ = ["DraftProposer", "NgramProposer"]
