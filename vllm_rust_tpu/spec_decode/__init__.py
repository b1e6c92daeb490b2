"""Speculative decoding.

Reference: crates/core/src/engine/spec_decode/ (DraftProposer trait
mod.rs:75, ngram.rs, draft/eagle/medusa/mtp proposers) + speculative.rs
verification. The target model scores [last_token, d_1..d_K] in one pass
and the accepted prefix plus the bonus token are emitted together
(emitting up to K+1 tokens per step; on the tunneled TPU this also
amortizes the per-step round-trip).

Proposers:
- NgramProposer — host prompt-lookup (ngram.rs)
- SuffixProposer — suffix-automaton lookup (suffix.rs)
- DraftModelProposer — full small LM, own paged KV (draft_proposer.rs)
- MedusaProposer — in-step independent heads (medusa.rs)
- EagleProposer / MtpProposer — hidden-conditioned autoregressive draft
  modules (eagle.rs / mtp_proposer.rs)

Verification: "sample" (lossless; greedy-exact + rejection sampling) and
"typical" acceptance (AcceptanceMethod, engine/types.rs:133).
"""

from .draft_model import DraftModelProposer
from .eagle import Eagle3Proposer, EagleProposer, MtpProposer
from .medusa import MedusaProposer
from .mlp_speculator import MLPSpeculatorProposer
from .ngram import NgramProposer
from .proposer import DraftProposer
from .suffix import SuffixProposer
from .tree import SpeculationTree

__all__ = [
    "DraftModelProposer",
    "DraftProposer",
    "EagleProposer",
    "MedusaProposer",
    "MtpProposer",
    "NgramProposer",
    "SuffixProposer",
]
