"""Structured output: grammar-constrained decoding, built from scratch.

Reference: crates/core/src/sampling/grammar/ (StructuredOutputGrammar
trait, xgrammar FFI backend, schema_to_ebnf.rs, packed bitmask) and
constraint.rs (choice/regex/JSON-schema). No grammar library exists in
this environment, so the whole stack is first-party:

  regex.py      — regex-subset → NFA (Thompson) → DFA (lazy subset
                  construction)
  tokenmask.py  — token trie × DFA walk → per-state packed token
                  bitmasks (cached per DFA state)
  json_schema.py— JSON-schema subset → regex
  constraint.py — user-facing Constraint (choice | regex | json)

Masks are applied to logits on device (packed int32 words, one h2d per
constrained step — the reference's GPU bitmask apply, ADR 0020).
"""

from .constraint import Constraint

__all__ = ["Constraint"]
