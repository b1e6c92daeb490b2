"""EBNF (GBNF-style) grammars → the first-party regex engine.

Reference: sampling/grammar/compiler.rs + schema_to_ebnf.rs (the
reference compiles JSON schemas TO EBNF and hands both to xgrammar's
pushdown machinery). This engine goes the other way: EBNF compiles onto
the existing regex → DFA → token-mask pipeline via **bounded recursion
unrolling** — each rule may expand at most ``max_depth`` times along any
derivation path; branches that exceed the budget are pruned from their
enclosing alternation (dead-branch propagation), so right-/mixed-
recursive grammars become finite regexes that cover all derivations up
to the nesting budget. Unbounded self-embedding beyond the budget is
rejected with a clear error instead of silently mis-parsing.

Supported syntax::

    root  ::= object            # comment
    pair  ::= string ":" value
    value ::= object | array | string | [0-9]+
    str2  ::= "\"" [^"]* "\""

rules (``::=`` or ``=``), double-quoted literals with escapes, character
classes passed through to the regex engine, ``( )`` groups, ``|``
alternation, ``* + ?`` and ``{m,n}`` repetition, rule references.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

MAX_REGEX_LEN = 400_000


class EbnfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    text: str


@dataclass
class CharClass:
    raw: str  # including brackets


@dataclass
class Ref:
    name: str


@dataclass
class Seq:
    items: list


@dataclass
class Alt:
    options: list


@dataclass
class Rep:
    node: object
    op: str  # '*' | '+' | '?' | '{m,n}' raw


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


_TOKEN = _re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<def>::=|=)
  | (?P<name>[A-Za-z_][A-Za-z0-9_-]*)
  | (?P<lit>"(\\.|[^"\\])*")
  | (?P<cls>\[(\\.|[^\]\\])*\])
  | (?P<rep>\{\d+(,\d*)?\})
  | (?P<op>[|()*+?])
    """,
    _re.VERBOSE,
)


def _tokenize(src: str):
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if m is None:
            raise EbnfError(f"bad character {src[i]!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    return out


def _unquote(lit: str) -> str:
    body = lit[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            i += 1
            e = body[i]
            out.append(
                {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}.get(
                    e, e
                )
            )
        else:
            out.append(c)
        i += 1
    return "".join(out)


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def eat(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_rules(self) -> dict[str, Alt]:
        rules: dict[str, Alt] = {}
        while self.i < len(self.toks):
            kind, name = self.eat()
            if kind != "name":
                raise EbnfError(f"expected rule name, got {name!r}")
            kind, _ = self.eat()
            if kind != "def":
                raise EbnfError(f"rule {name}: expected '::='")
            rules[name] = self.alternation()
        return rules

    def _at_rule_boundary(self) -> bool:
        # a 'name' followed by '::=' starts the next rule
        k, _ = self.peek()
        if k != "name":
            return False
        nk = (
            self.toks[self.i + 1][0] if self.i + 1 < len(self.toks) else None
        )
        return nk == "def"

    def alternation(self) -> Alt:
        opts = [self.sequence()]
        while self.peek() == ("op", "|"):
            self.eat()
            opts.append(self.sequence())
        return Alt(opts)

    def sequence(self) -> Seq:
        items = []
        while True:
            k, v = self.peek()
            if k is None or v in ("|", ")") or self._at_rule_boundary():
                break
            items.append(self.repeat())
        return Seq(items)

    def repeat(self):
        node = self.atom()
        while True:
            k, v = self.peek()
            if k == "op" and v in "*+?":
                self.eat()
                node = Rep(node, v)
            elif k == "rep":
                self.eat()
                node = Rep(node, v)
            else:
                return node

    def atom(self):
        k, v = self.eat()
        if k == "op" and v == "(":
            inner = self.alternation()
            k2, v2 = self.eat()
            if (k2, v2) != ("op", ")"):
                raise EbnfError("unbalanced (")
            return inner
        if k == "lit":
            return Lit(_unquote(v))
        if k == "cls":
            return CharClass(v)
        if k == "name":
            return Ref(v)
        raise EbnfError(f"unexpected {v!r}")


# ---------------------------------------------------------------------------
# regex emission with bounded recursion
# ---------------------------------------------------------------------------

_ESCAPE = _re.compile(r"[\\.\[\]{}()*+?|^$/-]")


def _esc(text: str) -> str:
    out = []
    for ch in text:
        if _ESCAPE.match(ch):
            out.append("\\" + ch)
        elif ch == "\n":
            out.append(r"\n")
        elif ch == "\t":
            out.append(r"\t")
        else:
            out.append(ch)
    return "".join(out)


def ebnf_to_regex(
    src: str, start: str = "root", max_depth: int = 8
) -> str:
    """Compile EBNF source to a regex pattern for grammar/regex.DFA.

    ``max_depth``: per-rule expansion budget along one derivation path —
    the nesting depth guarantee for recursive grammars.
    """
    rules = _P(_tokenize(src)).parse_rules()
    if start not in rules:
        if len(rules) == 1:
            start = next(iter(rules))
        else:
            raise EbnfError(f"no start rule {start!r} (rules: {list(rules)})")

    budget = [MAX_REGEX_LEN]

    def emit(node, depths: dict[str, int]) -> str | None:
        """Regex for node, or None if this branch exceeds the recursion
        budget (dead — pruned from the enclosing alternation)."""
        if budget[0] <= 0:
            raise EbnfError(
                "grammar too large after recursion unrolling "
                f"(> {MAX_REGEX_LEN} chars); reduce nesting or max_depth"
            )
        if isinstance(node, Lit):
            r = _esc(node.text)
        elif isinstance(node, CharClass):
            r = node.raw
        elif isinstance(node, Ref):
            if node.name not in rules:
                raise EbnfError(f"undefined rule {node.name!r}")
            d = depths.get(node.name, 0)
            if d >= max_depth:
                return None  # dead branch
            r = emit(rules[node.name], {**depths, node.name: d + 1})
            if r is None:
                return None
            r = "(" + r + ")"
        elif isinstance(node, Seq):
            parts = []
            for it in node.items:
                p = emit(it, depths)
                if p is None:
                    return None  # a dead element kills the sequence
                parts.append(p)
            r = "".join(parts)
        elif isinstance(node, Alt):
            live = []
            for o in node.options:
                p = emit(o, depths)
                if p is not None:
                    live.append(p)
            if not live:
                return None
            r = "(" + "|".join(live) + ")" if len(live) > 1 else live[0]
        elif isinstance(node, Rep):
            p = emit(node.node, depths)
            if p is None:
                # zero repetitions are still possible for * ? {0,n}
                if node.op in ("*", "?") or node.op.startswith("{0"):
                    return ""
                return None
            r = "(" + p + ")" + node.op
        else:  # pragma: no cover
            raise EbnfError(f"bad node {node}")
        budget[0] -= len(r)
        return r

    out = emit(Alt([Seq([Ref(start)])]), {})
    if out is None:
        raise EbnfError(
            f"rule {start!r} has no derivation within max_depth={max_depth} "
            "(left-recursive or base-case-free grammar)"
        )
    return out
