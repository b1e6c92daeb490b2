"""Pushdown (recursive transition network) grammar engine.

Reference: sampling/grammar/xgrammar_backend.rs:1-529 — the reference
hands EBNF to xgrammar's pushdown machinery so self-embedding rules
(JSON-in-JSON, balanced brackets) constrain at ANY nesting depth. The
round-2 engine here unrolled recursion into a finite regex (ebnf.py),
which rejects derivations beyond ``max_depth``; this module is the real
stack machine that removes that limit.

Design: each EBNF rule body compiles to a char-NFA fragment (reusing
the regex engine's predicate edges); a ``Ref`` becomes a CALL edge that
pushes its return state. A machine configuration is ``(nfa_state,
stack)``; the machine state exposed to callers is an interned frozenset
of configurations — the same ``step / step_string / is_accepting /
DEAD`` interface as grammar/regex.DFA, so MaskCache's token-trie DFS
and Constraint work unchanged on top (token masks = trie x PDA walk).

Left recursion grows the stack without consuming input and is cut off
by ``MAX_STACK`` with a clear error. The DFA remains the fast path for
non-recursive grammars (grammar/constraint.py picks per spec).
"""

from __future__ import annotations

from .ebnf import (
    Alt,
    CharClass,
    EbnfError,
    Lit,
    Ref,
    Rep,
    Seq,
    _P,
    _tokenize,
)
from .regex import DFA

MAX_STACK = 1024

# edge kinds
_EPS, _PRED, _CALL = 0, 1, 2


class _ClassPreds:
    """raw char-class string -> single-char predicate (tiny DFA each,
    cached per machine)."""

    def __init__(self):
        self._cache: dict[str, object] = {}

    def get(self, raw: str):
        d = self._cache.get(raw)
        if d is None:
            d = DFA(raw)
            self._cache[raw] = d
        return d


class PushdownMachine:
    DEAD = -1

    def __init__(self, rules: dict[str, Alt], start: str = "root"):
        if start not in rules:
            if len(rules) == 1:
                start = next(iter(rules))
            else:
                raise EbnfError(
                    f"no start rule {start!r} (rules: {list(rules)})"
                )
        self.rules = rules
        self._classes = _ClassPreds()
        # NFA arena: edges[state] = list of (kind, arg, tgt);
        # arg: None | predicate | rule name
        self.edges: list[list[tuple[int, object, int]]] = []
        # rule accept states carry an implicit "return" (pop) action
        self._rule_frag: dict[str, tuple[int, int]] = {}
        self._ret_states: set[int] = set()
        for name, body in rules.items():
            self._rule_frag[name] = (self._new(), self._new())
        for name, body in rules.items():
            s, a = self._rule_frag[name]
            fs, fa = self._build(body)
            self.edges[s].append((_EPS, None, fs))
            self.edges[fa].append((_EPS, None, a))
            self._ret_states.add(a)
        self.root = start
        self.root_start, self.root_accept = self._rule_frag[start]

        self._interned: dict[frozenset, int] = {}
        self._sets: list[frozenset] = []
        self._trans_cache: dict[tuple[int, str], int] = {}
        self.start = self._intern(
            self._closure({(self.root_start, ())})
        )

    # -- construction -------------------------------------------------------

    def _new(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def _build(self, node) -> tuple[int, int]:
        s, a = self._new(), self._new()
        if isinstance(node, Lit):
            cur = s
            for ch in node.text:
                nxt = self._new()
                self.edges[cur].append(
                    (_PRED, (lambda c, ch=ch: c == ch), nxt)
                )
                cur = nxt
            self.edges[cur].append((_EPS, None, a))
        elif isinstance(node, CharClass):
            d = self._classes.get(node.raw)
            self.edges[s].append(
                (_PRED, (lambda c, d=d: d.fullmatch(c)), a)
            )
        elif isinstance(node, Ref):
            if node.name not in self.rules:
                raise EbnfError(f"undefined rule {node.name!r}")
            self.edges[s].append((_CALL, node.name, a))
        elif isinstance(node, Seq):
            cur = s
            for it in node.items:
                fs, fa = self._build(it)
                self.edges[cur].append((_EPS, None, fs))
                cur = fa
            self.edges[cur].append((_EPS, None, a))
        elif isinstance(node, Alt):
            for o in node.options:
                fs, fa = self._build(o)
                self.edges[s].append((_EPS, None, fs))
                self.edges[fa].append((_EPS, None, a))
        elif isinstance(node, Rep):
            fs, fa = self._build(node.node)
            op = node.op
            if op == "?":
                self.edges[s] += [(_EPS, None, fs), (_EPS, None, a)]
                self.edges[fa].append((_EPS, None, a))
            elif op == "*":
                self.edges[s] += [(_EPS, None, fs), (_EPS, None, a)]
                self.edges[fa] += [(_EPS, None, fs), (_EPS, None, a)]
            elif op == "+":
                self.edges[s].append((_EPS, None, fs))
                self.edges[fa] += [(_EPS, None, fs), (_EPS, None, a)]
            else:  # {m} / {m,} / {m,n}
                body = op[1:-1]
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo, hi = int(lo_s), (int(hi_s) if hi_s else None)
                else:
                    lo = hi = int(body)
                cur = s
                for _ in range(lo):
                    fs_i, fa_i = self._build(node.node)
                    self.edges[cur].append((_EPS, None, fs_i))
                    cur = fa_i
                if hi is None:  # {m,} = m copies + star
                    fs_i, fa_i = self._build(node.node)
                    self.edges[cur].append((_EPS, None, fs_i))
                    self.edges[fa_i] += [(_EPS, None, fs_i), (_EPS, None, a)]
                    self.edges[cur].append((_EPS, None, a))
                else:
                    for _ in range(hi - lo):
                        fs_i, fa_i = self._build(node.node)
                        self.edges[cur].append((_EPS, None, fs_i))
                        self.edges[cur].append((_EPS, None, a))
                        cur = fa_i
                    self.edges[cur].append((_EPS, None, a))
        else:  # pragma: no cover
            raise EbnfError(f"bad node {node}")
        return s, a

    # -- execution ----------------------------------------------------------

    def _closure(self, configs: set[tuple[int, tuple]]) -> frozenset:
        out = set(configs)
        work = list(configs)
        while work:
            st, stk = work.pop()
            if st in self._ret_states and stk:
                c = (stk[-1], stk[:-1])
                if c not in out:
                    out.add(c)
                    work.append(c)
            for kind, arg, tgt in self.edges[st]:
                if kind == _EPS:
                    c = (tgt, stk)
                elif kind == _CALL:
                    if len(stk) >= MAX_STACK:
                        raise EbnfError(
                            "pushdown stack overflow (left-recursive "
                            f"grammar or nesting > {MAX_STACK})"
                        )
                    c = (self._rule_frag[arg][0], stk + (tgt,))
                else:
                    continue
                if c not in out:
                    out.add(c)
                    work.append(c)
        return frozenset(out)

    def _intern(self, s: frozenset) -> int:
        i = self._interned.get(s)
        if i is None:
            i = len(self._sets)
            self._interned[s] = i
            self._sets.append(s)
        return i

    def step(self, state: int, ch: str) -> int:
        if state == self.DEAD:
            return self.DEAD
        key = (state, ch)
        cached = self._trans_cache.get(key)
        if cached is not None:
            return cached
        nxt: set[tuple[int, tuple]] = set()
        for st, stk in self._sets[state]:
            for kind, arg, tgt in self.edges[st]:
                if kind == _PRED and arg(ch):
                    nxt.add((tgt, stk))
        out = self.DEAD if not nxt else self._intern(self._closure(nxt))
        self._trans_cache[key] = out
        return out

    def step_string(self, state: int, text: str) -> int:
        for ch in text:
            state = self.step(state, ch)
            if state == self.DEAD:
                return self.DEAD
        return state

    def is_accepting(self, state: int) -> bool:
        if state == self.DEAD:
            return False
        return (self.root_accept, ()) in self._sets[state]

    def fullmatch(self, text: str) -> bool:
        return self.is_accepting(self.step_string(self.start, text))


def ebnf_to_machine(src: str, start: str = "root") -> PushdownMachine:
    return PushdownMachine(_P(_tokenize(src)).parse_rules(), start)


def ebnf_recursive(src: str) -> bool:
    """True when the rule-reference graph has a cycle (self-embedding) —
    the signal to use the pushdown instead of bounded unrolling."""
    rules = _P(_tokenize(src)).parse_rules()

    def refs(node, out):
        if isinstance(node, Ref):
            out.add(node.name)
        elif isinstance(node, Seq):
            for it in node.items:
                refs(it, out)
        elif isinstance(node, Alt):
            for o in node.options:
                refs(o, out)
        elif isinstance(node, Rep):
            refs(node.node, out)

    graph = {}
    for name, body in rules.items():
        out: set[str] = set()
        refs(body, out)
        graph[name] = out
    # DFS cycle detection
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in graph}

    def dfs(n) -> bool:
        color[n] = GRAY
        for m in graph.get(n, ()):
            c = color.get(m, BLACK)
            if c == GRAY or (c == WHITE and dfs(m)):
                return True
        color[n] = BLACK
        return False

    return any(color[n] == WHITE and dfs(n) for n in list(graph))


# ---------------------------------------------------------------------------
# JSON schema -> EBNF (for schemas whose $refs recurse; mirrors the
# reference's schema_to_ebnf.rs but targets this module's machine)
# ---------------------------------------------------------------------------

_WS = '[ \\t\\n]*'


def schema_to_ebnf(schema: dict) -> str:
    """Emit EBNF rules for ``schema``; ``$ref`` cycles become rule
    references, so nesting depth is unbounded under the pushdown."""
    defs = dict(schema.get("$defs", schema.get("definitions", {})))
    defs["#"] = schema
    rules: dict[str, str] = {}
    counter = [0]

    def rule_name(hint: str) -> str:
        counter[0] += 1
        safe = "".join(c if c.isalnum() else "_" for c in hint) or "r"
        return f"{safe}_{counter[0]}"

    ref_rules: dict[str, str] = {}

    def compile_node(s) -> str:
        if s is True or s == {}:
            return "jsonvalue"
        if "$ref" in s:
            ref = s["$ref"]
            name = "#" if ref in ("#", "#/") else ref.split("/")[-1]
            if name not in defs:
                raise ValueError(f"unresolvable $ref {ref}")
            rn = ref_rules.get(name)
            if rn is None:
                rn = rule_name(name)
                ref_rules[name] = rn
                rules[rn] = ""  # placeholder breaks the cycle
                rules[rn] = compile_node(defs[name])
            return rn
        if "enum" in s:
            import json as _json

            opts = " | ".join(
                '"' + _json.dumps(v).replace("\\", "\\\\").replace('"', '\\"')
                + '"'
                for v in s["enum"]
            )
            return f"({opts})"
        if "anyOf" in s or "oneOf" in s:
            opts = " | ".join(
                compile_node(o) for o in (s.get("anyOf") or s.get("oneOf"))
            )
            return f"({opts})"
        t = s.get("type")
        if isinstance(t, list):
            return "(" + " | ".join(
                compile_node({**s, "type": ti}) for ti in t
            ) + ")"
        if t == "object" or (t is None and "properties" in s):
            props = s.get("properties", {})
            req = set(s.get("required", props.keys()))
            if not props or not (req & set(props)):
                # no properties, or all optional (the leading-comma
                # problem): constrain to valid JSON objects only
                return "freeobject"
            # required properties lead so optional ones always carry a
            # preceding comma (required-first reordering)
            ordered = [k for k in props if k in req] + [
                k for k in props if k not in req
            ]
            parts = []
            for j, key in enumerate(ordered):
                expr = compile_node(props[key])
                klit = ('"\\"' + key + '\\""')
                pair = f'{klit} ws ":" ws {expr}'
                if j == 0:
                    parts.append(pair)
                elif key in req:
                    parts.append(f'"," ws {pair}')
                else:
                    parts.append(f'("," ws {pair})?')
            body = " ws ".join(parts)
            return f'"{{" ws {body} ws "}}"'
        if t == "array":
            item = compile_node(s.get("items", True))
            mn = int(s.get("minItems", 0))
            if mn > 0:
                tail = f'("," ws {item} ws)' + "{%d,}" % (mn - 1)
                return f'"[" ws {item} ws {tail} "]"'
            return f'"[" ws ({item} ws ("," ws {item} ws)*)? "]"'
        if t == "string":
            if "pattern" in s:
                # inline anchored pattern as a char-class-free regex is
                # not expressible in EBNF; fall back to free string
                return "jsonstring"
            return "jsonstring"
        if t == "integer":
            return '"-"? [0-9]+'
        if t == "number":
            return '"-"? [0-9]+ ("." [0-9]+)? (("e" | "E") ("+" | "-")? [0-9]+)?'
        if t == "boolean":
            return '("true" | "false")'
        if t == "null":
            return '"null"'
        return "jsonvalue"

    root_expr = compile_node(schema)
    lines = [f"root ::= {root_expr}"]
    for name, body in rules.items():
        lines.append(f"{name} ::= {body}")
    lines += [
        f"ws ::= {_WS}",
        'jsonstring ::= "\\"" ([^"\\\\] | "\\\\" ["\\\\/bfnrtu])* "\\""',
        'jsonvalue ::= freeobject | freearray | jsonstring | '
        '"-"? [0-9]+ ("." [0-9]+)? | "true" | "false" | "null"',
        'freeobject ::= "{" ws (jsonstring ws ":" ws jsonvalue ws '
        '("," ws jsonstring ws ":" ws jsonvalue ws)*)? "}"',
        'freearray ::= "[" ws (jsonvalue ws ("," ws jsonvalue ws)*)? "]"',
    ]
    return "\n".join(lines)
