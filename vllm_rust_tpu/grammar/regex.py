"""Minimal regex engine: parse → Thompson NFA → lazy DFA.

Supported syntax (covers what JSON-schema compilation emits plus common
user regexes): literals, escapes (\\d \\w \\s \\n \\t \\. and friends),
``.``, character classes ``[a-z0-9_]`` (with ranges and negation),
alternation ``|``, groups ``(...)`` (non-capturing), quantifiers
``* + ? {m} {m,} {m,n}``.

DFA states are frozensets of NFA states, constructed lazily and interned
to small ints so downstream token-mask caches key on ints.
"""

from __future__ import annotations

from dataclasses import dataclass, field

EPS = None  # epsilon transition marker


@dataclass
class NFAState:
    # edges: list of (predicate | EPS, target_index)
    edges: list = field(default_factory=list)


class _Parser:
    """Recursive-descent regex parser producing an NFA fragment."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.states: list[NFAState] = []

    def new_state(self) -> int:
        self.states.append(NFAState())
        return len(self.states) - 1

    def peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def eat(self):
        c = self.p[self.i]
        self.i += 1
        return c

    # fragment = (start, accept)
    def parse(self):
        start, accept = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i}")
        return start, accept

    def alternation(self):
        frags = [self.concat()]
        while self.peek() == "|":
            self.eat()
            frags.append(self.concat())
        if len(frags) == 1:
            return frags[0]
        s, a = self.new_state(), self.new_state()
        for fs, fa in frags:
            self.states[s].edges.append((EPS, fs))
            self.states[fa].edges.append((EPS, a))
        return s, a

    def concat(self):
        frags = []
        while self.peek() is not None and self.peek() not in "|)":
            frags.append(self.repeat())
        if not frags:
            s = self.new_state()
            return s, s
        start, accept = frags[0]
        for fs, fa in frags[1:]:
            self.states[accept].edges.append((EPS, fs))
            accept = fa
        return start, accept

    def repeat(self):
        frag = self.atom()
        while self.peek() in ("*", "+", "?", "{"):
            c = self.peek()
            if c == "{":
                save = self.i
                try:
                    frag = self._counted(frag)
                except ValueError:
                    self.i = save
                    break
            else:
                self.eat()
                frag = self._quantify(frag, c)
        return frag

    def _quantify(self, frag, q):
        fs, fa = frag
        s, a = self.new_state(), self.new_state()
        self.states[s].edges.append((EPS, fs))
        self.states[fa].edges.append((EPS, a))
        if q in ("*", "?"):
            self.states[s].edges.append((EPS, a))
        if q in ("*", "+"):
            self.states[fa].edges.append((EPS, fs))
        return s, a

    def _counted(self, frag):
        # {m}, {m,}, {m,n} — re-parse the atom by snapshotting is complex;
        # instead we duplicate the fragment structurally
        assert self.eat() == "{"
        num = ""
        while self.peek() and self.peek().isdigit():
            num += self.eat()
        if num == "":
            raise ValueError("bad counted repeat")
        m = int(num)
        n = m
        unbounded = False
        if self.peek() == ",":
            self.eat()
            num2 = ""
            while self.peek() and self.peek().isdigit():
                num2 += self.eat()
            if num2 == "":
                unbounded = True
            else:
                n = int(num2)
        if self.peek() != "}":
            raise ValueError("bad counted repeat")
        self.eat()

        # rebuild: need m copies + (n-m) optional copies (or a star)
        src_start, src_accept = frag
        copies = [frag]

        def clone():
            mapping = {}
            stack = [src_start]
            order = []
            while stack:
                s = stack.pop()
                if s in mapping:
                    continue
                mapping[s] = self.new_state()
                order.append(s)
                for pred, t in self.states[s].edges:
                    stack.append(t)
            if src_accept not in mapping:
                mapping[src_accept] = self.new_state()
            for s in order:
                for pred, t in self.states[s].edges:
                    self.states[mapping[s]].edges.append((pred, mapping[t]))
            return mapping[src_start], mapping[src_accept]

        total = m if not unbounded else m
        for _ in range(max(total - 1, 0)):
            copies.append(clone())
        opt = []
        if not unbounded:
            for _ in range(n - m):
                opt.append(clone())
        start = self.new_state()
        cur = start
        if m == 0:
            copies = []
        for fs, fa in copies:
            self.states[cur].edges.append((EPS, fs))
            cur = fa
        if unbounded:
            fs, fa = clone()
            self.states[cur].edges.append((EPS, fs))
            self.states[fa].edges.append((EPS, fs))
            end = self.new_state()
            self.states[cur].edges.append((EPS, end))
            self.states[fa].edges.append((EPS, end))
            return start, end
        end = self.new_state()
        self.states[cur].edges.append((EPS, end))
        for fs, fa in opt:
            self.states[cur].edges.append((EPS, fs))
            self.states[fa].edges.append((EPS, end))
            cur = fa
        return start, end

    # -- atoms ----------------------------------------------------------------

    _CLASSES = {
        "d": lambda c: c.isdigit(),
        "D": lambda c: not c.isdigit(),
        "w": lambda c: c.isalnum() or c == "_",
        "W": lambda c: not (c.isalnum() or c == "_"),
        "s": lambda c: c in " \t\n\r\f\v",
        "S": lambda c: c not in " \t\n\r\f\v",
    }

    def atom(self):
        c = self.peek()
        if c == "(":
            self.eat()
            if self.peek() == "?":  # (?: non-capturing — skip the marker
                self.eat()
                if self.peek() == ":":
                    self.eat()
            frag = self.alternation()
            if self.eat() != ")":
                raise ValueError("unbalanced (")
            return frag
        if c == "[":
            return self._char_class()
        if c == ".":
            self.eat()
            return self._pred(lambda ch: ch != "\n", ".")
        if c == "\\":
            self.eat()
            e = self.eat()
            if e in self._CLASSES:
                return self._pred(self._CLASSES[e], f"\\{e}")
            lit = self._escape_char(e)
            return self._pred(lambda ch, l=lit: ch == l, lit)
        if c in "*+?{":
            raise ValueError(f"dangling quantifier {c!r}")
        self.eat()
        return self._pred(lambda ch, l=c: ch == l, c)

    def _pred(self, fn, label):
        s, a = self.new_state(), self.new_state()
        self.states[s].edges.append((fn, a))
        return s, a

    def _escape_char(self, e: str) -> str:
        if e == "x":  # \xHH
            h = self.eat() + self.eat()
            return chr(int(h, 16))
        if e == "u":  # \uHHHH
            h = "".join(self.eat() for _ in range(4))
            return chr(int(h, 16))
        return {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v",
                "0": "\0"}.get(e, e)

    def _char_class(self):
        assert self.eat() == "["
        negate = False
        if self.peek() == "^":
            negate = True
            self.eat()
        items = []  # (lo, hi) ranges or predicates
        preds = []
        while self.peek() != "]":
            if self.peek() is None:
                raise ValueError("unbalanced [")
            c = self.eat()
            if c == "\\":
                e = self.eat()
                if e in self._CLASSES:
                    preds.append(self._CLASSES[e])
                    continue
                c = self._escape_char(e)
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.eat()
                hi = self.eat()
                if hi == "\\":
                    hi = self._escape_char(self.eat())
                items.append((c, hi))
            else:
                items.append((c, c))
        self.eat()

        def fn(ch, items=tuple(items), preds=tuple(preds), negate=negate):
            m = any(lo <= ch <= hi for lo, hi in items) or any(
                p(ch) for p in preds
            )
            return m != negate

        return self._pred(fn, "[class]")


class DFA:
    """Lazy subset-construction DFA over a compiled NFA."""

    DEAD = -1

    def __init__(self, pattern: str):
        parser = _Parser(pattern)
        self.start_nfa, self.accept_nfa = parser.parse()
        self.nfa = parser.states
        self._interned: dict[frozenset, int] = {}
        self._sets: list[frozenset] = []
        self._trans_cache: dict[tuple[int, str], int] = {}
        self.start = self._intern(self._closure({self.start_nfa}))

    def _closure(self, states: set[int]) -> frozenset:
        stack = list(states)
        out = set(states)
        while stack:
            s = stack.pop()
            for pred, t in self.nfa[s].edges:
                if pred is EPS and t not in out:
                    out.add(t)
                    stack.append(t)
        return frozenset(out)

    def _intern(self, s: frozenset) -> int:
        i = self._interned.get(s)
        if i is None:
            i = len(self._sets)
            self._interned[s] = i
            self._sets.append(s)
        return i

    def step(self, state: int, ch: str) -> int:
        """Next DFA state id, or DEAD."""
        if state == self.DEAD:
            return self.DEAD
        key = (state, ch)
        cached = self._trans_cache.get(key)
        if cached is not None:
            return cached
        nxt: set[int] = set()
        for s in self._sets[state]:
            for pred, t in self.nfa[s].edges:
                if pred is not EPS and pred(ch):
                    nxt.add(t)
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
        return state != self.DEAD and self.accept_nfa in self._sets[state]

    def fullmatch(self, text: str) -> bool:
        return self.is_accepting(self.step_string(self.start, text))
