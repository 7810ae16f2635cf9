"""Random string generation from a regex (the role randexp plays for the
reference generator, generate.ts:147,163).

Parses a practical regex subset into a tiny AST, then samples: literals,
escapes, character classes (ranges, negation), ``.``, anchors, ``\\b``,
groups (capturing / non-capturing), alternation, and the quantifiers
``* + ? {n} {n,} {n,m}``.  Unbounded repetitions are capped (matching
randexp's bounded-expansion behavior).  The produced string *contains a
match* for the pattern under JS ``.test()`` semantics, which is what
validation requires (validate.ts:80-82).
"""

from __future__ import annotations

import random
import string as _string

WORD = _string.ascii_letters + _string.digits + "_"
DIGITS = _string.digits
SPACE = " \t"
PRINTABLE = _string.ascii_letters + _string.digits + " _.-"
UNBOUNDED_CAP = 8


class _Node:
    def sample(self, rng: random.Random) -> str:  # pragma: no cover - abstract
        raise NotImplementedError


class _Lit(_Node):
    def __init__(self, text: str):
        self.text = text

    def sample(self, rng):
        return self.text


class _OneOf(_Node):
    def __init__(self, chars: str):
        self.chars = chars or "x"

    def sample(self, rng):
        return rng.choice(self.chars)


class _Seq(_Node):
    def __init__(self, parts: list[_Node]):
        self.parts = parts

    def sample(self, rng):
        return "".join(p.sample(rng) for p in self.parts)


class _Alt(_Node):
    def __init__(self, options: list[_Node]):
        self.options = options

    def sample(self, rng):
        return rng.choice(self.options).sample(rng)


class _Repeat(_Node):
    def __init__(self, node: _Node, lo: int, hi: int):
        self.node, self.lo, self.hi = node, lo, hi

    def sample(self, rng):
        return "".join(self.node.sample(rng) for _ in range(rng.randint(self.lo, self.hi)))


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> str | None:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse_alternation(self) -> _Node:
        options = [self.parse_concat()]
        while self.peek() == "|":
            self.next()
            options.append(self.parse_concat())
        return options[0] if len(options) == 1 else _Alt(options)

    def parse_concat(self) -> _Node:
        parts: list[_Node] = []
        while self.peek() is not None and self.peek() not in "|)":
            parts.append(self.parse_repeat())
        return _Seq(parts)

    def parse_repeat(self) -> _Node:
        atom = self.parse_atom()
        ch = self.peek()
        if ch == "*":
            self.next()
            return _Repeat(atom, 0, UNBOUNDED_CAP)
        if ch == "+":
            self.next()
            return _Repeat(atom, 1, UNBOUNDED_CAP)
        if ch == "?":
            self.next()
            return _Repeat(atom, 0, 1)
        if ch == "{":
            j = self.p.find("}", self.i)
            if j > 0:
                body = self.p[self.i + 1 : j]
                try:
                    if "," in body:
                        lo_s, hi_s = body.split(",", 1)
                        lo = int(lo_s)
                        hi = int(hi_s) if hi_s.strip() else lo + UNBOUNDED_CAP
                    else:
                        lo = hi = int(body)
                    self.i = j + 1
                    return _Repeat(atom, lo, hi)
                except ValueError:
                    pass  # '{' not a quantifier — literal
        return atom

    def parse_atom(self) -> _Node:
        ch = self.next()
        if ch == "(":
            lookaround = False
            if self.peek() == "?":
                self.next()
                nxt = self.peek()
                if nxt in (":", "=", "!"):
                    lookaround = nxt in ("=", "!")
                    self.next()
                elif nxt == "<":
                    self.next()
                    if self.peek() in ("=", "!"):
                        lookaround = True
                        self.next()
            inner = self.parse_alternation()
            if self.peek() == ")":
                self.next()
            if lookaround:
                # lookaround groups assert, they don't consume: generate
                # nothing.  For negative lookahead, inlining the subpattern
                # would emit exactly the forbidden text; for positive
                # lookahead, an unanchored .test() is satisfied without it.
                return _Lit("")
            return inner
        if ch == "[":
            return _OneOf(self._parse_class())
        if ch == "\\":
            esc = self.next()
            if esc == "w":
                return _OneOf(WORD)
            if esc == "d":
                return _OneOf(DIGITS)
            if esc == "s":
                return _OneOf(SPACE)
            if esc in ("b", "B"):
                return _Lit("")
            if esc == "W":
                return _OneOf(" .-/")
            if esc == "D":
                return _OneOf(_string.ascii_letters)
            if esc == "S":
                return _OneOf(WORD)
            return _Lit(esc)
        if ch in "^$":
            return _Lit("")
        if ch == ".":
            return _OneOf(PRINTABLE)
        return _Lit(ch)

    def _parse_class(self) -> str:
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        members: list[str] = []
        prev: str | None = None
        while self.peek() is not None and self.peek() != "]":
            ch = self.next()
            if ch == "\\":
                esc = self.next()
                if esc == "w":
                    members.extend(WORD)
                elif esc == "d":
                    members.extend(DIGITS)
                elif esc == "s":
                    members.extend(SPACE)
                else:
                    members.append(esc)
                prev = None
                continue
            if ch == "-" and prev is not None and self.peek() not in (None, "]"):
                hi = self.next()
                members.extend(chr(c) for c in range(ord(prev) + 1, ord(hi) + 1))
                prev = None
                continue
            members.append(ch)
            prev = ch
        if self.peek() == "]":
            self.next()
        if negate:
            pool = [c for c in PRINTABLE if c not in set(members)]
            return "".join(pool) or "x"
        return "".join(members) or "x"


def rand_from_regex(pattern: str, rng: random.Random | None = None) -> str:
    rng = rng or random.Random()
    return _Parser(pattern).parse_alternation().sample(rng)
