"""Recursive-descent parser with parity to the reference PEG grammar.

Grammar: ``/root/reference/daemon/src/query/query.pest``; AST construction
(flattening, lowercasing): ``/root/reference/daemon/src/query/parsing.rs``.

Faithful PEG semantics preserved:

- ordered choice ``comp = and_comp | or_comp | comp_no_fast`` with
  right-recursive AND/OR, then chain-flattening: nested children whose parse
  rule is the same and/or rule are spliced in (``parsing.rs:17-48``) — this
  includes parenthesized groups, because ``paren_comp`` is a silent rule, so
  ``a AND (b AND c)`` === ``a AND b AND c``.
- bare juxtaposed words are a *quick OR* (``NAmong{n=1}``), NOT an AND
  (``query.pest:16``, ``parsing.rs:49-57``).
- ``NOT``/``!`` binds the whole following comp (``not_comp = NOT ~ comp``),
  so ``a AND NOT b AND c`` === ``a AND NOT(b AND c)``.
- words are lowercased at AST build for Word / quick-OR (``parsing.rs:15,51``);
  filter name/value are NOT lowercased (``parsing.rs:69-77``).
- word chars: anything except ``( ) , & + | / ! = space backslash``;
  ``\\ `` escapes a space, ``\\\\`` a backslash (``query.pest:6-8``).
- operators: AND = ``&`` ``+`` ``AND``; OR = ``|`` ``/`` ``OR``; NOT = ``!``
  ``NOT``; n-of-m = ``n(c, c, ...)``; metadata filter = ``name=value``.
"""

from __future__ import annotations

from .ast import Filter, NAmong, Not, Query, QueryComp, Word

_WORD_STOP = set("(),&+|/!= \\")


class ParseError(ValueError):
    pass


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    # --- low-level -------------------------------------------------
    def ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i] == " ":
            self.i += 1

    def lit(self, text: str) -> bool:
        if self.s.startswith(text, self.i):
            self.i += len(text)
            return True
        return False

    def peek_lit(self, text: str) -> bool:
        return self.s.startswith(text, self.i)

    def word(self) -> str | None:
        """Atomic word token: raw chars + escapes; None if empty."""
        out: list[str] = []
        s, i = self.s, self.i
        while i < len(s):
            c = s[i]
            if c == "\\":
                if i + 1 < len(s) and s[i + 1] in (" ", "\\"):
                    out.append(s[i + 1])
                    i += 2
                    continue
                break
            if c in _WORD_STOP:
                break
            out.append(c)
            i += 1
        if not out:
            return None
        self.i = i
        return "".join(out)

    def number(self) -> int | None:
        s, i = self.s, self.i
        j = i
        while j < len(s) and s[j].isdigit():
            j += 1
        if j == i:
            return None
        self.i = j
        return int(s[i:j])

    # --- grammar ---------------------------------------------------
    def comp(self) -> QueryComp | None:
        save = self.i
        left = self.comp_no_fast()
        if left is None:
            self.i = save
            return None
        after_left = self.i
        self.ws()
        # and_comp
        if self.lit("&") or self.lit("+") or self.lit("AND"):
            right = self.comp()
            if right is not None:
                return _flatten(left, right, rule="and")
        self.i = after_left
        self.ws()
        # or_comp
        if self.lit("|") or self.lit("/") or self.lit("OR"):
            right = self.comp()
            if right is not None:
                return _flatten(left, right, rule="or")
        self.i = after_left
        return left

    def comp_no_fast(self) -> QueryComp | None:
        self.ws()
        save = self.i
        for rule in (
            self._namong,
            self._paren,
            self._not,
            self._filter,
            self._quick_or,
            self._word_comp,
        ):
            node = rule()
            if node is not None:
                return node
            self.i = save
        return None

    def _namong(self) -> QueryComp | None:
        n = self.number()
        if n is None:
            return None
        self.ws()
        if not self.lit("("):
            return None
        children: list[QueryComp] = []
        first = self.comp()
        if first is None:
            return None
        children.append(first)
        while True:
            self.ws()
            if self.lit(","):
                nxt = self.comp()
                if nxt is None:
                    return None
                children.append(nxt)
                continue
            break
        self.ws()
        if not self.lit(")"):
            return None
        if n == 0:
            # n=0 divides by zero in every scoring path (the reference's
            # match_score_index yields NaN and then filters the doc out,
            # matching.rs:49-60 — the query can never return results); a
            # clean parse error beats a Catalyst DIVIDE_BY_ZERO at run time.
            raise ParseError("n-of-m requires n >= 1, got 0(...)")
        return NAmong(n=n, among=children, rule="namong")

    def _paren(self) -> QueryComp | None:
        if not self.lit("("):
            return None
        inner = self.comp()
        if inner is None:
            return None
        self.ws()
        if not self.lit(")"):
            return None
        return inner  # silent rule: inner node keeps its own rule tag

    def _not(self) -> QueryComp | None:
        if not (self.lit("!") or self.lit("NOT")):
            return None
        inner = self.comp()
        if inner is None:
            return None
        return Not(inner)

    def _filter(self) -> QueryComp | None:
        name = self.word()
        if name is None:
            return None
        self.ws()
        if not self.lit("="):
            return None
        self.ws()
        value = self.word()
        if value is None:
            return None
        return Filter(name=name, value=value)  # no lowercasing (parsing.rs:69-77)

    def _quick_or(self) -> QueryComp | None:
        words: list[str] = []
        while True:
            self.ws()
            if self.peek_lit("AND") or self.peek_lit("OR"):
                break
            save = self.i
            w = self.word()
            if w is None:
                self.i = save
                break
            words.append(w)
        if len(words) < 2:
            return None
        return NAmong(n=1, among=[Word(w.lower()) for w in words], rule="quick_or")

    def _word_comp(self) -> QueryComp | None:
        w = self.word()
        if w is None:
            return None
        return Word(w.lower())


def _flatten(left: QueryComp, right: QueryComp, rule: str) -> NAmong:
    """Chain flattening per parsing.rs:17-48: splice children whose parse rule
    equals this node's rule (and/or), repeatedly."""
    children = [left, right]
    i = 0
    while i < len(children):
        ch = children[i]
        if isinstance(ch, NAmong) and ch.rule == rule:
            children.pop(i)
            children.extend(ch.among)
        else:
            i += 1
    n = len(children) if rule == "and" else 1
    return NAmong(n=n, among=children, rule=rule)


def parse_query(text: str) -> Query:
    p = _Parser(text)
    root = p.comp()
    p.ws()
    if root is None or p.i != len(p.s):
        raise ParseError(f"cannot parse query at offset {p.i}: {text!r}")
    return Query(root=root)
