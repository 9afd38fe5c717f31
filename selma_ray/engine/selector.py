"""CSS selector subset compiler and matcher.

Covers the subset the reference exercises (see
/root/reference/ext/selma/src/selector.rs:28-44 — CSS is parsed eagerly so an
invalid selector raises at construction, and
/root/reference/test/selma_selector_test.rb — `a[href=]` and "" are invalid,
nested `:not()` is supported):

  *  tag  .class  #id  [attr]  [attr=v] [attr~=v] [attr|=v] [attr^=v]
  [attr$=v] [attr*=v]  :not(<list>)  compound selectors, descendant (space)
  and child (>) combinators, comma lists.

Matching happens against an element plus its open-element ancestor stack, so
it works inside a streaming tokenizer without a DOM.
"""

from __future__ import annotations

import re


class SelectorParseError(ValueError):
    pass


_IDENT_RE = re.compile(r"[A-Za-z_\-][A-Za-z0-9_\-]*")
_WS = " \t\n\f\r"


class _Simple:
    """One compound selector: tag/class/id/attr tests plus :not() lists."""

    __slots__ = ("tag", "classes", "ids", "attrs", "nots")

    def __init__(self):
        self.tag = None          # lowercase tag name or None (= '*')
        self.classes: list[str] = []
        self.ids: list[str] = []
        self.attrs: list[tuple[str, str | None, str | None]] = []
        self.nots: list[list[list[_Simple]]] = []  # each: selector list

    def matches(self, el, stack) -> bool:
        if self.tag is not None and el.name_lc != self.tag:
            return False
        if self.classes or self.ids or self.attrs:
            amap = el.attr_map()
            if self.classes:
                cls = amap.get("class")
                if cls is None:
                    return False
                have = cls.split()
                for c in self.classes:
                    if c not in have:
                        return False
            if self.ids:
                idv = amap.get("id")
                if idv is None:
                    return False
                for i in self.ids:
                    if idv != i:
                        return False
            for name, op, val in self.attrs:
                got = amap.get(name)
                if got is None:
                    return False
                if op is None:
                    continue
                if op == "=":
                    if got != val:
                        return False
                elif op == "~=":
                    if val not in got.split():
                        return False
                elif op == "|=":
                    if not (got == val or got.startswith(val + "-")):
                        return False
                elif op == "^=":
                    if not (val and got.startswith(val)):
                        return False
                elif op == "$=":
                    if not (val and got.endswith(val)):
                        return False
                elif op == "*=":
                    if not (val and val in got):
                        return False
        for notlist in self.nots:
            if _list_matches(notlist, el, stack):
                return False
        return True


def _list_matches(sel_list, el, stack) -> bool:
    return any(_complex_matches(cx, el, stack) for cx in sel_list)


def _complex_matches(cx, el, stack) -> bool:
    """cx: list of (compound, combinator-linking-to-previous), left-to-right;
    evaluated right-to-left against the element and its ancestor stack."""
    if not cx[-1][0].matches(el, stack):
        return False
    return _match_left(cx, len(cx) - 1, stack, len(stack))


def _match_left(cx, idx, stack, limit) -> bool:
    """cx[idx] matched at a position whose ancestors are stack[:limit]."""
    if idx == 0:
        return True
    comb = cx[idx][1]
    target = cx[idx - 1][0]
    if comb == ">":
        si = limit - 1
        if si < 0:
            return False
        if target.matches(stack[si], stack[:si]):
            return _match_left(cx, idx - 1, stack, si)
        return False
    for si in range(limit - 1, -1, -1):  # descendant combinator
        if target.matches(stack[si], stack[:si]) and \
                _match_left(cx, idx - 1, stack, si):
            return True
    return False


class _Parser:
    def __init__(self, css: str):
        self.s = css
        self.i = 0
        self.n = len(css)

    def error(self, msg):
        raise SelectorParseError(
            f"Could not parse {self.s!r} as valid CSS: {msg} at {self.i}")

    def ws(self):
        while self.i < self.n and self.s[self.i] in _WS:
            self.i += 1

    def parse_list(self, stop_at_paren=False):
        out = [self.parse_complex(stop_at_paren)]
        while True:
            self.ws()
            if self.i < self.n and self.s[self.i] == ",":
                self.i += 1
                out.append(self.parse_complex(stop_at_paren))
            else:
                return out

    def parse_complex(self, stop_at_paren=False):
        self.ws()
        # list of (compound, combinator_linking_to_previous_compound)
        parts: list[tuple[_Simple, str | None]] = [(self.parse_compound(), None)]
        while True:
            j = self.i
            self.ws()
            had_ws = self.i > j
            if self.i >= self.n:
                break
            c = self.s[self.i]
            if c == "," or (c == ")" and stop_at_paren):
                break
            if c == ">":
                self.i += 1
                self.ws()
                parts.append((self.parse_compound(), ">"))
            elif had_ws:
                parts.append((self.parse_compound(), " "))
            else:
                self.error(f"unexpected {c!r}")
        return parts

    def parse_compound(self):
        self.ws()
        sp = _Simple()
        matched = False
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c == "*":
                self.i += 1
                matched = True
            elif c == ".":
                self.i += 1
                sp.classes.append(self.ident())
                matched = True
            elif c == "#":
                self.i += 1
                sp.ids.append(self.ident())
                matched = True
            elif c == "[":
                self.i += 1
                sp.attrs.append(self.parse_attr())
                matched = True
            elif c == ":":
                if s.startswith(":not(", self.i):
                    self.i += 5
                    inner = self.parse_list(stop_at_paren=True)
                    self.ws()
                    if self.i >= n or s[self.i] != ")":
                        self.error("unclosed :not(")
                    self.i += 1
                    sp.nots.append(inner)
                    matched = True
                else:
                    self.error("unsupported pseudo-class")
            elif c in _WS or c in ">,)":
                break
            else:
                m = _IDENT_RE.match(s, self.i)
                if not m:
                    self.error(f"unexpected {c!r}")
                if matched:
                    # a type selector must come first within a compound
                    self.error("unexpected tag name")
                sp.tag = m.group(0).lower()
                self.i = m.end()
                matched = True
        if not matched:
            self.error("empty selector")
        return sp

    def ident(self):
        m = _IDENT_RE.match(self.s, self.i)
        if not m:
            self.error("expected identifier")
        self.i = m.end()
        return m.group(0)

    def parse_attr(self):
        self.ws()
        m = _IDENT_RE.match(self.s, self.i)
        if not m:
            self.error("expected attribute name")
        name = m.group(0).lower()
        self.i = m.end()
        self.ws()
        if self.i < self.n and self.s[self.i] == "]":
            self.i += 1
            return (name, None, None)
        for op in ("~=", "|=", "^=", "$=", "*=", "="):
            if self.s.startswith(op, self.i):
                self.i += len(op)
                self.ws()
                val = self.parse_value()
                self.ws()
                if self.i >= self.n or self.s[self.i] != "]":
                    self.error("expected ]")
                self.i += 1
                return (name, op, val)
        self.error("expected ] or attribute operator")

    def parse_value(self):
        if self.i >= self.n:
            self.error("expected attribute value")
        c = self.s[self.i]
        if c in "\"'":
            end = self.s.find(c, self.i + 1)
            if end == -1:
                self.error("unterminated string")
            v = self.s[self.i + 1:end]
            self.i = end + 1
            return v
        j = self.i
        while j < self.n and self.s[j] not in "]" + _WS:
            j += 1
        if j == self.i:
            self.error("empty attribute value")
        v = self.s[self.i:j]
        self.i = j
        return v


def _simple_needs_attrs(sp: "_Simple") -> bool:
    if sp.classes or sp.ids or sp.attrs:
        return True
    return any(_simple_needs_attrs(p)
               for nl in sp.nots for cx in nl for (p, _) in cx)


class CompiledSelector:
    """A parsed selector list; ``matches(el, stack)`` tests one element in
    the context of its open-element ancestor stack (root..parent)."""

    __slots__ = ("css", "sel_list", "_is_star", "needs_attrs")

    def __init__(self, css: str):
        if not isinstance(css, str):
            raise TypeError("selector must be a string")
        if not css.strip():
            raise SelectorParseError(
                f"Could not parse {css!r} as valid CSS: empty selector")
        p = _Parser(css)
        self.sel_list = p.parse_list()
        p.ws()
        if p.i != p.n:
            p.error("trailing input")
        self.css = css
        self._is_star = (
            len(self.sel_list) == 1 and len(self.sel_list[0]) == 1
            and self.sel_list[0][0][0].tag is None
            and not self.sel_list[0][0][0].classes
            and not self.sel_list[0][0][0].ids
            and not self.sel_list[0][0][0].attrs
            and not self.sel_list[0][0][0].nots
        )
        # whether matching can ever read an attribute map — lets the
        # rewriter skip per-tag attr-map construction for tag-only rulesets
        self.needs_attrs = any(_simple_needs_attrs(p)
                               for cx in self.sel_list for (p, _) in cx)

    def matches(self, el, stack) -> bool:
        if self._is_star:
            return True
        return _list_matches(self.sel_list, el, stack)
