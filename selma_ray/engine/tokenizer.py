"""Streaming byte-level HTML tokenizer (lol_html-style, no DOM).

Emits a flat stream of Doctype / Comment / StartTag / EndTag / Text tokens
with source spans, matching the recovery behavior the reference engine
inherits from lol_html (observed through the reference test goldens, e.g.
/root/reference/test/test_helper.rb:38-70 and
/root/reference/test/selma_sanitizer_parser_test.rb):

- ``<`` not followed by tag-start syntax is text; ``</>`` is dropped;
  ``</`` + non-alpha opens a bogus comment (a Comment token).
- Start/end tags left incomplete at EOF are dropped (the reference writes
  but never calls the rewriter's ``end()`` — rewriter.rs:442-472 — so the
  partially-buffered token disappears), but text PRECEDING the incomplete
  construct is still emitted: lol_html dispatches text chunks as they are
  confirmed, before stalling on the partial token.
- Comments/doctypes left unterminated at EOF are emitted with their raw text.
- RCDATA (title, textarea), RAWTEXT (style, xmp, iframe, noembed, noframes,
  noscript), script data and PLAINTEXT content modes: contents are a single
  Text token; markup inside is not tokenized.

Token kinds (``tok[0]``):
  ("text", content:str, ttype:str)
  ("start", StartTag)
  ("end", name_lc:str, raw:str)
  ("comment", raw:str)
  ("doctype", raw:str)
"""

from __future__ import annotations

import re

from .tags import RAWTEXT_TAGS, RCDATA_TAGS, VOID_TAGS

_WS = " \t\n\f\r"
_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

# Fast path for well-formed tags: whitespace-separated attributes with
# optionally-quoted values. Anything else falls back to the state machine.
_TAG_RE = re.compile(
    r"<([a-zA-Z][^\t\n\f\r />]*)"
    r"((?:[\t\n\f\r ]+[^\t\n\f\r />=]+"
    r"(?:=(?:\"[^\"]*\"|'[^']*'|[^\t\n\f\r >\"'][^\t\n\f\r >]*|))?)*)"
    r"[\t\n\f\r ]*(/?)>"
)
_ATTR_RE = re.compile(
    r"[\t\n\f\r ]+([^\t\n\f\r />=]+)"
    r"(?:(=)(\"[^\"]*\"|'[^']*'|[^\t\n\f\r >\"'][^\t\n\f\r >]*|))?"
)

_RAWTEXT_END_RE: dict[str, re.Pattern] = {}


class Attr:
    """One parsed attribute; spans index the original document string."""

    __slots__ = ("name_raw", "name_lc", "value", "has_value",
                 "name_span", "value_span", "raw")

    def __init__(self, name_raw, name_lc, value, has_value,
                 name_span, value_span, raw):
        self.name_raw = name_raw
        self.name_lc = name_lc
        self.value = value          # raw (undecoded) value, quotes stripped
        self.has_value = has_value  # False for pure-boolean attrs (no '=')
        self.name_span = name_span  # (start, end) or None for handler-added
        self.value_span = value_span
        self.raw = raw              # source slice name[=value]; None => rebuilt


_LC_CACHE: dict[str, str] = {}


def _lc(name: str) -> str:
    """Cached str.lower for tag names (small, heavily repeated vocab)."""
    v = _LC_CACHE.get(name)
    if v is None:
        if len(_LC_CACHE) > 4096:  # malformed-input safety valve
            _LC_CACHE.clear()
        v = _LC_CACHE.setdefault(name, name.lower())
    return v


class StartTag:
    """Parsed start tag. Attribute parsing is LAZY on the regex fast path:
    most consumers (extraction, tag-name-only selectors) never look at
    attributes, so ``attrs`` materializes on first access from the source
    slice (absolute spans are preserved — the full doc string is referenced,
    not copied)."""

    __slots__ = ("name_raw", "name_lc", "raw", "self_closing",
                 "_attrs", "_src", "_aspan")

    def __init__(self, name_raw, attrs, raw, self_closing,
                 src=None, aspan=None):
        self.name_raw = name_raw
        self.name_lc = _lc(name_raw)
        self.raw = raw
        self.self_closing = self_closing  # explicit "/>" only
        self._attrs = attrs               # None => parse lazily from _src
        self._src = src
        self._aspan = aspan

    @property
    def attrs(self):
        a = self._attrs
        if a is None:
            a = self._attrs = _parse_attrs(self._src, *self._aspan)
        return a

    @attrs.setter
    def attrs(self, value):
        self._attrs = value


def _parse_attrs(s: str, start: int, end: int) -> list[Attr]:
    attrs: list[Attr] = []
    seen: set[str] = set()
    for am in _ATTR_RE.finditer(s, start, end):
        aname = am.group(1)
        lc = aname.lower()
        if lc in seen:
            continue
        seen.add(lc)
        ns, ne = am.start(1), am.end(1)
        if am.group(2) is None:
            attrs.append(Attr(aname, lc, None, False, (ns, ne), None,
                              s[ns:ne]))
        else:
            v = am.group(3)
            vs, ve = am.start(3), am.end(3)
            if v and v[0] in "\"'":
                v = v[1:-1]
                vs += 1
                ve -= 1
            attrs.append(Attr(aname, lc, v, True, (ns, ne), (vs, ve),
                              s[ns:am.end(3)]))
    return attrs


def _rawtext_end_pattern(name_lc: str) -> re.Pattern:
    pat = _RAWTEXT_END_RE.get(name_lc)
    if pat is None:
        pat = re.compile("</" + re.escape(name_lc) + r"(?=[\t\n\f\r />]|$)", re.I)
        _RAWTEXT_END_RE[name_lc] = pat
    return pat


def _parse_start_tag_slow(s: str, lt: int, n: int):
    """Spec-shaped fallback start-tag parser. Returns (StartTag, next) or None
    if the tag is incomplete at EOF (token dropped, input exhausted)."""
    i = lt + 1
    j = i
    while j < n and s[j] not in " \t\n\f\r/>":
        j += 1
    name = s[i:j]
    attrs: list[Attr] = []
    seen: set[str] = set()
    i = j
    while True:
        if i >= n:
            return None
        c = s[i]
        if c in _WS:
            i += 1
            continue
        if c == "/":
            if i + 1 < n and s[i + 1] == ">":
                return StartTag(name, attrs, s[lt:i + 2], True), i + 2
            i += 1  # stray solidus: reconsume in before-attribute-name
            continue
        if c == ">":
            return StartTag(name, attrs, s[lt:i + 1], False), i + 1
        # attribute name (a leading '=' is consumed into the name per spec)
        ns = i
        if c == "=":
            i += 1
        while i < n and s[i] not in " \t\n\f\r/>=":
            i += 1
        aname = s[ns:i]
        name_span = (ns, i)
        name_end = i
        while i < n and s[i] in _WS:
            i += 1
        value = None
        value_span = None
        has_value = False
        raw_end = name_end
        if i < n and s[i] == "=":
            has_value = True
            i += 1
            while i < n and s[i] in _WS:
                i += 1
            if i >= n:
                return None
            q = s[i]
            if q == '"' or q == "'":
                vs = i + 1
                ve = s.find(q, vs)
                if ve == -1:
                    return None  # unterminated quoted value swallows to EOF
                value = s[vs:ve]
                value_span = (vs, ve)
                i = ve + 1
                raw_end = i
            elif q == ">":
                value = ""
                value_span = (i, i)
                raw_end = i
            else:
                vs = i
                while i < n and s[i] not in " \t\n\f\r>":
                    i += 1
                value = s[vs:i]
                value_span = (vs, i)
                raw_end = i
        if aname and aname.lower() not in seen:
            seen.add(aname.lower())
            attrs.append(Attr(aname, aname.lower(), value, has_value,
                              name_span, value_span, s[ns:raw_end]))


_NO_ATTRS: list[Attr] = []


def _parse_start_tag(s: str, lt: int, n: int):
    m = _TAG_RE.match(s, lt)
    if m is None:
        return _parse_start_tag_slow(s, lt, n)
    name, attrs_src, solidus = m.group(1, 2, 3)
    end = m.end()
    if attrs_src:
        tag = StartTag(name, None, s[lt:end], solidus == "/",
                       src=s, aspan=(m.start(2), m.end(2)))
    else:
        tag = StartTag(name, _NO_ATTRS, s[lt:end], solidus == "/")
    return tag, end


def tokenize(s: str) -> list:
    """Tokenize one document string; returns the full token list.

    List-building (not a generator): per-token generator suspend/resume
    costs ~20% of tokenizer time on tag-dense input, and per-document
    token lists are small (bounded by document size, which batching
    already caps)."""
    n = len(s)
    pos = 0
    out: list = []
    emit = out.append
    text_pieces: list[str] = []
    append_text = text_pieces.append

    def flush():
        if text_pieces:
            t = "".join(text_pieces) if len(text_pieces) > 1 else text_pieces[0]
            text_pieces.clear()
            emit(("text", t, "data"))

    while pos < n:
        lt = s.find("<", pos)
        if lt == -1:
            append_text(s[pos:])
            break
        if lt > pos:
            append_text(s[pos:lt])
        if lt + 1 >= n:
            flush()
            return out  # lone '<' at EOF: pending tag start, dropped
        c = s[lt + 1]
        if c in _ALPHA:
            parsed = _parse_start_tag(s, lt, n)
            if parsed is None:
                flush()
                return out  # incomplete tag swallows the rest of the input
            tag, pos = parsed
            if text_pieces:
                flush()
            emit(("start", tag))
            name_lc = tag.name_lc
            if not tag.self_closing and (
                name_lc == "script" or name_lc == "plaintext"
                or name_lc in RAWTEXT_TAGS or name_lc in RCDATA_TAGS
            ) and name_lc not in VOID_TAGS:
                if name_lc == "plaintext":
                    if pos < n:
                        emit(("text", s[pos:], "plain_text"))
                    return out
                ttype = ("script" if name_lc == "script"
                         else "rc_data" if name_lc in RCDATA_TAGS
                         else "raw_text")
                m = _rawtext_end_pattern(name_lc).search(s, pos)
                if m is None:
                    if pos < n:
                        emit(("text", s[pos:], ttype))
                    return out
                if m.start() > pos:
                    emit(("text", s[pos:m.start()], ttype))
                gt = s.find(">", m.start())
                if gt == -1:
                    return out  # incomplete end tag at EOF: dropped
                emit(("end", name_lc, s[m.start():gt + 1]))
                pos = gt + 1
            continue
        if c == "/":
            if lt + 2 >= n:
                flush()
                return out  # '</' at EOF: dropped
            c2 = s[lt + 2]
            if c2 in _ALPHA:
                j = lt + 2
                while j < n and s[j] not in " \t\n\f\r/>":
                    j += 1
                name = s[lt + 2:j]
                gt = s.find(">", j)
                if gt == -1:
                    flush()
                    return out  # incomplete end tag: dropped
                if text_pieces:
                    flush()
                emit(("end", _lc(name), s[lt:gt + 1]))
                pos = gt + 1
                continue
            if c2 == ">":
                pos = lt + 3  # '</>' vanishes per spec
                continue
            # bogus comment: '</' + junk, up to '>'
            gt = s.find(">", lt + 2)
            flush()
            if gt == -1:
                emit(("comment", s[lt:]))
                return out
            emit(("comment", s[lt:gt + 1]))
            pos = gt + 1
            continue
        if c == "!":
            if s.startswith("--", lt + 2):
                end = s.find("-->", lt + 2)
                flush()
                if end == -1:
                    emit(("comment", s[lt:]))
                    return out
                emit(("comment", s[lt:end + 3]))
                pos = end + 3
                continue
            if s[lt + 2:lt + 9].lower() == "doctype":
                gt = s.find(">", lt + 2)
                flush()
                if gt == -1:
                    emit(("doctype", s[lt:]))
                    return out
                emit(("doctype", s[lt:gt + 1]))
                pos = gt + 1
                continue
            # bogus comment '<!...'
            gt = s.find(">", lt + 2)
            flush()
            if gt == -1:
                emit(("comment", s[lt:]))
                return out
            emit(("comment", s[lt:gt + 1]))
            pos = gt + 1
            continue
        if c == "?":
            gt = s.find(">", lt + 2)
            flush()
            if gt == -1:
                emit(("comment", s[lt:]))
                return out
            emit(("comment", s[lt:gt + 1]))
            pos = gt + 1
            continue
        # '<' followed by anything else: literal text
        append_text("<")
        pos = lt + 1

    flush()
    return out
