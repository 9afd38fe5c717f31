"""Streaming HTML rewriter: selector-driven handler dispatch + sanitization.

This is the per-document core of the engine — a single-pass (plus one optional
escape-tagfilter second pass) streaming automaton over the tokenizer's event
stream, with NO DOM materialization. Semantics mirror the reference engine
(/root/reference/ext/selma/src/rewriter.rs):

- dispatch order per element: sanitizer's ``*`` hook first
  (rewriter.rs:366-367), then user handlers in registration order
  (rewriter.rs:369-432); selector matches are computed against the element's
  ORIGINAL attributes before any hook mutates it (lol_html VM semantics).
- sanitizer removal does not suppress handler dispatch (and vice versa);
  text inside removed subtrees is still dispatched to text handlers (the
  reference's ContentExtractor captures <title> text after removing the
  element — test/selma_maliciousness_test.rb:168-210).
- a text chunk is delivered to every matching handler in order and
  replacements compose (text_chunk.rs:12-29, handler-stacking tests
  test/selma_rewriter_text_test.rb:190-226).
- when a sanitizer is active the pass-1 output is re-parsed and escapeworthy
  tags that are still not allowlisted are force-removed
  (rewriter.rs:307-354, tags.rs:208-209).
- ``options.memory.max_allowed_memory_usage`` bounds buffered output
  (rewriter.rs:556-576); exceeding raises MemoryLimitError (RuntimeError).
"""

from __future__ import annotations

import re as _re

from .escape import escape_href, escape_html, escape_quotes, escape_text, \
    unescape_html
from .sanitizer import A_KEEP, A_KEEP_IFRAME, A_REMOVE_ALL, A_UNWRAP_WS, \
    Sanitizer, _has_allowed_protocol
from .selector import CompiledSelector
from .tags import ESCAPE_PASS_TAGS, VOID_TAGS
from .tokenizer import Attr, StartTag, tokenize

_ALPHA_SET = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


class MemoryLimitError(RuntimeError):
    """Rewriter exceeded options.memory.max_allowed_memory_usage."""


class Selector:
    """User-facing selector triple (reference: ext/selma/src/selector.rs:5-44).

    CSS is parsed eagerly so invalid selectors raise at construction time,
    not per document.
    """

    __slots__ = ("match_element", "match_text_within", "ignore_text_within",
                 "_element_sel", "_text_sel", "_ignore_set")

    def __init__(self, match_element=None, match_text_within=None,
                 ignore_text_within=None):
        if match_element is None and match_text_within is None:
            raise ValueError(
                "Neither match_element nor match_text_within was provided")
        if match_element is not None and not isinstance(match_element, str):
            raise TypeError("match_element must be a string")
        if match_text_within is not None and not isinstance(match_text_within, str):
            raise TypeError("match_text_within must be a string")
        if ignore_text_within is not None:
            if isinstance(ignore_text_within, str) or not all(
                    isinstance(t, str) for t in ignore_text_within):
                raise TypeError("ignore_text_within must be a list of strings")
        self.match_element = match_element
        self.match_text_within = match_text_within
        self.ignore_text_within = list(ignore_text_within or ())
        # eager parse (selector.rs:28-44) — raises SelectorParseError
        self._element_sel = (CompiledSelector(match_element)
                             if match_element is not None else None)
        self._text_sel = (CompiledSelector(match_text_within)
                          if match_text_within is not None else None)
        self._ignore_set = frozenset(t.lower() for t in self.ignore_text_within)


class EndTag:
    """End-tag view passed to ``on_end_tag`` (end_tag.rs:22-24)."""

    __slots__ = ("tag_name", "removed")

    def __init__(self, tag_name):
        self.tag_name = tag_name
        self.removed = False

    def remove(self):
        self.removed = True


class TextChunk:
    """Text-chunk view (text_chunk.rs). Replacements are kept in a buffer so
    they are visible to later handlers on the same chunk (text_chunk.rs:12-29).
    """

    __slots__ = ("_content", "text_type", "before_parts", "after_parts",
                 "replaced")

    def __init__(self, content, text_type):
        self._content = content
        self.text_type = text_type
        self.before_parts = []
        self.after_parts = []
        self.replaced = False

    @property
    def content(self):
        return self._content

    def to_s(self):
        return self._content

    def __str__(self):
        return self._content

    @staticmethod
    def _render(content, as_):
        if not isinstance(content, str):
            raise TypeError("content must be a string")
        if as_ == "text":
            return escape_text(content)
        if as_ == "html":
            return content
        raise ValueError(f"unknown content type {as_!r}")

    def before(self, content, as_="text"):
        self.before_parts.append(self._render(content, as_))

    def after(self, content, as_="text"):
        self.after_parts.append(self._render(content, as_))

    def replace(self, content, as_="text"):
        self._content = self._render(content, as_)
        self.replaced = True


class Element:
    """Element view passed to ``handle_element`` (element.rs:308-345)."""

    __slots__ = ("tag", "_stack", "_new_name", "removed", "_mode", "_dirty",
                 "before_parts", "after_parts", "prepend_parts", "append_parts",
                 "inner_content", "_attrs")

    def __init__(self, tag: StartTag, stack):
        self.tag = tag
        self._stack = stack          # list of _Node (root..parent)
        self._new_name = None
        self.removed = False
        self._mode = None            # None | "remove" | "keep_content"
        self._dirty = False
        self.before_parts = []
        self.after_parts = []
        self.prepend_parts = []
        self.append_parts = []
        self.inner_content = None
        self._attrs = None           # lazy copy of tag.attrs on first use:
        # removed elements and tag-only selectors never touch attributes,
        # so the sanitize-everything path skips the parse + copy entirely

    @property
    def _attr_list(self):
        a = self._attrs
        if a is None:
            a = self._attrs = list(self.tag.attrs)
        return a

    # -- identity ----------------------------------------------------------

    @property
    def name_lc(self):
        return self._new_name or self.tag.name_lc

    @property
    def tag_name(self):
        return self.name_lc

    @tag_name.setter
    def tag_name(self, new_name):
        if not isinstance(new_name, str) or not new_name:
            raise TypeError("tag name must be a non-empty string")
        self._new_name = new_name.lower()
        self._dirty = True

    def set_tag_name(self, new_name):
        self.tag_name = new_name

    @property
    def self_closing(self):
        # lol_html's explicit "<.../>"" notion, NOT the void list
        # (element.rs:58-69, tags.rs:7-12)
        return self.tag.self_closing

    @property
    def is_void(self):
        return self.tag.name_lc in VOID_TAGS

    @property
    def available(self):
        return not self.removed

    # -- attributes ---------------------------------------------------------

    @property
    def attrs(self):
        return self._attr_list

    def attr_map(self):
        out = {}
        for a in self._attr_list:
            if a.name_lc not in out:
                out[a.name_lc] = a.value if a.value is not None else ""
        return out

    @property
    def attributes(self):
        return self.attr_map()

    def __getitem__(self, name):
        name = name.lower()
        for a in self._attr_list:
            if a.name_lc == name:
                return a.value if a.value is not None else ""
        return None

    def __setitem__(self, name, value):
        self.set_attribute(name, value)

    def has_attribute(self, name):
        name = name.lower()
        return any(a.name_lc == name for a in self._attr_list)

    def set_attribute(self, name, value):
        if not isinstance(value, str):
            raise TypeError("attribute value must be a string")
        lc = name.lower()
        for a in self._attr_list:
            if a.name_lc == lc:
                a.value = value
                a.has_value = True
                a.raw = None  # force re-serialization of this attr
                self._dirty = True
                return
        self._attr_list.append(Attr(name, lc, value, True, None, None, None))
        self._dirty = True

    def remove_attribute(self, name):
        lc = name.lower()
        for i, a in enumerate(self._attr_list):
            if a.name_lc == lc:
                del self._attrs[i]
                self._dirty = True
                return

    def attribute_source_location(self, name):
        """Byte ranges into the original input; None for missing,
        handler-added, or pure-boolean attrs (element.rs:117-156)."""
        lc = name.lower()
        for a in self._attr_list:
            if a.name_lc == lc:
                if a.name_span is None or not a.has_value or a.value_span is None:
                    return None
                return {"name": a.name_span, "value": a.value_span}
        return None

    # -- ancestry -----------------------------------------------------------

    @property
    def ancestors(self):
        return [n.name_lc for n in self._stack]

    # -- mutation -----------------------------------------------------------

    def before(self, content, as_="text", content_type=None):
        self.before_parts.append(TextChunk._render(content, content_type or as_))

    def after(self, content, as_="text", content_type=None):
        self.after_parts.append(TextChunk._render(content, content_type or as_))

    def prepend(self, content, as_="text", content_type=None):
        self.prepend_parts.insert(0, TextChunk._render(content, content_type or as_))

    def append(self, content, as_="text", content_type=None):
        self.append_parts.append(TextChunk._render(content, content_type or as_))

    def set_inner_content(self, content, as_="text", content_type=None):
        self.inner_content = TextChunk._render(content, content_type or as_)
        self._dirty = self._dirty or False  # inner content does not dirty the tag

    def remove(self):
        self.removed = True
        self._mode = "remove"

    def remove_and_keep_content(self):
        self.removed = True
        self._mode = "keep_content"

    # -- serialization ------------------------------------------------------

    def serialize_start_tag(self):
        tag = self.tag
        if not self._dirty:
            return tag.raw
        parts = ["<", self._new_name or tag.name_raw]
        for a in self._attr_list:
            parts.append(" ")
            if a.raw is not None:
                parts.append(a.raw)
            elif a.has_value:
                parts.append(f'{a.name_raw}="{escape_quotes(a.value)}"')
            else:
                parts.append(a.name_raw)
        if tag.self_closing:
            parts.append(" /")
        parts.append(">")
        return "".join(parts)


def _sanitize_start_tag(sanitizer, tag: StartTag):
    """Fused twin of Sanitizer.sanitize_attributes + Element.serialize:
    returns the serialized start tag (``tag.raw`` when untouched), or
    None when a '<!--'-named attribute nukes the element
    (sanitizer.rs:419-425). Drop/normalize decisions match
    sanitize_attributes line for line."""
    attrs = tag.attrs
    if not attrs:
        return tag.raw
    name_lc = tag.name_lc
    el_allowed = sanitizer.element_allowed_attrs.get(name_lc, ())
    allowed = sanitizer.allowed_attrs
    protos = sanitizer.protocol_sanitizers.get(name_lc)
    is_meta = name_lc == "meta"
    kept: list = []   # (raw | None, name_raw, rewritten_value | None)
    dirty = False
    for a in attrs:
        an = a.name_lc
        if an.startswith("<!--"):
            return None
        raw_val = a.value if a.has_value else None
        unescaped = unescape_html((raw_val or "").lstrip())
        keep = an in el_allowed or an in allowed
        if keep and unescaped:
            plist = protos.get(an) if protos is not None else None
            if plist is None:
                if "://" in unescaped:
                    keep = False
            elif not _has_allowed_protocol(plist, unescaped):
                keep = False
        if not keep:
            dirty = True          # remove_attribute dirties the element
            continue
        if is_meta:
            if an == "charset" and unescaped != "utf-8":
                kept.append((None, a.name_raw, "utf-8"))
                dirty = True
            else:
                kept.append((a.raw, a.name_raw, None))
        elif unescaped:
            # kept non-empty values are always normalized and written back
            # (trim + unescape + re-escape), which re-serializes the tag
            v = (escape_href(unescaped) if an == "href"
                 else escape_html(unescaped))
            kept.append((None, a.name_raw, v))
            dirty = True
        else:
            kept.append((a.raw, a.name_raw, None))
    if not dirty:
        return tag.raw
    parts = ["<", tag.name_raw]
    for raw, name_raw, v in kept:
        parts.append(" ")
        if raw is not None:
            parts.append(raw)
        elif v is not None:
            parts.append(f'{name_raw}="{escape_quotes(v)}"')
        else:
            parts.append(name_raw)
    if tag.self_closing:
        # lol_html re-serializes a modified self-closing tag as ' />'
        # (reference: selma_sanitizer_test.rb:69-88 svg/circle golden)
        parts.append(" /")
    parts.append(">")
    return "".join(parts)


_EMPTY_AMAP: dict = {}


class _Node:
    """Immutable snapshot of an element at open time, used as the selector
    matching context for descendants (original tag name + original attrs)."""

    __slots__ = ("name_lc", "_amap")

    def __init__(self, name_lc, amap):
        self.name_lc = name_lc
        self._amap = amap

    def attr_map(self):
        return self._amap


class _Open:
    """Open-element stack entry: bookkeeping for end-tag emission."""

    __slots__ = ("node", "out_name", "end_suppressed", "suppresses_content",
                 "removed_full", "append_parts", "after_parts",
                 "end_tag_handlers", "renamed", "text_opened")

    def __init__(self, node):
        self.node = node
        self.out_name = None          # set when tag renamed
        self.end_suppressed = False
        self.suppresses_content = False
        self.removed_full = False
        self.append_parts = ()
        self.after_parts = ()
        self.end_tag_handlers = ()
        self.renamed = False
        self.text_opened = None


class _Handler:
    """Compiled user handler: selector triple + bound callbacks."""

    __slots__ = ("obj", "element_sel", "text_sel", "ignore_set",
                 "handle_element", "handle_text_chunk", "on_end_tag",
                 "text_active")

    def __init__(self, obj):
        self.obj = obj
        sel = getattr(obj, "selector")  # AttributeError if missing
        if callable(sel):
            sel = sel()
        if not isinstance(sel, Selector):
            raise TypeError(
                f"handler selector must be a Selector, got {type(sel).__name__}")
        self.element_sel = sel._element_sel
        self.text_sel = sel._text_sel
        self.ignore_set = sel._ignore_set
        self.handle_element = getattr(obj, "handle_element", None)
        self.handle_text_chunk = getattr(obj, "handle_text_chunk", None)
        self.on_end_tag = getattr(obj, "on_end_tag", None)
        if self.text_sel is not None and self.handle_text_chunk is None:
            raise RuntimeError(
                "handler matches text but defines no handle_text_chunk")
        self.text_active = 0


class Rewriter:
    """Compiled rewriter: sanitizer + handlers (rewriter.rs:90-235).

    ``sanitizer`` may be a Sanitizer, a config dict, None (no sanitization),
    or left at the default (DEFAULT preset). At least one of sanitizer /
    handlers is required (rewriter.rs:149-154).
    """

    _DEFAULT = object()

    def __init__(self, sanitizer=_DEFAULT, handlers=(), options=None):
        if sanitizer is Rewriter._DEFAULT:
            sanitizer = Sanitizer()
        elif isinstance(sanitizer, dict):
            sanitizer = Sanitizer(sanitizer)
        elif sanitizer is not None and not isinstance(sanitizer, Sanitizer):
            raise TypeError("sanitizer must be a Sanitizer, dict, or None")
        self.sanitizer = sanitizer

        if isinstance(handlers, (str, bytes)) or not hasattr(handlers, "__iter__"):
            raise TypeError("handlers must be a list of handler objects")
        self.handlers = [_Handler(h) for h in handlers]

        if self.sanitizer is None and not self.handlers:
            raise ValueError("Must provide a sanitizer or at least one handler")

        self.max_memory = None
        mem = (options or {}).get("memory") if options else None
        if mem is not None:
            maxm = mem.get("max_allowed_memory_usage")
            prealloc = mem.get("preallocated_parsing_buffer_size")
            if maxm is not None:
                if prealloc is None:
                    raise ValueError(
                        "preallocated_parsing_buffer_size must be set when "
                        "max_allowed_memory_usage is set")
                if not isinstance(maxm, int) or not isinstance(prealloc, int):
                    raise TypeError("memory options must be integers")
                if prealloc > maxm:
                    raise ValueError(
                        "preallocated_parsing_buffer_size must be <= "
                        "max_allowed_memory_usage")
                self.max_memory = maxm

        # The fused sanitize-only loop is semantics-complete for every
        # reachable config (class allowlists have no config key in the
        # reference — sanitizer.rs:59); guard anyway so an exotic future
        # config falls back to the generic dispatch loop.
        self._fast_sanitize = (
            self.sanitizer is not None
            and not self.sanitizer.allowed_classes
            and not self.sanitizer.element_allowed_classes)

        # Pass-2 (escape-tagfilter) prefilter for sanitize-only rewrites:
        # the re-parse is a string identity unless pass-1 output contains a
        # disallowed escapeworthy start tag, a '</>' (which the tokenizer
        # vanishes), or a trailing incomplete construct it would drop.
        # With handlers present pass 2 always runs — handler-injected
        # `as: :html` content must be re-normalized like the reference does.
        self._escape_re = None
        if self.sanitizer is not None and self.sanitizer.escape_tagfilter:
            bad = sorted(n for n in ESCAPE_PASS_TAGS
                         if self.sanitizer.element_not_allowed(n))
            if bad:
                # tag-name boundary chars match the tokenizer's name scan
                self._escape_re = _re.compile(
                    "<(?:%s)(?=[ \\t\\n\\f\\r/>]|\\Z)" % "|".join(bad),
                    _re.IGNORECASE)

    # -- public API ----------------------------------------------------------

    def rewrite(self, html: str) -> str:
        if not isinstance(html, str):
            raise TypeError("html must be a string")
        if self.handlers or not self._fast_sanitize:
            out = self._run(html, self.sanitizer, self.handlers)
        else:
            # no handlers: the fused loop skips Element/_Open/_Node
            # construction and selector plumbing entirely (output-identical
            # by the prefilter-vs-forced-two-pass property tests)
            out = self._run_sanitize_only(html, self.sanitizer, True)
        if self.sanitizer is not None and self.sanitizer.escape_tagfilter:
            # 2nd full parse of pass-1 output: strip dangerous tags that were
            # handler-injected or entity-smuggled (rewriter.rs:307-354).
            # Sanitize-only rewrites skip it when it is provably an identity
            # (_needs_escape_pass) — handler runs always take it. Pass 2 is
            # handler-free by construction, so it always takes the fused loop.
            if self.handlers or self._needs_escape_pass(out):
                out = self._run_sanitize_only(
                    out, _EscapeFilterSanitizer(self.sanitizer), False)
        return out

    def _needs_escape_pass(self, out: str) -> bool:
        """True unless re-parsing ``out`` with the escape-tagfilter shim is
        guaranteed to emit ``out`` unchanged. Conservative: false positives
        only cost the extra parse. The three non-identity sources are
        (1) removal of a disallowed escapeworthy tag + subtree, (2) '</>'
        vanishing, (3) incomplete trailing markup being dropped at EOF."""
        if self._escape_re is not None and self._escape_re.search(out):
            return True
        if "</>" in out:
            return True
        # incomplete trailing markup can only start after the last '>'
        # (any earlier '<'+alpha /'</' is terminated by that '>' and
        # re-emits its raw slice); tag removal can concatenate a literal
        # '<' with following text, so every '<' in the tail region counts
        i = out.find("<", out.rfind(">") + 1)
        while i != -1:
            tail = out[i + 1:i + 2]
            if tail == "" or tail == "/" or tail in _ALPHA_SET:
                return True
            i = out.find("<", i + 1)
        return False

    # -- fused sanitize-only engine -------------------------------------------

    def _run_sanitize_only(self, html, policy, sanitize_attrs):
        """Token-loop twin of ``_run(html, policy, ())`` for handler-free
        rewrites: identical output (enforced by the forced-two-pass property
        tests in tests/test_fuzz.py and the preset golden matrix), ~2x
        faster by skipping Element/_Open/_Node construction per tag.

        ``policy`` is a Sanitizer or _EscapeFilterSanitizer (both provide
        ``action_for`` / ``allow_comments`` / ``allow_doctype``);
        ``sanitize_attrs=False`` (the escape pass) emits kept tags raw.
        """
        out: list = []
        emit = out.append
        cap = self.max_memory
        if cap is not None:
            mem = 0

            def emit(p, _append=out.append):  # noqa: F811
                nonlocal mem
                mem += len(p)
                if mem > cap:
                    raise MemoryLimitError(
                        f"The memory limit has been exceeded: "
                        f"used {mem} > {cap}")
                _append(p)

        action_for = policy.action_for
        filter_comments = not policy.allow_comments
        filter_doctype = not policy.allow_doctype
        stack: list[str] = []         # open non-void tag names
        # 1=suppresses_content | 2=end tag emitted | 4=after-space (ws wrap)
        stack_flags: list[int] = []
        open_counts: dict = {}
        suppress = 0

        for tok in tokenize(html):
            kind = tok[0]

            if kind == "text":
                if suppress == 0 and tok[1]:
                    emit(tok[1])
                continue

            if kind == "start":
                tag = tok[1]
                name = tag.name_lc
                act = action_for(name)
                is_void = name in VOID_TAGS
                if act == A_KEEP or act == A_KEEP_IFRAME:
                    s = (_sanitize_start_tag(policy, tag)
                         if sanitize_attrs else tag.raw)
                    if s is None:
                        # '<!--'-named attr nukes the element (force-remove)
                        if not is_void:
                            stack.append(name)
                            stack_flags.append(1)
                            open_counts[name] = open_counts.get(name, 0) + 1
                            suppress += 1
                        continue
                    if suppress == 0:
                        emit(s)
                        if act == A_KEEP_IFRAME:
                            emit(" ")     # kept iframe: inner forced to " "
                    if is_void:
                        continue
                    stack.append(name)
                    if act == A_KEEP_IFRAME:
                        stack_flags.append(3)  # children suppressed, end kept
                        suppress += 1
                    else:
                        stack_flags.append(2)
                    open_counts[name] = open_counts.get(name, 0) + 1
                    continue
                if act == A_REMOVE_ALL:
                    if not is_void:
                        stack.append(name)
                        stack_flags.append(1)
                        open_counts[name] = open_counts.get(name, 0) + 1
                        suppress += 1
                    continue
                # A_UNWRAP / A_UNWRAP_WS: tags dropped, children kept
                if act == A_UNWRAP_WS and suppress == 0:
                    emit(" ")             # void: after-space; else before
                if not is_void:
                    stack.append(name)
                    stack_flags.append(4 if act == A_UNWRAP_WS else 0)
                    open_counts[name] = open_counts.get(name, 0) + 1
                continue

            if kind == "end":
                name, raw = tok[1], tok[2]
                if not open_counts.get(name):
                    if suppress == 0:
                        emit(raw)         # stray end tag passes through
                    continue
                while True:
                    top = stack.pop()
                    fl = stack_flags.pop()
                    open_counts[top] -= 1
                    if fl & 1:
                        suppress -= 1
                    if top == name:
                        break
                if suppress == 0:
                    if fl & 2:
                        emit(raw)
                    if fl & 4:
                        emit(" ")
                continue

            if kind == "comment":
                if not filter_comments and suppress == 0:
                    emit(tok[1])
                continue

            # doctype
            if not filter_doctype and suppress == 0:
                emit(tok[1])

        return "".join(out)

    # -- engine --------------------------------------------------------------

    def _run(self, html, sanitizer, handlers):
        out = []
        emit = out.append
        mem = 0
        cap = self.max_memory

        stack_nodes: list[_Node] = []   # selector-matching context
        stack_open: list[_Open] = []    # emission bookkeeping
        open_counts: dict = {}          # name -> #open: O(1) stray-end check
        suppress = 0                    # >0: inside removed/inner-set content

        for h in handlers:
            h.text_active = 0
        any_text_handlers = any(h.text_sel is not None for h in handlers)
        # tag-only rulesets (and sanitize-only runs) never read attribute
        # maps during matching: skip building one per tag
        needs_amap = any(
            (h.element_sel is not None and h.element_sel.needs_attrs)
            or (h.text_sel is not None and h.text_sel.needs_attrs)
            for h in handlers)

        filter_doctype = sanitizer is not None and not sanitizer.allow_doctype
        filter_comments = sanitizer is not None and not sanitizer.allow_comments
        sanitize_elements = sanitizer is not None

        def check_mem(n):
            nonlocal mem
            mem += n
            if cap is not None and mem > cap:
                raise MemoryLimitError(
                    f"The memory limit has been exceeded: used {mem} > {cap}")

        for tok in tokenize(html):
            kind = tok[0]

            if kind == "text":
                content, ttype = tok[1], tok[2]
                before_parts = after_parts = ()
                if any_text_handlers:
                    chunk = None
                    for h in handlers:
                        if h.text_sel is None or h.text_active == 0:
                            continue
                        if h.ignore_set and any(
                                n.name_lc in h.ignore_set for n in stack_nodes):
                            continue
                        if chunk is None:
                            chunk = TextChunk(content, ttype)
                        h.handle_text_chunk(chunk)
                    if chunk is not None:
                        content = chunk.content
                        before_parts = chunk.before_parts
                        after_parts = chunk.after_parts
                if suppress == 0:
                    for p in before_parts:
                        check_mem(len(p))
                        emit(p)
                    if content:
                        check_mem(len(content))
                        emit(content)
                    for p in after_parts:
                        check_mem(len(p))
                        emit(p)
                continue

            if kind == "start":
                tag = tok[1]
                el = Element(tag, stack_nodes)
                # selector matching happens against ORIGINAL attrs, before
                # any hook mutates the element (lol_html VM semantics) —
                # snapshot eagerly (a lazy map would see handler mutations)
                node = _Node(tag.name_lc,
                             el.attr_map() if needs_amap else _EMPTY_AMAP)
                matched = None
                text_opened = None
                if handlers:
                    for h in handlers:
                        if (h.element_sel is not None
                                and h.element_sel.matches(node, stack_nodes)):
                            (matched := matched if matched is not None else []
                             ).append(h)
                        if (h.text_sel is not None
                                and h.text_sel.matches(node, stack_nodes)):
                            (text_opened := text_opened if text_opened is not None
                             else []).append(h)

                if sanitize_elements:
                    removed = sanitizer.try_remove_element(el)
                    if not removed:
                        sanitizer.sanitize_attributes(el)
                if matched:
                    for h in matched:
                        if h.handle_element is not None:
                            h.handle_element(el)

                # --- emission -------------------------------------------
                if suppress == 0:
                    for p in el.before_parts:
                        check_mem(len(p))
                        emit(p)
                    if not el.removed:
                        s = el.serialize_start_tag()
                        check_mem(len(s))
                        emit(s)
                        for p in el.prepend_parts:
                            check_mem(len(p))
                            emit(p)
                        if el.inner_content is not None:
                            check_mem(len(el.inner_content))
                            emit(el.inner_content)

                is_void = tag.name_lc in VOID_TAGS
                if is_void:
                    if suppress == 0:
                        for p in el.after_parts:
                            check_mem(len(p))
                            emit(p)
                    continue

                entry = _Open(node)
                entry.removed_full = el._mode == "remove"
                entry.end_suppressed = el.removed
                entry.suppresses_content = (
                    entry.removed_full or el.inner_content is not None)
                entry.append_parts = el.append_parts
                entry.after_parts = el.after_parts
                if el._new_name is not None:
                    entry.out_name = el._new_name
                    entry.renamed = True
                if matched:
                    eh = [h.obj for h in matched if h.on_end_tag is not None]
                    if eh:
                        entry.end_tag_handlers = eh
                if text_opened:
                    for h in text_opened:
                        h.text_active += 1
                    entry.text_opened = text_opened  # type: ignore[attr-defined]
                stack_open.append(entry)
                stack_nodes.append(node)
                open_counts[tag.name_lc] = open_counts.get(tag.name_lc, 0) + 1
                if entry.suppresses_content:
                    suppress += 1
                continue

            if kind == "end":
                name_lc, raw = tok[1], tok[2]
                if not open_counts.get(name_lc):
                    # stray end tag: passes through (golden:
                    # selma_sanitizer_elements_test.rb:16-19 keeps </script>)
                    # O(1) check — a full-stack scan per stray end tag goes
                    # quadratic on malformed tag soup
                    if suppress == 0:
                        check_mem(len(raw))
                        emit(raw)
                    continue
                # implicitly-closed elements above the match: their pending
                # append/after content is dropped (no end tag ever arrives);
                # amortized O(1) — each entry is pushed and popped once
                while True:
                    entry = stack_open.pop()
                    stack_nodes.pop()
                    open_counts[entry.node.name_lc] -= 1
                    if entry.suppresses_content:
                        suppress -= 1
                    self._close_text_scopes(entry)
                    if entry.node.name_lc == name_lc:
                        break

                end_view = None
                if entry.end_tag_handlers:
                    end_view = EndTag(entry.out_name or name_lc)
                    for hobj in entry.end_tag_handlers:
                        hobj.on_end_tag(end_view)
                if suppress == 0:
                    if not entry.removed_full:
                        for p in entry.append_parts:
                            check_mem(len(p))
                            emit(p)
                    if not entry.end_suppressed and not (
                            end_view is not None and end_view.removed):
                        if entry.renamed:
                            s = f"</{entry.out_name}>"
                        else:
                            s = raw
                        check_mem(len(s))
                        emit(s)
                    for p in entry.after_parts:
                        check_mem(len(p))
                        emit(p)
                continue

            if kind == "comment":
                if filter_comments:
                    continue
                if suppress == 0:
                    check_mem(len(tok[1]))
                    emit(tok[1])
                continue

            # doctype
            if filter_doctype:
                continue
            if suppress == 0:
                check_mem(len(tok[1]))
                emit(tok[1])

        return "".join(out)

    @staticmethod
    def _close_text_scopes(entry):
        opened = getattr(entry, "text_opened", None)
        if opened:
            for h in opened:
                h.text_active -= 1


# escape-tagfilter pass: implemented as a dedicated element hook inside _run
# would complicate the loop; instead reuse _run with a shim sanitizer whose
# "*" hook only force-removes escapeworthy tags. We monkey-patch via a tiny
# adapter object.
class _EscapeFilterSanitizer:
    """Pass-2 policy: force-remove escapeworthy tags that are still not
    allowlisted (rewriter.rs:330-341, tags.rs:208-209)."""

    __slots__ = ("inner",)
    allow_doctype = True
    allow_comments = True

    def __init__(self, inner: Sanitizer):
        self.inner = inner

    def try_remove_element(self, el) -> bool:
        name = el.tag.name_lc
        if name in ESCAPE_PASS_TAGS and self.inner.element_not_allowed(name):
            self.inner.force_remove_element(el)
            return True
        return False

    def sanitize_attributes(self, el):
        return None

    def action_for(self, name_lc: str) -> int:
        if (name_lc in ESCAPE_PASS_TAGS
                and self.inner.element_not_allowed(name_lc)):
            return A_REMOVE_ALL
        return A_KEEP
