"""Built-in main-content extraction handlers.

Semantics modeled on the reference's ContentExtractor / TagRemover /
ContentBreaker handler stacks (/root/reference/test/selma_maliciousness_test.rb:168-276):
strip boilerplate and dangerous containers, capture <title> text and
<meta name=...> pairs, unwrap everything else, and collect the remaining
text as the document's main content.

This module is pure Python (no Ray). The Ray layer wraps ExtractionEngine
in an actor-pool map_batches stage (selma_ray.stages.extract).
"""

from __future__ import annotations

import html as _html

from .rewriter import Rewriter, Selector
from .sanitizer import Sanitizer
from .tags import VOID_TAGS

# Tags whose entire subtree is dropped during extraction. Superset of the
# reference ContentExtractor's removal list (pre/code/form/style/noscript/
# script/svg — selma_maliciousness_test.rb:184-191) plus the boilerplate
# containers the north-star pipeline targets (nav, footer, header, aside,
# ads). `pre`/`code` removal follows the reference; callers can override.
DEFAULT_STRIP_TAGS = frozenset({
    "pre", "code", "form", "style", "noscript", "script", "svg",
    "nav", "footer", "header", "aside", "iframe", "button", "select",
})

# Block-level tags that imply a word break when unwrapped (mirrors the
# DEFAULT sanitizer config's whitespace_elements, config.py).
DEFAULT_BREAK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "br", "dd", "div", "dl",
    "dt", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "td",
    "th", "tr", "ul",
})


class MainContentExtractor:
    """Selector handler that strips boilerplate and accumulates main text.

    Reference parity: ContentExtractor (selma_maliciousness_test.rb:168-210)
    — `*` element handler + `title` text handler; removes strip-list
    subtrees, captures @title and @meta, unwraps the rest. Extended with:

    - ``parts``: ordered main-content text pieces (the reference only
      captured the title; the north-star pipeline needs the body text).
    - ``spans``: matched-node spans ``(selector, tag, start, end)`` where
      start/end are character offsets into the extracted text.
    - ``hits``: per-rule match counters (extraction metrics).

    One instance per document: call ``reset()`` before each rewrite.
    """

    __slots__ = ("strip_tags", "break_tags", "title", "meta", "parts",
                 "spans", "hits", "_within_title", "_open_spans", "_selector",
                 "_len", "span_text_runs")

    def __init__(self, strip_tags=DEFAULT_STRIP_TAGS,
                 break_tags=DEFAULT_BREAK_TAGS, span_text_runs=True):
        self.strip_tags = strip_tags
        self.break_tags = break_tags
        # span_text_runs=False records only matched-node ("strip") spans,
        # not one span per text run — the north-rule deliverable is
        # matched-node spans; per-run spans are an opt-in extension whose
        # volume dominates span output on text-heavy documents
        self.span_text_runs = span_text_runs
        # text inside ANY stripped subtree is excluded from the extracted
        # text via the stack-based ignore_text_within check (P10 in
        # SURVEY.md §2.3 — indirect descendants count), so the ignore
        # list is exactly the strip list.
        self._selector = Selector(match_element="*", match_text_within="*",
                                  ignore_text_within=sorted(strip_tags))
        self.reset()

    @property
    def selector(self):
        return self._selector

    def reset(self):
        self.title = ""
        self.meta = {}
        self.parts = []
        self.spans = []
        self.hits = {"strip": 0, "title": 0, "meta": 0, "unwrap": 0}
        self._within_title = False
        self._open_spans = []
        self._len = 0  # running sum(len(p) for p in parts): O(1) _pos

    # -- element dispatch ---------------------------------------------------

    def handle_element(self, element):
        tag = element.tag_name
        if tag in self.strip_tags:
            self.hits["strip"] += 1
            element.remove()
            pos = self._len
            self.spans.append(("strip", tag, pos, pos))
        elif tag == "title":
            self.hits["title"] += 1
            self._within_title = True
            element.remove()
        elif tag == "meta":
            name = element["name"]
            if name is not None:
                self.hits["meta"] += 1
                self.meta[name] = element["content"] or ""
        else:
            self.hits["unwrap"] += 1
            element.remove_and_keep_content()
            if tag in self.break_tags:
                self._append(" ")

    def on_end_tag(self, end_tag):
        if end_tag.tag_name == "title":
            self._within_title = False
        elif end_tag.tag_name in self.break_tags:
            self._append(" ")

    # -- text dispatch --------------------------------------------------------

    def handle_text_chunk(self, chunk):
        text = chunk.content
        if not text:
            return
        if self._within_title:
            # first chunk wins, like the reference's @within_title latch
            if not self.title:
                self.title = text
            return
        pos = self._len
        self._append(text)
        if self.span_text_runs:
            self.spans.append(("text", "", pos, pos + len(text)))

    def _append(self, piece: str):
        self.parts.append(piece)
        self._len += len(piece)


# Per-tag-name action flags for the fused fast path: one dict lookup
# replaces the 5-6 set-membership tests the loop would otherwise do per
# start/end tag. Built once per engine from the configured strip/break
# sets (names absent from the table are plain unwrapped containers).
_F_STRIP = 1      # subtree removed + text ignored (strip_tags)
_F_TITLE = 2      # name == "title" (latch text into .title)
_F_META = 4       # name == "meta" (harvest name/content attrs)
_F_BREAK = 8      # word break when unwrapped / explicitly closed
_F_VOID = 16      # never pushed on the open stack
_F_TEXTMODE = 32  # rawtext/RCDATA/script content follows
_F_PLAINTEXT = 64  # PLAINTEXT: rest of input is text


def _build_taginfo(strip_tags, break_tags) -> dict:
    from .tags import RAWTEXT_TAGS, RCDATA_TAGS

    info: dict[str, int] = {}

    def add(name, bit):
        info[name] = info.get(name, 0) | bit

    for t in strip_tags:
        add(t, _F_STRIP)
    for t in break_tags:
        add(t, _F_BREAK)
    add("title", _F_TITLE)
    add("meta", _F_META)
    for t in VOID_TAGS:
        add(t, _F_VOID)
    for t in RAWTEXT_TAGS | RCDATA_TAGS | {"script"}:
        add(t, _F_TEXTMODE)
    add("plaintext", _F_TEXTMODE | _F_PLAINTEXT)
    return info


class ExtractionEngine:
    """Per-worker extraction engine: compiled ruleset + reusable handler.

    Built once per actor (``selma_ray.stages.extract.ExtractTurns.__init__``)
    and reused across batches; ``process`` is called per row. The sanitizer
    config and handler selectors are compiled exactly once.

    When no sanitizer is configured (the flagship extraction shape), a
    specialized token-loop fast path replaces the generic rewriter dispatch
    — output-identical by construction (tests/test_fast_extract.py asserts
    field-for-field equality against the generic path over the synthetic
    corpus and edge fixtures), ~2.5x faster because it skips Element views,
    selector matching, and _Open bookkeeping the ``*``-selector extractor
    never needs. ``fast=None`` auto-selects; pass False to force the
    generic path (used by the equality tests).
    """

    def __init__(self, sanitizer_config=None, strip_tags=DEFAULT_STRIP_TAGS,
                 break_tags=DEFAULT_BREAK_TAGS, collapse_whitespace=True,
                 unescape=True, need_spans=True, need_html=True, fast=None,
                 raw_spans=False, span_text_runs=True):
        self.extractor = MainContentExtractor(frozenset(strip_tags),
                                              frozenset(break_tags),
                                              span_text_runs=span_text_runs)
        sanitizer = (Sanitizer(sanitizer_config)
                     if sanitizer_config is not None else None)
        self.rewriter = Rewriter(sanitizer=sanitizer,
                                 handlers=[self.extractor])
        self.collapse_whitespace = collapse_whitespace
        self.unescape = unescape
        self.need_spans = need_spans
        self.need_html = need_html
        self._fast = (sanitizer is None) if fast is None else fast
        if self._fast and sanitizer is not None:
            raise ValueError("fast path requires sanitizer_config=None")
        self._taginfo = _build_taginfo(self.extractor.strip_tags,
                                       self.extractor.break_tags)
        # One-lookup fast path for the dominant token class: an
        # already-lowercase start tag of a plain unwrapped container
        # (taginfo==0 — no strip/title/meta/break/void/rawtext bits).
        # Seeded with the common containers and grown lazily as the
        # corpus reveals more zero-info tag spellings.
        _seed = {"div", "p", "span", "a", "li", "ul", "ol", "td", "tr",
                 "th", "table", "tbody", "thead", "em", "strong", "b",
                 "i", "u", "code", "pre", "blockquote", "h1", "h2",
                 "h3", "h4", "h5", "h6", "section", "article", "main",
                 "body", "html", "head", "form", "label", "button",
                 "small", "sup", "sub", "dl", "dt", "dd"}
        self._zero_tags = {t for t in _seed if t not in self._taginfo}
        # raw_spans=True returns spans as (selector, tag, start, end)
        # tuples instead of per-span dicts — the batch stage builds the
        # Arrow list<struct> column from flat arrays, which is ~4x
        # cheaper than pa.array over list-of-dicts
        self.raw_spans = raw_spans

    def process(self, text: str) -> dict:
        """Extract main content from one turn/document.

        Plain text (no '<') passes through unchanged — the transcript table
        mixes HTML payloads and plain turns (FIXTURES.md §1).
        """
        if "<" not in text:
            return {
                "out_html": text,
                "extracted_text": text,
                "title": "",
                "meta": {},
                "spans": [],
                "bytes_in": len(text),
                "bytes_out": len(text),
                "selector_hits": {"strip": 0, "title": 0, "meta": 0,
                                  "unwrap": 0},
            }
        if self._fast:
            return self._process_fast(text)
        ex = self.extractor
        ex.reset()
        out_html = self.rewriter.rewrite(text)
        extracted = "".join(ex.parts)
        if self.unescape:
            extracted = _html.unescape(extracted)
        if self.collapse_whitespace:
            extracted = " ".join(extracted.split())
        return {
            "out_html": out_html,
            "extracted_text": extracted,
            "title": _html.unescape(ex.title).strip(),
            "meta": dict(ex.meta),
            "spans": (ex.spans if self.raw_spans else [
                {"selector": s, "tag": t, "start": a, "end": b}
                for (s, t, a, b) in ex.spans
            ]) if self.need_spans else [],
            "bytes_in": len(text),
            "bytes_out": len(out_html),
            "selector_hits": dict(ex.hits),
        }

    def _process_fast(self, text: str) -> dict:
        """Token-loop twin of ``rewrite() + MainContentExtractor`` for the
        sanitizer-less ruleset. Reproduces the generic dispatch semantics
        exactly (see rewriter._run, rewriter.py:423):

        - handle_element fires for EVERY start tag, even inside removed
          subtrees (dispatch is never suppressed — rewriter.rs:356-440);
        - text dispatch requires >=1 open element (match_text_within="*")
          and no open ancestor in the strip/ignore set (P10);
        - only explicitly-closed elements get on_end_tag (implicit closes
          are silent); stray end tags pass through to the output;
        - emission is suppressed inside remove()d subtrees; unwrapped
          (remove_and_keep_content) elements drop their tags only.
        """
        ex = self.extractor
        need_html = self.need_html
        need_spans = self.need_spans
        span_text = need_spans and ex.span_text_runs
        taginfo_get = self._taginfo.get

        parts: list[str] = []
        append_part = parts.append
        out: list[str] = [] if need_html else None
        out_len = 0
        pos = 0                       # running len of "".join(parts)
        spans: list = []
        title = ""
        meta: dict = {}
        hits_strip = hits_title = hits_meta = hits_unwrap = 0
        within_title = False
        stack: list[str] = []         # open tag names (name_lc)
        stack_flags: list[int] = []   # 1=removed_full(suppress) | 2=ignored
        open_counts: dict = {}        # name -> #open: O(1) stray-end check
        suppress = 0                  # open remove()d elements
        ignore_depth = 0              # open strip-set elements (text ignore)

        # ---- fused tokenizer (mirrors engine.tokenizer.tokenize token
        # for token — the equality/fuzz suites in tests/test_fast_extract
        # and tests/test_fuzz enforce it) with extraction actions inlined.
        # Fusing skips StartTag construction for every non-meta tag and
        # the token-tuple round trip, the fast path's residual overhead.
        from .tokenizer import (
            _ALPHA,
            _LC_CACHE,
            _TAG_RE,
            _lc,
            _parse_attrs,
            _parse_start_tag_slow,
            _rawtext_end_pattern,
        )

        lc_cache_get = _LC_CACHE.get
        tag_match = _TAG_RE.match
        zero_tags = self._zero_tags
        zero_add = zero_tags.add

        s = text
        n = len(s)
        scan = 0
        text_pieces: list[str] = []
        append_text = text_pieces.append

        def do_text(content):
            nonlocal title, pos, out_len
            if stack and ignore_depth == 0 and content:
                if within_title:
                    if not title:
                        title = content
                else:
                    append_part(content)
                    if span_text:
                        spans.append(("text", "", pos, pos + len(content)))
                    pos += len(content)
            if suppress == 0:
                out_len += len(content)
                if need_html:
                    out.append(content)

        def flush():
            if text_pieces:
                t = ("".join(text_pieces) if len(text_pieces) > 1
                     else text_pieces[0])
                text_pieces.clear()
                do_text(t)

        def do_end_nested(name):
            # explicit close of a non-top open element (caller verified
            # open_counts[name] > 0): pop implicitly-closed elements
            # silently, then the match (amortized O(1): each entry is
            # pushed and popped once), then on_end_tag semantics — the
            # end tag itself is always suppressed (every element is
            # remove()d or unwrapped).
            nonlocal suppress, ignore_depth, within_title, pos
            while True:
                top = stack.pop()
                flag = stack_flags.pop()
                open_counts[top] -= 1
                if flag & 1:
                    suppress -= 1
                if flag & 2:
                    ignore_depth -= 1
                if top == name:
                    break
            info = taginfo_get(name, 0)
            if info & 2:        # title
                within_title = False
            elif info & 8:      # break_tags
                append_part(" ")
                pos += 1

        eof = False                   # incomplete markup at EOF: input ends
        while scan < n and not eof:
            lt = s.find("<", scan)
            if lt == -1:
                append_text(s[scan:])
                break
            if lt > scan:
                append_text(s[scan:lt])
            if lt + 1 >= n:
                flush()
                eof = True            # lone '<' at EOF: dropped
                break
            c = s[lt + 1]
            if c in _ALPHA:
                # ---------------- start tag ----------------
                m = tag_match(s, lt)
                if m is not None:
                    raw_name = m.group(1)
                    if raw_name in zero_tags:
                        # plain unwrapped non-void container, lowercase
                        # spelling: one set lookup replaces the lc-cache
                        # + taginfo gets (identical to the info==0 path)
                        scan = m.end()
                        if text_pieces:
                            flush()
                        hits_unwrap += 1
                        stack.append(raw_name)
                        stack_flags.append(0)
                        open_counts[raw_name] = \
                            open_counts.get(raw_name, 0) + 1
                        continue
                    name = lc_cache_get(raw_name) or _lc(raw_name)
                    scan = m.end()
                    slow_tag = None
                else:
                    parsed = _parse_start_tag_slow(s, lt, n)
                    if parsed is None:
                        flush()
                        eof = True    # incomplete tag swallows the rest
                        break
                    slow_tag, scan = parsed
                    name = slow_tag.name_lc
                if text_pieces:
                    flush()
                info = taginfo_get(name, 0)
                if info == 0:
                    # plain unwrapped non-void container (the common case)
                    if slow_tag is None and name == raw_name:
                        zero_add(raw_name)  # future hits take the set path
                    hits_unwrap += 1
                    stack.append(name)
                    stack_flags.append(0)
                    open_counts[name] = open_counts.get(name, 0) + 1
                    continue
                removed_full = False
                if info & 1:          # strip_tags
                    hits_strip += 1
                    if need_spans:
                        spans.append(("strip", name, pos, pos))
                    removed_full = True
                elif info & 2:        # title
                    hits_title += 1
                    within_title = True
                    removed_full = True
                elif info & 4:        # meta (void: kept, not removed)
                    mname = None
                    mcontent = None
                    if slow_tag is not None:
                        attrs = slow_tag.attrs
                    elif m.group(2):
                        attrs = _parse_attrs(s, m.start(2), m.end(2))
                    else:
                        attrs = ()
                    for a in attrs:
                        if a.name_lc == "name" and mname is None:
                            mname = (a.value if a.value is not None
                                     else "")
                        elif (a.name_lc == "content"
                              and mcontent is None):
                            mcontent = (a.value if a.value is not None
                                        else "")
                    if mname is not None:
                        hits_meta += 1
                        meta[mname] = mcontent or ""
                    if suppress == 0:
                        out_len += scan - lt
                        if need_html:
                            out.append(s[lt:scan])
                else:
                    hits_unwrap += 1
                    if info & 8:      # break_tags
                        append_part(" ")
                        pos += 1
                if not info & 16:     # non-void: push on the open stack
                    stack.append(name)
                    open_counts[name] = open_counts.get(name, 0) + 1
                    if removed_full:
                        if info & 1:
                            stack_flags.append(3)
                            suppress += 1
                            ignore_depth += 1
                        else:
                            stack_flags.append(1)
                            suppress += 1
                    else:
                        stack_flags.append(0)
                    # rawtext / RCDATA / script / plaintext content modes
                    if info & 32:
                        self_closing = (m.group(3) == "/"
                                        if slow_tag is None
                                        else slow_tag.self_closing)
                        if self_closing:
                            continue
                        if info & 64:   # plaintext: rest of input is text
                            if scan < n:
                                do_text(s[scan:])
                            eof = True
                            break
                        m2 = _rawtext_end_pattern(name).search(s, scan)
                        if m2 is None:
                            if scan < n:
                                do_text(s[scan:])
                            eof = True
                            break
                        if m2.start() > scan:
                            do_text(s[scan:m2.start()])
                        gt = s.find(">", m2.start())
                        if gt == -1:
                            eof = True   # incomplete end tag: dropped
                            break
                        # the just-pushed element is the stack top
                        stack.pop()
                        flag = stack_flags.pop()
                        open_counts[name] -= 1
                        if flag & 1:
                            suppress -= 1
                        if flag & 2:
                            ignore_depth -= 1
                        if info & 2:
                            within_title = False
                        elif info & 8:
                            append_part(" ")
                            pos += 1
                        scan = gt + 1
                continue
            if c == "/":
                if lt + 2 >= n:
                    flush()
                    eof = True        # '</' at EOF: dropped
                    break
                c2 = s[lt + 2]
                if c2 in _ALPHA:
                    j = lt + 2
                    while j < n and s[j] not in " \t\n\f\r/>":
                        j += 1
                    gt = s.find(">", j)
                    if gt == -1:
                        flush()
                        eof = True    # incomplete end tag: dropped
                        break
                    if text_pieces:
                        flush()
                    en = s[lt + 2:j]
                    name = (en if en in zero_tags
                            else lc_cache_get(en) or _lc(en))
                    cnt = open_counts.get(name)
                    if not cnt:
                        # stray end tag: passes through (no on_end_tag)
                        if suppress == 0:
                            out_len += gt + 1 - lt
                            if need_html:
                                out.append(s[lt:gt + 1])
                    elif stack[-1] == name:
                        # explicit close of the innermost element
                        stack.pop()
                        flag = stack_flags.pop()
                        open_counts[name] = cnt - 1
                        if flag & 1:
                            suppress -= 1
                        if flag & 2:
                            ignore_depth -= 1
                        info = taginfo_get(name, 0)
                        if info & 2:        # title
                            within_title = False
                        elif info & 8:      # break_tags
                            append_part(" ")
                            pos += 1
                    else:
                        do_end_nested(name)
                    scan = gt + 1
                    continue
                if c2 == ">":
                    scan = lt + 3     # '</>' vanishes per spec
                    continue
                # bogus comment: '</' + junk, up to '>'
                gt = s.find(">", lt + 2)
                flush()
                raw = s[lt:] if gt == -1 else s[lt:gt + 1]
                if suppress == 0:
                    out_len += len(raw)
                    if need_html:
                        out.append(raw)
                if gt == -1:
                    break
                scan = gt + 1
                continue
            if c == "!" or c == "?":
                if c == "!" and s.startswith("--", lt + 2):
                    end2 = s.find("-->", lt + 2)
                    raw = s[lt:] if end2 == -1 else s[lt:end2 + 3]
                    nxt = n if end2 == -1 else end2 + 3
                elif c == "!" and s[lt + 2:lt + 9].lower() == "doctype":
                    gt = s.find(">", lt + 2)
                    raw = s[lt:] if gt == -1 else s[lt:gt + 1]
                    nxt = n if gt == -1 else gt + 1
                else:
                    # bogus comment '<!...' / processing instruction '<?'
                    gt = s.find(">", lt + 2)
                    raw = s[lt:] if gt == -1 else s[lt:gt + 1]
                    nxt = n if gt == -1 else gt + 1
                flush()
                # comment / doctype: kept verbatim (no sanitizer)
                if suppress == 0:
                    out_len += len(raw)
                    if need_html:
                        out.append(raw)
                scan = nxt
                continue
            # '<' followed by anything else: literal text
            append_text("<")
            scan = lt + 1

        if not eof:
            flush()

        extracted = "".join(parts)
        if self.unescape:
            extracted = _html.unescape(extracted)
        if self.collapse_whitespace:
            extracted = " ".join(extracted.split())
        ex.title = title      # expose like the generic path does
        ex.meta = meta
        return {
            "out_html": "".join(out) if need_html else "",
            "extracted_text": extracted,
            "title": _html.unescape(title).strip(),
            "meta": meta,
            "spans": (spans if self.raw_spans else [
                {"selector": s, "tag": t, "start": a, "end": b}
                for (s, t, a, b) in spans
            ]) if need_spans else [],
            "bytes_in": len(text),
            "bytes_out": out_len,
            "selector_hits": {"strip": hits_strip, "title": hits_title,
                              "meta": hits_meta, "unwrap": hits_unwrap},
        }
