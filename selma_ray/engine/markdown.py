"""HTML -> Markdown conversion built ON the public handler protocol.

`MarkdownHandler` is an ordinary Selma-style handler object (`selector`
+ `handle_element` / `handle_text_chunk` / `on_end_tag` — SURVEY.md
§2.8, reference rewriter.rs:80-147): it rides the same streaming
engine as every other rule, which makes it both a real feature (the
HTML→Markdown normalization most LLM-corpus pipelines run on web text)
and an end-to-end exercise of the user-extension surface.

Dialect (v1, documented limits):
- headings h1-h6 -> ``#``..``######``; p/div/section/article/main and
  friends -> blank-line-separated blocks; ``<br>`` -> hard newline;
  ``<hr>`` -> ``---``.
- ul/ol with nesting (2-space indent per level) and real ordinals for
  ``<ol>``.
- ``<a href>`` -> ``[text](href)``; ``<img>`` -> ``![alt](src)``;
  strong/b -> ``**``, em/i -> ``*``, inline code -> `` ` ``.
- ``<pre>`` -> fenced block, inner whitespace preserved verbatim.
- ``<blockquote>`` -> one leading ``> `` (nested per-line quoting is
  not reproduced).
- boilerplate subtrees (script/style/nav/footer/header/aside/form/
  iframe/...) are dropped entirely; tables degrade to space/newline-
  separated text; markdown metacharacters in text are NOT escaped.
- entities are decoded in text runs (``&amp;`` -> ``&``).

Implicitly-closed elements never fire ``on_end_tag`` (reference
semantics, P12), so close markers pair via per-tag stacks: a close
marker is emitted only if its open marker was — malformed nesting
degrades to unbalanced markers rather than corrupting state.
"""

from __future__ import annotations

import html as _html

from .extract import DEFAULT_STRIP_TAGS
from .rewriter import Rewriter, Selector

# drop these subtrees entirely (boilerplate + non-content); pre/code
# are NOT stripped here (they carry content), unlike plain extraction
MD_STRIP_TAGS = frozenset(
    (DEFAULT_STRIP_TAGS - {"pre", "code"}) | {"title", "head"})

_HEADINGS = {f"h{i}": "#" * i + " " for i in range(1, 7)}
_BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "blockquote", "table",
    "address", "dl", "dd", "dt", "figure", "figcaption",
})
# pending-separator lattice (only the strongest pending one is emitted)
_SEP_RANK = {"": 0, " ": 1, "\n": 2, "\n\n": 3}

_INLINE_MARKS = {"strong": "**", "b": "**", "em": "*", "i": "*"}


class MarkdownHandler:
    """Streaming HTML->Markdown accumulator; one instance per document
    pass (or call :meth:`reset` between documents)."""

    def __init__(self):
        self._selector = Selector(match_element="*", match_text_within="*",
                                  ignore_text_within=sorted(MD_STRIP_TAGS))
        self.reset()

    @property
    def selector(self):
        return self._selector

    def reset(self):
        self.parts: list[str] = []
        self._sep = ""                  # pending separator
        self._lists: list[list] = []    # [ordered?, counter] per open list
        self._closes: dict[str, list[str]] = {}  # tag -> close-marker stack
        self._hrefs: list[str] = []
        self._pre_depth = 0

    # -- emission helpers ------------------------------------------------
    def _request(self, sep: str):
        if _SEP_RANK[sep] > _SEP_RANK[self._sep]:
            self._sep = sep

    def _inline(self, text: str):
        if not text:
            return
        if self._sep and self.parts:
            self.parts.append(self._sep)
        self._sep = ""
        self.parts.append(text)

    def _push_close(self, tag: str, marker: str):
        self._closes.setdefault(tag, []).append(marker)

    # -- handler protocol --------------------------------------------------
    def handle_element(self, el):
        tag = el.tag_name
        if tag in MD_STRIP_TAGS or any(a in MD_STRIP_TAGS
                                       for a in el.ancestors):
            return
        if self._pre_depth:
            return                       # raw region: no nested markers
        if tag in _HEADINGS:
            self._request("\n\n")
            self._inline(_HEADINGS[tag])
            self._push_close(tag, "\n\n")
        elif tag in _BLOCK_TAGS:
            self._request("\n\n")
            if tag == "blockquote":
                self._inline("> ")
            self._push_close(tag, "\n\n")
        elif tag == "br":
            self._request("\n")
        elif tag == "hr":
            self._request("\n\n")
            self._inline("---")
            self._request("\n\n")
        elif tag in ("ul", "ol"):
            self._request("\n\n" if not self._lists else "\n")
            self._lists.append([tag == "ol", 0])
            self._push_close(tag, "list")
        elif tag == "li":
            self._request("\n")
            indent = "  " * max(0, len(self._lists) - 1)
            if self._lists and self._lists[-1][0]:
                self._lists[-1][1] += 1
                self._inline(f"{indent}{self._lists[-1][1]}. ")
            else:
                self._inline(f"{indent}- ")
        elif tag == "a":
            self._hrefs.append(el["href"] or "")
            self._inline("[")
            self._push_close(tag, "link")
        elif tag in _INLINE_MARKS:
            self._inline(_INLINE_MARKS[tag])
            self._push_close(tag, _INLINE_MARKS[tag])
        elif tag == "img":
            alt = el["alt"] or ""
            src = el["src"] or ""
            self._inline(f"![{alt}]({src})")
        elif tag == "pre":
            self._request("\n\n")
            self._inline("```\n")
            self._pre_depth += 1
            self._push_close(tag, "pre")
        elif tag == "code":
            self._inline("`")
            self._push_close(tag, "`")
        elif tag in ("td", "th"):
            self._request(" ")
        elif tag == "tr":
            self._request("\n")

    def on_end_tag(self, end_tag):
        stack = self._closes.get(end_tag.tag_name)
        if not stack:
            return
        marker = stack.pop()
        if marker == "list":
            if self._lists:
                self._lists.pop()
            self._request("\n\n" if not self._lists else "\n")
        elif marker == "link":
            href = self._hrefs.pop() if self._hrefs else ""
            self.parts.append(f"]({href})")
        elif marker == "pre":
            self._pre_depth -= 1
            self.parts.append("\n```")
            self._request("\n\n")
        elif marker == "\n\n":
            self._request("\n\n")
        else:
            self.parts.append(marker)    # **, *, `

    def handle_text_chunk(self, chunk):
        content = chunk.content
        if self._pre_depth:
            self.parts.append(_html.unescape(content))
            return
        core = " ".join(content.split())
        lead = content[:1].isspace()
        if core:
            if lead:
                self._request(" ")
            self._inline(_html.unescape(core))
            if content[-1:].isspace():
                self._request(" ")
        elif content:
            self._request(" ")

    def markdown(self) -> str:
        return "".join(self.parts).strip()


class MarkdownEngine:
    """Per-worker reusable engine: one compiled Rewriter + handler."""

    def __init__(self):
        self.handler = MarkdownHandler()
        self.rewriter = Rewriter(sanitizer=None, handlers=[self.handler])

    def convert(self, text: str) -> str:
        if "<" not in text:
            return text.strip()
        self.handler.reset()
        self.rewriter.rewrite(text)
        return self.handler.markdown()


def html_to_markdown(text: str) -> str:
    """One-shot convenience wrapper (builds a fresh engine per call —
    use :class:`MarkdownEngine` in batch stages)."""
    return MarkdownEngine().convert(text)
