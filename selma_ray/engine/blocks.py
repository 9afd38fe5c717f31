"""Block-level boilerplate classification (jusText/Boilerpipe-style
DOM heuristics, re-expressed over the streaming engine — no DOM).

The north-rule's "DOM heuristics" extraction mode: the document is
segmented into text blocks at block-level tag boundaries, each block is
scored by word count and LINK DENSITY (fraction of its characters that
sit inside <a> subtrees — the classic nav/footer signature), and only
content-like blocks are kept.

Heuristic basis (public literature): jusText (Pomikálek 2011) and
Boilerpipe (Kohlschütter et al., WSDM 2010) classify by link density +
block length; this implements the deterministic core of that family
(no trained model, no stopword lists — reproducible across runs).

Implementation: two handlers over the SAME generic Rewriter pass —
one segments at block tags and accumulates text, one taps only
text-within-<a> (the selector engine's match_text_within does the
anchor tracking, so misnested anchors behave exactly like the
reference's selector semantics). One parse per document.
"""

from __future__ import annotations

import html as _html

from .rewriter import Rewriter, Selector

# Block-forming tags: a new block starts when one opens or explicitly
# closes. Matches the HTML5 flow-content blocks jusText segments on.
BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "caption", "dd", "div",
    "dl", "dt", "fieldset", "figcaption", "figure", "footer", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol",
    "p", "pre", "section", "table", "td", "th", "tr", "ul",
})

# Subtrees whose text is never content (same ignore set as extraction).
IGNORE_TAGS = ("iframe", "noscript", "script", "style", "svg")


class _AnchorTap:
    """Second handler: counts characters of text chunks inside <a>."""

    __slots__ = ("owner", "_selector")

    def __init__(self, owner):
        self.owner = owner
        self._selector = Selector(match_text_within="a",
                                  ignore_text_within=list(IGNORE_TAGS))

    @property
    def selector(self):
        return self._selector

    def handle_text_chunk(self, chunk):
        self.owner._link_chars += len(chunk.content)


class BlockSegmenter:
    """First handler: block segmentation + text/link-char accumulation."""

    __slots__ = ("min_words", "max_link_density", "blocks", "_parts",
                 "_link_chars", "_selector")

    def __init__(self, min_words: int = 3, max_link_density: float = 0.5):
        self.min_words = min_words
        self.max_link_density = max_link_density
        self._selector = Selector(match_element="*", match_text_within="*",
                                  ignore_text_within=list(IGNORE_TAGS))
        self.reset()

    @property
    def selector(self):
        return self._selector

    def reset(self):
        self.blocks: list[dict] = []
        self._parts: list[str] = []
        self._link_chars = 0

    # -- dispatch -----------------------------------------------------------

    def handle_element(self, element):
        if element.tag_name in BLOCK_TAGS:
            self._close_block()

    def on_end_tag(self, end_tag):
        if end_tag.tag_name in BLOCK_TAGS:
            self._close_block()

    def handle_text_chunk(self, chunk):
        self._parts.append(chunk.content)

    # -- classification -------------------------------------------------------

    def _close_block(self):
        if not self._parts:
            self._link_chars = 0
            return
        raw = "".join(self._parts)
        self._parts.clear()
        text = " ".join(_html.unescape(raw).split())
        link_chars = self._link_chars
        self._link_chars = 0
        if not text:
            return
        words = len(text.split())
        density = min(1.0, link_chars / max(1, len(raw)))
        kept = (words >= self.min_words
                and density <= self.max_link_density)
        self.blocks.append({"text": text, "words": words,
                            "link_density": density, "kept": kept})

    def finish(self) -> dict:
        """Flush the trailing block and return the document summary."""
        self._close_block()
        kept = [b for b in self.blocks if b["kept"]]
        return {
            "main_text": " ".join(b["text"] for b in kept),
            "n_blocks": len(self.blocks),
            "n_kept": len(kept),
            "blocks": self.blocks,
        }


class BlockFilterEngine:
    """Per-worker engine: one compiled Rewriter, reused across rows
    (build in an actor's __init__, call ``process`` per document)."""

    def __init__(self, min_words: int = 3, max_link_density: float = 0.5):
        self.seg = BlockSegmenter(min_words, max_link_density)
        self.tap = _AnchorTap(self.seg)
        self.rewriter = Rewriter(handlers=[self.seg, self.tap])

    def process(self, text: str) -> dict:
        if "<" not in text:
            clean = " ".join(text.split())
            words = len(clean.split())
            kept = words >= self.seg.min_words
            return {"main_text": clean if kept else "",
                    "n_blocks": 1 if clean else 0,
                    "n_kept": 1 if (clean and kept) else 0,
                    "blocks": ([{"text": clean, "words": words,
                                 "link_density": 0.0, "kept": kept}]
                               if clean else [])}
        self.seg.reset()
        self.rewriter.rewrite(text)
        return self.seg.finish()
