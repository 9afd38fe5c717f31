"""Static HTML tag metadata table.

Semantics mirror the reference engine's tag table
(/root/reference/ext/selma/src/tags.rs:170-976): 150 known tag names with a
stable index, a ``self_closing`` (void) flag, and category predicates. Unknown
tags map to index 150 (tags.rs:972-976), which notably means allow-listing any
one unknown tag name allow-lists *all* unknown tags — a reference quirk we
preserve for row-for-row parity.
"""

from __future__ import annotations

# (name, index) in reference order; the void list matches tags.rs exactly.
_TAG_NAMES = [
    "html", "head", "title", "base", "link", "meta", "style", "script",
    "noscript", "template", "body", "article", "section", "nav", "aside",
    "h1", "h2", "h3", "h4", "h5", "h6", "hgroup", "header", "footer",
    "address", "p", "hr", "pre", "blockquote", "ol", "ul", "li", "dl", "dt",
    "dd", "figure", "figcaption", "main", "div", "a", "em", "strong", "small",
    "s", "cite", "q", "dfn", "abbr", "data", "time", "code", "var", "samp",
    "kbd", "sub", "sup", "i", "b", "u", "mark", "ruby", "rt", "rp", "bdi",
    "bdo", "span", "br", "wbr", "ins", "del", "image", "img", "iframe",
    "embed", "object", "param", "video", "audio", "source", "track", "canvas",
    "map", "area", "math", "mi", "mo", "mn", "ms", "mtext", "mglyph",
    "malignmark", "annotation", "svg", "foreignobject", "desc", "table",
    "caption", "colgroup", "col", "tbody", "thead", "tfoot", "tr", "td", "th",
    "form", "fieldset", "legend", "label", "input", "button", "select",
    "datalist", "optgroup", "option", "textarea", "keygen", "output",
    "progress", "meter", "details", "summary", "menu", "menuitem", "applet",
    "acronym", "bgsound", "dir", "frame", "frameset", "noframes", "listing",
    "xmp", "nextid", "noembed", "plaintext", "rb", "strike", "basefont",
    "big", "blink", "center", "font", "marquee", "multicol", "nobr",
    "spacer", "tt", "rtc", "dialog",
]

TAG_COUNT = 151
UNKNOWN_INDEX = 150

TAG_INDEX: dict[str, int] = {name: i for i, name in enumerate(_TAG_NAMES)}

# Void ("self_closing" in the reference's terminology) elements — tags.rs
# self_closing: true entries.
VOID_TAGS = frozenset({
    "base", "link", "meta", "hr", "br", "wbr", "img", "embed", "param",
    "source", "track", "area", "col", "input", "keygen", "menuitem",
    "bgsound", "frame", "basefont",
})

# Tags whose contents are text nodes and must be removed when the element is
# filtered (tags.rs has_text_content).
TEXT_CONTENT_TAGS = frozenset({"script", "style", "math", "svg"})

# Tags the escape-tagfilter second pass force-removes when not allow-listed
# (tags.rs is_tag_escapeworthy / ESCAPEWORTHY_TAGS_CSS).
ESCAPEWORTHY_TAGS = frozenset({
    "title", "iframe", "math", "noembed", "noframes", "noscript",
    "plaintext", "script", "style", "svg", "textarea", "xmp",
})

# The CSS list the escape-tagfilter pass actually matches
# (tags.rs:208-209 ESCAPEWORTHY_TAGS_CSS) — narrower than ESCAPEWORTHY_TAGS
# (no math/svg/noscript; those are handled by pass 1's has_text_content rule).
ESCAPE_PASS_TAGS = frozenset({
    "title", "textarea", "style", "xmp", "iframe", "noembed", "noframes",
    "script", "plaintext",
})

# Tokenizer content modes (HTML spec "generic raw text"/"RCDATA" elements).
RCDATA_TAGS = frozenset({"title", "textarea"})
RAWTEXT_TAGS = frozenset({"style", "xmp", "iframe", "noembed", "noframes", "noscript"})
# script -> script data state; plaintext -> PLAINTEXT state (to EOF).


def tag_index(name_lc: str) -> int:
    """Index into the per-tag flag array; unknown names collapse to 150."""
    return TAG_INDEX.get(name_lc, UNKNOWN_INDEX)
