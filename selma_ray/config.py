"""Sanitizer configuration presets and merge helpers.

Data ported from the reference's pure-data config hashes
(/root/reference/lib/selma/sanitizer/config/{default,restricted,basic,relaxed}.rb)
and merge/freeze semantics from lib/selma/sanitizer/config.rb:9-58.

Config keys:
  elements: list[str]                 tags to allow
  attributes: {element|"all": [attr]} allowed attributes ("all" = global)
  protocols: {element: {attr: [proto | ":relative" | ":all"]}}
  remove_contents: bool | list[str]   drop subtree of these filtered tags
  whitespace_elements: list[str]      surround removed tag with spaces
  allow_comments: bool (default False)
  allow_doctype: bool (default True when absent; presets set it explicitly)
  escape_tagfilter: bool (default True)
"""

from __future__ import annotations

from types import MappingProxyType
from typing import Any

RELATIVE = ":relative"
ALL = ":all"

VALID_PROTOCOLS = ["http", "https", "mailto", RELATIVE]


def merge(config: dict, other: dict | None = None) -> dict:
    """Deep-merge ``other`` into ``config`` (new dict; inputs untouched).

    Mirrors Selma::Sanitizer::Config.merge: nested dicts merge recursively
    (empty-dict bases are replaced), lists from ``other`` are deduped
    order-preserving, scalars are replaced.
    """
    if not isinstance(config, dict):
        raise TypeError("config must be a dict")
    other = other or {}
    if not isinstance(other, dict):
        raise TypeError("other_config must be a dict")
    merged: dict = {}
    for key in list(config.keys()) + [k for k in other if k not in config]:
        if key in merged:
            continue
        oldval = config.get(key)
        if key in other:
            newval = other[key]
            if isinstance(oldval, dict) and isinstance(newval, dict):
                merged[key] = dict(newval) if not oldval else merge(oldval, newval)
            elif isinstance(newval, list):
                merged[key] = list(dict.fromkeys(newval))
            else:
                merged[key] = list(newval) if isinstance(newval, (set, tuple)) else newval
        else:
            merged[key] = (
                dict(oldval) if isinstance(oldval, dict)
                else list(oldval) if isinstance(oldval, list)
                else oldval
            )
    return merged


def freeze_config(config: dict) -> MappingProxyType:
    """Deep-freeze a config dict (read-only mapping views, tuples for lists)."""
    def _freeze(v: Any) -> Any:
        if isinstance(v, dict):
            return MappingProxyType({k: _freeze(x) for k, x in v.items()})
        if isinstance(v, (list, set, tuple)):
            return tuple(_freeze(x) for x in v)
        return v
    return _freeze(config)


def thaw(config: Any) -> Any:
    """Deep-copy a (possibly frozen) config back into plain dict/list form."""
    if isinstance(config, (MappingProxyType, dict)):
        return {k: thaw(v) for k, v in config.items()}
    if isinstance(config, (tuple, list, set)):
        return [thaw(v) for v in config]
    return config


DEFAULT = freeze_config({
    "allow_comments": False,
    "allow_doctype": False,
    "attributes": {},
    "elements": [],
    "protocols": {},
    "remove_contents": [
        "iframe", "math", "noembed", "noframes", "noscript", "plaintext",
        "script", "style", "svg", "xmp",
    ],
    "whitespace_elements": [
        "address", "article", "aside", "blockquote", "br", "dd", "div", "dl",
        "dt", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "header",
        "hgroup", "hr", "li", "nav", "ol", "p", "pre", "section", "ul",
    ],
})

RESTRICTED = freeze_config({
    "elements": ["b", "em", "i", "strong", "u"],
    "whitespace_elements": list(DEFAULT["whitespace_elements"]),
})

BASIC = freeze_config({
    "elements": [
        "a", "abbr", "blockquote", "b", "br", "cite", "code", "dd", "dfn",
        "dl", "dt", "em", "i", "kbd", "li", "mark", "ol", "p", "pre", "q",
        "s", "samp", "small", "strike", "strong", "sub", "sup", "time", "u",
        "ul", "var",
    ],
    "attributes": {
        "a": ["href"],
        "abbr": ["title"],
        "blockquote": ["cite"],
        "dfn": ["title"],
        "q": ["cite"],
        "time": ["datetime", "pubdate"],
    },
    "protocols": {
        "a": {"href": ["ftp", "http", "https", "mailto", RELATIVE]},
        "blockquote": {"cite": ["http", "https", RELATIVE]},
        "q": {"cite": ["http", "https", RELATIVE]},
    },
})

RELAXED = freeze_config(merge(thaw(BASIC), {
    "elements": list(BASIC["elements"]) + [
        "address", "article", "aside", "bdi", "bdo", "body", "caption",
        "col", "colgroup", "data", "del", "details", "div", "figcaption",
        "figure", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "head",
        "header", "hgroup", "hr", "html", "img", "ins", "main", "nav", "rp",
        "rt", "ruby", "section", "span", "style", "summary", "sup", "table",
        "tbody", "td", "tfoot", "th", "thead", "title", "tr", "wbr",
    ],
    "allow_doctype": True,
    "attributes": merge(thaw(BASIC["attributes"]), {
        "all": ["class", "dir", "hidden", "id", "lang", "style", "tabindex",
                "title", "translate"],
        "a": ["href", "hreflang", "name", "rel"],
        "col": ["span", "width"],
        "colgroup": ["span", "width"],
        "data": ["value"],
        "del": ["cite", "datetime"],
        "img": ["align", "alt", "border", "height", "src", "srcset", "width"],
        "ins": ["cite", "datetime"],
        "li": ["value"],
        "ol": ["reversed", "start", "type"],
        "style": ["media", "scoped", "type"],
        "table": ["align", "bgcolor", "border", "cellpadding", "cellspacing",
                  "frame", "rules", "sortable", "summary", "width"],
        "td": ["abbr", "align", "axis", "colspan", "headers", "rowspan",
               "valign", "width"],
        "th": ["abbr", "align", "axis", "colspan", "headers", "rowspan",
               "scope", "sorted", "valign", "width"],
        "ul": ["type"],
    }),
    "protocols": merge(thaw(BASIC["protocols"]), {
        "del": {"cite": ["http", "https", RELATIVE]},
        "img": {"src": ["http", "https", RELATIVE]},
        "ins": {"cite": ["http", "https", RELATIVE]},
    }),
}))
