"""String escaping helpers used by the sanitizer and the output serializer.

Behavior mirrors the escaping the reference engine applies
(/root/reference/ext/selma/src/sanitizer.rs:427-466: trim + entity-unescape
attribute values before policy checks, then HTML- or href-escape on write-back;
text inserted ``as: :text`` is HTML-escaped by the serializer).
"""

from __future__ import annotations

import html as _html

unescape_html = _html.unescape  # full HTML5 entity set, incl. no-semicolon forms


def escape_html(value: str) -> str:
    """Escape ``& < > "`` for attribute write-back (sanitizer.rs:459-466)."""
    if not any(c in value for c in '&<>"'):
        return value
    return (
        value.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def escape_text(value: str) -> str:
    """Escape text content inserted ``as: :text`` (``< > &`` only)."""
    if "&" in value or "<" in value or ">" in value:
        return value.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return value


# href escaping: percent-encode anything outside the safe set; & and ' get
# entity-escaped (cmark/houdini-style, as used by the reference's escapist dep).
_HREF_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "!#$%()*+,-./:;=?@_"
)
import re as _re  # noqa: E402

_HREF_UNSAFE_RE = _re.compile(
    "[^A-Za-z0-9!#$%()*+,\\-./:;=?@_]")


def escape_href(value: str) -> str:
    if _HREF_UNSAFE_RE.search(value) is None:
        return value
    out = []
    for ch in value:
        if ch in _HREF_SAFE:
            out.append(ch)
        elif ch == "&":
            out.append("&amp;")
        elif ch == "'":
            out.append("&#x27;")
        else:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
    return "".join(out)


def escape_quotes(value: str) -> str:
    """Escape double quotes when serializing a rewritten attribute value."""
    return value.replace('"', "&quot;") if '"' in value else value
