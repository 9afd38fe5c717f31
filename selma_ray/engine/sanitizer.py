"""Allowlist sanitizer: config compile + per-element policy application.

Semantics mirror the reference sanitizer
(/root/reference/ext/selma/src/sanitizer.rs):

- compile(config) -> per-tag u8 flag array of size 151 (ALLOW /
  REMOVE_CONTENTS / WRAP_WHITESPACE bits), global allowed-attr list,
  per-element {allowed_attrs, protocol lists} (sanitizer.rs:46-186)
- try_remove_element (sanitizer.rs:628-699): not-allowed tags are removed;
  script/style/math/svg always lose their contents; REMOVE_CONTENTS drops the
  subtree; WRAP_WHITESPACE emits spaces around; otherwise tags are stripped
  keeping children; kept <iframe> gets its inner content blanked
- sanitize_attributes (sanitizer.rs:400-490): `<!--`-named attrs nuke the
  element; values are trimmed + entity-unescaped before policy checks;
  non-allowlisted attrs and disallowed protocols are dropped; <meta charset>
  is forced to utf-8; kept non-empty values are re-escaped and written back
- protocol scan quirks preserved verbatim (sanitizer.rs:545-581): ':relative'
  is encoded as the prefixes '#' and '/', the pre-colon prefix is compared
  case-insensitively, and values that merely contain '://' with no protocol
  rule are dropped.
"""

from __future__ import annotations

from . import tags as _tags
from .escape import escape_href, escape_html, unescape_html

ALLOW = 1 << 0
REMOVE_CONTENTS = 1 << 2
WRAP_WHITESPACE = 1 << 3

# Per-tag element-policy actions for the fused sanitize-only loop
# (rewriter._run_sanitize_only) — one dict lookup replaces the
# try_remove_element branch chain. Exactly the decisions of
# try_remove_element/_remove_element below.
A_KEEP = 0          # allowed, serialize (attrs sanitized)
A_KEEP_IFRAME = 1   # allowed iframe: inner content forced to " "
A_REMOVE_ALL = 2    # remove element + subtree (REMOVE_CONTENTS)
A_UNWRAP = 3        # drop tags, keep children
A_UNWRAP_WS = 4     # drop tags, keep children, wrap with spaces


class Sanitizer:
    __slots__ = ("flags", "allowed_attrs", "allowed_classes",
                 "element_allowed_attrs", "element_allowed_classes",
                 "protocol_sanitizers", "escape_tagfilter", "allow_comments",
                 "allow_doctype", "config", "_action_cache")

    def __init__(self, config=None):
        from .. import config as presets
        if config is None:
            config = presets.DEFAULT
        self.config = config

        flags = bytearray(_tags.TAG_COUNT)
        for el in config.get("elements", ()) or ():
            if isinstance(el, str):
                flags[_tags.tag_index(el)] |= ALLOW

        rc = config.get("remove_contents")
        if rc is not None:
            if rc is True or rc is False:
                if rc:
                    for i in range(_tags.TAG_COUNT):
                        flags[i] |= REMOVE_CONTENTS
            elif isinstance(rc, (list, tuple)):
                for el in rc:
                    if isinstance(el, str):
                        flags[_tags.tag_index(el)] |= REMOVE_CONTENTS
            else:
                raise ValueError(
                    "remove_contents must be `true`, `false`, or an array")

        for el in config.get("whitespace_elements", ()) or ():
            if isinstance(el, str):
                flags[_tags.tag_index(el)] |= WRAP_WHITESPACE
        self.flags = flags

        allowed_attrs: list[str] = []
        element_allowed_attrs: dict[str, list[str]] = {}
        attrs_cfg = config.get("attributes") or {}
        for element, attr_list in attrs_cfg.items():
            key = str(element) if not isinstance(element, str) else element
            for attr in attr_list:
                if not isinstance(attr, str):
                    continue
                if key == "all":
                    allowed_attrs.append(attr)
                else:
                    element_allowed_attrs.setdefault(key, []).append(attr)
        # frozen sets: membership is the hot check in sanitize_attributes
        self.allowed_attrs = frozenset(allowed_attrs)
        self.element_allowed_attrs = {
            k: frozenset(v) for k, v in element_allowed_attrs.items()}

        # class filtering exists in the reference but no config key feeds it
        # (sanitizer.rs:59 allowed_classes is always empty); kept for parity.
        self.allowed_classes: list[str] = []
        self.element_allowed_classes: dict[str, list[str]] = {}

        self.protocol_sanitizers: dict[str, dict[str, list[str]]] = {}
        protos_cfg = config.get("protocols") or {}
        from ..config import ALL as _ALL, RELATIVE as _RELATIVE
        for element, attr_map in protos_cfg.items():
            for attr, protos in attr_map.items():
                if isinstance(protos, (list, tuple)):
                    if _ALL in protos:
                        raise ValueError("`:all` must be passed outside of an array")
                elif protos == _ALL:
                    protos = [_ALL]
                else:
                    raise ValueError("Protocol list must be an array, or just `:all`")
                out: list[str] = []
                for p in protos:
                    if p == _RELATIVE:
                        out.extend(("#", "/"))
                    elif p == _ALL:
                        out = ["all"]
                        break
                    elif isinstance(p, str):
                        out.append(p)
                emap = self.protocol_sanitizers.setdefault(element, {})
                emap.setdefault(attr, []).extend(out)

        self.escape_tagfilter = bool(config.get("escape_tagfilter", True))
        self.allow_comments = bool(config.get("allow_comments", False))
        self.allow_doctype = bool(config.get("allow_doctype", True))
        self._action_cache: dict[str, int] = {}

    # -- element policy ----------------------------------------------------

    def element_not_allowed(self, name_lc: str) -> bool:
        return not (self.flags[_tags.tag_index(name_lc)] & ALLOW)

    def action_for(self, name_lc: str) -> int:
        """A_* action for this tag name (cached; small repeated vocab).
        Mirrors try_remove_element's decision chain exactly."""
        a = self._action_cache.get(name_lc)
        if a is None:
            fl = self.flags[_tags.tag_index(name_lc)]
            if fl & ALLOW:
                a = A_KEEP_IFRAME if name_lc == "iframe" else A_KEEP
            elif (name_lc in _tags.TEXT_CONTENT_TAGS
                  or fl & REMOVE_CONTENTS):
                a = A_REMOVE_ALL
            elif fl & WRAP_WHITESPACE:
                a = A_UNWRAP_WS
            else:
                a = A_UNWRAP
            if len(self._action_cache) > 4096:  # malformed-input safety
                self._action_cache.clear()
            self._action_cache[name_lc] = a
        return a

    def try_remove_element(self, el) -> bool:
        """Apply the element allowlist to an element view; returns removed."""
        name = el.name_lc
        flags = self.flags[_tags.tag_index(name)]
        should_remove = (not el.removed) and not (flags & ALLOW)
        if should_remove:
            if name in _tags.TEXT_CONTENT_TAGS:
                self._remove_element(el, REMOVE_CONTENTS)
            else:
                self._remove_element(el, flags)
        elif name == "iframe":
            # kept iframes get their contents blanked (sanitizer.rs:646-654)
            el.set_inner_content(" " if flags else "", content_type="text")
        return should_remove

    def _remove_element(self, el, flags: int) -> None:
        if flags & REMOVE_CONTENTS:
            el.remove()
        else:
            if flags & WRAP_WHITESPACE:
                # reference passes tag.self_closing from the VOID table here
                # (sanitizer.rs:661-670), not lol_html's explicit "/>" flag
                if el.is_void:
                    el.after(" ", content_type="text")
                else:
                    el.before(" ", content_type="text")
                    el.after(" ", content_type="text")
            el.remove_and_keep_content()

    def force_remove_element(self, el) -> None:
        self._remove_element(el, REMOVE_CONTENTS)

    # -- attribute policy --------------------------------------------------

    def sanitize_attributes(self, el) -> None:
        name_lc = el.name_lc
        el_allowed = self.element_allowed_attrs.get(name_lc, ())
        protos = self.protocol_sanitizers.get(name_lc, {})
        is_meta = name_lc == "meta"

        for attr in list(el.attrs):
            attr_name = attr.name_lc
            if attr_name.startswith("<!--"):
                # malicious data smuggled in an attribute position: drop the
                # whole element (sanitizer.rs:419-425)
                self.force_remove_element(el)
                return
            raw_val = attr.value if attr.has_value else None
            unescaped = unescape_html((raw_val or "").lstrip())

            keep = attr_name in el_allowed or attr_name in self.allowed_attrs
            if keep and unescaped:
                plist = protos.get(attr_name)
                if plist is None:
                    if "://" in unescaped:
                        keep = False
                elif not _has_allowed_protocol(plist, unescaped):
                    keep = False
            if keep and attr_name == "class":
                keep = self._sanitize_class_attribute(el, attr, unescaped)

            if not keep:
                el.remove_attribute(attr_name)
            elif is_meta:
                if attr_name == "charset" and unescaped != "utf-8":
                    el.set_attribute(attr_name, "utf-8")
            elif unescaped:
                if attr_name == "href":
                    el.set_attribute(attr_name, escape_href(unescaped))
                else:
                    el.set_attribute(attr_name, escape_html(unescaped))

    def _sanitize_class_attribute(self, el, attr, unescaped: str) -> bool:
        allowed_global = self.allowed_classes
        allowed_local = self.element_allowed_classes.get(el.name_lc, ())
        if not allowed_global and not allowed_local:
            return True
        valid = [c for c in unescaped.lstrip().split()
                 if c in allowed_global or c in allowed_local]
        if not valid:
            return False
        el.set_attribute(attr.name_lc, " ".join(valid))
        return True


def _has_allowed_protocol(protocols_allowed: list[str], attr_val: str) -> bool:
    """Faithful port of the reference's protocol scanner
    (sanitizer.rs:549-581), quirks included: the prefix ends at the first
    ':' '/' or '#' (or the last character), '/'-'#' map to :relative, and
    the pre-colon prefix must literally be in the allow list."""
    if "all" in protocols_allowed:
        return True
    pos = 0
    n = len(attr_val)
    for i, c in enumerate(attr_val):
        if c not in ":/#" and pos + 1 < n:
            pos = i + 1
        else:
            break
    ch = attr_val[pos]
    if ch == "/":
        return "/" in protocols_allowed
    if ch == "#":
        return "#" in protocols_allowed
    return attr_val[:pos].lower() in protocols_allowed
