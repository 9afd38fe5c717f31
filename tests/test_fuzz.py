"""Property-based robustness: the engine must never crash, loop, or
diverge between paths on ARBITRARY input — transcript turns at 10^12
scale will contain every malformed byte sequence that exists.

Three invariants:
  1. fast extraction path ≡ generic rewriter path, for any string;
  2. no unallowed ESCAPEWORTHY tag (script/style/iframe/title/...)
     survives sanitization — the escape-tagfilter second pass's whole
     purpose (rewriter.rs:307-354). NOTE: full idempotence is NOT a
     property of this engine family (nor of the reference): RCDATA
     content like `<title><nav>` re-parses as live markup on the next
     pass; pass 2 only guards the escapeworthy set.
  3. nothing raises on any input (malformed tags, stray brackets,
     unterminated everything).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from selma_ray import Rewriter, Sanitizer, config
from selma_ray.engine.extract import ExtractionEngine

# HTML-shaped fragments: heavy on structural tokens so generated strings
# actually exercise the tokenizer's tag/comment/rawtext branches
_html_soup = st.lists(
    st.sampled_from(
        list("<>/=\"' !&;#-abPqZ\t\n")
        + ["<b>", "</b>", "<p ", "<!--", "-->", "<script>", "</script>",
           "<title>", "</title>", "<nav>", "</nav>", "<br/>", "&amp;",
           "<meta name=", "content=", "<div class='x'>", "</div>",
           "<iframe>", "<svg>", "<foo", "]]>", "<![CDATA[", "<?php",
           "</", "<!", "x=y", "<a href=javascript:alert(1)>",
           "<a href='/rel#f'>", '<A HREF="HTTP://x/">', "</iframe>",
           "<meta charset=UTF-8>", "<img src=x onerror=y>",
           "<blockquote cite='&#106;avascript:x'>"]),
    max_size=80,
).map("".join)

_slow = ExtractionEngine(fast=False)
_fast = ExtractionEngine(fast=True)
_sanitizer = Rewriter(sanitizer=Sanitizer(config.DEFAULT))
_relaxed = Rewriter(sanitizer=Sanitizer(config.RELAXED))


@given(_html_soup)
@settings(max_examples=400, deadline=None)
def test_fast_path_equals_generic_on_soup(s):
    assert _fast.process(s) == _slow.process(s)


def _assert_no_live_escapeworthy(out: str, sanitizer: Sanitizer):
    from selma_ray.engine.tags import ESCAPE_PASS_TAGS
    from selma_ray.engine.tokenizer import tokenize

    for tok in tokenize(out):
        if tok[0] == "start":
            name = tok[1].name_lc
            assert not (name in ESCAPE_PASS_TAGS
                        and sanitizer.element_not_allowed(name)), (name, out)


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_no_unallowed_escapeworthy_survives_default(s):
    _assert_no_live_escapeworthy(
        _sanitizer.rewrite(s), _sanitizer.sanitizer)


@given(_html_soup)
@settings(max_examples=200, deadline=None)
def test_no_unallowed_escapeworthy_survives_relaxed(s):
    _assert_no_live_escapeworthy(_relaxed.rewrite(s), _relaxed.sanitizer)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_arbitrary_unicode_never_raises(s):
    _sanitizer.rewrite(s)
    _fast.process(s)
    assert _fast.process(s) == _slow.process(s)


def _forced_two_pass(rw: Rewriter, s: str) -> str:
    """rewrite() with the pass-2 prefilter disabled: always re-parse."""
    from selma_ray.engine.rewriter import _EscapeFilterSanitizer

    out = rw._run(s, rw.sanitizer, rw.handlers)
    return rw._run(out, _EscapeFilterSanitizer(rw.sanitizer), ())


@given(_html_soup)
@settings(max_examples=400, deadline=None)
def test_escape_pass_prefilter_matches_forced_pass_default(s):
    # skipping pass 2 must be an exact identity decision: the prefiltered
    # rewrite() equals an unconditional two-pass run on any input
    assert _sanitizer.rewrite(s) == _forced_two_pass(_sanitizer, s)


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_escape_pass_prefilter_matches_forced_pass_relaxed(s):
    assert _relaxed.rewrite(s) == _forced_two_pass(_relaxed, s)


_basic = Rewriter(sanitizer=Sanitizer(config.BASIC))
_restricted = Rewriter(sanitizer=Sanitizer(config.RESTRICTED))


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_fused_sanitize_matches_generic_basic(s):
    # BASIC exercises the protocol allowlists (incl. :relative) through
    # the fused sanitize-only loop vs the generic dispatch loop
    assert _basic.rewrite(s) == _forced_two_pass(_basic, s)


@given(_html_soup)
@settings(max_examples=200, deadline=None)
def test_fused_sanitize_matches_generic_restricted(s):
    assert _restricted.rewrite(s) == _forced_two_pass(_restricted, s)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="<>/ab c=\"'&;!-x\n", max_size=160))
def test_block_filter_invariants(doc):
    """Block filter never crashes, densities stay in [0,1], and kept
    blocks respect the word-count floor."""
    from selma_ray.engine.blocks import BlockFilterEngine

    eng = BlockFilterEngine(min_words=2)
    r = eng.process(doc)
    assert r["n_kept"] <= r["n_blocks"] == len(r["blocks"])
    for b in r["blocks"]:
        assert 0.0 <= b["link_density"] <= 1.0
        assert b["words"] == len(b["text"].split())
        if b["kept"]:
            assert b["words"] >= 2 and b["link_density"] <= 0.5
    assert r["main_text"] == " ".join(
        b["text"] for b in r["blocks"] if b["kept"])


_md_engine = None


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_markdown_never_raises_and_resets(s):
    """The markdown handler must survive arbitrary malformed soup and
    leave no state behind (a poisoned document must not corrupt the
    next one — per-actor engines are reused across batches)."""
    global _md_engine
    from selma_ray.engine.markdown import MarkdownEngine

    if _md_engine is None:
        _md_engine = MarkdownEngine()
    _md_engine.convert(s)
    assert _md_engine.convert("<h1>ok</h1>") == "# ok"
