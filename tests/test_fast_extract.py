"""Fast extraction path must be field-for-field identical to the generic
rewriter path (ExtractionEngine(fast=False)) — same extracted text, title,
meta, spans, hits, and byte accounting. The generic path is itself verified
against the reference goldens, so equality here transfers that guarantee.
"""

from __future__ import annotations

import pytest

from selma_ray.engine.extract import ExtractionEngine
from selma_ray.sources.transcripts import synthesize_transcripts

EDGE_DOCS = [
    # plain + html mix, leading top-level text (NOT captured: text dispatch
    # requires an open element with match_text_within="*")
    'hello <b>world</b> bye',
    # boilerplate scaffold
    '<html><head><title>T</title><meta name="a" content="b"><meta charset="x">'
    '</head><body><nav><ul><li><a href="/">Home</a></li></ul></nav>'
    '<main><p>Body &amp; text</p></main><footer>foot</footer></body></html>',
    # strip-subtree nesting: break tags inside nav still emit break spaces
    '<nav><div><p>menu</p></div></nav><p>kept</p>',
    # title edge cases
    '<title>first</title><title>second</title>',
    '<title/>x<p>after self-closed title</p>',
    '<title>unclosed at eof',
    '<div><title>in div</title>tail</div>',
    # meta variants
    '<meta name=desc content=hello><meta name content><meta content="only">'
    '<meta NAME="Upper" CONTENT="v">',
    '<nav><meta name="inside" content="nav"></nav>',
    # stray / mismatched end tags
    'a</div>b<p>c</q></p>d',
    '<b><i>mis</b>nested</i>',
    # rawtext & script/style & plaintext
    '<p>x</p><script>if (1<2) document.write("<p>no</p>")</script><p>y</p>',
    '<style>.a{color:red}</style><textarea>1 < 2 <b>notag</b></textarea>',
    '<p>pre</p><plaintext><b>raw rest',
    # comments, doctype, bogus comments, processing instr
    '<!DOCTYPE html><!-- c --><p>t</p><!bogus><?pi?>',
    '<p>a<!-- mid -->b</p>',
    # entities
    '<p>at&amp;t 1 &gt; 2 &#65;</p>',
    # unclosed/malformed tags
    '<p>trail <b>bold<i>ital</b>?</i> done',
    '<blockquote>unclosed <span>span',
    '<p att=">">quoted-gt</p>',
    '< notatag <p>real</p>',
    '<p>incomplete <a href="x',
    # void + self-closing
    'a<br/>b<br>c<img src="s"/><hr>',
    # iframe is RAWTEXT and in the strip set
    '<iframe><p>inner</p></iframe><p>after</p>',
    # deep nesting + implicit closes
    '<div><ul><li>one<li>two<li>three</ul></div>',
    # svg/pre/code/form removal
    '<svg><circle r="1"/></svg><pre>code block</pre><form><input></form>ok',
    # empty doc and whitespace shapes
    '<div>  </div>',
    '<p></p>',
]


def _engines(**kw):
    slow = ExtractionEngine(fast=False, **kw)
    fast = ExtractionEngine(fast=True, **kw)
    assert fast._fast and not slow._fast
    return slow, fast


def _assert_equal(slow, fast, doc):
    a = slow.process(doc)
    b = fast.process(doc)
    assert a == b, f"fast path diverged on {doc!r}"
    assert slow.extractor.meta == fast.extractor.meta, doc


@pytest.mark.parametrize("i", range(len(EDGE_DOCS)))
def test_edge_docs(i):
    slow, fast = _engines()
    _assert_equal(slow, fast, EDGE_DOCS[i])


def test_edge_docs_no_collapse_no_unescape():
    slow, fast = _engines(collapse_whitespace=False, unescape=False)
    for doc in EDGE_DOCS:
        _assert_equal(slow, fast, doc)


def test_synthetic_corpus_equality():
    t = synthesize_transcripts(48)
    slow, fast = _engines()
    for doc in t.column("text").to_pylist():
        _assert_equal(slow, fast, doc)


def test_custom_tag_sets():
    # void tag in the strip set; title in the strip set; tiny break set
    slow, fast = _engines(strip_tags=frozenset({"img", "title", "span"}),
                          break_tags=frozenset({"p"}))
    docs = [
        '<title>stripped-as-subtree</title><p>x</p>',
        '<img src="a">text<span>gone</span> kept',
        '<p>a</p><p>b</p>',
    ]
    for doc in docs:
        _assert_equal(slow, fast, doc)


def test_matched_node_spans_only():
    # span_text_runs=False records strip spans but no per-text-run spans
    slow, fast = _engines(span_text_runs=False)
    for doc in EDGE_DOCS:
        _assert_equal(slow, fast, doc)
    r = fast.process('<nav>menu</nav><p>kept text</p>')
    assert [s["selector"] for s in r["spans"]] == ["strip"]
    assert r["extracted_text"] == "kept text"


def test_need_flags_off():
    slow, fast = _engines(need_spans=False, need_html=False)
    for doc in EDGE_DOCS:
        a, b = slow.process(doc), fast.process(doc)
        assert a["spans"] == b["spans"] == []
        assert a["bytes_out"] == b["bytes_out"]
        assert a["extracted_text"] == b["extracted_text"]
