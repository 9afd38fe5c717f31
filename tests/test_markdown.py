"""HTML -> Markdown converter (engine/markdown.py): golden pairs,
handler-protocol integration, and the Ray stage."""

import pyarrow as pa
import pytest

from selma_ray.engine.markdown import MarkdownEngine, html_to_markdown


GOLDENS = [
    ("<h1>Title</h1><p>Hello <b>world</b> and <em>style</em>.</p>",
     "# Title\n\nHello **world** and *style*."),
    ('<p>See <a href="http://x.com">the site</a> now</p>',
     "See [the site](http://x.com) now"),
    ("<ul><li>one</li><li>two<ul><li>nested</li></ul></li></ul>",
     "- one\n- two\n  - nested"),
    ("<ol><li>first</li><li>second</li></ol>", "1. first\n2. second"),
    ("<pre>  raw   text\nline2</pre>", "```\n  raw   text\nline2\n```"),
    ("<p>inline <code>x = 1</code> code</p>", "inline `x = 1` code"),
    ("<nav>menu</nav><h2>Real</h2><p>body</p><footer>foot</footer>",
     "## Real\n\nbody"),
    ("<blockquote>wise words</blockquote>", "> wise words"),
    ("plain text no html", "plain text no html"),
    ("<p>a&amp;b &lt;tag&gt;</p>", "a&b <tag>"),
    ("<div>x<br>y</div><hr><p>z</p>", "x\ny\n\n---\n\nz"),
    ('<p><img src="i.png" alt="pic"> caption</p>', "![pic](i.png) caption"),
    # whitespace collapsing across inline boundaries
    ("<p>a \n  b</p><p>c</p>", "a b\n\nc"),
    # strip subtree suppresses markers AND text, incl. indirectly
    ("<nav><ul><li><a href='/'>home</a></li></ul></nav><p>x</p>", "x"),
    # script/style dropped even without sanitizer
    ("<p>keep</p><script>var x=1;</script><style>.a{}</style>", "keep"),
]


@pytest.mark.parametrize("html,want", GOLDENS)
def test_goldens(html, want):
    assert html_to_markdown(html) == want


def test_engine_reuse_resets_state():
    eng = MarkdownEngine()
    assert eng.convert("<ol><li>a</li></ol>") == "1. a"
    # counter/list state must not leak into the next document
    assert eng.convert("<ol><li>b</li></ol>") == "1. b"
    assert eng.convert("<b>unclosed") == "**unclosed"


def test_malformed_nesting_degrades_safely():
    # implicit closes never fire on_end_tag: markers stay unbalanced
    # but state machine survives and later docs are unaffected
    eng = MarkdownEngine()
    out = eng.convert("<p><b>bold<p>next</p>")
    assert "bold" in out and "next" in out
    assert eng.convert("<p>clean</p>") == "clean"


def test_markdown_stage(ray_session):
    import ray.data

    from selma_ray.stages.extract import markdown_stage

    tbl = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(["<h1>T</h1><p>b</p>", "no html", ""]),
    })
    rows = sorted(
        markdown_stage(ray.data.from_arrow(tbl), concurrency=2).take_all(),
        key=lambda r: r["doc_id"])
    assert [r["markdown"] for r in rows] == ["# T\n\nb", "no html", ""]


def test_realworld_page_converts():
    """The 29KB real-world fixture page (reference
    test/fixtures/docs.html) converts without error, drops chrome, and
    keeps headings/links in markdown form."""
    with open("/root/reference/test/fixtures/docs.html",
              encoding="utf-8") as f:
        html = f.read()
    md = html_to_markdown(html)
    # the 29KB page is ~98% chrome (nav/head/script); the surviving
    # main content is a ~400-char clean article body
    assert len(md) > 300
    assert "<script" not in md and "<div" not in md
    assert "# " in md        # at least one heading
    assert "](" in md        # at least one resolved link
