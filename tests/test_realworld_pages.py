"""Extraction on the reference suite's real-world page fixtures
(/root/reference/test/fixtures/ — used as INPUT data only). These are the
pages the reference's ContentExtractor/TagRemover stacks run over in
test/selma_maliciousness_test.rb:212-276; our engine must produce clean
main content from them, and the fast path must agree with the generic
rewriter on real-world markup, not just synthetic soup.
"""

import os

import pytest

from selma_ray.engine.extract import ExtractionEngine

FIXTURES = "/root/reference/test/fixtures"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present")


def _page(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return f.read()


def test_docs_html_extraction():
    r = ExtractionEngine().process(_page("docs.html"))
    assert r["title"] == "Sign In | Yetto Docs"
    text = r["extracted_text"]
    # main content survives
    assert "password-less, email-based sign-in system" in text
    # boilerplate and code do not
    assert "function(" not in text and "navigator.clipboard" not in text
    assert "@media" not in text and "astro-" not in text
    # strip/meta accounting
    hits = r["selector_hits"]
    assert hits["strip"] >= 50 and hits["title"] == 1 and hits["meta"] >= 5
    assert r["bytes_out"] < r["bytes_in"] / 10


def test_deleting_content_html_extraction():
    r = ExtractionEngine().process(_page("deleting_content.html"))
    assert r["title"]
    assert r["extracted_text"]
    assert "<script" not in r["extracted_text"].lower()
    assert r["bytes_out"] < r["bytes_in"]


@pytest.mark.parametrize("name", ["docs.html", "deleting_content.html"])
def test_fast_equals_generic_on_real_pages(name):
    html = _page(name)
    assert (ExtractionEngine(fast=True).process(html)
            == ExtractionEngine(fast=False).process(html))
