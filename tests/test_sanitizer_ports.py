"""Direct ports of /root/reference/test/selma_sanitizer_test.rb — the
last reference test file not yet cited elsewhere (config retrieval,
custom allowlists, non-standard elements, html/body fragments, iframe
content removal)."""

import pytest

from selma_ray.engine.rewriter import Rewriter
from selma_ray.engine.sanitizer import Sanitizer


class TestSanitizerPorts:
    # selma_sanitizer_test.rb:7-12
    def test_it_sanitizes_by_default(self):
        html = "<a href='https://google.com'>here is a neat site!</a>"
        assert Rewriter().rewrite(html) == "here is a neat site!"

    # selma_sanitizer_test.rb:14-21
    def test_it_can_retrieve_elements(self):
        s = Sanitizer({"elements": ["a"]})
        assert s.config["elements"] == ["a"]

    # selma_sanitizer_test.rb:23-40
    def test_it_can_keep_attributes(self):
        s = Sanitizer({
            "elements": ["a"],
            "attributes": {"a": ["href"]},
            "protocols": {"a": {"href": ["ftp", "http", "https", "mailto",
                                         "relative"]}},
        })
        html = "<a href='https://google.com'>wow!</a>"
        assert Rewriter(sanitizer=s).rewrite(html) == \
            '<a href="https://google.com">wow!</a>'

    # selma_sanitizer_test.rb:42-60
    def test_it_can_remove_attributes(self):
        s = Sanitizer({
            "elements": ["a"],
            "attributes": {"a": ["href"]},
            "protocols": {"a": {"href": ["ftp", "http", "https", "mailto",
                                         "relative"]}},
        })
        html = "<a href='https://google.com' class='very'>wow!</a>"
        assert Rewriter(sanitizer=s).rewrite(html) == \
            '<a href="https://google.com">wow!</a>'

    # selma_sanitizer_test.rb:62-67 (reference raises ArgumentError at
    # construction-time validation; ours raises ValueError in __init__)
    def test_it_can_be_turned_off(self):
        with pytest.raises(ValueError):
            Rewriter(sanitizer=None)

    # selma_sanitizer_test.rb:69-88
    def test_can_handle_non_standard_elements(self):
        frag = ('<svg height="100" width="100">\n'
                '<circle cx="50" cy="50" r="40" stroke="black" '
                'stroke-width="3" fill="red" />\n'
                '</svg>\n')
        s = Sanitizer({
            "elements": ["svg", "circle"],
            "attributes": {"svg": ["width"], "circle": ["cx", "cy", "r"]},
        })
        assert Rewriter(sanitizer=s).rewrite(frag) == \
            '<svg width="100">\n<circle cx="50" cy="50" r="40" />\n</svg>\n'

    # selma_sanitizer_test.rb:96-101 (the #fragment block uses
    # elements: ["html"])
    def test_should_sanitize_an_html_fragment(self):
        s = Sanitizer({"elements": ["html"]})
        html = ('<b>Lo<!-- comment -->rem</b> <a href="pants" title="foo">'
                'ipsum</a> <a href="http://foo.com/"><strong>dolor</strong>'
                '</a> sit<br/>amet <script>alert("hello world");</script>')
        assert Rewriter(sanitizer=s).rewrite(html) == \
            "Lorem ipsum dolor sitamet "

    # selma_sanitizer_test.rb:103-108
    def test_should_not_modify_the_input_string(self):
        inp = "<b>foo</b>"
        Rewriter(sanitizer=Sanitizer({"elements": ["html"]})).rewrite(inp)
        assert inp == "<b>foo</b>"

    # selma_sanitizer_test.rb:110-119
    def test_should_not_choke_on_fragments_containing_html_or_body(self):
        assert Rewriter().rewrite("<html><b>foo</b></html>") == "foo"
        assert Rewriter().rewrite("<body><b>foo</b></body>") == "foo"
        assert Rewriter().rewrite(
            "<html><body><b>foo</b></body></html>") == "foo"
        assert Rewriter().rewrite(
            "<!DOCTYPE html><html><body><b>foo</b></body></html>") == "foo"

    # selma_sanitizer_test.rb:121-123
    def test_should_not_choke_on_frozen_fragments(self):
        assert Rewriter().rewrite("<b>foo</b>") == "foo"

    # selma_sanitizer_test.rb:152-155
    def test_should_remove_the_contents_of_dangerous_elements(self):
        html = ('<iframe src="https://www.youtube.com/embed/dXBohfjc4WA" '
                'width="680" height="480" allowfullscreen>hackerman'
                '</iframe>')
        assert Rewriter().rewrite(html) == ""
