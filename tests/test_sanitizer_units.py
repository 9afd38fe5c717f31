"""Sanitizer unit tests ported from the reference suite:
selma_sanitizer_elements_test.rb, selma_sanitizer_comments_test.rb,
selma_sanitizer_doctype_test.rb, selma_sanitizer_parser_test.rb,
selma_sanitizer_malicious_html_test.rb."""

import pytest

from selma_ray import config
from selma_ray.engine import Rewriter, Sanitizer


def rw(cfg=None, **kw):
    if cfg is None and not kw:
        return Rewriter()
    return Rewriter(sanitizer=Sanitizer(cfg), **kw)


# -- default config (elements_test.rb:9-80) ---------------------------------

def test_remove_nonallowlisted_elements_keeping_safe_contents():
    assert Rewriter().rewrite(
        'foo <b>bar</b> <strong><a href="#a">baz</a></strong> quux'
    ) == "foo bar baz quux"
    assert Rewriter().rewrite('<script>alert("<xss>");</script>') == ""
    assert Rewriter().rewrite('<<script>script>alert("<xss>");</<script>>') == ""
    assert Rewriter().rewrite('< script <>> alert("<xss>");</script>') == \
        '< script <>> alert("");</script>'


def test_whitespace_elements_surrounded_with_spaces():
    assert Rewriter().rewrite("foo<div>bar</div>baz") == "foo bar baz"
    assert Rewriter().rewrite("foo<br>bar<br>baz") == "foo bar baz"
    assert Rewriter().rewrite("foo<hr>bar<hr>baz") == "foo bar baz"


def test_several_instances_of_same_element_in_a_row():
    assert Rewriter().rewrite(
        '<img src="http://www.google.com/intl/en_ALL/images/logo.gif">' * 4) == ""


@pytest.mark.parametrize("tag", [
    "iframe", "math", "noembed", "noframes", "noscript", "style", "svg", "xmp"])
def test_removed_contents_of_remove_contents_tags(tag):
    assert Rewriter().rewrite(
        f"<{tag}>hello! <script>alert(0)</script></{tag}>") == ""


def test_removed_contents_of_plaintext():
    assert Rewriter().rewrite("<plaintext>hello! <script>alert(0)</script>") == ""


def test_removed_contents_of_nested_script():
    # NOTE: confused by the embedding (reference comment, elements_test.rb:66)
    assert Rewriter().rewrite(
        "<script>hello! <script>alert(0)</script></script>") == "</script>"


# -- custom configs (elements_test.rb:170-433) ------------------------------

def test_attributes_on_all_elements_via_all_key():
    inp = "<p>bar</p>"
    assert Rewriter().rewrite(inp) == " bar "
    assert rw({"elements": ["p"], "attributes": {"all": ["class"]}}).rewrite(inp) == inp
    assert rw({"elements": ["p"], "attributes": {"div": ["class"]}}).rewrite(inp) == inp
    assert rw({"elements": ["p"], "attributes": {"p": ["title"], "all": ["class"]}}
              ).rewrite(inp) == inp


def test_relative_urls_not_allowed_unless_allowlisted():
    inp = '<a href="/foo/bar">Link</a>'
    s = {"elements": ["a"], "attributes": {"a": ["href"]},
         "protocols": {"a": {"href": ["http"]}}}
    assert rw(s).rewrite(inp) == "<a>Link</a>"


def test_relative_url_colon_not_in_first_path_segment():
    s = {"elements": ["a"], "attributes": {"a": ["href"]},
         "protocols": {"a": {"href": [config.RELATIVE]}}}
    inp = '<a href="/wiki/Special:Random">Random Page</a>'
    assert rw(s).rewrite(inp) == inp


def test_relative_url_colon_in_anchor():
    s = {"elements": ["a"], "attributes": {"a": ["href"]},
         "protocols": {"a": {"href": [config.RELATIVE]}}}
    assert rw(s).rewrite('<a href="#fn:1">Footnote 1</a>') == \
        '<a href="#fn:1">Footnote 1</a>'
    assert rw(s).rewrite('<a href="somepage#fn:1">Footnote 1</a>') == \
        '<a href="somepage#fn:1">Footnote 1</a>'
    assert rw(s).rewrite('<a href="fn:1">Footnote 1</a>') == "<a>Footnote 1</a>"


def test_all_protocols():
    inp = ('<a href="/foo/bar">Link</a>\n'
           '<a href="http://wow.com/foo/bar">Link</a>\n'
           '<a href="https://wow.com/foo/bar">Link</a>\n'
           '<a href="ftp://wow.com/foo/bar">Link</a>\n'
           '<a href="ssh://127.0.0.1">Link</a>\n')
    s = {"elements": ["a"], "attributes": {"a": ["href"]},
         "protocols": {"a": {"href": config.ALL}}}
    assert rw(s).rewrite(inp) == inp


def test_remove_contents_true():
    assert rw({"remove_contents": True}).rewrite(
        "foo bar <div>baz<span>quux</span></div>") == "foo bar "


def test_remove_contents_array():
    assert rw({"remove_contents": ["script", "span"]}).rewrite(
        'foo bar <div>baz<span>quux</span> <b>hi</b><script>alert("hello!");</script></div>'
    ) == "foo bar baz hi"


def test_remove_contents_set_raises():
    with pytest.raises(ValueError):
        Sanitizer({"remove_contents": {"script", "span"}})


def test_allowlisted_iframe_contents_removed():
    assert rw({"elements": ["iframe"]}).rewrite(
        "<iframe>hi <script>hello</script></iframe>") == "<iframe> </iframe>"


def test_data_attributes_not_allowed_by_default():
    assert rw({"elements": ["b"]}).rewrite('<b data-foo="bar"></b>') == "<b></b>"
    assert rw({"elements": ["b"], "attributes": {"b": ["class"]}}).rewrite(
        '<b class="foo" data-foo="bar"></b>') == '<b class="foo"></b>'


def test_explicit_data_attributes_allowed():
    s = {"elements": ["b"], "attributes": {"b": ["data-foo", "data-bar"]}}
    good = '<b data-foo="valid" data-bar="valid"></b>'
    assert rw(s).rewrite(good) == good
    for bad in ['<b data-="invalid"></b>', '<b data-xml="invalid"></b>',
                '<b data-xmlfoo="invalid"></b>', '<b data-f:oo="valid"></b>',
                '<b data-f/oo="partial"></b>', '<b data-éfoo="valid"></b>']:
        assert rw(s).rewrite(bad) == "<b></b>"


def test_protocols_case_insensitive():
    s = {"elements": ["a"], "attributes": {"a": ["href"]},
         "protocols": {"a": {"href": ["https"]}}}
    inp = '<a href="hTTpS://foo.com/">Text</a>'
    assert rw(s).rewrite(inp) == inp
    assert rw(s).rewrite(
        '<a href="mailto:someone@example.com?Subject=Hello">Text</a>') == "<a>Text</a>"


def test_protocols_in_data_attributes():
    inp = '<a data-url="mailto:someone@example.com">Text</a>'
    s1 = {"elements": ["a"], "attributes": {"a": ["data-url"]},
          "protocols": {"a": {"data-url": ["https"]}}}
    assert rw(s1).rewrite(inp) == "<a>Text</a>"
    s2 = {"elements": ["a"], "attributes": {"a": ["data-url"]},
          "protocols": {"a": {"data-url": ["mailto"]}}}
    assert rw(s2).rewrite(inp) == inp


def test_meta_charset_forced_utf8():
    s = {"elements": ["html", "head", "meta", "body"],
         "attributes": {"meta": ["charset"]}}
    assert rw(s).rewrite(
        '<html><head><meta charset="utf-8"></head><body>Howdy!</body></html>'
    ) == '<html><head><meta charset="utf-8"></head><body>Howdy!</body></html>'
    s2 = {"elements": ["html", "meta"], "attributes": {"meta": ["charset"]}}
    assert rw(s2).rewrite('<html><meta charset="utf-8">Howdy!</html>') == \
        '<html><meta charset="utf-8">Howdy!</html>'
    assert rw(s2).rewrite('<html><meta charset="us-ascii">Howdy!</html>') == \
        '<html><meta charset="utf-8">Howdy!</html>'


def test_valueless_attributes():
    s = config.thaw(config.BASIC)
    assert rw(s).rewrite("foo <a href>foo</a> bar") == "foo <a href>foo</a> bar"


def test_attribute_names_downcased_for_checks():
    s = config.thaw(config.BASIC)
    assert rw(s).rewrite('<a HREF="javascript:alert(\'foo\')">bar</a>') == "<a>bar</a>"


def test_special_chars_encoded_in_attribute_values():
    s = config.thaw(config.RELAXED)
    assert rw(s).rewrite(
        '<a href="http://example.com" title="<b>&eacute;xamples</b> & things">foo</a>'
    ) == '<a href="http://example.com" title="&lt;b&gt;éxamples&lt;/b&gt; &amp; things">foo</a>'


# -- comments (comments_test.rb) ---------------------------------------------

def test_comments_removed():
    r = rw({"allow_comments": False, "elements": ["div"]})
    assert r.rewrite("foo <!-- comment --> bar") == "foo  bar"
    assert r.rewrite("foo <!-- ") == "foo "
    assert r.rewrite("foo <!-- - -> bar") == "foo "
    assert r.rewrite("foo <!--\n\n\n\n-->bar") == "foo bar"
    assert r.rewrite("foo <!-- <!-- <!-- --> --> -->bar") == "foo  --> -->bar"
    assert r.rewrite("foo <div <!-- comment -->>bar</div>") == "foo "
    # comment markup inside <script> is text, not a comment
    assert r.rewrite("<script><!-- comment --></script>") == ""
    r2 = rw({"allow_comments": False, "elements": ["script"]})
    assert r2.rewrite("<script><!-- comment --></script>") == \
        "<script><!-- comment --></script>"


def test_comments_kept():
    r = rw({"allow_comments": True, "elements": ["div"]})
    assert r.rewrite("foo <!-- comment --> bar") == "foo <!-- comment --> bar"
    assert r.rewrite("foo <!-- ") == "foo <!-- "
    assert r.rewrite("foo <!-- - -> bar") == "foo <!-- - -> bar"
    assert r.rewrite("foo <!--\n\n\n\n-->bar") == "foo <!--\n\n\n\n-->bar"
    assert r.rewrite("foo <!-- <!-- <!-- --> --> -->bar") == \
        "foo <!-- <!-- <!-- --> --> -->bar"
    assert r.rewrite("foo <div <!-- comment -->>bar</div>") == "foo "
    r2 = rw({"allow_comments": True, "elements": ["script"]})
    assert r2.rewrite("<script><!-- comment --></script>") == \
        "<script><!-- comment --></script>"


# -- doctype (doctype_test.rb) ------------------------------------------------

def test_doctype_removed():
    r = rw({"allow_doctype": False, "elements": ["html"]})
    assert r.rewrite("<!DOCTYPE html><html>foo</html>") == "<html>foo</html>"
    assert r.rewrite("<!DOCTYPE html>foo") == "foo"


def test_doctype_allowed():
    r = rw({"allow_doctype": True, "elements": ["html"]})
    assert r.rewrite("<!DOCTYPE html><html>foo</html>") == \
        "<!DOCTYPE html><html>foo</html>"
    assert r.rewrite(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN"><html>foo</html>'
    ) == '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN"><html>foo</html>'


# -- parser edges (parser_test.rb) ---------------------------------------------

def test_valid_entities_left_alone():
    assert Rewriter().rewrite("&apos;&eacute;&amp;") == "&apos;&eacute;&amp;"


def test_orphaned_ampersand():
    assert Rewriter().rewrite("at&t") == "at&t"


def test_no_newlines_added_when_serializing():
    s = {"elements": ["div", "p"]}
    inp = "<div>foo\n\n<p>bar</p><div>\nbaz</div></div><div>quux</div>"
    assert rw(s).rewrite(inp) == inp


def test_unterminated_script_style():
    assert Rewriter().rewrite("foo <script>bar") == "foo "
    assert Rewriter().rewrite("foo <style>bar") == "foo "


def test_ambiguous_non_tag_brackets():
    assert Rewriter().rewrite("1 > 2 and 2 < 1") == "1 > 2 and 2 < 1"
    assert Rewriter().rewrite("OMG HAPPY BIRTHDAY! *<:-D") == \
        "OMG HAPPY BIRTHDAY! *<:-D"


def test_incomplete_markup_at_eof_keeps_preceding_text():
    # the reference writes without calling the rewriter's end()
    # (rewriter.rs:442-472): the partial token at EOF is dropped, but text
    # already confirmed BEFORE it was emitted by lol_html as it parsed
    assert Rewriter().rewrite("keep me <") == "keep me "
    assert Rewriter().rewrite("keep me <div") == "keep me "
    assert Rewriter().rewrite("keep me </") == "keep me "
    assert Rewriter().rewrite("keep me </div") == "keep me "
    assert Rewriter().rewrite('keep me <a href="x') == "keep me "
    # rawtext subtree followed by incomplete markup: both text runs survive
    assert Rewriter().rewrite("<xmp>gone</xmp> tail <") == " tail "


# -- malicious html (malicious_html_test.rb) -----------------------------------

@pytest.fixture
def relaxed():
    return rw(config.thaw(config.RELAXED))


def test_conditional_comments(relaxed):
    assert relaxed.rewrite(
        "<!--[if gte IE 4]>\n<script>alert('XSS');</script>\n<![endif]-->") == ""


def test_protocol_js_via_embedded_whitespace(relaxed):
    """malicious_html_test.rb:134-140: a tab smuggled inside the scheme
    must not resurrect javascript: (scheme scan sees 'jav\tascript')."""
    assert relaxed.rewrite(
        "<img src=\"jav\tascript:alert('XSS');\">") == "<img>"


def test_malformed_event_attribute(relaxed):
    assert relaxed.rewrite(
        '<html><head></head><body onload!#$%&()*~+-_.,:;?@[/|\\]^`=alert("XSS")></body></html>'
    ) == "<html><head></head><body></body></html>"


def test_improperly_closed_iframe(relaxed):
    assert relaxed.rewrite("<iframe src=http://ha.ckers.org/scriptlet.html <") == ""


def test_unquoted_img_src_js(relaxed):
    assert relaxed.rewrite('<img src=javascript:alert("XSS")>') == "<img>"


def test_grave_accent_img_src(relaxed):
    assert relaxed.rewrite('<img src=`javascript:alert("XSS")`>') == "<img>"


def test_malformed_img_tag_script(relaxed):
    assert relaxed.rewrite('<img """><script>alert("XSS")</script>">') == '<img>">'


def test_protocol_based_js_encodings(relaxed):
    vectors = [
        "<img src=&#106;&#97;&#118;&#97;&#115;&#99;&#114;&#105;&#112;&#116;&#58;&#97;&#108;&#101;&#114;&#116;&#40;&#39;&#88;&#83;&#83;&#39;&#41;>",
        "<img src=&#0000106&#0000097&#0000118&#0000097&#0000115&#0000099&#0000114&#0000105&#0000112&#0000116&#0000058&#0000097&#0000108&#0000101&#0000114&#0000116&#0000040&#0000039&#0000088&#0000083&#0000083&#0000039&#0000041>",
        "<img src=&#x6A&#x61&#x76&#x61&#x73&#x63&#x72&#x69&#x70&#x74&#x3A&#x61&#x6C&#x65&#x72&#x74&#x28&#x27&#x58&#x53&#x53&#x27&#x29>",
        '<img src="jav&#x09;ascript:alert(\'XSS\');">',
        '<img src="jav&#x0A;ascript:alert(\'XSS\');">',
        '<img src="jav&#x0D;ascript:alert(\'XSS\');">',
        '<img src=java\0script:alert("XSS")>',
        '<img src=" &#14;  javascript:alert(\'XSS\');">',
        '<img src="j\na v\tascript://alert(\'XSS\');">',
        '<img src="jav\tascript:alert(\'XSS\');">',
    ]
    for v in vectors:
        assert relaxed.rewrite(v) == "<img>", v


def test_half_open_img_tag(relaxed):
    assert relaxed.rewrite('<img src="javascript:alert(\'XSS\')"') == ""


def test_script_with_malformed_nonalnum_tag_name(relaxed):
    assert relaxed.rewrite(
        '<script/xss src="http://ha.ckers.org/xss.js">alert(1)</script>') == ""


def test_extraneous_open_brackets(relaxed):
    assert relaxed.rewrite('<<script>alert("XSS");//<</script>') == ""


@pytest.mark.parametrize("wrapper", ["math", "svg"])
@pytest.mark.parametrize("tag", [
    "iframe", "noembed", "noframes", "noscript", "plaintext", "script",
    "style", "xmp"])
def test_foreign_content_bypass(relaxed, wrapper, tag):
    assert relaxed.rewrite(
        f"<{wrapper}><{tag}>/*&lt;/{tag}&gt;&lt;img src onerror=alert(1)>*/") == ""
