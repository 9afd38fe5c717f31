"""Rewriter/handler tests ported from the reference suite:
selma_rewriter_match_element_test.rb, selma_rewriter_text_test.rb,
selma_rewriter_match_attribute_test.rb, selma_rewriter_test.rb,
selma_maliciousness_test.rb (argument/robustness cases)."""

import pytest

from selma_ray.engine import (
    MemoryLimitError,
    Rewriter,
    Sanitizer,
    Selector,
    SelectorParseError,
)


class H:
    """Handler helper: build from selector kwargs + callbacks."""

    def __init__(self, sel=None, element=None, text=None, end=None, **selkw):
        self._sel = sel or Selector(**selkw)
        if element:
            self.handle_element = element
        if text:
            self.handle_text_chunk = text
        if end:
            self.on_end_tag = end

    @property
    def selector(self):
        return self._sel


def rewrite(html, *handlers, sanitizer=None):
    return Rewriter(sanitizer=sanitizer, handlers=list(handlers)).rewrite(html)


# -- match_element (match_element_test.rb) -----------------------------------

def set_class(el):
    el["class"] = "boldy"


def test_basic_element_match():
    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong", element=set_class)) == \
        '<strong class="boldy">Wow!</strong>'


def test_element_match_with_sanitizer():
    out = Rewriter(sanitizer=Sanitizer({"elements": ["strong"]}),
                   handlers=[H(match_element="strong", element=set_class)]
                   ).rewrite("<malarky><strong><junk>Wow!</junk></strong></malarky>")
    assert out == '<strong class="boldy">Wow!</strong>'


def test_handlers_run_in_order():
    def second(el):
        if el["class"] == "boldy":
            el["class"] = el["class"] + " boldy2"

    frag = "<div>Wow!</div>"
    assert rewrite(frag, H(match_element="div", element=set_class)) == \
        '<div class="boldy">Wow!</div>'
    assert rewrite(frag, H(match_element="div", element=second)) == frag
    assert rewrite(frag, H(match_element="div", element=set_class),
                   H(match_element="div", element=second)) == \
        '<div class="boldy boldy2">Wow!</div>'


def test_ancestors():
    seen = []
    rewrite("<div><p><foo><strong>Wow!</strong></foo></p></div>",
            H(match_element="strong", element=lambda el: seen.append(el.ancestors)))
    assert seen == [["div", "p", "foo"]]


def test_empty_ancestors():
    seen = []

    def cb(el):
        seen.append((el.tag_name, el.ancestors))

    rewrite("<strong>Wow!</strong>", H(match_element="strong", element=cb))
    assert seen == [("strong", [])]


def test_append_as_html():
    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong",
                     element=lambda el: el.append("<em>Gee!</em>", as_="html"))) == \
        "<strong>Wow!<em>Gee!</em></strong>"


def test_append_as_text():
    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong",
                     element=lambda el: el.append("<em>Gee!</em>", as_="text"))) == \
        "<strong>Wow!&lt;em&gt;Gee!&lt;/em&gt;</strong>"


def test_before_as_html():
    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong",
                     element=lambda el: el.before("<span>wow?</span>", as_="html"))) == \
        "<span>wow?</span><strong>Wow!</strong>"


def test_after_as_html():
    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong",
                     element=lambda el: el.after("<span>ok?</span>", as_="html"))) == \
        "<strong>Wow!</strong><span>ok?</span>"


def test_set_inner_content():
    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong",
                     element=lambda el: el.set_inner_content("Gee!", as_="text"))) == \
        "<strong>Gee!</strong>"


def test_handler_error_propagates():
    def boom(el):
        raise RuntimeError("boom!")

    with pytest.raises(RuntimeError):
        rewrite("<strong>Wow!</strong>", H(match_element="strong", element=boom))


def test_set_tag_name():
    def rename(el):
        el.tag_name = "bold"

    assert rewrite("<strong>Wow!</strong>",
                   H(match_element="strong", element=rename)) == \
        "<bold>Wow!</bold>"


def test_has_attribute():
    seen = []
    rewrite('<strong class="urgent">Wow!</strong>',
            H(match_element="strong",
              element=lambda el: seen.append(el.has_attribute("class"))))
    assert seen == [True]


def test_remove():
    seen = []

    def cb(el):
        el.remove()
        seen.append(el.removed)

    assert rewrite("<div>Wow<strong>!</strong></div>",
                   H(match_element="strong", element=cb)) == "<div>Wow</div>"
    assert seen == [True]


def test_remove_and_keep_content():
    def cb(el):
        el.remove_and_keep_content()
        assert el.removed

    assert rewrite("<div>Wow<strong>!</strong></div>",
                   H(match_element="strong", element=cb)) == "<div>Wow!</div>"


# -- match_text_within (text_test.rb) -----------------------------------------

def test_text_rewrite_all():
    def cb(t):
        t.replace(t.to_s().replace("Wow", "MEOW!", 1), as_="text")

    assert rewrite("<div>Wow!</div><span>Wow!</span><a>Wow!</a>",
                   H(match_text_within="*", text=cb)) == \
        "<div>MEOW!!</div><span>MEOW!!</span><a>MEOW!!</a>"


def test_text_type_rcdata():
    seen = []
    rewrite("<title>Howdy</title>",
            H(match_text_within="*", text=lambda t: seen.append(t.text_type)))
    assert seen == ["rc_data"]


def test_text_match_subset_of_elements():
    def cb(t):
        t.replace(t.content.replace("Wow", "MEOW!", 1), as_="text")

    assert rewrite("<div>Wow!</div><span>Wow!</span><a>Wow!</a>",
                   H(match_text_within="a, div", text=cb)) == \
        "<div>MEOW!!</div><span>Wow!</span><a>MEOW!!</a>"


def test_text_before():
    assert rewrite("<div>Wow!</div>",
                   H(match_text_within="div",
                     text=lambda t: t.before("MEOW! ", as_="text"))) == \
        "<div>MEOW! Wow!</div>"


def test_text_after():
    assert rewrite("<div>Wow!</div>",
                   H(match_text_within="div",
                     text=lambda t: t.after(" MEOW!", as_="text"))) == \
        "<div>Wow! MEOW!</div>"


def test_combined_element_and_text_handler():
    def el_cb(el):
        el["class"] = "neato"

    def tx_cb(t):
        t.replace(t.to_s().replace("you", "y'all", 1), as_="html")

    assert rewrite(
        "<div><p>Could you visit <a>this link and tell me what you think?</a> Thank you!</div>",
        H(Selector(match_element="div", match_text_within="div, p, a"),
          element=el_cb, text=tx_cb)) == \
        "<div class=\"neato\"><p>Could y'all visit <a>this link and tell me what y'all think?</a> Thank y'all!</div>"


def test_ignore_text_within():
    def cb(t):
        t.replace(t.to_s().replace("@gjtorik", "@gjtorikian", 1), as_="text")

    assert rewrite(
        '<div><p>Hello @gjtorik: <code>@gjtorik</code></p><br/> <pre>@gjtorik</pre></div>',
        H(Selector(match_text_within="*", ignore_text_within=["code", "pre"]),
          text=cb)) == \
        '<div><p>Hello @gjtorikian: <code>@gjtorik</code></p><br/> <pre>@gjtorik</pre></div>'


def test_ignore_text_within_considers_indirect_ancestors():
    def cb(t):
        t.replace(t.to_s().replace("foo", "bar", 1), as_="html")

    assert rewrite(
        '<p>foo</p><code>foo<span class="highlight">foo</span></code>',
        H(Selector(match_text_within="*", ignore_text_within=["code"]),
          text=cb)) == \
        '<p>bar</p><code>foo<span class="highlight">foo</span></code>'


def test_text_handler_stacking_text():
    def tr1(t):
        t.replace(t.to_s().replace("1", "2"), as_="text")

    def tr2(t):
        t.replace(t.to_s().replace("2", "3"), as_="text")

    assert rewrite("<div>1 + 2 = 6</div>",
                   H(match_text_within="*", text=tr1),
                   H(match_text_within="*", text=tr2)) == "<div>3 + 3 = 6</div>"


def test_text_handler_stacking_html():
    def h1(t):
        t.replace(t.to_s().replace("1", "<strong>1</strong>", 1), as_="html")

    def h2(t):
        t.replace(t.to_s().replace("2", "<em>2</em>", 1), as_="html")

    assert rewrite("<div>1 + 2 = 3</div>",
                   H(match_text_within="*", text=h1),
                   H(match_text_within="*", text=h2)) == \
        "<div><strong>1</strong> + <em>2</em> = 3</div>"


# -- attributes (match_attribute_test.rb) --------------------------------------

def test_remove_attribute():
    assert rewrite("<a foo='bleh'><span foo='keep'>Wow!</span></a>",
                   H(match_element="a",
                     element=lambda el: el.remove_attribute("foo"))) == \
        "<a><span foo='keep'>Wow!</span></a>"


def test_attributes_hash():
    seen = []
    rewrite("<article><div class='a b c 1 2 3' data-foo='baz'>Wow!</div></article>",
            H(match_element="div", element=lambda el: seen.append(el.attributes)))
    assert seen == [{"class": "a b c 1 2 3", "data-foo": "baz"}]


# -- rewriter-level (rewriter_test.rb) ------------------------------------------

def test_memory_options_require_prealloc():
    with pytest.raises(ValueError):
        Rewriter(options={"memory": {"max_allowed_memory_usage": 4}})


def test_memory_cap_enforced():
    base = [
        f'<p data-sourcepos="{i}:1-{i}:4"><sup data-sourcepos="{i}:1-{i}:4" '
        f'class="footnote-ref"><a href="#fn-{i}" id="fnref-{i}" '
        f'data-footnote-ref>{i}</a></sup></p>'
        for i in range(10)
    ]
    html = "\n".join(base)
    from selma_ray import config as presets

    def rm_class(el):
        el.remove_attribute("class")

    def rm_rel(el):
        if el["rel"] != "license":
            el.remove_attribute("rel")

    r = Rewriter(
        sanitizer=Sanitizer(presets.thaw(presets.RELAXED)),
        handlers=[H(match_element='a:not([class="anchor"])', element=rm_class),
                  H(match_element="a[id], li[id]", element=lambda el: None),
                  H(match_element="a", element=rm_rel)],
        options={"memory": {"max_allowed_memory_usage": len(html) // 2,
                            "preallocated_parsing_buffer_size": len(html) // 4}})
    with pytest.raises(MemoryLimitError):
        r.rewrite(html)


def test_rewritten_text_chunk_not_resanitized():
    import re

    def cb(t):
        content = t.to_s()
        if "@" not in content:
            return
        html = re.sub(r"@(\w+)",
                      r'<a href="https://yetto.app/\1" class="user-mention">@\1</a>',
                      content)
        t.replace(html, as_="html")

    s = Sanitizer({"elements": ["a", "p"], "attributes": {"a": ["href"]},
                   "protocols": {"a": {"href": ["https"]}}})
    out = Rewriter(sanitizer=s, handlers=[H(match_text_within="*", text=cb)]
                   ).rewrite("<p>Hey there, @gjtorikian is here.</p>")
    assert out == ('<p>Hey there, <a href="https://yetto.app/gjtorikian" '
                   'class="user-mention">@gjtorikian</a> is here.</p>')


# -- robustness (maliciousness_test.rb) ----------------------------------------

def test_missing_selector_raises():
    class NoSelector:
        def handle_element(self, el):
            el["class"] = "boldy"

    with pytest.raises(AttributeError):
        Rewriter(sanitizer=None, handlers=[NoSelector()])


def test_missing_handle_element_is_noop():
    frag = "<span>Wow!</span>"
    assert rewrite(frag, H(match_element="b")) == frag


def test_text_selector_without_handle_text_chunk_raises():
    with pytest.raises(RuntimeError):
        Rewriter(sanitizer=None, handlers=[H(match_text_within="strong")]
                 ).rewrite("<strong>Wow!</strong>")


def test_nil_sanitizer_and_no_handlers_raises():
    with pytest.raises(ValueError):
        Rewriter(sanitizer=None, handlers=[])


def test_non_iterable_handlers_raises():
    with pytest.raises(TypeError):
        Rewriter(sanitizer=None, handlers=818)


def test_wrong_handler_type_raises():
    with pytest.raises(AttributeError):
        Rewriter(sanitizer=None, handlers=[562])


def test_selector_wrong_return_type_raises():
    class Bad:
        @property
        def selector(self):
            return 3

    with pytest.raises(TypeError):
        Rewriter(sanitizer=None, handlers=[Bad()])


def test_selector_requires_some_match():
    with pytest.raises(ValueError):
        Selector()


def test_selector_non_string_match_raises():
    with pytest.raises(TypeError):
        Selector(match_element=42)
    with pytest.raises(TypeError):
        Selector(match_text_within=42)


def test_sanitizer_all_must_not_be_in_array():
    from selma_ray import config as presets

    with pytest.raises(ValueError):
        Sanitizer({"elements": ["a"], "attributes": {"a": ["href"]},
                   "protocols": {"a": {"href": [presets.ALL]}}})


# -- selector validation (selector_test.rb) -------------------------------------

def test_invalid_css_raises():
    with pytest.raises(SelectorParseError):
        Selector(match_element="a[href=]")


def test_empty_css_raises():
    with pytest.raises(SelectorParseError):
        Selector(match_element="")


def test_nested_not_accepted():
    Selector(match_element="div:not(:not(.foo))")
    Selector(match_element=":not(:not(:not(span)))")


def test_nested_not_matching():
    def cb(el):
        el["data-matched"] = "true"

    assert rewrite('<a class="keep">yes</a><a class="other">no</a>',
                   H(match_element="a:not(:not(.keep))", element=cb)) == \
        '<a class="keep" data-matched="true">yes</a><a class="other">no</a>'


# -- on_end_tag ------------------------------------------------------------------

def test_on_end_tag_called():
    seen = []
    rewrite("<div><strong>x</strong></div>",
            H(match_element="strong", end=lambda e: seen.append(e.tag_name)))
    assert seen == ["strong"]
