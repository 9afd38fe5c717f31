"""CSS selector matching conformance: the full operator set lol_html
supports (reference: ext/selma/src/selector.rs validates via lol_html's
parser; matching semantics observed through the reference handler tests).
"""

import pytest

from selma_ray import Rewriter, Selector

HTML = ('<div id="main" class="a b"><p lang="en-US" data-x="hello world">t</p>'
        '<a href="https://x.io/page.html" rel="nofollow external">l</a>'
        '<span class="b"></span></div>')

CASES = [
    ("div#main", ["div"]),
    (".a.b", ["div"]),
    ("#main.a", ["div"]),
    ("[lang|=en]", ["p"]),               # dash-prefix match
    ("[rel~=external]", ["a"]),          # whitespace-list contains
    ("[href^=https]", ["a"]),            # prefix
    ("[href$='.html']", ["a"]),          # suffix
    ("[data-x*='o w']", ["p"]),          # substring
    ("[href]", ["a"]),                   # presence
    ("[href='https://x.io/page.html']", ["a"]),  # exact
    ("div > p", ["p"]),                  # child combinator
    ("div p, div a", ["p", "a"]),        # comma list, document order
    ("div :not(.b)", ["p", "a"]),        # :not with class
    ("span:not([class])", []),           # :not with attr presence
    ("*", ["div", "p", "a", "span"]),    # universal
    ("div span", ["span"]),              # descendant
    ("p, p", ["p"]),                     # duplicate selectors fire once
]


@pytest.mark.parametrize("css,expect", CASES)
def test_selector_matches(css, expect):
    got = []

    class H:
        selector = Selector(match_element=css)

        def handle_element(self, el):
            got.append(el.tag_name)

    Rewriter(sanitizer=None, handlers=[H()]).rewrite(HTML)
    assert got == expect, css
