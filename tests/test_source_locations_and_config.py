"""Attribute source locations (selma_rewriter_attribute_source_location_test.rb)
and config merge/freeze behavior (selma_sanitizer_config_test.rb)."""

import pytest

from selma_ray import config
from selma_ray.engine import Rewriter, Selector


class Capture:
    def __init__(self, *names):
        self.names = names
        self.locations = {}

    @property
    def selector(self):
        return Selector(match_element="a, input, div")

    def handle_element(self, element):
        for name in self.names:
            self.locations[name] = element.attribute_source_location(name)


def _run(handler, html):
    Rewriter(sanitizer=None, handlers=[handler]).rewrite(html)


def _slice(html, span):
    return html[span[0]:span[1]]


def test_byte_offsets_for_name_and_value():
    h = Capture("href")
    html = '<p>hi <a href="/world">link</a></p>'
    _run(h, html)
    loc = h.locations["href"]
    assert loc is not None
    assert _slice(html, loc["name"]) == "href"
    assert _slice(html, loc["value"]) == "/world"


def test_empty_value_range_for_explicit_empty_value():
    h = Capture("disabled")
    html = '<input disabled="">'
    _run(h, html)
    loc = h.locations["disabled"]
    assert loc is not None
    assert _slice(html, loc["name"]) == "disabled"
    assert _slice(html, loc["value"]) == ""


def test_nil_for_pure_boolean_attribute():
    h = Capture("disabled")
    _run(h, "<input disabled>")
    assert h.locations["disabled"] is None


def test_nil_for_missing_attribute():
    h = Capture("nope")
    _run(h, '<a href="/x">link</a>')
    assert h.locations["nope"] is None


def test_nil_for_attribute_added_during_rewrite():
    added = {}

    class ModifyAndCapture:
        @property
        def selector(self):
            return Selector(match_element="a")

        def handle_element(self, element):
            element["data-new"] = "x"
            added["new"] = element.attribute_source_location("data-new")
            added["orig"] = element.attribute_source_location("href")

    html = '<a href="/x">link</a>'
    _run(ModifyAndCapture(), html)
    assert added["new"] is None
    assert added["orig"] is not None
    assert _slice(html, added["orig"]["name"]) == "href"
    assert _slice(html, added["orig"]["value"]) == "/x"


def test_distinct_offsets_for_multiple_attributes():
    h = Capture("class", "data-foo")
    html = '<div class="a b" data-foo="baz">x</div>'
    _run(h, html)
    cl, fo = h.locations["class"], h.locations["data-foo"]
    assert _slice(html, cl["name"]) == "class"
    assert _slice(html, cl["value"]) == "a b"
    assert _slice(html, fo["name"]) == "data-foo"
    assert _slice(html, fo["value"]) == "baz"
    assert cl["name"] != fo["name"]


# -- config merge / freeze (lib/selma/sanitizer/config.rb:9-58) ---------------

def test_merge_returns_new_dict():
    base = {"elements": ["a"], "attributes": {"a": ["href"]}}
    out = config.merge(base, {"elements": ["b"]})
    assert out["elements"] == ["b"]
    assert base["elements"] == ["a"]
    assert out["attributes"] == {"a": ["href"]}


def test_merge_dedupes_lists():
    out = config.merge({}, {"elements": ["a", "b", "a", "b"]})
    assert out["elements"] == ["a", "b"]


def test_merge_nested_dicts():
    out = config.merge({"protocols": {"a": {"href": ["http"]}}},
                       {"protocols": {"a": {"href": ["https"]}}})
    assert out["protocols"]["a"]["href"] == ["https"]


def test_freeze_config_is_readonly():
    frozen = config.freeze_config({"elements": ["a"], "attributes": {"a": ["x"]}})
    with pytest.raises(TypeError):
        frozen["elements"] = []
    assert isinstance(frozen["elements"], tuple)


def test_presets_round_trip_through_thaw():
    for preset in (config.DEFAULT, config.RESTRICTED, config.BASIC, config.RELAXED):
        thawed = config.thaw(preset)
        assert isinstance(thawed, dict)
        # a sanitizer can be built from every thawed preset
        from selma_ray.engine import Sanitizer

        Sanitizer(thawed)
