"""Document-structure extraction: table grids and heading outlines."""

from __future__ import annotations

import json

import pyarrow as pa

from selma_ray.pipelines.structure import (
    OutlineHarvester,
    TableHarvester,
    harvest_outline_batch,
    harvest_tables_batch,
)
from selma_ray.engine.rewriter import Rewriter


def _run_tables(html: str):
    h = TableHarvester()
    Rewriter(sanitizer=None, handlers=[h]).rewrite(html)
    return h.tables


def _run_outline(html: str):
    h = OutlineHarvester()
    Rewriter(sanitizer=None, handlers=[h]).rewrite(html)
    return h.headings


class TestTableHarvester:
    def test_basic_grid_with_inline_tags(self):
        got = _run_tables(
            "<table><tr><th>a</th><th>b</th></tr>"
            "<tr><td>1<b>!</b></td><td>2</td></tr></table>")
        assert got == [[["a", "b"], ["1!", "2"]]]

    def test_multiple_tables_and_intercell_text_dropped(self):
        got = _run_tables(
            "<p>pre</p><table><tr><td>x</td>stray</tr></table>"
            "mid<table><tr><td>y</td></tr></table>")
        assert got == [[["x"]], [["y"]]]

    def test_unclosed_cells_malformed(self):
        # unclosed td: the next <td> implicitly closes it (stream order)
        got = _run_tables("<table><tr><td>a<td>b</tr></table>")
        assert got == [[["a", "b"]]]

    def test_no_tables(self):
        assert _run_tables("<p>hello</p>") == []


class TestOutlineHarvester:
    def test_levels_in_stream_order(self):
        got = _run_outline(
            "<h1>One</h1><p>x</p><h3>Three <em>deep</em></h3><h2>Two</h2>")
        assert got == [(1, "One"), (3, "Three deep"), (2, "Two")]

    def test_empty_heading(self):
        assert _run_outline("<h2></h2>") == [(2, "")]


def test_batch_fns_schema_and_skip():
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(
            ["<h1>T</h1><table><tr><td>c</td></tr></table>", "plain"],
            pa.large_string()),
    })
    t = harvest_tables_batch(batch)
    assert t.column("doc_id").to_pylist() == [1]
    assert t.column("n_tables").to_pylist() == [1]
    assert t.column("n_rows").to_pylist() == [1]
    assert t.column("n_cells").to_pylist() == [1]
    assert json.loads(t.column("tables_json").to_pylist()[0]) == [[["c"]]]
    o = harvest_outline_batch(batch)
    assert o.column("doc_id").to_pylist() == [1]
    assert o.column("heading").to_pylist() == ["T"]
