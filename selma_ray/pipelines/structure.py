"""Document-structure extraction over HTML-bearing text columns:
``<table>`` grids and ``<h1>-<h6>`` outlines.

Both ride the PUBLIC handler protocol (selector + handle_element +
handle_text_chunk — the same duck-typed surface the reference exposes,
/root/reference/ext/selma/src/rewriter.rs:80-143), i.e. they are user
handlers, not engine specials: the engine streams each document once
and the handlers accumulate per-document state that is flushed into
output columns after the ``rewrite`` call.

Scale shape: map-only (stateless tasks, compiled rewriter cached once
per worker process); the fan-out is per-document bounded, no shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..engine.rewriter import Rewriter, Selector

_HEADINGS = ("h1", "h2", "h3", "h4", "h5", "h6")


class TableHarvester:
    """Collect every ``<table>`` as a list of rows of cell texts.

    Chunks are delivered only inside ``td/th`` (match_text_within), so
    any delivered text belongs to the innermost open cell — malformed
    HTML (text between cells) simply never reaches the handler.
    Nested tables are flattened into their outermost grid position in
    stream order (each ``<table>`` start still opens its own grid).
    """

    def __init__(self):
        self._selector = Selector(match_element="table, tr, td, th",
                                  match_text_within="td, th")
        self.tables: list[list[list[str]]] = []

    @property
    def selector(self):
        return self._selector

    def reset(self):
        self.tables.clear()

    def handle_element(self, element):
        tag = element.tag_name
        if tag == "table":
            self.tables.append([])
        elif tag == "tr":
            if self.tables:
                self.tables[-1].append([])
        else:  # td / th
            if self.tables and self.tables[-1]:
                self.tables[-1][-1].append("")

    def handle_text_chunk(self, chunk):
        if self.tables and self.tables[-1] and self.tables[-1][-1]:
            row = self.tables[-1][-1]
            row[-1] += chunk.to_s()


class OutlineHarvester:
    """Collect ``(level, heading_text)`` pairs in stream order."""

    def __init__(self):
        sel = ", ".join(_HEADINGS)
        self._selector = Selector(match_element=sel,
                                  match_text_within=sel)
        self.headings: list[tuple[int, str]] = []

    @property
    def selector(self):
        return self._selector

    def reset(self):
        self.headings.clear()

    def handle_element(self, element):
        self.headings.append((int(element.tag_name[1]), ""))

    def handle_text_chunk(self, chunk):
        if self.headings:
            lvl, txt = self.headings[-1]
            self.headings[-1] = (lvl, txt + chunk.to_s())


_CACHED: dict = {}  # per worker process: handler class -> (rewriter, h)


def _get(cls):
    if cls not in _CACHED:
        h = cls()
        _CACHED[cls] = (Rewriter(sanitizer=None, handlers=[h]), h)
    return _CACHED[cls]


def harvest_tables_batch(batch: pa.Table, *, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """One output row per document that contains >= 1 table:
    (id, n_tables, n_rows, n_cells, tables_json) where tables_json is
    the JSON list-of-grids (list<list<list<string>>> kept as JSON so
    the sink schema stays flat)."""
    rewriter, h = _get(TableHarvester)
    ids_out, n_tab, n_row, n_cell, js = [], [], [], [], []
    for rid, text in zip(batch.column(id_col).to_pylist(),
                         batch.column(text_col).to_pylist()):
        if not text or "<table" not in text:
            continue
        h.reset()
        rewriter.rewrite(text)
        if not h.tables:
            continue
        ids_out.append(rid)
        n_tab.append(len(h.tables))
        n_row.append(sum(len(t) for t in h.tables))
        n_cell.append(sum(len(r) for t in h.tables for r in t))
        js.append(json.dumps(h.tables, separators=(",", ":")))
    return pa.table({
        id_col: pa.array(ids_out, batch.column(id_col).type),
        "n_tables": pa.array(n_tab, pa.int64()),
        "n_rows": pa.array(n_row, pa.int64()),
        "n_cells": pa.array(n_cell, pa.int64()),
        "tables_json": pa.array(js, pa.large_string()),
    })


def harvest_outline_batch(batch: pa.Table, *, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """One output row per heading: (id, ord, level, heading)."""
    rewriter, h = _get(OutlineHarvester)
    ids_out, ords, levels, texts = [], [], [], []
    for rid, text in zip(batch.column(id_col).to_pylist(),
                         batch.column(text_col).to_pylist()):
        if not text or "<h" not in text:
            continue
        h.reset()
        rewriter.rewrite(text)
        for i, (lvl, txt) in enumerate(h.headings):
            ids_out.append(rid)
            ords.append(i)
            levels.append(lvl)
            texts.append(txt)
    return pa.table({
        id_col: pa.array(ids_out, batch.column(id_col).type),
        "ord": pa.array(ords, pa.int64()),
        "level": pa.array(levels, pa.int64()),
        "heading": pa.array(texts, pa.string()),
    })


def extract_tables(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(harvest_tables_batch,
                          fn_kwargs={"text_col": text_col, "id_col": id_col},
                          batch_format="pyarrow")


def extract_outline(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(harvest_outline_batch,
                          fn_kwargs={"text_col": text_col, "id_col": id_col},
                          batch_format="pyarrow")
