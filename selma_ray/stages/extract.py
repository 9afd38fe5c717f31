"""Actor-pool extraction stage.

`ExtractTurns` is a callable CLASS for `ds.map_batches(ExtractTurns, ...)`:
the compiled ruleset (CSS selector automata + sanitizer flag tables) is
built ONCE per actor in ``__init__``; ``__call__`` processes one Arrow
batch zero-copy in and columnar out. This is the north-star's stated shape
(actor pools holding pre-compiled selector rulesets and rewriter state).

Scale notes (100 TB / 256 nodes):
- batch_format="pyarrow": blocks come out of the object store zero-copy;
  the only materialized Python objects are the text cells themselves,
  which the per-document automaton necessarily walks.
- per-row cost is O(bytes of text), so batching is BYTES-aware: oversized
  rows (> split_threshold bytes) are processed fine but callers should
  keep `batch_size` modest (default 64) so one batch × concurrency fits
  the worker heap even when payloads are MB-scale.
- output columns use large_string so a single block can exceed 2 GiB of
  text without offset overflow.
"""

from __future__ import annotations

import pyarrow as pa

from ..engine.extract import (
    DEFAULT_BREAK_TAGS,
    DEFAULT_STRIP_TAGS,
    ExtractionEngine,
)

SPAN_TYPE = pa.list_(pa.struct([
    ("selector", pa.string()),
    ("tag", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
]))


class ExtractTurns:
    """Per-actor compiled extraction engine applied to Arrow batches.

    Output columns appended to the input batch:
        extracted_text:large_string, title:string,
        spans:list<struct<selector,tag,start,end>>,
        bytes_in:int64, bytes_out:int64,
        hits_strip/hits_title/hits_meta/hits_unwrap:int32
    plus (optional, ``keep_html=True``) out_html:large_string.
    """

    def __init__(self, text_col: str = "text", sanitizer_config=None,
                 strip_tags=None, break_tags=None, keep_html: bool = False,
                 keep_spans: bool = True, collapse_whitespace: bool = True,
                 drop_input_text: bool = False,
                 span_text_runs: bool = False, keep_meta: bool = False):
        self.text_col = text_col
        self.keep_html = keep_html
        self.keep_spans = keep_spans
        # keep_meta=True adds a meta:map<string,string> column with the
        # harvested <meta name=... content=...> pairs (the reference
        # ContentExtractor's @meta state, maliciousness_test.rb:168-210)
        self.keep_meta = keep_meta
        # dropping the original HTML column inside the stage halves the
        # output block bytes through the object store and the parquet
        # write — at 100 TB the raw text should never ride along unless
        # the caller explicitly wants it
        self.drop_input_text = drop_input_text
        # compile once per actor (selector automata + sanitizer tables)
        self.engine = ExtractionEngine(
            sanitizer_config=sanitizer_config,
            strip_tags=strip_tags if strip_tags is not None else DEFAULT_STRIP_TAGS,
            break_tags=break_tags if break_tags is not None else DEFAULT_BREAK_TAGS,
            collapse_whitespace=collapse_whitespace,
            need_spans=keep_spans, need_html=keep_html,
            raw_spans=True,
            # default False: record matched-node (strip) spans only — one
            # span per text run inflates span volume ~10x on text-heavy
            # turns for little signal (the extracted text IS the content)
            span_text_runs=span_text_runs,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        process = self.engine.process
        keep_spans = self.keep_spans
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        ext = [None] * n
        titles = [None] * n
        bytes_in = [0] * n
        bytes_out = [0] * n
        hits = {k: [0] * n for k in ("strip", "title", "meta", "unwrap")}
        htmls = [None] * n if self.keep_html else None
        metas = [None] * n if self.keep_meta else None
        # spans flattened: per-row offsets into parallel field arrays —
        # StructArray/ListArray.from_arrays is ~4x cheaper than pa.array
        # over list-of-dicts at this volume
        offsets = [0] * (n + 1) if keep_spans else None
        sp_sel: list = []
        sp_tag: list = []
        sp_start: list = []
        sp_end: list = []
        for i, t in enumerate(texts):
            r = process(t if t is not None else "")
            ext[i] = r["extracted_text"]
            titles[i] = r["title"]
            bytes_in[i] = r["bytes_in"]
            bytes_out[i] = r["bytes_out"]
            h = r["selector_hits"]
            hits["strip"][i] = h["strip"]
            hits["title"][i] = h["title"]
            hits["meta"][i] = h["meta"]
            hits["unwrap"][i] = h["unwrap"]
            if keep_spans:
                for (sel, tag, a, b) in r["spans"]:
                    sp_sel.append(sel)
                    sp_tag.append(tag)
                    sp_start.append(a)
                    sp_end.append(b)
                offsets[i + 1] = len(sp_sel)
            if htmls is not None:
                htmls[i] = r["out_html"]
            if metas is not None:
                metas[i] = list(r["meta"].items())
        out = (batch.drop_columns([self.text_col])
               if self.drop_input_text else batch)
        out = out.append_column(
            "extracted_text", pa.array(ext, pa.large_string()))
        out = out.append_column("title", pa.array(titles, pa.string()))
        if keep_spans:
            struct = pa.StructArray.from_arrays(
                [pa.array(sp_sel, pa.string()),
                 pa.array(sp_tag, pa.string()),
                 pa.array(sp_start, pa.int64()),
                 pa.array(sp_end, pa.int64())],
                names=["selector", "tag", "start", "end"])
            spans_arr = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), struct)
            out = out.append_column("spans", spans_arr)
        out = out.append_column("bytes_in", pa.array(bytes_in, pa.int64()))
        out = out.append_column("bytes_out", pa.array(bytes_out, pa.int64()))
        for key in ("strip", "title", "meta", "unwrap"):
            out = out.append_column(
                f"hits_{key}", pa.array(hits[key], pa.int32()))
        if htmls is not None:
            out = out.append_column(
                "out_html", pa.array(htmls, pa.large_string()))
        if metas is not None:
            out = out.append_column(
                "meta", pa.array(metas,
                                 pa.map_(pa.string(), pa.string())))
        return out


def extract_stage(ds, *, text_col: str = "text", sanitizer_config=None,
                  strip_tags=None, break_tags=None, keep_html: bool = False,
                  keep_spans: bool = True, collapse_whitespace: bool = True,
                  drop_input_text: bool = False, span_text_runs: bool = False,
                  keep_meta: bool = False,
                  batch_size: int = 64, concurrency=None):
    """Attach the extraction actor-pool stage to a Dataset.

    ``concurrency=None`` sizes a FIXED pool to cluster CPUs minus a small
    absolute reserve (max(2, cpus//8)) — fixed pools outperform (1, N)
    autoscaling here (the autoscaler ramps slowly against a steady
    backlog) and the reserve keeps read/write tasks schedulable (a pool
    == all CPUs starves them; a 25% proportional reserve over-starves
    the pool on big machines).
    """
    import ray

    from .util import default_pool_size

    if isinstance(concurrency, int) and ray.is_initialized():
        # a pool that owns every CPU starves the read/write tasks and
        # deadlocks the streaming executor — clamp, never exceed cpus-1
        total = int(ray.cluster_resources().get("CPU", 0))
        if total:
            concurrency = max(1, min(concurrency, total - 1))
    kwargs = dict(
        fn_constructor_kwargs=dict(
            text_col=text_col, sanitizer_config=sanitizer_config,
            strip_tags=strip_tags, break_tags=break_tags,
            keep_html=keep_html, keep_spans=keep_spans,
            collapse_whitespace=collapse_whitespace,
            drop_input_text=drop_input_text,
            span_text_runs=span_text_runs, keep_meta=keep_meta),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )
    kwargs["concurrency"] = (concurrency if concurrency is not None
                             else default_pool_size())
    return ds.map_batches(ExtractTurns, **kwargs)


class FilterBlocks:
    """Actor-pool stage for block-level boilerplate classification
    (engine.blocks: jusText-style word-count + link-density heuristics).

    Appends (main_text:large_string, n_blocks:int32, n_kept:int32) to
    the batch; the per-block table rides only when ``keep_blocks=True``
    (list<struct> column — sizeable, off by default at corpus scale).
    """

    def __init__(self, text_col: str = "text", min_words: int = 3,
                 max_link_density: float = 0.5,
                 drop_input_text: bool = False,
                 keep_blocks: bool = False):
        from ..engine.blocks import BlockFilterEngine

        self.text_col = text_col
        self.drop_input_text = drop_input_text
        self.keep_blocks = keep_blocks
        self.engine = BlockFilterEngine(min_words, max_link_density)

    def __call__(self, batch: pa.Table) -> pa.Table:
        process = self.engine.process
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        main = [None] * n
        n_blocks = [0] * n
        n_kept = [0] * n
        blocks = [None] * n if self.keep_blocks else None
        for i, t in enumerate(texts):
            r = process(t if t is not None else "")
            main[i] = r["main_text"]
            n_blocks[i] = r["n_blocks"]
            n_kept[i] = r["n_kept"]
            if blocks is not None:
                blocks[i] = r["blocks"]
        out = (batch.drop_columns([self.text_col])
               if self.drop_input_text else batch)
        out = out.append_column("main_text",
                                pa.array(main, pa.large_string()))
        out = out.append_column("n_blocks", pa.array(n_blocks, pa.int32()))
        out = out.append_column("n_kept", pa.array(n_kept, pa.int32()))
        if blocks is not None:
            out = out.append_column("blocks", pa.array(
                blocks, pa.list_(pa.struct([
                    ("text", pa.string()), ("words", pa.int64()),
                    ("link_density", pa.float64()), ("kept", pa.bool_()),
                ]))))
        return out


def block_filter_stage(ds, *, text_col: str = "text", min_words: int = 3,
                       max_link_density: float = 0.5,
                       drop_input_text: bool = False,
                       keep_blocks: bool = False,
                       batch_size: int = 64, concurrency=None):
    """Attach the block-filter actor-pool stage (same pool sizing rules
    as extract_stage)."""
    from .util import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        FilterBlocks,
        fn_constructor_kwargs=dict(
            text_col=text_col, min_words=min_words,
            max_link_density=max_link_density,
            drop_input_text=drop_input_text, keep_blocks=keep_blocks),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class ToMarkdown:
    """Actor: HTML-bearing text column -> Markdown column.

    The MarkdownEngine (compiled '*' selector + handler state) is built
    once per actor; rows without '<' pass through stripped. Built ON
    the public handler protocol (engine/markdown.py) — the stage is
    plumbing only."""

    def __init__(self, text_col: str = "text", out_col: str = "markdown"):
        from ..engine.markdown import MarkdownEngine

        self.engine = MarkdownEngine()
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        convert = self.engine.convert
        md = [convert(t or "") for t in
              batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col,
                                   pa.array(md, pa.large_string()))


def markdown_stage(ds, *, text_col: str = "text", out_col: str = "markdown",
                   batch_size: int = 64, concurrency: int | tuple = 4):
    return ds.map_batches(
        ToMarkdown,
        fn_constructor_kwargs=dict(text_col=text_col, out_col=out_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
