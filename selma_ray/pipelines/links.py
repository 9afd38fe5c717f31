"""Link harvesting over HTML-bearing text columns.

Uses the selector engine's handler machinery (an ``a[href]`` rule — the
same attribute-selector dispatch the reference exercises in its href-
rewriting benchmark handler, /root/reference/test/benchmark/selma_config.rb:4-17)
to pull every anchor's href out of each row, then a partial-aggregate
``groupby`` to roll link counts up by domain.

Scale shape: link extraction is map-only (stateless tasks; the compiled
rewriter is cached once per worker process). The domain rollup pre-
aggregates inside each batch so the shuffle moves one row per
(batch, domain) — domains are low-cardinality, so the wide step is tiny
no matter how many links the corpus holds.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..engine.rewriter import Rewriter, Selector


class LinkHarvester:
    """Handler: collect the href of every matched ``a[href]`` element."""

    def __init__(self):
        self._selector = Selector(match_element="a[href]")
        self.links: list[str] = []

    @property
    def selector(self):
        return self._selector

    def reset(self):
        self.links.clear()

    def handle_element(self, element):
        href = element["href"]
        if href is not None:
            self.links.append(href)


_CACHED = None  # (rewriter, harvester) — compiled once per worker process


def _get_rewriter():
    global _CACHED
    if _CACHED is None:
        h = LinkHarvester()
        _CACHED = (Rewriter(sanitizer=None, handlers=[h]), h)
    return _CACHED


def domain_of(href: str) -> str:
    """Normalized host of an absolute URL; '' for relative/opaque refs.

    Normalized = userinfo and port stripped, lowercased — otherwise
    'Example.com', 'example.com:8080' and 'user@example.com' count as
    three distinct domains and fragment every per-domain rollup."""
    if "://" not in href:
        return ""
    authority = href.split("://", 1)[1] \
        .split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    host = authority.rsplit("@", 1)[-1]          # drop userinfo
    if host.startswith("["):                     # [ipv6]:port
        host = host.split("]", 1)[0] + "]"
    else:
        host = host.split(":", 1)[0]             # drop port
    return host.lower()


def harvest_links_batch(batch: pa.Table, *, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """One output row per (row, href) — rows without links emit nothing."""
    rewriter, harvester = _get_rewriter()
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids, out_hrefs, out_domains = [], [], []
    for rid, text in zip(ids, texts):
        if not text or "<" not in text:
            continue
        harvester.reset()
        rewriter.rewrite(text)
        for href in harvester.links:
            out_ids.append(rid)
            out_hrefs.append(href)
            out_domains.append(domain_of(href))
    return pa.table({
        id_col: pa.array(out_ids, batch.column(id_col).type),
        "href": pa.array(out_hrefs, pa.string()),
        "domain": pa.array(out_domains, pa.string()),
    })


def extract_links(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """doc_id, href, domain — one row per anchor, engine-extracted."""
    return ds.map_batches(harvest_links_batch,
                          fn_kwargs={"text_col": text_col, "id_col": id_col},
                          batch_format="pyarrow")


def link_domains(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """domain, n_links — partial per-batch counts, then a small groupby."""
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    links = extract_links(ds, text_col=text_col, id_col=id_col)

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(["domain"])
             .group_by("domain").aggregate([("domain", "count")]))
        return pa.table({
            "domain": g.column("domain"),
            "n": pc.cast(g.column("domain_count"), pa.int64()),
        })

    agg = coalesce_small(
        links.map_batches(partial, batch_format="pyarrow")
    ).groupby("domain").aggregate(Sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "domain": batch.column("domain"),
            "n_links": pc.cast(batch.column("sum(n)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")
