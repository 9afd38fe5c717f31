"""Deterministic synthetic transcript table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Rules:
- ~60% of turns carry an HTML payload (cycled deterministically by
  crc32(conv_id, turn_idx)) wrapped in boilerplate scaffolding
  (<html><head>…</head><body><nav>…<main>PAYLOAD</main><footer>…), the
  rest are plain text that must pass through extraction unchanged.
- Skew fixtures: conversations at ordinal % 97 == 0 get ~20x the median
  turn count; about 1 in 4096 HTML turns is inflated to ~1 MB (mirrors
  the reference's 7.17 MB document-lg benchmark tier,
  /root/reference/test/benchmark.rb:15) to exercise bytes-aware batching.
- ts = epoch + conv_ordinal * 1h + turn_idx * 1min, monotone per conv.

Everything is keyed off crc32 so generation is identical across
processes and machines (python's builtin hash() is salted — never use it
for data generation). Generation is distributed: `transcript_dataset`
fans conv ordinals out through ray.data so 10^12-turn synthesis would
scale across a cluster instead of bottlenecking on the driver.
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa

EPOCH_US = 1_700_000_000_000_000  # fixed; deterministic (no wall clock)

ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("", "search", "browser", "calculator", "editor", "")

# Payload corpus: formatting, links, lists, tables, entities, malformed,
# unclosed, and script/style junk — shapes drawn from the reference test
# corpus (/root/reference/test/test_helper.rb:38-70) without copying it.
PAYLOADS = (
    '<p>Reply {i}: the <b>quick</b> brown fox <i>jumps</i> over the lazy dog.</p>',
    '<p>See <a href="https://example.com/doc{i}" title="doc">the spec</a> and '
    '<a href="/local/page{i}">local notes</a> for details.</p>',
    '<ul><li>alpha {i}</li><li>beta</li><li><strong>gamma</strong></li></ul>',
    '<table><tr><th>k</th><th>v</th></tr><tr><td>row {i}</td><td>42</td></tr></table>',
    '<p>Entities: at&amp;t says 1 &gt; 2 is false &amp; 2 &lt; 1 too ({i}).</p>',
    '<p>Malformed {i} <b>bold<i>nested</b> italic?</i> trailing',
    '<blockquote>Unclosed quote {i} <span>with span',
    '<div><p>Step {i}</p><script>alert("x")</script><style>.a{{color:red}}</style>'
    '<p>after junk</p></div>',
    '<h2>Section {i}</h2><p>Body text with <em>emphasis</em> and '
    '<code>inline_code()</code> markers.</p>',
    '<p>Plain para {i} followed by</p><pre>preformatted {i}\nblock</pre><p>tail</p>',
)

_NAV = ('<nav><ul><li><a href="/home">Home</a></li><li><a href="/docs">Docs</a>'
        '</li><li><a href="/about">About</a></li></ul></nav>')
_HEADER = '<header><h1>Synthetic Transcript Viewer</h1></header>'
_ASIDE = '<aside class="ads"><p>BUY NOW — limited offer!!!</p></aside>'
_FOOTER = '<footer><p>&copy; 2026 synth corp · <a href="/tos">terms</a></p></footer>'
_SCRIPT = '<script>window.dataLayer=[];trackPageView("turn");</script>'
_STYLE = '<style>body{margin:0;font:14px sans-serif}.ads{display:none}</style>'


def _h(conv_ordinal: int, turn_idx: int, salt: int = 0) -> int:
    return zlib.crc32(f"{conv_ordinal}:{turn_idx}:{salt}".encode())


def wrap_boilerplate(payload: str, conv_ordinal: int, turn_idx: int) -> str:
    return (
        f'<html><head><title>conv-{conv_ordinal:06d} turn {turn_idx}</title>'
        f'<meta name="source" content="synth"/><meta charset="utf-8"/>{_STYLE}'
        f'</head><body>{_NAV}{_HEADER}<main><article>{payload}</article></main>'
        f'{_ASIDE}{_FOOTER}{_SCRIPT}</body></html>'
    )


def n_turns_for(conv_ordinal: int) -> int:
    base = 2 + _h(conv_ordinal, -1) % 39          # 2..40 (FIXTURES §1)
    if conv_ordinal % 97 == 0:                    # skew: ~20x median
        base = base * 20
    return base


def rows_for_conv(conv_ordinal: int, big_every: int = 4096) -> dict:
    """Columnar dict of all turns for one conversation ordinal."""
    conv_id = f"conv-{conv_ordinal:06d}"
    n = n_turns_for(conv_ordinal)
    cols = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
            "tool": [], "ts": []}
    for t in range(n):
        h = _h(conv_ordinal, t)
        role = ROLES[h % len(ROLES)]
        tool = TOOLS[h % len(TOOLS)] if role == "tool" else ""
        if h % 10 < 6:  # ~60% HTML payloads
            payload = PAYLOADS[h % len(PAYLOADS)].format(i=t)
            if big_every and _h(conv_ordinal, t, 7) % big_every == 0:
                payload = payload * max(1, 1_000_000 // max(1, len(payload)))
            text = wrap_boilerplate(payload, conv_ordinal, t)
        else:
            text = (f"plain turn {t} of {conv_id}: lorem ipsum token stream "
                    f"value {h % 1000} without any markup")
        cols["conv_id"].append(conv_id)
        cols["turn_idx"].append(t)
        cols["role"].append(role)
        cols["text"].append(text)
        cols["tool"].append(tool)
        cols["ts"].append(EPOCH_US + conv_ordinal * 3_600_000_000
                          + t * 60_000_000)
    return cols


SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.large_string()),  # MB-scale payloads: avoid 2GB offsets limit
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _to_table(cols: dict) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.large_string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=SCHEMA,
    )


def synthesize_transcripts(n_convs: int, big_every: int = 4096) -> pa.Table:
    """Single-process synthesis (tests / small scales)."""
    merged = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for c in range(n_convs):
        cols = rows_for_conv(c, big_every)
        for k in merged:
            merged[k].extend(cols[k])
    return _to_table(merged)


def transcript_dataset(n_convs: int, big_every: int = 4096,
                       parallelism: int = -1):
    """Distributed synthesis: conv ordinals fan out through ray.data.

    This is how a 10^12-turn table would be produced on a cluster — each
    task generates a contiguous ordinal range, so no driver bottleneck
    and no shuffle.
    """
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        merged = {k: [] for k in
                  ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
        for c in batch.column("id").to_pylist():
            cols = rows_for_conv(int(c), big_every)
            for k in merged:
                merged[k].extend(cols[k])
        return _to_table(merged)

    ds = ray.data.range(n_convs, override_num_blocks=(
        parallelism if parallelism > 0 else max(8, n_convs // 64)))
    return ds.map_batches(gen, batch_format="pyarrow")


def transcripts_parquet(n_convs: int, cache_dir: str = "/tmp/selma_ray_transcripts",
                        big_every: int = 4096, files: int | None = None) -> str:
    """Materialize (once) a deterministic transcript parquet dir; returns path.

    Used by bench.py / entry() so repeated runs read the same files. The
    dataset is written as multiple files so downstream sharding/resume has
    real file-level partitions to work with. ``files`` controls the file
    count: parquet planning fetches metadata per file (~5ms each), so a
    corpus should be hundreds of chunky files, not thousands of tiny ones
    — at real scale, 100 MB-class files.
    """
    if files is None:
        # ~16k rows (~25 rows/conv) per file
        files = min(512, max(8, (n_convs * 25) // 16_000))
    path = os.path.join(cache_dir, f"convs_{n_convs}_big{big_every}_f{files}")
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    ds = transcript_dataset(n_convs, big_every, parallelism=files)
    ds.write_parquet(path)
    with open(marker, "w") as f:
        f.write("ok")
    return path
