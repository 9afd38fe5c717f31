"""Pure-stdlib PDF text/layout parser + real ParsePdfText path."""

import zlib

import pyarrow as pa
import pytest

from selma_ray.stages.pdfcodec import parse_pdf_pages, synth_pdf


def test_synth_pdf_roundtrip_pages_and_order():
    payload = synth_pdf(7, n_pages=3, lines_per_page=4)
    assert payload[:5] == b"%PDF-"
    pages = parse_pdf_pages(payload)
    assert [p["page"] for p in pages] == [0, 1, 2]
    for i, p in enumerate(pages):
        lines = p["text"].split("\n")
        assert len(lines) == 4
        assert lines[0].startswith(f"page {i} line 0 ")
        assert lines[3].startswith(f"page {i} line 3 ")
    # deterministic
    assert parse_pdf_pages(synth_pdf(7, n_pages=3, lines_per_page=4)) \
        == pages
    assert parse_pdf_pages(synth_pdf(8, n_pages=3))[0]["text"] \
        != pages[0]["text"]


def test_pdf_stream_sliced_by_length_not_delimiter():
    # seed 33's Flate stream ends with a 0x0D byte; boundary-regex
    # slicing eats it as part of "\r?\nendstream" and truncates the
    # stream — /Length must win (the reason the spec requires it)
    payload = synth_pdf(33, n_pages=1, lines_per_page=1)
    pages = parse_pdf_pages(payload)
    assert pages[0]["text"].startswith("page 0 line 0 ")


def test_pdf_layout_bbox_tracks_lines():
    pages = parse_pdf_pages(synth_pdf(1, n_pages=1, lines_per_page=5))
    x0, y0, x1, y1 = pages[0]["bbox"]
    assert x0 == 72.0            # Td origin
    assert y1 == 720.0 + 12.0    # first line top
    assert y0 == 720.0 - 4 * 14  # 4 T* moves at TL=14
    assert x1 > x0


def _mini_pdf(content_ops: bytes, *, compress: bool = False) -> bytes:
    """Single-page un-xref'd PDF (parser does not need xref)."""
    if compress:
        data = zlib.compress(content_ops)
        stream = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                  % len(data) + data + b"\nendstream")
    else:
        stream = (b"<< /Length %d >>\nstream\n" % len(content_ops)
                  + content_ops + b"\nendstream")
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            b"endobj\n"
            b"4 0 obj\n" + stream + b"\nendobj\n"
            b"%%EOF\n")


def test_pdf_text_operators():
    # TJ array with kerning numbers, escapes, hex string, quote op
    ops = (b"BT /F1 10 Tf 50 700 Td "
           b"[(Hel) -20 (lo)] TJ "
           b"( wo\\162ld \\(x\\)) Tj "
           b"14 TL (next) ' "
           b"<41> Tj "
           b"ET")
    pages = parse_pdf_pages(_mini_pdf(ops))
    assert pages[0]["text"] == "Hello\n world (x)\nnext\nA"


def test_pdf_uncompressed_stream_and_tm():
    ops = b"BT 1 0 0 1 100 500 Tm (at-tm) Tj ET"
    pages = parse_pdf_pages(_mini_pdf(ops))
    assert pages[0]["text"] == "at-tm"
    assert pages[0]["bbox"][0] == 100.0
    assert pages[0]["bbox"][1] == 500.0


def test_pdf_flate_stream():
    pages = parse_pdf_pages(
        _mini_pdf(b"BT 72 720 Td (flate!) Tj ET", compress=True))
    assert pages[0]["text"] == "flate!"


def test_pdf_unsupported_variants_raise():
    enc = _mini_pdf(b"BT (x) Tj ET").replace(
        b"/Type /Catalog", b"/Type /Catalog /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError):
        parse_pdf_pages(enc)
    with pytest.raises(ValueError):
        parse_pdf_pages(b"not a pdf")


def test_parse_pdf_text_stage_real_and_fallback():
    from selma_ray.stages.multimodal import ParsePdfText

    st = ParsePdfText(fake=False)
    out = st.parse_impl(synth_pdf(3, n_pages=2))
    assert len(out) == 2 and out[1]["text"].startswith("page 1 line 0")
    with pytest.raises(NotImplementedError):
        st.parse_impl(b"plain bytes")
    # fake=True falls through for non-PDF payloads
    fake_pages = ParsePdfText(fake=True, page_bytes=4).parse_impl(b"12345678")
    assert len(fake_pages) == 2


def test_parse_pdf_text_ray_stage(ray_session):
    import ray.data

    from selma_ray.stages.multimodal import ParsePdfText, multimodal_stage

    t = pa.table({
        "id": pa.array([0, 1, 2]),
        "data": pa.array([synth_pdf(i, n_pages=1 + i) for i in range(3)],
                         pa.binary()),
    })
    out = multimodal_stage(ray.data.from_arrow(t), ParsePdfText,
                           batch_size=2, fake=False, concurrency=1) \
        .to_pandas().sort_values("id")
    assert [len(p) for p in out["pages"]] == [1, 2, 3]
    rec = out["pages"].iloc[2][1]
    assert rec["page"] == 1 and rec["text"].startswith("page 1 line 0")
    assert len(rec["bbox"]) == 4


def test_parse_stage_fake_survives_corrupt_flate():
    """A %PDF- payload with a garbled FlateDecode stream must fall back
    to the stand-in under fake=True and raise under fake=False."""
    import pytest

    from selma_ray.stages.multimodal import ParsePdfText
    from selma_ray.stages.pdfcodec import synth_pdf

    good = synth_pdf(3, n_pages=1)
    i = good.index(b"stream")
    bad = good[:i + 7] + b"\x00garbage\x00" + good[i + 30:]

    fake = ParsePdfText(fake=True)
    pages = fake.parse_impl(bad)
    assert pages and pages[0]["page"] == 0  # stand-in pages

    real = ParsePdfText(fake=False)
    with pytest.raises(Exception):
        real.parse_impl(bad)
