"""Pure-stdlib minimal PDF text + layout parser.

No PDF library ships in this container, but the PDF text layer is just
zlib (FlateDecode) content streams of text operators — parseable with
the stdlib, the same way ``imagecodec`` handles PNG. This gives
``ParsePdfText`` (the north-rule's "PDF/layout parse" leg) a REAL parse
path for the dominant simple case: classic xref PDFs whose page content
streams are uncompressed or FlateDecode and whose text is written with
the standard operators (Tj / TJ / ' / " strings, Td / TD / T* / Tm
positioning). Out of scope (raise NotImplementedError so callers fall
through to the documented fake): encrypted PDFs, object streams
(/ObjStm), non-Flate filters (DCT/LZW/ASCII85), CID/Type0 composite
fonts with multi-byte encodings.

Layout: each text run carries the (x, y) of its text-space origin; a
page's bbox is the envelope of its runs (nominal 12pt line height,
0.5 * 12pt * chars width — a deterministic stand-in for font metrics,
which simple PDFs do not embed per-glyph here).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_CONTENTS_RE = re.compile(
    rb"/Contents\s*(?:(\d+)\s+\d+\s+R|\[(.*?)\])", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)

# one content-stream token: string literal, hex string, array, number,
# or operator name
_TOK_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"      # (string) with escapes
    rb"|<[0-9A-Fa-f\s]*>"          # <hex string>
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"
    rb"|/[^\s/\[\]()<>]*"
    rb"|[A-Za-z'\"*]+")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(lit: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(lit)
    while i < n:
        c = lit[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = lit[i + 1:i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \d{1,3}
            j = i + 1
            while j < min(i + 4, n) and lit[j:j + 1].isdigit():
                j += 1
            out.append(int(lit[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt == b"\n":  # line continuation
            i += 2
        else:
            out += nxt
            i += 2
    return out.decode("latin-1")


def _extract_text_runs(content: bytes) -> list[tuple[float, float, str]]:
    """Content stream -> [(x, y, text)] runs in stream order."""
    runs: list[tuple[float, float, str]] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (Td moves are relative to it)
    leading = 12.0
    stack: list[bytes | float] = []

    def emit(s: str):
        if s:
            runs.append((x, y, s))

    for m in _TOK_RE.finditer(content):
        tok = m.group(0)
        c0 = tok[:1]
        if c0 == b"(":
            stack.append(tok)
        elif c0 == b"<" and tok != b"<":
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            stack.append(b"(" + bytes.fromhex(hx.decode()) + b")")
        elif tok in (b"[", b"]"):
            stack.append(tok)
        elif c0 in b"-+.0123456789":
            stack.append(float(tok))
        elif c0 == b"/":
            stack.append(tok)
        else:  # operator
            if tok == b"Tj" and stack and isinstance(stack[-1], bytes) \
                    and stack[-1][:1] == b"(":
                emit(_unescape(stack[-1][1:-1]))
            elif tok in (b"'", b'"') and stack:
                # quote ops move to next line, then show
                lit = stack[-1]
                ly -= leading
                x, y = lx, ly
                if isinstance(lit, bytes) and lit[:1] == b"(":
                    emit(_unescape(lit[1:-1]))
            elif tok == b"TJ":
                # collect back to the matching [
                parts: list[str] = []
                i = len(stack) - 1
                while i >= 0 and stack[i] != b"[":
                    it = stack[i]
                    if isinstance(it, bytes) and it[:1] == b"(":
                        parts.append(_unescape(it[1:-1]))
                    i -= 1
                emit("".join(reversed(parts)))
            elif tok in (b"Td", b"TD") and len(stack) >= 2:
                ty = stack[-1]
                tx = stack[-2]
                if isinstance(tx, float) and isinstance(ty, float):
                    lx += tx
                    ly += ty
                    if tok == b"TD":
                        leading = -ty if ty else leading
                    x, y = lx, ly
            elif tok == b"TL" and stack and isinstance(stack[-1], float):
                leading = stack[-1]
            elif tok == b"T*":
                ly -= leading
                x, y = lx, ly
            elif tok == b"Tm" and len(stack) >= 6:
                if isinstance(stack[-1], float) and \
                        isinstance(stack[-2], float):
                    lx, ly = stack[-2], stack[-1]
                    x, y = lx, ly
            elif tok == b"BT":
                x = y = lx = ly = 0.0
            stack.clear()
    return runs


_STREAM_KW_RE = re.compile(rb"\bstream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")


def _obj_streams(payload: bytes) -> dict[int, bytes]:
    """obj id -> decoded stream bytes (Flate inflated or raw).

    Stream data is sliced by the declared /Length when it is a direct
    integer — compressed bytes may legitimately contain ``\\r`` right
    before the ``\\nendstream`` delimiter (or even the delimiter bytes
    themselves), so boundary-regex slicing alone silently truncates;
    that is exactly why the spec requires /Length. The regex boundary
    is only the fallback for indirect-/Length objects.
    """
    out: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        body = m.group(2)
        km = _STREAM_KW_RE.search(body)
        if not km:
            continue
        head = body[:km.start()]
        lm = _LENGTH_RE.search(head)
        if lm:
            # slice from absolute payload offsets: even if compressed
            # bytes contained a false "endobj" that cut group(2) short,
            # the declared length still reads the full stream
            start = m.start(2) + km.end()
            data = payload[start:start + int(lm.group(1))]
        else:
            sm = _STREAM_RE.search(body)
            if not sm:
                continue
            data = sm.group(1)
        if b"/Filter" in head:
            if b"/FlateDecode" not in head:
                raise NotImplementedError(
                    "only FlateDecode streams are supported")
            data = zlib.decompress(data)
        out[int(m.group(1))] = data
    return out


def parse_pdf_pages(payload: bytes) -> list[dict]:
    """PDF bytes -> [{page, text, bbox}] in page-tree order.

    bbox is [min_x, min_y, max_x, max_y] over the page's text runs
    (nominal metrics — see module docstring); empty pages get zeros.
    """
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF")
    if b"/Encrypt" in payload:
        raise NotImplementedError("encrypted PDF")
    if b"/ObjStm" in payload:
        raise NotImplementedError("object-stream (compressed xref) PDF")
    streams = _obj_streams(payload)

    # page objects in /Kids order when present, else object-id order
    page_objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        body = m.group(2)
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            page_objs[int(m.group(1))] = body
    order: list[int] = []
    for km in _KIDS_RE.finditer(payload):
        for rm in _REF_RE.finditer(km.group(1)):
            oid = int(rm.group(1))
            if oid in page_objs and oid not in order:
                order.append(oid)
    for oid in sorted(page_objs):
        if oid not in order:
            order.append(oid)

    pages: list[dict] = []
    for idx, oid in enumerate(order):
        body = page_objs[oid]
        cm = _CONTENTS_RE.search(body)
        content = b""
        if cm:
            refs = [int(cm.group(1))] if cm.group(1) else \
                [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))]
            content = b"\n".join(streams.get(r, b"") for r in refs)
        runs = _extract_text_runs(content)
        if runs:
            xs0 = [r[0] for r in runs]
            ys0 = [r[1] for r in runs]
            xs1 = [r[0] + 0.5 * 12.0 * len(r[2]) for r in runs]
            ys1 = [r[1] + 12.0 for r in runs]
            bbox = [min(xs0), min(ys0), max(xs1), max(ys1)]
        else:
            bbox = [0.0, 0.0, 0.0, 0.0]
        pages.append({
            "page": idx,
            "text": "\n".join(r[2] for r in runs),
            "bbox": [float(v) for v in bbox],
        })
    return pages


def synth_pdf(seed: int, n_pages: int = 2, lines_per_page: int = 5) -> bytes:
    """Deterministic multi-page Flate-compressed text PDF — test/bench
    payload generator for the real parse path, stdlib zlib only."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_oid = add(b"PLACEHOLDER")  # patched below
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    kid_ids = []
    for p in range(n_pages):
        lines = []
        for li in range(lines_per_page):
            k = seed * 1_000_003 + p * 97 + li * 7
            word = f"w{k % 1000}"
            lines.append(f"page {p} line {li} {word} token{k % 53}")
        ops = [b"BT /F1 12 Tf 72 720 Td 14 TL"]
        ops.append(b"(%s) Tj" % lines[0].encode("latin-1"))
        for ln in lines[1:]:
            ops.append(b"T* (%s) Tj" % ln.encode("latin-1"))
        ops.append(b"ET")
        raw = b"\n".join(ops)
        comp = zlib.compress(raw, 6)
        cont = add(b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                   % len(comp) + comp + b"\nendstream")
        kid = add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                  b"/Resources << /Font << /F1 %d 0 R >> >> "
                  b"/Contents %d 0 R >>" % (font, cont))
        kid_ids.append(kid)
    kids = b" ".join(b"%d 0 R" % k for k in kid_ids)
    objs[pages_oid - 1] = (b"<< /Type /Pages /Count %d /Kids [%s] >>"
                           % (n_pages, kids))

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, 1):
        offsets[i] = len(buf)
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        buf += b"%010d 00000 n \n" % offsets[i]
    buf += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, cat, xref_at))
    return bytes(buf)
