"""Minimal PDF text round-trip: a deterministic single-file PDF writer
and a pure-stdlib text extractor (S23 — reference
study_scraper/fulltext.py:84-95 `extract_text_from_pdf`, which uses
pypdf's per-page `extract_text`).

No PDF library exists in this container (pypdf / pdfminer / PyMuPDF /
PyPDF2 all absent — verified by import), so both halves are built from
the public PDF 1.4 spec with nothing but `zlib` and `re`:

  - `make_pdf(text)` emits a real multi-page PDF: catalog / page tree /
    Helvetica font / one FlateDecode content stream per page, each line
    drawn with `BT .. Td (..) Tj .. ET`. Latin-1 text goes into plain
    literal strings; anything wider is written as a UTF-16BE literal
    with BOM (the PDF text-string convention).
  - `extract_pdf_text(data)` walks every `stream..endstream` object,
    inflates FlateDecode bodies, and tokenizes the content stream:
    string literals feeding Tj / ' / " / TJ show operators inside
    BT..ET blocks become text, `Td/TD/T*/'/"` vertical moves become
    newlines, octal and two-char escapes are decoded, and UTF-16BE
    literals are detected by BOM.

This is intentionally the fixture-grade subset (FlateDecode + literal
strings + the Tj family): enough to round-trip every PDF this repo
generates and the common "text report" PDFs the reference ingests. It
does not attempt CID/Type0 composite fonts, encrypted files, or
/ASCII85Decode — a production deployment swaps `extract_pdf_text` for
pypdf behind the same column contract.

Everything here is driver/executor-agnostic pure functions; the Spark
wiring (Arrow-batched mapInPandas over a binary column) lives in
plans/fulltext.py.
"""

from __future__ import annotations

import re
import zlib

# --- writer ---------------------------------------------------------------

WORDS_PER_LINE = 10
LINES_PER_PAGE = 20
WORDS_PER_PAGE = WORDS_PER_LINE * LINES_PER_PAGE

_ESCAPES = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\"}


def _literal(line: str) -> bytes:
    """A PDF literal string for one line of text."""
    try:
        raw = line.encode("latin-1")
    except UnicodeEncodeError:
        # PDF text-string convention: UTF-16BE with BOM
        raw = b"\xfe\xff" + line.encode("utf-16-be")
    out = bytearray()
    for b in raw:
        out += _ESCAPES.get(b, bytes([b]))
    return b"(" + bytes(out) + b")"


def _paginate(text: str) -> list[list[str]]:
    """Deterministic layout: WORDS_PER_LINE words per line,
    LINES_PER_PAGE lines per page; splits only at whitespace so the
    round-trip re-join never glues word halves together."""
    words = text.split()
    if not words:
        return [[""]]
    lines = [
        " ".join(words[i : i + WORDS_PER_LINE])
        for i in range(0, len(words), WORDS_PER_LINE)
    ]
    return [
        lines[i : i + LINES_PER_PAGE] for i in range(0, len(lines), LINES_PER_PAGE)
    ]


def _page_stream(lines: list[str]) -> bytes:
    ops = [b"BT /F1 11 Tf 72 760 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(_literal(line) + b" Tj")
    ops.append(b"ET")
    return zlib.compress(b" ".join(ops), 9)


def make_pdf(text: str) -> bytes:
    """Serialize `text` as a deterministic multi-page PDF 1.4 file."""
    pages = _paginate(text)
    n = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # (4+2i) page dict, (5+2i) content stream
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        (
            "<< /Type /Pages /Kids ["
            + " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
            + f"] /Count {n} >>"
        ).encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    for i, page_lines in enumerate(pages):
        body = _page_stream(page_lines)
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        objs.append(
            f"<< /Length {len(body)} /Filter /FlateDecode >>\nstream\n".encode()
            + body
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# --- extractor ------------------------------------------------------------

_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.DOTALL
)
# one token of a content stream we care about: a literal string, or an
# operator name
_TOKEN_RE = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)|(?P<op>[A-Za-z'\"*]+)"
)
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")
_TWOCHAR = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i : i + 1]
        if b == b"\\" and i + 1 < len(raw):
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
                continue
            out += _TWOCHAR.get(raw[i + 1 : i + 2], raw[i + 1 : i + 2])
            i += 2
            continue
        out += b
        i += 1
    return bytes(out)


def _decode_text_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


def _extract_stream_text(content: bytes) -> list[str]:
    """Text lines shown by one content stream, in paint order."""
    lines: list[str] = []
    in_text = False
    pending: list[str] = []  # strings shown on the current line
    for m in _TOKEN_RE.finditer(content):
        if m.group("str") is not None:
            if in_text:
                pending.append(_decode_text_string(_unescape(m.group("str"))))
            continue
        op = m.group("op")
        if op == b"BT":
            in_text = True
        elif op == b"ET":
            in_text = False
            if pending:
                lines.append("".join(pending))
                pending = []
        elif op in (b"Td", b"TD", b"T*", b"'", b'"') and in_text:
            # a line move: flush the current line
            if pending:
                lines.append("".join(pending))
                pending = []
        elif op == b"TJ" and in_text:
            pass  # strings already collected
    if pending:
        lines.append("".join(pending))
    return lines


def extract_pdf_text(data: bytes) -> str:
    """Best-effort text of a PDF: every FlateDecode (or raw) content
    stream's Tj/TJ strings, newline-joined in stream order — the same
    contract as pypdf's page.extract_text() concatenation in the
    reference (study_scraper/fulltext.py:84-95)."""
    if not data or not data.startswith(b"%PDF"):
        return ""
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        body = m.group("body")
        if b"FlateDecode" in m.group("dict"):
            # decompressobj stops at end-of-stream, tolerating the EOL
            # before `endstream` — a plain rstrip would eat legitimate
            # 0x0a/0x0d bytes off the deflate tail
            try:
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        lines.extend(_extract_stream_text(body))
    return "\n".join(lines)


def count_pdf_pages(data: bytes) -> int:
    """Page count via /Type /Page dicts (not /Pages tree nodes)."""
    if not data or not data.startswith(b"%PDF"):
        return 0
    return len(re.findall(rb"/Type\s*/Page[^s]", data))
