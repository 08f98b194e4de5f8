"""PDF text extraction for the OCR (AI3) path.

The reference does real document parsing via ``SNOWFLAKE.CORTEX.
PARSE_DOCUMENT`` with layout mode and ships pypdfium2 for client-side PDF
rendering (`app/Auto-Magic Document AI.py:212-215`, PDF preview
`app.py:10-23,386-412`, `environment.yml:17`).  Here the equivalent is a
two-tier extractor:

1. **pypdfium2** (optional import) — full-fidelity text extraction when the
   library is installed.  Nothing in this package hard-depends on it.
2. **Pure-Python fallback** — a minimal parser for *uncompressed* PDF
   content streams (the kind :func:`make_minimal_pdf` writes): walks the
   ``BT .. ET`` text blocks and collects ``Tj`` / ``TJ`` show-text
   operators with PDF string-escape handling.  Real extraction, no
   dependencies — it is what runs in this container and in tests.

Both tiers are pure functions of the input bytes, keeping the OCR path
deterministic and replayable.
"""

from __future__ import annotations

import re

try:  # optional dependency — full-fidelity path
    import pypdfium2 as _pdfium
except Exception:  # pragma: no cover - library not installed here
    _pdfium = None

PDF_MAGIC = b"%PDF-"


def is_pdf(content: bytes | None) -> bool:
    """Content sniff: PDF files start with ``%PDF-`` (the spec allows the
    marker within the first 1024 bytes; in practice it leads)."""
    return bool(content) and content.lstrip()[:5] == PDF_MAGIC


def pdfium_available() -> bool:
    return _pdfium is not None


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> str:
    """PDF literal-string unescape: ``\\n`` etc., ``\\ooo`` octal, and a
    lone ``\\`` before other bytes drops the backslash."""
    out = bytearray()
    i = 0
    while i < len(raw):
        ch = raw[i : i + 1]
        if ch == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", raw[i + 1 : i + 4])
            if m:
                out.append(int(m.group(), 8) & 0xFF)
                i += 1 + len(m.group())
                continue
            i += 1  # drop the backslash
            continue
        out += ch
        i += 1
    return out.decode("latin-1")


# a literal PDF string with escaped-paren awareness: no unescaped ( or )
_PDF_STR = rb"\(((?:[^()\\]|\\.)*)\)"
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)
_STR_IN_ARRAY_RE = re.compile(_PDF_STR)
# in-order token scan of a text block: show-text operators and the
# line-advance operators (T* and the ' shorthand) interleave, so order
# matters for line structure
_TOK_RE = re.compile(
    _PDF_STR + rb"\s*(Tj|')"                 # (string) Tj | (string) '
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ"         # [ (s) kern (s) ... ] TJ
    rb"|(T\*)"                               # next line
)


def _extract_text_fallback(content: bytes) -> str | None:
    """Minimal text extraction from uncompressed PDF content streams."""
    lines: list[str] = []
    for block in _BT_ET_RE.findall(content):
        cur: list[str] = []

        def newline():
            lines.append("".join(cur))
            cur.clear()

        started = False
        for m in _TOK_RE.finditer(block):
            string_lit, op, tj_array, star = m.groups()
            if star is not None or op == b"'":
                if started:
                    newline()
                started = True
            if string_lit is not None:
                cur.append(_unescape_pdf_string(string_lit))
                started = True
            elif tj_array is not None:
                for s in _STR_IN_ARRAY_RE.finditer(tj_array):
                    cur.append(_unescape_pdf_string(s.group(1)))
                started = True
        if started:
            newline()
    if not lines:
        return None
    return "\n".join(lines)


def extract_pdf_text(content: bytes) -> str | None:
    """Text of a PDF blob, or None when nothing is extractable (scanned
    image-only PDFs, encrypted files, compressed streams without
    pypdfium2)."""
    if not is_pdf(content):
        return None
    if _pdfium is not None:  # pragma: no cover - not installed here
        try:
            doc = _pdfium.PdfDocument(content)
            try:
                pages = []
                for page in doc:
                    textpage = page.get_textpage()
                    pages.append(textpage.get_text_bounded())
                    textpage.close()
                    page.close()
                text = "\n".join(pages).strip()
                return text or None
            finally:
                doc.close()
        except Exception:
            return None
    return _extract_text_fallback(content)


def make_minimal_pdf(text: str) -> bytes:
    """Write a valid single-page, uncompressed PDF showing ``text`` in
    Helvetica, one line per input line — the fixture generator for the OCR
    tests (round-trips through BOTH extraction tiers) and a minimal
    PDF export capability."""
    lines = text.split("\n") or [""]

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "1 0 0 1 72 720 Tm", "14 TL"]
    for i, line in enumerate(lines):
        if i:
            ops.append("T*")
        ops.append(f"({esc(line)}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1", errors="replace")

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
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
