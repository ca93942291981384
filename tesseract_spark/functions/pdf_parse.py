"""PDF layout parse: recover positioned text from text-layer PDFs.

Inverse of the PDF sink (operators/sinks.build_pdf_page): scans the
uncompressed content stream for ``Tm`` cursor placements and show
operators — both the CID layer's UTF-16BE ``[ <hex> ] TJ`` (the
reference's Identity-H + identity-ToUnicode encoding,
pdfrenderer.cpp:482-484: code unit == Unicode code unit, so hex
decodes directly as UTF-16BE) and the legacy ``(str) Tj`` literal form
— rebuilds (x, y, text) word tuples, then reassembles reading order
top-to-bottom / left-to-right — the extraction-tier "PDF/layout
parse" stage.  Handles exactly the deterministic subset this engine
writes (PDF 1.5, uncompressed text streams); anything else raises
ValueError rather than guessing.
"""

from __future__ import annotations

import re

_STREAM = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_OPS = re.compile(
    rb"1 0 0 1 (?P<x>[-\d.]+) (?P<y>[-\d.]+) Tm"
    rb"|\((?P<txt>(?:\\.|[^()\\])*)\) Tj"
    rb"|\[ <(?P<hex>[0-9A-Fa-f]*)> \] TJ"
)
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8))
                i = j
                continue
            out += _ESC.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def extract_pdf_words(blob: bytes) -> list[tuple[float, float, str]]:
    """All (x, y, text) show operations across the PDF's content streams."""
    if not blob.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    words: list[tuple[float, float, str]] = []
    x = y = 0.0
    for stream in _STREAM.findall(blob):
        for m in _OPS.finditer(stream):
            if m.group("x") is not None:
                x, y = float(m.group("x")), float(m.group("y"))
            elif m.group("hex") is not None:
                # CID layer: code unit == Unicode code unit (identity
                # ToUnicode), so the hex IS UTF-16BE.  The sink appends
                # one U+0020 unit between words (pdfrenderer.cpp:482-484)
                # — strip it so the tuple carries the bare word.
                txt = bytes.fromhex(m.group("hex").decode("ascii")).decode(
                    "utf-16-be"
                )
                words.append((x, y, txt[:-1] if txt.endswith(" ") else txt))
            else:
                words.append((x, y, _unescape(m.group("txt"))))
    return words


def extract_pdf_text(blob: bytes, line_tol: float = 2.0) -> str:
    """Reading-ordered text: lines top-down (descending y), words by x."""
    words = extract_pdf_words(blob)
    if not words:
        return ""
    lines: list[tuple[float, list[tuple[float, str]]]] = []
    for x, y, t in sorted(words, key=lambda w: (-w[1], w[0])):
        if lines and abs(lines[-1][0] - y) <= line_tol:
            lines[-1][1].append((x, t))
        else:
            lines.append((y, [(x, t)]))
    return "\n".join(
        " ".join(t for _x, t in sorted(ws)) for _y, ws in lines
    )
