"""Minimal glyphless TrueType font, synthesized from first principles.

The reference PDF renderer embeds a tiny single-glyph TrueType font so
its CID text layer renders as invisible-but-selectable text in any
viewer (src/api/pdfrenderer.cpp:23 pdf_ttf.h, :159-168: "a TrueType
CIDFont which contained 1 glyph, and a CMap which mapped all character
codes to that glyph").  This module rebuilds that idea from the public
OpenType and PDF specs instead of shipping the reference's binary:
a deterministic sfnt with the six tables ISO 32000-1 §9.9 requires for
an embedded CIDFontType2 program (glyf, head, hhea, hmtx, loca, maxp),
two empty glyphs (GID 0 = .notdef, GID 1 = the glyph every CID maps
to via the CIDToGIDMap stream), advance width = half an em to match
the PDF /DW 500.

Byte layout follows the OpenType spec (offset table, table directory
sorted by tag, per-table checksums, head.checkSumAdjustment =
0xB1B0AFBA - sum(file)).  Everything is constant, so the font bytes
are build-once module state.
"""

from __future__ import annotations

import struct

UNITS_PER_EM = 1024
ADVANCE = UNITS_PER_EM // 2  # half an em, the /DW 500 analogue
NUM_GLYPHS = 2  # .notdef + the one glyph all CIDs share


def _checksum(data: bytes) -> int:
    data += b"\0" * (-len(data) % 4)
    return sum(struct.unpack(f">{len(data) // 4}I", data)) & 0xFFFFFFFF


def _head(index_to_loc_format: int = 0) -> bytes:
    return struct.pack(
        ">IIIIHHqqhhhhHHhhh",
        0x00010000,  # version 1.0
        0x00010000,  # fontRevision
        0,           # checkSumAdjustment (patched at assembly)
        0x5F0F3CF5,  # magicNumber
        0x0003,      # flags: baseline y=0, lsb x=0
        UNITS_PER_EM,
        0,           # created (epoch: deterministic)
        0,           # modified
        0, 0, 0, 0,  # xMin yMin xMax yMax (no outlines)
        0,           # macStyle
        1,           # lowestRecPPEM
        2,           # fontDirectionHint
        index_to_loc_format,
        0,           # glyphDataFormat
    )


def _hhea() -> bytes:
    return struct.pack(
        ">IhhhHhhhhhhhhhhhH",
        0x00010000,
        UNITS_PER_EM,  # ascender
        -1,            # descender (spec: negative)
        0,             # lineGap
        ADVANCE,       # advanceWidthMax
        0, 0,          # minLeft/RightSideBearing
        0,             # xMaxExtent
        1, 0,          # caretSlopeRise/Run
        0,             # caretOffset
        0, 0, 0, 0,    # reserved
        0,             # metricDataFormat
        1,             # numberOfHMetrics (ADVANCE applies to all)
    )


def _maxp() -> bytes:
    return struct.pack(
        ">IH13H",
        0x00010000,
        NUM_GLYPHS,
        0, 0, 0, 0,  # maxPoints/Contours/CompositePoints/CompositeContours
        1,           # maxZones
        0, 0, 0, 0,  # maxTwilightPoints/Storage/FunctionDefs/InstructionDefs
        0, 0, 0, 0,  # maxStackElements/SizeOfInstructions/CompElems/Depth
    )


def _hmtx() -> bytes:
    # numberOfHMetrics=1: one (advance, lsb) pair + trailing lsb per
    # remaining glyph
    return struct.pack(">HhH", ADVANCE, 0, 0)[:6]


def _build() -> bytes:
    tables = {
        b"glyf": b"",  # both glyphs empty: loca[i] == loca[i+1]
        b"head": _head(),
        b"hhea": _hhea(),
        b"hmtx": _hmtx(),
        b"loca": struct.pack(">3H", 0, 0, 0),  # short format
        b"maxp": _maxp(),
    }
    tags = sorted(tables)
    n = len(tags)
    entry_selector = n.bit_length() - 1
    search_range = (1 << entry_selector) * 16
    header = struct.pack(
        ">IHHHH", 0x00010000, n, search_range, entry_selector,
        n * 16 - search_range,
    )
    offset = len(header) + 16 * n
    directory, body, offsets = b"", b"", {}
    for tag in tags:
        data = tables[tag]
        offsets[tag] = offset
        directory += struct.pack(
            ">4sIII", tag, _checksum(data), offset, len(data)
        )
        pad = data + b"\0" * (-len(data) % 4)
        body += pad
        offset += len(pad)
    font = header + directory + body
    adj = (0xB1B0AFBA - _checksum(font)) & 0xFFFFFFFF
    head_at = offsets[b"head"]
    return (
        font[: head_at + 8] + struct.pack(">I", adj) + font[head_at + 12 :]
    )


GLYPHLESS_FONT: bytes = _build()


def codepoint_to_utf16be_hex(code: int) -> str | None:
    """CodepointToUtf16be (pdfrenderer.cpp:315-329): 4 hex digits for
    the BMP, a surrogate pair for supplementary planes, None for
    unencodable codepoints (lone surrogates, > U+10FFFF)."""
    if (0xD7FF < code < 0xE000) or code > 0x10FFFF:
        return None
    if code < 0x10000:
        return f"{code:04X}"
    a = code - 0x10000
    return f"{(0x3FF & (a >> 10)) + 0xD800:04X}{(0x3FF & a) + 0xDC00:04X}"
