"""PDF sink, UNLV zone source, threshold-image export tests.

Reference analogues: pdfrenderer.cpp (searchable text-only PDF),
blread.cpp:36-71 (read_unlv_file / FullPageBlock), baseapi.cpp:1224
(tessedit_write_images)."""

import re

import numpy as np
import pytest

from tesseract_spark.functions.fonts import CELL_H, mask_to_gray, render_line
from tesseract_spark.operators.sinks import (
    build_pdf_page,
    ocr_words,
    to_pdf,
    to_threshold_images,
)
from tesseract_spark.sources.zones import full_page_zone, parse_uzn, recognize_zones

WORDS = [
    dict(doc_id="d1", media_ref="m1", block_num=1, par_num=1, line_num=1,
         word_num=1, left=10, top=20, width=40, height=16, conf=95.0, text="hello"),
    dict(doc_id="d1", media_ref="m1", block_num=1, par_num=1, line_num=1,
         word_num=2, left=60, top=20, width=48, height=16, conf=90.0, text="world"),
    dict(doc_id="d1", media_ref="m1", block_num=2, par_num=1, line_num=1,
         word_num=1, left=10, top=60, width=30, height=16, conf=88.0, text="(x)"),
]


def test_pdf_structure_and_xref_offsets():
    blob = build_pdf_page(WORDS, 200, 100, 300)
    assert blob.startswith(b"%PDF-1.5\n") and blob.rstrip().endswith(b"%%EOF")
    # xref offsets must point at the exact "N 0 obj" byte positions
    xref_at = int(blob.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert blob[xref_at : xref_at + 4] == b"xref"
    table = blob[xref_at:].split(b"\n")[3:8]  # skip 'xref', '0 6', free entry
    for i, entry in enumerate(table, start=1):
        off = int(entry.split(b" ")[0])
        assert blob[off:].startswith(b"%d 0 obj" % i)


def test_pdf_text_layer_invisible_and_extractable():
    blob = build_pdf_page(WORDS, 200, 100, 300)
    body = blob.decode("latin-1")
    assert "BT\n3 Tr" in body  # invisible ink (pdfrenderer.cpp:374)
    # CID layer: UTF-16BE [ <hex> ] TJ show ops (pdfrenderer.cpp:482-484);
    # identity ToUnicode means the hex decodes straight back to the text.
    texts = [
        bytes.fromhex(h).decode("utf-16-be")
        for h in re.findall(r"\[ <([0-9A-F]+)> \] TJ", body)
    ]
    assert texts == ["hello ", "world", "(x)"]  # trailing inter-word space
    assert "/GlyphLessFont" in body and "/Identity-H" in body
    assert "/ToUnicode" in body and "beginbfrange" in body
    assert body.count("ET") >= 2  # one text object per block
    # word-box-matched stretch present
    assert " Tz" in body and " Tm" in body


def test_pdf_spark_sink(spark, corpus):
    docs = spark.read.parquet(corpus["documents"]).limit(2)
    media = spark.read.parquet(corpus["media"])
    words = ocr_words(spark, docs, media)
    out = to_pdf(words).collect()
    assert len(out) > 0
    for r in out:
        assert bytes(r.pdf).startswith(b"%PDF-1.5")


def test_parse_uzn_and_full_page():
    txt = "10 20 100 30 Text\n5 60 80 25 Table\nnonsense line\n1 2 3 4 x"
    zones = parse_uzn(txt)
    # malformed third line stops the scan (tfscanf semantics, blread.cpp:53)
    assert zones == [(10, 20, 110, 50), (5, 60, 85, 85)]
    assert full_page_zone(640, 480) == [(0, 0, 640, 480)]


def _two_line_page() -> np.ndarray:
    l1, l2 = render_line("abc"), render_line("def")
    w = max(l1.shape[1], l2.shape[1]) + 24
    page = np.zeros((2 * CELL_H + 48, w), dtype=bool)
    page[12 : 12 + CELL_H, 12 : 12 + l1.shape[1]] = l1
    page[24 + CELL_H : 24 + 2 * CELL_H, 12 : 12 + l2.shape[1]] = l2
    return mask_to_gray(page)


def test_zones_restrict_ocr_and_number_blocks():
    gray = _two_line_page()
    h, w = gray.shape
    top_zone = [(0, 0, w, CELL_H + 18)]
    spans, words = recognize_zones(gray, top_zone)
    assert [s.text for s in spans if s.kind == "text"] == ["abc"]
    assert all(wd.block_num == 1 for wd in words)

    both = [(0, 0, w, CELL_H + 18), (0, CELL_H + 18, w, h)]
    spans2, words2 = recognize_zones(gray, both)
    assert [s.text for s in spans2 if s.kind == "text"] == ["abc", "def"]
    assert sorted({wd.block_num for wd in words2}) == [1, 2]
    # word boxes come back in page coordinates: the 'def' word sits below
    d = [wd for wd in words2 if wd.text == "def"][0]
    assert d.top >= CELL_H + 18


def test_zone_order_defines_block_order():
    gray = _two_line_page()
    h, w = gray.shape
    reversed_zones = [(0, CELL_H + 18, w, h), (0, 0, w, CELL_H + 18)]
    spans, _ = recognize_zones(gray, reversed_zones)
    assert [s.text for s in spans if s.kind == "text"] == ["def", "abc"]


def test_threshold_images(spark, corpus):
    from tesseract_spark.functions.png_codec import decode_gray_png

    media = spark.read.parquet(corpus["media"]).limit(3)
    rows = to_threshold_images(media).collect()
    assert len(rows) == 3
    for r in rows:
        img = decode_gray_png(bytes(r.threshold_png))
        assert set(np.unique(img)) <= {0, 255}
        assert 0.0 < r.fg_frac < 1.0


def test_pdf_image_layer_roundtrip(spark, corpus):
    """The non-textonly PDF embeds the page raster as a FlateDecode
    DeviceGray XObject under the invisible text (pdfrenderer.cpp:503-700);
    the text layer still round-trips exactly and the image stream decodes
    back to the original raster."""
    import re
    import zlib

    import numpy as np
    from pyspark.sql import functions as F

    from tesseract_spark.functions.pdf_parse import extract_pdf_words
    from tesseract_spark.functions.png_codec import decode_gray_png
    from tesseract_spark.operators.sinks import ocr_words, to_pdf

    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    words = ocr_words(spark, docs, media).cache()
    some_ref = words.limit(1).collect()[0].media_ref
    w1 = words.filter(F.col("media_ref") == some_ref)
    plain = to_pdf(w1).collect()[0].pdf
    withimg = to_pdf(w1, images=media).collect()[0].pdf
    # text layers identical
    assert extract_pdf_words(bytes(withimg)) == extract_pdf_words(bytes(plain))
    assert len(extract_pdf_words(bytes(withimg))) > 0
    # image stream present and decodes to the original page raster
    m = re.search(
        rb"/Subtype /Image /Width (\d+) /Height (\d+) /ColorSpace /DeviceGray"
        rb" /BitsPerComponent 8 /Filter /FlateDecode /Length (\d+) >>\nstream\n",
        bytes(withimg),
    )
    assert m, "no image XObject in PDF"
    w, h, ln = int(m.group(1)), int(m.group(2)), int(m.group(3))
    data = bytes(withimg)[m.end() : m.end() + ln]
    arr = np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w)
    png = media.filter(F.col("media_ref") == some_ref).collect()[0].png
    np.testing.assert_array_equal(arr, decode_gray_png(bytes(png)))
    # the content stream paints the image before the text objects
    assert b"/im-0 Do" in bytes(withimg)
    assert b"/im-0" not in bytes(plain)
