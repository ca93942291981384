"""Output sinks: text / TSV / hOCR / ALTO renderers (SURVEY §2.1).

Shape-parity with the reference renderers:
- text  — GetUTF8Text (baseapi.cpp:1307-1337): paragraph texts joined with
  blank lines, media spans elided.
- TSV   — GetTSVText (baseapi.cpp:1353-1496): 12 columns, hierarchy levels
  1 page / 2 block / 3 para / 4 line / 5 word; upper levels are roll-up
  rows over the word level (the reference walks the iterator; we GROUP BY).
- hOCR  — hocrrenderer.cpp:119: ocr_page/ocr_carea/ocr_par/ocr_line/
  ocrx_word nesting with bbox + x_wconf.
- ALTO  — altorenderer.cpp:71-150: TextBlock/TextLine/String.

All renderers consume the word-level DataFrame produced by ocr_words()
(one mapInPandas over media rows) — the sink itself is pure DataFrame/SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WORDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("block_num", T.IntegerType()),
        T.StructField("par_num", T.IntegerType()),
        T.StructField("line_num", T.IntegerType()),
        T.StructField("word_num", T.IntegerType()),
        T.StructField("left", T.IntegerType()),
        T.StructField("top", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("conf", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)


def _words_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.png_codec import decode_gray_png
    from .recognize import recognize_page_detail

    for pdf in batches:
        rows = []
        for doc_id, ref, png, dpi in zip(
            pdf["doc_id"], pdf["media_ref"], pdf["png"], pdf["dpi"]
        ):
            if png is None:
                continue
            _spans, words, _layout = recognize_page_detail(
                decode_gray_png(bytes(png)), int(dpi)
            )
            for w in words:
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_ref": ref,
                        "block_num": w.block_num,
                        "par_num": w.par_num,
                        "line_num": w.line_num,
                        "word_num": w.word_num,
                        "left": w.left,
                        "top": w.top,
                        "width": w.width,
                        "height": w.height,
                        "conf": w.conf,
                        "text": w.text,
                    }
                )
        yield pd.DataFrame(rows, columns=[f.name for f in WORDS_SCHEMA.fields])


def ocr_words(spark: SparkSession, docs: DataFrame, media: DataFrame) -> DataFrame:
    """Word-level OCR results (TSV level 5) for every media span."""
    media_rows = (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.media_ref").alias("media_ref"))
        .join(media.select("media_ref", "png", "dpi"), "media_ref", "left")
    )
    return media_rows.mapInPandas(_words_udf, schema=WORDS_SCHEMA)


def to_text(flat_spans: DataFrame) -> DataFrame:
    """GetUTF8Text: per-doc text, paragraphs joined by blank lines."""
    texts = flat_spans.filter(F.col("kind") == "text")
    return texts.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("offset", "text"))),
                lambda s: s["text"],
            ),
            "\n\n",
        ).alias("text")
    )


def to_tsv(words: DataFrame) -> DataFrame:
    """GetTSVText: word rows (level 5) unioned with roll-up rows for line
    (4), para (3), block (2) and page (1), formatted as the 12-column TSV
    line the reference emits."""
    w5 = words.select(
        F.lit(5).alias("level"), "doc_id", "media_ref",
        "block_num", "par_num", "line_num", "word_num",
        "left", "top", "width", "height", "conf", "text",
    )

    def rollup(level: int, keys: list[str]) -> DataFrame:
        grp = words.groupBy("doc_id", "media_ref", *keys).agg(
            F.min("left").alias("left"),
            F.min("top").alias("top"),
            (F.max(F.col("left") + F.col("width")) - F.min("left")).alias("width"),
            (F.max(F.col("top") + F.col("height")) - F.min("top")).alias("height"),
        )
        fill = {"block_num": 0, "par_num": 0, "line_num": 0, "word_num": 0}
        sel = [F.lit(level).alias("level"), "doc_id", "media_ref"]
        for k in ("block_num", "par_num", "line_num", "word_num"):
            sel.append((F.col(k) if k in keys else F.lit(fill[k])).alias(k))
        sel += ["left", "top", "width", "height",
                F.lit(-1.0).alias("conf"), F.lit("").alias("text")]
        return grp.select(*sel)

    out = (
        rollup(1, [])
        .unionByName(rollup(2, ["block_num"]))
        .unionByName(rollup(3, ["block_num", "par_num"]))
        .unionByName(rollup(4, ["block_num", "par_num", "line_num"]))
        .unionByName(w5)
    )
    return out.withColumn(
        "tsv",
        F.concat_ws(
            "\t",
            F.col("level"), F.lit(1),
            "block_num", "par_num", "line_num", "word_num",
            "left", "top", "width", "height", "conf", "text",
        ),
    ).orderBy("doc_id", "media_ref", "block_num", "par_num", "line_num",
              "word_num", "level")


def to_hocr(words: DataFrame) -> DataFrame:
    """GetHOCRText: one XHTML fragment per media page."""
    line_sql = """
      concat(
        '   <span class="ocr_line" title="bbox ', min(left), ' ', min(top), ' ',
        max(left + width), ' ', max(top + height), '">',
        array_join(transform(array_sort(collect_list(struct(word_num, left, top,
                                                            width, height, conf, text))),
          w -> concat('<span class="ocrx_word" title="bbox ', w.left, ' ', w.top,
                      ' ', w.left + w.width, ' ', w.top + w.height,
                      '; x_wconf ', cast(round(w.conf, 0) as int), '">',
                      w.text, '</span>')), ' '),
        '</span>')
    """
    lines = words.groupBy(
        "doc_id", "media_ref", "block_num", "par_num", "line_num"
    ).agg(F.expr(line_sql).alias("html"))
    paras = lines.groupBy("doc_id", "media_ref", "block_num", "par_num").agg(
        F.concat(
            F.lit('  <p class="ocr_par">\n'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_num", "html"))),
                    lambda s: s["html"],
                ),
                "\n",
            ),
            F.lit("\n  </p>"),
        ).alias("html")
    )
    blocks = paras.groupBy("doc_id", "media_ref", "block_num").agg(
        F.concat(
            F.lit(' <div class="ocr_carea">\n'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("par_num", "html"))),
                    lambda s: s["html"],
                ),
                "\n",
            ),
            F.lit("\n </div>"),
        ).alias("html")
    )
    return blocks.groupBy("doc_id", "media_ref").agg(
        F.concat(
            F.lit('<div class="ocr_page">\n'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_num", "html"))),
                    lambda s: s["html"],
                ),
                "\n",
            ),
            F.lit("\n</div>"),
        ).alias("hocr")
    )


def to_page_xml(words: DataFrame) -> DataFrame:
    """PRImA PAGE XML (pagerenderer.cpp:628-710): TextRegion/TextLine/Word
    with Coords polygons and a ReadingOrder section."""
    line_sql = """
      concat('   <TextLine><Coords points="',
        min(left), ',', min(top), ' ', max(left + width), ',', min(top), ' ',
        max(left + width), ',', max(top + height), ' ', min(left), ',',
        max(top + height), '"/>',
        array_join(transform(array_sort(collect_list(struct(word_num, left, top,
                                                            width, height, text))),
          w -> concat('<Word><Coords points="', w.left, ',', w.top, ' ',
                      w.left + w.width, ',', w.top + w.height,
                      '"/><TextEquiv><Unicode>', w.text,
                      '</Unicode></TextEquiv></Word>')), ''),
        '</TextLine>')
    """
    lines = words.groupBy(
        "doc_id", "media_ref", "block_num", "par_num", "line_num"
    ).agg(F.expr(line_sql).alias("xml"))
    regions = lines.groupBy("doc_id", "media_ref", "block_num").agg(
        F.concat(
            F.lit('  <TextRegion id="r'),
            F.col("block_num"),
            F.lit('">\n'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("par_num", "line_num", "xml"))),
                    lambda s: s["xml"],
                ),
                "\n",
            ),
            F.lit("\n  </TextRegion>"),
        ).alias("xml")
    )
    return regions.groupBy("doc_id", "media_ref").agg(
        F.concat(
            F.lit("<PcGts><Page>\n <ReadingOrder>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_num", "xml"))),
                    lambda s: F.concat(
                        F.lit('<RegionRefIndexed index="'),
                        (s["block_num"] - 1).cast("string"),
                        F.lit('" regionRef="r'),
                        s["block_num"].cast("string"),
                        F.lit('"/>'),
                    ),
                ),
                "",
            ),
            F.lit("</ReadingOrder>\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_num", "xml"))),
                    lambda s: s["xml"],
                ),
                "\n",
            ),
            F.lit("\n</Page></PcGts>"),
        ).alias("page_xml")
    )


def to_box(words: DataFrame, page_heights: DataFrame | None = None) -> DataFrame:
    """WordStr box format (wordstrboxrenderer.cpp:1-105): one line-level
    record per text line, 'WordStr' marker + #-joined text, bottom-up y
    (the box family's coordinate convention, SURVEY §1.1)."""
    lines = words.groupBy("doc_id", "media_ref", "block_num", "par_num", "line_num").agg(
        F.min("left").alias("l"),
        F.min("top").alias("t"),
        F.max(F.col("left") + F.col("width")).alias("r"),
        F.max(F.col("top") + F.col("height")).alias("b"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word_num", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("line_text"),
    )
    if page_heights is not None:
        lines = lines.join(page_heights, "media_ref", "left")
        top_expr = F.col("height_px") - F.col("b")
        bot_expr = F.col("height_px") - F.col("t")
    else:
        top_expr, bot_expr = F.col("t"), F.col("b")
    return lines.select(
        "doc_id",
        "media_ref",
        F.concat_ws(
            " ",
            F.lit("WordStr"),
            F.col("l"),
            top_expr,
            F.col("r"),
            bot_expr,
            F.lit("0"),
            F.concat(F.lit("#"), F.col("line_text")),
        ).alias("box_line"),
    )


def to_alto(words: DataFrame) -> DataFrame:
    """ALTO XML: TextBlock/TextLine/String per media page."""
    line_sql = """
      concat('  <TextLine>',
        array_join(transform(array_sort(collect_list(struct(word_num, left, top,
                                                            width, height, text))),
          w -> concat('<String HPOS="', w.left, '" VPOS="', w.top,
                      '" WIDTH="', w.width, '" HEIGHT="', w.height,
                      '" CONTENT="', w.text, '"/>')), ''),
        '</TextLine>')
    """
    lines = words.groupBy(
        "doc_id", "media_ref", "block_num", "par_num", "line_num"
    ).agg(F.expr(line_sql).alias("xml"))
    blocks = lines.groupBy("doc_id", "media_ref", "block_num").agg(
        F.concat(
            F.lit(" <TextBlock>\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("par_num", "line_num", "xml"))),
                    lambda s: s["xml"],
                ),
                "\n",
            ),
            F.lit("\n </TextBlock>"),
        ).alias("xml")
    )
    return blocks.groupBy("doc_id", "media_ref").agg(
        F.concat(
            F.lit("<alto><Layout><Page>\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_num", "xml"))),
                    lambda s: s["xml"],
                ),
                "\n",
            ),
            F.lit("\n</Page></Layout></alto>"),
        ).alias("alto")
    )
