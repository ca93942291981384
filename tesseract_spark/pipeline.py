"""The OCR extraction pipeline — Spark DataFrame plan + Arrow-batched UDFs.

End-to-end job (SURVEY §7.1): explode interleaved spans, join media bytes,
defeat compute skew with a fine-grained salted hash repartition, run the
page+recognition stages in one ``mapInPandas`` (Arrow batches, zero per-row
Python), stitch recognized sub-spans back between pass-through text spans
with a single window, and reassemble per-document span arrays.

Scale notes (100 TB / 1000 executors):
- the only wide exchanges are (a) the media_ref equi-join (hash join; media
  table is co-bucketable on media_ref at write time), (b) the explicit
  salted repartition that balances per-task OCR compute, and (c) the
  doc_id window+group for stitching. (b) carries only (doc_id, pos,
  media_ref, png) — no recognition state ever shuffles.
- OCR compute dominates; partition count should be >= 4x total cores so AQE
  and the salt keep stragglers bounded (BASELINE.md protocol).
- per-task metrics surface in the result rows (wall_ms, partition_id) and
  aggregate into the lineage table (sources/lineage.py) for checkpoint
  resume — the reference's ETEXT_DESC progress/cancel analogue
  (include/tesseract/ocrclass.h, control.cpp:304-323).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

OCR_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("sub", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("n_lines", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("wall_ms", T.DoubleType()),
        T.StructField("partition_id", T.IntegerType()),
    ]
)

DEFAULT_SALT = 16


def _make_ocr_udf(
    dict_words: list[str] | None,
    dict_patterns: list[str] | None = None,
    adapt_carryover: bool = False,
    charlists: tuple[str, str, str] | None = None,
):
    """Build the page+recognition mapInPandas body.

    Heavy state (template net, DAWG) is constructed lazily once per python
    worker — the executor-side singleton pattern the reference uses for
    models/DAWGs (src/dict/dawg_cache.cpp, SURVEY §3.1 step 3).
    """

    def ocr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        from pyspark import TaskContext

        from .functions.image_codecs import decode_gray_pages
        from .lstm.dawg import CombinedDawg, Dawg, PatternDawg
        from .lstm.templates import get_net
        from .operators.recognize import recognize_page, recognize_page_detail

        net = get_net()
        dawg = None
        if dict_words or dict_patterns:
            # user words + user patterns probe as parallel dawgs
            # (Dict::Load user-words/user-patterns, src/dict/dict.cpp)
            wd = Dawg(net.charset, dict_words) if dict_words else None
            pdw = (
                PatternDawg(net.charset, dict_patterns)
                if dict_patterns
                else None
            )
            dawg = CombinedDawg(wd, pdw) if pdw is not None else wd
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        # cross-page adaptive carryover (SwitchAdaptiveClassifier
        # continuity, control.cpp:306-322): with doc-local partitioning
        # (adapt_carryover mode) pages of one document arrive
        # consecutively and share learned glyph templates
        carry_doc = None
        carry_templates = None
        # document-words dawg carried with the templates: vocabulary
        # learned on page 1 validates terminology on page N
        # (Dict::document_words_, dict.cpp:648-708)
        carry_doc_words = None
        for pdf in batches:
            rows = []
            for doc_id, pos, ref, png, dpi in zip(
                pdf["doc_id"], pdf["pos"], pdf["media_ref"], pdf["png"], pdf["dpi"]
            ):
                t0 = time.perf_counter()
                if png is None:
                    # media_ref missing from the media table (left-join
                    # miss): keep the span in the document with the same
                    # degraded marker as a corrupt page — silent drops
                    # would be invisible data loss at corpus scale
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "pos": int(pos),
                            "sub": 0,
                            "kind": "media",
                            "text": None,
                            "media_ref": ref,
                            "confidence": 0.0,
                            "n_lines": 0,
                            "n_words": 0,
                            "n_chars": -1,
                            "wall_ms": 0.0,
                            "partition_id": pid,
                        }
                    )
                    continue
                else:
                    # per-page error isolation: a corrupt image must not
                    # kill the job — emit an empty media span and keep
                    # going, the reference's degraded-continuation
                    # semantics (per-page deadline fakes remaining words
                    # and the run continues, src/ccmain/control.cpp:314-322);
                    # n_chars = -1 marks the failure for lineage/QA
                    try:
                        # format autodetect by content (PNG/JPEG/TIFF —
                        # baseapi.cpp:1033-1194 ProcessPagesInternal); a
                        # multipage TIFF contributes every page's spans in
                        # container order under one media_ref
                        # (baseapi.cpp:958-998 multipage iteration)
                        imgs = decode_gray_pages(bytes(png))
                        spans = []
                        if adapt_carryover and dawg is not None:
                            if doc_id != carry_doc:
                                from .lstm.adaptive import AdaptiveTemplates
                                from .lstm.langmodel import DocumentWords

                                carry_doc = doc_id
                                carry_templates = AdaptiveTemplates()
                                carry_doc_words = DocumentWords()
                            for img in imgs:
                                sp, _words, _layout = recognize_page_detail(
                                    img, int(dpi), dawg, net,
                                    carry_adapted=carry_templates,
                                    charlists=charlists,
                                    doc_words=carry_doc_words,
                                )
                                spans.extend(sp)
                        else:
                            for img in imgs:
                                sp, _layout = recognize_page(
                                    img, int(dpi), dawg, net,
                                    charlists=charlists,
                                )
                                spans.extend(sp)
                    except Exception:
                        wall = (time.perf_counter() - t0) * 1000.0
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "pos": int(pos),
                                "sub": 0,
                                "kind": "media",
                                "text": None,
                                "media_ref": ref,
                                "confidence": 0.0,
                                "n_lines": 0,
                                "n_words": 0,
                                "n_chars": -1,
                                "wall_ms": wall,
                                "partition_id": pid,
                            }
                        )
                        continue
                wall = (time.perf_counter() - t0) * 1000.0
                for sub, s in enumerate(spans):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "pos": int(pos),
                            "sub": sub,
                            "kind": s.kind,
                            "text": s.text if s.kind == "text" else None,
                            "media_ref": ref if s.kind == "media" else None,
                            "confidence": float(s.confidence),
                            "n_lines": int(s.n_lines),
                            "n_words": int(s.n_words),
                            "n_chars": len(s.text),
                            # per-span timing is approximate: the page's
                            # wall clock divides evenly across its spans
                            # (only per-PAGE totals are meaningful; the
                            # lineage metrics aggregate before reporting)
                            "wall_ms": wall / max(1, len(spans)),
                            "partition_id": pid,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in OCR_OUT_SCHEMA.fields])

    return ocr_batches



def ocr_documents(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    dict_words: list[str] | None = None,
    num_partitions: int | None = None,
    broadcast_media: bool | None = None,
    dict_patterns: list[str] | None = None,
    adapt_carryover: bool = False,
    charlists: tuple[str, str, str] | None = None,
) -> DataFrame:
    """documents(doc_id, spans) + media(media_ref, png, dpi) -> flat spans.

    Returns (doc_id, offset, kind, text, media_ref, confidence, n_lines,
    n_words, wall_ms, partition_id) in reading order per document.
    """
    exploded = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    text_rows = exploded.filter(F.col("kind") == "text").select(
        "doc_id", "pos", "text"
    )
    media_refs = exploded.filter(F.col("kind") == "media").select(
        "doc_id", "pos", "media_ref"
    )
    return ocr_from_parts(
        spark, text_rows, media_refs, media,
        dict_words=dict_words, num_partitions=num_partitions,
        broadcast_media=broadcast_media, dict_patterns=dict_patterns,
        adapt_carryover=adapt_carryover, charlists=charlists,
    )


def ocr_from_parts(
    spark: SparkSession,
    text_rows: DataFrame,
    media_refs: DataFrame,
    media: DataFrame,
    dict_words: list[str] | None = None,
    num_partitions: int | None = None,
    broadcast_media: bool | None = None,
    media_prebucketed: bool = False,
    dict_patterns: list[str] | None = None,
    adapt_carryover: bool = False,
    charlists: tuple[str, str, str] | None = None,
) -> DataFrame:
    """Pipeline core over pre-split inputs.

    text_rows: (doc_id, pos, text) pass-through spans;
    media_refs: (doc_id, pos, media_ref); media: (media_ref, png, dpi).

    ``adapt_carryover``: partition/sort media rows by (doc_id, pos) so
    pages of one document land consecutively in one task and share
    adapted glyph templates (the reference's cross-page adaptive
    classifier continuity).  Trade-off, documented: doc-keyed placement
    gives up the media_ref hash's page-level skew defeat, so reserve it
    for corpora whose per-document page counts are bounded.

    ``media_prebucketed``: the media table is a bucketed catalog table on
    media_ref — the scan itself satisfies the join's distribution, so the
    heavy png payload NEVER shuffles; only the light (doc_id, pos,
    media_ref) refs exchange into the bucket layout.  This is the
    100TB-scale shape: the multi-TB image bytes stay where they were
    written, and per-query network traffic is proportional to the span
    index, not the corpus.
    """
    if num_partitions is None:
        import os

        env = int(os.environ.get("SPARK_GRAFT_PARTITIONS", "0"))
        num_partitions = env or spark.sparkContext.defaultParallelism * 4
    text_full = text_rows.select(
        "doc_id",
        "pos",
        F.lit(-1).cast("int").alias("sub"),
        F.lit("text").alias("kind"),
        "text",
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(None).cast("double").alias("confidence"),
        F.lit(0).cast("int").alias("n_lines"),
        F.lit(0).cast("int").alias("n_words"),
        F.length("text").cast("int").alias("n_chars"),
        F.lit(0.0).alias("wall_ms"),
        F.lit(-1).cast("int").alias("partition_id"),
    )
    media_side = media.select("media_ref", "png", "dpi")
    if media_prebucketed:
        # no manual repartition on either side: EnsureRequirements sees the
        # bucketed scan's HashPartitioning(media_ref, n_buckets) and adds
        # exactly one exchange, on the refs side
        media_rows = media_refs.join(
            media_side.hint("shuffle_hash"), "media_ref", "left"
        )
    elif broadcast_media:
        media_rows = media_refs.repartition(num_partitions, "media_ref").join(
            F.broadcast(media_side), "media_ref", "left"
        )
    else:
        # pre-partition BOTH sides on media_ref so the join reuses these
        # exchanges (EnsureRequirements adds none) — the heavy png payload
        # shuffles exactly once, and the join output is already the
        # cost-balanced OCR partitioning.  Skew defeat (BASELINE.json):
        # page-complexity cost is Zipf-skewed, so hashing the fine-grained
        # media_ref key detaches page placement from document/file
        # locality and balances per-partition cost by the law of large
        # numbers (hundreds of pages per task, partitions >= 4x cores);
        # no sort and no range-bounds sampling job (repartitionByRange
        # would execute the render/scan twice).  Measured: the
        # size-bucketed range scheme concentrated the expensive class
        # (33s straggler vs 9s median) and was rejected.
        media_rows = (
            media_refs.repartition(num_partitions, "media_ref")
            .join(
                media_side.repartition(num_partitions, "media_ref").hint(
                    "shuffle_hash"  # avoid sort-merge's per-partition sorts
                ),
                "media_ref",
                "left",
            )
        )
    repart = media_rows.select("doc_id", "pos", "media_ref", "png", "dpi")
    if adapt_carryover:
        repart = repart.repartition(num_partitions, "doc_id").sortWithinPartitions(
            "doc_id", "pos"
        )
    ocr = repart.mapInPandas(
        _make_ocr_udf(dict_words, dict_patterns, adapt_carryover, charlists),
        schema=OCR_OUT_SCHEMA,
    )
    unioned = ocr.unionByName(text_full)
    w = Window.partitionBy("doc_id").orderBy("pos", "sub")
    return unioned.withColumn(
        "offset", (F.row_number().over(w) - 1).cast("int")
    ).select(
        "doc_id", "offset", "kind", "text", "media_ref", "confidence",
        "n_lines", "n_words", "n_chars", "wall_ms", "partition_id",
    )


def assemble_spans(flat: DataFrame) -> DataFrame:
    """Flat spans -> documents-shaped (doc_id, spans array<struct>) output."""
    return flat.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("kind", "text", "media_ref", "offset")
        ).alias("spans_unordered")
    ).select(
        "doc_id",
        F.expr(
            "transform(array_sort(spans_unordered, (a, b) -> a.offset - b.offset),"
            " s -> struct(s.kind as kind, s.text as text,"
            " s.media_ref as media_ref, s.offset as offset))"
        ).alias("spans"),
    )
