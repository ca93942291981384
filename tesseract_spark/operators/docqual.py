"""Document-quality statistics and quality-based rejection (docqual.cpp).

Re-expresses the legacy rejection pass — the last §2 operator row — as
pure DataFrame aggregations over the word-level OCR output (this pass IS
relational in the reference: per-word quality counts roll up to row /
block / page tallies that gate bulk rejection):

- per-word quality (``word_blob_quality`` / ``word_char_quality``,
  src/ccmain/docqual.cpp:51-92): here a word's characters count as good
  when its confidence clears the accept threshold (the template engine's
  match fraction plays the blob-quality role);
- the page gate (``recog_all_words`` pass 4, src/ccmain/control.cpp:
  663-681): ``good_quality_doc`` = reject fraction <= quality_rej_pc
  (0.08) AND char quality fraction >= quality_char_pc (0.95);
- bulk rejection (``doc_and_block_rejection``, docqual.cpp:204-320):
  pages over tessedit_reject_doc_percent (65%) reject wholesale; blocks
  over tessedit_reject_block_percent (45%) reject all their words —
  rejected words render as UNLV tildes downstream (tilde_crunch).

Spark shape: two groupBy aggregations (block, page) + broadcast joins
back onto the word rows — no window, no skew risk (keys are pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUALITY_REJ_PC = 0.08  # tesseractclass.cpp:210
QUALITY_CHAR_PC = 0.95  # tesseractclass.cpp:214
REJECT_DOC_PERCENT = 65.0  # tesseractclass.cpp:236
REJECT_BLOCK_PERCENT = 45.0  # tesseractclass.cpp:238
K_GOOD_CONF = 70.0  # conf >= : chars count toward char quality (the
#   engine's clean exact-match decodes score ~72-86; soft/dict-arbitrated
#   and damaged readings fall below — calibrated like the reference's
#   blob-quality accept band is to its classifier)
K_REJECT_CONF = 50.0  # conf < : word's chars count as rejects (sinks.py)


def block_quality_stats(words: DataFrame) -> DataFrame:
    """Per-(doc_id, media_ref, block_num) quality tallies — the single
    aggregation pass both the page gate and block rejection roll up
    from (one scan of the expensive word source)."""
    w = words.filter(F.col("word_num") >= 0).withColumn(
        "n_chars", F.length("text")
    )
    return w.groupBy("doc_id", "media_ref", "block_num").agg(
        F.sum("n_chars").alias("char_count"),
        F.sum(
            F.when(F.col("conf") < K_REJECT_CONF, F.col("n_chars")).otherwise(0)
        ).alias("rej_count"),
        F.sum(
            F.when(F.col("conf") >= K_GOOD_CONF, F.col("n_chars")).otherwise(0)
        ).alias("char_quality"),
    )


def doc_quality_stats(words: DataFrame) -> DataFrame:
    """Per-(doc_id, media_ref) quality tallies + the good_quality_doc
    gate (control.cpp:663-681); rolled up from the block tallies so the
    word source is scanned once."""
    per_page = block_quality_stats(words).groupBy("doc_id", "media_ref").agg(
        F.sum("char_count").alias("char_count"),
        F.sum("rej_count").alias("rej_count"),
        F.sum("char_quality").alias("char_quality"),
    )
    return per_page.select(
        "doc_id",
        "media_ref",
        "char_count",
        "rej_count",
        "char_quality",
        (
            (F.col("rej_count") / F.greatest(F.col("char_count"), F.lit(1))
             <= QUALITY_REJ_PC)
            & (F.col("char_quality") / F.greatest(F.col("char_count"), F.lit(1))
               >= QUALITY_CHAR_PC)
        ).alias("good_quality_doc"),
    )


def quality_based_rejection(words: DataFrame) -> DataFrame:
    """Words + a ``rejected`` flag (doc_and_block_rejection semantics):

    - whole-page rejection when page reject rate > 65%;
    - block rejection when a block's reject rate > 45% (skipped on
      good-quality pages — the gate the reference applies before bulk
      rejection);
    - otherwise a word is rejected only by its own confidence.

    Scan accounting: the word source (typically a full-OCR mapInPandas)
    is read twice — once for the base rows, once for the block tallies
    that both aggregate levels derive from; callers with an expensive
    source should .cache() it first (the UNLV sink path's tests do).
    """
    w = words.filter(F.col("word_num") >= 0).withColumn(
        "n_chars", F.length("text")
    )
    blocks = block_quality_stats(words)
    page = (
        blocks.groupBy("doc_id", "media_ref")
        .agg(
            F.sum("char_count").alias("char_count"),
            F.sum("rej_count").alias("rej_count"),
            F.sum("char_quality").alias("char_quality"),
        )
        .select(
            "doc_id",
            "media_ref",
            (
                (F.col("rej_count") / F.greatest(F.col("char_count"), F.lit(1))
                 <= QUALITY_REJ_PC)
                & (F.col("char_quality")
                   / F.greatest(F.col("char_count"), F.lit(1))
                   >= QUALITY_CHAR_PC)
            ).alias("good_quality_doc"),
            (
                F.col("rej_count") * 100.0
                / F.greatest(F.col("char_count"), F.lit(1))
                > REJECT_DOC_PERCENT
            ).alias("page_rejected"),
        )
    )
    block = blocks.select(
        "doc_id",
        "media_ref",
        "block_num",
        (
            F.col("rej_count") * 100.0
            / F.greatest(F.col("char_count"), F.lit(1))
            > REJECT_BLOCK_PERCENT
        ).alias("block_rejected"),
    )
    return (
        w.join(F.broadcast(page), ["doc_id", "media_ref"], "left")
        .join(block, ["doc_id", "media_ref", "block_num"], "left")
        .withColumn(
            "rejected",
            F.col("page_rejected")
            | (~F.col("good_quality_doc") & F.col("block_rejected"))
            | (F.col("conf") < K_REJECT_CONF),
        )
        .drop("n_chars", "page_rejected", "block_rejected")
    )
