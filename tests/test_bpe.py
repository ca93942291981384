"""BPE tokenizer: driver merge loop, distributed train/encode parity.

The learner is the training-tools analogue a data pipeline needs next to
unicharset extraction (SURVEY §2.10); its single distributed statistic
(adjacent-pair counts over the word-frequency table) is the standalone
oracle query q_bpe_pair_counts, so rank-1 of that query MUST equal the
first learned merge — asserted below.
"""

import duckdb

from tesseract_spark.functions import bpe
from tesseract_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_learn_bpe_hand_example():
    # Sennrich-style toy vocab (no end-of-word marker in our scheme).
    counts = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}
    merges = bpe.learn_bpe(counts, 3)
    # Pair counts: u,g = 10+5+5 = 20; p,u = 5+12 = 17; u,n = 12+4 = 16;
    # h,u = 15; b,u = 4; g,s = 5.
    # 1st merge ('u','g') 20 -> hug/pug/hugs now contain 'ug'; p,u drops
    # to 12 (pun only).  2nd ('u','n') 16.  3rd ('h','ug') 15.
    assert merges == [("u", "g"), ("u", "n"), ("h", "ug")]


def test_learn_bpe_deterministic_ordering():
    a = {"ab": 3, "ba": 3, "cd": 3}
    m1 = bpe.learn_bpe(a, 2)
    m2 = bpe.learn_bpe(list(reversed(list(a.items()))), 2)
    assert m1 == m2
    # tie at count 3: lexicographically smallest pair wins
    assert m1[0] == ("a", "b")


def test_encode_word_and_roundtrip():
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    ranks = bpe.merges_to_ranks(merges)
    assert bpe.encode_word("lower", ranks) == ["low", "er"]
    text = "low lower lowest"
    toks = bpe.encode_text(text, ranks)
    assert "".join(toks) == text  # lossless
    # more merges never increases token count
    fewer = bpe.encode_text(text, bpe.merges_to_ranks(merges[:1]))
    assert len(toks) <= len(fewer)


def test_first_merge_matches_pair_counts_oracle(spark):
    """Rank-1 of q_bpe_pair_counts == the learner's first merge."""
    fn, sql = REGISTRY["bpe_pair_counts"]
    top = fn(spark, SF_DIR).orderBy("rank").limit(1).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = bpe.learn_bpe_distributed(docs, 1)
    assert merges[0][0] + merges[0][1] == top["pair"]
    # and DuckDB agrees end-to-end
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    assert con.sql(sql).df().iloc[0]["pair"] == top["pair"]


def test_distributed_encode_matches_local(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    merges = bpe.learn_bpe_distributed(docs, 40)
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_chars_enc"])
        for r in bpe.encode_documents(docs, merges).collect()
    }
    ranks = bpe.merges_to_ranks(merges)
    for row in docs.select("doc_id", "text").collect():
        toks = bpe.encode_text(row["text"] or "", ranks)
        assert got[row["doc_id"]] == (
            len(toks),
            sum(len(t) for t in toks),
        ), row["doc_id"]
        # encoding is lossless over the pre-tokenizable text
        assert "".join(toks) == "".join(bpe.pretokenize(row["text"] or ""))


def test_merge_reduces_corpus_tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = (
        bpe.encode_documents(docs, [])
        .agg({"n_bpe_tokens": "sum"})
        .collect()[0][0]
    )
    merges = bpe.learn_bpe_distributed(docs, 60)
    n60 = (
        bpe.encode_documents(docs, merges)
        .agg({"n_bpe_tokens": "sum"})
        .collect()[0][0]
    )
    assert n60 < n0


def test_heavy_tail_vocab_capped_driver_budget(spark):
    """VERDICT r3 'What's wrong' #2: a noisy-web-shaped vocabulary
    (distinct pre-tokens ~ corpus size, e.g. hex blobs) must be bounded
    in the Spark agg BEFORE collection.  The head (frequent natural
    words) still drives the first merges; the hex tail never reaches
    the driver."""
    from pyspark.sql import functions as F

    # 20k distinct hex-blob singletons + a heavy natural head
    tail = spark.range(20_000).select(
        F.concat(F.lit("doc"), "id").alias("doc_id"),
        F.concat(F.lit("0x"), F.md5(F.col("id").cast("string"))).alias(
            "text"
        ),
    )
    head = spark.range(500).select(
        F.concat(F.lit("h"), "id").alias("doc_id"),
        F.lit("lower lower lowest lowest lower").alias("text"),
    )
    docs = head.union(tail)
    # cap = 200: only the head survives the top-V ordering
    merges = bpe.learn_bpe_distributed(docs, 5, max_vocab=200)
    assert len(merges) == 5
    ranks = bpe.merges_to_ranks(merges)
    assert bpe.encode_word("lower", ranks) != list("lower")  # head learned
    # the floor alone also prunes the singleton tail
    merges_floor = bpe.learn_bpe_distributed(
        docs, 1, min_count=2, max_vocab=50_000
    )
    assert merges_floor[0] == merges[0]
