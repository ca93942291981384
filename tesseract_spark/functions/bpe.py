"""Byte-pair-encoding tokenizer: distributed training + distributed encode.

The tokenizer a 100 TB training-data pipeline learns over its own corpus
(Sennrich et al. 2016, arXiv:1508.07909; the GPT-2 byte-level variant uses
the same merge loop over a different alphabet).  The whole design rides on
one observation: BPE statistics only ever depend on the WORD-FREQUENCY
table, and 100 TB of web text collapses to a few hundred MB of distinct
pre-tokens under one hash aggregation.  So:

  - `word_frequencies` is the distributed step — ONE map-side-combined
    hash agg over the corpus (the same shuffle shape as
    queries.q_bpe_pair_counts, which is exactly one merge-round of this
    learner run as a standalone oracle query);
  - `learn_bpe` runs the merge loop driver-side over the compressed
    table with incrementally-maintained pair counts (each merge touches
    only the words containing the merged pair — the standard learner);
  - `encode_documents` is distributed again: merges broadcast to the
    executors, encoding runs in Arrow-batched mapInPandas with a
    per-batch word memo (web text repeats words heavily, so the memo
    turns per-word merge loops into dict hits).

Pre-tokenization uses the lookahead-free GPT-2 split core shared with
queries.q_bpe_token_stats / q_bpe_pair_counts: an optionally
space-prefixed letter run, digit run, or punctuation run.  Ties in the
merge loop break deterministically by (count desc, pair asc) so training
is reproducible across partitionings and repeat runs.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The JVM-side regex (queries.py) and this Python regex must tokenize
# identically; both are the lookahead-free core of the GPT-2 pattern.
PRETOKEN_PAT = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
_PRETOKEN_RE = re.compile(PRETOKEN_PAT)


def pretokenize(text: str) -> list[str]:
    """Split text into space-prefixed letter/digit/punct runs."""
    return _PRETOKEN_RE.findall(text or "")


# ---------------------------------------------------------------------------
# Distributed step: corpus -> word-frequency table
# ---------------------------------------------------------------------------


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE hash aggregation: corpus -> (w, wc) distinct pre-token counts.

    Map-side combine means the shuffle carries per-partition partial
    counts over the (small) distinct-word key space, never the corpus.
    """
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(PRETOKEN_PAT),
                    F.lit(0),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


# ---------------------------------------------------------------------------
# Driver-side merge loop over the compressed table
# ---------------------------------------------------------------------------


def _pair_stats(
    vocab: dict[tuple[str, ...], int],
) -> tuple[Counter, dict[tuple[str, str], set]]:
    """Pair -> total count, and pair -> set of words containing it."""
    stats: Counter = Counter()
    index: dict[tuple[str, str], set] = {}
    for word, wc in vocab.items():
        for a, b in zip(word, word[1:]):
            stats[(a, b)] += wc
            index.setdefault((a, b), set()).add(word)
    return stats, index


def _merge_word(
    word: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    a, b = pair
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        if i + 1 < n and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def learn_bpe(
    word_counts: dict[str, int] | Iterable[tuple[str, int]],
    n_merges: int,
) -> list[tuple[str, str]]:
    """The Sennrich merge loop with incremental pair-count maintenance.

    Each round takes the (count desc, pair asc) argmax and re-counts only
    the words that contained the merged pair — O(affected words), not
    O(vocab), per merge.  Deterministic for any input ordering.
    """
    if isinstance(word_counts, dict):
        items = word_counts.items()
    else:
        items = word_counts
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in items:
        if w:
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + int(c)

    stats, index = _pair_stats(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for pair, cnt in stats.items():
            if cnt <= 0:
                continue
            key = (-cnt, pair)
            if best is None or key < best[0]:
                best = (key, pair, cnt)
        if best is None:
            break
        _, pair, _ = best
        merges.append(pair)

        # Re-count only the affected words.
        for word in list(index.get(pair, ())):
            wc = vocab.pop(word, None)
            if wc is None:
                continue
            for p in zip(word, word[1:]):
                stats[p] -= wc
                s = index.get(p)
                if s is not None:
                    s.discard(word)
            new = _merge_word(word, pair)
            vocab[new] = vocab.get(new, 0) + wc
            for p in zip(new, new[1:]):
                stats[p] += wc
                index.setdefault(p, set()).add(new)
        index.pop(pair, None)
        stats.pop(pair, None)
    return merges


def learn_bpe_distributed(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word-frequency compression, driver-side merge loop.

    The collect here is the compressed DISTINCT-WORD table, not corpus
    rows — for natural language that is a few hundred MB at 100 TB.
    Noisy web corpora (URLs, hex blobs, code identifiers) grow distinct
    pre-tokens ~linearly, so the collection is bounded in the Spark agg
    BEFORE it reaches the driver: a ``min_count`` frequency floor plus a
    deterministic top-``max_vocab`` cap (count desc, word asc — standard
    BPE practice; rare singletons cannot win a merge against a 1M-word
    head, so the cap does not change the learned merges on natural
    text).  The cap is the fixed driver budget; pass a larger one
    explicitly if a bigger head is wanted.
    """
    wf = word_frequencies(docs, text_col)
    if min_count > 1:
        wf = wf.filter(F.col("wc") >= min_count)
    wf = (
        wf.orderBy(F.col("wc").desc(), F.col("w"))
        .limit(int(max_vocab))
        .toPandas()
    )
    return learn_bpe(zip(wf["w"].tolist(), wf["wc"].tolist()), n_merges)


# ---------------------------------------------------------------------------
# Encoding (greedy lowest-rank merge, GPT-2 style)
# ---------------------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pre-token: always fuse the lowest-rank pair."""
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(parts, parts[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def encode_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    memo: dict[str, list[str]] | None = None,
) -> list[str]:
    out: list[str] = []
    for w in pretokenize(text):
        if memo is not None:
            enc = memo.get(w)
            if enc is None:
                enc = encode_word(w, ranks)
                memo[w] = enc
        else:
            enc = encode_word(w, ranks)
        out.extend(enc)
    return out


def merges_to_ranks(
    merges: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def encode_documents(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed encode: per-doc BPE token count + compression ratio.

    Merges ride the closure (broadcast by Spark with the task binary —
    a merge table is KBs); encoding is Arrow-batched mapInPandas with a
    per-batch word memo.  Zero shuffle: one narrow projection.
    """
    spark = docs.sparkSession
    schema = (
        f"{id_col} long, n_bpe_tokens int, n_chars_enc int, "
        "compression double"
    )
    merge_list = list(merges)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = merges_to_ranks(merge_list)
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = encode_text(text or "", ranks, memo)
                n_chars = sum(len(t) for t in toks)
                rows.append(
                    (
                        did,
                        len(toks),
                        n_chars,
                        round(n_chars / max(len(toks), 1), 4),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_bpe_tokens",
                    "n_chars_enc",
                    "compression",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)
