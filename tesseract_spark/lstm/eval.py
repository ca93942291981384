"""lstmeval analogue — distributed error rates for a VGSL model.

The reference's evaluator (src/training/lstmeval.cpp via
LSTMTester::RunEvalSync, src/training/unicharset/lstmtester.cpp:70-140)
decodes an eval set and reports char/word error percents
(ErrorCounter::ComputeErrorRate semantics: edit-distance char errors,
whole-word mismatches).  Here the eval set is a DataFrame of line
texts; ONE mapInPandas renders + decodes each partition's lines
(Arrow-batched, data-local) and emits a single partial-counts row per
partition — the same O(partitions) driver traffic shape as the trainer
(training.distributed_gradient).  At 1000 executors the partials go
through the same treeReduce story.
"""

from __future__ import annotations

import numpy as np

from .training import line_sample, trainable_slots, unflatten
from .vgsl import VGSLNetwork


def levenshtein(a, b) -> int:
    """Edit distance over arbitrary sequences (the char/word error
    counter of ErrorCounter::ComputeErrorRate)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def decode_lines(
    net: VGSLNetwork, texts: list[str], charset: str, blank: int
) -> list[str]:
    """Greedy-decode rendered line texts via the SHARED bucketed
    forward + collapse helpers (fixture_model.bucket_strips /
    greedy_collapse) so eval decode can never silently diverge from
    the production decoder's batching."""
    from .fixture_model import bucket_strips, greedy_collapse, trim_edge_spaces

    strips = [line_sample(t) for t in texts]
    space_id = charset.index(" ")
    out = [""] * len(texts)
    for idxs, x, t_reals in bucket_strips(strips):
        logp = net.forward(x)
        best = np.argmax(logp, axis=2)
        for j, i in enumerate(idxs):
            dec = trim_edge_spaces(
                greedy_collapse(best[j, : t_reals[j]], blank), space_id
            )
            out[i] = "".join(charset[c] for c in dec)
    return out


def _error_counts(truths: list[str], preds: list[str]):
    """(char_errs, n_chars, word_errs, n_words, n_exact).

    Edge spaces strip from BOTH sides: the decoder trims them
    (end-of-line is indistinguishable from a word gap), so a truth
    carrying edge whitespace must not count as error."""
    ce = nc = we = nw = ex = 0
    for t, p in zip(truths, preds):
        t = t.strip(" ")
        ce += levenshtein(t, p)
        nc += len(t)
        tw, pw = t.split(), p.split()
        we += levenshtein(tw, pw)
        nw += len(tw)
        ex += int(t == p)
    return ce, nc, we, nw, ex


def evaluate_lines_local(
    net: VGSLNetwork, texts: list[str], charset: str, blank: int
) -> dict:
    """Single-process eval (the lstmeval CLI run on one box)."""
    ce, nc, we, nw, ex = _error_counts(
        texts, decode_lines(net, texts, charset, blank)
    )
    return {
        "char_error_pct": 100.0 * ce / max(1, nc),
        "word_error_pct": 100.0 * we / max(1, nw),
        "exact_line_fraction": ex / max(1, len(texts)),
        "n_lines": len(texts),
    }


def distributed_eval(
    spark,
    texts_df,
    spec: str,
    weights: np.ndarray,
    charset: str,
    blank: int,
) -> dict:
    """Cluster-scale lstmeval: texts_df(column ``text``) -> error rates.

    One mapInPandas; each partition emits ONE partial-counts row; the
    driver sums a handful of rows (never the lines)."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(
        weights.astype(np.float32).tobytes()
    )

    def udf(batches, _spec=spec, _charset=charset, _blank=blank):
        net = VGSLNetwork(_spec)
        unflatten(
            net,
            trainable_slots(net),
            np.frombuffer(bc.value, np.float32).copy(),
        )
        ce = nc = we = nw = ex = n = 0
        for pdf in batches:
            texts = list(pdf["text"])
            c, tc, w, tw, e = _error_counts(
                texts, decode_lines(net, texts, _charset, _blank)
            )
            ce += c
            nc += tc
            we += w
            nw += tw
            ex += e
            n += len(texts)
        yield pd.DataFrame(
            {
                "ce": [ce],
                "nc": [nc],
                "we": [we],
                "nw": [nw],
                "ex": [ex],
                "n": [n],
            }
        )

    parts = texts_df.select("text").mapInPandas(
        udf, schema="ce long, nc long, we long, nw long, ex long, n long"
    )
    tot = {"ce": 0, "nc": 0, "we": 0, "nw": 0, "ex": 0, "n": 0}
    for row in parts.collect():  # O(partitions) rows, never O(lines)
        for k in tot:
            tot[k] += row[k]
    return {
        "char_error_pct": 100.0 * tot["ce"] / max(1, tot["nc"]),
        "word_error_pct": 100.0 * tot["we"] / max(1, tot["nw"]),
        "exact_line_fraction": tot["ex"] / max(1, tot["n"]),
        "n_lines": tot["n"],
    }
