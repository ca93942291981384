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

from .fixture_model import PAD
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
    """Greedy-decode rendered line texts, width-bucketed (one forward
    per bucket — the StrideMap batching of the production decoder)."""
    strips = [line_sample(t) for t in texts]
    space_id = charset.index(" ")
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(strips):
        w = s.shape[1] + 2 * PAD
        buckets.setdefault(-(-w // 32), []).append(i)
    out = [""] * len(texts)
    for key in sorted(buckets):
        idxs = buckets[key]
        wmax = key * 32
        x = np.zeros((len(idxs), 1, wmax, 16), dtype=np.float32)
        for j, i in enumerate(idxs):
            s = strips[i].astype(np.float32)
            x[j, 0, PAD : PAD + s.shape[1], :] = s.T
        logp = net.forward(x)
        for j, i in enumerate(idxs):
            t_real = strips[i].shape[1] + 2 * PAD
            best = np.argmax(logp[j, :t_real], axis=1)
            keep = np.ones(len(best), bool)
            keep[1:] = best[1:] != best[:-1]
            dec = [int(c) for c in best[keep] if c != blank]
            while dec and dec[0] == space_id:
                dec.pop(0)
            while dec and dec[-1] == space_id:
                dec.pop()
            out[i] = "".join(charset[c] for c in dec)
    return out


def _error_counts(truths: list[str], preds: list[str]):
    """(char_errs, n_chars, word_errs, n_words, n_exact)."""
    ce = nc = we = nw = ex = 0
    for t, p in zip(truths, preds):
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
