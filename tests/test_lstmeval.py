"""lstmeval analogue tests (src/training/lstmeval.cpp;
LSTMTester::RunEvalSync lstmtester.cpp:70-140; error semantics of
ErrorCounter::ComputeErrorRate): char/word error percents over an eval
set, locally and as the one-partial-row-per-partition Spark job."""

import numpy as np

import tesseract_spark.lstm.training as T
from tesseract_spark.functions.fonts import CHARSET
from tesseract_spark.lstm.eval import (
    decode_lines,
    distributed_eval,
    evaluate_lines_local,
    levenshtein,
)
from tesseract_spark.lstm.fixture_model import build_fixture_net

CHARS = CHARSET + " "
BLANK = len(CHARS)
WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five "
    "dozen liquor jugs"
).split()


def _lines(seed, n):
    rng = np.random.default_rng(seed)
    return [
        " ".join(rng.choice(WORDS, rng.integers(2, 5))) for _ in range(n)
    ]


def test_levenshtein_chars_and_words():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("", "abc") == 3
    assert levenshtein(["a", "b"], ["a", "c", "b"]) == 1


def test_clean_model_scores_zero_error():
    net = build_fixture_net()
    lines = _lines(3, 8)
    assert decode_lines(net, lines, CHARS, BLANK) == lines
    m = evaluate_lines_local(net, lines, CHARS, BLANK)
    assert m["char_error_pct"] == 0.0
    assert m["word_error_pct"] == 0.0
    assert m["exact_line_fraction"] == 1.0


def test_damaged_model_scores_nonzero_error():
    net = build_fixture_net()
    slots = T.trainable_slots(net, (len(net.layers) - 1,))
    vec = T.flatten(net, slots)
    rng = np.random.default_rng(5)
    T.unflatten(
        net, slots, (vec + rng.normal(0, 1.5, vec.shape)).astype(np.float32)
    )
    m = evaluate_lines_local(net, _lines(3, 8), CHARS, BLANK)
    assert m["char_error_pct"] > 50.0
    assert m["exact_line_fraction"] < 1.0


def test_distributed_eval_matches_local(spark):
    """The Spark job aggregates per-partition partials into the SAME
    rates as the single-process run (lstmeval CLI parity)."""
    net = build_fixture_net()
    slots = T.trainable_slots(net)
    vec = T.flatten(net, slots)
    lines = _lines(7, 16)
    local = evaluate_lines_local(net, lines, CHARS, BLANK)
    df = spark.createDataFrame(
        [(t,) for t in lines], "text string"
    ).repartition(4)
    dist = distributed_eval(
        spark, df, net.spec, vec, CHARS, BLANK
    )
    assert dist == local


def test_edge_space_truth_scores_zero():
    # a ground-truth line carrying edge spaces must not count as error:
    # the decoder trims them (end-of-line == word gap), so the counter
    # strips both sides
    net = build_fixture_net()
    m = evaluate_lines_local(net, ["  the fox  "], CHARS, BLANK)
    assert m["char_error_pct"] == 0.0 and m["exact_line_fraction"] == 1.0
