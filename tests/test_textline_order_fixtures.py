"""CalculateTextlineOrder parity fixtures ported VERBATIM from
unittest/resultiterator_test.cc:478-536 (DualStart / Leftward /
Rightward TextlineOrderTest + the exhaustive TextlineOrderSanityCheck),
run against bidi.textline_order_marked.

Direction letters: L = DIR_LEFT_TO_RIGHT, R = DIR_RIGHT_TO_LEFT,
N = DIR_NEUTRAL, M = DIR_MIX; markers kMinorRunStart/-End/-ComplexWord
= -1/-2/-3 (resultiterator.cpp:116-118)."""

from tesseract_spark.operators.bidi import (
    MINOR_RUN_END,
    MINOR_RUN_START,
    textline_order_marked,
)

S, E = MINOR_RUN_START, MINOR_RUN_END


def order(ltr_context: bool, dirs: str) -> list[int]:
    return textline_order_marked(list(dirs), ltr_context)


def test_dual_start_textline_order():
    # resultiterator_test.cc:478-490
    dirs = "LLNLNRRR"
    assert order(False, dirs) == [7, 6, 5, 4, S, 0, 1, 2, 3, E]
    assert order(True, dirs) == [0, 1, 2, 3, 4, S, 7, 6, 5, E]


def test_leftward_textline_order():
    # resultiterator_test.cc:493-508: clearly-LTR text reads left to
    # right no matter the context
    dirs = "LLNLNNLL"
    assert order(True, dirs) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert order(False, dirs) == [S, 0, 1, 2, 3, 4, 5, 6, 7, E]


def test_rightward_textline_order():
    # resultiterator_test.cc:510-516
    dirs = "RRNRNNRR"
    assert order(False, dirs) == [7, 6, 5, 4, 3, 2, 1, 0]


def test_textline_order_sanity_check():
    # resultiterator_test.cc:518-536: all 4^7 direction combinations in
    # both contexts must emit each word index exactly once (markers are
    # the only negative entries)
    kinds = "NLRM"
    n = 7
    for combo in range(4 ** n):
        tmp = combo
        dirs = []
        for _ in range(n):
            dirs.append(kinds[tmp % 4])
            tmp //= 4
        for ltr in (True, False):
            out = textline_order_marked(dirs, ltr)
            assert len(out) >= n, (dirs, ltr)
            got = sorted(i for i in out if i >= 0)
            assert got == list(range(n)), (dirs, ltr, out)
