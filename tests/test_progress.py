"""Progress/timeout/cancel monitor — the unittest/progress_test.cc
contract (classic + new-style callbacks, monotonic progress reaching
>= 50%) plus the RecogAllWordsPassN abort semantics
(control.cpp:213-231: deadline/cancel fakes out the remaining words)."""

import numpy as np

from tesseract_spark.functions.fonts import mask_to_gray, render_line
from tesseract_spark.operators.monitor import Monitor
from tesseract_spark.operators.recognize import recognize_page_detail


def _page(lines=4):
    masks = [render_line("hello world", 2) for _ in range(lines)]
    h = sum(m.shape[0] for m in masks) + 40 * (lines + 1)
    w = max(m.shape[1] for m in masks) + 80
    canvas = np.zeros((h, w), dtype=bool)
    y = 40
    for m in masks:
        canvas[y : y + m.shape[0], 40 : 40 + m.shape[1]] |= m
        y += m.shape[0] + 40
    return mask_to_gray(canvas)


def test_classic_progress_reporting():
    # progress_test.cc:147-149 ClassicProgressReporting: the classic
    # percent callback fires with monotonically NON-DECREASING values
    # <= 100 and reaches at least 50
    seen = []

    def classic(percent, l, r, t, b):
        seen.append(percent)
        return False

    m = Monitor(progress_callback=classic)
    spans, words, _l = recognize_page_detail(_page(), monitor=m)
    assert words and all(w.text for w in words)
    assert seen and all(0 <= p <= 100 for p in seen)
    assert all(b >= a for a, b in zip(seen, seen[1:]))
    assert m.progress == 100 and max(seen) >= 50


def test_new_progress_reporting_suppresses_classic():
    # progress_test.cc:151-153 NewProgressReporting: when
    # progress_callback2 is set the classic callback never fires
    classic_calls, new_calls = [], []

    def classic(percent, l, r, t, b):
        classic_calls.append(percent)
        return False

    def new_style(monitor, l, r, t, b):
        new_calls.append(monitor.progress)
        return False

    m = Monitor(progress_callback=classic, progress_callback2=new_style)
    recognize_page_detail(_page(), monitor=m)
    assert not classic_calls
    assert new_calls and all(b >= a for a, b in zip(new_calls, new_calls[1:]))
    assert max(new_calls) >= 50 and m.progress == 100


def test_cancel_fakes_out_remaining_rows():
    # control.cpp:224-231: cancel after the first row -> later rows
    # decode empty, the job does not raise
    state = {"n": 0}

    def cancel(this, total):
        state["n"] += 1
        return state["n"] > 1

    m = Monitor(cancel=cancel)
    spans, words, _l = recognize_page_detail(_page(4), monitor=m)
    texts = [w.text for w in words]
    assert 0 < len(texts) < 8  # first row decoded, rest faked
    assert m.progress < 100


def test_deadline_exceeded_stops_early():
    m = Monitor()
    m.set_deadline_msecs(1)
    import time

    time.sleep(0.005)
    assert m.deadline_exceeded()
    spans, words, _l = recognize_page_detail(_page(3), monitor=m)
    assert words == []  # every row faked
    # clearing the deadline re-enables recognition
    m2 = Monitor()
    m2.set_deadline_msecs(0)
    assert not m2.deadline_exceeded()
