"""ETEXT_DESC — the progress/timeout/cancel monitor (ocrclass.h:102-160).

The reference threads one mutable monitor through recognition: the word
loop updates ``progress`` (70% across pass 1, the last 30% across
pass 2, control.cpp:213-219), fires the progress callback with the
current word's box, and aborts — faking out the remaining words — when
the deadline passes or the cancel hook says stop (control.cpp:224-231).
``recognize_page_detail(monitor=...)`` implements the same contract
over its row loops; the faked remainder decodes as empty rows, the
degraded-continuation semantics the pipeline's per-page isolation
already documents.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable


def _default_progress_func(monitor: "Monitor", left, right, top, bottom):
    """ocrclass.h:146-153: the default new-style callback forwards to
    the classic percent callback when one is set."""
    if monitor.progress_callback is not None:
        return monitor.progress_callback(
            monitor.progress, left, right, top, bottom
        )
    return True


@dataclass
class Monitor:
    """ETEXT_DESC analogue.  ``cancel(cancel_this, word_count) -> bool``
    returns True to abort; ``progress_callback(percent, l, r, t, b)``
    is the classic HP signature; ``progress_callback2(monitor, l, r,
    t, b)`` the monitor-aware one (defaults to forwarding)."""

    progress: int = 0
    ocr_alive: bool = False
    err_code: int = 0
    progress_callback: Callable | None = None
    progress_callback2: Callable = _default_progress_func
    cancel: Callable | None = None
    cancel_this: Any = None
    end_time: float | None = None

    def set_deadline_msecs(self, deadline_msecs: int) -> None:
        """ocrclass.h:128-134: end time deadline_msecs from now (<= 0
        clears the deadline)."""
        if deadline_msecs > 0:
            self.end_time = time.monotonic() + deadline_msecs / 1000.0
        else:
            self.end_time = None

    def deadline_exceeded(self) -> bool:
        return self.end_time is not None and time.monotonic() > self.end_time

    # the RecogAllWordsPassN per-word protocol (control.cpp:213-231):
    # returns True when recognition should abort
    def step(
        self, pass_n: int, w: int, total: int,
        box: tuple[int, int, int, int] = (0, 0, 0, 0),
    ) -> bool:
        self.ocr_alive = True
        total = max(1, total)
        if pass_n == 1:
            self.progress = 70 * w // total
        else:
            self.progress = 70 + 30 * w // total
        if self.progress_callback2 is not None:
            l, t, r, b = box
            self.progress_callback2(self, l, r, t, b)
        # the reference passes the TOTAL worklist size, not the running
        # index: (*monitor->cancel)(cancel_this, words->size()),
        # control.cpp:224-225
        return self.deadline_exceeded() or (
            self.cancel is not None and self.cancel(self.cancel_this, total)
        )
