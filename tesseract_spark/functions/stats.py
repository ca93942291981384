"""Bucketed-histogram STATS and linear-least-squares LLSQ primitives.

Re-expressions of the reference's two workhorse numeric accumulators:

* ``STATS`` — ``src/ccstruct/statistc.h:30`` / ``statistc.cpp:55-540``:
  an integer-bucketed histogram over a clipped value range with
  mode / mean / sd / fractile / median / peak-finding queries.  The
  textord stages (pitch, gaps, row spacing) all reason over these
  histograms rather than raw samples.
* ``LLSQ`` — ``src/ccstruct/linlsq.cpp:34-258``: moment-accumulator
  least squares (sum x, y, xx, xy, yy) supporting the ordinary
  y-on-x fit (``m``/``c``/``rms``/``pearson``) and the total-least-
  squares direction fit (``vector_fit`` via Pearson's 1901 closed
  form ``theta = atan2(2*cov, var_x - var_y) / 2``) used by baseline
  and tab-vector fitting.

These are driver/executor-side helpers for small per-group sample
sets (a row's blobs, a column's tab points) inside Arrow-batched
UDFs; corpus-scale aggregation stays in Spark SQL expressions.
Fixture parity: ``unittest/stats_test.cc`` and ``unittest/linlsq_test.cc``
are ported in ``tests/test_stats_llsq.py``.
"""

from __future__ import annotations

import math
from typing import List, Tuple

__all__ = ["STATS", "LLSQ"]


def _clip(value: int, lo: int, hi: int) -> int:
    return lo if value < lo else hi if value > hi else value


class STATS:
    """Integer-bucketed histogram (statistc.cpp:55-150).

    Values added outside ``[rangemin, rangemax]`` are clipped into the
    range, exactly like the reference's ``ClipToRange`` in
    ``STATS::add`` (statistc.cpp:99-106).
    """

    def __init__(self, rangemin: int = 0, rangemax: int = 0) -> None:
        self.rangemin = 0
        self.rangemax = 0
        self.buckets: List[int] = []
        self.total_count = 0
        self.set_range(rangemin, rangemax)

    def set_range(self, rangemin: int, rangemax: int) -> bool:
        # statistc.cpp:59-71 — inclusive range, 1 + max - min buckets.
        if rangemax < rangemin:
            return False
        self.rangemin = int(rangemin)
        self.rangemax = int(rangemax)
        self.buckets = [0] * (1 + self.rangemax - self.rangemin)
        self.total_count = 0
        return True

    def clear(self) -> None:
        self.buckets = [0] * len(self.buckets)
        self.total_count = 0

    def add(self, value: int, count: int = 1) -> None:
        if not self.buckets:
            return
        value = _clip(int(value), self.rangemin, self.rangemax)
        self.buckets[value - self.rangemin] += count
        self.total_count += count

    def get_total(self) -> int:
        return self.total_count

    def pile_count(self, value: int) -> int:
        if not self.buckets:
            return 0
        value = _clip(int(value), self.rangemin, self.rangemax)
        return self.buckets[value - self.rangemin]

    def mode(self) -> int:
        # statistc.cpp:112-125: best starts at bucket 0, then the scan
        # walks DOWN from the top with strict > — so bucket 0 wins only
        # when nothing beats it, and otherwise the HIGHEST tied bucket
        # wins (the first maximum the descending walk meets).
        if not self.buckets:
            return self.rangemin
        best = self.buckets[0]
        best_index = 0
        for index in range(len(self.buckets) - 1, 0, -1):
            if self.buckets[index] > best:
                best = self.buckets[index]
                best_index = index
        return best_index + self.rangemin

    def mean(self) -> float:
        if not self.buckets or self.total_count <= 0:
            return float(self.rangemin)
        total = sum(i * n for i, n in enumerate(self.buckets))
        return total / self.total_count + self.rangemin

    def sd(self) -> float:
        # statistc.cpp:148-165.
        if not self.buckets or self.total_count <= 0:
            return 0.0
        s = sum(i * n for i, n in enumerate(self.buckets))
        sq = sum(float(i) * i * n for i, n in enumerate(self.buckets))
        variance = s / self.total_count
        variance = sq / self.total_count - variance * variance
        return math.sqrt(variance) if variance > 0.0 else 0.0

    def ile(self, frac: float) -> float:
        # statistc.cpp:172-196 — fractional position within the bucket
        # that crosses the target cumulative count.
        if not self.buckets or self.total_count == 0:
            return float(self.rangemin)
        target = frac * self.total_count
        target = min(max(target, 1.0), float(self.total_count))
        cum = 0
        index = 0
        while index <= self.rangemax - self.rangemin and cum < target:
            cum += self.buckets[index]
            index += 1
        if index > 0:
            return self.rangemin + index - (cum - target) / self.buckets[index - 1]
        return float(self.rangemin)

    def min_bucket(self) -> int:
        if not self.buckets or self.total_count == 0:
            return self.rangemin
        for i, n in enumerate(self.buckets):
            if n != 0:
                return self.rangemin + i
        return self.rangemin

    def max_bucket(self) -> int:
        if not self.buckets or self.total_count == 0:
            return self.rangemin
        for i in range(len(self.buckets) - 1, -1, -1):
            if self.buckets[i] != 0:
                return self.rangemin + i
        return self.rangemin

    def median(self) -> float:
        # statistc.cpp:241-263 — when ile(0.5) lands in an empty pile,
        # midpoint of the surrounding non-empty piles (the 6,6,13,14
        # example in the reference comment).
        if not self.buckets:
            return float(self.rangemin)
        med = self.ile(0.5)
        median_pile = int(math.floor(med))
        if self.total_count > 1 and self.pile_count(median_pile) == 0:
            min_pile = median_pile
            while self.pile_count(min_pile) == 0:
                min_pile -= 1
            max_pile = median_pile
            while self.pile_count(max_pile) == 0:
                max_pile += 1
            med = (min_pile + max_pile) / 2.0
        return med

    def top_n_modes(self, max_modes: int) -> List[Tuple[float, int]]:
        """Whole-peak mode finding (statistc.cpp:480-540).

        Returns ``[(peak_mean, peak_total_count), ...]`` sorted by
        decreasing total count.  Each peak greedily absorbs adjacent
        buckets while counts are non-increasing away from the seed
        (``GatherPeak``, statistc.cpp:455-470).
        """
        if max_modes <= 0:
            return []
        src_count = 1 + self.rangemax - self.rangemin
        used = [0] * src_count
        modes: List[Tuple[float, int]] = []
        least_count = 1

        def gather(index: int, prev_count: int, total: List[float]) -> Tuple[bool, int]:
            pile = self.buckets[index] - used[index]
            if pile <= prev_count and pile > 0:
                total[0] += pile            # total_count
                total[1] += index * pile    # total_value
                used[index] = self.buckets[index]
                return True, pile
            return False, prev_count

        while True:
            max_count = 0
            max_index = 0
            for i in range(src_count):
                pile = self.buckets[i] - used[i]
                if pile > max_count:
                    max_count = pile
                    max_index = i
            if max_count <= 0:
                break
            used[max_index] = max_count
            total = [float(max_count), float(max_index * max_count)]
            prev = max_count
            offset = 1
            while max_index + offset < src_count:
                ok, prev = gather(max_index + offset, prev, total)
                if not ok:
                    break
                offset += 1
            prev = self.buckets[max_index]
            offset = 1
            while max_index - offset >= 0:
                ok, prev = gather(max_index - offset, prev, total)
                if not ok:
                    break
                offset += 1
            total_count = int(total[0])
            if total_count > least_count or len(modes) < max_modes:
                if len(modes) == max_modes:
                    modes = modes[: max_modes - 1]
                target = 0
                while target < len(modes) and modes[target][1] >= total_count:
                    target += 1
                peak_mean = total[1] / total_count + self.rangemin
                modes.insert(target, (peak_mean, total_count))
                least_count = modes[-1][1]
        return modes


class LLSQ:
    """Moment-accumulator least squares (linlsq.cpp:34-258)."""

    def __init__(self) -> None:
        self.total_weight = 0.0
        self.sigx = 0.0
        self.sigy = 0.0
        self.sigxx = 0.0
        self.sigxy = 0.0
        self.sigyy = 0.0

    def clear(self) -> None:
        self.__init__()

    def add(self, x: float, y: float, weight: float = 1.0) -> None:
        self.total_weight += weight
        self.sigx += x * weight
        self.sigy += y * weight
        self.sigxx += x * x * weight
        self.sigxy += x * y * weight
        self.sigyy += y * y * weight

    def add_llsq(self, other: "LLSQ") -> None:
        self.total_weight += other.total_weight
        self.sigx += other.sigx
        self.sigy += other.sigy
        self.sigxx += other.sigxx
        self.sigxy += other.sigxy
        self.sigyy += other.sigyy

    def remove(self, x: float, y: float) -> None:
        if self.total_weight <= 0.0:
            raise ValueError("LLSQ::remove on empty accumulator")
        self.total_weight -= 1.0
        self.sigx -= x
        self.sigy -= y
        self.sigxx -= x * x
        self.sigxy -= x * y
        self.sigyy -= y * y

    def count(self) -> int:
        return int(self.total_weight + 0.5)

    def covariance(self) -> float:
        if self.total_weight > 0.0:
            return (self.sigxy - self.sigx * self.sigy / self.total_weight) / self.total_weight
        return 0.0

    def x_variance(self) -> float:
        if self.total_weight > 0.0:
            return (self.sigxx - self.sigx * self.sigx / self.total_weight) / self.total_weight
        return 0.0

    def y_variance(self) -> float:
        if self.total_weight > 0.0:
            return (self.sigyy - self.sigy * self.sigy / self.total_weight) / self.total_weight
        return 0.0

    def m(self) -> float:
        x_var = self.x_variance()
        return self.covariance() / x_var if x_var != 0.0 else 0.0

    def c(self, m: float) -> float:
        if self.total_weight > 0.0:
            return (self.sigy - m * self.sigx) / self.total_weight
        return 0.0

    def rms(self, m: float, c: float) -> float:
        # linlsq.cpp:130-147 — closed form over the moments.
        if self.total_weight <= 0:
            return 0.0
        error = (
            self.sigyy
            + m * (m * self.sigxx + 2 * (c * self.sigx - self.sigxy))
            + c * (self.total_weight * c - 2 * self.sigy)
        )
        return math.sqrt(error / self.total_weight) if error >= 0 else 0.0

    def pearson(self) -> float:
        covar = self.covariance()
        if covar != 0.0:
            var_product = self.x_variance() * self.y_variance()
            if var_product > 0.0:
                return covar / math.sqrt(var_product)
        return 0.0

    def mean_point(self) -> Tuple[float, float]:
        if self.total_weight > 0.0:
            return (self.sigx / self.total_weight, self.sigy / self.total_weight)
        return (0.0, 0.0)

    def rms_orth(self, dir_x: float, dir_y: float) -> float:
        # linlsq.cpp:195-200: v = normalised perpendicular of dir
        # (points.h operator! rotates 90 deg anticlockwise: (-y, x)).
        vx, vy = -dir_y, dir_x
        norm = math.hypot(vx, vy)
        if norm > 0:
            vx, vy = vx / norm, vy / norm
        # the quadratic form can round a hair below zero on degenerate
        # (duplicate-point) inputs — clamp before the sqrt
        form = (
            self.x_variance() * vx * vx
            + 2 * self.covariance() * vx * vy
            + self.y_variance() * vy * vy
        )
        return math.sqrt(max(0.0, form))

    def vector_fit(self) -> Tuple[float, float]:
        # linlsq.cpp:250-257 — Pearson 1901: the TLS direction is
        # theta = atan2(2*cov, var_x - var_y) / 2.
        theta = 0.5 * math.atan2(
            2.0 * self.covariance(), self.x_variance() - self.y_variance()
        )
        return (math.cos(theta), math.sin(theta))
