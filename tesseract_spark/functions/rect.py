"""TBOX — the reference's integer bounding box (src/ccstruct/rect.h:36-520).

Bottom-left/top-right inclusive-exclusive integer box with the exact
overlap predicates and overlap-fraction formulas the layout stages use
(pair scoring in tab-finding, partition merging, box applying).  The
Spark operators express these same formulas as column expressions over
(x0, y0, x1, y1) span columns; this class is the executor-side scalar
form used inside Arrow-batched UDFs and is the parity anchor for
``unittest/rect_test.cc`` (ported in ``tests/test_stats_llsq.py``).

Coordinate convention matches the reference: y grows upward, ``bottom``
< ``top``; a box is *null* when ``left >= right`` or ``top <= bottom``
(rect.h:60-62), and a null box has width/height/area 0.
"""

from __future__ import annotations

__all__ = ["TBOX"]


class TBOX:
    def __init__(self, left: int = 0, bottom: int = 0, right: int = 0, top: int = 0) -> None:
        self.left = int(left)
        self.bottom = int(bottom)
        self.right = int(right)
        self.top = int(top)

    def __repr__(self) -> str:
        return f"TBOX({self.left},{self.bottom},{self.right},{self.top})"

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, TBOX):
            return NotImplemented
        return (self.left, self.bottom, self.right, self.top) == (
            other.left, other.bottom, other.right, other.top)

    def null_box(self) -> bool:
        # rect.h:60-62.
        return self.left >= self.right or self.top <= self.bottom

    def width(self) -> int:
        return self.right - self.left if not self.null_box() else 0

    def height(self) -> int:
        return self.top - self.bottom if not self.null_box() else 0

    def area(self) -> int:
        return self.width() * self.height() if not self.null_box() else 0

    def overlap(self, box: "TBOX") -> bool:
        # rect.h:370-374 — closed-interval touch counts as overlap.
        return (
            box.left <= self.right
            and box.right >= self.left
            and box.bottom <= self.top
            and box.top >= self.bottom
        )

    def intersection(self, box: "TBOX") -> "TBOX":
        # rect.cpp:88-128 — the shared box, or a deliberately-null
        # (MAX, MAX, -MAX, -MAX)-style box when there is no overlap.
        if self.overlap(box):
            return TBOX(
                max(self.left, box.left),
                max(self.bottom, box.bottom),
                min(self.right, box.right),
                min(self.top, box.top),
            )
        return TBOX(1 << 15, 1 << 15, -(1 << 15), -(1 << 15))

    def bounding_union(self, box: "TBOX") -> "TBOX":
        return TBOX(
            min(self.left, box.left),
            min(self.bottom, box.bottom),
            max(self.right, box.right),
            max(self.top, box.top),
        )

    def contains(self, box: "TBOX") -> bool:
        return (
            self.left <= box.left
            and self.bottom <= box.bottom
            and self.right >= box.right
            and self.top >= box.top
        )

    def overlap_fraction(self, box: "TBOX") -> float:
        # rect.h:396-401 — fraction of THIS box's area covered by other.
        if self.area():
            return self.intersection(box).area() * 1.0 / self.area()
        return 0.0

    def major_overlap(self, box: "TBOX") -> bool:
        # rect.h major_overlap: on EACH axis, twice the overlap must
        # reach the narrower box's extent.
        ox = min(self.right, box.right) - max(self.left, box.left)
        if 2 * ox < min(self.width(), box.width()):
            return False
        oy = min(self.top, box.top) - max(self.bottom, box.bottom)
        return 2 * oy >= min(self.height(), box.height())

    def x_overlap(self, box: "TBOX") -> bool:
        return box.left <= self.right and box.right >= self.left

    def y_overlap(self, box: "TBOX") -> bool:
        return box.bottom <= self.top and box.top >= self.bottom

    def major_x_overlap(self, box: "TBOX") -> bool:
        # rect.h:417-426 — overlap more than half the narrower width.
        overlap = box.width()
        if self.left > box.left:
            overlap -= self.left - box.left
        if self.right < box.right:
            overlap -= box.right - self.right
        return overlap >= box.width() // 2 or overlap >= self.width() // 2

    def major_y_overlap(self, box: "TBOX") -> bool:
        overlap = box.height()
        if self.bottom > box.bottom:
            overlap -= self.bottom - box.bottom
        if self.top < box.top:
            overlap -= box.top - self.top
        return overlap >= box.height() // 2 or overlap >= self.height() // 2

    def x_overlap_fraction(self, other: "TBOX") -> float:
        # rect.h:463-477 — zero-width THIS counts 1.0 when inside the
        # other's x-span (closed interval), else 0.0.
        low = max(self.left, other.left)
        high = min(self.right, other.right)
        width = self.right - self.left
        if width == 0:
            x = self.left
            return 1.0 if other.left <= x <= other.right else 0.0
        return max(0.0, (high - low) / width)

    def y_overlap_fraction(self, other: "TBOX") -> float:
        low = max(self.bottom, other.bottom)
        high = min(self.top, other.top)
        height = self.top - self.bottom
        if height == 0:
            y = self.bottom
            return 1.0 if other.bottom <= y <= other.top else 0.0
        return max(0.0, (high - low) / height)

    def x_almost_equal(self, box: "TBOX", tolerance: int) -> bool:
        return (
            abs(self.left - box.left) <= tolerance
            and abs(self.right - box.right) <= tolerance
        )

    def almost_equal(self, box: "TBOX", tolerance: int) -> bool:
        return (
            abs(self.left - box.left) <= tolerance
            and abs(self.right - box.right) <= tolerance
            and abs(self.top - box.top) <= tolerance
            and abs(self.bottom - box.bottom) <= tolerance
        )
