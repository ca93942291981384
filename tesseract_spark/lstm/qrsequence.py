"""Quasi-random sequence for training-sample ordering.

``QRSequenceGenerator`` (src/ccutil/qrsequence.h:31-80) emits a
permutation of [0, N) by bit-reversing a counter — the van der Corput
low-discrepancy order the reference uses to shuffle training samples
(DocumentCache / trainingsampleset): early prefixes spread uniformly
over the corpus, so a truncated epoch still sees representative data.
That property is exactly what a Spark mini-batch sampler wants when it
takes the first k of an epoch's order.
"""

from __future__ import annotations


class QRSequenceGenerator:
    """Bit-reversal permutation generator (qrsequence.h semantics:
    GetVal returns -1 once the sequence is exhausted)."""

    def __init__(self, n: int) -> None:
        self.n = n
        self.next_num = 0
        # ceil(log2(N)) exactly as the reference computes it
        self.num_bits = (n - 1).bit_length() if n > 1 else 0

    def binary_reversed(self, val: int) -> int:
        out = 0
        for bit_pos in range(self.num_bits, 0, -1):
            out |= val & 0x1
            if bit_pos > 1:
                out <<= 1
            val >>= 1
        return out

    def get_val(self) -> int:
        k_max = 1 << self.num_bits
        if self.next_num >= k_max:
            return -1
        n = self.next_num
        while self.next_num < k_max:
            n = self.binary_reversed(self.next_num)
            self.next_num += 1
            if n < self.n:
                break
        return -1 if self.next_num > k_max else n


def qr_order(n: int) -> list[int]:
    """The full permutation of [0, n) in quasi-random order.

    Calls GetVal exactly n times — the reference's documented contract
    ("Returns kInvalidVal if called more than N times"); its (N+1)th
    call can leak the final skipped counter value instead of -1 for
    non-power-of-two N (qrsequence.h:54 returns n when next_num_ lands
    exactly ON kMaxNaturalNumberValue), so callers must not over-call."""
    g = QRSequenceGenerator(n)
    return [g.get_val() for _ in range(n)]
