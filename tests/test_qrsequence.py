"""QRSequenceGenerator tests — exact parity with the reference's own
unittest (qrsequence_test.cc:30-37 bit-reversal fixture; the
GeneratesValidSequence permutation property over its parameter list)."""

from tesseract_spark.lstm.qrsequence import QRSequenceGenerator, qr_order


def test_binary_reversed_matches_reference_fixture():
    # qrsequence_test.cc:32: kRangeSize 8 -> {0, 4, 2, 6, 1, 5, 3, 7}
    g = QRSequenceGenerator(8)
    assert [g.binary_reversed(i) for i in range(8)] == [
        0, 4, 2, 6, 1, 5, 3, 7,
    ]


def test_generates_valid_sequence_reference_params():
    # qrsequence_test.cc:70 parameter list (1e6 trimmed to keep the
    # suite fast; 1e4 exercises the same non-power-of-two path)
    for n in (2, 7, 8, 9, 16, 100, 10000):
        assert sorted(qr_order(n)) == list(range(n)), n


def test_low_discrepancy_prefix():
    # the property the order exists for: an epoch prefix spreads over
    # the range (first quarter of N=1024 touches all four quartiles)
    o = qr_order(1024)
    prefix = o[:256]
    for q in range(4):
        assert any(q * 256 <= v < (q + 1) * 256 for v in prefix), q


def test_exhaustion_returns_invalid():
    g = QRSequenceGenerator(8)
    for _ in range(8):
        assert g.get_val() >= 0
    assert g.get_val() == -1
