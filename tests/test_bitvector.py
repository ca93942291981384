"""Port of unittest/bitvector_test.cc (prime sieve set/reset/copy/IO,
SetAll, and the NextSetBit/NumSetBits byte-pattern sweeps)."""

import math

from tesseract_spark.lstm.featuremap import BitVector

K_PRIME_LIMIT = 1000


def compute_primes() -> BitVector:
    bv = BitVector()
    bv.init(K_PRIME_LIMIT + 1)
    assert all(not bv[i] for i in range(bv.size()))
    bv.set_bit(2)
    for i in range(3, K_PRIME_LIMIT + 1, 2):
        bv.set_value(i, True)
    factor_limit = int(math.sqrt(1.0 + K_PRIME_LIMIT))
    for f in range(3, factor_limit + 1, 2):
        if bv.at(f):
            m = 2
            while m * f <= K_PRIME_LIMIT:
                bv.reset_bit(f * m)
                m += 1
    return bv


def check_primes(bv: BitVector) -> None:
    total = sum(1 for i in range(K_PRIME_LIMIT + 1) if bv[i])
    assert total == 168  # primes under 1000
    assert bv[997] and not bv[998] and not bv[999]


def test_primes_with_copy_and_io():
    bv = compute_primes()
    check_primes(bv)
    check_primes(bv.copy())
    check_primes(BitVector.deserialize(bv.serialize()))


def test_set_all():
    bv = BitVector(42)
    assert all(not bv[i] for i in range(42))
    bv.set_all_true()
    assert all(bv[i] for i in range(42))
    bv.set_all_false()
    assert all(not bv[i] for i in range(42))


def _set_bit_pattern(start_byte, end_byte, spacing):
    bv = BitVector()
    bv.init((end_byte - start_byte) * 8 * spacing)
    for byte_value in range(start_byte, end_byte):
        for bit in range(8):
            if byte_value & (1 << bit):
                bv.set_bit((byte_value - start_byte) * 8 * spacing + bit)
    return bv


def _expect_correct_bits(bv: BitVector):
    bit_index = -1
    prev = -1
    tested = 0
    while True:
        bit_index = bv.next_set_bit(bit_index)
        if bit_index < 0:
            break
        assert bit_index < bv.size()
        for i in range(prev + 1, bit_index):
            assert not bv[i], (i, prev)
        assert bv[bit_index]
        tested += 1
        prev = bit_index
    for i in range(prev + 1, bv.size()):
        assert not bv[i]
    assert tested == bv.num_set_bits()


def test_next_set_bit():
    for spacing in range(1, 6):
        _expect_correct_bits(_set_bit_pattern(0, 256, spacing))


def test_num_set_bits():
    for byte in range(256):
        _expect_correct_bits(_set_bit_pattern(byte, byte + 1, 1))
