"""SquishedDawg binary format tests (src/dict/dawg.h:79-113;
read/write_squished_dawg dawg.cpp:340-552; build_node_map dawg.cpp:446)
plus the wordlist2dawg / dawg2wordlist tool pair and the traineddata
dictionary sections (TESSDATA_LSTM_*_DAWG)."""

import struct

import numpy as np
import pytest

from tesseract_spark.lstm.dawg import (
    DAWG_MAGIC,
    MARKER_FLAG,
    NUM_FLAG_BITS,
    WERD_END_FLAG,
    Dawg,
    _flag_start_bit,
    dawg2wordlist,
    read_squished_dawg,
    wordlist2dawg,
    write_squished_dawg,
)

CS = "abcdefghijklmnopqrstuvwxyz"
WORDS = ["cat", "car", "cart", "dog", "do", "dot", "catalog", "a"]


def test_ceillog2_matches_reference():
    # CeilLog2 is the bit length of the value itself (dawg.cpp:120-127):
    # CeilLog2(64) = 7, CeilLog2(63) = 6
    assert _flag_start_bit(1) == 1
    assert _flag_start_bit(63) == 6
    assert _flag_start_bit(64) == 7
    assert _flag_start_bit(111) == 7


def test_header_layout():
    blob = wordlist2dawg(WORDS, CS)
    magic, ucs, num_edges = struct.unpack_from("<hIi", blob, 0)
    assert magic == DAWG_MAGIC == 42
    assert ucs == len(CS)
    assert num_edges > 0
    assert len(blob) == 10 + 8 * num_edges


def test_single_word_exact_bytes():
    # charset "ab" -> unicharset_size 2 -> flag_start_bit 2; the one
    # edge is letter 'a'(0), MARKER|WERD_END, next_node 0 (terminal)
    blob = wordlist2dawg(["a"], "ab")
    expect = struct.pack("<hIi", 42, 2, 1) + struct.pack(
        "<Q", (MARKER_FLAG | WERD_END_FLAG) << 2
    )
    assert blob == expect


def test_roundtrip_wordlist():
    assert dawg2wordlist(wordlist2dawg(WORDS, CS), CS) == sorted(set(WORDS))


def test_roundtrip_probe_semantics():
    d = read_squished_dawg(wordlist2dawg(WORDS, CS), CS)
    assert d.accepts("cart") and d.accepts("do") and d.accepts("catalog")
    assert not d.accepts("ca") and not d.accepts("cars")


def test_edge_runs_marker_terminated_and_in_bounds():
    # the reference's read validation (dawg.cpp:393-430): every forward
    # run ends with MARKER and every next_node lands on a run start
    blob = wordlist2dawg(WORDS, CS)
    _m, ucs, n = struct.unpack_from("<hIi", blob, 0)
    fsb = _flag_start_bit(ucs)
    recs = np.frombuffer(blob, dtype="<u8", count=n, offset=10)
    flags = (recs >> fsb) & 7
    nexts = recs >> (fsb + NUM_FLAG_BITS)
    starts = {0}
    i = 0
    while i < n:
        while not (int(flags[i]) & MARKER_FLAG):
            i += 1
            assert i < n, "unterminated run"
        i += 1
        starts.add(i)
    assert all(int(t) == 0 or int(t) in starts for t in nexts)


def test_bad_magic_and_truncation_rejected():
    blob = wordlist2dawg(WORDS, CS)
    with pytest.raises(ValueError, match="magic"):
        read_squished_dawg(b"\x00" + blob[1:], CS)
    with pytest.raises(ValueError, match="remaining data"):
        read_squished_dawg(blob[:-8], CS)


def test_suffix_sharing_survives_serialization():
    # "sing"/"ring"/"king" share the squished "ing" chain: 6 edges, not
    # the trie's 12 — and the file carries exactly the squished count
    d = Dawg(CS, ["sing", "ring", "king"])
    assert d.n_edges == 6
    blob = write_squished_dawg(d)
    _m, _u, n = struct.unpack_from("<hIi", blob, 0)
    assert n == 6
    assert dawg2wordlist(blob, CS) == ["king", "ring", "sing"]


def test_oversized_unicharset_widens_letter_field():
    # dawgs inside traineddata are sized to the LSTM unicharset, which
    # can exceed the dawg's own alphabet
    d = Dawg(CS, WORDS)
    blob = write_squished_dawg(d, unicharset_size=111)
    _m, ucs, _n = struct.unpack_from("<hIi", blob, 0)
    assert ucs == 111
    back = read_squished_dawg(blob, CS + " " * 85)
    assert back.accepts("cart")


def test_traineddata_dawg_sections_roundtrip():
    from tesseract_spark.lstm.fixture_model import get_vgsl_model
    from tesseract_spark.lstm.tessdata import (
        TESSDATA_LSTM_SYSTEM_DAWG,
        load_traineddata,
        read_container,
        save_traineddata,
    )

    import dataclasses

    # replace, not mutate: get_vgsl_model() is a shared singleton and a
    # dawg left on it would shift every other test's container offsets
    base = get_vgsl_model()
    cs = base.charset
    words = [w for w in ("the", "cat", "sat") if all(c in cs for c in w)]
    assert words, "fixture charset lost its letters"
    model = dataclasses.replace(base, word_dawg=Dawg(cs, words))
    blob = save_traineddata(model)
    assert TESSDATA_LSTM_SYSTEM_DAWG in read_container(blob)
    back = load_traineddata(blob)
    assert back.word_dawg is not None
    for w in words:
        assert back.word_dawg.accepts(w)
    assert not back.word_dawg.accepts("zzz")
    assert back.number_dawg is None and back.punc_dawg is None


def test_empty_dawg_write_rejected_and_section_omitted():
    # the squished format cannot represent zero edges (the reference's
    # reader rejects num_edges == 0, dawg.cpp:370): write fails loudly,
    # and save_traineddata omits an empty dictionary section
    import dataclasses

    from tesseract_spark.lstm.fixture_model import get_vgsl_model
    from tesseract_spark.lstm.tessdata import (
        TESSDATA_LSTM_SYSTEM_DAWG,
        load_traineddata,
        read_container,
        save_traineddata,
    )

    with pytest.raises(ValueError, match="empty dawg"):
        write_squished_dawg(Dawg("ab", []))
    base = get_vgsl_model()
    model = dataclasses.replace(base, word_dawg=Dawg(base.charset, []))
    blob = save_traineddata(model)
    assert TESSDATA_LSTM_SYSTEM_DAWG not in read_container(blob)
    assert load_traineddata(blob).word_dawg is None
