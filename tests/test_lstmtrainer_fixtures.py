"""Port of unittest/lstmtrainer_test.cc (EncodesEng / EncodesKan /
EncodesKor / MapCoder) over synthesized charsets — the sandbox has no
testdata traineddata, but the assertions are the reference's own:
strings round-trip through encode/decode with and without recoding,
and MapRecoder translates one model's labels into another's."""

from tesseract_spark.lstm.refcharset import RefUnicharset
from tesseract_spark.lstm.tessdata import (
    UnicharCompress,
    map_recoder,
    trainer_decode_labels,
    trainer_encode_string,
)

UNICHAR_BROKEN = 2


def make_trainer(charset_text: str):
    """SetupTrainer's charset half: unicharset + recoder (recode=True)
    or pass-through (recode=False)."""
    ucs = RefUnicharset()
    # Multi-codepoint grapheme entries split on '|'.
    for entry in charset_text.split("|"):
        if entry:
            ucs.unichar_insert(entry)
    return ucs


def _codec(ucs, recode: bool):
    if recode:
        null_char = UNICHAR_BROKEN if ucs.has_special_codes() else len(ucs)
        rec = UnicharCompress.compute_encoding(ucs, null_char)
        null_code = rec.encode_unichar(null_char)[0]
        return rec, null_code
    rec = UnicharCompress.pass_through(len(ucs) + 1)
    return None, len(ucs)  # pass-through: labels are unichar ids


def encode_decode(ucs, text: str, recode: bool) -> str:
    """TestEncodeDecode (lstm_test.h:162-172)."""
    rec, null_char = _codec(ucs, recode)
    labels = trainer_encode_string(ucs, text, rec, null_char)
    assert labels is not None
    return trainer_decode_labels(ucs, labels, rec, null_char)


def encode_decode_both(charset_text: str, text: str):
    """TestEncodeDecodeBoth (lstm_test.h:174-177)."""
    ucs = make_trainer(charset_text)
    for recode in (False, True):
        assert encode_decode(ucs, text, recode) == text


def test_encodes_eng():
    """lstmtrainer_test.cc:18-20."""
    charset = "|".join(
        " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789'!:"
    )
    encode_decode_both(charset, "The quick brown 'fox' jumps over: the lazy dog!")


def test_encodes_kan():
    """lstmtrainer_test.cc:22-24: Kannada clusters (multi-codepoint
    unichars through the Indic direct encoding)."""
    text = "ಫ್ರಬ್ರವರಿ ತತ್ವಾಂಶಗಳೆಂದರೆ ಮತ್ತು ಜೊತೆಗೆ ಕ್ರಮವನ್ನು"
    # The unicharset entries are the grapheme clusters of the text,
    # as a kan.unicharset would carry them.
    import tesseract_spark.functions.graphemes as G

    clusters = set()
    for word in text.split(" "):
        ok, segs = G.validate_clean_and_segment(G.COMBINED, [ord(c) for c in word])
        assert ok
        clusters.update("".join(chr(c) for c in seg) for seg in segs)
    # A real kan.unicharset carries hundreds of clusters over the same
    # few dozen codepoints; pad with synthetic conjuncts so the direct
    # code space stays (far) smaller than the unicharset, as the
    # ComputeEncoding guard requires.
    consonants = [chr(c) for c in range(0x0C95, 0x0C95 + 20)]
    for c1 in consonants:
        for c2 in consonants:
            clusters.add(c1 + "್" + c2)
    charset = " |" + "|".join(sorted(clusters))
    encode_decode_both(charset, text)


def test_encodes_kor():
    """lstmtrainer_test.cc:26-28: Hangul syllables through the Jamo
    decomposition."""
    text = "이는 것으로 다시 넣을 수는 있지만 선택의 의미는"
    charset = " |" + "|".join(sorted(set(text) - {" "}))
    encode_decode_both(charset, text)


def test_map_coder():
    """lstmtrainer_test.cc:30-65 MapCoder: fra labels mapped onto the
    deu coder decode correctly under the deu model."""
    common = " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ':!"
    # Different NUMBERS of extra characters inserted first, so the
    # common characters land on different code values in the two
    # coders (as fra/deu genuinely differ).
    fra = make_trainer("|".join("éàèçùâê" + common))
    deu = make_trainer("|".join("äöüß" + common))
    k_test_str = "The quick brown 'fox' jumps over: the lazy dog!"
    deu_rec, deu_null = _codec(deu, True)
    fra_rec, fra_null = _codec(fra, True)
    deu_labels = trainer_encode_string(deu, k_test_str, deu_rec, deu_null)
    assert deu_labels is not None
    # The french trainer cannot decode them correctly.
    bad_str = trainer_decode_labels(fra, deu_labels, fra_rec, fra_null)
    assert bad_str != k_test_str
    # Encode as fra, map through MapRecoder, decode as deu.
    fra_labels = trainer_encode_string(fra, k_test_str, fra_rec, fra_null)
    assert fra_labels is not None
    mapping = map_recoder(fra, fra_rec, deu, deu_rec)
    mapped = []
    for label in fra_labels:
        assert mapping[label] != -1
        mapped.append(mapping[label])
    ok_str = trainer_decode_labels(deu, mapped, deu_rec, deu_null)
    assert ok_str == k_test_str
