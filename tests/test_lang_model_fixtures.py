"""Ports of unittest/lang_model_test.cc and params_model_test.cc.

The sandbox carries no langdata/ or testdata/ inputs, so the wordlist
and params-model files are synthesized; the assertions are the
reference tests' own invariants: CombineLangModel output initializes
an encoder whose string encodings do NOT change when a character is
appended to the unicharset, and a params model file round-trips
through save/load into an equivalent model."""

import string

from tesseract_spark.lstm.langmodel import FEATURE_NAMES, ParamsModel
from tesseract_spark.lstm.tessdata import Unicharset, combine_lang_model, read_lang_model

K_TEST_STRING = "Simple ASCII string to encode !@#$%&"
K_TEST_STRING_RUPEES = "ASCII string with Rupee symbol ₹"


def _encode(ucs, recoder, text: str) -> list[int]:
    """LSTMTrainer::EncodeString analogue: unichar ids through the
    recoder's code sequences."""
    labels = []
    for ch in text:
        uid = ucs.id_of(" " if ch.isspace() else ch)
        labels.extend(recoder.encode_unichar(uid))
    return labels


def test_add_a_character(tmp_path):
    """lang_model_test.cc:33-111 AddACharacter: appending a unichar
    must not change the encoding of strings that don't use it."""
    charset = " " + string.ascii_letters + string.digits + "!@#$%&"
    unicharset = Unicharset.from_charset(charset)
    words = ["Simple", "string", "to", "encode"]
    puncs = ["!", "@", "#"]
    numbers = ["0", "1", "2"]
    blob1 = combine_lang_model(unicharset, words, puncs, numbers, version="TestVersion")
    (tmp_path / "eng.traineddata").write_bytes(blob1)
    ucs1, rec1, dawgs1 = read_lang_model((tmp_path / "eng.traineddata").read_bytes())
    labels1 = _encode(ucs1, rec1, K_TEST_STRING)
    assert labels1

    # Add a new character and regenerate.
    size_before = len(unicharset.chars)
    unicharset.chars.append("₹")
    unicharset.properties.append(0)
    assert len(unicharset.chars) == size_before + 1
    blob2 = combine_lang_model(unicharset, words, puncs, numbers, version="TestVersion")
    (tmp_path / "extended.traineddata").write_bytes(blob2)
    ucs2, rec2, dawgs2 = read_lang_model((tmp_path / "extended.traineddata").read_bytes())
    labels2 = _encode(ucs2, rec2, K_TEST_STRING)
    # The famous assertion: encodings are identical.
    assert labels2 == labels1
    # The new character only encodes with the extended model.
    assert _encode(ucs2, rec2, K_TEST_STRING_RUPEES)
    try:
        _encode(ucs1, rec1, K_TEST_STRING_RUPEES)
        encoded_in_old = True
    except ValueError:
        encoded_in_old = False
    assert not encoded_in_old


def test_params_model_roundtrip(tmp_path):
    """params_model_test.cc:50-74: load, save, reload, equivalent."""
    # Synthesize an eng.params_model covering every feature.
    weights = [round(0.01 * (i + 1), 4) for i in range(len(FEATURE_NAMES))]
    orig_file = tmp_path / "eng.params_model"
    orig_file.write_text("".join(f"{n} {w}\n" for n, w in zip(FEATURE_NAMES, weights)))

    orig_model = ParamsModel.loads(orig_file.read_text())
    assert orig_model.initialized
    out_file = tmp_path / "out.params_model"
    out_file.write_text(orig_model.dumps())
    duplicate_model = ParamsModel.loads(out_file.read_text())
    assert duplicate_model.initialized
    # Equivalent (params_model.cpp Equivalent: same weights within eps).
    assert all(
        abs(a - b) < 1e-8 for a, b in zip(orig_model.weights, duplicate_model.weights)
    )


def test_params_model_incomplete_file_uninitialized(tmp_path):
    """LoadFromFp rejects a file missing features (params_model.cpp:
    109-140): the model stays uninitialized."""
    partial = "".join(f"{n} 0.5\n" for n in FEATURE_NAMES[:3])
    model = ParamsModel.loads(partial)
    assert not model.initialized
