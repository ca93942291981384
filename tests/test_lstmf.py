""".lstmf format tests (DocumentData::SaveDocument imagedata.cpp:
422-431; ImageData::Serialize imagedata.cpp:91-115; TBOX/ICOORD int16
little-endian serialization, points.cpp:47)."""

import struct

import numpy as np
import pytest

from tesseract_spark.lstm.lstmf import (
    ImageSample,
    make_line_samples,
    read_lstmf,
    write_lstmf,
)


def test_roundtrip():
    samples = make_line_samples(["the cat", "sat on"], language="eng")
    back = read_lstmf(write_lstmf(samples))
    assert [s.transcription for s in back] == ["the cat", "sat on"]
    assert [s.page_number for s in back] == [0, 1]
    assert back[0].language == "eng"
    assert back[0].boxes and back[0].box_texts == ["the cat"]
    assert back[0].image_png == samples[0].image_png


def test_byte_layout():
    # uint32 page count; first field of page 0 is the uint32-prefixed
    # filename string (imagedata.cpp:92)
    s = ImageSample(
        imagefilename="x.png", page_number=3, image_png=b"PNGDATA",
        language="eng", transcription="ab", boxes=[(1, 2, 3, 4)],
        box_texts=["ab"], vertical_text=True,
    )
    blob = write_lstmf([s])
    assert struct.unpack_from("<I", blob, 0)[0] == 1
    assert blob[4] == 1  # pointer-vector non-null marker (imagedata.cpp:587)
    assert struct.unpack_from("<I", blob, 5)[0] == 5  # len("x.png")
    assert blob[9:14] == b"x.png"
    assert struct.unpack_from("<i", blob, 14)[0] == 3  # page number
    # the TBOX serializes 4 int16 y-up coords; vertical flag is int8=1
    assert blob.endswith(struct.pack("<4h", 1, 2, 3, 4)
                         + struct.pack("<I", 1)
                         + struct.pack("<I", 2) + b"ab"
                         + struct.pack("<b", 1))


def test_truncation_and_trailing_rejected():
    blob = write_lstmf(make_line_samples(["ab"]))
    with pytest.raises(ValueError, match="truncated"):
        read_lstmf(blob[:-2])
    with pytest.raises(ValueError, match="trailing"):
        read_lstmf(blob + b"\x00")


def test_samples_feed_training_and_eval():
    # the tesstrain loop shape: lstmf -> transcriptions -> train/eval
    from tesseract_spark.functions.fonts import CHARSET
    from tesseract_spark.functions.png_codec import decode_gray_png
    from tesseract_spark.lstm.eval import evaluate_lines_local
    from tesseract_spark.lstm.fixture_model import build_fixture_net
    from tesseract_spark.lstm.training import line_sample

    texts = ["the quick fox", "lazy dog jumps"]
    back = read_lstmf(write_lstmf(make_line_samples(texts)))
    # the packaged PNG decodes to exactly the rendered strip
    for s, t in zip(back, texts):
        img = decode_gray_png(s.image_png)
        assert np.array_equal(img < 128, line_sample(t))
    net = build_fixture_net()
    m = evaluate_lines_local(
        net, [s.transcription for s in back], CHARSET + " ",
        len(CHARSET) + 1,
    )
    assert m["char_error_pct"] == 0.0
