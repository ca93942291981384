"""Multimodal binary-column plumbing: codecs, DSP, resize, Spark path."""

import numpy as np

from tesseract_spark.functions.multimodal import (
    audio_features,
    decode_audio,
    decode_video,
    encode_audio,
    encode_video,
    make_fixture_audio,
    make_fixture_video,
    resize_image,
    sample_frames,
)


def test_audio_codec_roundtrip():
    rng = np.random.default_rng(1)
    s = rng.integers(-30000, 30000, 1234).astype(np.int16)
    rate, back = decode_audio(encode_audio(s, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(back, s)


def test_audio_features_square_wave():
    blob = make_fixture_audio(7)  # freq 57 Hz, h = 8000 // 114 = 70
    rate, samples = decode_audio(blob)
    f = audio_features(samples, rate)
    assert f["n_samples"] == 4000 and f["duration_s"] == 0.5
    assert f["rms"] == 1000.0
    assert f["zero_crossings"] == 3999 // 70


def test_video_codec_and_sampling():
    frames = [np.full((4, 6), v, dtype=np.uint8) for v in (3, 9, 27, 81)]
    back = decode_video(encode_video(frames))
    assert len(back) == 4
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)
    sampled = sample_frames(back, stride=2)
    assert [i for i, _f in sampled] == [0, 2]
    n = 2 + 13 % 6  # fixture frame count rule
    assert len(decode_video(make_fixture_video(13))) == n


def test_resize_image_nearest():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    up = resize_image(img, 16, 16)
    assert up.shape == (16, 16)
    np.testing.assert_array_equal(up[::2, ::2], img)
    down = resize_image(img, 4, 4)
    np.testing.assert_array_equal(down, img[::2, ::2])


def test_spark_media_resize_plumbing(spark, corpus):
    """Real PNG media -> decode -> resize -> re-encode inside one
    mapInPandas: the image half of the multimodal path end to end."""
    import pandas as pd
    from pyspark.sql import functions as F

    media = spark.read.parquet(corpus["media"])

    def udf(batches):
        from tesseract_spark.functions.png_codec import (
            decode_gray_png,
            encode_gray_png,
        )

        for pdf in batches:
            rows = []
            for ref, png in zip(pdf["media_ref"], pdf["png"]):
                img = decode_gray_png(bytes(png))
                thumb = resize_image(img, 16, 16)
                rows.append(
                    {
                        "media_ref": ref,
                        "thumb_png": encode_gray_png(thumb),
                        "h": thumb.shape[0],
                        "w": thumb.shape[1],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "thumb_png", "h", "w"]
            )

    out = media.mapInPandas(
        udf, schema="media_ref string, thumb_png binary, h int, w int"
    )
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(r.h == 16 and r.w == 16 for r in rows)
    from tesseract_spark.functions.png_codec import decode_gray_png

    t = decode_gray_png(bytes(rows[0].thumb_png))
    assert t.shape == (16, 16)


def test_fixture_image_png_and_features():
    """make_fixture_image emits a REAL PNG whose decoded features match
    the analytic geometry the SQL oracle replays (image_features)."""
    from tesseract_spark.functions.multimodal import make_fixture_image
    from tesseract_spark.functions.png_codec import decode_gray_png

    for doc_id in (0, 7, 13, 123, 499):
        img = decode_gray_png(make_fixture_image(doc_id))
        h, w = 24 + (doc_id % 8) * 4, 48 + (doc_id % 16) * 4
        assert img.shape == (h, w)
        h_ink, w_ink = h // 2, w // 3 + doc_id % 7
        assert int((img < 128).sum()) == h_ink * w_ink
        # thumbnail ink factorizes into rows-in-band x cols-in-band
        thumb = resize_image(img, 8, 8)
        rows_in = sum(1 for i in range(8) if 2 <= (i * h) // 8 < 2 + h_ink)
        cols_in = sum(1 for j in range(8) if 2 <= (j * w) // 8 < 2 + w_ink)
        assert int((thumb < 128).sum()) == rows_in * cols_in


def test_average_hash_collapses_resolutions():
    """aHash near-dup contract (image_phash_dedup): the same 4x4
    pattern rendered at all 5 fixture resolutions is byte-distinct as
    PNG yet hashes identically; distinct patterns hash apart; no
    fixture mask is degenerate (all-white / all-dark hash)."""
    from tesseract_spark.functions.multimodal import (
        average_hash,
        make_fixture_photo,
    )
    from tesseract_spark.functions.png_codec import decode_gray_png

    # doc_ids 0, 12, 24, 36, 48 share pattern 0 at sizes 0..4
    same_pattern = [0, 12, 24, 36, 48]
    pngs = [make_fixture_photo(d) for d in same_pattern]
    assert len(set(pngs)) == 5  # byte-distinct
    hashes = [average_hash(decode_gray_png(p)) for p in pngs]
    assert len(set(hashes)) == 1  # perceptually identical
    # the 12 patterns are mutually distinct and non-degenerate
    all_hashes = {
        average_hash(decode_gray_png(make_fixture_photo(d)))
        for d in range(12 * 5)
    }
    assert len(all_hashes) == 12
    assert "0" * 64 not in all_hashes and "1" * 64 not in all_hashes
