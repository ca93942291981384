"""Multimodal binary columns: audio/video payload plumbing + features.

Training-data pipelines treat non-text media as opaque ``binary``
columns with typed metadata, decoded and featurized inside Arrow-batched
UDFs (the same shape as this engine's PNG path).  This container has no
audio/video codec libraries, so the CODECS here are deterministic
engine-defined containers (clearly marked; swap for soundfile/pyav in a
real deployment) — everything downstream of decode is REAL:
numpy DSP (RMS energy, zero crossings, framing), real frame sampling,
and real nearest-neighbour image resize, all vectorized.

Container formats (little-endian):
- audio: ``AUD0`` | u32 sample_rate | u32 n_samples | int16 samples
- video: ``VID0`` | u32 n_frames | per frame: u32 h | u32 w | u8 pixels
"""

from __future__ import annotations

import struct

import numpy as np

AUDIO_MAGIC = b"AUD0"
VIDEO_MAGIC = b"VID0"


# ---------------------------------------------------------------------------
# codecs (deterministic engine containers — the stubbed decode boundary)
# ---------------------------------------------------------------------------


def encode_audio(samples: np.ndarray, rate: int) -> bytes:
    s = np.ascontiguousarray(samples, dtype="<i2")
    return AUDIO_MAGIC + struct.pack("<II", rate, len(s)) + s.tobytes()


def decode_audio(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != AUDIO_MAGIC:
        raise ValueError("not an AUD0 payload")
    rate, n = struct.unpack("<II", blob[4:12])
    samples = np.frombuffer(blob, dtype="<i2", count=n, offset=12)
    return rate, samples


def encode_video(frames: list[np.ndarray]) -> bytes:
    out = bytearray(VIDEO_MAGIC + struct.pack("<I", len(frames)))
    for f in frames:
        a = np.ascontiguousarray(f, dtype=np.uint8)
        out += struct.pack("<II", a.shape[0], a.shape[1]) + a.tobytes()
    return bytes(out)


def decode_video(blob: bytes) -> list[np.ndarray]:
    if blob[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    (n,) = struct.unpack("<I", blob[4:8])
    frames = []
    off = 8
    for _ in range(n):
        h, w = struct.unpack("<II", blob[off : off + 8])
        off += 8
        frames.append(
            np.frombuffer(blob, dtype=np.uint8, count=h * w, offset=off)
            .reshape(h, w)
        )
        off += h * w
    return frames


# ---------------------------------------------------------------------------
# real feature extraction (numpy, vectorized)
# ---------------------------------------------------------------------------


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Duration, RMS amplitude, zero-crossing count — the basic audio
    quality/energy features a curation pipeline keys on."""
    x = samples.astype(np.float64)
    n = len(x)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "n_samples": n,
        "duration_s": round(n / rate, 4),
        "rms": round(float(np.sqrt(np.mean(x * x))) if n else 0.0, 4),
        "zero_crossings": zc,
    }


def sample_frames(frames: list[np.ndarray], stride: int) -> list[tuple[int, np.ndarray]]:
    """Every stride-th frame with its original index (frame sampling)."""
    return [(i, f) for i, f in enumerate(frames) if i % stride == 0]


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (vectorized index gather)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------------------
# deterministic fixture payload synthesis (fixture-side inverse)
# ---------------------------------------------------------------------------


def make_fixture_audio(doc_id: int, rate: int = 8000, seconds: float = 0.5) -> bytes:
    """Square wave with doc-dependent frequency: half-period
    h = rate // (2 * freq) samples, amplitude 1000 — every feature is
    analytically known, so a SQL oracle can verify the full decode ->
    DSP path."""
    n = int(rate * seconds)
    freq = 50 + doc_id % 100
    h = max(1, rate // (2 * freq))
    i = np.arange(n)
    samples = (((i // h) % 2) * 2 - 1) * 1000
    return encode_audio(samples.astype(np.int16), rate)


def make_fixture_video(doc_id: int) -> bytes:
    """2 + doc_id % 6 frames of 8x8 constant-intensity pixels
    (value = 10*k + doc_id % 50 for frame k) — sampled-frame means are
    analytic."""
    n = 2 + doc_id % 6
    frames = [
        np.full((8, 8), (10 * k + doc_id % 50) % 256, dtype=np.uint8)
        for k in range(n)
    ]
    return encode_video(frames)


def make_fixture_image(doc_id: int) -> bytes:
    """Deterministic grayscale page thumbnail as a REAL PNG (the engine's
    own codec, functions/png_codec.py — zlib/filter/CRC round-trip, not a
    toy container): white field with one black ink rectangle whose
    geometry is a pure function of doc_id, so ink counts, mean intensity
    and the nearest-neighbour 8x8 thumbnail are all analytically known to
    a SQL oracle."""
    from .png_codec import encode_gray_png

    h = 24 + (doc_id % 8) * 4
    w = 48 + (doc_id % 16) * 4
    h_ink = h // 2
    w_ink = w // 3 + doc_id % 7
    img = np.full((h, w), 255, dtype=np.uint8)
    img[2 : 2 + h_ink, 2 : 2 + w_ink] = 0
    return encode_gray_png(img)


def make_fixture_photo(doc_id: int) -> bytes:
    """Deterministic 'photo' PNG for the perceptual-hash dedup query: a
    4x4 dark-block pattern (pattern id = doc_id % 12, bit gi*4+gj of
    mask = ((id%12 + 1) * 40503) % 65536 — 12 distinct masks, none
    all-white/all-dark) rendered at one of 5 resolutions
    (h = w = 32 + 8 * (doc_id % 5)).  The same pattern at different
    resolutions is byte-different but perceptually identical — the
    rescale/re-encode near-dup case aHash exists to catch — and every
    quantity is integer arithmetic a SQL oracle replays exactly."""
    from .png_codec import encode_gray_png

    mask = ((doc_id % 12 + 1) * 40503) % 65536
    side = 32 + 8 * (doc_id % 5)
    img = np.full((side, side), 255, dtype=np.uint8)
    block = side // 4
    for gi in range(4):
        for gj in range(4):
            if (mask >> (gi * 4 + gj)) & 1:
                img[gi * block : (gi + 1) * block,
                    gj * block : (gj + 1) * block] = 0
    return encode_gray_png(img)


def average_hash(img: np.ndarray, hash_size: int = 8) -> str:
    """aHash (average hash), the classic perceptual-dedup key for image
    corpora: nearest-neighbour downsample to hash_size x hash_size,
    threshold each cell against the source image's mean intensity, pack
    row-major into a bitstring.  Byte-level differences that preserve
    perceptual structure (rescales, re-encodes, codec noise under the
    mean) collapse to the same key."""
    thumb = resize_image(img, hash_size, hash_size)
    bits = (thumb.astype(np.float64) < float(img.mean())).ravel()
    return "".join("1" if b else "0" for b in bits)
