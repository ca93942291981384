"""The .lstmf training-data file format (ImageData serialization).

lstmtraining consumes .lstmf files: a DocumentData::SaveDocument blob
(src/ccstruct/imagedata.cpp:422-431) holding a TFile-serialized vector
of ImageData pages (imagedata.cpp:91-115): for each page —
a uint8 pointer-non-null marker (imagedata.cpp:587),
filename (uint32-length-prefixed string), int32 page number, PNG bytes
(uint32-prefixed), language, transcription, TBOX vector (uint32 count,
4 x int16 per box: bot_left then top_right, y-UP coordinates,
points.cpp:47 / tesstypes.h TDimension=int16), box-text vector, and an
int8 vertical-text flag.  Little-endian throughout (serialis.h).

The writer + reader here are byte-level analogues so a corpus exported
by this engine is structured like the files tesstrain exchanges; the
render side (make_line_samples) is the text2image stand-in over the
fixture font, producing samples the distributed trainer
(training.distributed_finetune) and evaluator (eval) consume.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class ImageSample:
    """One ImageData page (imagedata.h:104-140)."""

    imagefilename: str = ""
    page_number: int = 0
    image_png: bytes = b""
    language: str = ""
    transcription: str = ""
    # TBOXes as (bl_x, bl_y, tr_x, tr_y), y-up like the reference
    boxes: list[tuple[int, int, int, int]] = field(default_factory=list)
    box_texts: list[str] = field(default_factory=list)
    vertical_text: bool = False


def _w_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += struct.pack("<I", len(b)) + b


def _w_bytes(out: bytearray, b: bytes) -> None:
    out += struct.pack("<I", len(b)) + b


def write_lstmf(samples: list[ImageSample]) -> bytes:
    out = bytearray(struct.pack("<I", len(samples)))
    for s in samples:
        # Pointer-vector non-null marker (the uint8 DocumentData::
        # ReCachePages reads per page, imagedata.cpp:587-600).
        out += struct.pack("<B", 1)
        _w_str(out, s.imagefilename)
        out += struct.pack("<i", s.page_number)
        _w_bytes(out, s.image_png)
        _w_str(out, s.language)
        _w_str(out, s.transcription)
        out += struct.pack("<I", len(s.boxes))
        for bx, by, tx, ty in s.boxes:
            out += struct.pack("<4h", bx, by, tx, ty)
        out += struct.pack("<I", len(s.box_texts))
        for t in s.box_texts:
            _w_str(out, t)
        out += struct.pack("<b", 1 if s.vertical_text else 0)
    return bytes(out)


class _R:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.p = 0

    def take(self, n: int) -> bytes:
        if self.p + n > len(self.d):
            raise ValueError("lstmf truncated")
        b = self.d[self.p : self.p + n]
        self.p += n
        return b

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def s(self) -> str:
        return self.take(self.u32()).decode("utf-8")


def read_lstmf(data: bytes) -> list[ImageSample]:
    r = _R(data)
    n = r.u32()
    out: list[ImageSample] = []
    for _ in range(n):
        non_null = struct.unpack("<B", r.take(1))[0]
        if not non_null:
            continue
        smp = ImageSample()
        smp.imagefilename = r.s()
        smp.page_number = r.i32()
        smp.image_png = r.take(r.u32())
        smp.language = r.s()
        smp.transcription = r.s()
        nb = r.u32()
        for _b in range(nb):
            smp.boxes.append(struct.unpack("<4h", r.take(8)))
        nt = r.u32()
        for _t in range(nt):
            smp.box_texts.append(r.s())
        smp.vertical_text = struct.unpack("<b", r.take(1))[0] != 0
        out.append(smp)
    if r.p != len(data):
        raise ValueError("lstmf has trailing bytes")
    return out


def lstmf_to_df(spark, blob: bytes):
    """.lstmf -> trainer bridge: the (text, image_png) sample table
    distributed_finetune / distributed_gradient consume directly (the
    carried images train, nothing re-renders)."""
    samples = read_lstmf(blob)
    return spark.createDataFrame(
        [(s.transcription, bytearray(s.image_png)) for s in samples],
        "text string, image_png binary",
    )


def make_line_samples(
    texts: list[str],
    language: str = "eng",
    name: str = "fixture",
    degrade_exposure: int | None = None,
    distort: dict | None = None,
    seed: int = 0,
) -> list[ImageSample]:
    """text2image + tesstrain stand-in: render each training text with
    the fixture font and package it as an ImageData page whose single
    box spans the line (y-up coordinates).

    ``degrade_exposure``: when set, each line passes through the
    print/copy/scan degradation (degrade.degrade_line, the
    degradeimage.cpp augmentation text2image applies with --degrade_image)
    at that exposure, seeded per sample for reproducible corpora.

    ``distort``: kwargs for degrade.distort_line (PrepareDistortedPix,
    the --distort_image path, text2image.cpp:645-649) — e.g.
    ``{"white_noise": True, "blur": True, "invert": True}`` — applied
    after degradation with the same per-sample seeding."""
    from ..functions.fonts import mask_to_gray
    from ..functions.png_codec import encode_gray_png
    from .training import line_sample

    out = []
    for i, t in enumerate(texts):
        strip = line_sample(t)
        h, w = strip.shape
        gray = mask_to_gray(strip)
        if degrade_exposure is not None:
            from .degrade import degrade_line

            gray = degrade_line(
                gray, exposure=degrade_exposure, seed=seed + i
            )
        if distort:
            from .degrade import distort_line

            gray = distort_line(gray, seed=seed + i, **distort)
        out.append(
            ImageSample(
                imagefilename=f"{name}.{i}.png",
                page_number=i,
                image_png=encode_gray_png(gray),
                language=language,
                transcription=t,
                boxes=[(0, 0, w, h)],
                box_texts=[t],
            )
        )
    return out
