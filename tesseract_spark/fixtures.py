"""Deterministic fixture corpus generator (FIXTURES.md; seed=42, no I/O deps).

Builds the three tables of the driver-fixed input shape (BASELINE.json
``input_hint``) as parquet via pyarrow:

- ``documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)``
- ``media(media_ref, png, width, height, dpi, family)``
- ``golden_spans(doc_id, spans ...)`` — expected output by construction

Fixture families mirror the reference unittest corpus (FIXTURES.md §4).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.compose import ComposedPage, PageSpec, compose_page
from .functions.png_codec import encode_gray_png

SEED = 42

WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs spark table row filter join group sort merge scan query "
    "data batch line value stream window column order key hash small fast "
    "slow agg part customer vector"
).split()

DICT_WORDS = sorted(set(WORDS))


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _lines(rng: np.random.Generator, n_lines: int, wpl: int = 3) -> list[str]:
    return [_words(rng, wpl) for _ in range(n_lines)]


def make_page_spec(family: str, rng: np.random.Generator) -> PageSpec:
    """One deterministic PageSpec per fixture family (FIXTURES.md §4)."""
    if family == "single_line":
        return PageSpec(paragraphs=[[_words(rng, 4)]])
    if family == "single_block":
        return PageSpec(paragraphs=[_lines(rng, 3)])
    if family == "multi_para":
        return PageSpec(
            paragraphs=[_lines(rng, 2), _lines(rng, 2), _lines(rng, 1)],
            indent_paras=(2,),
        )
    if family == "two_column":
        return PageSpec(
            paragraphs=[_lines(rng, 2, wpl=2)], column2=[_lines(rng, 2, wpl=2)]
        )
    if family == "skewed":
        skew = float(rng.choice([-0.03, -0.015, 0.015, 0.03]))
        return PageSpec(paragraphs=[_lines(rng, 2)], skew=skew)
    if family == "mixed_media":
        return PageSpec(
            paragraphs=[_lines(rng, 1), _lines(rng, 1)],
            photos=((0, 60, 48),),
            rules=(1,),
        )
    if family == "noise_diacritics":
        return PageSpec(paragraphs=[_lines(rng, 2)], noise_dots=10)
    if family == "inverted":
        return PageSpec(paragraphs=[_lines(rng, 1)], inverted=True)
    if family == "dict_words":
        return PageSpec(paragraphs=[[" ".join(rng.choice(DICT_WORDS, 3))]])
    if family == "empty_page":
        return PageSpec(paragraphs=[])
    if family == "fixed_pitch":
        return PageSpec(paragraphs=[_lines(rng, 2)], scale=2)
    if family == "sparse_text":
        return PageSpec(paragraphs=[[_words(rng, 1)], [_words(rng, 1)]])
    if family == "pullout":
        # full-width heading over a two-column body; the heading must
        # CROSS the inter-column gutter for the column-DP case to fire
        from .functions.compose import GUTTER, MARGIN
        from .functions.fonts import text_ink_width

        col1 = _lines(rng, 2, wpl=2)
        col2 = _lines(rng, 2, wpl=2)
        w1 = max(text_ink_width(ln) for ln in col1)
        need = MARGIN + w1 + GUTTER + 20
        head = _words(rng, 6)
        while text_ink_width(head) <= need:
            head += " " + _words(rng, 1)
        return PageSpec(paragraphs=[col1], column2=[col2], pullout_lines=[head])
    raise ValueError(f"unknown family {family}")


FAMILIES = (
    "single_line single_block multi_para two_column skewed mixed_media "
    "noise_diacritics inverted dict_words empty_page fixed_pitch sparse_text "
    "pullout"
).split()

SPAN_FIELDS = [
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("offset", pa.int32()),
]
SPAN_TYPE = pa.list_(pa.struct(SPAN_FIELDS))


def build_corpus(out_dir: str, n_docs: int = 50, seed: int = SEED) -> dict:
    """Generate documents/media/golden_spans parquet under out_dir.

    ~20% of docs interleave >=3 text and >=3 media spans (FIXTURES.md §4);
    media sizes vary by family/scale for skew realism.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    docs, media, golden = [], [], []
    media_seq = 0
    for d in range(n_docs):
        doc_id = f"doc-{d:08d}"
        heavy = d % 5 == 0  # interleave-heavy docs
        n_media = 3 if heavy else int(rng.integers(0, 3))
        n_text = 3 if heavy else int(rng.integers(0, 3))
        if n_media + n_text == 0:
            n_text = 1
        kinds = ["media"] * n_media + ["text"] * n_text
        rng.shuffle(kinds)
        in_spans, out_spans = [], []
        for kind in kinds:
            if kind == "text":
                t = _words(rng, int(rng.integers(2, 6)))
                in_spans.append({"kind": "text", "text": t, "media_ref": None})
                out_spans.append({"kind": "text", "text": t, "media_ref": None})
            else:
                family = FAMILIES[media_seq % len(FAMILIES)]
                spec = make_page_spec(family, rng)
                page: ComposedPage = compose_page(spec)
                ref = f"m-{media_seq:08d}"
                media_seq += 1
                media.append(
                    {
                        "media_ref": ref,
                        "png": encode_gray_png(page.image),
                        "width": page.width,
                        "height": page.height,
                        "dpi": spec.dpi,
                        "family": family,
                    }
                )
                in_spans.append({"kind": "media", "text": None, "media_ref": ref})
                for gkind, gtext in page.golden:
                    out_spans.append(
                        {
                            "kind": gkind,
                            "text": gtext if gkind == "text" else None,
                            "media_ref": ref if gkind == "media" else None,
                        }
                    )
        for i, s in enumerate(in_spans):
            s["offset"] = i
        for i, s in enumerate(out_spans):
            s["offset"] = i
        docs.append({"doc_id": doc_id, "spans": in_spans})
        golden.append({"doc_id": doc_id, "spans": out_spans})

    doc_schema = pa.schema([pa.field("doc_id", pa.string()), pa.field("spans", SPAN_TYPE)])
    pq.write_table(
        pa.Table.from_pylist(docs, schema=doc_schema), f"{out_dir}/documents.parquet"
    )
    pq.write_table(
        pa.Table.from_pylist(golden, schema=doc_schema), f"{out_dir}/golden_spans.parquet"
    )
    media_schema = pa.schema(
        [
            pa.field("media_ref", pa.string()),
            pa.field("png", pa.binary()),
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("dpi", pa.int32()),
            pa.field("family", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(media, schema=media_schema), f"{out_dir}/media.parquet"
    )
    wl = pa.Table.from_pylist([{"word": w} for w in DICT_WORDS])
    pq.write_table(wl, f"{out_dir}/wordlist.parquet")
    return {
        "documents": f"{out_dir}/documents.parquet",
        "media": f"{out_dir}/media.parquet",
        "golden_spans": f"{out_dir}/golden_spans.parquet",
        "wordlist": f"{out_dir}/wordlist.parquet",
        "n_docs": n_docs,
        "n_media": media_seq,
    }
