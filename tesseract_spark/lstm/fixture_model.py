"""Trained-by-construction VGSL model for the fixture font + tessdata IO.

Builds a real VGSL conv stack whose weights are constructed (not seeded)
to decode the fixture font exactly, serializes it into a genuine
``.traineddata`` container (tessdata.py — the reference's binary format),
and exposes an executor-side singleton that LOADS the model back through
the deserializer, so the production decode path exercises the full
tessdata -> network -> recoder machinery end to end (the
``LSTMRecognizer::Load`` contract, src/lstm/lstmrecognizer.cpp:75-105;
test contract unittest/baseapi_test.cc:208-224 BasicLSTMTest).

Architecture (spec ``[1,1,0,16 Ct1,1,K Ct1,19,C2 O1cC]``):

- input: a canonical 16-row line strip fed as a width-long sequence of
  16-deep column vectors (height 1, depth 16) — the x-major sequence
  view the reference's Input/StrideMap produces (src/lstm/input.cpp).
- conv1 (1x1, K=203): per-column pattern bank.  One filter per distinct
  nonzero glyph column in the font (202) + one blank detector; weights
  alpha*(2p-1), bias alpha*(0.5-|p|), tanh -> each output ~+1 iff the
  column equals that exact pattern (a one-hot "column id" code).
- conv2 (1x19, C2=74): glyph sequence detectors.  The filter for glyph c
  requires a blank at x-1 and c's column-pattern sequence at x..x+w-1
  (weights +beta on the matching (offset, channel) cells, bias
  -beta*n_constraints+beta); a 74th filter detects word gaps (ink at
  x-1, >=4 blanks following).  tanh -> ~+1 exactly at glyph/space start
  columns — the maximal-munch candidate gating of the template path
  (templates.py) re-expressed as convolution weights.
- output softmax (C=75): per-timestep class logits; glyph classes get an
  epsilon * glyph_width bias so that when a narrower glyph's column
  sequence prefixes a wider one's, the wider (maximal munch) wins the
  argmax.  Class 74 = CTC null (the recoder's null_char).

Greedy CTC collapse + recoder decode then yields the line text
(RecodeBeamSearch's SimpleTextOutput path).
"""

from __future__ import annotations

import numpy as np

from ..functions.fonts import CHARSET, get_font
from .tessdata import (
    LstmModel,
    Unicharset,
    UnicharCompress,
    load_traineddata,
    save_traineddata,
)
from .vgsl import VGSLNetwork

ALPHA = 8.0  # conv1 sharpness: tanh(alpha/2) ~ +-1 one-hot margin
BETA = 4.0  # conv2 sharpness
GAMMA = 6.0  # output logit scale
EPS_W = 0.01  # maximal-munch width bonus
MIN_SPACE_PX = 4  # word-gap run length the space detector requires
PAD = 2  # blank columns added at each strip edge before forward


def _column_patterns() -> tuple[list[tuple[int, ...]], dict[str, list[int]]]:
    """Distinct nonzero glyph columns + per-glyph column-id sequences."""
    font = get_font()
    patterns: dict[tuple[int, ...], int] = {}
    glyph_seq: dict[str, list[int]] = {}
    for ch in CHARSET:
        g = font[ch]
        seq = []
        for x in range(g.shape[1]):
            col = tuple(int(v) for v in g[:, x])
            if col not in patterns:
                patterns[col] = len(patterns)
            seq.append(patterns[col])
        glyph_seq[ch] = seq
    ordered = [p for p, _ in sorted(patterns.items(), key=lambda kv: kv[1])]
    return ordered, glyph_seq


def build_fixture_net() -> VGSLNetwork:
    """Construct the decoding VGSL net (weights installed in-place)."""
    patterns, glyph_seq = _column_patterns()
    n_pat = len(patterns)
    k1 = n_pat + 1  # + blank detector (last channel)
    blank_ch = n_pat
    n_glyph = len(CHARSET)
    c2 = n_glyph + 1  # + space detector (last channel)
    n_classes = n_glyph + 2  # glyphs + space + CTC null
    spec = f"[1,1,0,16 Ct1,1,{k1} Ct1,19,{c2} O1c{n_classes}]"
    net = VGSLNetwork(spec)

    # conv1: per-column pattern bank --------------------------------------
    w1 = np.zeros((k1, 16), dtype=np.float32)
    b1 = np.zeros(k1, dtype=np.float32)
    for i, p in enumerate(patterns):
        pv = np.asarray(p, dtype=np.float32)
        w1[i] = ALPHA * (2.0 * pv - 1.0)
        b1[i] = ALPHA * (0.5 - pv.sum())
    w1[blank_ch] = -ALPHA
    b1[blank_ch] = 0.5 * ALPHA
    assert net.layers[0].kind == "conv"
    net.layers[0].weights["w"] = w1
    net.layers[0].weights["b"] = b1

    # conv2: glyph/space sequence detectors -------------------------------
    # feature layout for ky=1: index = xx * k1 + channel (vgsl._conv
    # im2col order); window offset xx=9 corresponds to the output column x
    w2 = np.zeros((c2, 19 * k1), dtype=np.float32)
    b2 = np.zeros(c2, dtype=np.float32)
    for gi, ch in enumerate(CHARSET):
        seq = glyph_seq[ch]
        w2[gi, 8 * k1 + blank_ch] = BETA  # x-1 must be blank
        for k, pat in enumerate(seq):
            w2[gi, (9 + k) * k1 + pat] = BETA
        n_sel = len(seq) + 1
        b2[gi] = -BETA * (n_sel - 1)
    space_ch = n_glyph
    w2[space_ch, 8 * k1 + blank_ch] = -BETA  # x-1 must be INK
    for k in range(MIN_SPACE_PX):
        w2[space_ch, (9 + k) * k1 + blank_ch] = BETA
    b2[space_ch] = -BETA * MIN_SPACE_PX  # n_sel = MIN_SPACE_PX + 1
    assert net.layers[1].kind == "conv"
    net.layers[1].weights["w"] = w2
    net.layers[1].weights["b"] = b2

    # output: diagonal map + maximal-munch width bonus --------------------
    wo = np.zeros((n_classes, c2), dtype=np.float32)
    bo = np.zeros(n_classes, dtype=np.float32)
    for gi, ch in enumerate(CHARSET):
        wo[gi, gi] = GAMMA
        bo[gi] = EPS_W * len(glyph_seq[ch])
    wo[n_glyph, space_ch] = GAMMA  # space class
    # null class: logit 0 (bias) — wins wherever nothing fires
    assert net.layers[2].kind == "output"
    net.layers[2].weights["w"] = wo
    net.layers[2].weights["b"] = bo
    return net


def build_fixture_model() -> LstmModel:
    net = build_fixture_net()
    charset = CHARSET + " "
    unicharset = Unicharset.from_charset(charset)
    recoder = UnicharCompress.pass_through(len(charset))
    return LstmModel(
        net=net,
        unicharset=unicharset,
        recoder=recoder,
        null_char=len(charset),
        spec=net.spec,
    )


def fixture_traineddata_bytes() -> bytes:
    """The fixture model serialized as a real .traineddata container."""
    return save_traineddata(build_fixture_model())


_MODEL: LstmModel | None = None


def get_vgsl_model() -> LstmModel:
    """Executor-side singleton; loads THROUGH the tessdata deserializer so
    production decode always runs on round-tripped weights."""
    global _MODEL
    if _MODEL is None:
        _MODEL = load_traineddata(fixture_traineddata_bytes())
    return _MODEL


# ---------------------------------------------------------------------------
# Line decode (forward + greedy CTC collapse + recoder)
# ---------------------------------------------------------------------------


def bucket_strips(
    strips: list[np.ndarray], quantum: int = 32
) -> list[tuple[list[int], np.ndarray, list[int]]]:
    """Width-bucket canonical strips for batched forwards (the StrideMap
    batching shape).  Returns [(indices, x [N,1,Wmax,16], real widths)]
    — the ONE shared implementation the evaluator and the production
    decoder both use (a silent divergence here would make eval error
    rates incomparable with production decode)."""
    buckets: dict[int, list[int]] = {}
    for i, st in enumerate(strips):
        w = st.shape[1] + 2 * PAD
        buckets.setdefault(-(-w // quantum), []).append(i)
    out = []
    for key in sorted(buckets):
        idxs = buckets[key]
        wmax = key * quantum
        x = np.zeros((len(idxs), 1, wmax, 16), dtype=np.float32)
        t_reals = []
        for j, i in enumerate(idxs):
            st = strips[i].astype(np.float32)
            x[j, 0, PAD : PAD + st.shape[1], :] = st.T
            t_reals.append(st.shape[1] + 2 * PAD)
        out.append((idxs, x, t_reals))
    return out


def greedy_collapse(seq: np.ndarray, blank: int) -> list[int]:
    """Greedy CTC collapse: drop repeats, then blanks
    (ExtractBestPaths/SimpleTextOutput, recodebeam.cpp:200-237)."""
    keep = np.ones(len(seq), bool)
    keep[1:] = seq[1:] != seq[:-1]
    return [int(c) for c in seq[keep] if c != blank]


def trim_edge_spaces(codes: list[int], space: int) -> list[int]:
    """Strip leading/trailing space codes: end-of-line is
    indistinguishable from a word gap."""
    while codes and codes[0] == space:
        codes.pop(0)
    while codes and codes[-1] == space:
        codes.pop()
    return codes


def decode_strips(
    model: LstmModel,
    strips: list[np.ndarray],
    disabled_uids: frozenset[int] | None = None,
) -> list[str]:
    """Decode canonical 16-row bool strips to text, batched by width.

    StrideMap-style width bucketing (vgsl.bucket_by_width semantics) keeps
    the conv forward one BLAS call per bucket; greedy CTC collapse +
    recoder decode per line (RecodeBeamSearch::ExtractBestPaths with
    SimpleTextOutput, recodebeam.cpp:200-237).

    ``disabled_uids``: charset ids suppressed by the char white/black
    lists (the recodebeam.cpp:959 get_enabled skip applied to
    lstm_unicharset, tesseractclass.cpp:538).  Divergence note: the
    greedy path DROPS a disabled emission rather than rerouting its
    probability to the runner-up the way the full beam does.
    """
    if not strips:
        return []
    charset = model.charset
    null_code = model.null_char
    # space-free charsets (CJK fixtures) have no space uid — mirror
    # RecodeBeamSearch.__init__'s defensive fallback
    space_uid = charset.index(" ") if " " in charset else -1
    out = [""] * len(strips)
    for idxs, x, t_reals in bucket_strips(strips):
        log_probs = model.net.forward(x)  # [N, W', C]
        best = np.argmax(log_probs, axis=2)  # [N, W']
        for j, i in enumerate(idxs):
            codes = greedy_collapse(best[j, : t_reals[j]], null_code)
            uids = model.recoder.decode_codes(codes)
            if disabled_uids:
                uids = [u for u in uids if u not in disabled_uids]
            text = "".join(
                " " if u == space_uid else charset[u] for u in uids
            )
            out[i] = text.strip(" ")
    return out


def beam_decode_strips(
    model: LstmModel,
    strips: list[np.ndarray],
    dawg=None,
    disabled_uids: frozenset[int] | None = None,
    force_beam: bool = False,
    margin: float = 0.5,
) -> list[str]:
    """decode_strips on the full lattice beam (RecodeBeamSearch::Decode,
    recodebeam.cpp:92-104) — the precision path with dictionary
    rescoring, the reference's OEM_LSTM_ONLY decode architecture
    (LSTMRecognizer::RecognizeLine runs the beam on every line,
    lstmrecognizer.cpp:247-291).

    The forward stays batched/BLAS (same bucket_strips path as the
    greedy decoder); the per-line beam is Python, so an ambiguity gate
    keeps it off the hot path: with no dictionary, a line whose winning
    code clears ``margin`` probability at every timestep decodes
    greedily (on such a lattice the argmax path dominates every
    competing collapse, the ctc.py gate argument).  Lines with a dawg,
    a disabled char, or a weak step run the real beam.  ``force_beam``
    disables the gate (the reference's always-on behavior).
    """
    if not strips:
        return []
    from .recode_beam import RecodeBeamSearch

    charset = model.charset
    null_code = model.null_char
    # space-free charsets (CJK fixtures) have no space uid — mirror
    # RecodeBeamSearch.__init__'s defensive fallback
    space_uid = charset.index(" ") if " " in charset else -1
    out = [""] * len(strips)
    beam = RecodeBeamSearch(
        model.recoder,
        null_code,
        dawg=dawg,
        uid_chars=list(charset),
    )
    for idxs, x, t_reals in bucket_strips(strips):
        log_probs = model.net.forward(x)  # [N, W', C]
        for j, i in enumerate(idxs):
            row = log_probs[j, : t_reals[j]]
            need_beam = force_beam or dawg is not None or bool(disabled_uids)
            if not need_beam:
                # gate: all winners clear the margin -> greedy is safe
                top = np.max(row, axis=1)
                need_beam = bool(np.any(np.exp(top) < margin))
            if need_beam:
                probs = np.exp(row.astype(np.float64))
                beam.decode(probs, disabled_uids=disabled_uids)
                labels, _ = beam.extract_best_path_as_labels()
                uids = model.recoder.decode_codes(labels)
            else:
                codes = greedy_collapse(
                    np.argmax(row, axis=1), null_code
                )
                uids = model.recoder.decode_codes(codes)
            if disabled_uids:
                uids = [u for u in uids if u not in disabled_uids]
            text = "".join(
                " " if u == space_uid else charset[u] for u in uids
            )
            out[i] = text.strip(" ")
    return out
