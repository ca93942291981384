"""Orientation detection (OSD) — which of the four rotations is upright.

Re-expresses ``os_detect`` / ``OrientationDetector``
(src/ccmain/osdetect.cpp:213-440): the reference classifies individual
blobs at each of the four orientations and sums per-orientation scores;
here the per-blob classifier is the template bank, and the vote is the
summed best match fraction over candidate glyph starts at each rotation —
the same argmax-of-summed-scores aggregate (queries.q_osd_vote is the
DataFrame-level analogue of the vote).
"""

from __future__ import annotations

import numpy as np

from ..functions.image_ops import binarize_otsu
from ..lstm.templates import get_net
from .page import analyze_page


def orientation_scores(gray: np.ndarray, net=None) -> dict[int, float]:
    """Score each rotation (degrees clockwise needed to make the page
    upright): sum of best template match fractions over the rows the
    layout stage finds at that rotation, weighted by glyph count.

    ``net``: the recognition charset to vote with — a multi-language
    session passes its combined net, the reference's single classifier
    over the union unicharset of all loaded langs."""
    net = net or get_net()
    scores: dict[int, float] = {}
    img = gray
    for rot in (0, 90, 180, 270):
        score = 0.0
        layout = analyze_page(img)
        for region in layout.regions:
            if region.kind != "text":
                continue
            for row in region.rows:
                cand_xs, fracs = net.match_scores(row.strip)
                if len(cand_xs) == 0:
                    continue
                best = np.zeros(len(cand_xs), dtype=np.float32)
                for w in fracs:
                    if fracs[w].size:
                        best = np.maximum(best, fracs[w].max(axis=0))
                score += float(best.sum())
        scores[rot] = round(score, 4)
        img = np.rot90(img, k=-1)  # next candidate rotation
    return scores


def detect_orientation(
    gray: np.ndarray, net=None
) -> tuple[int, dict[int, float]]:
    """(rotation_to_upright_degrees, per-rotation scores)."""
    scores = orientation_scores(gray, net=net)
    best = max(sorted(scores), key=lambda r: scores[r])
    return best, scores


# ---------------------------------------------------------------------------
# Script detection (ScriptDetector, osdetect.cpp:357-530) + OSD sink text
# ---------------------------------------------------------------------------

K_SCRIPT_ACCEPT_RATIO = 1.3  # osdetect.cpp:44
K_NON_AMBIGUOUS_MARGIN = 1.0  # osdetect.cpp:49


def script_of_char(ch: str) -> str:
    """Unicharset script assignment (the unicharset script ids the
    ScriptDetector votes over, osdetect.cpp:455-510): block-mapped for
    the loaded fixture alphabets; digits and punctuation are Common."""
    o = ord(ch)
    if 0x0590 <= o <= 0x05FF:
        return "Hebrew"
    if 0x0900 <= o <= 0x097F:
        return "Devanagari"
    return "Latin" if ch.isalpha() else "Common"


def script_vote(blob_choices: list[list[tuple[str, float]]]) -> dict[str, float]:
    """ScriptDetector::detect_blob voting (osdetect.cpp:455-510).

    blob_choices: per blob, ranked (script, certainty) choices with
    certainty <= 0, best first (duplicate scripts pre-deduped like the
    ``done[id]`` guard).  A blob votes +1 for its top script iff no other
    script's best choice is within kNonAmbiguousMargin of it; digits
    (Common) directly below a single-char top match stop the scan (the
    reference's digit break)."""
    scores: dict[str, float] = {}
    for choices in blob_choices:
        prev_score = None
        script_count = 0
        prev_script = None
        seen: set[str] = set()
        for script, cert in choices:
            if script in seen:
                continue
            seen.add(script)
            if prev_score is None:
                prev_score = -cert
                script_count = 1
                prev_script = script
            elif -cert < prev_score + K_NON_AMBIGUOUS_MARGIN:
                script_count += 1
            if script_count >= 2:
                break
        if script_count == 1 and prev_script is not None:
            scores[prev_script] = scores.get(prev_script, 0.0) + 1.0
    return scores


def best_script(scores: dict[str, float]) -> tuple[str, float]:
    """update_best_script (osdetect.cpp:78-99): argmax over non-Common
    scripts; confidence = (first/second - 1) / (kScriptAcceptRatio - 1),
    2.0 when there is no runner-up."""
    named = {s: v for s, v in scores.items() if s not in ("Common", "NULL")}
    if not named:
        return "Latin", 0.0  # no evidence: the eng default, zero conf
    ranked = sorted(named.items(), key=lambda kv: (-kv[1], kv[0]))
    first = ranked[0][1]
    second = ranked[1][1] if len(ranked) > 1 else 0.0
    conf = 2.0 if second == 0.0 else (first / second - 1.0) / (
        K_SCRIPT_ACCEPT_RATIO - 1.0
    )
    return ranked[0][0], round(float(conf), 2)


def detect_script(
    gray: np.ndarray, rot: int | None = None, net=None
) -> tuple[str, float]:
    """Page-level script detection at the upright orientation: each
    candidate glyph's ranked template matches become (script, certainty)
    choices (certainty = 20*(frac-1), the reference's [-20,0] range).

    ``rot``: pass a pre-computed orientation to skip re-detection (the
    OSD sink computes it once for both halves of the report).
    ``net``: the charset to vote over — pass the combined multi-lang
    net (e.g. templates.get_net_rtl) and Hebrew pages report Hebrew."""
    net = net or get_net()
    if rot is None:
        rot, _scores = detect_orientation(gray, net=net)
    # orientation_scores tests candidate r on rot90(img, -(r//90)), so
    # the upright image is the NEGATIVE rotation (a positive k here left
    # 90/270-rotated pages upside down; the single-script fixture masked
    # it because any vote still says Latin)
    img = np.rot90(gray, k=-(rot // 90))
    layout = analyze_page(img)
    blob_choices: list[list[tuple[str, float]]] = []
    for region in layout.regions:
        if region.kind != "text":
            continue
        for row in region.rows:
            cand_xs, fracs = net.match_scores(row.strip)
            if len(cand_xs) == 0:
                continue
            per_cand: list[list[tuple[float, str]]] = [
                [] for _ in range(len(cand_xs))
            ]
            for w, (idxs, _f) in net.by_width.items():
                fr = fracs[w]
                for r_i, char_i in enumerate(idxs):
                    ch = net.charset[char_i]
                    sc = script_of_char(ch)
                    for c_i in range(fr.shape[1]):
                        per_cand[c_i].append((-20.0 * (1.0 - float(fr[r_i, c_i])), sc))
            for cand in per_cand:
                cand.sort(key=lambda t: -t[0])
                blob_choices.append([(sc, cert) for cert, sc in cand[:8]])
    return best_script(script_vote(blob_choices))


def get_osd_text(gray: np.ndarray, page_number: int = 0, net=None) -> str:
    """GetOsdText sink (baseapi.cpp:1689-1718): the six-line OSD report
    with orientation + script and their confidences."""
    rot, scores = detect_orientation(gray, net=net)
    ranked = sorted(scores.values(), reverse=True)
    orient_conf = (
        round(ranked[0] / max(ranked[1], 1e-9), 2) if len(ranked) > 1 else 2.0
    )
    script, script_conf = detect_script(gray, rot=rot, net=net)
    orient_deg = rot
    rotate = (360 - orient_deg) % 360
    return (
        f"Page number: {page_number}\n"
        f"Orientation in degrees: {orient_deg}\n"
        f"Rotate: {rotate}\n"
        f"Orientation confidence: {orient_conf:.2f}\n"
        f"Script: {script}\n"
        f"Script confidence: {script_conf:.2f}\n"
    )
