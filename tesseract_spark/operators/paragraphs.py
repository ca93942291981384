"""Paragraph detection over recognized rows (the reference's 4-pass model).

Re-expresses ``DetectParagraphs`` (src/ccmain/paragraphs.cpp:2317-2401) and
its crown logic (kCrownLeft/kCrownRight, :56-60; DowngradeWeakestToCrowns
:1543-1599; PARA.is_very_first_or_continuation assignment :2100-2125) over
plain row records, so the same fixtures the reference tests with ASCII-art
pages (unittest/paragraphs_test.cc:206-640, MakeAsciiRowInfos :120-160)
run against this engine.

Inputs are RowInfo-shaped records (text with its leading/trailing spaces;
geometry derives at kCharWidth px/char like the reference harness).  The
four passes:

1. row attributes — leading/trailing space, first/last word, list-item
   and ends-idea text clues (AsciiLikelyListItem, RightWordAttributes);
2. centered-run detection — runs where BOTH margins vary (the reference's
   JUSTIFICATION_CENTER model fit) become single title paragraphs;
3. break scan — segment-level justification (left vs right by which edge
   is flush), then paragraph starts from: segment start, list items,
   first-line indent jumps, and the "first word of the next line would
   fit on the previous line" rule gated by an ends-idea clue
   (LikelyParagraphStart semantics);
4. model building + crowns — per-paragraph (justification, margin,
   first_indent, body_indent) models; weak single-paragraph models and
   flush starts under an indented dominant model become crowns
   (is_very_first_or_continuation), adopting a compatible strong or seed
   model where one exists.

Spark mapping: ``detect_paragraphs_df`` groups rows per (doc_id,
block_id) with ``applyInPandas`` — paragraph inference is block-local, so
the operator is embarrassingly parallel with one hash exchange on the
grouping key.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

CHAR_W = 10  # px per char, the reference test harness's kCharWidth
TOL = 15  # indent comparison tolerance in px (~1.5 chars)


# ---------------------------------------------------------------------------
# Pass 1 — row attributes / text clues
# ---------------------------------------------------------------------------

_ROMAN = set("ivxlcdm")
# enclosing punctuation acts as a segment separator: "(A)(i)" -> A, i
_STRIP = str.maketrans({c: " " for c in "()[]{}<>\"'`"})


def ascii_likely_list_item(word: str) -> bool:
    """AsciiLikelyListItem (paragraphs.cpp): does this word look like a
    list-item marker (1. / A. / iii / [[1]] / A-1. / (A)(i))?"""
    if not word:
        return False
    core = word.translate(_STRIP)
    if not core.strip():
        return False
    segs = [s for s in re.split(r"[-.·\s]+", core) if s]
    if not segs:
        return False
    for s in segs:
        if s.isdigit() and len(s) <= 3:
            continue
        if len(s) == 1 and s.isalpha():
            continue
        if s.lower() == s and set(s) <= _ROMAN and len(s) <= 4:
            continue
        return False
    return True


def _list_break_evidence(word: str) -> bool:
    """Stronger gate for BREAKING on a list marker: a bare single letter
    ('a', 'I') is a likely list item to the classifier but far more often
    an English word at line start — require a digit, marker punctuation,
    or a multi-char roman numeral before treating it as a break."""
    if not ascii_likely_list_item(word):
        return False
    if any(c.isdigit() for c in word):
        return True
    if any(c in ".-)]}" for c in word):
        return True
    core = word.translate(_STRIP).strip()
    return len(core) >= 2 and set(core) <= _ROMAN


def _ends_idea(word: str) -> bool:
    """RightWordAttributes' likely_ends_idea: sentence-final punctuation
    (optionally inside closing quotes/brackets), or a bare page-number
    token (digits, a digit range, or a roman numeral — index/TOC entries
    end in page references)."""
    w = word.rstrip("'\")]}")
    if not w:
        return False
    if w[-1] in ".!?:;":
        return True
    core = w
    if core.replace("-", "").isdigit():
        return True  # 51 / 89-90
    return core.lower() == core and set(core) <= _ROMAN and len(core) >= 2


@dataclass
class RowInfo:
    """One recognized text row; geometry in px at CHAR_W px/char when
    built from ASCII fixtures (MakeAsciiRowInfos semantics)."""

    text: str
    lindent: int = -1  # px from block left edge to first ink (auto)
    rindent: int = -1  # px from last ink to block right edge (auto)

    def __post_init__(self) -> None:
        stripped = self.text.strip(" ")
        self.words = stripped.split() if stripped else []
        self.lword = self.words[0] if self.words else ""
        self.rword = self.words[-1] if self.words else ""
        lsp = len(self.text) - len(self.text.lstrip(" "))
        rsp = len(self.text) - len(self.text.rstrip(" "))
        if self.lindent < 0:
            self.lindent = lsp * CHAR_W
        if self.rindent < 0:
            self.rindent = (rsp if self.words else 0) * CHAR_W
        self.is_list = _list_break_evidence(self.lword)
        self.ends_idea = _ends_idea(self.rword)
        # LeftWordAttributes' likely_starts_idea: a paragraph-opening
        # word is capitalized or numeric (quotes/brackets stripped);
        # source-code lines (#include, int, if, }) fail this and can
        # therefore never open a paragraph via the geometric rules
        first_core = self.lword.lstrip("\"'([{")
        self.starts_idea = bool(first_core) and (
            first_core[0].isupper() or first_core[0].isdigit()
        )
        self.blank = not self.words
        # leader line (TOC dots): a run of 3+ dots (spaced or packed)
        # with a trailing page number — split out one paragraph per row
        # (the reference's pass-1 leader detection;
        # TestSplitsOutLeaderLines).  The page-number gate keeps prose
        # ellipses from matching.
        self.has_leader = bool(
            re.search(r"(\.\s*){3,}", self.text)
        ) and self.rword.isdigit()
        # stray line (page number / folio): a lone non-alpha token inset
        # from both edges — owns no paragraph (PNONE; the reference's
        # null-model PARA for rows no hypothesis claims)
        folio = self.lword.strip(".-")
        self.stray = (
            len(self.words) == 1
            and bool(folio)
            and (folio.isdigit()
                 or (folio.lower() == folio and set(folio) <= _ROMAN))
            and self.lindent >= 2 * CHAR_W
            and self.rindent >= 2 * CHAR_W
        )


@dataclass
class ParagraphModel:
    justification: str  # 'left' | 'right' | 'center'
    margin: int = 0
    first_indent: int = 0
    body_indent: int = 0

    def comparable(self, other: "ParagraphModel") -> bool:
        return (
            self.justification == other.justification
            and abs(self.margin - other.margin) <= TOL
            and abs(self.first_indent - other.first_indent) <= TOL
            and abs(self.body_indent - other.body_indent) <= TOL
        )


@dataclass
class Paragraph:
    rows: list[int] = field(default_factory=list)
    model: ParagraphModel | None = None
    crown: bool = False  # is_very_first_or_continuation
    is_list: bool = False
    leader: bool = False  # TOC leader row (kUnknown model)


# ---------------------------------------------------------------------------
# Pass 2 — centered runs
# ---------------------------------------------------------------------------


def _centered_runs(rows: list[RowInfo], idxs: list[int]) -> list[list[int]]:
    """Maximal runs of >=3 rows inset on BOTH edges with >=3 distinct
    left AND right indents — the center-justified model fit."""
    runs: list[list[int]] = []
    cur: list[int] = []
    for i in idxs:
        r = rows[i]
        # title rows read like starts; lineated code (int/if/#) does not
        if r.lindent >= CHAR_W and r.rindent >= CHAR_W and r.starts_idea:
            cur.append(i)
        else:
            runs.append(cur)
            cur = []
    runs.append(cur)
    out = []
    for run in runs:
        if len(run) < 3:
            continue
        lefts = {rows[i].lindent for i in run}
        rights = {rows[i].rindent for i in run}
        if len(lefts) >= 3 and len(rights) >= 3:
            out.append(run)
    return out


# ---------------------------------------------------------------------------
# Pass 3 + 4 — break scan, models, crowns
# ---------------------------------------------------------------------------


def detect_paragraphs(
    rows: list[RowInfo], seed_models: list[ParagraphModel] | None = None
) -> tuple[list[Paragraph], list[int | None]]:
    """Returns (paragraphs, row_owners) — owners[i] is the paragraph
    index of row i, or None for blank/separator rows (PNONE)."""
    paragraphs: list[Paragraph] = []
    owners: list[int | None] = [None] * len(rows)

    # segments between blank rows
    segments: list[list[int]] = []
    cur: list[int] = []
    for i, r in enumerate(rows):
        # stray only fires after an ENDED (or absent/blank) row — a lone
        # number after a mid-sentence wrap is a hanging continuation
        # (index page numbers), not a folio
        stray = r.stray and (
            i == 0 or rows[i - 1].blank or rows[i - 1].ends_idea
        )
        if r.blank and not stray:
            # a blank row splits only when the next non-blank row can
            # OPEN a paragraph; otherwise it is interior to lineated
            # text (source-code listings) and the run continues
            nxt = next(
                (rows[j] for j in range(i + 1, len(rows)) if not rows[j].blank),
                None,
            )
            opens = nxt is None or nxt.starts_idea or nxt.is_list or nxt.has_leader
            if opens:
                if cur:
                    segments.append(cur)
                cur = []
            continue
        if stray:
            if cur:
                segments.append(cur)
            cur = []
        else:
            cur.append(i)
    if cur:
        segments.append(cur)

    for seg in segments:
        consumed: set[int] = set()
        for run in _centered_runs(rows, seg):
            p = Paragraph(
                rows=list(run),
                model=ParagraphModel("center", 0, 0, 0),
                crown=False,
            )
            paragraphs.append(p)
            for i in run:
                owners[i] = len(paragraphs) - 1
                consumed.add(i)
        rest = [i for i in seg if i not in consumed]
        if not rest:
            continue
        # segment justification: right-justified when the right edge is
        # flush while the left varies (>=3 distinct lefts)
        lefts = {rows[i].lindent for i in rest}
        right_mode = (
            all(rows[i].rindent <= CHAR_W for i in rest) and len(lefts) >= 3
        )
        paras = _scan_breaks(rows, rest, right_mode)
        for p in paras:
            paragraphs.append(p)
            for i in p.rows:
                owners[i] = len(paragraphs) - 1

    _assign_models(rows, paragraphs, seed_models or [])
    return paragraphs, owners


def _hanging_mode(rows: list[RowInfo], idxs: list[int]) -> int | None:
    """Detect a hanging-indent segment (index/dictionary entries, the
    (margin, first=0, body=hang) model): exactly two quantized left
    positions {m, m+hang}, several margin rows, and EVERY indented row
    wrapping a NON-ended line (in first-line-indent style the indented
    rows follow sentence ends instead).  Returns the margin or None."""
    lefts = sorted({rows[i].lindent for i in idxs})
    if len(lefts) != 2:
        return None
    m, deep = lefts
    if deep - m < 2 * CHAR_W:
        return None
    margin_rows = [i for i in idxs if rows[i].lindent == m]
    deep_rows = [i for i in idxs if rows[i].lindent == deep]
    if len(margin_rows) < 3 or not deep_rows:
        return None
    pos = {i: k for k, i in enumerate(idxs)}
    for i in deep_rows:
        k = pos[i]
        if k == 0:
            return None
        prev = rows[idxs[k - 1]]
        if prev.ends_idea or prev.has_leader:
            return None
    return m


def _scan_breaks(
    rows: list[RowInfo], idxs: list[int], right_mode: bool
) -> list[Paragraph]:
    paras: list[Paragraph] = []
    cur: list[int] = []

    def flush() -> None:
        if cur:
            paras.append(Paragraph(rows=list(cur)))

    hang_margin = None if right_mode else _hanging_mode(rows, idxs)
    for k, i in enumerate(idxs):
        if k == 0:
            cur = [i]
            continue
        prev = rows[idxs[k - 1]]
        r = rows[i]
        brk = False
        if hang_margin is not None:
            # hanging-indent segment: every margin row starts an entry,
            # every indented row continues one
            if r.lindent == hang_margin:
                flush()
                cur = [i]
            else:
                cur.append(i)
            continue
        if r.has_leader or prev.has_leader:
            # leader rows are singleton paragraphs (mode-independent)
            flush()
            cur = [i]
            continue
        if right_mode:
            # mirrored fit rule: the next row's first word would have fit
            # in the previous row's LEADING space (right-justified text
            # fills leftward; a short last line leaves leading space)
            if prev.ends_idea and prev.lindent >= (len(r.lword) + 1) * CHAR_W:
                brk = True
        else:
            first = rows[cur[0]]
            # a hanging list continuation aligns exactly after the
            # current paragraph's list marker — never a break signal
            hang_cont = first.is_list and abs(
                r.lindent - first.lindent - (len(first.lword) + 1) * CHAR_W
            ) <= CHAR_W // 2
            if r.is_list:
                brk = True
            elif hang_cont:
                brk = False
            elif r.lindent - prev.lindent >= 1.5 * CHAR_W:
                # deeper first-line indent — but only after the previous
                # line ENDED (idea clue or short line) and when the new
                # row READS like a start; a deeper row after a full
                # mid-sentence line is a hanging-indent continuation
                if (prev.ends_idea or prev.rindent >= 2 * CHAR_W) and r.starts_idea:
                    brk = True
            elif prev.lindent - r.lindent >= 2.5 * CHAR_W and prev.ends_idea:
                # returning to a shallower margin only breaks after an
                # ENDED line — a deep FIRST line wrapping onto the body
                # margin (5-space book indents) is a continuation
                brk = True
            elif (
                prev.ends_idea
                and r.starts_idea
                and prev.rindent >= (len(r.lword) + 1) * CHAR_W
            ):
                # "the first word of the next line would fit on the
                # previous line" (the reference's own stated heuristic),
                # gated on ends-idea + starts-idea clues so neither
                # justified blocks nor lineated source code split
                brk = True
        if brk:
            flush()
            cur = [i]
        else:
            cur.append(i)
    flush()
    just = "right" if right_mode else "left"
    for p in paras:
        p.model = _fit_model(rows, p.rows, just)
        p.leader = rows[p.rows[0]].has_leader
        # a leader (TOC) row is not a list item even when it starts with
        # a number — the leader classification wins (reference pass-1)
        p.is_list = rows[p.rows[0]].is_list and not p.leader
    return paras


def _fit_model(
    rows: list[RowInfo], members: list[int], just: str
) -> ParagraphModel:
    if just == "right":
        return ParagraphModel("right", 0, 0, 0)
    lefts = [rows[i].lindent for i in members]
    margin = min(lefts)
    first = lefts[0] - margin
    body = (min(lefts[1:]) - margin) if len(lefts) > 1 else 0
    return ParagraphModel("left", margin, first, body)


def _assign_models(
    rows: list[RowInfo],
    paragraphs: list[Paragraph],
    seed_models: list[ParagraphModel],
) -> None:
    """Pass 4: promote strong models, adopt them where compatible, mark
    crowns (DowngradeWeakestToCrowns + PARA assignment semantics)."""
    from collections import Counter

    # strong models: self-evidenced (multi-row, first != body) or shared
    key = lambda m: (m.justification, m.margin, m.first_indent, m.body_indent)
    counts = Counter(key(p.model) for p in paragraphs if p.model)
    strong: list[ParagraphModel] = list(seed_models)
    for p in paragraphs:
        m = p.model
        if m is None or m.justification == "center":
            continue
        self_evidenced = (
            len(p.rows) > 1 and m.first_indent != m.body_indent
        )
        if (self_evidenced or counts[key(m)] >= 2) and not any(
            m.comparable(s) for s in strong
        ):
            strong.append(m)

    for p in paragraphs:
        m = p.model
        if m is None or m.justification == "center":
            continue
        if getattr(p, "leader", False):
            # leader (TOC) rows carry no justification model (kUnknown)
            p.model = None
            continue
        if p.is_list:
            # adopt the strongest list-shaped model (hanging indent)
            for s in strong:
                if (
                    s.justification == "left"
                    and s.body_indent > s.first_indent
                    and abs(m.margin + m.first_indent - s.margin - s.first_indent) <= TOL
                ):
                    p.model = s
                    break
            continue
        first_l = rows[p.rows[0]].lindent
        body_ls = [rows[i].lindent for i in p.rows[1:]]
        # a strong model whose FIRST-line position explains this start
        # (body rows, if any, at its body indent) -> normal paragraph
        explained = None
        for s in strong:
            if (
                s.justification == m.justification
                and s.first_indent != s.body_indent
                and abs(first_l - s.margin - s.first_indent) <= TOL
                and all(abs(b - s.margin - s.body_indent) <= TOL for b in body_ls)
            ):
                explained = s
                break
        if explained is not None:
            p.model = explained
            continue
        if m.first_indent != m.body_indent and len(p.rows) > 1:
            continue  # self-evidenced model; start line is its own proof
        # try to adopt a strong model as a crown/continuation: EVERY row
        # (first included) sits at the model's body indent.  The
        # reference only allows this at the very start of the page
        # (start == 0 in the PARA assignment, paragraphs.cpp:2116-2125)
        # — mid-page, an unexplained start keeps its own model.
        adopted = None
        if p.rows and p.rows[0] == 0:
            for s in strong:
                if s.justification != m.justification:
                    continue
                if all(
                    abs(rows[i].lindent - s.margin - s.body_indent) <= TOL
                    for i in p.rows
                ):
                    adopted = s
                    break
        if adopted is not None and adopted.first_indent != adopted.body_indent:
            p.model = adopted
            p.crown = True
            continue
        # weak flush model (first == body): crown iff nothing else shares
        # it (a block quote / orphan) — the !StrongModel crownify branch
        if m.first_indent == m.body_indent and counts[key(m)] < 2 and not any(
            m.comparable(s) for s in seed_models
        ) and not any(
            m.comparable(s) and counts[key(s)] >= 2 for s in strong
        ):
            # shared-strong check above covers the flush dominant case
            if not any(
                m.comparable(s)
                for s in (
                    pm.model
                    for pm in paragraphs
                    if pm is not p and pm.model is not None
                )
            ):
                p.crown = True


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------


def detect_paragraphs_df(rows_df):
    """(doc_id, block_id, row_num, text) -> per-row paragraph assignment
    (doc_id, block_id, row_num, para_num, justification, margin,
    first_indent, body_indent, crown, is_list).

    applyInPandas per (doc_id, block_id): paragraph inference never
    crosses a block, so one hash exchange on the grouping key is the
    whole distributed cost."""
    import pandas as pd

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("row_num")
        infos = [RowInfo(t if t is not None else "") for t in pdf["text"]]
        paras, owners = detect_paragraphs(infos)
        recs = []
        for rn, owner in zip(pdf["row_num"], owners):
            if owner is None:
                recs.append((rn, -1, None, 0, 0, 0, False, False))
            else:
                p = paras[owner]
                m = p.model or ParagraphModel("left")
                recs.append(
                    (
                        rn,
                        owner,
                        m.justification,
                        m.margin,
                        m.first_indent,
                        m.body_indent,
                        p.crown,
                        p.is_list,
                    )
                )
        out = pd.DataFrame(
            recs,
            columns=[
                "row_num", "para_num", "justification", "margin",
                "first_indent", "body_indent", "crown", "is_list",
            ],
        )
        out.insert(0, "doc_id", pdf["doc_id"].iloc[0])
        out.insert(1, "block_id", pdf["block_id"].iloc[0])
        return out

    return rows_df.groupBy("doc_id", "block_id").applyInPandas(
        per_block,
        schema=(
            "doc_id string, block_id int, row_num int, para_num int, "
            "justification string, margin int, first_indent int, "
            "body_indent int, crown boolean, is_list boolean"
        ),
    )
