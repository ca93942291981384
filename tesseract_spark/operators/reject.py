"""Word-level rejection + contextual output flips (reject.cpp).

The legacy engine's post-recognition word pass: ``make_reject_map``
(reject.cpp:96-180) decides per-character acceptance, and two
contextual repair heuristics fix the classic OCR confusions the shape
classifier cannot resolve alone:

- ``flip_0O`` (reject.cpp:658-764): 0<->O by alpha/digit context
  ("HELL0" -> "HELLO", "1O2" -> "102", "5,OOO" -> "5,000");
- ``flip_hyphens`` (reject.cpp:600-655): '.' <-> '-' by blob aspect
  ratio (a wide dot between letters is a hyphen);
- ``one_ell_conflict`` (reject.cpp:287-455): the I/l/1 conflict set —
  reject conflict characters unless word shape or a dictionary
  confirms them.

Everything here is a pure function over (text, per-char certainties,
per-glyph boxes, permuter, dict probe) so it runs identically inside
the page UDF (legacy engine wiring, operators/legacy.py), in a
DataFrame pass over word rows (``reject_words_pdf``), and under unit
test.  Parameter defaults are the reference's
(tesseractclass.cpp:207-215,370-387).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# tesseractclass.cpp:386,385,207-209,215
CONFLICT_SET_I_l_1 = "Il1[]"
OK_REPEATED_CH_NON_ALPHANUM = "-?*="
CHS_LEADING_PUNCT = "('`\""
CHS_TRAILING_PUNCT1 = ").,;:?!"
CHS_TRAILING_PUNCT2 = ")'`\""
QUALITY_MIN_INITIAL_ALPHAS = 2  # quality_min_initial_alphas_reqd
# tesseractclass.cpp:370-383
TESSEDIT_REJECT_MODE = 0
TESSEDIT_FLIP_0O = True
TESSEDIT_LOWER_FLIP_HYPHEN = 1.5
TESSEDIT_UPPER_FLIP_HYPHEN = 1.8
REJ_TRUST_DOC_DAWG = False
REJ_1IL_USE_DICT_WORD = False
REJ_1IL_TRUST_PERMUTER_TYPE = True
REJ_USE_TESS_ACCEPTED = True
REJ_USE_TESS_BLANKS = True
REJ_USE_GOOD_PERM = True
REJ_USE_SENSIBLE_WD = False
REJ_ALPHAS_IN_NUMBER_PERM = False
REJ_WHOLE_OF_MOSTLY_REJECT_FRACT = 0.85
MIN_SANE_X_HT_PIXELS = 8

# ACCEPTABLE_WERD_TYPE (control.h:38-46)
AC_UNACCEPTABLE = "unacceptable"
AC_LOWER_CASE = "lower"
AC_UPPER_CASE = "upper"
AC_INITIAL_CAP = "initial_cap"
AC_LC_ABBREV = "lc_abbrev"
AC_UC_ABBREV = "uc_abbrev"

# permuters a dawg confirmed (ratngs.h:235 names as used by
# lstm/langmodel.py attribution)
_DICT_PERMUTERS = ("system_dawg", "user_dawg", "freq_dawg")


class RejectMap:
    """REJMAP (rejctmap.h): one flag per character; a character is
    accepted until some mechanism rejects it.  ``flags[i]`` holds the
    rejection reason ('' = accepted); word-level setters reject every
    character with one reason."""

    def __init__(self, n: int):
        self.flags: list[str] = [""] * n

    def __len__(self) -> int:
        return len(self.flags)

    def accepted(self, i: int) -> bool:
        return self.flags[i] == ""

    def rejected(self, i: int) -> bool:
        return self.flags[i] != ""

    def setrej(self, i: int, reason: str) -> None:
        self.flags[i] = reason

    def accept(self, i: int) -> None:
        self.flags[i] = ""

    def rej_word(self, reason: str) -> None:
        self.flags = [reason] * len(self.flags)

    def reject_count(self) -> int:
        return sum(1 for f in self.flags if f)

    def as_string(self) -> str:
        """'A' per accepted char, 'R' per rejected — the words-table
        ``rejects`` column encoding."""
        return "".join("A" if f == "" else "R" for f in self.flags)


def first_alphanum_index(word: str) -> int:
    """reject.cpp:455-466 (ASCII graphemes: index == offset)."""
    for i, c in enumerate(word):
        if c.isalpha() or c.isdigit():
            return i
    return -1


def alpha_count(word: str) -> int:
    return sum(1 for c in word if c.isalpha())


def word_contains_non_1_digit(word: str) -> bool:
    return any(c.isdigit() and c != "1" for c in word)


def check_abbreviation(s: str, word_type: str) -> str:
    """control.cpp:1782-1810.  The reference's scan advances by FOUR
    characters per confirmed (letter, '.') pair — the
    ``offset += lengths[offset++]`` double-postfix — so only chars
    0-1 of each 4-stride are examined; ported as-is (single-byte
    graphemes make index == offset)."""
    if word_type != AC_UNACCEPTABLE or not s:
        return word_type
    offset = 0
    if s[0].isupper():
        word_type = AC_UC_ABBREV
        while (
            offset < len(s)
            and s[offset].isupper()
            and offset + 1 < len(s)
            and s[offset + 1] == "."
        ):
            offset += 4
    elif s[0].islower():
        word_type = AC_LC_ABBREV
        while (
            offset < len(s)
            and s[offset].islower()
            and offset + 1 < len(s)
            and s[offset + 1] == "."
        ):
            offset += 4
    if offset < len(s):
        word_type = AC_UNACCEPTABLE
    return word_type


def acceptable_word_string(s: str) -> str:
    """control.cpp:1700-1780: is the string a well-formed word shape —
    [leading punct] CAPS | [Cap]lower[-lower|'s] [trailing punct] —
    or a dotted abbreviation."""
    if len(s) > 20:
        return AC_UNACCEPTABLE
    i = 0
    word_type = AC_UNACCEPTABLE
    if i < len(s) and s[i] in CHS_LEADING_PUNCT:
        i += 1
    leading_punct_count = i
    upper_count = 0
    while i < len(s) and s[i].isupper():
        i += 1
        upper_count += 1
    if upper_count > 1:
        word_type = AC_UPPER_CASE
    else:
        while i < len(s) and s[i].islower():
            i += 1
        if i - leading_punct_count < QUALITY_MIN_INITIAL_ALPHAS:
            return check_abbreviation(s, AC_UNACCEPTABLE)
        if i < len(s) and s[i] == "-":
            hyphen_pos = i
            i += 1
            if i < len(s):
                while i < len(s) and s[i].islower():
                    i += 1
                if i < hyphen_pos + 3:
                    return check_abbreviation(s, AC_UNACCEPTABLE)
        elif i + 1 < len(s) and s[i] == "'" and s[i + 1] == "s":
            i += 2
        word_type = AC_INITIAL_CAP if upper_count > 0 else AC_LOWER_CASE
    if i < len(s) and s[i] in CHS_TRAILING_PUNCT1:
        i += 1
    if (
        i < len(s)
        and i > 0
        and s[i - 1] != s[i]
        and s[i] in CHS_TRAILING_PUNCT2
    ):
        i += 1
    if i < len(s):
        word_type = AC_UNACCEPTABLE
    return check_abbreviation(s, word_type)


def compute_reject_threshold(certs: list[float]) -> float:
    """reject.cpp:227-258: the biggest gap in the sorted per-char
    certainties; chars below gapstart + gap/2 are poor matches.
    Under 3 chars: threshold below the minimum (nothing rejects).
    Empty input (a degraded-page marker row's empty word never reaches
    this in the reference — WERD_RES without a best choice is skipped)
    rejects nothing."""
    ratings = sorted(certs)
    if not ratings:
        return float("-inf")
    gapstart = ratings[0] - 1
    bestgap = 0.0
    if len(ratings) >= 3:
        for i in range(len(ratings) - 1):
            if ratings[i + 1] - ratings[i] > bestgap:
                bestgap = ratings[i + 1] - ratings[i]
                gapstart = ratings[i]
    return gapstart + bestgap / 2


def reject_blanks(word: str, rej: RejectMap) -> None:
    """reject.cpp:182-193: unrecognised blobs decode as ' '."""
    for i, c in enumerate(word):
        if c == " ":
            rej.setrej(i, "tess_failure")


def reject_I_1_L(word: str, rej: RejectMap) -> None:
    """reject.cpp:195-206."""
    for i, c in enumerate(word):
        if c in CONFLICT_SET_I_l_1:
            rej.setrej(i, "1Il_conflict")


def reject_poor_matches(word: str, certs: list[float], rej: RejectMap) -> None:
    """reject.cpp:208-225."""
    threshold = compute_reject_threshold(certs)
    for i, c in enumerate(word):
        if c == " ":
            rej.setrej(i, "tess_failure")
        elif certs[i] < threshold:
            rej.setrej(i, "poor_match")


def safe_dict_word(word: str, dict_probe) -> int:
    """reject.cpp:30-34,591-595: dict confirmation that refuses to
    trust the document dawg.  ``dict_probe(word) -> permuter name or
    None``; returns 0 unless a non-doc dawg accepts."""
    if dict_probe is None:
        return 0
    p = dict_probe(word)
    if p is None or p == "doc_dawg":
        return 0
    return 1


def one_ell_conflict(
    word: str,
    update_map: bool,
    rej: RejectMap | None,
    permuter: str = "top_choice",
    dict_probe=None,
) -> tuple[bool, str]:
    """reject.cpp:287-455.  Returns (conflict, possibly-flipped word):
    the leading-I/l dictionary branches mutate the string when the
    flip IS the dictionary word (the reference edits unichar_string in
    place)."""
    if not any(c in CONFLICT_SET_I_l_1 for c in word):
        return False, word
    # any confirmed alphanumeric OUTSIDE the conflict set?
    non_conflict = any(
        (c.isalpha() or c.isdigit()) and c not in CONFLICT_SET_I_l_1
        for c in word
    )
    if not non_conflict:
        if update_map and rej is not None:
            reject_I_1_L(word, rej)
        return True, word

    dict_perm_type = permuter in _DICT_PERMUTERS or (
        REJ_TRUST_DOC_DAWG and permuter == "doc_dawg"
    )
    dict_word_ok = safe_dict_word(word, dict_probe) > 0

    def flipped_at(i: int, c: str) -> str:
        return word[:i] + c + word[i + 1 :]

    fa = first_alphanum_index(word)
    if (
        (REJ_1IL_USE_DICT_WORD and dict_word_ok)
        or (REJ_1IL_TRUST_PERMUTER_TYPE and dict_perm_type)
        or (dict_perm_type and dict_word_ok)
    ):
        # dawg-accepted word with a leading I/l: if the flipped
        # alternative is ALSO a dictionary word the char is ambiguous
        if fa >= 0 and word[fa] == "I":
            if safe_dict_word(flipped_at(fa, "l"), dict_probe) > 0:
                if update_map and rej is not None:
                    rej.setrej(fa, "1Il_conflict")
                return True, word
            return False, word
        if fa >= 0 and word[fa] == "l":
            if safe_dict_word(flipped_at(fa, "I"), dict_probe) > 0:
                if update_map and rej is not None:
                    rej.setrej(fa, "1Il_conflict")
                return True, word
            return False, word
        return False, word

    # regardless of permuter: flipping a leading I/l that GENERATES a
    # dictionary word repairs the string (reject.cpp:385-404)
    if fa >= 0 and word[fa] == "l":
        cand = flipped_at(fa, "I")
        if safe_dict_word(cand, dict_probe) > 0:
            return False, cand
    elif fa >= 0 and word[fa] == "I":
        cand = flipped_at(fa, "l")
        if safe_dict_word(cand, dict_probe) > 0:
            return False, cand

    if word_contains_non_1_digit(word):
        allow_1s = alpha_count(word) == 0 or permuter == "number"
        conflict = False
        for i, c in enumerate(word):
            if (not allow_1s or c != "1") and c in CONFLICT_SET_I_l_1:
                if update_map and rej is not None:
                    rej.setrej(i, "1Il_conflict")
                conflict = True
        return conflict, word

    word_type = acceptable_word_string(word)
    if word_type in (AC_LOWER_CASE, AC_INITIAL_CAP):
        if fa >= 0 and word[fa] in CONFLICT_SET_I_l_1:
            if update_map and rej is not None:
                rej.setrej(fa, "1Il_conflict")
            return True, word
        return False, word
    if word_type == AC_UPPER_CASE:
        return False, word
    if update_map and rej is not None:
        reject_I_1_L(word, rej)
    return True, word


def dont_allow_1Il(word: str, rej: RejectMap) -> None:
    """reject.cpp:511-538: don't leave LONE accepted conflict-set
    chars — if every accepted alphanumeric is from the conflict set,
    reject them all."""
    accepted_1Il = False
    for i, c in enumerate(word):
        if rej.accepted(i):
            if c in CONFLICT_SET_I_l_1:
                accepted_1Il = True
            elif c.isalpha() or c.isdigit():
                return
    if not accepted_1Il:
        return
    for i, c in enumerate(word):
        if c in CONFLICT_SET_I_l_1 and rej.accepted(i):
            rej.setrej(i, "postNN_1Il")


def count_alphanums(word: str, rej: RejectMap) -> int:
    """reject.cpp:540-552 (accepted alphanumerics only)."""
    return sum(
        1
        for i, c in enumerate(word)
        if rej.accepted(i) and (c.isalpha() or c.isdigit())
    )


def reject_mostly_rejects(rej: RejectMap) -> None:
    """reject.cpp:554-561."""
    if not len(rej):
        return
    if rej.reject_count() / len(rej) >= REJ_WHOLE_OF_MOSTLY_REJECT_FRACT:
        self_flags = [
            f if f else "mostly_rej" for f in rej.flags
        ]
        rej.flags = self_flags


def repeated_nonalphanum_wd(word: str, all_chars_good: bool = True) -> bool:
    """reject.cpp:563-589: a run of one allowed non-alphanumeric
    character ('-?*=') whose every blob read cleanly.
    ``all_chars_good``: the word_char_quality verdict (every char's
    outline matched well) — the caller's docqual statistic."""
    if len(word) <= 1:
        return False
    if word[0] not in OK_REPEATED_CH_NON_ALPHANUM:
        return False
    if any(c != word[0] for c in word[1:]):
        return False
    return all_chars_good


def set_done(
    word: str,
    permuter: str,
    tess_accepted: bool,
    dangerous_ambig: bool = False,
    dict_probe=None,
    pass_n: int = 1,
) -> bool:
    """reject.cpp:62-86: word-level acceptance."""
    done = tess_accepted and " " not in word
    word_from_dict = permuter in _DICT_PERMUTERS
    if done and pass_n == 1 and (not word_from_dict or dangerous_ambig):
        conflict, _w = one_ell_conflict(
            word, False, None, permuter, dict_probe
        )
        if conflict:
            done = False
    if done and (
        (not word_from_dict and permuter != "number") or dangerous_ambig
    ):
        done = False
    return done


def flip_0O(
    word: str,
    boxes: list[tuple[int, int, int, int]] | None = None,
    baseline: float | None = None,
    x_height: float | None = None,
    enabled: frozenset | None = None,
) -> str:
    """reject.cpp:658-764: contextual 0 <-> O repair.

    ``boxes`` (l, t, r, b in page coords, y down) + ``baseline`` +
    ``x_height`` drive the sub/superscript guard: any upper/digit
    glyph NOT spanning the full cap band (top near baseline - x_height,
    bottom near the baseline) vetoes the whole word (the reference's
    BLN-frame test, reject.cpp:669-678).  Without boxes the guard is
    vacuous (x-height-normalized strips upstream).
    """
    if enabled is None:
        enabled = frozenset(word) | {"0", "O"}
    if "0" not in enabled or "O" not in enabled:
        return word
    if boxes is not None and baseline is not None and x_height is not None:
        # EXACT BLN-frame test (reject.cpp:669-678): each upper/digit
        # glyph must have top >= kBlnBaselineOffset + kBlnXHeight and
        # bottom <= kBlnBaselineOffset + kBlnXHeight/4, else beware
        # words with sub/superscripts
        from ..functions.denorm import (
            K_BLN_BASELINE_OFFSET,
            K_BLN_X_HEIGHT,
            row_bln_denorm,
        )

        d = row_bln_denorm(baseline, x_height)
        for c, (_l, t, _r, b) in zip(word, boxes):
            if c.isupper() or c.isdigit():
                # y-down page box: top t -> BLN top, bottom b -> BLN bot
                _x, bln_top = d.norm_int((0, t))
                _x, bln_bot = d.norm_int((0, b))
                if (
                    bln_top < K_BLN_BASELINE_OFFSET + K_BLN_X_HEIGHT
                    or bln_bot > K_BLN_BASELINE_OFFSET + K_BLN_X_HEIGHT // 4
                ):
                    return word

    def non_O_upper(c: str) -> bool:
        return c.isupper() and c != "O"

    def non_0_digit(c: str) -> bool:
        return c.isdigit() and c != "0"

    s = list(word)
    i = 1
    n = len(s)
    while i < n:
        if s[i] in ("0", "O"):
            # A0A
            if (
                i + 1 < n
                and non_O_upper(s[i - 1])
                and non_O_upper(s[i + 1])
            ):
                s[i] = "O"
            # A00A — the reference flips ONLY position i and skips the
            # next char ("A00A" -> "AO0A", reject.cpp:689-697: one
            # set_unichar_id then i++); ported as-is
            if (
                non_O_upper(s[i - 1])
                and i + 1 < n
                and s[i + 1] in ("0", "O")
                and i + 2 < n
                and non_O_upper(s[i + 2])
            ):
                s[i] = "O"
                i += 1
            # AA0<non digit/l/I or end>
            if (
                i > 1
                and non_O_upper(s[i - 2])
                and non_O_upper(s[i - 1])
                and (
                    (
                        i + 1 < n
                        and not s[i + 1].isdigit()
                        and s[i + 1] not in ("l", "I")
                    )
                    or i == n - 1
                )
            ):
                s[i] = "O"
            # 9O9
            if (
                non_0_digit(s[i - 1])
                and i + 1 < n
                and non_0_digit(s[i + 1])
            ):
                s[i] = "0"
            # 9OOO
            if (
                non_0_digit(s[i - 1])
                and i + 2 < n
                and s[i + 1] in ("0", "O")
                and s[i + 2] in ("0", "O")
            ):
                s[i] = "0"
                s[i + 1] = "0"
                s[i + 2] = "0"
                i += 2
            # 9OO<non upper>
            elif (
                non_0_digit(s[i - 1])
                and i + 2 < n
                and s[i + 1] in ("0", "O")
                and not s[i + 2].isupper()
            ):
                s[i] = "0"
                s[i + 1] = "0"
                i += 1
            # 9O<non upper>  (also covers 9O at end? no: needs i+1)
            elif (
                non_0_digit(s[i - 1])
                and i + 1 < n
                and not s[i + 1].isupper()
            ):
                s[i] = "0"
            # 9[.,]OOO...
            if (
                i > 1
                and s[i - 1] in (".", ",")
                and (s[i - 2].isdigit() or s[i - 2] == "O")
            ):
                if s[i - 2] == "O":
                    s[i - 2] = "0"
                while i < n and s[i] in ("0", "O"):
                    s[i] = "0"
                    i += 1
                i -= 1
        i += 1
    return "".join(s)


def flip_hyphens(
    word: str,
    boxes: list[tuple[int, int, int, int]],
    x_scale: float,
    rej: RejectMap | None = None,
    lower: float = TESSEDIT_LOWER_FLIP_HYPHEN,
    upper: float = TESSEDIT_UPPER_FLIP_HYPHEN,
    dash_enabled: bool = True,
) -> str:
    """reject.cpp:600-655: '.' read where the blob is hyphen-shaped
    (wide, isolated) becomes '-'; marginal aspect ratios mark the
    reject map instead.  ``x_scale``: page px per normalized unit (the
    denorm.x_scale analogue — the row scale)."""
    if lower <= 1:
        return word
    s = list(word)
    prev_right = -(10 ** 9)
    n = min(len(s), len(boxes))
    for i in range(n):
        l, t, r, b = boxes[i]
        next_left = boxes[i + 1][0] if i + 1 < n else 10 ** 9
        w_px = r - l
        h_px = max(1, b - t)
        if w_px > 8 * x_scale and l > prev_right and r < next_left:
            aspect = w_px / float(h_px)
            if s[i] == ".":
                if aspect >= upper and dash_enabled:
                    s[i] = "-"  # certain hyphen
                    if rej is not None and rej.rejected(i):
                        rej.accept(i)
                if aspect > lower and rej is not None and rej.accepted(i):
                    rej.setrej(i, "hyphen")  # suspected
            elif s[i] == "-":
                if aspect >= upper and rej is not None and rej.rejected(i):
                    rej.accept(i)  # certain hyphen
                if aspect <= lower and rej is not None and rej.accepted(i):
                    rej.setrej(i, "hyphen")  # suspected
        prev_right = r
    return "".join(s)


@dataclass
class RejectedWord:
    """make_reject_map output: the (possibly flipped) text + map."""

    text: str
    rej: RejectMap
    done: bool = False


def make_reject_map(
    word: str,
    certs: list[float],
    permuter: str = "top_choice",
    tess_accepted: bool = True,
    dangerous_ambig: bool = False,
    dict_probe=None,
    boxes: list[tuple[int, int, int, int]] | None = None,
    baseline: float | None = None,
    x_height: float | None = None,
    x_height_px: float | None = None,
    x_scale: float = 1.0,
    mode: int = TESSEDIT_REJECT_MODE,
    pass_n: int = 1,
) -> RejectedWord:
    """reject.cpp:96-180: flip_0O, acceptance, per-char rejection
    (mode 0 = Ray's biggest-gap heuristic on non-done words; mode 5 =
    the unpacked independent mechanisms), then flip_hyphens."""
    word = flip_0O(word, boxes, baseline, x_height)
    done = set_done(
        word, permuter, tess_accepted, dangerous_ambig, dict_probe, pass_n
    )
    rej = RejectMap(len(word))
    reject_blanks(word, rej)
    if mode == 0:
        if not done:
            reject_poor_matches(word, certs, rej)
    elif mode == 5:
        if x_height_px is not None and x_height_px <= MIN_SANE_X_HT_PIXELS:
            rej.rej_word("small_xht")
        else:
            _c, word = one_ell_conflict(word, True, rej, permuter, dict_probe)
            if REJ_USE_TESS_ACCEPTED and not tess_accepted:
                rej.rej_word("not_tess_accepted")
            if REJ_USE_TESS_BLANKS and " " in word:
                rej.rej_word("contains_blanks")
            if REJ_USE_GOOD_PERM:
                if permuter in _DICT_PERMUTERS and (
                    not REJ_USE_SENSIBLE_WD
                    or acceptable_word_string(word) != AC_UNACCEPTABLE
                ):
                    pass  # PASSED TEST
                elif permuter == "number":
                    if REJ_ALPHAS_IN_NUMBER_PERM:
                        for i, c in enumerate(word):
                            if rej.accepted(i) and c.isalpha():
                                rej.setrej(i, "bad_permuter")
                else:
                    rej.rej_word("bad_permuter")
    else:
        raise ValueError(f"BAD tessedit_reject_mode {mode}")
    if boxes is not None:
        word = flip_hyphens(word, boxes, x_scale, rej)
    return RejectedWord(text=word, rej=rej, done=done)


def reject_words(words, mode: int = TESSEDIT_REJECT_MODE):
    """make_reject_map over a words DataFrame: appends ``text``
    (flip-repaired) and ``rejects`` ('A'/'R' per character — the
    REJMAP) columns computed from each row's text, permuter and
    per-symbol choices.

    Per-char certainties come from the choice lattice when the row
    carries one (top-choice confidence mapped onto the reference's
    [-20, 0] certainty scale) and otherwise fall back to the word
    confidence uniformly — the same derivation the OSD script vote
    uses.  Zero-shuffle: one mapInPandas over Arrow batches; the
    per-word work is O(word length)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(words.schema.fields)
        + [T.StructField("rejects", T.StringType())]
    )

    def batch(it):
        for pdf in it:
            texts, rejects = [], []
            for text, conf, permuter, choices in zip(
                pdf["text"], pdf["conf"], pdf["permuter"], pdf["choices"]
            ):
                text = text or ""
                if choices is not None and len(choices) == len(text):
                    certs = [
                        (float(sym[0]["conf"]) / 100.0 - 1.0) * 20.0
                        if len(sym)
                        else -20.0
                        for sym in choices
                    ]
                else:
                    certs = [(float(conf) / 100.0 - 1.0) * 20.0] * len(
                        text
                    )
                rw = make_reject_map(
                    text,
                    certs,
                    permuter=permuter or "top_choice",
                    tess_accepted=True,
                    mode=mode,
                )
                texts.append(rw.text)
                rejects.append(rw.rej.as_string())
            pdf = pdf.assign(text=texts, rejects=rejects)
            yield pdf[[f.name for f in out_schema.fields]]

    return words.mapInPandas(batch, schema=out_schema)
