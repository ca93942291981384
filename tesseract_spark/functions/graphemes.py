"""Grapheme validation and segmentation — Validator analogue.

Re-expresses the reference's training-text validator
(src/training/unicharset/validator.cpp, validate_grapheme.cpp,
validate_indic.cpp) in Python for use inside Arrow-batched UDFs and the
corpus-quality queries.  A 100 TB training-text pipeline needs exactly
this pass: badly formed Indic vowel pairs, double viramas, Thai
tone-mark misplacement and lonely joiners silently poison recognition
training sets; this operator counts and flags them per document.

Scope: the full validator family — the generic pair-rule validator
(validate_grapheme.cpp), the ISCII Indic family validator
(validate_indic.cpp, Devanagari..Sinhala), the Khmer and Myanmar
syllable validators (validate_khmer/myanmar.cpp — both passing the
reference's own unittest fixtures with exact per-mode grapheme counts)
and the Javanese validator (validate_javanese.cpp, pengkal/cakra
medials + tarung two-part vowels).

ICU replacements (cross-checked against the reference call sites):
- u_hasBinaryProperty(UCHAR_GRAPHEME_LINK) -> canonical combining class 9
  (unicodedata.combining == 9), the definition of Grapheme_Link.
- u_charType in {NON_SPACING_MARK, ENCLOSING_MARK, COMBINING_SPACING_MARK}
  -> unicodedata.category in {Mn, Me, Mc}.
- uscript_getScript COMMON/INHERITED exceptions inside the Indic range:
  danda/double danda U+0964/5 and the Devanagari vedic accents
  U+0951-4 (script=Inherited) do not vote for a virama script.
"""

from __future__ import annotations

import unicodedata

# validator.cpp:20-25
ZWS = "​"
ZWNJ = "‌"
ZWJ = "‍"
LRM = "‎"
RLM = "‏"
INVALID = "�"

# validator.h:55-70 ViramaScript — codepage base of each virama script
NONVIRAMA = 0
DEVANAGARI = 0x900
BENGALI = 0x980
GURMUKHI = 0xA00
GUJARATI = 0xA80
ORIYA = 0xB00
TAMIL = 0xB80
TELUGU = 0xC00
KANNADA = 0xC80
MALAYALAM = 0xD00
SINHALA = 0xD80
MYANMAR = 0x1000
KHMER = 0x1780
JAVANESE = 0xA980

_CODEPAGE = 128  # validator.h kIndicCodePageSize
_MIN_INDIC = 0x900
_MAX_SINHALA = 0xDFF
_MAX_JAVANESE = 0xA9DF
# validator.h:215-218
_SINHALA_VIRAMA = 0x0DCA
_MYANMAR_VIRAMA = 0x1039
_KHMER_VIRAMA = 0x17D2
_JAVANESE_VIRAMA = 0xA9C0
_YAYANA = 0x0DBA  # validate_indic.h:37
_RAYANA = 0x0DBB

# CharClass (validator.h:118-134) as one-char codes, same mnemonics
C_CONSONANT = "C"
C_VOWEL = "V"
C_VIRAMA = "H"
C_MATRA = "M"
C_MATRA_PIECE = "P"
C_VOWEL_MOD = "D"
C_ZWNJ = "z"
C_ZWJ = "Z"
C_VEDIC = "v"
C_NUKTA = "N"
C_ROBAT = "R"
C_OTHER = "O"
C_WHITESPACE = " "
C_COMBINER = "c"

# grapheme-mode names (validator.h:36-50)
SINGLE_STRING = "single_string"
COMBINED = "combined"
GLYPH_SPLIT = "glyph_split"
INDIVIDUAL = "individual"


def is_virama(cp: int) -> bool:
    """validator.cpp:169-174."""
    return (
        _MIN_INDIC <= cp <= _MAX_SINHALA and (cp & 0x7F) == 0x4D
    ) or cp in (_SINHALA_VIRAMA, _JAVANESE_VIRAMA, _MYANMAR_VIRAMA, _KHMER_VIRAMA)


def is_vedic_accent(cp: int) -> bool:
    """validator.cpp:178-181."""
    return (
        0x1CD0 <= cp < 0x1D00
        or 0xA8E0 <= cp <= 0xA8F7
        or 0x951 <= cp <= 0x954
    )


# Common/Inherited codepoints inside the Indic range that must not vote
# for a virama script (uscript_getScript analogue)
_INDIC_COMMON = frozenset([0x964, 0x965]) | frozenset(range(0x951, 0x955)) | \
    frozenset(range(0x1CD0, 0x1D00))


def most_frequent_virama_script(cps: list[int]) -> int:
    """validator.cpp:135-165 — histogram of Indic codepages, Myanmar folded
    onto its base page; returns the winning ViramaScript base or NONVIRAMA."""
    hist: dict[int, int] = {}
    for cp in cps:
        if _MIN_INDIC <= cp <= _MAX_JAVANESE and cp not in _INDIC_COMMON:
            base = cp // _CODEPAGE
            if 0x1000 <= cp <= 0x109F or 0xA9E0 <= cp <= 0xA9FF:
                base = MYANMAR // _CODEPAGE
            hist[base] = hist.get(base, 0) + 1
    if hist:
        base = max(hist.items(), key=lambda kv: kv[1])[0] * _CODEPAGE
        if base in (MYANMAR, JAVANESE, KHMER) or DEVANAGARI <= base <= SINHALA:
            return base
    return NONVIRAMA


class Validator:
    """Base bookkeeping — mirrors validator.h:170-213 output_/parts_
    mechanics so the consume helpers read one-to-one against the C++."""

    def __init__(self, script: int):
        self.script = script
        self.codes: list[tuple[str, int]] = []
        self.parts: list[list[int]] = []
        self.output: list[int] = []
        self.codes_used = 0
        self.output_used = 0

    # --- helpers (validator.h:173-199) ---

    def code_only_to_output(self) -> bool:
        self.output.append(self.codes[self.codes_used][1])
        self.codes_used += 1
        return self.codes_used == len(self.codes)

    def multi_code_part(self, length: int) -> None:
        while self.output_used + length < len(self.output):
            self.parts.append([self.output[self.output_used]])
            self.output_used += 1
        self.parts.append([self.output[self.output_used]])
        self.output_used += 1
        while self.output_used < len(self.output):
            self.parts[-1].append(self.output[self.output_used])
            self.output_used += 1

    def use_multi_code(self, length: int) -> bool:
        self.output.append(self.codes[self.codes_used][1])
        self.multi_code_part(length)
        self.codes_used += 1
        return self.codes_used == len(self.codes)

    # --- the per-script grammar ---

    def consume_grapheme_if_valid(self) -> bool:  # pragma: no cover
        raise NotImplementedError

    def unicode_to_charclass(self, cp: int) -> str:  # pragma: no cover
        raise NotImplementedError

    # --- driver (validator.cpp:85-131) ---

    def validate_clean_segment(
        self, g_mode: str, cps: list[int], dest: list[list[int]]
    ) -> bool:
        self.codes = [(self.unicode_to_charclass(c), c) for c in cps]
        self.parts, self.output = [], []
        self.codes_used = self.output_used = 0
        success = True
        while self.codes_used < len(self.codes):
            if not self.consume_grapheme_if_valid():
                success = False
                self.codes_used += 1
        self._move_results(g_mode, dest)
        return success

    def _move_results(self, g_mode: str, dest: list[list[int]]) -> None:
        if g_mode == INDIVIDUAL:
            dest.extend([c] for c in self.output)
        elif g_mode == GLYPH_SPLIT:
            dest.extend(self.parts)
        elif g_mode == COMBINED or not dest:
            dest.append(list(self.output))
        else:  # kNone / single-string continuation
            dest[-1].extend(self.output)


class GraphemeValidator(Validator):
    """validate_grapheme.cpp — generic base+combiner segmentation with the
    hard-won Indic-vowel and Thai pair rejection tables."""

    def unicode_to_charclass(self, cp: int) -> str:
        # validate_grapheme.cpp:57-80
        if is_vedic_accent(cp):
            return C_VEDIC
        if unicodedata.combining(chr(cp)) == 9:  # Grapheme_Link = virama
            return C_VIRAMA
        if chr(cp).isspace():
            return C_WHITESPACE
        if cp == 0xA9BA:  # Javanese Taling workaround
            return C_CONSONANT
        if unicodedata.category(chr(cp)) in ("Mn", "Me", "Mc") or cp in (
            0x200C,
            0x200D,
        ):
            return C_COMBINER
        return C_OTHER

    def consume_grapheme_if_valid(self) -> bool:
        # validate_grapheme.cpp:7-55
        prev_prev, prev, prev_cc = 0x20, 0x20, C_WHITESPACE
        n_in_grapheme = 0
        while self.codes_used < len(self.codes):
            cc, cp = self.codes[self.codes_used]
            is_combiner = cc in (C_COMBINER, C_VIRAMA)
            if prev_cc == C_VIRAMA and cc == C_VIRAMA:
                return False  # two grapheme links in a row
            if (
                prev_cc != C_WHITESPACE
                and cc != C_WHITESPACE
                and _is_badly_formed(prev, cp)
            ):
                return False
            prev_is_fwd = (
                prev == 0x200D
                or prev_cc == C_VIRAMA
                or (prev == 0x200C and (cc == C_VIRAMA or prev_prev == 0x200D))
            )
            if n_in_grapheme > 0 and not is_combiner and not prev_is_fwd:
                break
            self.code_only_to_output()
            n_in_grapheme += 1
            prev_prev, prev, prev_cc = prev, cp, cc
        if n_in_grapheme > 0:
            self.multi_code_part(n_in_grapheme)
        return True


# validate_grapheme.cpp:111-126 — analytically decomposed Indic vowel pairs
# renderers reject
_BAD_INDIC_PAIRS = (
    lambda p, c: p == 0x905 and c in (0x946, 0x93E),
    lambda p, c: p == 0x909 and c == 0x941,
    lambda p, c: p == 0x90F and 0x945 <= c <= 0x947,
    lambda p, c: p == 0x905 and 0x949 <= c <= 0x94C,
    lambda p, c: p == 0x906 and 0x949 <= c <= 0x94C,
    lambda p, c: p == 0x93E and 0x945 <= c <= 0x948,
    lambda p, c: p == 0x94D and 0x93E <= c <= 0x94C,
    lambda p, c: p == 0x985 and c == 0x9BE,
    lambda p, c: p == 0xC12 and c in (0xC55, 0xC4C),
    lambda p, c: p == 0xC92 and c == 0xCCC,
)


def _is_thai_consonant(c: int) -> bool:
    return 0xE01 <= c <= 0xE2E


def _is_thai_before_consonant_vowel(c: int) -> bool:
    return 0xE40 <= c <= 0xE44


def _is_thai_tone_mark(c: int) -> bool:
    return 0xE48 <= c <= 0xE4B


def _is_thai_tonable_vowel(c: int) -> bool:
    return 0xE34 <= c <= 0xE39 or c == 0xE31


def _is_badly_formed_thai(p: int, c: int) -> bool:
    """validate_grapheme.cpp:155-192 — native-speaker Thai sequence rules."""
    if _is_thai_tone_mark(c) and not (
        _is_thai_consonant(p) or _is_thai_tonable_vowel(p)
    ):
        return True
    if (_is_thai_tonable_vowel(c) or c == 0xE47) and not _is_thai_consonant(p):
        return True
    if c == 0xE4C and not (_is_thai_consonant(p) or p in (0xE38, 0xE34)):
        return True
    if c == 0xE4D and not (_is_thai_consonant(p) or p in (0xE48, 0xE49)):
        return True
    if (
        c in (0xE30, 0xE32, 0xE33)
        and not (_is_thai_consonant(p) or _is_thai_tone_mark(p))
        and not (p == 0xE32 and c == 0xE30)
        and not (p == 0xE4D and c == 0xE32)
    ):
        return True
    if _is_thai_before_consonant_vowel(c) and (
        _is_thai_before_consonant_vowel(p) or p in (0xE31, 0xE37)
    ):
        return True
    if 0xE30 <= c <= 0xE4D and p == 0xE24:
        return True
    return False


def _is_badly_formed(p: int, c: int) -> bool:
    return any(rule(p, c) for rule in _BAD_INDIC_PAIRS) or _is_badly_formed_thai(
        p, c
    )


class IndicValidator(Validator):
    """validate_indic.cpp — the ISCII consonant/vowel grapheme grammar:
    vowel grapheme V[D](v)*; consonant grapheme
    (C[N](H|HZ|Hz|ZH)?)*C[N](H|Hz)?[M[P]][D](v)*."""

    # the post-virama medial conjunct characters (Sinhala yansaya /
    # rakaransaya; Javanese overrides with pengkal/cakra) and the
    # stand-alone-repaya base
    _MEDIALS: tuple[int, int] = (_YAYANA, _RAYANA)
    _REPAYA: int = _RAYANA

    def unicode_to_charclass(self, cp: int) -> str:
        # validate_indic.cpp:46-143
        if is_vedic_accent(cp):
            return C_VEDIC
        if cp == 0x200C:
            return C_ZWNJ
        if cp == 0x200D:
            return C_ZWJ
        off = cp - self.script
        if off < 0 or off >= _CODEPAGE:
            return C_OTHER
        if self.script == TAMIL and off == 0x03:
            return C_VOWEL  # aytham
        if off < 0x4:
            return C_VOWEL_MOD
        if self.script == SINHALA:
            if off <= 0x19:
                return C_VOWEL
            if off <= 0x49:
                return C_CONSONANT
            if off == 0x4A:
                return C_VIRAMA
            if off <= 0x5F:
                return C_MATRA
        else:
            if off <= 0x14 or off == 0x50:
                return C_VOWEL
            if off <= 0x3B or 0x58 <= off <= 0x5F:
                return C_CONSONANT
            if off == 0x3C:
                return C_NUKTA
            if off == 0x3D:
                return C_VOWEL  # avagraha
            if off <= 0x4C or 0x51 <= off <= 0x54:
                return C_MATRA
            if 0x55 <= off <= 0x57:
                return C_MATRA_PIECE
            if off == 0x4D:
                return C_VIRAMA
        if off in (0x60, 0x61):
            return C_VOWEL
        if off in (0x62, 0x63):
            return C_MATRA
        if self.script == TAMIL and 0x70 <= off <= 0x7A:
            return C_OTHER
        if self.script == BENGALI and off in (0x70, 0x71):
            return C_CONSONANT
        if self.script == GURMUKHI and off in (0x72, 0x73):
            return C_CONSONANT
        if self.script == SINHALA and off == 0x70:
            return C_CONSONANT
        if self.script == DEVANAGARI and off == 0x70:
            return C_OTHER
        if 0x70 <= off <= 0x73:
            return C_VOWEL_MOD
        return C_OTHER

    def _is_subscript_script(self) -> bool:
        # validator.cpp:184-188
        return self.script in (TELUGU, KANNADA, JAVANESE, MYANMAR, KHMER)

    def consume_grapheme_if_valid(self) -> bool:
        # validate_indic.cpp:18-44
        cc = self.codes[self.codes_used][0]
        if cc == C_CONSONANT:
            return (
                self._consume_consonant_head() and self._consume_consonant_tail()
            )
        if cc in (C_VOWEL, C_VEDIC):
            return self._consume_vowel()
        if cc in (C_ZWJ, C_ZWNJ):
            # isolated joiners outside an aksara are silently dropped
            self.codes_used += 1
            return True
        if cc == C_OTHER:
            self.use_multi_code(1)
            return True
        return False

    def _consume_virama(self, joiner: tuple[str, int], post_matra: bool) -> bool:
        # validate_indic.cpp:151-218
        num = len(self.codes)
        if joiner[0] == C_OTHER:
            self.code_only_to_output()
            if self.codes_used < num and self.codes[self.codes_used][1] == 0x200D:
                if post_matra:
                    return False  # ZWJ after a post-matra virama
                if (
                    self.codes_used + 1 < num
                    and self.codes[self.codes_used - 2][1] != self._REPAYA
                    and self.codes[self.codes_used + 1][1]
                    in (0x200C,) + self._MEDIALS
                ):
                    # picked up later (Sinhala conjuncts)
                    assert not self.code_only_to_output()
                else:
                    # half-form with optional nukta
                    length = len(self.output) + 1 - self.output_used
                    if self.use_multi_code(length):
                        return True
                if (
                    self.codes_used < num
                    and self.codes[self.codes_used][1] == 0x200C
                ):
                    if (
                        self.output_used == len(self.output)
                        or self.output[self.output_used] != self._REPAYA
                    ):
                        return False  # virama ZWJ ZWNJ outside Sinhala
                    if self.use_multi_code(4):  # stand-alone repaya
                        return True
            elif (
                self.codes_used == num
                or self.codes[self.codes_used][0] != C_CONSONANT
                or post_matra
            ):
                if (
                    self.codes_used == num
                    or self.codes[self.codes_used][1] != 0x200C
                ):
                    # normalize: always terminate explicit virama with ZWNJ
                    self.output.append(0x200C)
                else:
                    self.code_only_to_output()
                self.multi_code_part(2)  # explicit virama [H z]
        else:
            # pre-virama joiner [{Z|z} H] requests a specific conjunct
            if self.use_multi_code(2):
                return False  # no 2nd consonant
            if self.codes[self.codes_used][1] in (0x200D, 0x200C):
                return False  # JHJ
        return True

    def _consume_consonant_head(self) -> bool:
        # validate_indic.cpp:222-279
        num = len(self.codes)
        while True:
            self.code_only_to_output()
            # Sinhala [H Z Yayana/Rayana]
            idx = len(self.output) - 3
            if (
                self.output_used + 3 <= len(self.output)
                and self.output[-1] in self._MEDIALS
                and is_virama(self.output[idx])
                and self.output[idx + 1] == 0x200D
            ):
                self.multi_code_part(3)
            have_nukta = False
            if (
                self.codes_used < num
                and self.codes[self.codes_used][0] == C_NUKTA
            ):
                have_nukta = True
                self.code_only_to_output()
            # subscript conjunct
            idx = len(self.output) - 2 - have_nukta
            if (
                self.output_used + 2 + have_nukta <= len(self.output)
                and self._is_subscript_script()
                and is_virama(self.output[idx])
            ):
                self.multi_code_part(2 + have_nukta)
            joiner = (C_OTHER, 0)
            if self.codes_used < num and (
                self.codes[self.codes_used][1] == 0x200D
                or (
                    self.codes[self.codes_used][1] == 0x200C
                    and self.script == MALAYALAM
                )
            ):
                joiner = self.codes[self.codes_used]
                self.codes_used += 1
                if self.codes_used == num:
                    return True  # skipping ending joiner
                if self.codes[self.codes_used][0] == C_VIRAMA:
                    self.output.append(joiner[1])
                else:
                    joiner = (C_OTHER, 0)  # unnecessary joiner skipped
            if (
                self.codes_used < num
                and self.codes[self.codes_used][0] == C_VIRAMA
            ):
                if not self._consume_virama(joiner, False):
                    return False
            else:
                break
            if not (
                self.codes_used < num
                and self.codes[self.codes_used][0] == C_CONSONANT
            ):
                break
        if self.output_used < len(self.output):
            self.multi_code_part(1)
        return True

    def _consume_consonant_tail(self) -> bool:
        # validate_indic.cpp:283-325
        if self.codes_used == len(self.codes):
            return True
        if self.codes[self.codes_used][0] == C_MATRA:
            if self.use_multi_code(1):
                return True
            if self.codes[self.codes_used][0] == C_MATRA_PIECE:
                if self.use_multi_code(1):
                    return True
        while self.codes[self.codes_used][0] == C_VOWEL_MOD:
            if self.use_multi_code(1):
                return True
            if self.script != MALAYALAM or self.output[-1] != 0xD02:
                break
        while self.codes[self.codes_used][0] == C_VEDIC:
            if self.use_multi_code(1):
                return True
        if self.codes[self.codes_used][0] == C_VIRAMA:
            if not self._consume_virama((C_OTHER, 0), True):
                return False
        if self.output_used < len(self.output):
            self.multi_code_part(1)
        return True

    def _consume_vowel(self) -> bool:
        # validate_indic.cpp:329-347
        if self.use_multi_code(1):
            return True
        while self.codes[self.codes_used][0] == C_VOWEL_MOD:
            if self.use_multi_code(1):
                return True
            if self.script != MALAYALAM:
                break
        while self.codes[self.codes_used][0] == C_VEDIC:
            if self.use_multi_code(1):
                return True
        return True


class KhmerValidator(Validator):
    """validate_khmer.cpp — the Khmer syllable grammar from the unicode
    standard ch16 BNF, in CharClass codes:
    C {R | N} {HC {R}}* {{Z|z} M{P}} {D} {HC}
    (R = robat, N repurposed as the consonant shifters; independent
    vowels are folded into the consonant class)."""

    def unicode_to_charclass(self, cp: int) -> str:
        # validate_khmer.cpp:104-142
        if is_vedic_accent(cp):
            return C_VEDIC
        if cp == 0x200C:
            return C_ZWNJ
        if cp == 0x200D:
            return C_ZWJ
        off = cp - self.script
        if off < 0 or off >= _CODEPAGE:
            return C_OTHER
        if off <= 0x33:
            return C_CONSONANT
        if off <= 0x45:
            return C_MATRA
        if off == 0x46:
            return C_MATRA_PIECE
        if off == 0x4C:
            return C_ROBAT
        if off in (0x49, 0x4A):
            return C_NUKTA
        if off <= 0x51:
            return C_VOWEL_MOD
        if off == 0x52:
            return C_VIRAMA
        return C_OTHER

    def consume_grapheme_if_valid(self) -> bool:
        # validate_khmer.cpp:20-101
        codes, n = self.codes, len(self.codes)
        if self.codes_used == n:
            return False
        if codes[self.codes_used][0] == C_OTHER:
            self.use_multi_code(1)
            return True
        if codes[self.codes_used][0] != C_CONSONANT:
            return False  # invalid start of Khmer syllable
        if self.use_multi_code(1):
            return True
        if codes[self.codes_used][0] in (C_ROBAT, C_NUKTA):
            if self.use_multi_code(1):
                return True
        while (
            self.codes_used + 1 < n
            and codes[self.codes_used][0] == C_VIRAMA
            and codes[self.codes_used + 1][0] == C_CONSONANT
        ):
            assert not self.code_only_to_output()
            if self.use_multi_code(2):
                return True
            if codes[self.codes_used][0] == C_ROBAT:
                if self.use_multi_code(1):
                    return True
        num_matra_parts = 0
        if codes[self.codes_used][1] in (0x200C, 0x200D):
            if self.code_only_to_output():
                return False  # unterminated joiner
            num_matra_parts += 1
        # the matra piece is allowed as a matra on its own or in addition
        if codes[self.codes_used][0] in (C_MATRA, C_MATRA_PIECE):
            num_matra_parts += 1
            if self.use_multi_code(num_matra_parts):
                return True
        elif num_matra_parts:
            return False  # joiner with a non-dependent vowel after it
        if (
            codes[self.codes_used][0] == C_MATRA_PIECE
            and codes[self.codes_used - 1][0] != C_MATRA_PIECE
        ):
            if self.use_multi_code(1):
                return True
        if codes[self.codes_used][0] == C_VOWEL_MOD:
            if self.use_multi_code(1):
                return True
        if (
            self.codes_used + 1 < n
            and codes[self.codes_used][0] == C_VIRAMA
            and codes[self.codes_used + 1][0] == C_CONSONANT
        ):
            assert not self.code_only_to_output()
            if self.use_multi_code(2):
                return True
        return True


_MYANMAR_ASAT = 0x103A
_MYANMAR_MEDIAL_YA = 0x103B


def _is_myanmar_letter(cp: int) -> bool:
    """validate_myanmar.cpp:168-178 IsMyanmarLetter: consonants AND
    independent vowels, including the extension blocks."""
    return (
        0x1000 <= cp <= 0x102A or cp == 0x103F
        or 0x104C <= cp <= 0x1055 or 0x105A <= cp <= 0x105D
        or cp in (0x1061, 0x1065, 0x1066)
        or 0x106E <= cp <= 0x1070 or 0x1075 <= cp <= 0x1081
        or cp == 0x108E
        or 0xA9E0 <= cp <= 0xA9E4 or 0xA9E7 <= cp <= 0xA9EF
        or 0xA9FA <= cp <= 0xA9FE
        or 0xAA60 <= cp <= 0xAA6F or 0xAA71 <= cp <= 0xAA73
        or cp in (0xAA7A, 0xAA7E, 0xAA7F)
    )


def _is_myanmar_other(cp: int) -> bool:
    """validate_myanmar.cpp:183-194 IsMyanmarOther: non-Myanmar-script
    codepoints (uscript_getScript re-expressed as the three Myanmar
    blocks) plus digits/symbols/logograms that take no part in a
    syllable."""
    in_myanmar = (
        0x1000 <= cp <= 0x109F
        or 0xA9E0 <= cp <= 0xA9FF
        or 0xAA60 <= cp <= 0xAA7F
    )
    if not in_myanmar and cp not in (0x200C, 0x200D):
        return True
    return (
        0x1040 <= cp <= 0x104F or 0x1090 <= cp <= 0x1099
        or 0x109E <= cp <= 0x109F or 0xA9F0 <= cp <= 0xA9F9
        or cp in (0xA9E6, 0xAA70) or 0xAA74 <= cp <= 0xAA79
    )


class MyanmarValidator(Validator):
    """validate_myanmar.cpp — the Myanmar syllable walk of unicode table
    16-3: optional kinzi, a required base letter, at most one subscript
    consonant, then a long ordered chain of optional medials, vowel
    signs and tone marks.  Everything but the base is optional, so the
    base is the only place invalid input is detected."""

    def unicode_to_charclass(self, cp: int) -> str:
        # validate_myanmar.cpp:62-67 (no intermediate coding)
        return C_CONSONANT if _is_myanmar_letter(cp) else C_OTHER

    def consume_grapheme_if_valid(self) -> bool:
        # validate_myanmar.cpp:13-52
        codes, n = self.codes, len(self.codes)
        if self.codes_used == n:
            return True
        if _is_myanmar_other(codes[self.codes_used][1]):
            self.use_multi_code(1)
            return True
        # kinzi: NGA + asat + virama riding the next base
        if (
            self.codes_used + 2 < n
            and codes[self.codes_used][1] == 0x1004
            and codes[self.codes_used + 1][1] == _MYANMAR_ASAT
            and codes[self.codes_used + 2][1] == _MYANMAR_VIRAMA
        ):
            assert not self.code_only_to_output()
            assert not self.code_only_to_output()
            if self.use_multi_code(3):
                return True
        if _is_myanmar_letter(codes[self.codes_used][1]):
            if self.use_multi_code(1):
                return True
        else:
            return False  # a base letter is required
        if self._consume_subscript_if_present():
            return True
        self._consume_optional_signs_if_present()
        return True

    def _consume_subscript_if_present(self) -> bool:
        # validate_myanmar.cpp:71-84 — at most one subscript consonant
        codes, n = self.codes, len(self.codes)
        if (
            self.codes_used + 1 < n
            and codes[self.codes_used][1] == _MYANMAR_VIRAMA
            and _is_myanmar_letter(codes[self.codes_used + 1][1])
        ):
            assert not self.code_only_to_output()
            if self.use_multi_code(2):
                return True
        return False

    def _consume_optional_signs_if_present(self) -> bool:
        # validate_myanmar.cpp:88-160 — the ordered optional chain
        codes = self.codes

        def cur() -> int:
            return codes[self.codes_used][1]

        # medials (asat folded into medial-ya)
        for ch in (
            _MYANMAR_ASAT, _MYANMAR_MEDIAL_YA, 0x103C, 0x103D, 0x103E,
            0x105E, 0x105F, 0x1060, 0x1081, 0x1031,
        ):
            if cur() == ch:
                if self.use_multi_code(1):
                    return True
                if ch == _MYANMAR_MEDIAL_YA and cur() == _MYANMAR_ASAT:
                    if self.use_multi_code(1):
                        return True
        # vowel sign i, ii, ai
        if cur() in (0x102D, 0x102E, 0x1032):
            if self.use_multi_code(1):
                return True
        # vowel sign u, uu, and extensions
        ch = cur()
        if (
            ch in (0x102F, 0x1030, 0x1062, 0x1067, 0x1068, 0x109C, 0x109D)
            or 0x1056 <= ch <= 0x1059 or 0x1071 <= ch <= 0x1074
            or 0x1083 <= ch <= 0x1086
        ):
            if self.use_multi_code(1):
                return True
        # tall aa, aa with optional asat
        if cur() in (0x102B, 0x102C):
            if self.use_multi_code(1):
                return True
            if cur() == _MYANMAR_ASAT:
                if self.use_multi_code(1):
                    return True
        # anusvar, dot below, visarga — in sequence
        for ch in (0x1036, 0x1037, 0x1038):
            if cur() == ch:
                if self.use_multi_code(1):
                    return True
        # tone mark extensions
        ch = cur()
        if (
            ch in (0x102C, 0x1038, _MYANMAR_ASAT, 0x108F, 0x109A, 0x109B)
            or 0x1062 <= ch <= 0x1064 or 0x1069 <= ch <= 0x106D
            or 0x1087 <= ch <= 0x108D or 0xAA7B <= ch <= 0xAA7D
        ):
            if self.use_multi_code(1):
                return True
        # Sgaw tones need asat; W Pwo tones may take dot below / visarga
        if cur() in (_MYANMAR_ASAT, 0x1037, 0x1038):
            if self.use_multi_code(1):
                return True
        return False


_PENGKAL = 0xA9BE  # Javanese medial ya (validate_javanese.h:55)
_CAKRA = 0xA9BF  # Javanese medial ra


class JavaneseValidator(IndicValidator):
    """validate_javanese.cpp — the aksara jawa orthographic syllable
    [(V|C[N])(H)] (V|C[N]) [[N]N] [M[D]] [v]: the Indic consonant
    machinery with pengkal/cakra as the post-virama medials
    (in place of Sinhala yansaya/rakaransaya) and the tarung
    matra-piece repetition (taling + tarung two-part vowels,
    validate_javanese.cpp:220-229)."""

    _MEDIALS = (_PENGKAL, _CAKRA)
    _REPAYA = _CAKRA

    def unicode_to_charclass(self, cp: int) -> str:
        # validate_javanese.cpp:280-320
        if cp == 0x200C:
            return C_ZWNJ
        if cp == 0x200D:
            return C_ZWJ
        off = cp - self.script
        if off < 0 or off >= _CODEPAGE:
            return C_OTHER
        if off < 0x4:
            return C_VOWEL_MOD
        if off <= 0x32:
            return C_CONSONANT  # includes independent vowels
        if off == 0x33:
            return C_NUKTA  # A9B3 cecak telu
        if off == 0x34:
            return C_MATRA_PIECE  # A9B4 tarung (two-part vowels)
        if off <= 0x39:
            return C_MATRA
        if off == 0x3A:
            return C_CONSONANT  # A9BA taling — pre-base vowel
        if off <= 0x3D:
            return C_MATRA
        if off <= 0x3F:
            return C_NUKTA  # A9BE-A9BF pengkal/cakra medials
        if off == 0x40:
            return C_VIRAMA  # A9C0 pangkon
        return C_OTHER

    def _consume_consonant_tail(self) -> bool:
        # validate_javanese.cpp:206-255: as Indic, plus tarung may
        # repeat after a matra (taling + tarung long vowels)
        if self.codes_used == len(self.codes):
            return True
        if self.codes[self.codes_used][0] == C_MATRA:
            if self.use_multi_code(1):
                return True
            if self.codes[self.codes_used][0] == C_MATRA_PIECE:
                if self.use_multi_code(1):
                    return True
        while self.codes[self.codes_used][0] == C_MATRA_PIECE:
            if self.use_multi_code(1):
                return True
        while self.codes[self.codes_used][0] == C_VOWEL_MOD:
            if self.use_multi_code(1):
                return True
            break
        while self.codes[self.codes_used][0] == C_VEDIC:
            if self.use_multi_code(1):
                return True
        if self.codes[self.codes_used][0] == C_VIRAMA:
            if not self._consume_virama((C_OTHER, 0), True):
                return False
        if self.output_used < len(self.output):
            self.multi_code_part(1)
        return True


def script_validator(script: int) -> Validator:
    """validator.cpp:72-83 factory: every virama script has its
    reference validator."""
    if script == KHMER:
        return KhmerValidator(script)
    if script == MYANMAR:
        return MyanmarValidator(script)
    if script == JAVANESE:
        return JavaneseValidator(script)
    if script == NONVIRAMA:
        return GraphemeValidator(script)
    return IndicValidator(script)


def validate_clean_and_segment(
    g_mode: str, cps: list[int]
) -> tuple[bool, list[list[int]]]:
    """validator.cpp:41-68 ValidateCleanAndSegment."""
    dest: list[list[int]] = []
    script = most_frequent_virama_script(cps)
    if script == NONVIRAMA:
        # the grapheme segmenter's max segmentation is the grapheme unit,
        # so up the mode by one to get the desired effect
        g_mode = {COMBINED: GLYPH_SPLIT, GLYPH_SPLIT: INDIVIDUAL}.get(
            g_mode, g_mode
        )
        ok = GraphemeValidator(NONVIRAMA).validate_clean_segment(
            g_mode, cps, dest
        )
        return ok, dest
    graphemes: list[list[int]] = []
    ok = GraphemeValidator(NONVIRAMA).validate_clean_segment(
        GLYPH_SPLIT, cps, graphemes
    )
    v = script_validator(script)
    for g in graphemes:
        if not v.validate_clean_segment(g_mode, g, dest):
            ok = False
    return ok, dest


def normalize_clean_and_segment(
    text: str, u_mode: str = "nfc", ocr: bool = False, g_mode: str = COMBINED
) -> tuple[bool, list[str]]:
    """normstrngs.cpp:173-201 NormalizeCleanAndSegmentUTF8: normal form +
    zero-width skip + letterless StripJoiners, validate, and re-segment if
    cleanup changed the string."""
    from tesseract_spark.functions.textnorm import normalize_text

    normed = [ord(c) for c in normalize_text(text, u_mode=u_mode, ocr=ocr)]
    ok, graphemes32 = validate_clean_and_segment(g_mode, normed)
    if g_mode != SINGLE_STRING and ok:
        cleaned = [c for g in graphemes32 for c in g]
        if cleaned != normed:
            ok, graphemes32 = validate_clean_and_segment(g_mode, cleaned)
    return ok, ["".join(chr(c) for c in g) for g in graphemes32]


def validate_text(text: str, u_mode: str = "nfc") -> bool:
    """NormalizeUTF8String with GraphemeNorm::kNormalize
    (normstrngs.cpp:105-125): true iff the text is well-formed; an empty
    validated result (e.g. joiners-only input) is invalid."""
    ok, graphemes = normalize_clean_and_segment(
        text, u_mode=u_mode, g_mode=SINGLE_STRING
    )
    if not graphemes or not graphemes[0]:
        return False
    return ok
