"""Dictionary word-choice adjustment — the wordrec language model's
path-cost arithmetic (src/dict/dict.cpp ``Dict::adjust_word``:711-792,
src/dict/context.cpp ``case_ok``:28-64 / ``valid_punctuation``
dict.cpp:-, src/wordrec/language_model.cpp:224 ``UpdateState`` ->
``ComputeAdjustedPathCost``:1100-1160).  Candidate dictionary words
reach this scoring through the reference's in-permutation DAWG walk
(``Dict::go_deeper`` / ``dawg_permute_and_select``,
src/dict/permdawg.cpp:45-230); here the CombinedDawg parallel probe
plays that role over explicit segmentation candidates.

The legacy engine never picks a segmentation by raw classifier rating
alone: every candidate WERD_CHOICE is re-rated by a multiplicative
penalty keyed on what validated it — a frequent dictionary word keeps
its rating (factor 1.0), a case-consistent dictionary word pays 1.1, a
case-consistent non-word 1.25, a case-broken dictionary word 1.3125,
garbage 1.5 (the ``segment_penalty_*`` params, dict.cpp:74-92) — and
the winner is the minimum ADJUSTED rating.  That is how 'modern' with
a fused rn beats 'modem': the chop segmentation's small extra raw cost
is repaid by the dictionary factor.

Rating domain note: the reference pads ratings with ``kRatingPad = 4``
(dict.h:62) before multiplying so that near-zero ratings cannot
nullify the penalties; its ratings run a few units per word.  This
engine's word rating is ``sum(1 - match_frac)`` over pieces — a clean
word costs ~0.1 — so the pad scales to 0.2 here (same ratio of pad to
a typical clean-word rating); the adjustment algebra
``new = (r + pad) * factor - pad`` is otherwise literal.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_NUMBER_RE = re.compile(r"\d+([.,]\d+)*")
_COMPOUND_SPLIT = re.compile(r"[-/]")

# PermuterType (src/ccstruct/ratngs.h:235-251)
NO_PERM = "no_perm"
PUNC_PERM = "punc"
TOP_CHOICE_PERM = "top_choice"
NUMBER_PERM = "number"
USER_PATTERN_PERM = "user_pattern"
SYSTEM_DAWG_PERM = "system_dawg"
USER_DAWG_PERM = "user_dawg"
FREQ_DAWG_PERM = "freq_dawg"
COMPOUND_PERM = "compound"
DOC_DAWG_PERM = "doc_dawg"

# segment_penalty_* defaults (dict.cpp:74-92)
PENALTY_DICT_FREQUENT = 1.0
PENALTY_DICT_CASE_OK = 1.1
PENALTY_DICT_CASE_BAD = 1.3125
PENALTY_DICT_NONWORD = 1.25
PENALTY_GARBAGE = 1.50

K_RATING_PAD = 0.2  # kRatingPad=4 (dict.h:62), scaled — see module doc

# case_state_table (context.cpp:28-44); columns: punct, upper, lower, digit
_CASE_STATES = [
    [0, 1, 5, 4],  # 0: beginning of word
    [0, 3, 2, 4],  # 1: after initial capital
    [0, -1, 2, -1],  # 2: after lower case
    [0, 3, -1, 4],  # 3: after upper case
    [0, -1, -1, 4],  # 4: after a digit
    [5, -1, 2, -1],  # 5: after initial lower case
]


def case_ok(word: str) -> bool:
    """Dict::case_ok (context.cpp:45-64): walk the case state machine;
    any -1 transition (e.g. lower->upper) is bad; a single lower-case
    letter (terminal state 5) is bad."""
    state = 0
    for ch in word:
        if ch.isupper():
            state = _CASE_STATES[state][1]
        elif ch.islower():
            state = _CASE_STATES[state][2]
        elif ch.isdigit():
            state = _CASE_STATES[state][3]
        else:
            state = _CASE_STATES[state][0]
        if state == -1:
            return False
    return state != 5


# The eng punctuation-DAWG pattern inventory (trailing/leading marks
# around one alnum core), standing in for the punc dawg probe of
# Dict::valid_punctuation (dict.cpp:640-668: non-punct chars collapse
# to one kPatternUnicharID, the pattern word must be in the punc dawg).
_PUNC_PATTERNS = {
    "*", "*.", "*,", "*;", "*:", "*!", "*?", "*'", '*"',
    "'*'", '"*"', "(*)", "[*]", "{*}", "(*", "*)", "'*", '"*',
    "*'.", '*".', "*',", '*",', "*...", "*.)",
}


def valid_punctuation(word: str) -> bool:
    """Collapse alnum runs to '*' and probe the pattern set.  A char
    that is neither punctuation nor alnum fails outright
    (dict.cpp:650-653)."""
    if not word:
        return False
    pat = []
    for ch in word:
        if ch.isalnum():
            if not pat or pat[-1] != "*":
                pat.append("*")
        elif ch.isspace():
            return False
        else:
            pat.append(ch)
    return "".join(pat) in _PUNC_PATTERNS


def _core(word: str) -> str:
    """The alnum core the dawgs are probed with (punctuation handled by
    the punc-pattern channel, as the reference's punc dawg does)."""
    return word.strip("".join(c for c in word if not c.isalnum()) or None)


@dataclass
class AdjustedChoice:
    text: str
    rating: float  # raw rating (sum of piece costs, lower better)
    adjusted: float  # rating after the dictionary adjustment
    permuter: str
    adjust_factor: float


def adjust_word(
    text: str,
    rating: float,
    dawg=None,
    user_dawg=None,
    freq_words: frozenset[str] | set[str] | None = None,
    doc_words: "DocumentWords | None" = None,
) -> AdjustedChoice:
    """Dict::adjust_word (dict.cpp:711-792) at word granularity.

    ``dawg``/``user_dawg``: objects with ``accepts(word) -> bool``
    (lstm.dawg.Dawg); probed with the alnum core, also case-folded.  ``freq_words``: the frequent
    -word dawg contents (FREQ_DAWG_PERM keeps factor 1.0).
    X-height consistency terms are owned by the layout stage here
    (rows arrive x-height-normalized), so additional_adjust = 0.
    """
    core = _core(text) or text
    # the number dawg's pattern shape: digits with interior . or ,
    # separators (3.14, 12,000) — valid_number's accept set
    is_number = bool(_NUMBER_RE.fullmatch(core))
    in_user = user_dawg is not None and user_dawg.accepts(core.lower())
    in_sys = dawg is not None and (
        dawg.accepts(core) or dawg.accepts(core.lower())
    )
    in_doc = (
        not (in_user or in_sys)
        and doc_words is not None
        and doc_words.accepts(core)
    )
    # hyphen/slash compounds: every part a dictionary word restarts
    # the dawg at the marker and keeps COMPOUND_PERM
    # (compound_marker, dict.h:116; letter_is_okay dict.cpp:561-565)
    is_compound = False
    if not (in_user or in_sys or in_doc) and dawg is not None and (
        "-" in core or "/" in core
    ):
        parts = [p for p in _COMPOUND_SPLIT.split(core)]
        is_compound = all(
            p and (dawg.accepts(p) or dawg.accepts(p.lower()))
            for p in parts
        ) and len(parts) >= 2
    nonword = not (in_user or in_sys or in_doc or is_number or is_compound)
    c_ok = case_ok(core or text)
    # punc_is_ok = !nonword || valid_punctuation (adjust_word
    # dict.cpp:716): interior punctuation must pass the pattern probe
    # too — 'foo.bar' collapses to '*.*', fails, and rates garbage
    p_ok = (not nonword) or valid_punctuation(text)

    padded = rating + K_RATING_PAD
    if nonword:
        if c_ok and p_ok:
            factor = PENALTY_DICT_NONWORD
            permuter = TOP_CHOICE_PERM
        else:
            factor = PENALTY_GARBAGE
            permuter = NO_PERM
    else:
        if is_number and not (in_user or in_sys):
            # adjust_number path (dict.cpp:695-708): digits rate as a
            # case-ok dictionary entry through the number dawg
            factor = PENALTY_DICT_CASE_OK
            permuter = NUMBER_PERM
        elif c_ok:
            if freq_words and core.lower() in freq_words:
                factor = PENALTY_DICT_FREQUENT
                permuter = FREQ_DAWG_PERM
            else:
                factor = PENALTY_DICT_CASE_OK
                permuter = (
                    COMPOUND_PERM
                    if is_compound
                    else DOC_DAWG_PERM
                    if in_doc
                    else USER_DAWG_PERM if in_user else SYSTEM_DAWG_PERM
                )
        else:
            factor = PENALTY_DICT_CASE_BAD
            permuter = (
                COMPOUND_PERM
                if is_compound
                else DOC_DAWG_PERM
                if in_doc
                else USER_DAWG_PERM if in_user else SYSTEM_DAWG_PERM
            )
    adjusted = padded * factor - K_RATING_PAD
    return AdjustedChoice(text, rating, adjusted, permuter, factor)


def choose_segmentation(
    candidates: list[tuple[str, float]],
    dawg=None,
    user_dawg=None,
    freq_words=None,
    params_model: "ParamsModel | None" = None,
) -> AdjustedChoice:
    """SegSearch's best-choice election (segsearch.cpp:33 over
    ComputeAdjustedPathCost): every candidate (text, raw rating) is
    adjusted and the minimum adjusted rating wins; ties break to the
    lower raw rating, then lexicographic (deterministic).

    ``params_model``: when a trained ParamsModel is supplied, the cost
    is its weighted feature dot product instead of the heuristic
    penalty algebra — the two branches of ComputeAdjustedPathCost
    (language_model.cpp:1100-1140: ``params_model_.Initialized()``
    picks the trained path)."""
    if not candidates:
        raise ValueError("no segmentation candidates")
    adj = [
        adjust_word(t, r, dawg=dawg, user_dawg=user_dawg, freq_words=freq_words)
        for t, r in candidates
    ]
    if params_model is not None and params_model.initialized:
        for a in adj:
            a.adjusted = params_model.compute_cost(
                extract_features(a)
            ) * max(1, len(a.text))
    return min(adj, key=lambda a: (a.adjusted, a.rating, a.text))


# ---------------------------------------------------------------------------
# Stopper — when is a word choice ACCEPTABLE
# (src/dict/stopper.cpp AcceptableChoice:42-108, UniformCertainties
# :464-505; params dict.cpp:107-118)
# ---------------------------------------------------------------------------

# stopper_nondict_certainty_base = -2.50 / stopper_certainty_per_char
# = -0.50 (dict.cpp:107-113), scaled to this engine's certainty domain
# the same way the doc-dict thresholds are: the reference's base sits
# ~2 units below its clean band (~-0.5); ours sits below the -4..-6
# clean band at -8, with the per-char dictionary relief scaled by the
# same ~3x ratio
STOPPER_NONDICT_CERTAINTY_BASE = -8.0
STOPPER_CERTAINTY_PER_CHAR = -1.5
STOPPER_SMALLWORD_SIZE = 2  # dict.cpp:111 (unscaled: a word count)
STOPPER_ALLOWABLE_CHARACTER_BADNESS = 3.0  # dict.cpp:117 (a sigma count)

_VALID_WORD_PERMUTERS = frozenset(
    # valid_word_permuter(perm, numbers_ok=false), dict.h:435-439
    {SYSTEM_DAWG_PERM, FREQ_DAWG_PERM, USER_DAWG_PERM, USER_PATTERN_PERM,
     COMPOUND_PERM, DOC_DAWG_PERM}
)


def _shortest_alpha_run(word: str) -> int:
    """LengthOfShortestAlphaRun (stopper.cpp): the shortest maximal
    run of alphabetic characters (0 when there are none)."""
    runs, cur = [], 0
    for ch in word:
        if ch.isalpha():
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    return min(runs) if runs else 0


def uniform_certainties(
    char_certainties: list[float], word_certainty: float
) -> bool:
    """UniformCertainties (stopper.cpp:464-505): the word's certainty
    may not fall more than stopper_allowable_character_badness sigmas
    below the mean of its characters' certainties (worst character
    excluded from the statistics); words under 3 chars always pass."""
    n = len(char_certainties)
    if n < 3:
        return True
    worst = min(char_certainties)
    rest = list(char_certainties)
    rest.remove(worst)
    m = len(rest)
    mean = sum(rest) / m
    var = (
        m * sum(c * c for c in rest) - sum(rest) ** 2
    ) / (m * (m - 1))
    std = max(var, 0.0) ** 0.5
    threshold = min(
        mean - STOPPER_ALLOWABLE_CHARACTER_BADNESS * std,
        STOPPER_NONDICT_CERTAINTY_BASE,
    )
    return word_certainty >= threshold


def acceptable_choice(
    text: str,
    certainty: float,
    permuter: str,
    char_certainties: list[float] | None = None,
    dangerous_ambig: bool = False,
) -> bool:
    """AcceptableChoice (stopper.cpp:42-108): the word is DONE — no
    second pass / retry needed — when it has no dangerous ambiguity,
    its certainty clears the (dictionary-relieved) threshold, and its
    per-character certainties are uniform.  The x-height consistency
    input is owned by the layout stage here (rows arrive normalized),
    so xheight_consistency = XH_GOOD."""
    if not text:
        return False
    is_valid = permuter in _VALID_WORD_PERMUTERS
    threshold = STOPPER_NONDICT_CERTAINTY_BASE
    if is_valid and case_ok(_core(text) or text):
        ws = max(0, _shortest_alpha_run(text) - STOPPER_SMALLWORD_SIZE)
        threshold += ws * STOPPER_CERTAINTY_PER_CHAR
    if dangerous_ambig:
        return False
    if certainty <= threshold:
        return False
    if char_certainties is not None:
        return uniform_certainties(char_certainties, certainty)
    return True


# ---------------------------------------------------------------------------
# Document words — in-document terminology learning
# (Dict::add_document_word dict.cpp:648-708; document_words_ /
# pending_words_ tries probed by def_letter_is_okay)
# ---------------------------------------------------------------------------

K_DOC_DICT_MAX_REP_CHARS = 4  # dict.h:73
# doc_dict_pending/certainty_threshold (dict.cpp:136-138: 0.0 / -2.25)
# scaled to this engine's certainty domain: the reference's clean
# decodes sit near -0.5 on its [-20, 0] axis, ours near -4..-6 (the
# CTC softmax is softer), so the direct-admission bar sits just below
# the clean band and the pending bar one reject-band lower — the same
# relative placement
DOC_DICT_PENDING_THRESHOLD = -8.0
DOC_DICT_CERTAINTY_THRESHOLD = -6.5


class DocumentWords:
    """The document dawg pair: confidently-read NON-dictionary words
    become document vocabulary so later sightings validate
    (add_document_word dict.cpp:648-708).  A word whose certainty
    clears doc_dict_certainty_threshold (and is longer than 2) joins
    document_words directly; weaker-but-pending sightings (or 2-char
    words, capitalized-pair only) wait in pending_words and promote on
    the second sighting.  Runs of >= kDocDictMaxRepChars repeated
    characters never qualify."""

    def __init__(self) -> None:
        self.pending: set[str] = set()
        self.words: set[str] = set()

    def accepts(self, word: str) -> bool:
        return word in self.words

    @staticmethod
    def _has_rep_run(word: str) -> bool:
        run = 1
        for a, b in zip(word, word[1:]):
            run = run + 1 if a == b else 1
            if run >= K_DOC_DICT_MAX_REP_CHARS:
                return True
        return False

    def add(self, word: str, certainty: float, is_valid: bool = False) -> None:
        """``is_valid``: already a dictionary word — the reference
        returns early (valid_word gate, dict.cpp:661)."""
        n = len(word)
        if is_valid or n < 2 or self._has_rep_run(word):
            return
        if certainty < DOC_DICT_CERTAINTY_THRESHOLD or n == 2:
            if certainty < DOC_DICT_PENDING_THRESHOLD:
                return
            if word not in self.pending:
                if n > 2 or (n == 2 and word[0].isupper() and word[1].isupper()):
                    self.pending.add(word)
                return
        self.words.add(word)


# ---------------------------------------------------------------------------
# ParamsModel — the trained path-cost model
# (src/wordrec/params_model.cpp; features
# src/ccstruct/params_training_featdef.h:40-72)
# ---------------------------------------------------------------------------

# kParamsTrainingFeatureType, in enum order
FEATURE_NAMES = [
    "PTRAIN_DIGITS_SHORT", "PTRAIN_DIGITS_MED", "PTRAIN_DIGITS_LONG",
    "PTRAIN_NUM_SHORT", "PTRAIN_NUM_MED", "PTRAIN_NUM_LONG",
    "PTRAIN_DOC_SHORT", "PTRAIN_DOC_MED", "PTRAIN_DOC_LONG",
    "PTRAIN_DICT_SHORT", "PTRAIN_DICT_MED", "PTRAIN_DICT_LONG",
    "PTRAIN_FREQ_SHORT", "PTRAIN_FREQ_MED", "PTRAIN_FREQ_LONG",
    "PTRAIN_SHAPE_COST_PER_CHAR", "PTRAIN_NGRAM_COST_PER_CHAR",
    "PTRAIN_NUM_BAD_PUNC", "PTRAIN_NUM_BAD_CASE",
    "PTRAIN_XHEIGHT_CONSISTENCY", "PTRAIN_NUM_BAD_CHAR_TYPE",
    "PTRAIN_NUM_BAD_SPACING", "PTRAIN_NUM_BAD_FONT",
    "PTRAIN_RATING_PER_CHAR",
]
K_MAX_SMALL_WORD = 3  # kMaxSmallWordUnichars (params_training_featdef.h:29)
K_MAX_MEDIUM_WORD = 6  # kMaxMediumWordUnichars (:30)


def _num_bad_case(word: str) -> int:
    """NumInconsistentCase analogue: failed transitions of the case
    state machine, counted with a reset after each failure."""
    state, bad = 0, 0
    for ch in word:
        if ch.isupper():
            nxt = _CASE_STATES[state][1]
        elif ch.islower():
            nxt = _CASE_STATES[state][2]
        elif ch.isdigit():
            nxt = _CASE_STATES[state][3]
        else:
            nxt = _CASE_STATES[state][0]
        if nxt == -1:
            bad += 1
            state = 0
        else:
            state = nxt
    return bad


def extract_features(choice: AdjustedChoice) -> list[float]:
    """ExtractFeaturesFromPath (language_model.cpp:1335-1382) at word
    granularity: the permuter one-hot in its length bucket, the case/
    char-type consistency counts, and the per-char rating.  Shape,
    ngram, spacing and font terms are owned elsewhere in this engine
    (layout/CTC) and stay zero, as the reference itself zeroes its
    disabled features."""
    f = [0.0] * len(FEATURE_NAMES)
    core = _core(choice.text) or choice.text
    n = max(1, len(core))
    bucket = 0 if n <= K_MAX_SMALL_WORD else (1 if n <= K_MAX_MEDIUM_WORD else 2)
    if choice.permuter in (NUMBER_PERM, USER_PATTERN_PERM):
        if all(c.isdigit() for c in core):
            f[0 + bucket] = 1.0  # PTRAIN_DIGITS_*
        else:
            f[3 + bucket] = 1.0  # PTRAIN_NUM_*
    elif choice.permuter == DOC_DAWG_PERM:
        f[6 + bucket] = 1.0  # PTRAIN_DOC_*
    elif choice.permuter in (SYSTEM_DAWG_PERM, USER_DAWG_PERM):
        f[9 + bucket] = 1.0  # PTRAIN_DICT_*
    elif choice.permuter == FREQ_DAWG_PERM:
        f[12 + bucket] = 1.0  # PTRAIN_FREQ_*
    f[18] = float(_num_bad_case(core))  # PTRAIN_NUM_BAD_CASE
    if choice.permuter in (NO_PERM, TOP_CHOICE_PERM):
        # PTRAIN_NUM_BAD_CHAR_TYPE: only scored without a dawg match
        f[20] = float(
            sum(1 for c in choice.text if not (c.isalnum() or c in ".,;:!?'\"()[]{}-"))
        )
    f[23] = choice.rating / n  # PTRAIN_RATING_PER_CHAR
    return f


class ParamsModel:
    """ParamsModel::ComputeCost (params_model.cpp:81-88: the weighted
    feature dot product) with the reference's text weights format
    (LoadFromFp :109-140: one ``NAME value`` line per feature; a file
    missing any feature is rejected and leaves the model
    uninitialized)."""

    def __init__(self, weights: list[float] | None = None) -> None:
        if weights is not None and len(weights) != len(FEATURE_NAMES):
            raise ValueError("weights length != feature count")
        self.weights = list(weights) if weights is not None else []

    @property
    def initialized(self) -> bool:
        return len(self.weights) == len(FEATURE_NAMES)

    def compute_cost(self, features: list[float]) -> float:
        return float(
            sum(w * f for w, f in zip(self.weights, features))
        )

    def dumps(self) -> str:
        return "".join(
            f"{name} {w}\n" for name, w in zip(FEATURE_NAMES, self.weights)
        )

    @classmethod
    def loads(cls, text: str) -> "ParamsModel":
        present: dict[str, float] = {}
        for line in text.splitlines():
            parts = line.split()
            if len(parts) != 2:
                continue
            if parts[0] not in FEATURE_NAMES:
                continue  # Unknown parameter — skipped, as the reference
            try:
                present[parts[0]] = float(parts[1])
            except ValueError:
                continue
        if len(present) != len(FEATURE_NAMES):
            return cls()  # incomplete file: uninitialized model
        return cls([present[n] for n in FEATURE_NAMES])
