"""CTC beam-search decoder with dual dict/no-dict beams + DAWG rescoring.

Numpy re-expression of ``src/lstm/recodebeam.cpp``:

- top-n softmax pruning per timestep, n = kBeamWidths[0] = 5
  (recodebeam.cpp:92, 669-700);
- bounded beam widths per code position {5, 10, 16, 16, ...}
  (recodebeam.cpp:29-33);
- dual beams: a dictionary beam whose prefixes must stay inside the DAWG
  (``ContinueDawg``, recodebeam.cpp:1054-1133) and an unconstrained beam
  (``ContinueUnichar``), deduped by (prefix, last-code) like
  ``UpdateHeapIfMatched`` / ``ComputeCodeHash`` (recodebeam.cpp:1234-1275);
- dict rescoring constants kDictRatio = 2.25, kCertOffset = -0.085
  (src/lstm/lstmrecognizer.cpp:46-48);
- word extraction at space characters with per-word certainty
  (``ExtractBestPathAsWords``, recodebeam.cpp:238-320).

The per-timestep loop is irreducibly sequential (SURVEY §7.4); it runs over
numpy per line inside an Arrow-batched UDF, never per Spark row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .dawg import Dawg

K_BEAM_WIDTHS = (5, 10, 16, 16, 16, 16, 16, 16, 16, 16)  # recodebeam.cpp:29-33
K_TOP_N = 5  # recodebeam.cpp:92
K_DICT_RATIO = 2.25  # lstmrecognizer.cpp:46
K_CERT_OFFSET = -0.085  # lstmrecognizer.cpp:48


@dataclass
class BeamEntry:
    prefix: tuple[int, ...] = ()
    positions: tuple[int, ...] = ()  # timestep of each emitted char
    last_code: int = -1  # last consumed non-blank code (-1 after blank)
    dawg_node: int = 0  # current DAWG node for the in-progress word
    dict_ok: bool = True  # prefix is a valid dict path (all words so far ok)
    log_p: float = 0.0
    certainty: float = 0.0  # min per-emission log-prob (worst case)
    char_log_p: tuple[float, ...] = field(default_factory=tuple)


@dataclass
class DecodedWord:
    text: str
    start_t: int
    end_t: int
    certainty: float
    confidence: float  # 0..100, mean exp(char log-probs), like tesseract conf
    dict_word: bool
    char_ts: tuple[int, ...] = ()  # per-character emission timesteps
    # per-character alternative choices ((ch, conf_pct) desc, rank-1 =
    # network argmax), the ChoiceIterator / lstm_choices surface
    # (ltrresultiterator.cpp:368-470); filled by symbol_choices
    char_choices: tuple = ()


def _beam_width(prefix_len: int) -> int:
    return K_BEAM_WIDTHS[min(prefix_len, len(K_BEAM_WIDTHS) - 1)]


TIE_EPS = 1e-3  # below this top-1/top-2 margin, treat a step as a tie


def ctc_beam_decode(
    log_probs: np.ndarray,
    charset: str,
    blank: int,
    space_code: int | None = None,
    dawg: Dawg | None = None,
) -> tuple[str, list[DecodedWord], float]:
    """Decode a [T, C] log-softmax sequence.

    Returns (text, words, mean_certainty). ``space_code`` delimits words for
    DAWG probing; DAWG chars map by charset position.

    Fast path: because code transitions are unconstrained, the per-step
    argmax path IS the global Viterbi optimum, so greedy equals the beam
    result exactly whenever (a) no step is a near-tie, and (b) dict
    rescoring cannot flip the outcome.  (b) holds when the greedy path is
    already fully dict-valid, or when every alternate path is worse than
    the flip criterion kDictRatio·|best_cert| + kCertOffset allows.  The
    full dual-beam search runs only on genuinely ambiguous sequences (the
    short-circuit idea of baseapi.cpp:770-773 applied to decoding).
    """
    T, C = log_probs.shape
    if T == 0:
        return "", [], 0.0
    part = np.partition(log_probs, C - 2, axis=1)
    min_margin = float((part[:, -1] - part[:, -2]).min())
    if min_margin >= TIE_EPS:
        if dawg is None:
            return _greedy_with_words(log_probs, charset, blank, space_code, dawg)
        # any deviating path pays >= min_margin at its deviation step, so
        # its certainty is <= -min_margin; a dict flip needs certainty
        # >= best_cert*kDictRatio + kCertOffset
        best_cert = float(part[:, -1].min())
        flip_threshold = best_cert * K_DICT_RATIO + K_CERT_OFFSET
        if -min_margin < flip_threshold:
            return _greedy_with_words(log_probs, charset, blank, space_code, dawg)
        text, words, cert = _greedy_with_words(
            log_probs, charset, blank, space_code, dawg
        )
        if all(w.dict_word for w in words):
            return text, words, cert  # already dict-valid: no flip possible
        # a rescoring flip is conceivable -> full dual-beam search
    beams: dict[tuple, BeamEntry] = {((), -1, 0, True): BeamEntry()}
    for t in range(T):
        row = log_probs[t]
        # top-n pruning (always admit blank)
        n = min(K_TOP_N, C)
        cand = np.argpartition(row, -n)[-n:]
        if blank not in cand:
            cand = np.append(cand, blank)
        new_beams: dict[tuple, BeamEntry] = {}

        def push(e: BeamEntry) -> None:
            key = (e.prefix, e.last_code, e.dawg_node, e.dict_ok)
            old = new_beams.get(key)
            if old is None or e.log_p > old.log_p:
                new_beams[key] = e

        for e in beams.values():
            for code in cand:
                code = int(code)
                lp = float(row[code])
                if code == blank:
                    push(
                        BeamEntry(
                            e.prefix, e.positions, -1, e.dawg_node, e.dict_ok,
                            e.log_p + lp, min(e.certainty, lp), e.char_log_p,
                        )
                    )
                    continue
                if code == e.last_code:
                    # CTC repeat: same code without intervening blank collapses
                    push(
                        BeamEntry(
                            e.prefix, e.positions, code, e.dawg_node, e.dict_ok,
                            e.log_p + lp, min(e.certainty, lp), e.char_log_p,
                        )
                    )
                    continue
                # emit a new character
                dawg_node, dict_ok = e.dawg_node, e.dict_ok
                if dawg is not None and dict_ok:
                    if space_code is not None and code == space_code:
                        # word boundary: previous word must be dict-complete
                        if e.dawg_node == 0:
                            # empty in-progress word: ok only at start of
                            # line (consecutive spaces invalidate)
                            dict_ok = not e.prefix
                        dict_ok = dict_ok and _word_complete(e, dawg)
                        dawg_node = 0
                    else:
                        nxt, _end = dawg.step(dawg_node, code)
                        if nxt < 0:
                            dict_ok = False
                        else:
                            dawg_node = nxt
                push(
                    BeamEntry(
                        e.prefix + (code,), e.positions + (t,), code,
                        dawg_node, dict_ok, e.log_p + lp,
                        min(e.certainty, lp),
                        e.char_log_p + (lp,),
                    )
                )
        # keep top-k separately for dict and non-dict beams (dual beams)
        entries = sorted(new_beams.values(), key=lambda b: -b.log_p)
        kept: list[BeamEntry] = []
        n_dict = n_free = 0
        for b in entries:
            w = _beam_width(len(b.prefix))
            if b.dict_ok and dawg is not None:
                if n_dict < w:
                    kept.append(b)
                    n_dict += 1
            else:
                if n_free < w:
                    kept.append(b)
                    n_free += 1
        beams = {
            (b.prefix, b.last_code, b.dawg_node, b.dict_ok): b for b in kept
        }

    final = sorted(beams.values(), key=lambda b: -b.log_p)
    if not final:
        return "", [], 0.0
    best = final[0]
    if dawg is not None:
        # dict rescoring: a dict-valid path whose certainty is within
        # kDictRatio of the best wins (lstmrecognizer.cpp:46-48 semantics).
        # a dict path must explain at least as many characters as the best
        # free path — the reference rescores alternative readings of the
        # SAME blobs (it never prefers "skip the blob entirely" as a word)
        best_dict = next(
            (
                b
                for b in final
                if b.dict_ok
                and _word_complete(b, dawg)
                and len(b.prefix) >= len(best.prefix)
            ),
            None,
        )
        if (
            best_dict is not None
            and best_dict is not best
            and best_dict.certainty >= best.certainty * K_DICT_RATIO + K_CERT_OFFSET
        ):
            best = best_dict
    text = "".join(charset[c] for c in best.prefix)
    words = _extract_words(best, charset, space_code, dawg)
    mean_cert = (
        float(np.mean(best.char_log_p)) if best.char_log_p else 0.0
    )
    return text, words, mean_cert


def _word_complete(e: BeamEntry, dawg: Dawg) -> bool:
    """True if the in-progress word (since last space) ends at a DAWG end."""
    if e.dawg_node == 0:
        return True  # empty word (leading space / start)
    # end-flag check: was the last consumed edge an end edge?  We re-probe by
    # walking the last char: keep it simple — ask dawg whether node has end.
    # Packed form stores end on edges; e.dawg_node reached via an edge whose
    # end flag we did not carry, so recompute from last char context:
    return _node_reached_is_end(e, dawg)


def _node_reached_is_end(e: BeamEntry, dawg: Dawg) -> bool:
    # Walk the current word from the root to recover the end flag.
    word_codes: list[int] = []
    for c in reversed(e.prefix):
        if dawg.charset[c] == " ":
            break
        word_codes.append(c)
    word_codes.reverse()
    node, end = 0, True
    for code in word_codes:
        node, end = dawg.step(node, code)
        if node < 0:
            return False
    return end


def _extract_words(
    best: BeamEntry, charset: str, space_code: int | None, dawg: Dawg | None
) -> list[DecodedWord]:
    words: list[DecodedWord] = []
    cur: list[int] = []
    cur_pos: list[int] = []
    cur_lp: list[float] = []

    def flush() -> None:
        if not cur:
            return
        text = "".join(charset[c] for c in cur)
        # sum/len matches np.mean's sequential reduce bit-for-bit at word
        # lengths, without the list->array conversion per word
        conf = float(np.exp(sum(cur_lp) / len(cur_lp)) * 100.0)
        is_dict = bool(dawg is not None and dawg.accepts(text))
        words.append(
            DecodedWord(
                text, cur_pos[0], cur_pos[-1], float(min(cur_lp)), conf,
                is_dict, tuple(cur_pos),
            )
        )
        cur.clear()
        cur_pos.clear()
        cur_lp.clear()

    for c, p, lp in zip(best.prefix, best.positions, best.char_log_p):
        if space_code is not None and c == space_code:
            flush()
        else:
            cur.append(c)
            cur_pos.append(p)
            cur_lp.append(lp)
    flush()
    return words


def resolve_fuzzy_spaces(
    words: list[DecodedWord],
    fuzzy_ts: frozenset[int],
    dawg: Dawg | None,
) -> tuple[list[DecodedWord], list[int]]:
    """Resolve fuzzy word gaps post-decode — fix_fuzzy_spaces analogue
    (src/ccmain/fixspace.cpp:74-214): the reference re-permutes each fuzzy
    space with and without the gap and keeps the dictionary-preferred
    reading.  Here a fuzzy space between two decoded words survives only
    when BOTH sides are dictionary words and the joined form is not; with
    no dictionary every fuzzy space joins (a space needs evidence).

    Returns (resolved_words, merged_right_indices) where the indices name
    the original word positions that merged into their left neighbour —
    used by the caller to merge the layout's word boxes in tandem.
    """
    if not words:
        return words, []
    out: list[DecodedWord] = [words[0]]
    merged: list[int] = []
    for i, w in enumerate(words[1:], start=1):
        prev = out[-1]
        is_fuzzy = any(prev.end_t < t < w.start_t for t in fuzzy_ts)
        keep_split = True
        if is_fuzzy:
            if dawg is None:
                keep_split = False
            else:
                join_ok = dawg.accepts(prev.text + w.text)
                keep_split = prev.dict_word and w.dict_word and not join_ok
        if keep_split:
            out.append(w)
        else:
            joined = prev.text + w.text
            out[-1] = DecodedWord(
                joined,
                prev.start_t,
                w.end_t,
                min(prev.certainty, w.certainty),
                (prev.confidence * len(prev.text) + w.confidence * len(w.text))
                / max(1, len(joined)),
                bool(dawg is not None and dawg.accepts(joined)),
                prev.char_ts + w.char_ts,
            )
            merged.append(i)
    return out, merged


def _greedy_with_words(
    log_probs: np.ndarray,
    charset: str,
    blank: int,
    space_code: int | None,
    dawg: Dawg | None,
) -> tuple[str, list[DecodedWord], float]:
    """Best-path decode with word extraction — the unambiguous fast path."""
    ids = np.argmax(log_probs, axis=1)
    top_lp = log_probs[np.arange(len(ids)), ids]
    prefix: list[int] = []
    positions: list[int] = []
    char_lp: list[float] = []
    prev = -1
    lp_l = top_lp.tolist()
    for t, c in enumerate(ids.tolist()):
        if c != blank and c != prev:
            prefix.append(c)
            positions.append(t)
            char_lp.append(lp_l[t])
        prev = c
    best = BeamEntry(
        prefix=tuple(prefix),
        positions=tuple(positions),
        char_log_p=tuple(char_lp),
    )
    text = "".join(charset[c] for c in prefix)
    words = _extract_words(best, charset, space_code, dawg)
    mean_cert = float(np.mean(char_lp)) if char_lp else 0.0
    return text, words, mean_cert


def greedy_decode(log_probs: np.ndarray, charset: str, blank: int) -> str:
    """Best-path (greedy) CTC collapse — the no-LM baseline."""
    ids = np.argmax(log_probs, axis=1)
    out: list[str] = []
    prev = -1
    for i in ids:
        if i != blank and i != prev:
            out.append(charset[int(i)])
        prev = int(i)
    return "".join(out)


# ---------------------------------------------------------------------------
# Repeated-character word fixup (fix_rep_char, control.cpp:352-355,1673-1699)
# ---------------------------------------------------------------------------

K_REP_MIN_LEN = 4  # shortest word treated as a leader/repeat candidate
K_REP_DOMINANT_FRAC = 0.75  # dominant-char share that flags W_REP_CHAR


def _is_leader_char(ch: str) -> bool:
    """Leader/fill characters — the glyphs tospace's W_REP_CHAR flag
    targets (dot/dash/underscore fills between text and page numbers)."""
    return ch in ".-_~*="


def fix_rep_char(word: DecodedWord) -> DecodedWord:
    """Repeated-character word correction (Tesseract::fix_rep_char,
    src/ccmain/control.cpp:1673-1699) for words carrying the W_REP_CHAR
    signature.  The reference flags such words during word segmentation
    (leader dots/dashes at regular pitch); a post-hoc character-frequency
    test alone would corrupt legitimate words ('loll', 'sass'), so the
    gate here additionally requires the dominant character to be a
    LEADER glyph: non-dict word, length >= 4, and >= 75% of positions
    held by one fill character.  Matching positions rewrite to it
    (CorrectRepcharChoices: keep boxes/timesteps, correct classes)."""
    text = word.text
    if len(text) < K_REP_MIN_LEN or word.dict_word:
        return word
    from collections import Counter

    counts = Counter(text)
    ch, n = counts.most_common(1)[0]
    if not _is_leader_char(ch):
        return word
    if n < max(3, int(np.ceil(K_REP_DOMINANT_FRAC * len(text)))):
        return word
    if n == len(text):
        return word  # already uniform
    return DecodedWord(
        text=ch * len(text),
        start_t=word.start_t,
        end_t=word.end_t,
        certainty=word.certainty,
        confidence=word.confidence,
        dict_word=word.dict_word,
        char_ts=word.char_ts,
    )


def fix_rep_chars(words: list[DecodedWord]) -> tuple[list[DecodedWord], bool]:
    """Apply fix_rep_char across a row's words; returns (words, changed)."""
    out = [fix_rep_char(w) for w in words]
    return out, any(a.text != b.text for a, b in zip(out, words))


# SaveMostCertainChoices gate (recodebeam.cpp:137-160): every output with
# probability >= 0.01 is a reportable choice
K_CHOICE_MIN_P = 0.01
K_CHOICE_TOP_K = 5


def symbol_choices(
    log_probs: np.ndarray,
    words: list[DecodedWord],
    charset: str,
    blank: int,
    space_code: int | None,
) -> None:
    """Attach per-character alternative choices to decoded words in place.

    The ChoiceIterator surface over LSTM results: for each recognized
    symbol, every network output with probability >= 0.01 at the symbol's
    emission timestep, confidence-sorted (SaveMostCertainChoices,
    src/lstm/recodebeam.cpp:137-160; ChoiceIterator::GetUTF8Text /
    Confidence, src/ccmain/ltrresultiterator.cpp:368-470).  Space and
    blank never appear as choices (filterSpaces,
    ltrresultiterator.cpp:473-490).  Rank-1 is the network argmax; the
    final text character may differ when dictionary arbitration flipped
    it — the same property as the reference's raw choices vs best_choice.
    """
    all_ts = [t for w in words for t in w.char_ts]
    if not all_ts:
        return
    mat = np.exp(log_probs[np.asarray(all_ts, dtype=np.int64)])
    mat[:, blank] = 0.0
    if space_code is not None:
        mat[:, space_code] = 0.0
    kk = min(K_CHOICE_TOP_K, mat.shape[1] - 1)
    idx = np.argpartition(-mat, kk - 1, axis=1)[:, :kk]
    vals = np.take_along_axis(mat, idx, axis=1)
    pos = 0
    for w in words:
        per_char = []
        for _ in w.char_ts:
            row = [
                (charset[c], round(float(v) * 100.0, 2))
                for c, v in zip(idx[pos], vals[pos])
                if v >= K_CHOICE_MIN_P
            ]
            row.sort(key=lambda cv: (-cv[1], cv[0]))  # conf desc, char tie
            per_char.append(tuple(row))
            pos += 1
        w.char_choices = tuple(per_char)
