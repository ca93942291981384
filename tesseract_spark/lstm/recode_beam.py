"""RecodeBeamSearch: the lattice beam decoder over recoded code streams.

Python re-expression of ``src/lstm/recodebeam.{h,cpp}`` — the decoder
the reference runs on every LSTM output when a recoder (multi-code
CJK/Indic compression, unicharcompress.cpp) is active:

- per-step beams indexed by (dawg/no-dawg, continuation, prefix length)
  with the reference's widths (kBeamWidths, recodebeam.cpp:31);
- ContinueContext (recodebeam.cpp:888-1007): duplicate extension,
  nulls inside multi-code sequences, final-code completion and
  next-code prefix extension, with the top-2/top-n/also-ran staged
  fallback of DecodeStep (recodebeam.cpp:776-799);
- dict dual-beam (ContinueUnichar/ContinueDawg, recodebeam.cpp:1009-
  1134): non-dict certainty scaled by dict_ratio, initial-dawg pushes
  at spaces and at non-space-delimited characters, word chaining for
  space-free scripts (valid_end && !space_delimited_);
- the three extraction walks the unittest pins
  (unittest/recodebeam_test.cc ExpectCorrect):
  ExtractBestPathAsLabels (recodebeam.cpp:200-218),
  ExtractPathAsUnicharIds with the weak-space certainty merging
  (recodebeam.cpp:565-630), and ExtractBestPathAsWords' segmentation
  loop (recodebeam.cpp:238-320) returning lightweight RecWord records
  instead of WERD_RES.

The fast greedy path (fixture_model.decode_strips) remains the
default; this beam is the precision path for ambiguous lattices and
dictionary rescoring over recoded outputs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

# ratngs.h:235-249
NO_PERM = 0
TOP_CHOICE_PERM = 2
SYSTEM_DAWG_PERM = 8

# NodeContinuation (recodebeam.h:79-88)
NC_ANYTHING, NC_ONLY_DUP, NC_NO_DUP, NC_COUNT = 0, 1, 2, 3
# TopNState (recodebeam.h:91-96)
TN_TOP2, TN_TOPN, TN_ALSO_RAN, TN_COUNT = 0, 1, 2, 3

# recodebeam.cpp:31: beam width at each code position.
K_BEAM_WIDTHS = (5, 10, 16, 16, 16, 16, 16, 16, 16, 16)
K_MAX_CODE_LEN = 9  # RecodedCharID::kMaxCodeLen
# recodebeam.h:254
K_MIN_CERTAINTY = -20.0
_K_MIN_PROB = math.exp(K_MIN_CERTAINTY)

UNICHAR_SPACE = 0  # unicharset.h SPECIAL_UNICHAR_CODES
INVALID_UNICHAR_ID = -1


def prob_to_certainty(prob: float) -> float:
    """NetworkIO::ProbToCertainty (networkio.cpp:582)."""
    return math.log(prob) if prob > _K_MIN_PROB else K_MIN_CERTAINTY


@dataclass
class RecodeNode:
    """RecodeNode (recodebeam.h:104-160), dawg state as a plain node id
    (our packed Dawg carries one active position, not a position
    vector — user/freq dawgs collapse into the CombinedDawg probe)."""

    code: int
    unichar_id: int
    permuter: int
    start_of_dawg: bool
    start_of_word: bool
    end_of_word: bool
    duplicate: bool
    certainty: float
    score: float
    prev: Optional["RecodeNode"]
    dawg_node: Optional[int]  # None = not on a dict continuation
    code_hash: int


class RecodeBeamSearch:
    """Decode(output, dict_ratio, cert_offset, worst_dict_cert) over a
    [T, C] matrix of per-step code probabilities (softmax space, NOT
    log), exactly the surface recodebeam_test.cc drives."""

    def __init__(
        self,
        recoder,
        null_char: int,
        simple_text: bool = False,
        dawg=None,
        uid_chars: list[str] | None = None,
        space_delimited: bool = True,
        non_space_delimited_uids: frozenset[int] | None = None,
    ) -> None:
        self.recoder = recoder
        self.null_char = null_char
        self.is_simple_text = simple_text
        self.dawg = dawg
        self._dawg_codes = (
            getattr(dawg, "char_code", None)
            or {c: i for i, c in enumerate(getattr(dawg, "charset", ""))}
            if dawg is not None
            else {}
        )
        # uid -> dictionary character (for the dawg's char-code probe)
        self.uid_chars = uid_chars or []
        # The reference hard-wires space as unichar_id 0 (unicharset.h
        # SPECIAL_UNICHAR_CODES); fixture charsets may place it anywhere,
        # so resolve the actual space uid from the table.
        self.space_uid = (
            self.uid_chars.index(" ")
            if " " in self.uid_chars
            else UNICHAR_SPACE
        )
        # The reference's recoder always carries the null char
        # (ComputeEncoding appends it), so it appears in
        # GetFinalCodes(empty).  Our fixture-model recoder keeps the
        # CTC null outside the charset; surface it at length 0 so the
        # beam can take blank steps.
        self._null_in_recoder = null_char in recoder.get_final_codes(())
        # space_delimited_ (recodebeam.cpp:71-78): false iff any dict
        # language writes without spaces (zh/ja/th).
        self.space_delimited = space_delimited
        self._nsd_uids = non_space_delimited_uids or frozenset()
        self.steps: list[dict] = []  # t -> {(dawgs,cont,len): [nodes]}
        self._top_flags: np.ndarray | None = None
        self._top_code = -1
        self._second_code = -1

    # -- uid classing ---------------------------------------------------
    def _is_space_delimited(self, uid: int) -> bool:
        """UNICHARSET::IsSpaceDelimited: Han/Hiragana/Katakana/Thai are
        not; everything else is."""
        return uid not in self._nsd_uids

    # -- heap maintenance ------------------------------------------------
    @staticmethod
    def _beam_index(use_dawgs: bool, cont: int, length: int) -> tuple:
        return (bool(use_dawgs), cont, length)

    def _push_heap(self, step: dict, index: tuple, node: RecodeNode) -> None:
        """PushHeapIfBetter + UpdateHeapIfMatched (recodebeam.cpp:
        1187-1256): dedup on (code, code_hash, permuter, start_of_dawg)
        keeping the higher score; cap at kBeamWidths[length]."""
        max_size = K_BEAM_WIDTHS[index[2]]
        heap = step.setdefault(index, [])
        if len(heap) >= max_size and node.score <= min(
            n.score for n in heap
        ):
            return
        for i, old in enumerate(heap):
            if (
                old.code == node.code
                and old.code_hash == node.code_hash
                and old.permuter == node.permuter
                and old.start_of_dawg == node.start_of_dawg
            ):
                if node.score > old.score:
                    heap[i] = node
                return
        heap.append(node)
        if len(heap) > max_size:
            heap.remove(min(heap, key=lambda n: n.score))

    def _code_hash(self, code: int, dup: bool, prev: RecodeNode | None) -> int:
        """ComputeCodeHash (recodebeam.cpp:1259-1270)."""
        h = 0 if prev is None else prev.code_hash
        if not dup and code != self.null_char:
            h = (h * max(self.recoder.code_range, 2) + code) & 0xFFFFFFFFFFFFFFFF
        return h

    # -- decode ------------------------------------------------------------
    def decode(
        self,
        outputs: np.ndarray,
        dict_ratio: float = 3.5,
        cert_offset: float = -0.125,
        worst_dict_cert: float = -25.0,
        disabled_uids: frozenset[int] | None = None,
    ) -> "RecodeBeamSearch":
        """RecodeBeamSearch::Decode (recodebeam.cpp:92-104)."""
        self.steps = []
        self._disabled = disabled_uids or frozenset()
        T = outputs.shape[0]
        for t in range(T):
            self._compute_top_n(outputs[t], K_BEAM_WIDTHS[0])
            self._decode_step(
                outputs[t], t, dict_ratio, cert_offset, worst_dict_cert
            )
        return self

    def _compute_top_n(self, row: np.ndarray, top_n: int) -> None:
        """ComputeTopN (recodebeam.cpp:700-735): top-2 → TN_TOP2, rest
        of top-n → TN_TOPN, others TN_ALSO_RAN; null always TN_TOP2."""
        C = len(row)
        flags = np.full(C, TN_ALSO_RAN, dtype=np.int8)
        n = min(top_n, C)
        top = np.argpartition(row, -n)[-n:]
        top = top[np.argsort(row[top])[::-1]]  # descending
        flags[top] = TN_TOPN
        flags[top[:2]] = TN_TOP2
        self._top_code = int(top[0])
        self._second_code = int(top[1]) if len(top) > 1 else -1
        flags[self.null_char] = TN_TOP2
        self._top_flags = flags

    def _decode_step(
        self, outputs, t, dict_ratio, cert_offset, worst_dict_cert
    ) -> None:
        """DecodeStep (recodebeam.cpp:737-810)."""
        step: dict = {}
        self._best_initial_dawgs: dict[int, RecodeNode] = {}
        if t == 0:
            self._continue_context(
                None, self._beam_index(False, NC_ANYTHING, 0), outputs,
                TN_TOP2, dict_ratio, cert_offset, worst_dict_cert, step,
            )
            if self.dawg is not None:
                self._continue_context(
                    None, self._beam_index(True, NC_ANYTHING, 0), outputs,
                    TN_TOP2, dict_ratio, cert_offset, worst_dict_cert, step,
                )
        else:
            prev_step = self.steps[t - 1]
            # Staged top-2 → top-n → also-ran fallback until non-empty.
            for tn in range(TN_COUNT):
                for index, heap in list(prev_step.items()):
                    for node in list(heap):
                        self._continue_context(
                            node, index, outputs, tn, dict_ratio,
                            cert_offset, worst_dict_cert, step,
                        )
                total = sum(
                    len(h) for idx, h in step.items() if idx[1] == NC_ANYTHING
                )
                if total:
                    break
            # Best-initial-dawg transfer happens only on continuation
            # steps (recodebeam.cpp:803-810 sits in DecodeStep's else).
            for cont, node in self._best_initial_dawgs.items():
                self._push_heap(step, self._beam_index(True, cont, 0), node)
        self.steps.append(step)

    def _continue_context(
        self, prev, index, outputs, top_n_flag, dict_ratio, cert_offset,
        worst_dict_cert, step,
    ) -> None:
        """ContinueContext (recodebeam.cpp:888-1007)."""
        use_dawgs, prev_cont, length = index[0], index[1], index[2]
        flags = self._top_flags
        # Reconstruct the pending code prefix by walking back over
        # nulls/duplicates (recodebeam.cpp:895-903).
        prefix: list[int] = []
        previous = prev
        for _ in range(length):
            while previous is not None and (
                previous.duplicate or previous.code == self.null_char
            ):
                previous = previous.prev
            prefix.append(previous.code)
            previous = previous.prev
        prefix.reverse()
        ptup = tuple(prefix)

        if prev is not None and not self.is_simple_text:
            if flags[prev.code] == top_n_flag:
                if prev_cont != NC_NO_DUP:
                    cert = prob_to_certainty(outputs[prev.code]) + cert_offset
                    self._push_dup_or_nodawg(
                        length, True, prev.code, prev.unichar_id, cert,
                        worst_dict_cert, dict_ratio, use_dawgs, NC_ANYTHING,
                        prev, step,
                    )
                if (
                    prev_cont == NC_ANYTHING
                    and top_n_flag == TN_TOP2
                    and prev.code != self.null_char
                ):
                    cert = (
                        prob_to_certainty(
                            outputs[prev.code] + outputs[self.null_char]
                        )
                        + cert_offset
                    )
                    self._push_dup_or_nodawg(
                        length, True, prev.code, prev.unichar_id, cert,
                        worst_dict_cert, dict_ratio, use_dawgs, NC_NO_DUP,
                        prev, step,
                    )
            if prev_cont == NC_ONLY_DUP:
                return
            if (
                prev.code != self.null_char
                and length > 0
                and flags[self.null_char] == top_n_flag
            ):
                # Nulls within multi-code sequences (recodebeam.cpp:929)
                cert = prob_to_certainty(outputs[self.null_char]) + cert_offset
                self._push_dup_or_nodawg(
                    length, False, self.null_char, INVALID_UNICHAR_ID, cert,
                    worst_dict_cert, dict_ratio, use_dawgs, NC_ANYTHING,
                    prev, step,
                )

        final_codes = self.recoder.get_final_codes(ptup)
        if not ptup and not self._null_in_recoder:
            final_codes = list(final_codes) + [self.null_char]
        for code in final_codes:
            if flags[code] != top_n_flag:
                continue
            if prev is not None and prev.code == code and not self.is_simple_text:
                continue
            cert = prob_to_certainty(outputs[code]) + cert_offset
            if cert < K_MIN_CERTAINTY and code != self.null_char:
                continue
            uid = self.recoder.decode_unichar(list(ptup) + [code])
            if length == 0 and code == self.null_char:
                uid = INVALID_UNICHAR_ID
            if uid != INVALID_UNICHAR_ID and uid in self._disabled:
                continue  # whitelist/blacklist gate (recodebeam.cpp:959)
            self._continue_unichar(
                code, uid, cert, worst_dict_cert, dict_ratio, use_dawgs,
                NC_ANYTHING, prev, step,
            )
            if top_n_flag == TN_TOP2 and code != self.null_char:
                prob = outputs[code] + outputs[self.null_char]
                if (
                    prev is not None
                    and prev_cont == NC_ANYTHING
                    and prev.code != self.null_char
                    and (
                        (prev.code == self._top_code and code == self._second_code)
                        or (code == self._top_code and prev.code == self._second_code)
                    )
                ):
                    prob += outputs[prev.code]
                cert = prob_to_certainty(prob) + cert_offset
                self._continue_unichar(
                    code, uid, cert, worst_dict_cert, dict_ratio, use_dawgs,
                    NC_ONLY_DUP, prev, step,
                )

        for code in self.recoder.get_next_codes(ptup):
            if flags[code] != top_n_flag:
                continue
            if prev is not None and prev.code == code and not self.is_simple_text:
                continue
            cert = prob_to_certainty(outputs[code]) + cert_offset
            self._push_dup_or_nodawg(
                length + 1, False, code, INVALID_UNICHAR_ID, cert,
                worst_dict_cert, dict_ratio, use_dawgs, NC_ANYTHING, prev,
                step,
            )
            if top_n_flag == TN_TOP2 and code != self.null_char:
                prob = outputs[code] + outputs[self.null_char]
                if (
                    prev is not None
                    and prev_cont == NC_ANYTHING
                    and prev.code != self.null_char
                    and (
                        (prev.code == self._top_code and code == self._second_code)
                        or (code == self._top_code and prev.code == self._second_code)
                    )
                ):
                    prob += outputs[prev.code]
                cert = prob_to_certainty(prob) + cert_offset
                self._push_dup_or_nodawg(
                    length + 1, False, code, INVALID_UNICHAR_ID, cert,
                    worst_dict_cert, dict_ratio, use_dawgs, NC_ONLY_DUP,
                    prev, step,
                )

    def _continue_unichar(
        self, code, uid, cert, worst_dict_cert, dict_ratio, use_dawgs, cont,
        prev, step,
    ) -> None:
        """ContinueUnichar (recodebeam.cpp:1009-1049)."""
        if use_dawgs:
            if cert > worst_dict_cert:
                self._continue_dawg(code, uid, cert, cont, prev, step)
            return
        self._push_heap_node(
            step, self._beam_index(False, cont, 0), code, uid,
            TOP_CHOICE_PERM, False, False, False, False, cert * dict_ratio,
            prev, None,
        )
        if self.dawg is not None and (
            (uid == self.space_uid and cert > worst_dict_cert)
            or (uid >= 0 and not self._is_space_delimited(uid))
        ):
            # A space or a non-space-delimited char can start a new dict
            # word (recodebeam.cpp:1024-1047).  NO_PERM flags the space
            # so its predecessor-null certainty is forgotten.
            if uid == self.space_uid:
                self._push_initial_dawg(
                    code, uid, NO_PERM, False, False, cert, cont, prev, step
                )
            else:
                self._push_initial_dawg(
                    code, uid, TOP_CHOICE_PERM, False, False,
                    cert * dict_ratio, cont, prev, step,
                )

    def _continue_dawg(self, code, uid, cert, cont, prev, step) -> None:
        """ContinueDawg (recodebeam.cpp:1054-1134)."""
        dawg_index = self._beam_index(True, cont, 0)
        nodawg_index = self._beam_index(False, cont, 0)
        if uid == INVALID_UNICHAR_ID:
            # Dawg state lives only on completed-unichar nodes; the
            # uni_prev walk skips these (recodebeam.cpp:1060-1062).
            self._push_heap_node(
                step, dawg_index, code, uid, NO_PERM, False, False, False,
                False, cert, prev, None,
            )
            return
        uni_prev = prev
        while uni_prev is not None and (
            uni_prev.unichar_id == INVALID_UNICHAR_ID or uni_prev.duplicate
        ):
            uni_prev = uni_prev.prev
        if uid == self.space_uid:
            if uni_prev is not None and uni_prev.end_of_word:
                # Space after a complete word: reset to initial state.
                self._push_initial_dawg(
                    code, uid, uni_prev.permuter, False, False, cert, cont,
                    prev, step,
                )
                self._push_heap_node(
                    step, nodawg_index, code, uid, uni_prev.permuter, False,
                    False, False, False, cert, prev, None,
                )
            return
        if (
            uni_prev is not None
            and uni_prev.start_of_dawg
            and uni_prev.unichar_id != self.space_uid
            and self._is_space_delimited(uni_prev.unichar_id)
            and self._is_space_delimited(uid)
        ):
            return  # can't break words between space-delimited chars
        if uni_prev is None:
            active, word_start = 0, True  # line start: dawg root
        elif uni_prev.dawg_node is not None:
            active, word_start = uni_prev.dawg_node, uni_prev.start_of_dawg
        else:
            return  # not a dict continuation
        ch = self.uid_chars[uid] if uid < len(self.uid_chars) else None
        code_id = self._dawg_codes.get(ch) if ch is not None else None
        if code_id is None:
            return
        nxt, valid_end = self.dawg.step(active, code_id)
        if nxt < 0 and not valid_end:
            return
        self._push_heap_node(
            step, dawg_index, code, uid, SYSTEM_DAWG_PERM, False, word_start,
            valid_end, False, cert, prev, nxt if nxt >= 0 else None,
        )
        if valid_end and not self.space_delimited:
            # Space-free script: the next word may start right away
            # (recodebeam.cpp:1119-1127).
            self._push_initial_dawg(
                code, uid, SYSTEM_DAWG_PERM, word_start, True, cert, cont,
                prev, step,
            )
            self._push_heap_node(
                step, nodawg_index, code, uid, SYSTEM_DAWG_PERM, False,
                word_start, True, False, cert, prev, None,
            )

    def _push_initial_dawg(
        self, code, uid, permuter, start, end, cert, cont, prev, step
    ) -> None:
        """PushInitialDawgIfBetter (recodebeam.cpp:1139-1160): one best
        initial-dawg node per continuation per step."""
        score = cert + (prev.score if prev is not None else 0.0)
        best = self._best_initial_dawgs.get(cont)
        if best is None or score > best.score:
            self._best_initial_dawgs[cont] = RecodeNode(
                code, uid, permuter, True, start, end, False, cert, score,
                prev, 0, self._code_hash(code, False, prev),
            )

    def _push_dup_or_nodawg(
        self, length, dup, code, uid, cert, worst_dict_cert, dict_ratio,
        use_dawgs, cont, prev, step,
    ) -> None:
        """PushDupOrNoDawgIfBetter (recodebeam.cpp:1165-1185)."""
        index = self._beam_index(use_dawgs, cont, length)
        if use_dawgs:
            if cert > worst_dict_cert:
                self._push_heap_node(
                    step, index, code, uid,
                    prev.permuter if prev else NO_PERM, False, False, False,
                    dup, cert, prev, None,
                )
        else:
            cert *= dict_ratio
            if cert >= K_MIN_CERTAINTY or code == self.null_char:
                self._push_heap_node(
                    step, index, code, uid,
                    prev.permuter if prev else TOP_CHOICE_PERM, False, False,
                    False, dup, cert, prev, None,
                )

    def _push_heap_node(
        self, step, index, code, uid, permuter, dawg_start, word_start, end,
        dup, cert, prev, dawg_node,
    ) -> None:
        score = cert + (prev.score if prev is not None else 0.0)
        node = RecodeNode(
            code, uid, permuter, dawg_start, word_start, end, dup, cert,
            score, prev, dawg_node, self._code_hash(code, dup, prev),
        )
        self._push_heap(step, index, node)

    # -- extraction --------------------------------------------------------
    def _extract_best_paths(self) -> tuple[list, list]:
        """ExtractBestPaths (recodebeam.cpp:1276-1322)."""
        best = second = None
        if not self.steps:  # zero-timestep decode / extract before decode
            return [], []
        last = self.steps[-1]
        for (is_dawg, cont, length), heap in last.items():
            # Only completed-unichar beams can terminate a path
            # (BeamIndex(is_dawg, cont, 0), recodebeam.cpp:1290).
            if cont == NC_ONLY_DUP or length != 0:
                continue
            for node in heap:
                if is_dawg:
                    d = node
                    while d is not None and (
                        d.unichar_id == INVALID_UNICHAR_ID or d.duplicate
                    ):
                        d = d.prev
                    if d is None or (
                        not d.end_of_word and d.unichar_id != self.space_uid
                    ):
                        continue
                if best is None or node.score > best.score:
                    second, best = best, node
                elif second is None or node.score > second.score:
                    second = node
        return self._extract_path(best), self._extract_path(second)

    @staticmethod
    def _extract_path(node) -> list:
        path = []
        while node is not None:
            path.append(node)
            node = node.prev
        path.reverse()
        return path

    def extract_best_path_as_labels(self) -> tuple[list[int], list[int]]:
        """ExtractBestPathAsLabels (recodebeam.cpp:200-218)."""
        best, _ = self._extract_best_paths()
        labels, xcoords = [], []
        t, width = 0, len(best)
        while t < width:
            label = best[t].code
            if label != self.null_char:
                labels.append(label)
                xcoords.append(t)
            t += 1
            while t < width and not self.is_simple_text and best[t].code == label:
                t += 1
        xcoords.append(width)
        return labels, xcoords

    def extract_best_path_as_unichar_ids(
        self,
    ) -> tuple[list[int], list[float], list[float], list[int]]:
        """ExtractBestPathAsUnicharIds (recodebeam.cpp:223-234)."""
        best, _ = self._extract_best_paths()
        return self._extract_path_as_unichar_ids(best)

    def _extract_path_as_unichar_ids(self, best_nodes):
        """ExtractPathAsUnicharIds (recodebeam.cpp:565-630)."""
        unichar_ids: list[int] = []
        certs: list[float] = []
        ratings: list[float] = []
        xcoords: list[int] = []
        t, width = 0, len(best_nodes)
        while t < width:
            certainty = 0.0
            rating = 0.0
            while t < width and best_nodes[t].unichar_id == INVALID_UNICHAR_ID:
                cert = best_nodes[t].certainty
                t += 1
                if cert < certainty:
                    certainty = cert
                rating -= cert
            if t < width:
                uid = best_nodes[t].unichar_id
                if (
                    uid == self.space_uid
                    and certs
                    and best_nodes[t].permuter != NO_PERM
                ):
                    # Rating/certainty of leading nulls go on the
                    # previous character, not the space.
                    if certainty < certs[-1]:
                        certs[-1] = certainty
                    ratings[-1] += rating
                    certainty = 0.0
                    rating = 0.0
                unichar_ids.append(uid)
                xcoords.append(t)
                while True:
                    cert = best_nodes[t].certainty
                    t += 1
                    if cert < certainty or (
                        uid == self.space_uid
                        and best_nodes[t - 1].permuter == NO_PERM
                    ):
                        certainty = cert
                    rating -= cert
                    if not (t < width and best_nodes[t].duplicate):
                        break
                certs.append(certainty)
                ratings.append(rating)
            elif certs:
                if certainty < certs[-1]:
                    certs[-1] = certainty
                ratings[-1] += rating
        xcoords.append(width)
        return unichar_ids, certs, ratings, xcoords

    def extract_best_path_as_words(self, uid_to_text) -> list["RecWord"]:
        """ExtractBestPathAsWords' segmentation loop (recodebeam.cpp:
        262-316), returning RecWord records instead of WERD_RES."""
        best, _ = self._extract_best_paths()
        unichar_ids, certs, ratings, xcoords = self._extract_path_as_unichar_ids(
            best
        )
        num_ids = len(unichar_ids)
        words: list[RecWord] = []
        prev_space_cert = 0.0
        word_start = 0
        while word_start < num_ids:
            word_end = word_start + 1
            while word_end < num_ids:
                if unichar_ids[word_end] == self.space_uid:
                    break
                index = xcoords[word_end]
                if best[index].start_of_word:
                    break
                if best[index].permuter == TOP_CHOICE_PERM and (
                    not self._is_space_delimited(unichar_ids[word_end])
                    or not self._is_space_delimited(unichar_ids[word_end - 1])
                ):
                    break
                word_end += 1
            space_cert = 0.0
            if word_end < num_ids and unichar_ids[word_end] == self.space_uid:
                space_cert = certs[word_end]
            leading_space = (
                word_start > 0 and unichar_ids[word_start - 1] == self.space_uid
            )
            seg = slice(word_start, word_end)
            words.append(
                RecWord(
                    text="".join(uid_to_text(u) for u in unichar_ids[seg]),
                    unichar_ids=list(unichar_ids[seg]),
                    certainties=list(certs[seg]),
                    ratings=list(ratings[seg]),
                    permuter=best[xcoords[word_end - 1]].permuter,
                    space_before=leading_space,
                    space_certainty=min(space_cert, prev_space_cert),
                )
            )
            prev_space_cert = space_cert
            if word_end < num_ids and unichar_ids[word_end] == self.space_uid:
                word_end += 1
            word_start = word_end
        return words


@dataclass
class RecWord:
    """The WERD_RES payload the words walk produces (best_choice
    string, per-blob certainties/ratings, permuter, preceding space)."""

    text: str
    unichar_ids: list[int]
    certainties: list[float]
    ratings: list[float]
    permuter: int
    space_before: bool
    space_certainty: float
