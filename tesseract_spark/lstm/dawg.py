"""DAWG (directed acyclic word graph) — build, pack, probe.

Re-expresses the reference's dictionary machinery on numpy arrays:

- ``src/dict/dawg.h:47`` packs each edge into a uint64 ``EDGE_RECORD``
  (unichar_id | node_ref | WERD_END / LAST / DIRECTION flags,
  dawg.h:79-86); ``src/dict/trie.h`` builds a trie then squishes it.
- ``src/dict/dict.cpp:407`` (``def_letter_is_okay``) probes one letter at a
  time during decoding; ``src/lstm/recodebeam.cpp:1054-1133``
  (``ContinueDawg``) drives it per beam step.

Here: build a trie from a wordlist, merge equivalent suffix subtrees
(the "squish"), and pack edges into three parallel int64 numpy arrays
sorted per node, so the decode loop probes children with
``np.searchsorted`` — a broadcast-friendly, executor-side-shared structure
(broadcast once per job, like DawgCache ``src/dict/dawg_cache.cpp``).
"""

from __future__ import annotations

import numpy as np


class Dawg:
    """Packed DAWG with vectorized child lookup.

    Arrays (aligned, one entry per edge, grouped by source node, sorted by
    char code within a node):
      edge_char[i]  — char code of edge i
      edge_next[i]  — target node id (-1 if terminal-only edge)
      edge_end[i]   — 1 if a word may end after consuming this edge
      node_start[n], node_cnt[n] — edge span of node n (node 0 = root)
    """

    def __init__(self, charset: str, words: list[str]):
        self.charset = charset
        self.char_code = {c: i for i, c in enumerate(charset)}
        trie: list[dict] = [{}]  # node -> {code: [child, end]}
        ends: list[bool] = [False]
        for w in sorted(set(words)):
            codes = [self.char_code[c] for c in w if c in self.char_code]
            if len(codes) != len(w) or not w:
                continue  # word uses chars outside the charset
            node = 0
            for code in codes:
                nxt = trie[node].get(code)
                if nxt is None:
                    trie.append({})
                    ends.append(False)
                    nxt = len(trie) - 1
                    trie[node][code] = nxt
                node = nxt
            ends[node] = True
        # squish: merge identical subtrees bottom-up (hash-consing on the
        # one-level signature of remapped children — children canonize
        # first, so equal signatures mean equal subtrees)
        canon: dict[tuple, int] = {}
        remap: dict[int, int] = {}

        def canonize(n: int) -> int:
            if n in remap:
                return remap[n]
            for c in list(trie[n]):
                trie[n][c] = canonize(trie[n][c])
            sig = (ends[n],) + tuple(sorted(trie[n].items()))
            if sig in canon:
                remap[n] = canon[sig]
            else:
                canon[sig] = n
                remap[n] = n
            return remap[n]

        canonize(0)
        live = sorted({remap[i] for i in range(len(trie)) if remap.get(i) == i} | {0})
        newid = {old: i for i, old in enumerate(live)}
        n_nodes = len(live)
        chars, nexts, endf = [], [], []
        node_start = np.zeros(n_nodes, dtype=np.int64)
        node_cnt = np.zeros(n_nodes, dtype=np.int64)
        for old in live:
            node_start[newid[old]] = len(chars)
            for c, ch in sorted(trie[old].items()):
                chars.append(c)
                nexts.append(newid[remap[ch]])
                endf.append(1 if ends[remap[ch]] else 0)
            node_cnt[newid[old]] = len(trie[old])
        self.edge_char = np.asarray(chars, dtype=np.int64)
        self.edge_next = np.asarray(nexts, dtype=np.int64)
        self.edge_end = np.asarray(endf, dtype=np.int64)
        self.node_start = node_start
        self.node_cnt = node_cnt
        self.n_nodes = n_nodes
        self.n_edges = len(chars)

    def step(self, node: int, code: int) -> tuple[int, bool]:
        """One ``def_letter_is_okay`` probe: (next_node, word_may_end).

        Returns (-1, False) if the letter is not a valid continuation.
        """
        s = self.node_start[node]
        c = self.node_cnt[node]
        if c == 0:
            return -1, False
        span = self.edge_char[s : s + c]
        i = int(np.searchsorted(span, code))
        if i >= c or span[i] != code:
            return -1, False
        return int(self.edge_next[s + i]), bool(self.edge_end[s + i])

    def accepts(self, word: str) -> bool:
        node, end = 0, False
        for ch in word:
            code = self.char_code.get(ch)
            if code is None:
                return False
            node, end = self.step(node, code)
            if node < 0:
                return False
        return end

    def all_words(self, max_len: int = 64) -> list[str]:
        """Enumerate accepted words (round-trip test per dawg_test.cc:85-89)."""
        out: list[str] = []
        inv = {i: c for c, i in self.char_code.items()}
        stack: list[tuple[int, str]] = [(0, "")]
        while stack:
            node, prefix = stack.pop()
            if len(prefix) > max_len:
                continue
            s, c = self.node_start[node], self.node_cnt[node]
            for i in range(int(c) - 1, -1, -1):
                ch = inv[int(self.edge_char[s + i])]
                nxt = int(self.edge_next[s + i])
                w = prefix + ch
                if self.edge_end[s + i]:
                    out.append(w)
                stack.append((nxt, w))
        return sorted(out)


# ---------------------------------------------------------------------------
# SquishedDawg binary format (src/dict/dawg.h:79-113, dawg.cpp:340-552):
# the on-disk dictionary shape inside .traineddata files and the
# wordlist2dawg / dawg2wordlist tool pair (src/training/wordlist2dawg.cpp,
# dawg2wordlist.cpp).
# ---------------------------------------------------------------------------

import struct

DAWG_MAGIC = 42  # kDawgMagicNumber, dawg.h:113
NUM_FLAG_BITS = 3  # dawg.h:84
MARKER_FLAG = 1  # last edge of a node's run (dawg.h:81)
DIRECTION_FLAG = 2  # backward edge (write emits forward only)
WERD_END_FLAG = 4  # a word may end on this edge


def _flag_start_bit(unicharset_size: int) -> int:
    """CeilLog2 (dawg.cpp:120-127): bit count of the size value itself."""
    return int(unicharset_size).bit_length()


def write_squished_dawg(dawg: Dawg, unicharset_size: int | None = None) -> bytes:
    """Serialize to the reference's squished-dawg byte format
    (SquishedDawg::write_squished_dawg, dawg.cpp:487-552): int16 magic,
    uint32 unicharset_size, int32 num_edges, then one little-endian
    uint64 EDGE_RECORD per forward edge — letter in the low
    CeilLog2(size) bits, 3 flag bits, then the target node's file
    offset (0 = terminal, the build_node_map numbering, dawg.cpp:446)."""
    ucs = unicharset_size if unicharset_size is not None else len(dawg.charset)
    if ucs < len(dawg.charset):
        raise ValueError("unicharset_size smaller than the dawg charset")
    if dawg.n_edges == 0:
        # the reference's reader rejects num_edges == 0 (dawg.cpp:370) —
        # make the write side fail loudly instead of producing an
        # unreadable header-only blob
        raise ValueError("empty dawg: nothing to serialize")
    fsb = _flag_start_bit(ucs)
    # file offset of each non-empty node's first edge; root (node 0)
    # leads even when empty-rooted dawgs are degenerate
    order = [0] + [
        n for n in range(1, dawg.n_nodes) if int(dawg.node_cnt[n]) > 0
    ]
    offsets: dict[int, int] = {}
    off = 0
    for n in order:
        offsets[n] = off
        off += int(dawg.node_cnt[n])
    recs: list[int] = []
    for n in order:
        s, c = int(dawg.node_start[n]), int(dawg.node_cnt[n])
        for j in range(c):
            nxt_node = int(dawg.edge_next[s + j])
            nxt = (
                offsets[nxt_node]
                if int(dawg.node_cnt[nxt_node]) > 0
                else 0
            )
            flags = 0
            if j == c - 1:
                flags |= MARKER_FLAG
            if int(dawg.edge_end[s + j]):
                flags |= WERD_END_FLAG
            recs.append(
                int(dawg.edge_char[s + j])
                | (flags << fsb)
                | (nxt << (fsb + NUM_FLAG_BITS))
            )
    return struct.pack("<hIi", DAWG_MAGIC, ucs, len(recs)) + struct.pack(
        f"<{len(recs)}Q", *recs
    )


def read_squished_dawg(data: bytes, charset: str) -> Dawg:
    """Parse the squished-dawg byte format back into a probe-ready Dawg
    (SquishedDawg::read_squished_dawg, dawg.cpp:340-430, including its
    validation: magic, edge-count bounds, terminated forward runs,
    in-bounds next_node offsets)."""
    if len(data) < 10:
        raise ValueError("dawg too short for header")
    magic, ucs, num_edges = struct.unpack_from("<hIi", data, 0)
    if magic != DAWG_MAGIC:
        raise ValueError(f"bad dawg magic {magic} (want {DAWG_MAGIC})")
    if num_edges <= 0:
        raise ValueError("empty dawg: num_edges is 0")
    if len(data) - 10 < 8 * num_edges:
        raise ValueError("dawg num_edges exceeds remaining data")
    fsb = _flag_start_bit(ucs)
    recs = np.frombuffer(data, dtype="<u8", count=num_edges, offset=10)
    letters = (recs & ((1 << fsb) - 1)).astype(np.int64)
    flags = ((recs >> fsb) & 7).astype(np.int64)
    nexts_off = (recs >> (fsb + NUM_FLAG_BITS)).astype(np.int64)
    if (flags & DIRECTION_FLAG).any():
        raise ValueError("squished dawg contains backward edges")
    if (letters >= len(charset)).any():
        raise ValueError("dawg letter id outside the charset")
    # node runs: each starts after the previous MARKER-terminated run
    run_start: list[int] = []
    i = 0
    while i < num_edges:
        run_start.append(i)
        while not (flags[i] & MARKER_FLAG):
            i += 1
            if i >= num_edges:
                raise ValueError("unterminated forward edge run")
        i += 1
    node_of_off = {o: n for n, o in enumerate(run_start)}
    n_nonempty = len(run_start)
    empty_node = n_nonempty  # shared terminal node (zero edges)
    edge_char: list[int] = []
    edge_next: list[int] = []
    edge_end: list[int] = []
    node_start = np.zeros(n_nonempty + 1, dtype=np.int64)
    node_cnt = np.zeros(n_nonempty + 1, dtype=np.int64)
    for n, o in enumerate(run_start):
        end = o
        while not (flags[end] & MARKER_FLAG):
            end += 1
        span = sorted(range(o, end + 1), key=lambda k: int(letters[k]))
        node_start[n] = len(edge_char)
        node_cnt[n] = end + 1 - o
        for k in span:
            t = int(nexts_off[k])
            if t == 0:
                tgt = empty_node
            else:
                tgt = node_of_off.get(t)
                if tgt is None:
                    raise ValueError(
                        f"dawg edge {k} next_node {t} is not a node start"
                    )
            edge_char.append(int(letters[k]))
            edge_next.append(tgt)
            edge_end.append(1 if int(flags[k]) & WERD_END_FLAG else 0)
    out = Dawg.__new__(Dawg)
    out.charset = charset
    out.char_code = {c: i for i, c in enumerate(charset)}
    out.edge_char = np.asarray(edge_char, dtype=np.int64)
    out.edge_next = np.asarray(edge_next, dtype=np.int64)
    out.edge_end = np.asarray(edge_end, dtype=np.int64)
    out.node_start = node_start
    out.node_cnt = node_cnt
    out.n_nodes = n_nonempty + 1
    out.n_edges = len(edge_char)
    return out


def wordlist2dawg(words: list[str], charset: str) -> bytes:
    """The wordlist2dawg tool (src/training/wordlist2dawg.cpp:34-95):
    build + squish + serialize.  Words pass through the unicharset's
    ingest cleanup first (kCleanupMaps: tatweel deleted, fi/fl
    ligatures expanded — the DictIgnoresTatweel contract,
    unittest/tatweel_test.cc:62-75)."""
    from .tessdata import Unicharset

    return write_squished_dawg(
        Dawg(charset, [Unicharset.cleanup_string(w) for w in words])
    )


def dawg2wordlist(data: bytes, charset: str) -> list[str]:
    """The dawg2wordlist tool (src/training/dawg2wordlist.cpp:23-60):
    deserialize + enumerate (iterate_words order: sorted)."""
    return read_squished_dawg(data, charset).all_words()


# ---------------------------------------------------------------------------
# User-patterns DAWG (Trie::read_pattern_list, src/dict/trie.cpp:390-460)
# ---------------------------------------------------------------------------

# character-class escapes (Trie::character_class_to_pattern,
# src/dict/trie.cpp:372-388): \c alpha, \d digit, \n alphanumeric,
# \p punctuation, \a lower, \A upper; \* = repeat previous unit;
# \\ = literal backslash.
_CLASS_TESTS = {
    "c": str.isalpha,
    "d": str.isdigit,
    "n": str.isalnum,
    "p": lambda ch: not ch.isalnum() and not ch.isspace(),
    "a": str.islower,
    "A": str.isupper,
}


class PatternDawg:
    """User-patterns dictionary: patterns with character classes and
    repetition, probed through the same (node, code) -> (next, end)
    interface as the word DAWG so the beam treats both uniformly
    (Dict::Load user-patterns path, src/dict/dict.cpp).

    Matching runs a lazily-determinized NFA: a node id names a SET of
    (pattern, position) states; transitions consume one charset code.
    Repetition (\\*) self-loops the position after its first match — the
    same shape as the self-loop edge the reference trie inserts.
    """

    def __init__(self, charset: str, patterns: list[str]):
        self.charset = charset
        self.patterns: list[tuple[list, list[bool]]] = []
        for pat in patterns:
            units, reps = self._parse(pat)
            if units:
                self.patterns.append((units, reps))
        start = frozenset(
            (pi, 0) for pi in range(len(self.patterns))
        )
        self._states: list[frozenset] = [start]
        self._state_id: dict[frozenset, int] = {start: 0}
        self._trans: dict[tuple[int, int], tuple[int, bool]] = {}

    @staticmethod
    def _parse(pat: str) -> tuple[list, list[bool]]:
        units: list = []  # str literal | ('class', letter)
        reps: list[bool] = []
        i = 0
        while i < len(pat):
            ch = pat[i]
            if ch == "\\" and i + 1 < len(pat):
                nxt = pat[i + 1]
                if nxt == "\\":
                    units.append("\\")
                    reps.append(False)
                    i += 2
                elif nxt == "*":
                    if reps:
                        reps[-1] = True
                    i += 2
                elif nxt in _CLASS_TESTS:
                    units.append(("class", nxt))
                    reps.append(False)
                    i += 2
                else:
                    return [], []  # invalid escape: reject pattern
            else:
                units.append(ch)
                reps.append(False)
                i += 1
        return units, reps

    def _matches(self, unit, ch: str) -> bool:
        if isinstance(unit, tuple):
            return _CLASS_TESTS[unit[1]](ch)
        return unit == ch

    def step(self, node: int, code: int) -> tuple[int, bool]:
        key = (node, code)
        hit = self._trans.get(key)
        if hit is not None:
            return hit
        ch = self.charset[code]
        nxt: set[tuple[int, int]] = set()
        for pi, pos in self._states[node]:
            units, reps = self.patterns[pi]
            if pos < len(units) and self._matches(units[pos], ch):
                nxt.add((pi, pos + 1))
            # self-loop: re-match the previous unit when it repeats
            if pos > 0 and reps[pos - 1] and self._matches(units[pos - 1], ch):
                nxt.add((pi, pos))
        if not nxt:
            self._trans[key] = (-1, False)
            return -1, False
        fs = frozenset(nxt)
        sid = self._state_id.get(fs)
        if sid is None:
            sid = len(self._states)
            self._states.append(fs)
            self._state_id[fs] = sid
        end = any(pos == len(self.patterns[pi][0]) for pi, pos in fs)
        self._trans[key] = (sid, end)
        return sid, end

    def accepts(self, word: str) -> bool:
        node, end = 0, False
        for ch in word:
            code = self.charset.find(ch)
            if code < 0:
                return False
            node, end = self.step(node, code)
            if node < 0:
                return False
        return end


class CombinedDawg:
    """Word DAWG + pattern DAWG probed in parallel (the reference's
    multi-dawg DawgArgs: a letter is okay if ANY loaded dawg continues,
    a word complete if ANY dawg ends there — dict.cpp:407 over
    active_dawgs).  Node ids index memoized (word_node, pattern_node)
    pairs; -1 marks a dead component."""

    def __init__(self, word_dawg: Dawg | None, pattern_dawg: PatternDawg | None):
        self.word = word_dawg
        self.pattern = pattern_dawg
        self.charset = (word_dawg or pattern_dawg).charset
        self._pairs: list[tuple[int, int]] = [(0, 0)]
        self._pair_id: dict[tuple[int, int], int] = {(0, 0): 0}

    def step(self, node: int, code: int) -> tuple[int, bool]:
        wn, pn = self._pairs[node]
        w2, wend = (self.word.step(wn, code) if self.word is not None and wn >= 0
                    else (-1, False))
        p2, pend = (self.pattern.step(pn, code) if self.pattern is not None and pn >= 0
                    else (-1, False))
        if w2 < 0 and p2 < 0:
            return -1, False
        pair = (w2, p2)
        sid = self._pair_id.get(pair)
        if sid is None:
            sid = len(self._pairs)
            self._pairs.append(pair)
            self._pair_id[pair] = sid
        return sid, wend or pend

    def accepts(self, word: str) -> bool:
        node, end = 0, False
        for ch in word:
            code = self.charset.find(ch)
            if code < 0:
                return False
            node, end = self.step(node, code)
            if node < 0:
                return False
        return end
