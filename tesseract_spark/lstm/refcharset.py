"""Reference-exact UNICHARSET behavior: insertion, encoding, save/load.

This is the behavioral port of the reference charset container
(src/ccutil/unicharset.cpp, unicharmap.cpp, unichar.cpp) at the
granularity its own unit tests pin down (unittest/unicharset_test.cc,
unichar_test.cc):

- the three reserved slots (" ", "Joined", "|Broken|0|1") occupy ids
  0..2 (unicharset.cpp:79-81,170-175), so the first user insert gets
  id 3;
- ``unichar_insert`` cleans the incoming string through the ligature /
  tatweel cleanup maps (unicharset.cpp:72-77) and *refuses* to add a
  string the existing set can already encode (unicharset.cpp:654-670) —
  that is why the fi ligature is not added once ``f`` and ``i`` exist,
  but IS added (as the "fi" pair) when they don't;
- ``encode_string`` is the depth-first shortest-match-first search of
  unicharset.cpp:484-524 layered under the skip-on-failure wrapper of
  unicharset.cpp:239-277;
- save/load round-trips the text format of save_to_string
  (unicharset.cpp:718-755), with ids preserved through
  unichar_insert_backwards_compatible (unicharset.h:288-299) so
  old-style files keep their ligature rows.

The engine's day-to-day charset (tessdata.Unicharset) stays the flat
sorted-charset container the LSTM path wants; this module carries the
reference's exact ingest semantics and is what the traineddata loader
leans on for parity arguments.
"""

from __future__ import annotations

INVALID_UNICHAR_ID = -1
UNICHAR_LEN = 30  # include/tesseract/unichar.h:31
UNI_MAX_LEGAL_UTF32 = 0x0010FFFF

# unicharset.cpp:72-77 kCleanupMaps
CLEANUP_MAPS = (("ـ", ""), ("ﬁ", "fi"), ("ﬂ", "fl"))

# unicharset.cpp:79-81 kSpecialUnicharCodes
SPECIAL_UNICHAR_CODES = (" ", "Joined", "|Broken|0|1")


def utf8_step(b: bytes, i: int = 0) -> int:
    """Bytes in the UTF-8 char starting at b[i] (unichar.cpp:143-156).

    0 for continuation bytes (0x80-0xBF) and illegal leads (0xF8+)."""
    if i >= len(b):
        return 0
    c = b[i]
    if c < 0x80:
        return 1
    if c < 0xC0:
        return 0
    if c < 0xE0:
        return 2
    if c < 0xF0:
        return 3
    if c < 0xF8:
        return 4
    return 0


def _decode_at(b: bytes, i: int) -> tuple[int, int]:
    """(codepoint, step) at b[i]; step 0 if illegal (unichar.cpp:105-131
    first_uni over a legality-checked iterator)."""
    step = utf8_step(b, i)
    if step == 0 or i + step > len(b):
        return 0, 0
    for j in range(1, step):
        if (b[i + j] & 0xC0) != 0x80:
            return 0, 0
    offsets = (0, 0, 0x3080, 0xE2080, 0x3C82080)
    uni = 0
    for j in range(step):
        uni = (uni << 6) + b[i + j] if j else b[i]
    return uni - offsets[step], step


def utf8_to_utf32(s: str | bytes) -> list[int]:
    """UNICHAR::UTF8ToUTF32 (unichar.cpp:220-235): empty on any
    invalid sequence."""
    b = s.encode("utf-8", "surrogatepass") if isinstance(s, str) else s
    out: list[int] = []
    i = 0
    while i < len(b):
        cp, step = _decode_at(b, i)
        if step == 0:
            return []
        out.append(cp)
        i += step
    return out


def _encode_cp(cp: int) -> bytes:
    """UNICHAR(int) constructor byte math (unichar.cpp:66-102); b"" on
    illegal values (negative or beyond U+10FFFF; surrogates pass, as in
    the reference)."""
    if cp < 0:
        return b""
    if cp < 0x80:
        return bytes([cp])
    if cp < 0x800:
        return bytes([0xC0 | (cp >> 6), 0x80 | (cp & 0x3F)])
    if cp < 0x10000:
        return bytes([0xE0 | (cp >> 12), 0x80 | ((cp >> 6) & 0x3F), 0x80 | (cp & 0x3F)])
    if cp <= UNI_MAX_LEGAL_UTF32:
        return bytes(
            [
                0xF0 | (cp >> 18),
                0x80 | ((cp >> 12) & 0x3F),
                0x80 | ((cp >> 6) & 0x3F),
                0x80 | (cp & 0x3F),
            ]
        )
    return b""


def utf32_to_utf8(cps: list[int]) -> str:
    """UNICHAR::UTF32ToUTF8 (unichar.cpp:237-250): empty string if any
    codepoint is illegal."""
    out = bytearray()
    for cp in cps:
        enc = _encode_cp(cp)
        if not enc:
            return ""
        out += enc
    return out.decode("utf-8", "surrogatepass")


def cleanup_string(s: str) -> str:
    """UNICHARSET::CleanupString (unicharset.cpp:1158-1185)."""
    for a, b in CLEANUP_MAPS:
        s = s.replace(a, b)
    return s


class RefUnicharset:
    """The reference UNICHARSET ingest/encode surface over a byte map.

    The UNICHARMAP trie (unicharmap.cpp) is carried as a dict from the
    UTF-8 byte representation to the id; ``minmatch`` scans prefix
    lengths in increasing order, which is exactly what the trie's walk
    returns (unicharmap.cpp:106-121)."""

    def __init__(self, with_specials: bool = True) -> None:
        self.reprs: list[bytes] = []
        self.properties: list[int] = []
        self._ids: dict[bytes, int] = {}
        self._maxlen = 0
        self.old_style_included = False
        if with_specials:
            for s in SPECIAL_UNICHAR_CODES:
                self.unichar_insert(s)

    # -- core map ----------------------------------------------------
    def __len__(self) -> int:
        return len(self.reprs)

    size = property(__len__)

    def _contains_bytes(self, b: bytes) -> bool:
        return b in self._ids

    def _minmatch(self, b: bytes) -> int:
        for L in range(1, min(self._maxlen, len(b)) + 1):
            if b[:L] in self._ids:
                return L
        return 0

    # -- ingest ------------------------------------------------------
    def unichar_insert(self, unichar_repr: str, old_style: bool = False) -> None:
        """unicharset.cpp:654-692."""
        if old_style:
            self.old_style_included = True
        cleaned = unichar_repr if self.old_style_included else cleanup_string(unichar_repr)
        cb = cleaned.encode("utf-8")
        if not cb or cb in self._ids:
            return
        if not self.old_style_included:
            perfect, _, _, _ = self.encode_string(cleaned, True)
            if perfect:
                return
        if len(cb) > UNICHAR_LEN:
            return
        uid = len(self.reprs)
        self.reprs.append(cb)
        self.properties.append(0)
        self._ids[cb] = uid
        self._maxlen = max(self._maxlen, len(cb))

    def unichar_insert_backwards_compatible(self, unichar_repr: str) -> None:
        """unicharset.h:288-299: old files keep every row — if the
        clean insert was a no-op, force the old-style insert."""
        if cleanup_string(unichar_repr) != unichar_repr:
            self.unichar_insert(unichar_repr, old_style=True)
        else:
            old_size = len(self)
            self.unichar_insert(unichar_repr, old_style=False)
            if len(self) == old_size:
                self.unichar_insert(unichar_repr, old_style=True)

    # -- lookup ------------------------------------------------------
    def unichar_to_id(self, unichar_repr: str, length: int | None = None) -> int:
        b = unichar_repr.encode("utf-8")
        if length is not None:
            b = b[:length]
        if not self.old_style_included:
            b = cleanup_string(b.decode("utf-8", "replace")).encode("utf-8")
        return self._ids.get(b, INVALID_UNICHAR_ID)

    def id_to_unichar(self, uid: int) -> str:
        if uid == INVALID_UNICHAR_ID:
            return ""
        return self.reprs[uid].decode("utf-8")

    def has_special_codes(self) -> bool:
        """unicharset.h has_special_codes_: true when ids 0..2 are the
        reserved " "/Joined/Broken rows."""
        return (
            len(self.reprs) >= 3
            and self.reprs[0] == b" "
            and self.reprs[1] == b"Joined"
            and self.reprs[2].startswith(b"|Broken|")
        )

    def contains_unichar(self, unichar_repr: str) -> bool:
        s = unichar_repr if self.old_style_included else cleanup_string(unichar_repr)
        return s.encode("utf-8") in self._ids

    # -- encoding ----------------------------------------------------
    def _encode_rec(
        self,
        b: bytes,
        str_index: int,
        encoding: list[int],
        lengths: list[int],
        best: list,
    ) -> None:
        """unicharset.cpp:492-524: DFS on increasing match lengths,
        keeping the first encoding that covers the longest prefix."""
        if str_index > best[0]:
            best[0] = str_index
            best[1] = list(encoding)
            best[2] = list(lengths)
        if str_index == len(b):
            return
        mark = len(encoding)
        length = self._minmatch(b[str_index:])
        if length == 0 or str_index + length > len(b):
            return
        while True:
            piece = b[str_index : str_index + length]
            if piece in self._ids:
                encoding.append(self._ids[piece])
                lengths.append(length)
                self._encode_rec(b, str_index + length, encoding, lengths, best)
                if best[0] == len(b):
                    return
                del encoding[mark:]
                del lengths[mark:]
            step = utf8_step(b, str_index + length) or 1
            length += step
            if length > UNICHAR_LEN or str_index + length > len(b):
                break

    def encode_string(
        self, text: str, give_up_on_failure: bool = True
    ) -> tuple[bool, list[int], list[int], int]:
        """unicharset.cpp:239-277. Returns (perfect, encoding,
        lengths, encoded_length); on failure with give_up=False the
        bad character becomes INVALID_UNICHAR_ID and the walk
        continues."""
        b = text.encode("utf-8")
        encoding: list[int] = []
        best_lengths: list[int] = []
        working_enc: list[int] = []
        working_len: list[int] = []
        str_pos = 0
        perfect = True
        while str_pos < len(b):
            best = [str_pos, encoding, best_lengths]
            self._encode_rec(b, str_pos, working_enc, working_len, best)
            str_pos, encoding, best_lengths = best[0], best[1], best[2]
            if str_pos < len(b):
                perfect = False
                if give_up_on_failure:
                    break
                step = utf8_step(b, str_pos) or 1
                encoding.append(INVALID_UNICHAR_ID)
                best_lengths.append(step)
                str_pos += step
                working_enc = list(encoding)
                working_len = list(best_lengths)
        return perfect, encoding, best_lengths, str_pos

    # -- text format -------------------------------------------------
    def save_to_string(self) -> str:
        """save_to_string (unicharset.cpp:718-755). One divergence,
        documented: the reference prints properties in hex on the NULL
        row (%x) but decimal on normal rows while its loader reads hex
        for both; we write hex on both sides so the round trip is
        self-consistent."""
        lines = [f"{len(self)}\n"]
        for uid in range(len(self)):
            rep = self.id_to_unichar(uid)
            props = self.properties[uid]
            if rep == " ":
                lines.append(f"NULL {props:x} NULL 0\n")
            else:
                lines.append(f"{rep} {props:x} 0,255,0,255,0,0,0,0,0,0 NULL 0 0 0 {rep}\t# {rep}\n")
        return "".join(lines)

    @classmethod
    def load_from_string(cls, text: str) -> "RefUnicharset":
        """load_from_file body (unicharset.cpp:780-905): specials are
        rows in the file itself, so start empty and let
        backwards-compatible insertion preserve the file's ids."""
        lines = text.splitlines()
        n = int(lines[0].split()[0])
        u = cls(with_specials=False)
        for ln in lines[1 : 1 + n]:
            fields = ln.split(" ")
            rep = fields[0]
            props = int(fields[1], 16) if len(fields) > 1 else 0
            if rep == "NULL":
                u.unichar_insert(" ")
            else:
                u.unichar_insert_backwards_compatible(rep)
            u.properties[len(u) - 1] = props
        return u
