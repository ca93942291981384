"""traineddata (tessdata) container + LSTM model serialization.

Implements the reference's on-disk model format so the engine can
serialize its own VGSL nets into real ``*.traineddata`` files and load
them back (and, structurally, load reference-produced files):

- Container: ``src/ccutil/tessdatamanager.cpp:110-167`` (LoadMemBuffer) /
  ``:188-230`` (Serialize): uint32 LE entry count, int64 absolute offsets
  (-1 = absent), concatenated section payloads.  Section ids follow the
  ``TessdataType`` enum (``src/ccutil/tessdatamanager.h:58-85``).
- LSTM section: ``LSTMRecognizer::Serialize/DeSerialize``
  (``src/lstm/lstmrecognizer.cpp:93-178``): network tree, optional
  embedded unicharset, network spec string, training counters, null char,
  adam/lr/momentum scalars, optional recoder.
- Network tree: ``Network::Serialize`` (``src/lstm/network.cpp:155-189``)
  — int8 NT_NONE marker + type-name string (the forward-compatible name
  encoding), training/backprop flags, network_flags, ni, no, num_weights,
  layer name; plumbing layers (Series/Parallel/Reversed,
  ``src/lstm/plumbing.cpp``) recurse with a uint32 child count.
- WeightMatrix: ``src/lstm/weightmatrix.cpp:238-330`` — uint8 mode
  (kDoubleFlag=128 | kInt8Flag=1 | kAdamFlag=4), then either a float
  GENERIC_2D_ARRAY<double> (uint32 dim1, uint32 dim2, double empty,
  row-major doubles) or an int8 array + per-output double scales.
- Unicharset: text format (``UNICHARSET::save_to_string``,
  ``src/ccutil/unicharset.cpp:718-756``): size line, then one line per
  unichar.
- Recoder: ``UnicharCompress::Serialize`` (``unicharcompress.cpp``) — a
  TFile vector of RecodedCharID (int8 self_normalized, uint32 length,
  int32 codes[length], ``unicharcompress.h:75-118``).

All multi-byte values little-endian (the reference detects and swaps
big-endian files; we write native LE like every shipped traineddata).
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

import numpy as np

# TessdataType (tessdatamanager.h:58-85) — only the ids this engine uses.
TESSDATA_LANG_CONFIG = 0
TESSDATA_UNICHARSET = 1
TESSDATA_LSTM = 17
TESSDATA_LSTM_PUNC_DAWG = 18
TESSDATA_LSTM_SYSTEM_DAWG = 19
TESSDATA_LSTM_NUMBER_DAWG = 20
TESSDATA_LSTM_UNICHARSET = 21
TESSDATA_LSTM_RECODER = 22
TESSDATA_VERSION = 23
TESSDATA_NUM_ENTRIES = 24

# TrainingFlags (lstmrecognizer.h:44-47)
TF_INT_MODE = 1
TF_COMPRESS_UNICHARSET = 64

# NetworkType serialization names (network.cpp:60-75, kTypeNames) — the
# on-disk encoding is the NAME, making layer-type ids reorderable.
NT_NAMES = [
    "Invalid", "Input", "Convolve", "Maxpool", "Parallel", "Replicated",
    "ParBidiLSTM", "DepParUDLSTM", "Par2dLSTM", "Series", "Reconfig",
    "RTLReversed", "TTBReversed", "XYTranspose", "LSTM", "SummLSTM",
    "Logistic", "LinLogistic", "LinTanh", "Tanh", "Relu", "Linear",
    "Softmax", "SoftmaxNoCTC", "LSTMSoftmax", "LSTMBinarySoftmax",
    "TensorFlow",
]
NT_ID = {n: i for i, n in enumerate(NT_NAMES)}

_K_INT8_FLAG = 1
_K_ADAM_FLAG = 4
_K_DOUBLE_FLAG = 128


# ---------------------------------------------------------------------------
# TFile-style little-endian reader/writer (serialis.h semantics)
# ---------------------------------------------------------------------------


class Writer:
    def __init__(self) -> None:
        self.buf = io.BytesIO()

    def raw(self, b: bytes) -> None:
        self.buf.write(b)

    def u8(self, v: int) -> None:
        self.buf.write(struct.pack("<B", v))

    def i8(self, v: int) -> None:
        self.buf.write(struct.pack("<b", v))

    def u32(self, v: int) -> None:
        self.buf.write(struct.pack("<I", v))

    def i32(self, v: int) -> None:
        self.buf.write(struct.pack("<i", v))

    def i64(self, v: int) -> None:
        self.buf.write(struct.pack("<q", v))

    def f32(self, v: float) -> None:
        self.buf.write(struct.pack("<f", v))

    def f64(self, v: float) -> None:
        self.buf.write(struct.pack("<d", v))

    def string(self, s: str) -> None:
        b = s.encode("utf-8")
        self.u32(len(b))
        self.raw(b)

    def getvalue(self) -> bytes:
        return self.buf.getvalue()


class Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def raw(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("tessdata: truncated stream")
        self.pos += n
        return b

    def u8(self) -> int:
        return struct.unpack("<B", self.raw(1))[0]

    def i8(self) -> int:
        return struct.unpack("<b", self.raw(1))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.raw(4))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.raw(8))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self.raw(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def string(self) -> str:
        return self.raw(self.u32()).decode("utf-8")

    def eof(self) -> bool:
        return self.pos >= len(self.data)


# ---------------------------------------------------------------------------
# Container (tessdatamanager.cpp:110-167 read, :188-230 write)
# ---------------------------------------------------------------------------


def write_container(entries: dict[int, bytes]) -> bytes:
    """Pack section payloads into the traineddata container layout."""
    num = TESSDATA_NUM_ENTRIES
    header = 4 + 8 * num
    offsets = [-1] * num
    body = b""
    off = header
    for i in range(num):
        payload = entries.get(i)
        # present-but-empty sections keep their offset entry — the
        # reference container distinguishes empty from absent
        if payload is not None:
            offsets[i] = off
            body += payload
            off += len(payload)
    w = Writer()
    w.u32(num)
    for o in offsets:
        w.i64(o)
    w.raw(body)
    return w.getvalue()


def read_container(data: bytes) -> dict[int, bytes]:
    """Unpack a traineddata container into {section_id: payload}."""
    r = Reader(data)
    num = r.u32()
    if num > 100:  # kMaxNumTessdataEntries sanity (big-endian would swap)
        raise ValueError("tessdata: implausible entry count (endianness?)")
    offsets = [r.i64() for _ in range(num)]
    out: dict[int, bytes] = {}
    size = len(data)
    for i in range(num):
        if offsets[i] < 0:
            continue
        end = size
        for j in range(i + 1, num):
            if offsets[j] >= 0:
                end = offsets[j]
                break
        out[i] = data[offsets[i] : end]
    return out


# ---------------------------------------------------------------------------
# Unicharset (text format, unicharset.cpp:718-756)
# ---------------------------------------------------------------------------


@dataclass
class Unicharset:
    """Minimal unicharset: id <-> UTF-8 plus the properties hex field.

    The reference stores per-char metrics (top/bottom/width stats) the
    LSTM path never reads; we persist the properties word and NULL-row
    convention faithfully and default the metrics."""

    chars: list[str] = field(default_factory=list)
    properties: list[int] = field(default_factory=list)

    @classmethod
    def from_charset(cls, charset: str) -> "Unicharset":
        u = cls()
        for ch in charset:
            props = 0
            if ch.isalpha():
                props |= 0x1  # ISALPHA
                if ch.islower():
                    props |= 0x2
                if ch.isupper():
                    props |= 0x4
            if ch.isdigit():
                props |= 0x8
            if not ch.isalnum() and not ch.isspace():
                props |= 0x10  # ISPUNCTUATION
            u.chars.append(ch)
            u.properties.append(props)
        return u

    # kCleanupMaps (unicharset.cpp:72-77): substitutions applied when
    # ingesting strings from the outside — TATWEEL deleted, fi/fl
    # ligatures expanded (the TatweelTest contract,
    # unittest/tatweel_test.cc:54-60)
    CLEANUP_MAPS = (("\u0640", ""), ("\ufb01", "fi"), ("\ufb02", "fl"))

    @classmethod
    def cleanup_string(cls, s: str) -> str:
        """UNICHARSET::CleanupString (unicharset.h:265)."""
        for a, b in cls.CLEANUP_MAPS:
            s = s.replace(a, b)
        return s

    @classmethod
    def from_texts(cls, texts) -> "Unicharset":
        """The unicharset_extractor training tool
        (src/training/unicharset_extractor.cpp:50-85): collect the
        distinct characters of training texts (whitespace folds to the
        single space row) and derive the property bits.  Deterministic:
        characters sort by codepoint, matching no particular reference
        order but stable across partitionings — the Spark-scale variant
        is queries.q_charset_extract."""
        seen: set[str] = set()
        for t in texts:
            for ch in cls.cleanup_string(t or ""):
                seen.add(" " if ch.isspace() else ch)
        return cls.from_charset("".join(sorted(seen)))

    def id_of(self, ch: str) -> int:
        return self.chars.index(ch)

    def __len__(self) -> int:
        return len(self.chars)

    def save(self) -> bytes:
        lines = [f"{len(self.chars)}\n"]
        for ch, props in zip(self.chars, self.properties):
            if ch == " ":
                # space serializes as the NULL row (save_to_string's
                # strcmp(id_to_unichar(id), " ") == 0 branch)
                lines.append(f"NULL {props:x} NULL 0\n")
            else:
                lines.append(
                    f"{ch} {props:x} 0,255,0,255,0,0,0,0,0,0 NULL 0 0 0 {ch}\n"
                )
        return "".join(lines).encode("utf-8")

    @classmethod
    def load(cls, data: bytes) -> "Unicharset":
        text = data.decode("utf-8")
        lines = text.splitlines()
        n = int(lines[0].strip())
        u = cls()
        for ln in lines[1 : 1 + n]:
            fields = ln.split(" ")
            ch = fields[0]
            if ch == "NULL":
                ch = " "
            u.chars.append(ch)
            u.properties.append(int(fields[1], 16) if len(fields) > 1 else 0)
        return u


# ---------------------------------------------------------------------------
# Recoder (UnicharCompress, unicharcompress.h:34-118 / .cpp)
# ---------------------------------------------------------------------------

K_MAX_CODE_LEN = 9  # unicharcompress.h kMaxCodeLen


@dataclass
class RecodedCharID:
    self_normalized: int
    codes: list[int]

    def write(self, w: Writer) -> None:
        w.i8(self.self_normalized)
        w.u32(len(self.codes))
        for c in self.codes:
            w.i32(c)

    @classmethod
    def read(cls, r: Reader) -> "RecodedCharID":
        sn = r.i8()
        length = r.u32()
        if length > K_MAX_CODE_LEN:
            raise ValueError(f"recoder: code length {length} > kMaxCodeLen")
        return cls(sn, [r.i32() for _ in range(length)])


class UnicharCompress:
    """Unichar -> short code-sequence recoder (RecodedCharID table).

    Carries the two behaviors the LSTM decode path needs:
    - pass-through (Latin, ``SetupPassThrough`` lstmrecognizer.cpp:205):
      every unichar maps to its own single code;
    - real compression (CJK/Indic): multi-code sequences decoded with a
      prefix-trie walk (the inverse of ``EncodeUnichar``).
    """

    def __init__(self, encoder: list[RecodedCharID] | None = None) -> None:
        self.encoder: list[RecodedCharID] = encoder or []
        self._decoder: dict[tuple[int, ...], int] = {}
        self._prefixes: set[tuple[int, ...]] = set()
        self._valid_first: set[int] = set()
        self.code_range = 0
        if encoder:
            self._setup_decoder()

    # -- construction -----------------------------------------------------
    @classmethod
    def pass_through(cls, n_unichars: int) -> "UnicharCompress":
        enc = [RecodedCharID(1, [u]) for u in range(n_unichars)]
        return cls(enc)

    def _setup_decoder(self) -> None:
        self._decoder.clear()
        self._prefixes.clear()
        self._valid_first = set()
        self.code_range = 0
        # final/next code maps (SetupDecoder's final_codes_/next_codes_,
        # unicharcompress.cpp:405-452) keyed by the pending code prefix.
        self._final_codes: dict[tuple[int, ...], list[int]] = {}
        self._next_codes: dict[tuple[int, ...], list[int]] = {}
        for uid, rc in enumerate(self.encoder):
            if not rc.codes:
                continue
            self._valid_first.add(rc.codes[0])
            key = tuple(rc.codes)
            # Last writer wins, as in SetupDecoder's decoder_[code] = c
            # (unicharcompress.cpp:402) — matters only for shared null
            # codes (Joined/Broken both carry the null).
            self._decoder[key] = uid
            final = self._final_codes.setdefault(key[:-1], [])
            if key[-1] not in final:
                final.append(key[-1])
            for plen in range(1, len(key)):
                self._prefixes.add(key[:plen])
                nxt = self._next_codes.setdefault(key[: plen - 1], [])
                if key[plen - 1] not in nxt:
                    nxt.append(key[plen - 1])
            self.code_range = max(self.code_range, max(rc.codes) + 1)

    def get_final_codes(self, prefix: tuple[int, ...]) -> list[int]:
        """GetFinalCodes (unicharcompress.h): codes that complete a
        unichar after ``prefix``."""
        return self._final_codes.get(tuple(prefix), ())

    def get_next_codes(self, prefix: tuple[int, ...]) -> list[int]:
        """GetNextCodes (unicharcompress.h): codes that extend
        ``prefix`` toward a longer unichar code sequence."""
        return self._next_codes.get(tuple(prefix), ())

    # -- codec ------------------------------------------------------------
    def encode_unichar(self, uid: int) -> list[int]:
        return list(self.encoder[uid].codes)

    def decode_unichar(self, codes: list[int]) -> int:
        """DecodeUnichar (unicharcompress.cpp:304-315)."""
        if not 0 < len(codes) <= K_MAX_CODE_LEN:
            return -1
        return self._decoder.get(tuple(codes), -1)

    def is_valid_first_code(self, code: int) -> bool:
        """IsValidFirstCode (unicharcompress.h is_valid_start_)."""
        return code in self._valid_first

    def decode_codes(self, codes: list[int]) -> list[int]:
        """Greedy longest-match decode of a flat code stream back to
        unichar ids (the RecodeBeamSearch walk's terminal mapping)."""
        out: list[int] = []
        i = 0
        n = len(codes)
        while i < n:
            match_len = 0
            match_uid = -1
            for ln in range(1, min(K_MAX_CODE_LEN, n - i) + 1):
                key = tuple(codes[i : i + ln])
                if key in self._decoder:
                    match_len, match_uid = ln, self._decoder[key]
                if key not in self._prefixes and key not in self._decoder:
                    break
            if match_uid < 0:  # undecodable code: skip one (defensive)
                i += 1
                continue
            out.append(match_uid)
            i += match_len
        return out

    # -- real compression (ComputeEncoding, unicharcompress.cpp:109-226)
    K_NULL_CHAR = "<nul>"  # unicharcompress.cpp:29
    K_RADICAL_RADIX = 29  # unicharcompress.cpp:31
    # Hangul Jamo counts (unicharcompress.h:162-164)
    K_L_COUNT, K_V_COUNT, K_T_COUNT = 19, 21, 28
    K_FIRST_HANGUL = 0xAC00

    @staticmethod
    def decompose_hangul(unicode: int) -> tuple[int, int, int] | None:
        """unicharcompress.cpp:367-380: 0-based (leading, vowel,
        trailing) indices, or None outside the syllable range."""
        kL, kV, kT = UnicharCompress.K_L_COUNT, UnicharCompress.K_V_COUNT, UnicharCompress.K_T_COUNT
        if unicode < UnicharCompress.K_FIRST_HANGUL:
            return None
        offset = unicode - UnicharCompress.K_FIRST_HANGUL
        if offset >= kL * kV * kT:
            return None
        n = kV * kT
        return offset // n, (offset % n) // kT, offset % kT

    @staticmethod
    def decode_radical_table(radical_data: str) -> dict[int, list[int]]:
        """DecodeRadicalTable (unicharcompress.cpp:50-88): lines of
        ``unicode radical radical ...`` decimal ints, '#' comments."""
        radical_map: dict[int, list[int]] = {}
        for line in radical_data.splitlines():
            if not line or line[0] == "#":
                continue
            entries = line.split(" ")
            if len(entries) < 2:
                raise ValueError(f"bad radical line: {line!r}")
            radical_map[int(entries[0])] = [int(e) for e in entries[1:]]
        return radical_map

    @classmethod
    def compute_encoding(
        cls,
        unicharset,
        null_id: int,
        radical_map: dict[int, list[int]] | None = None,
    ) -> "UnicharCompress":
        """ComputeEncoding (unicharcompress.cpp:109-226) over a
        RefUnicharset: Han via radical codes, Hangul via Jamo
        decomposition, everything else via a direct set of the
        constituent unicodes; then Han renumbering and
        defragmentation. Raises ValueError where the reference
        returns false."""
        from .refcharset import RefUnicharset, cleanup_string, utf8_to_utf32, utf32_to_utf8

        if radical_map is None:
            radical_map = {}
        direct_set = RefUnicharset(with_specials=False)
        # Always keep space as 0; null char next (old-style sticky so
        # every inserted unicode gets its own row).
        direct_set.unichar_insert(" ", old_style=True)
        if null_id >= 0:
            direct_set.unichar_insert(cls.K_NULL_CHAR)
        radical_counts: dict[int, int] = {}
        size = len(unicharset)
        hangul_offset = size
        k_total_jamos = cls.K_L_COUNT + cls.K_V_COUNT + cls.K_T_COUNT
        han_offset = hangul_offset + k_total_jamos
        has_specials = getattr(unicharset, "has_special_codes", lambda: False)()
        encoder: list[RecodedCharID] = []
        for u in range(size + 1):
            if u == size and u != null_id:
                break
            codes: list[int] = []
            unicodes: list[int] = []
            if u < size:
                cleaned = cleanup_string(unicharset.id_to_unichar(u))
                unicodes = utf8_to_utf32(cleaned)
            if u < size and len(unicodes) == 1:
                unicode = unicodes[0]
                radicals = radical_map.get(unicode)
                if radicals is not None:
                    # Han: radical codes directly, plus a disambiguator
                    # when the radical sequence repeats.
                    codes = [han_offset + r for r in radicals]
                    pre_hash = 0
                    for r in radicals:
                        pre_hash = pre_hash * cls.K_RADICAL_RADIX + r
                    num_samples = radical_counts.get(pre_hash, 0)
                    radical_counts[pre_hash] = num_samples + 1
                    if num_samples > 0:
                        codes.append(han_offset + num_samples + cls.K_RADICAL_RADIX)
                else:
                    hangul = cls.decompose_hangul(unicode)
                    if hangul is not None:
                        leading, vowel, trailing = hangul
                        codes = [
                            leading + hangul_offset,
                            vowel + cls.K_L_COUNT + hangul_offset,
                            trailing + cls.K_L_COUNT + cls.K_V_COUNT + hangul_offset,
                        ]
            if not codes:
                if u == 0:  # UNICHAR_SPACE
                    codes = [0]
                elif u == null_id or (has_specials and u < 3):
                    codes = [direct_set.unichar_to_id(cls.K_NULL_CHAR)]
                else:
                    for uni in unicodes:
                        if len(codes) >= K_MAX_CODE_LEN:
                            raise ValueError(
                                f"unichar {u} too long to encode"
                            )
                        utf8 = utf32_to_utf8([uni])
                        if not direct_set.contains_unichar(utf8):
                            direct_set.unichar_insert(utf8)
                        codes.append(direct_set.unichar_to_id(utf8))
                        if len(direct_set) > size + (0 if has_specials else 1):
                            raise ValueError("code space expanded from original unicharset")
            encoder.append(RecodedCharID(1, codes))
        # Renumber Han: separate radical/stroke/count code positions
        # (unicharcompress.cpp:207-224).
        code_offset = 0
        for i in range(K_MAX_CODE_LEN):
            max_offset = 0
            for u in range(size):
                code = encoder[u]
                if len(code.codes) <= i:
                    continue
                max_offset = max(max_offset, code.codes[i] - han_offset)
                code.codes[i] += code_offset
            if max_offset == 0:
                break
            code_offset += max_offset + 1
        out = cls(encoder)
        out.defragment_code_values(1 if null_id >= 0 else -1)
        return out

    def defragment_code_values(self, encoded_null: int) -> None:
        """DefragmentCodeValues (unicharcompress.cpp:256-290): drop
        unused code values, move the null code to the end."""
        self._setup_decoder()  # refresh code_range
        offsets = [0] * self.code_range
        for rc in self.encoder:
            for c in rc.codes:
                offsets[c] = 1
        offset = 0
        for i in range(len(offsets)):
            if offsets[i] == 0 or i == encoded_null:
                offset -= 1
            else:
                offsets[i] = offset
        if encoded_null >= 0:
            offsets[encoded_null] = len(offsets) + offsets[-1] - encoded_null
        for rc in self.encoder:
            rc.codes = [c + offsets[c] for c in rc.codes]
        self._setup_decoder()

    def get_encoding_as_string(self, unicharset) -> str:
        """GetEncodingAsString (unicharcompress.cpp:339-361)."""
        has_specials = getattr(unicharset, "has_special_codes", lambda: False)()
        lines = []
        for c, rc in enumerate(self.encoder):
            if 0 < c < 3 and rc.codes == self.encoder[c - 1].codes:
                continue  # duplicate special entry
            code_str = ",".join(str(v) for v in rc.codes)
            if c >= len(unicharset) or (0 < c < 3 and has_specials):
                rep = self.K_NULL_CHAR
            else:
                rep = unicharset.id_to_unichar(c)
            lines.append(f"{code_str}\t{rep}\n")
        return "".join(lines)

    # -- serialization ----------------------------------------------------
    def write(self, w: Writer) -> None:
        w.u32(len(self.encoder))
        for rc in self.encoder:
            rc.write(w)

    @classmethod
    def read(cls, r: Reader) -> "UnicharCompress":
        n = r.u32()
        if n > 50_000_000:
            raise ValueError("recoder: implausible encoder size")
        return cls([RecodedCharID.read(r) for _ in range(n)])


# ---------------------------------------------------------------------------
# WeightMatrix (weightmatrix.cpp:238-330)
# ---------------------------------------------------------------------------


def write_weight_matrix(
    w: Writer, mat: np.ndarray, int_mode: bool = False
) -> None:
    """WeightMatrix bytes: float mode = GENERIC_2D_ARRAY<double>;
    int8 mode (the tessdata_fast format) = int8 array + one double
    scale per row.  The FILE scale is max_abs/127 (Serialize multiplies
    the in-memory scale back by INT8_MAX, weightmatrix.cpp:211-216),
    and quantization is ConvertToInt's per-row round
    (weightmatrix.cpp:110-140) — so an int8-written matrix reads back
    as exactly vgsl._quantize_rows of the float one."""
    if int_mode:
        w.u8(_K_INT8_FLAG | _K_DOUBLE_FLAG)
        from .vgsl import _int_cast_rounded

        max_abs = np.abs(mat).max(axis=1)
        scales = max_abs / 127.0
        safe = np.where(scales == 0.0, 1.0, scales)
        wi = _int_cast_rounded(
            mat / safe[:, None]).clip(-128, 127).astype(np.int8)
        w.u32(mat.shape[0])
        w.u32(mat.shape[1])
        w.i8(0)  # empty_ sentinel of GENERIC_2D_ARRAY<int8>
        w.raw(wi.tobytes())
        w.u32(mat.shape[0])
        w.raw(np.ascontiguousarray(scales, dtype="<f8").tobytes())
        return
    w.u8(_K_DOUBLE_FLAG)
    w.u32(mat.shape[0])
    w.u32(mat.shape[1])
    w.f64(0.0)  # empty_ sentinel of GENERIC_2D_ARRAY
    w.raw(np.ascontiguousarray(mat, dtype="<f8").tobytes())


def read_weight_matrix(r: Reader) -> np.ndarray:
    """Reads float OR int8 mode (int8: wi_ array + per-row double scales,
    de-quantized to float32 exactly as MatrixDotVector would apply them)."""
    mode = r.u8()
    int_mode = bool(mode & _K_INT8_FLAG)
    use_adam = bool(mode & _K_ADAM_FLAG)
    if not (mode & _K_DOUBLE_FLAG):
        raise ValueError("tessdata: pre-double weight format unsupported")
    if int_mode:
        d1, d2 = r.u32(), r.u32()
        _empty = r.i8()
        wi = np.frombuffer(r.raw(d1 * d2), dtype=np.int8).reshape(d1, d2)
        n_scales = r.u32()
        # the FILE scale is already max_abs/127 (Serialize multiplies
        # the in-memory scale/INT8_MAX convention back out,
        # weightmatrix.cpp:211-216): dequantized weight = wi * scale.
        # (The in-memory /127 belongs with the reference's int8 INPUT
        # scaling, which float inference does not apply.)
        scales = np.frombuffer(r.raw(8 * n_scales), dtype="<f8")
        mat = wi.astype(np.float64) * scales[:d1, None]
        return mat.astype(np.float32)
    d1, d2 = r.u32(), r.u32()
    _empty = r.f64()
    mat = np.frombuffer(r.raw(8 * d1 * d2), dtype="<f8").reshape(d1, d2)
    if use_adam:
        # training checkpoints carry updates_ (+ dw_sq_sum_) only when
        # serialized with training=true; inference files do not.
        pass
    return mat.astype(np.float32)


# ---------------------------------------------------------------------------
# Network tree <-> VGSLNetwork
# ---------------------------------------------------------------------------


def _write_network_header(
    w: Writer, type_name: str, ni: int, no: int, name: str, num_weights: int = 0
) -> None:
    """Network::Serialize common prefix (network.cpp:155-189)."""
    w.i8(0)  # NT_NONE marker -> type follows as a name string
    w.string(type_name)
    w.i8(0)  # training_ = TS_DISABLED
    w.i8(0)  # needs_to_backprop_
    w.i32(0)  # network_flags_
    w.i32(ni)
    w.i32(no)
    w.i32(num_weights)
    w.string(name)


def _read_network_header(r: Reader) -> dict:
    marker = r.i8()
    if marker == 0:
        type_name = r.string()
        if type_name not in NT_ID:
            raise ValueError(f"tessdata: unknown layer type {type_name!r}")
    else:
        # old files store the raw enum id byte
        if not 0 <= marker < len(NT_NAMES):
            raise ValueError(f"tessdata: bad layer type id {marker}")
        type_name = NT_NAMES[marker]
    hdr = {
        "type": type_name,
        "training": r.i8(),
        "backprop": r.i8(),
        "flags": r.i32(),
        "ni": r.i32(),
        "no": r.i32(),
        "num_weights": r.i32(),
        "name": r.string(),
    }
    return hdr


def _fc_matrix(wx: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[no, ni] weights + [no] bias -> reference [no, ni+1] (bias last)."""
    return np.concatenate([wx, b[:, None]], axis=1)


def _split_fc(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return mat[:, :-1], mat[:, -1]


# our gate slice order (vgsl._lstm_dir): i, f, o, u in one stacked matrix;
# reference serializes per-gate WeightMatrices in WT order CI(u), GI(i),
# GF1(f), GO(o) (lstm.h:32-40), each [ns, ni+ns+1]
_GATE_ORDER = ("u", "i", "f", "o")  # CI, GI, GF1, GO
_GATE_SLICE = {"i": 0, "f": 1, "o": 2, "u": 3}


def _write_lstm_weights(w: Writer, wts: dict, prefix: str = "",
                        int_mode: bool = False) -> None:
    wx, wh, b = wts[prefix + "wx"], wts[prefix + "wh"], wts[prefix + "b"]
    units = wh.shape[1]
    for g in _GATE_ORDER:
        s = _GATE_SLICE[g]
        gw = np.concatenate(
            [
                wx[s * units : (s + 1) * units],
                wh[s * units : (s + 1) * units],
                b[s * units : (s + 1) * units, None],
            ],
            axis=1,
        )
        write_weight_matrix(w, gw, int_mode=int_mode)


# 2-D LSTM gate layout: internal stacked blocks are CI,GI,GF1,GFS,GO
# (vgsl._lstm_2d_dir slicing); the file order is WT enum order with GFS
# last (lstm.cpp Serialize: CI, GI, GF1, GO, then GFS only when 2D).
_GATE2D_FILE_TO_BLOCK = (0, 1, 2, 4, 3)


def _write_lstm2d_weights(w: Writer, wts: dict, prefix: str,
                          int_mode: bool = False) -> None:
    wx = wts[prefix + "wx"]
    whx = wts[prefix + "whx"]
    why = wts[prefix + "why"]
    b = wts[prefix + "b"]
    units = whx.shape[1]
    for blk in _GATE2D_FILE_TO_BLOCK:
        sl = slice(blk * units, (blk + 1) * units)
        gw = np.concatenate([wx[sl], whx[sl], why[sl], b[sl, None]], axis=1)
        write_weight_matrix(w, gw, int_mode=int_mode)


def _read_lstm2d_weights(r: Reader, ni: int, units: int, prefix: str) -> dict:
    wx = np.zeros((5 * units, ni), dtype=np.float32)
    whx = np.zeros((5 * units, units), dtype=np.float32)
    why = np.zeros((5 * units, units), dtype=np.float32)
    b = np.zeros(5 * units, dtype=np.float32)
    for blk in _GATE2D_FILE_TO_BLOCK:
        gw = read_weight_matrix(r)
        if gw.shape != (units, ni + 2 * units + 1):
            raise ValueError(
                f"tessdata: 2D LSTM gate shape {gw.shape} != "
                f"{(units, ni + 2 * units + 1)}")
        sl = slice(blk * units, (blk + 1) * units)
        wx[sl] = gw[:, :ni]
        whx[sl] = gw[:, ni:ni + units]
        why[sl] = gw[:, ni + units:-1]
        b[sl] = gw[:, -1]
    return {prefix + "wx": wx, prefix + "whx": whx,
            prefix + "why": why, prefix + "b": b}


def _read_lstm_weights(r: Reader, ni: int, units: int) -> dict:
    wx = np.zeros((4 * units, ni), dtype=np.float32)
    wh = np.zeros((4 * units, units), dtype=np.float32)
    b = np.zeros(4 * units, dtype=np.float32)
    for g in _GATE_ORDER:
        gw = read_weight_matrix(r)
        if gw.shape != (units, ni + units + 1):
            raise ValueError(
                f"tessdata: LSTM gate shape {gw.shape} != {(units, ni + units + 1)}"
            )
        s = _GATE_SLICE[g]
        wx[s * units : (s + 1) * units] = gw[:, :ni]
        wh[s * units : (s + 1) * units] = gw[:, ni : ni + units]
        b[s * units : (s + 1) * units] = gw[:, -1]
    return {"wx": wx, "wh": wh, "b": b}


def _conv_ref_perm(ky: int, kx: int, d: int) -> np.ndarray:
    """Permutation mapping our im2col feature order ((y*kx+x)*d+c,
    vgsl._conv) to the reference Convolve gather order ((x*ky+y)*ni+c,
    convolve.cpp Forward)."""
    idx = np.arange(ky * kx * d).reshape(ky, kx, d)
    return idx.transpose(1, 0, 2).ravel()  # -> x-major


def serialize_network(net, int_mode: bool = False) -> bytes:
    """VGSLNetwork -> reference network-tree bytes (a Series stack).

    Layer mapping (networkbuilder.h:52-123 semantics):
      conv       -> Convolve (window gather) + Tanh/Relu FullyConnected
      maxpool    -> Maxpool
      lstm_x     -> LSTM | RTLReversed[LSTM] | ParBidiLSTM[LSTM, RTLReversed[LSTM]]
      lstm_y_summary -> SummLSTM
      output     -> Softmax FullyConnected
    """
    w = Writer()
    body = Writer()
    _write_network_header(body, "Input", net.depth, net.depth, "Input")
    # StaticShape (static_shape.h:91-95): batch,h,w,depth,loss_type
    body.i32(net.batch)
    body.i32(net.height)
    body.i32(net.width)
    body.i32(net.depth)
    body.i32(0)
    depth, _height, n_records = _emit_stack(
        body, net.layers, net.depth, net.height, int_mode
    )
    _write_network_header(w, "Series", net.depth, depth, "Series")
    w.u32(n_records + 1)
    w.raw(body.getvalue())
    return w.getvalue()


def _emit_stack(body, layers, depth, height, int_mode):
    """Emit one stack of layers as sibling records of a Series; returns
    (out_depth, out_height, record_count).  Recurses for parallel/
    reversed groups (Parallel/Replicated/RTLReversed/TTBReversed
    plumbing nodes, parallel.cpp / reversed.cpp)."""
    n_layers = 0
    for layer in layers:
        if layer.kind == "conv":
            ky, kx = layer.params["ky"], layer.params["kx"]
            if ky % 2 == 0 or kx % 2 == 0:
                raise ValueError("reference Convolve kernels are odd-sized")
            nf = layer.params["filters"]
            ni = depth
            gathered = ky * kx * ni
            _write_network_header(body, "Convolve", ni, gathered, "Convolve")
            body.i32(kx // 2)  # half_x_
            body.i32(ky // 2)  # half_y_
            n_layers += 1
            act = "Tanh" if layer.params["act"] == "tanh" else "Relu"
            _write_network_header(body, act, gathered, nf, act)
            perm = _conv_ref_perm(ky, kx, ni)
            wmat = layer.weights["w"][:, perm]
            write_weight_matrix(
                body, _fc_matrix(wmat, layer.weights["b"]),
                int_mode=int_mode)
            n_layers += 1
            depth = nf
        elif layer.kind == "maxpool":
            ky, kx = layer.params["ky"], layer.params["kx"]
            _write_network_header(body, "Maxpool", depth, depth, "Maxpool")
            body.i32(kx)  # x_scale_ (Reconfig::Serialize)
            body.i32(ky)  # y_scale_
            n_layers += 1
            height = max(1, height // ky)
        elif layer.kind == "reconfig":
            ky, kx = layer.params["ky"], layer.params["kx"]
            _write_network_header(
                body, "Reconfig", depth, depth * ky * kx, "Reconfig")
            body.i32(kx)  # x_scale_ (reconfig.cpp Serialize order)
            body.i32(ky)  # y_scale_
            n_layers += 1
            depth *= ky * kx
            height = max(1, height // ky)
        elif layer.kind == "lstm_2d_quad":
            # BuildLSTMXYQuad tree (networkbuilder.cpp:387-410):
            # Par2dLSTM { LSTM, XRev{LSTM}, XRev{YRev{LSTM}}, YRev{LSTM} }
            units = layer.params["units"]
            ni = depth
            na = ni + 2 * units
            _write_network_header(
                body, "Par2dLSTM", ni, 4 * units, "2DLSTMQuad")
            body.u32(4)

            def emit_2d(prefix: str) -> None:
                _write_network_header(body, "LSTM", ni, units, "LSTM")
                body.i32(na)
                _write_lstm2d_weights(body, layer.weights, prefix,
                                      int_mode=int_mode)

            emit_2d("d0_")
            _write_network_header(
                body, "RTLReversed", ni, units, "RTLReversed")
            body.u32(1)
            emit_2d("d1_")
            _write_network_header(
                body, "RTLReversed", ni, units, "RTLReversed")
            body.u32(1)
            _write_network_header(
                body, "TTBReversed", ni, units, "TTBReversed")
            body.u32(1)
            emit_2d("d2_")
            _write_network_header(
                body, "TTBReversed", ni, units, "TTBReversed")
            body.u32(1)
            emit_2d("d3_")
            n_layers += 1
            depth = 4 * units
        elif layer.kind in ("lstm_x", "lstm_y_summary"):
            units = layer.params["units"]
            summ = layer.kind == "lstm_y_summary"
            # x-LSTMs consume the height-collapsed depth; the
            # y-summarizing LSTM steps over height, so its input is the
            # raw per-cell depth (lstm.cpp: ni_ = input depth).
            ni = depth if summ else height * depth
            na = ni + units
            tname = "SummLSTM" if summ else "LSTM"

            def emit_lstm(prefix: str) -> None:
                _write_network_header(body, tname, ni, units, tname)
                body.i32(na)  # na_
                _write_lstm_weights(body, layer.weights, prefix,
                                    int_mode=int_mode)

            if layer.params.get("bidi"):
                # ParBidiLSTM { LSTM, RTLReversed { LSTM } }
                _write_network_header(
                    body, "ParBidiLSTM", ni, 2 * units, "ParBidiLSTM"
                )
                body.u32(2)
                emit_lstm("")
                _write_network_header(body, "RTLReversed", ni, units, "RTLReversed")
                body.u32(1)
                emit_lstm("r_")
                depth = 2 * units
            elif layer.params.get("reverse") and not summ:
                _write_network_header(body, "RTLReversed", ni, units, "RTLReversed")
                body.u32(1)
                emit_lstm("")
                depth = units
            else:
                emit_lstm("")
                depth = units
            n_layers += 1
            height = 1
        elif layer.kind == "fc":
            # F<c><n> (BuildFullyConnected): one weight matrix under the
            # nonlinearity's own network type name.
            n_out = layer.params["n_out"]
            ni = height * depth
            tname = {"s": "Logistic", "t": "Tanh",
                     "r": "Relu", "l": "Linear"}[layer.params["act"]]
            _write_network_header(body, tname, ni, n_out, tname)
            write_weight_matrix(
                body, _fc_matrix(layer.weights["w"], layer.weights["b"]),
                int_mode=int_mode)
            n_layers += 1
            depth = n_out
            height = 1
        elif layer.kind == "output":
            classes = layer.params["classes"]
            ni = height * depth
            _write_network_header(body, "Softmax", ni, classes, "Output")
            write_weight_matrix(
                body, _fc_matrix(layer.weights["w"], layer.weights["b"]),
                int_mode=int_mode,
            )
            n_layers += 1
            depth = classes
        elif layer.kind in ("parallel", "reversed"):
            # Parallel / Replicated / Reversed plumbing (kTypeNames,
            # network.cpp): header + u32 stack size + children; a branch
            # spanning several records nests in its own Series, exactly
            # as a '[...]' group parses in the reference.
            if layer.kind == "parallel":
                tname = ("Replicated" if layer.params["replicated"]
                         else "Parallel")
            else:
                tname = ("RTLReversed" if layer.params["axis"] == "x"
                         else "TTBReversed")
            out_d = layer.params["out_depth"]
            _write_network_header(body, tname, depth, out_d, tname)
            branches = layer.params["branches"]
            body.u32(len(branches))
            h_out = height
            for br in branches:
                sub = Writer()
                d2, h_out, nrec = _emit_stack(sub, br, depth, height,
                                              int_mode)
                if nrec == 1:
                    body.raw(sub.getvalue())
                else:
                    _write_network_header(body, "Series", depth, d2,
                                          "Series")
                    body.u32(nrec)
                    body.raw(sub.getvalue())
            n_layers += 1
            depth = out_d
            height = h_out
        else:  # pragma: no cover
            raise ValueError(f"unserializable layer {layer.kind}")
    return depth, height, n_layers


def deserialize_network(r: Reader, spec: str):
    """Reference network-tree bytes + VGSL spec -> VGSLNetwork with the
    serialized weights installed (LSTMRecognizer stores the spec in
    network_str_, so the architecture never has to be inferred)."""
    from .vgsl import VGSLNetwork

    net = VGSLNetwork(spec)
    hdr = _read_network_header(r)
    if hdr["type"] != "Series":
        raise ValueError(f"tessdata: expected Series root, got {hdr['type']}")
    n_children = r.u32()
    _read_stack(r, net.layers, n_children)
    return net


def _read_stack(r: Reader, layers, n_children: int) -> int:
    """Read n_children sibling records into the given layer stack."""
    li = 0
    read = 0
    while read < n_children:
        child = _read_network_header(r)
        li, extra = _read_child(r, child["type"], layers, li)
        read += 1 + extra
    return li


def _read_branch(r: Reader, branch) -> None:
    """Read one plumbing child (a bare record or a nested Series) into a
    parallel/reversed branch's layer list."""
    sub_hdr = _read_network_header(r)
    if sub_hdr["type"] == "Series":
        cnt = r.u32()
        _read_stack(r, branch, cnt)
    else:
        _read_child(r, sub_hdr["type"], branch, 0)


def _read_child(r: Reader, t: str, layers, li: int) -> tuple[int, int]:
    """Dispatch one serialized record against layers[li]; returns
    (next_li, extra_sibling_records_consumed)."""
    if t == "Input":
        for _ in range(5):
            r.i32()  # StaticShape
        return li, 0
    if t == "Convolve":
        half_x, half_y = r.i32(), r.i32()
        fc = _read_network_header(r)
        if fc["type"] not in ("Tanh", "Relu"):
            raise ValueError(f"tessdata: conv FC has type {fc['type']}")
        mat = read_weight_matrix(r)
        wmat, b = _split_fc(mat)
        layer = layers[li]
        assert layer.kind == "conv", (li, layer.kind)
        ky, kx = layer.params["ky"], layer.params["kx"]
        assert (kx // 2, ky // 2) == (half_x, half_y)
        d = wmat.shape[1] // (ky * kx)
        perm = _conv_ref_perm(ky, kx, d)
        inv = np.argsort(perm)
        layer.weights["w"] = wmat[:, inv].astype(np.float32)
        layer.weights["b"] = b.astype(np.float32)
        return li + 1, 1  # consumed the activation sibling too
    if t == "Maxpool":
        r.i32(), r.i32()
        assert layers[li].kind == "maxpool"
        return li + 1, 0
    if t == "Reconfig":
        r.i32(), r.i32()
        assert layers[li].kind == "reconfig"
        return li + 1, 0
    if t == "Par2dLSTM":
        assert r.u32() == 4
        layer = layers[li]
        assert layer.kind == "lstm_2d_quad"
        units = layer.params["units"]
        # fixed tree: LSTM, XRev{LSTM}, XRev{YRev{LSTM}}, YRev{LSTM}
        for d, wrappers in enumerate(
                ([], ["RTLReversed"], ["RTLReversed", "TTBReversed"],
                 ["TTBReversed"])):
            for expect in wrappers:
                sub = _read_network_header(r)
                assert sub["type"] == expect, sub["type"]
                assert r.u32() == 1
            sub = _read_network_header(r)
            assert sub["type"] == "LSTM", sub["type"]
            na = r.i32()
            layer.weights.update(
                _read_lstm2d_weights(r, na - 2 * units, units, f"d{d}_"))
        return li + 1, 0
    if t in ("Parallel", "Replicated"):
        # generic Parallel / Replicated plumbing (parallel.cpp)
        n_br = r.u32()
        layer = layers[li]
        assert layer.kind == "parallel", layer.kind
        branches = layer.params["branches"]
        assert n_br == len(branches), (n_br, len(branches))
        for br in branches:
            _read_branch(r, br)
        return li + 1, 0
    if (t in ("RTLReversed", "TTBReversed")
            and layers[li].kind == "reversed"):
        # generic Rx/Ry wrapper (reversed.cpp) — distinguished from the
        # reversed-LSTM shorthand by the spec-driven layer kind
        assert r.u32() == 1
        _read_branch(r, layers[li].params["branches"][0])
        return li + 1, 0
    if t in ("LSTM", "SummLSTM"):
        na = r.i32()
        layer = layers[li]
        units = layer.params["units"]
        ni = na - units
        layer.weights.update(_read_lstm_weights(r, ni, units))
        return li + 1, 0
    if t == "RTLReversed":
        n_sub = r.u32()
        assert n_sub == 1
        sub = _read_network_header(r)
        na = r.i32()
        layer = layers[li]
        units = layer.params["units"]
        layer.weights.update(_read_lstm_weights(r, na - units, units))
        return li + 1, 0
    if t == "ParBidiLSTM":
        n_sub = r.u32()
        assert n_sub == 2
        layer = layers[li]
        units = layer.params["units"]
        _fwd_hdr = _read_network_header(r)
        na = r.i32()
        layer.weights.update(_read_lstm_weights(r, na - units, units))
        rev_hdr = _read_network_header(r)
        assert rev_hdr["type"] == "RTLReversed"
        assert r.u32() == 1
        _sub = _read_network_header(r)
        na = r.i32()
        rw = _read_lstm_weights(r, na - units, units)
        layer.weights.update({f"r_{k}": v for k, v in rw.items()})
        return li + 1, 0
    if t == "Softmax":
        mat = read_weight_matrix(r)
        wmat, b = _split_fc(mat)
        layer = layers[li]
        assert layer.kind == "output"
        layer.weights["w"] = wmat.astype(np.float32)
        layer.weights["b"] = b.astype(np.float32)
        return li + 1, 0
    if t in ("Logistic", "Tanh", "Relu", "Linear"):
        mat = read_weight_matrix(r)
        wmat, b = _split_fc(mat)
        layer = layers[li]
        assert layer.kind == "fc", layer.kind
        layer.weights["w"] = wmat.astype(np.float32)
        layer.weights["b"] = b.astype(np.float32)
        return li + 1, 0
    raise ValueError(f"tessdata: unsupported layer type {t}")


# ---------------------------------------------------------------------------
# LSTM section (LSTMRecognizer::Serialize, lstmrecognizer.cpp:93-130)
# ---------------------------------------------------------------------------


@dataclass
class LstmModel:
    """A loaded LSTM recognizer: network + charset + recoder + scalars."""

    net: object  # VGSLNetwork
    unicharset: Unicharset
    recoder: UnicharCompress
    null_char: int
    spec: str
    adam_beta: float = 0.999
    learning_rate: float = 0.001
    momentum: float = 0.5
    # dictionaries shipped in the container as squished-dawg sections
    # (Dict::Load TESSDATA_LSTM_* dawgs, src/dict/dict.cpp:284-320)
    word_dawg: object = None  # TESSDATA_LSTM_SYSTEM_DAWG
    number_dawg: object = None  # TESSDATA_LSTM_NUMBER_DAWG
    punc_dawg: object = None  # TESSDATA_LSTM_PUNC_DAWG

    @property
    def charset(self) -> str:
        return "".join(self.unicharset.chars)


def write_lstm_section(model: LstmModel, int_mode: bool = False) -> bytes:
    w = Writer()
    w.raw(serialize_network(model.net, int_mode=int_mode))
    # charsets embedded (no separate TESSDATA_LSTM_UNICHARSET/RECODER
    # components -> include_charsets = true on both sides)
    w.raw(model.unicharset.save())
    w.string(model.spec)  # network_str_
    # training_flags_: recoding on, plus TF_INT_MODE for fast models
    w.i32(TF_COMPRESS_UNICHARSET | (TF_INT_MODE if int_mode else 0))
    w.i32(0)  # training_iteration_
    w.i32(0)  # sample_iteration_
    w.i32(model.null_char)
    w.f32(model.adam_beta)
    w.f32(model.learning_rate)
    w.f32(model.momentum)
    model.recoder.write(w)
    return w.getvalue()


def read_lstm_section(data: bytes) -> LstmModel:
    r = Reader(data)
    # network tree comes first but needs the spec (read later) to rebuild;
    # remember the span and parse after the tail fields.
    net_start = r.pos
    _skip_network(r)
    net_end = r.pos
    unicharset = _read_embedded_unicharset(r)
    spec = r.string()
    training_flags = r.i32()
    r.i32()  # training_iteration_
    r.i32()  # sample_iteration_
    null_char = r.i32()
    adam_beta = r.f32()
    lr = r.f32()
    momentum = r.f32()
    if training_flags & TF_COMPRESS_UNICHARSET:
        recoder = UnicharCompress.read(r)
    else:
        recoder = UnicharCompress.pass_through(len(unicharset))
    net = deserialize_network(Reader(data[net_start:net_end]), spec)
    return LstmModel(
        net=net,
        unicharset=unicharset,
        recoder=recoder,
        null_char=null_char,
        spec=spec,
        adam_beta=adam_beta,
        learning_rate=lr,
        momentum=momentum,
    )


def _skip_network(r: Reader) -> None:
    """Advance the reader past one serialized network (recursively)."""
    hdr = _read_network_header(r)
    t = hdr["type"]
    if t == "Input":
        for _ in range(5):
            r.i32()
    elif t == "Convolve":
        r.i32(), r.i32()
    elif t in ("Maxpool", "Reconfig"):
        r.i32(), r.i32()
    elif t in ("LSTM", "SummLSTM", "LSTMSoftmax", "LSTMBinarySoftmax"):
        na = r.i32()
        # 2-D LSTMs carry a fifth (GFS) gate matrix: is_2d iff
        # na - nf == ni + 2*ns (lstm.cpp DeSerialize); nf = 0 for NT_LSTM
        # and ns == no from the header
        is_2d = na == hdr["ni"] + 2 * hdr["no"] and t in ("LSTM", "SummLSTM")
        for _ in range(5 if is_2d else 4):
            _skip_weight_matrix(r)
        if t in ("LSTMSoftmax", "LSTMBinarySoftmax"):
            _skip_network(r)
    elif t in (
        "Series", "Parallel", "Replicated", "ParBidiLSTM", "DepParUDLSTM",
        "Par2dLSTM", "RTLReversed", "TTBReversed", "XYTranspose",
    ):
        n = r.u32()
        for _ in range(n):
            _skip_network(r)
    elif t in (
        "Tanh", "Relu", "Softmax", "SoftmaxNoCTC", "Logistic",
        "LinLogistic", "LinTanh", "Linear",
    ):
        _skip_weight_matrix(r)
    else:
        raise ValueError(f"tessdata: cannot skip layer type {t}")


def _skip_weight_matrix(r: Reader) -> None:
    mode = r.u8()
    int_mode = bool(mode & _K_INT8_FLAG)
    if not (mode & _K_DOUBLE_FLAG):
        raise ValueError("tessdata: pre-double weight format unsupported")
    d1, d2 = r.u32(), r.u32()
    if int_mode:
        r.i8()
        r.raw(d1 * d2)
        n = r.u32()
        r.raw(8 * n)
    else:
        r.f64()
        r.raw(8 * d1 * d2)


def _read_embedded_unicharset(r: Reader) -> Unicharset:
    """The unicharset rides embedded as raw text lines (save_to_file on a
    TFile writes the text with NO length prefix); parse exactly
    1 + size lines off the stream."""
    # first line: size
    line_end = r.data.index(b"\n", r.pos)
    n = int(r.data[r.pos : line_end].strip())
    pos = line_end + 1
    for _ in range(n):
        pos = r.data.index(b"\n", pos) + 1
    text = r.data[r.pos : pos]
    r.pos = pos
    return Unicharset.load(text)


# ---------------------------------------------------------------------------
# Top level traineddata save/load
# ---------------------------------------------------------------------------


def save_traineddata(model: LstmModel, version: str = "5.5.3-spark",
                     int_mode: bool = False) -> bytes:
    from .dawg import write_squished_dawg

    entries = {
        TESSDATA_LSTM: write_lstm_section(model, int_mode=int_mode),
        TESSDATA_VERSION: version.encode("utf-8"),
    }
    # dictionary sections ride as squished dawgs sized to the LSTM
    # unicharset (combine_tessdata layout, tessdatamanager.cpp:110-160)
    for sec, dawg in (
        (TESSDATA_LSTM_SYSTEM_DAWG, model.word_dawg),
        (TESSDATA_LSTM_NUMBER_DAWG, model.number_dawg),
        (TESSDATA_LSTM_PUNC_DAWG, model.punc_dawg),
    ):
        if dawg is not None and getattr(dawg, "n_edges", 0) > 0:
            # empty dictionaries are omitted, not serialized: the
            # squished format cannot represent zero edges (dawg.cpp:370)
            entries[sec] = write_squished_dawg(
                dawg, unicharset_size=len(model.unicharset.chars)
            )
    return write_container(entries)


def _recoder_bytes(rec: UnicharCompress) -> bytes:
    w = Writer()
    rec.write(w)
    return w.buf.getvalue()


def combine_lang_model(
    unicharset: Unicharset,
    words: list[str] | None = None,
    puncs: list[str] | None = None,
    numbers: list[str] | None = None,
    version: str = "5.5.3-spark",
) -> bytes:
    """The combine_lang_model training tool
    (src/training/combine_lang_model.cpp:30-80 via
    LanguageModelBuilder): package a STARTER traineddata — unicharset,
    recoder, and wordlist dawgs, no network — ready for lstmtraining to
    attach a net.  Loading it with load_traineddata raises (no LSTM
    section), exactly as the runtime cannot recognize with a starter;
    read it back with read_lang_model."""
    from .dawg import Dawg, write_squished_dawg

    cs = "".join(unicharset.chars)
    entries = {
        TESSDATA_LSTM_UNICHARSET: unicharset.save(),
        TESSDATA_LSTM_RECODER: _recoder_bytes(
            UnicharCompress.pass_through(len(unicharset.chars))
        ),
        TESSDATA_VERSION: version.encode("utf-8"),
    }
    for sec, wl in (
        (TESSDATA_LSTM_SYSTEM_DAWG, words),
        (TESSDATA_LSTM_PUNC_DAWG, puncs),
        (TESSDATA_LSTM_NUMBER_DAWG, numbers),
    ):
        if wl:
            # same ingest cleanup as wordlist2dawg (kCleanupMaps): a
            # tatweel-bearing word cleans to its canonical form instead
            # of being dropped for out-of-charset characters
            d = Dawg(cs, [Unicharset.cleanup_string(w) for w in wl])
            if d.n_edges:
                entries[sec] = write_squished_dawg(
                    d, unicharset_size=len(unicharset.chars)
                )
    return write_container(entries)


def read_lang_model(data: bytes):
    """Inspect a starter traineddata: returns (unicharset, recoder,
    {section: Dawg}) — the inverse of combine_lang_model."""
    from .dawg import read_squished_dawg

    entries = read_container(data)
    if TESSDATA_LSTM_UNICHARSET not in entries:
        raise ValueError("lang model has no unicharset")
    ucs = Unicharset.load(entries[TESSDATA_LSTM_UNICHARSET])
    recoder = (
        UnicharCompress.read(Reader(entries[TESSDATA_LSTM_RECODER]))
        if TESSDATA_LSTM_RECODER in entries
        else UnicharCompress.pass_through(len(ucs.chars))
    )
    cs = "".join(ucs.chars)
    dawgs = {
        sec: read_squished_dawg(entries[sec], cs)
        for sec in (
            TESSDATA_LSTM_SYSTEM_DAWG,
            TESSDATA_LSTM_PUNC_DAWG,
            TESSDATA_LSTM_NUMBER_DAWG,
        )
        if sec in entries
    }
    return ucs, recoder, dawgs


def build_model_from_spec(
    spec: str, lang_model, seed: int = 42
) -> LstmModel:
    """The from-scratch ``lstmtraining --net_spec`` path —
    NetworkBuilder::InitNetwork + LSTMTrainer::InitNetwork
    (networkbuilder.cpp:46-77; lstmtrainer.cpp:160-183): build a
    randomly-initialized network from a VGSL spec string over a STARTER
    traineddata (combine_lang_model output: unicharset + recoder +
    dawgs, no net) and return a trainable LstmModel.

    As the reference's ParseOutput does (networkbuilder.cpp:457-462),
    the trailing output layer's class count is replaced by the
    charset-derived count when the spec disagrees, with the same
    warning.  Class count convention: this engine's decoders put the
    CTC null at index len(charset) (the pass-through recoder allocates
    no null code), so num_outputs = len(charset) + 1 — vs the
    reference's recoder_.code_range(), which embeds null inside the
    code table (documented divergence).

    ``lang_model``: starter container bytes, or the
    (unicharset, recoder, dawgs) triple read_lang_model returns."""
    import re as _re

    from .vgsl import VGSLNetwork

    if isinstance(lang_model, (bytes, bytearray)):
        ucs, recoder, dawgs = read_lang_model(bytes(lang_model))
    else:
        ucs, recoder, dawgs = lang_model
    null_char = len(ucs.chars)
    num_outputs = null_char + 1
    m = _re.search(r"O1c(\d+)", spec)
    if m is None:
        raise ValueError(f"net_spec needs a trailing O1c output: {spec!r}")
    if int(m.group(1)) != num_outputs:
        print(
            f"Warning: given outputs {m.group(1)} not equal to unicharset "
            f"of {num_outputs}."
        )
        spec = spec[: m.start(1)] + str(num_outputs) + spec[m.end(1):]
    net = VGSLNetwork(spec, seed=seed)
    return LstmModel(
        net=net,
        unicharset=ucs,
        recoder=recoder,
        null_char=null_char,
        spec=spec,
        word_dawg=dawgs.get(TESSDATA_LSTM_SYSTEM_DAWG),
        number_dawg=dawgs.get(TESSDATA_LSTM_NUMBER_DAWG),
        punc_dawg=dawgs.get(TESSDATA_LSTM_PUNC_DAWG),
    )


def merge_unicharsets(a: Unicharset, b: Unicharset) -> Unicharset:
    """merge_unicharsets tool (src/training/merge_unicharsets.cpp):
    a's rows keep their ids, b's unseen chars append in b's order."""
    out = Unicharset(chars=list(a.chars), properties=list(a.properties))
    have = set(a.chars)
    for ch, pr in zip(b.chars, b.properties):
        if ch not in have:
            out.chars.append(ch)
            out.properties.append(pr)
            have.add(ch)
    return out


def load_traineddata(data: bytes) -> LstmModel:
    entries = read_container(data)
    if TESSDATA_LSTM not in entries:
        raise ValueError("traineddata has no LSTM section")
    model = read_lstm_section(entries[TESSDATA_LSTM])
    # separate unicharset/recoder components override the embedded ones
    # (LoadCharsets path, lstmrecognizer.cpp:181-196)
    if TESSDATA_LSTM_UNICHARSET in entries:
        model.unicharset = Unicharset.load(entries[TESSDATA_LSTM_UNICHARSET])
    if TESSDATA_LSTM_RECODER in entries:
        model.recoder = UnicharCompress.read(Reader(entries[TESSDATA_LSTM_RECODER]))
    # dictionary sections -> probe-ready dawgs over the model charset
    # (LSTMRecognizer::LoadDictionary, lstmrecognizer.cpp:133-150)
    from .dawg import read_squished_dawg

    for sec, attr in (
        (TESSDATA_LSTM_SYSTEM_DAWG, "word_dawg"),
        (TESSDATA_LSTM_NUMBER_DAWG, "number_dawg"),
        (TESSDATA_LSTM_PUNC_DAWG, "punc_dawg"),
    ):
        if sec in entries:
            setattr(model, attr, read_squished_dawg(entries[sec], model.charset))
    return model


# ---------------------------------------------------------------------------
# Trainer-level label codec (LSTMTrainer::EncodeString
# lstmtrainer.cpp:792-845, LSTMRecognizer::DecodeLabels / DecodeLabel
# lstmrecognizer.cpp:393-404,559-600, LSTMTrainer::MapRecoder
# lstmtrainer.cpp:1052-1089) over RefUnicharset + UnicharCompress.
# ---------------------------------------------------------------------------


def trainer_encode_string(
    ucs, text: str, recoder: UnicharCompress | None, null_char: int, simple_text: bool = False
) -> list[int] | None:
    """EncodeString: unicharset ids through the recoder, null_char
    interleaved unless simple_text. None where the reference returns
    false."""
    from .refcharset import cleanup_string

    if not text:
        return None
    labels: list[int] = []
    if not simple_text:
        labels.append(null_char)
    ok, internal_labels, _, _ = ucs.encode_string(cleanup_string(text), True)
    if not ok:
        return None
    for internal in internal_labels:
        if recoder is not None:
            codes = recoder.encode_unichar(internal)
            if not codes:
                return None
            for c in codes:
                labels.append(c)
                if not simple_text:
                    labels.append(null_char)
        else:
            labels.append(internal)
            if not simple_text:
                labels.append(null_char)
    return labels


def trainer_decode_labels(
    ucs, labels: list[int], recoder: UnicharCompress | None, null_char: int
) -> str:
    """DecodeLabels: walk the label stream, skipping nulls; with a
    recoder, extend each code prefix until it decodes AND the next
    label is a valid first code (lstmrecognizer.cpp:559-600)."""
    result = []
    start = 0
    n = len(labels)
    while start < n:
        if labels[start] == null_char:
            start += 1
            continue
        if recoder is not None:
            code: list[int] = []
            index = start
            uni_id = -1
            while index < n and len(code) < K_MAX_CODE_LEN:
                code.append(labels[index])
                index += 1
                while index < n and labels[index] == null_char:
                    index += 1
                uni_id = recoder.decode_unichar(code)
                if uni_id != -1 and (
                    index == n
                    or len(code) == K_MAX_CODE_LEN
                    or recoder.is_valid_first_code(labels[index])
                ):
                    break
                uni_id = -1
            if uni_id != -1 and uni_id < len(ucs):
                result.append(ucs.id_to_unichar(uni_id))
            start = index if index > start else start + 1
        else:
            uid = labels[start]
            if 0 <= uid < len(ucs):
                result.append(ucs.id_to_unichar(uid))
            start += 1
    return "".join(result)


def map_recoder(new_ucs, new_recoder: UnicharCompress, old_ucs, old_recoder: UnicharCompress) -> list[int]:
    """MapRecoder (lstmtrainer.cpp:1052-1089): for every code of the
    new coder, the corresponding code of the old coder, or -1."""
    num_new_codes = new_recoder.code_range
    num_new_unichars = len(new_ucs)
    code_map = [-1] * num_new_codes
    for c in range(num_new_codes):
        old_code = -1
        # Find new unichar_ids whose recoding includes c (<= includes
        # the null char beyond the unicharset).
        for uid in range(num_new_unichars + 1):
            if uid >= len(new_recoder.encoder):
                break
            codes = new_recoder.encode_unichar(uid)
            try:
                code_index = codes.index(c)
            except ValueError:
                continue
            if uid < num_new_unichars:
                old_uid = old_ucs.unichar_to_id(new_ucs.id_to_unichar(uid))
            else:
                old_uid = len(old_ucs) - 1
            if old_uid == -1:
                continue
            if old_uid < len(old_recoder.encoder):
                old_codes = old_recoder.encode_unichar(old_uid)
                if code_index < len(old_codes):
                    old_code = old_codes[code_index]
                    break
        code_map[c] = old_code
    return code_map
