"""LigatureTable — the text2image training tool's ligature mapping.

Re-expresses src/training/pango/ligature_table.cpp:60-186 (singleton
Init + AddLigatures / RemoveLigatures / RemoveCustomLigatures) and the
custom table UNICHARSET::kCustomLigatures (src/ccutil/unicharset.cpp:61)
used to render historic-text training data: rare multi-character forms
("ct", long-s digraphs) map to private-use codepoints a historic font
carries, and back to their normalized text for the recognition set.

Fidelity note: Init scans U+FB00..U+FB17 adding every ligature whose
NFC normalization differs from itself (ligature_table.cpp:64-82) — but
NFC does NOT decompose compatibility ligatures, so that scan adds
nothing and the shipped reference's tables hold exactly the custom
entries (its own NFKC-era AddLigatures/RemoveLigatures tests are
``#if 0``-disabled with the comment "not with NFC normalization";
ligature_table_test.cc:60,98).  This module reproduces the shipped
behavior, including the byte-wise greedy longest-match scan of
AddLigatures (the reference walks std::string bytes).
"""

from __future__ import annotations

import unicodedata

# UNICHARSET::kCustomLigatures (unicharset.cpp:61-67)
CUSTOM_LIGATURES: tuple[tuple[str, str], ...] = (
    ("ct", ""),
    ("ſh", ""),  # long-s + h
    ("ſi", ""),
    ("ſl", ""),
    ("ſſ", ""),
)

_K_MIN_LIGATURE = 0xFB00
_K_MAX_LIGATURE = 0xFB17  # "Don't put the wide Hebrew letters in."


class LigatureTable:
    """Singleton mapping table (LigatureTable::Get / Init)."""

    _instance: "LigatureTable | None" = None

    def __init__(self) -> None:
        self.norm_to_lig: dict[bytes, str] = {}
        self.lig_to_norm: dict[str, str] = {}
        self.min_norm_len = 0
        self.max_norm_len = 0
        for cp in range(_K_MIN_LIGATURE, _K_MAX_LIGATURE + 1):
            lig = chr(cp)
            normed = unicodedata.normalize("NFC", lig)
            lb, nb = lig.encode("utf-8"), normed.encode("utf-8")
            if normed != lig and len(lb) > 1 and len(nb) > 1:
                self._add(normed, lig)
        for norm, lig in CUSTOM_LIGATURES:
            self._add(norm, lig)

    def _add(self, norm: str, lig: str) -> None:
        nb = norm.encode("utf-8")
        self.norm_to_lig[nb] = lig
        self.lig_to_norm[lig] = norm
        n = len(nb)
        if self.min_norm_len == 0 or n < self.min_norm_len:
            self.min_norm_len = n
        self.max_norm_len = max(self.max_norm_len, n)

    @classmethod
    def get(cls) -> "LigatureTable":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def add_ligatures(self, text: str) -> str:
        """Greedy longest-match byte scan (AddLigatures,
        ligature_table.cpp:153-186; the renderability branch needs a
        Pango font and is out of scope — pass ``font=None`` there)."""
        data = text.encode("utf-8")
        out: list[bytes | str] = []
        n = len(data)
        i = 0
        while i < n - self.min_norm_len + 1:
            step = 0
            for liglen in range(self.max_norm_len, self.min_norm_len - 1, -1):
                if i + liglen <= n:
                    hit = self.norm_to_lig.get(data[i : i + liglen])
                    if hit is not None:
                        out.append(hit)
                        step = liglen
                        break
            if step == 0:
                out.append(data[i : i + 1])
                step = 1
            i += step
        out.append(data[i:])
        return b"".join(
            p.encode("utf-8") if isinstance(p, str) else p for p in out
        ).decode("utf-8")

    def remove_ligatures(self, text: str) -> str:
        """Per-character reverse mapping (RemoveLigatures :109-126)."""
        return "".join(self.lig_to_norm.get(ch, ch) for ch in text)

    def remove_custom_ligatures(self, text: str) -> str:
        """Only the custom table's reverse (RemoveCustomLigatures
        :128-151) — keeps genuine Unicode ligatures intact."""
        custom = {lig: norm for norm, lig in CUSTOM_LIGATURES}
        return "".join(custom.get(ch, ch) for ch in text)
