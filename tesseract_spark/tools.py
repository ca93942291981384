"""Training-tool command-line programs.

The reference ships its training utilities as standalone binaries
driven by ParseCommandLineFlags; this module is the same toolbox over
one dispatcher:

    python -m tesseract_spark.tools TOOL [args...]

Tools (usage mirrors the reference program of the same name):

- ``wordlist2dawg word_list_file dawg_file unicharset_file``
  (src/training/wordlist2dawg.cpp:34-95)
- ``dawg2wordlist unicharset_file dawg_file wordlist_file``
  (src/training/dawg2wordlist.cpp:23-60)
- ``unicharset_extractor [--output_unicharset filename]
  [--norm_mode mode] text_files...``
  (src/training/unicharset_extractor.cpp:35-115; flags parsed by the
  ported ParseCommandLineFlags in flags.py)
- ``merge_unicharsets unicharset-in-1 ... unicharset-in-n out``
  (src/training/merge_unicharsets.cpp)
- ``combine_tessdata prefix.`` | ``-e traineddata file...`` |
  ``-u traineddata prefix`` | ``-d traineddata``
  (src/training/combine_tessdata.cpp:125-260)

Each ``main_*`` takes argv (program name at index 0) and returns an
exit code, so tests drive them exactly as a shell would.
"""

from __future__ import annotations

import os
import sys

# kTessdataFileSuffixes (src/ccutil/tessdatamanager.h:30-86) — the
# subset whose sections this engine reads/writes
SUFFIX_TO_TYPE = {
    "config": 0,
    "unicharset": 1,
    "lstm": 17,
    "lstm-punc-dawg": 18,
    "lstm-word-dawg": 19,
    "lstm-number-dawg": 20,
    "lstm-unicharset": 21,
    "lstm-recoder": 22,
    "version": 23,
}
TYPE_TO_SUFFIX = {v: k for k, v in SUFFIX_TO_TYPE.items()}


def _read_unicharset(path: str):
    from .lstm.tessdata import Unicharset

    with open(path, "rb") as f:
        return Unicharset.load(f.read())


def main_wordlist2dawg(argv: list[str]) -> int:
    if len(argv) != 4:
        print(f"Usage: {argv[0]} word_list_file dawg_file unicharset_file",
              file=sys.stderr)
        return 1
    from .lstm.dawg import wordlist2dawg

    uc = _read_unicharset(argv[3])
    with open(argv[1], "r", encoding="utf-8") as f:
        words = [w.strip() for w in f if w.strip()]
    charset = "".join(uc.chars)
    with open(argv[2], "wb") as f:
        f.write(wordlist2dawg(words, charset))
    return 0


def main_dawg2wordlist(argv: list[str]) -> int:
    if len(argv) != 4:
        print(f"Usage: {argv[0]} unicharset_file dawg_file wordlist_file",
              file=sys.stderr)
        return 1
    from .lstm.dawg import dawg2wordlist

    uc = _read_unicharset(argv[1])
    with open(argv[2], "rb") as f:
        data = f.read()
    words = dawg2wordlist(data, "".join(uc.chars))
    with open(argv[3], "w", encoding="utf-8") as f:
        for w in words:
            f.write(w + "\n")
    return 0


def main_unicharset_extractor(argv: list[str]) -> int:
    """Text files in, unicharset out — one distributed hash aggregation
    at corpus scale (Unicharset.from_texts / queries.charset_extract);
    here the local file-driven shape.  norm_mode is accepted for
    usage-compatibility; this engine's charset ingest normalizes per
    grapheme always (mode 1 semantics)."""
    from .flags import FlagRegistry, parse_command_line_flags
    from .lstm.tessdata import Unicharset

    reg = FlagRegistry()
    reg.string_flag("output_unicharset", "unicharset", "Output file path")
    reg.int_flag("norm_mode", 1,
                 "Normalization mode for the input strings")
    rest = parse_command_line_flags(
        f"{argv[0]} [--output_unicharset filename] [--norm_mode mode] "
        "text_files...",
        argv, remove_flags=True, registry=reg)
    if len(rest) < 2:
        print("Error: no input files", file=sys.stderr)
        return 1
    texts = []
    for path in rest[1:]:
        with open(path, "r", encoding="utf-8") as f:
            texts.append(f.read())
    uc = Unicharset.from_texts(texts)
    out = reg.get("output_unicharset").value
    with open(out, "wb") as f:
        f.write(uc.save())
    print(f"Wrote unicharset file {out}")
    return 0


def main_merge_unicharsets(argv: list[str]) -> int:
    if len(argv) < 4:
        print(f"Usage: {argv[0]} unicharset-in-1 ... unicharset-in-n "
              "unicharset-out", file=sys.stderr)
        return 1
    from .lstm.tessdata import merge_unicharsets

    merged = _read_unicharset(argv[1])
    for path in argv[2:-1]:
        merged = merge_unicharsets(merged, _read_unicharset(path))
    with open(argv[-1], "wb") as f:
        f.write(merged.save())
    return 0


def main_combine_tessdata(argv: list[str]) -> int:
    from .lstm.tessdata import read_container, write_container

    if len(argv) >= 3 and argv[1] == "-e":
        # extract: each output filename's suffix names the section
        with open(argv[2], "rb") as f:
            entries = read_container(f.read())
        for out in argv[3:]:
            suffix = out.split(".")[-1]
            t = SUFFIX_TO_TYPE.get(suffix)
            if t is None or t not in entries:
                print(f"Not extracting {out}: no such section", file=sys.stderr)
                return 1
            with open(out, "wb") as f:
                f.write(entries[t])
        return 0
    if len(argv) == 4 and argv[1] == "-u":
        with open(argv[2], "rb") as f:
            entries = read_container(f.read())
        for t, blob in sorted(entries.items()):
            suffix = TYPE_TO_SUFFIX.get(t, str(t))
            with open(f"{argv[3]}{suffix}", "wb") as f:
                f.write(blob)
        return 0
    if len(argv) == 3 and argv[1] == "-d":
        with open(argv[2], "rb") as f:
            entries = read_container(f.read())
        for t, blob in sorted(entries.items()):
            print(f"{TYPE_TO_SUFFIX.get(t, t)}:size={len(blob)}")
        return 0
    if len(argv) == 2:
        # combine: prefix. + known suffixes -> prefix.traineddata
        prefix = argv[1]
        entries = {}
        for suffix, t in SUFFIX_TO_TYPE.items():
            path = prefix + suffix
            if os.path.exists(path):
                with open(path, "rb") as f:
                    entries[t] = f.read()
        if not entries:
            print(f"Error: no input components found at {prefix}*",
                  file=sys.stderr)
            return 1
        out = prefix.rstrip(".") + ".traineddata"
        with open(out, "wb") as f:
            f.write(write_container(entries))
        print(f"Output {out} created successfully.")
        return 0
    print(
        f"Usage: {argv[0]} language_data_path_prefix. | "
        f"-e traineddata file... | -u traineddata prefix | -d traineddata",
        file=sys.stderr)
    return 1


TOOLS = {
    "wordlist2dawg": main_wordlist2dawg,
    "dawg2wordlist": main_dawg2wordlist,
    "unicharset_extractor": main_unicharset_extractor,
    "merge_unicharsets": main_merge_unicharsets,
    "combine_tessdata": main_combine_tessdata,
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv if argv is None else argv)
    if len(argv) < 2 or argv[1] not in TOOLS:
        print("Usage: python -m tesseract_spark.tools "
              f"{{{'|'.join(sorted(TOOLS))}}} [args...]", file=sys.stderr)
        return 1
    tool = argv[1]
    return TOOLS[tool]([tool] + argv[2:])


if __name__ == "__main__":
    sys.exit(main())
