"""Seeded composition fuzzer over PageSpec — the campaign driver whose
earlier (uncommitted) incarnations found the twelve layout/detection
bugs pinned in tests/test_compose_fuzz_regressions.py.  Committed so
every future round can rerun and extend the campaign with one command.

Generates random pages across the axes the engine must survive —
paragraphs, unbalanced 2nd/3rd columns, photos, rules, the full
SKEW_GRID, inversion, margin noise, first-line indents, pullout
headings, scales 1-3 — and asserts the recognized (kind, text) span
sequence equals the composer's golden.  A mismatch prints the failing
PageSpec repr verbatim, ready to pin as a regression case.

Usage (repo root):
    python tools/fuzz_compose.py --seed 7 --cases 500
    python tools/fuzz_compose.py --seed 11 --cases 300 --columns 3
"""

from __future__ import annotations

import argparse
import random
import sys
import time

sys.path.insert(0, ".")

from tesseract_spark.functions.compose import PageSpec, compose_page  # noqa: E402
from tesseract_spark.lstm.templates import get_net  # noqa: E402
from tesseract_spark.operators.recognize import recognize_page  # noqa: E402

# vocabulary renderable by the fixture font (pangram words + digits —
# the same pool the pinned regression cases draw from)
VOCAB = (
    "quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs sphinx of black quartz judge vow amazingly few "
    "discotheques jukeboxes the provide 42 7 13 99 2026"
).split()

SKEW_GRID = [round(-0.06 + 0.005 * i, 4) for i in range(25)]


def _para(rng: random.Random, max_lines: int = 3) -> list[str]:
    return [
        " ".join(rng.choices(VOCAB, k=rng.randint(2, 4)))
        for _ in range(rng.randint(1, max_lines))
    ]


def gen_spec(
    rng: random.Random, columns: int, with_underlines: bool = False
) -> PageSpec:
    n_paras = rng.randint(1, 3)
    paragraphs = [_para(rng) for _ in range(n_paras)]
    column2 = column3 = None
    if columns >= 2 and rng.random() < (0.5 if columns == 2 else 0.8):
        column2 = [_para(rng) for _ in range(rng.randint(1, 3))]
        if columns >= 3 and rng.random() < 0.6:
            column3 = [_para(rng) for _ in range(rng.randint(1, 2))]
    scale = rng.randint(1, 3)
    skew = rng.choice(SKEW_GRID) if rng.random() < 0.5 else 0.0
    photos = tuple(
        (rng.randrange(n_paras), rng.randint(38, 90), rng.randint(25, 46))
        for _ in range(rng.choices((0, 1, 2), weights=(5, 3, 1))[0])
    )
    rules = tuple(
        sorted(
            rng.sample(range(n_paras), k=rng.choices(
                (0, 1, 2), weights=(6, 3, 1))[0] if n_paras >= 2 else
                rng.choice((0, 1)))
        )
    )
    indents = tuple(
        i for i in range(n_paras) if rng.random() < 0.2
    )
    pullout = (
        [" ".join(rng.choices(VOCAB, k=4))]
        if column2 is not None and rng.random() < 0.25
        else None
    )
    underlines = ()
    if with_underlines and rng.random() < 0.25:
        pi = rng.randrange(n_paras)
        underlines = ((pi, rng.randrange(len(paragraphs[pi]))),)
    return PageSpec(
        paragraphs=paragraphs,
        column2=column2,
        column3=column3,
        scale=scale,
        skew=skew,
        inverted=rng.random() < 0.2,
        noise_dots=rng.choice((0, 0, 0, 2, 4, 7)),
        indent_paras=indents,
        photos=photos,
        rules=rules,
        pullout_lines=pullout,
        underlines=underlines,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cases", type=int, default=200)
    ap.add_argument("--columns", type=int, default=2, choices=(1, 2, 3))
    ap.add_argument(
        "--underlines",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="underline axis (DEFAULT-ON since round 5: the scale-1 "
        "both-sides-covered case is closed by the gap-asymmetry "
        "arbitration in _filter_false_positives; --no-underlines "
        "disables the axis for bisecting other failures).  KNOWN "
        "RESIDUAL: an underline on a DESCENDER-FREE line at render "
        "scale 3 — its covering ink starts at depth ~21, past the "
        "18-row one-sided window, and widening to 24 traded three "
        "pinned separator contracts (rule-near-photo and "
        "clipped-glyph rules live in the 19-24 band)",
    )
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    rng = random.Random(args.seed)
    net = get_net()
    failures = 0
    t0 = time.time()
    for ci in range(args.cases):
        spec = gen_spec(rng, args.columns, args.underlines)
        try:
            page = compose_page(spec)
            spans, _layout = recognize_page(page.image, spec.dpi, None, net)
            got = [(s.kind, s.text) for s in spans]
            ok = got == page.golden
        except Exception as e:  # noqa: BLE001 — a crash IS a finding
            failures += 1
            print(f"\nCRASH case {ci} (seed {args.seed}): {e!r}\n{spec!r}")
            continue
        if not ok:
            failures += 1
            print(
                f"\nMISMATCH case {ci} (seed {args.seed}):\n"
                f"  got    = {got}\n  golden = {page.golden}\n{spec!r}"
            )
        elif args.verbose:
            print(f"ok {ci}")
        if (ci + 1) % 50 == 0:
            print(
                f"[{ci + 1}/{args.cases}] {failures} failures "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    print(
        f"\n{args.cases} cases, {failures} failures "
        f"(seed {args.seed}, columns<={args.columns}, "
        f"{time.time() - t0:.0f}s)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
