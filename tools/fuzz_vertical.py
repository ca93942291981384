"""Seeded fuzzer for the vertical-text path — committed companion to
tools/fuzz_compose.py (the earlier uncommitted run found the three
defects pinned in tests/test_vertical_fuzz_regressions.py).

Random 1-4 column pages of [a-z0-9] glyph stacks at pitch 17-24 and
column spacing 22-49, with optional ink specks; asserts
``is_vertical_page`` detects the page and ``recognize_vertical_page``
recovers every column exactly.

Usage (repo root):
    python tools/fuzz_vertical.py --seed 7 --cases 300
"""

from __future__ import annotations

import argparse
import random
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from tesseract_spark.functions.fonts import get_font, mask_to_gray  # noqa: E402
from tesseract_spark.functions.image_ops import (  # noqa: E402
    binarize_otsu,
    label_and_stats,
)
from tesseract_spark.operators.vertical import (  # noqa: E402
    is_vertical_page,
    recognize_vertical_page,
)

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def compose_vertical(columns, pitch=18, colspace=26):
    font = get_font()
    H = 24 + pitch * max(len(c) for c in columns)
    W = 24 + colspace * len(columns)
    mask = np.zeros((H, W), dtype=bool)
    for ci, text in enumerate(columns):
        x = W - 12 - 10 - ci * colspace
        y = 12
        for ch in text:
            g = font[ch]
            mask[y : y + g.shape[0], x : x + g.shape[1]] |= g
            y += pitch
    return mask_to_gray(mask)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cases", type=int, default=300)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    failures = 0
    t0 = time.time()
    for ci in range(args.cases):
        cols = [
            "".join(rng.choices(ALPHABET, k=rng.randint(2, 6)))
            for _ in range(rng.randint(1, 4))
        ]
        pitch = rng.randint(17, 24)
        # colspace must exceed pitch by >= 2: with columns packed as
        # tight as the glyph pitch, neighbouring glyphs are as close
        # horizontally as vertically and the grid legitimately reads
        # as horizontal rows — the same documented ambiguity envelope
        # as the composer's narrow-page skew gate (detection flips at
        # colspace < pitch on clean pages, and ink specks can tip the
        # equality case, e.g. pitch 23 / colspace 23 / speck seed 428)
        cs = rng.randint(max(22, pitch + 2), 49)
        speck_seed = rng.randrange(1000) if rng.random() < 0.3 else None
        try:
            gray = compose_vertical(cols, pitch=pitch, colspace=cs)
            if speck_seed is not None:
                nrng = np.random.default_rng(speck_seed)
                gray = gray.copy()
                ys = nrng.integers(0, gray.shape[0], 3)
                xs = nrng.integers(0, gray.shape[1], 3)
                gray[ys, xs] = 0
            stats = label_and_stats(binarize_otsu(gray))[2]
            det = is_vertical_page(stats)
            got = recognize_vertical_page(gray) if det else None
            ok = det and got == cols
        except Exception as e:  # noqa: BLE001 — a crash IS a finding
            failures += 1
            print(
                f"\nCRASH case {ci} (seed {args.seed}): {e!r}\n"
                f"  ({cols!r}, {pitch}, {cs}, {speck_seed!r})"
            )
            continue
        if not ok:
            failures += 1
            print(
                f"\nMISMATCH case {ci} (seed {args.seed}): det={det} "
                f"got={got}\n  ({cols!r}, {pitch}, {cs}, {speck_seed!r})"
            )
        if (ci + 1) % 50 == 0:
            print(
                f"[{ci + 1}/{args.cases}] {failures} failures "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    print(
        f"\n{args.cases} cases, {failures} failures "
        f"(seed {args.seed}, {time.time() - t0:.0f}s)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
