"""Bidirectional reading order for words within a line.

Re-expresses ``ResultIterator::CalculateTextlineOrder``
(src/ccmain/resultiterator.cpp:256-330): given per-word direction runs
(LTR / RTL / neutral), produce the output permutation for the line under a
paragraph-level base direction — the Unicode-bidi-like rule the reference
applies before assembling line text.

Rules (matching the reference's simplified model):
- neutrals take the direction of their surrounding run (trailing neutrals
  take the base direction);
- in an LTR paragraph, RTL runs are emitted reversed in place;
- in an RTL paragraph, the line is walked right-to-left and LTR runs are
  emitted reversed in place (i.e. in logical order).
"""

from __future__ import annotations


def resolve_directions(dirs: list[str], base_rtl: bool) -> list[str]:
    """Resolve 'N' (neutral) entries to 'L'/'R' run directions."""
    out = []
    for i, d in enumerate(dirs):
        if d != "N":
            out.append(d)
            continue
        prev = next((x for x in reversed(out) if x != "N"), None)
        nxt = next((x for x in dirs[i + 1 :] if x != "N"), None)
        if prev and nxt and prev == nxt:
            out.append(prev)
        else:
            out.append("R" if base_rtl else "L")
    return out


def textline_order(dirs: list[str], base_rtl: bool) -> list[int]:
    """Output permutation of word indices for one line.

    dirs: per-word 'L' / 'R' / 'N'.  Returns indices in visual emission
    order (CalculateTextlineOrder analogue).
    """
    n = len(dirs)
    if n == 0:
        return []
    resolved = resolve_directions(dirs, base_rtl)
    # group into maximal same-direction runs
    runs: list[tuple[str, list[int]]] = []
    for i, d in enumerate(resolved):
        if runs and runs[-1][0] == d:
            runs[-1][1].append(i)
        else:
            runs.append((d, [i]))
    order: list[int] = []
    if not base_rtl:
        for d, idxs in runs:
            order.extend(reversed(idxs) if d == "R" else idxs)
    else:
        # rightmost run first; RTL runs read right-to-left within the run,
        # embedded LTR runs keep their left-to-right order
        for d, idxs in reversed(runs):
            order.extend(reversed(idxs) if d == "R" else idxs)
    return order
