"""Template-bank recognition network (trained-by-construction conv scorer).

Stands in for the reference's LSTM forward pass in the hermetic sandbox
(SURVEY §7.2 M3: "a tiny self-trained fixture net for hermetic tests").  The
network is a single convolutional scoring layer whose filters ARE the glyph
templates of the fixture font, evaluated as batched matrix products (the
float32-BLAS analogue of the reference's int8 SIMD matmuls,
src/lstm/weightmatrix.h:70-184, src/arch/intsimdmatrix*.cpp).  Its output is
a per-x-column class-score sequence — the same NetworkIO softmax time-series
shape the real LSTM produces (src/lstm/lstmrecognizer.cpp:247-291) — which
feeds the CTC beam search unchanged.

Timestep compression: only "interesting" columns (candidate glyph starts,
word gaps, and separators) are emitted, mirroring the x-subsampling the
reference gets from its conv/maxpool stack (src/lstm/input.cpp:82-99).
"""

from __future__ import annotations

import numpy as np

from ..functions.fonts import CELL_H, CHARSET, WORD_GAP, get_font

BLANK_SCORE = 0.9  # match fraction a true glyph must beat
ALPHA = 24.0  # logit sharpness
K_SOFT_GATE = 0.75  # min static frac for a soft (dict-arbitrated) event
K_DEGRADED_ACCEPT = 0.875  # no-dict fallback: near-exact static match
# still elects its best class (same bar as the adaptive bitmap accept)
SOFT_EVENT_SCORE = BLANK_SCORE - 0.003  # loses to blank in greedy decode,
#   but close enough that the kDictRatio/kCertOffset flip criterion
#   (lstmrecognizer.cpp:46-48) lets the dictionary beam take the char —
#   the classifier proposes, the language model decides, as in the
#   reference's rating-based choice among classifier outputs
K_ADAPT_ACCEPT_SCORE = BLANK_SCORE + 0.05  # adapted-template hits decode
#   decisively (a learned within-page bitmap is strong evidence)
# chop path (chopper.cpp:385 chop_word_main / segsearch.cpp:33): a piece
# of a chopped run may lose or gain the one shared junction column, so
# its match fraction dips below the static gate; accept pieces down to
# this floor but require the whole segmentation to average near-exact
K_CHOP_MIN_FRAC = 0.84
K_CHOP_MEAN_FRAC = 0.90


class TemplateNet:
    """Glyph-template conv bank over canonical 16-row line strips."""

    def __init__(
        self,
        glyphs: str = CHARSET,
        extra_fonts: dict[str, dict[str, np.ndarray]] | None = None,
    ) -> None:
        """``extra_fonts``: name -> glyph-mask dict of additional font
        faces (bold/italic variants).  Variant templates map to the SAME
        output class — the multi-font prototype banks of the reference's
        inttemp (one class, many font configs, intproto.h CLASS_STRUCT),
        which is what makes fontinfo attribution possible
        (WordFontAttributes, ltrresultiterator.cpp:152-200)."""
        font = get_font()
        self.glyphs = glyphs
        self.charset = glyphs + " "
        self.space_code = len(glyphs)
        self.blank = len(self.charset)  # last class = CTC blank
        self.n_classes = len(self.charset) + 1
        # template bank: (class code, font id, mask); font 0 = base face
        self.font_names = ["normal"]
        bank: list[tuple[int, int, np.ndarray]] = [
            (i, 0, font[ch]) for i, ch in enumerate(glyphs)
        ]
        if extra_fonts:
            for name, fdict in extra_fonts.items():
                fid = len(self.font_names)
                self.font_names.append(name)
                for i, ch in enumerate(glyphs):
                    if ch in fdict:
                        bank.append((i, fid, fdict[ch]))
        # per-code variant list for post-decode font attribution
        self.variants: dict[int, list[tuple[int, np.ndarray]]] = {}
        for code, fid, mask in bank:
            self.variants.setdefault(code, []).append((fid, mask))
        # group filters by width for batched matmul
        self.by_width: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._dup_codes: dict[int, bool] = {}
        for w in sorted({m.shape[1] for _c, _f, m in bank}):
            grp = [(c, m) for c, _f, m in bank if m.shape[1] == w]
            idxs = [c for c, _m in grp]
            filt = np.stack(
                [m.astype(np.float32).ravel() for _c, m in grp]
            )  # [n_t, 16*w]
            self.by_width[w] = (np.asarray(idxs, dtype=np.int64), filt)
            self._dup_codes[w] = len(idxs) != len(set(idxs))
        # per-group template ink totals, hoisted out of match_scores
        self._filt_sums = {
            w: filt.sum(axis=1, keepdims=True)
            for w, (_i, filt) in self.by_width.items()
        }
        self.widths = {ch: font[ch].shape[1] for ch in glyphs}
        self.width_by_code = np.zeros(len(glyphs), dtype=np.int64)
        for i, ch in enumerate(glyphs):
            self.width_by_code[i] = self.widths[ch]

    def match_scores(
        self, strip: np.ndarray, cand_xs: np.ndarray | None = None
    ) -> tuple[np.ndarray, dict[int, np.ndarray]]:
        """Template match fractions at candidate start columns.

        strip: bool [16, W].  cand_xs: columns to evaluate (default: every
        glyph-start candidate — an ink column whose left neighbour is
        blank; every template has ink in its first column, so true starts
        are always candidates).  Returns (cand_xs, {width: frac
        [n_c_w, n_cand]}) with frac = fraction of equal pixels between
        template and window (one matmul per width group — the batched
        BLAS path replacing the reference's SIMD int8 kernels).
        """
        H, W = strip.shape
        if cand_xs is None:
            col_ink = strip.any(axis=0)
            prev_blank = np.empty_like(col_ink)
            prev_blank[0] = True
            prev_blank[1:] = ~col_ink[:-1]
            cand_xs = np.flatnonzero(col_ink & prev_blank)
        pad = max(self.by_width) + 1  # right pad (direct alloc; np.pad's
        sp = np.zeros((H, W + pad), dtype=np.float32)  # machinery shows up
        sp[:, :W] = strip  # at per-row call rates
        out: dict[int, np.ndarray] = {}
        for w, (idxs, filt) in self.by_width.items():
            if len(cand_xs) == 0:
                out[w] = np.zeros((len(idxs), 0), dtype=np.float32)
                continue
            cols = cand_xs[:, None] + np.arange(w)[None, :]
            wins = sp[:, cols]  # [16, n_cand, w]
            wins = wins.transpose(1, 0, 2).reshape(len(cand_xs), H * w)
            dot = filt @ wins.T  # [n_c, n_cand]
            t_sum = self._filt_sums[w]
            w_sum = wins.sum(axis=1)[None, :]
            eq = 2.0 * dot - t_sum - w_sum + filt.shape[1]
            out[w] = eq / filt.shape[1]
        return cand_xs, out

    def chop_run(
        self, strip: np.ndarray, rl: int, rr: int
    ) -> list[tuple[int, int, float, int]] | None:
        """Chop one contiguous ink run [rl, rr) into >= 2 template pieces.

        The legacy engine's chop-and-search slice (OEM_TESSERACT_ONLY
        path): when a word's blobs are joined, ``chop_word_main``
        (src/wordrec/chopper.cpp:385) splits the weakest blob at concave
        seam points (``attempt_blob_chop``, src/wordrec/chop.cpp; the best seam is
        elected by the priority-queue seam search of
        src/wordrec/findseam.cpp:250-350 pick_good_seam) and
        ``SegSearch`` (src/wordrec/segsearch.cpp:33) walks the resulting
        chunk lattice for the best-rated segmentation.  Here the lattice
        is explicit: a DP tiles the run with static-bank templates,
        allowing each junction to abut exactly or share one chop column
        (the seam), maximizing total match fraction with ties to fewer
        pieces.  Returns [(x, code, frac, width)] or None when no
        believable 2+-piece segmentation exists.
        """
        xs = np.arange(rl, rr, dtype=np.int64)
        if len(xs) < 2:
            return None
        _c, scores = self.match_scores(strip, xs)
        n = rr - rl
        # best (frac, code) per (offset, width)
        best_f: dict[int, np.ndarray] = {}
        best_c: dict[int, np.ndarray] = {}
        for w, (idxs, _f) in self.by_width.items():
            sc = scores[w]
            if not sc.size:
                continue
            best_f[w] = sc.max(axis=0)
            best_c[w] = idxs[sc.argmax(axis=0)]
        # minimize total rating cost sum(1 - frac) — ratings SUM across a
        # segmentation in the reference (WERD_CHOICE rating accumulation),
        # so spurious extra pieces always cost more than one clean match;
        # ties prefer fewer pieces
        INF = 1e9
        dp = np.full(n + 1, INF, dtype=np.float64)
        pieces_at = np.full(n + 1, 1 << 30, dtype=np.int64)
        back: list[tuple[int, int, int, float] | None] = [None] * (n + 1)
        dp[0] = 0.0
        pieces_at[0] = 0
        for k in range(n):
            if dp[k] >= INF:
                continue
            for w in self.by_width:
                if w not in best_f:
                    continue
                f = float(best_f[w][k])
                if f < K_CHOP_MIN_FRAC:
                    continue
                code = int(best_c[w][k])
                for step in (w, w - 1):  # exact abut | 1-col shared seam
                    k2 = k + step
                    if k2 > n:
                        continue
                    val = dp[k] + (1.0 - f)
                    np2 = pieces_at[k] + 1
                    if val < dp[k2] or (
                        val == dp[k2] and np2 < pieces_at[k2]
                    ):
                        dp[k2] = val
                        pieces_at[k2] = np2
                        back[k2] = (k, w, code, f)
        if dp[n] >= INF or pieces_at[n] < 2:
            return None
        if 1.0 - dp[n] / pieces_at[n] < K_CHOP_MEAN_FRAC:
            return None
        out: list[tuple[int, int, float, int]] = []
        k = n
        while k > 0:
            pk, w, code, f = back[k]  # type: ignore[misc]
            out.append((rl + pk, code, f, w))
            k = pk
        out.reverse()
        return out

    def font_of_char(self, strip: np.ndarray, x: int, code: int) -> int:
        """Best-matching font-variant id for the glyph starting at
        column ``x`` — the fontinfo attribution the reference reads off
        the best-matched prototype config (WordFontAttributes,
        ltrresultiterator.cpp:152-200; per-word fonts elected by
        majority vote over blobs, font_recognition_pass,
        src/ccmain/control.cpp:1900-1960)."""
        H, W = strip.shape
        cands = self.variants.get(code)
        if not cands or len(cands) == 1:
            return 0
        best_fid, best_frac = 0, -1.0
        for fid, mask in cands:
            w = mask.shape[1]
            win = strip[:, x : x + w]
            if win.shape[1] < w:
                win = np.pad(win, ((0, 0), (0, w - win.shape[1])))
            frac = float((win == mask).mean())
            if frac > best_frac:
                best_frac, best_fid = frac, fid
        return best_fid

    def _score_candidates(
        self, strip: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Static-template scoring of one strip: candidate glyph-start
        columns, the per-candidate class-score matrix, and widest exact
        widths — the vectorized half of forward(), factored so
        precompute_scores can batch it across a page's strips."""
        H, W = strip.shape
        cand_xs, scores = self.match_scores(strip)
        n_cand = len(cand_xs)
        # per-candidate class-score matrix + widest-exact widths, built in
        # one vectorized pass per width group (hoisted out of the NMS loop)
        vec_all = np.zeros((self.n_classes, n_cand), dtype=np.float32)
        widest_exact = np.zeros(n_cand, dtype=np.int64)
        for w, (idxs, _f) in self.by_width.items():
            if not scores[w].size:
                continue
            if self._dup_codes[w]:
                # font variants share a class: duplicate rows need an
                # accumulating max (fancy assignment would keep only the
                # last duplicate's scores)
                np.maximum.at(vec_all, idxs, scores[w])
            else:
                vec_all[idxs, :] = np.maximum(vec_all[idxs, :], scores[w])
            exact = (scores[w] >= 0.999).any(axis=0)
            widest_exact = np.where(
                exact & (w > widest_exact), w, widest_exact
            )
        keep = (
            vec_all[: self.space_code].max(axis=0) >= BLANK_SCORE
            if n_cand
            else np.ones(0, dtype=bool)
        )
        if n_cand and not keep.all():
            # ±1-row vertical jitter tolerance: the page deskew is a
            # quantized shear, so individual glyphs can sit one row off
            # the row baseline (round(s*x) disagreeing across a word at
            # the residual slope) — the reference's integer matcher
            # absorbs this via its quantized feature displacement
            # tolerance (intmatcher.cpp evidence lookup spans
            # neighbouring quantized positions).  Only candidates that
            # FAILED the static gate retry on shifted windows, so clean
            # pages pay nothing.
            fail = np.flatnonzero(~keep)
            fxs = cand_xs[fail]
            zero_row = np.zeros((1, W), dtype=strip.dtype)
            for shifted in (
                np.vstack([strip[1:], zero_row]),  # glyph one row low
                np.vstack([zero_row, strip[:-1]]),  # glyph one row high
            ):
                _c2, sc2 = self.match_scores(shifted, fxs)
                for w, (idxs, _f) in self.by_width.items():
                    sc = sc2[w]
                    if not sc.size:
                        continue
                    np.maximum.at(
                        vec_all, (idxs[:, None], fail[None, :]), sc
                    )
                    exact = (sc >= 0.999).any(axis=0)
                    widest_exact[fail] = np.where(
                        exact & (w > widest_exact[fail]),
                        w,
                        widest_exact[fail],
                    )
        return cand_xs, vec_all, widest_exact

    def precompute_scores(
        self, strips: list[np.ndarray]
    ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Batch _score_candidates across a page's line strips: the strips
        concatenate side by side with a blank gap wider than any template,
        so windows cannot cross strips and candidate detection sees each
        strip's left edge fresh — ONE match_scores (and one shared ±1-row
        jitter retry) serves every strip with values identical to the
        per-strip calls.  Cuts the per-row numpy call overhead that
        dominates short flagship lines."""
        if not strips:
            return []
        if len(strips) == 1:
            return [self._score_candidates(strips[0])]
        gap = max(self.by_width) + 2
        widths = [s.shape[1] for s in strips]
        total = sum(widths) + gap * (len(strips) - 1)
        big = np.zeros((CELL_H, total), dtype=strips[0].dtype)
        offs = []
        x = 0
        for s in strips:
            big[:, x:x + s.shape[1]] = s
            offs.append(x)
            x += s.shape[1] + gap
        cand_xs, vec_all, widest = self._score_candidates(big)
        out = []
        for off, w in zip(offs, widths):
            m = (cand_xs >= off) & (cand_xs < off + w)
            out.append((cand_xs[m] - off, vec_all[:, m], widest[m]))
        return out

    def forward(
        self,
        strip: np.ndarray,
        space_px: int = WORD_GAP,
        fuzzy_px: int | None = None,
        adapted=None,
        soft: bool = False,
        pre: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
    ) -> tuple[np.ndarray, np.ndarray, frozenset[int], np.ndarray]:
        """Line strip -> (log_probs [T, C], col_of_t [T], fuzzy_ts,
        dropped_xs).

        ``dropped_xs`` lists candidate glyph-start columns whose ink
        cleared no static template (damaged glyphs) — the trigger for the
        adaptive second pass.  With ``adapted`` (an
        adaptive.AdaptiveTemplates), such columns are rescued by matching
        against the page's learned bitmaps (AdaptiveClassifier,
        src/classify/adaptmatch.cpp:202-234) before being dropped.

        Emits compressed timesteps: accepted glyph-start columns (maximal
        munch over exact matches), word-gap columns, and blank separators.
        col_of_t maps each timestep back to its x column for word boxes.

        When ``fuzzy_px`` is given, gap runs in [fuzzy_px, space_px) are
        emitted as *fuzzy* space events (tosp fuzzy band, fraction of
        x-height — src/textord/textord.cpp:98 tosp_fuzzy_space_factor=0.6);
        their timesteps are returned in ``fuzzy_ts`` so the caller can
        resolve them post-decode against the dictionary, the analogue of
        fix_fuzzy_spaces (src/ccmain/fixspace.cpp:74-214).
        """
        H, W = strip.shape
        assert H == CELL_H, f"strip must be {CELL_H} rows, got {H}"
        if pre is None:
            cand_xs, vec_all, widest_exact = self._score_candidates(strip)
        else:
            cand_xs, vec_all, widest_exact = pre
        col_has_ink = strip.any(axis=0)
        n_cand = len(cand_xs)
        best_frac = (
            vec_all[: self.space_code].max(axis=0)
            if n_cand
            else np.zeros(0, dtype=np.float32)
        )
        keep = best_frac >= BLANK_SCORE
        best_codes = (
            vec_all[: self.space_code].argmax(axis=0)
            if n_cand
            else np.zeros(0, dtype=np.int64)
        )
        # maximal-munch NMS: scan left-to-right, at each accepted column pick
        # the widest exact-scoring template and skip its extent.  Candidates
        # failing the static gate either get rescued by the page's adapted
        # templates or are reported in dropped_xs.
        # events hold (col, payload): payload = candidate index into
        # vec_all (the common static-accept path, no per-event copy), or a
        # dense class vector (adaptive/soft/chop events), or None (space)
        events: list[tuple[int, object]] = []
        explained = np.zeros(W, dtype=bool)  # columns an event accounts for
        dropped: list[int] = []
        taken_until = -1
        cand_l = cand_xs.tolist()
        keep_l = keep.tolist()
        widest_l = widest_exact.tolist()
        codes_l = best_codes.tolist() if n_cand else []
        for ci in range(n_cand):
            x = cand_l[ci]
            if x <= taken_until:
                continue
            if not keep_l[ci]:
                if adapted is not None:
                    hit = adapted.match(strip, x)
                    if hit is not None:
                        code, _frac, w = hit
                        vec = np.zeros(self.n_classes, dtype=np.float32)
                        vec[code] = K_ADAPT_ACCEPT_SCORE
                        events.append((x, vec))
                        explained[x : x + w] = True
                        taken_until = x + w - 1
                        continue
                if soft:
                    # near-miss statics become a dict-arbitrated event:
                    # every code above K_SOFT_GATE gets SOFT_EVENT_SCORE,
                    # blank still wins greedily (char drops without a
                    # dictionary), but a DAWG continuation can flip it
                    col = vec_all[: self.space_code, ci]
                    ok = col >= K_SOFT_GATE
                    if ok.any():
                        vec = np.zeros(self.n_classes, dtype=np.float32)
                        vec[: self.space_code][ok] = SOFT_EVENT_SCORE
                        qual = np.where(ok, col, -1.0)
                        best_w = int(
                            self.width_by_code[int(np.argmax(qual))]
                        )
                        events.append((x, vec))
                        explained[x : x + best_w] = True
                        taken_until = x + best_w - 1
                        dropped.append(x)
                        continue
                elif best_frac[ci] >= K_DEGRADED_ACCEPT:
                    # degraded-glyph fallback: with neither a dictionary
                    # (soft events) nor adapted templates to arbitrate,
                    # a NEAR-exact static match still elects its best
                    # class at minimal winning confidence — the
                    # reference's static classifier always answers and
                    # defers rejection to document quality
                    # (AdaptiveClassifier, adaptmatch.cpp:202-234; found
                    # by the round-4 three-column fuzzer: a separator
                    # overhanging a text row clips the glyph tops that
                    # are collinear with it, and the clipped '3' read
                    # 0.89 — dropped by the 0.9 exact gate, recoverable
                    # by its unambiguous best class).
                    code = codes_l[ci]
                    vec = np.zeros(self.n_classes, dtype=np.float32)
                    vec[code] = BLANK_SCORE + 0.001
                    best_w = int(self.width_by_code[code])
                    events.append((x, vec))
                    explained[x : x + best_w] = True
                    taken_until = x + best_w - 1
                    dropped.append(x)
                    continue
                dropped.append(x)
                continue
            best_w = widest_l[ci] or int(self.width_by_code[codes_l[ci]])
            events.append((x, ci))
            explained[x : x + best_w] = True
            taken_until = x + best_w - 1
        # ---- chop pass (the legacy engine's chop-and-search slice) ------
        # An ink run with unexplained columns is the joined-blob case:
        # maximal munch either matched a prefix glyph and never saw the
        # touching neighbour (its start column has an inked left
        # neighbour, so it is not a candidate) or matched nothing.
        # chop_word_main (chopper.cpp:385) + SegSearch (segsearch.cpp:33)
        # re-segment such runs against the static bank; an accepted
        # segmentation replaces the run's events.
        if n_cand and not explained[col_has_ink].all():
            run_starts = np.flatnonzero(
                col_has_ink & np.r_[True, ~col_has_ink[:-1]]
            )
            run_ends = np.flatnonzero(
                col_has_ink & np.r_[~col_has_ink[1:], True]
            )
            for rl, rr in zip(run_starts, run_ends + 1):
                if explained[rl:rr].all():
                    continue
                chopped = self.chop_run(strip, int(rl), int(rr))
                if chopped is None:
                    continue
                events = [(c, v) for c, v in events if not rl <= c < rr]
                dropped = [d for d in dropped if not rl <= d < rr]
                for x, code, frac, w in chopped:
                    vec = np.zeros(self.n_classes, dtype=np.float32)
                    vec[code] = max(frac, BLANK_SCORE + 0.001)
                    events.append((x, vec))
                    explained[x : x + w] = True
                events.sort(key=lambda e: e[0])
        # word gaps: runs of empty columns of length >= space_px between ink
        # are definite spaces; runs in [fuzzy_px, space_px) are fuzzy spaces
        gap_cols: list[int] = []
        fuzzy_cols: set[int] = set()
        lo_px = space_px if fuzzy_px is None else min(fuzzy_px, space_px)
        ink_idx = np.flatnonzero(col_has_ink)
        if len(ink_idx) > 1:
            # blank runs between consecutive ink columns, in one pass
            runs = np.diff(ink_idx) - 1
            for start, run in zip(
                (ink_idx[:-1] + 1)[runs >= lo_px].tolist(),
                runs[runs >= lo_px].tolist(),
            ):
                gap_cols.append(start)
                if run < space_px:
                    fuzzy_cols.add(start)
        # merge events in column order; insert a blank timestep between all
        merged = sorted(
            [(c, v) for c, v in events]
            + [(c, None) for c in gap_cols]  # None marks a space event
        , key=lambda e: e[0])
        n_ev = len(merged)
        T = 2 * n_ev + 1
        logits = np.zeros((T, self.n_classes), dtype=np.float32)
        logits[:, self.blank] = ALPHA * BLANK_SCORE
        col_of_t = np.zeros(T, dtype=np.int64)
        fuzzy_ts: set[int] = set()
        if n_ev:
            # grouped by payload kind so the common static-accept path is
            # one gather from vec_all instead of a per-event slice write
            cols = np.fromiter((c for c, _v in merged), np.int64, n_ev)
            ts = 2 * np.arange(n_ev, dtype=np.int64) + 1
            col_of_t[ts] = cols
            col_of_t[ts[1:] - 1] = cols[1:] - 1
            col_of_t[-1] = cols[-1] + 1
            sp_i = [i for i, (_c, v) in enumerate(merged) if v is None]
            ci_i = [i for i, (_c, v) in enumerate(merged) if isinstance(v, int)]
            if sp_i:
                logits[ts[sp_i], self.space_code] = ALPHA * 1.0
                if fuzzy_cols:
                    fuzzy_ts = {
                        2 * i + 1 for i in sp_i if merged[i][0] in fuzzy_cols
                    }
            if ci_i:
                vs = [merged[i][1] for i in ci_i]
                logits[ts[ci_i], : self.space_code] = (
                    ALPHA * vec_all[: self.space_code, vs]
                ).T
            for i, (_c, v) in enumerate(merged):
                if v is not None and not isinstance(v, int):
                    logits[2 * i + 1, : self.space_code] = (
                        ALPHA * v[: self.space_code]
                    )
        # log-softmax
        m = logits.max(axis=1, keepdims=True)
        e = np.exp(logits - m)
        log_probs = (logits - m) - np.log(e.sum(axis=1, keepdims=True))
        return (
            log_probs,
            col_of_t,
            frozenset(fuzzy_ts),
            np.asarray(dropped, dtype=np.int64),
        )


_NET: TemplateNet | None = None


def get_net() -> TemplateNet:
    """Executor-side singleton (one per python worker, like the reference's
    per-process Tesseract instance / DawgCache, src/dict/dawg_cache.cpp)."""
    global _NET
    if _NET is None:
        _NET = TemplateNet()
    return _NET


_NET_FONTS: TemplateNet | None = None


def get_net_fonts() -> TemplateNet:
    """Template net with bold + italic font variants — the multi-font
    prototype bank a font-trained inttemp carries, enabling
    WordFontAttributes-style attribution.  Opt-in (font_attrs=True in
    the page paths): the variant bank triples template-match cost, so
    the flagship single-font path keeps the plain net."""
    global _NET_FONTS
    if _NET_FONTS is None:
        from ..functions.fonts import (
            get_font_bold,
            get_font_italic,
            get_font_smallcaps,
        )

        _NET_FONTS = TemplateNet(
            CHARSET,
            extra_fonts={
                "bold": get_font_bold(),
                "italic": get_font_italic(),
                "smallcaps": get_font_smallcaps(),
            },
        )
    return _NET_FONTS


_NET_RTL: TemplateNet | None = None


def get_net_rtl() -> TemplateNet:
    """Template net extended with the RTL fixture alphabet (the 'heb'
    traineddata analogue of layout_test.cc:214 — a different language pack
    is a different charset + templates, same engine)."""
    global _NET_RTL
    if _NET_RTL is None:
        from ..functions.fonts import RTL_CHARSET

        _NET_RTL = TemplateNet(CHARSET + RTL_CHARSET)
    return _NET_RTL


_NET_DEVA: TemplateNet | None = None


def get_net_deva() -> TemplateNet:
    """Template net extended with the Devanagari fixture alphabet (the
    'hin'/'san' traineddata analogue).  Cells arriving here must already
    be shiro-rekha-split (analyze_page deva_split=True) — each cell then
    carries its own stretch of the bar, the exact shape of the font
    glyph, as devanagari_processing.cpp:311-315 prescribes."""
    global _NET_DEVA
    if _NET_DEVA is None:
        from ..functions.fonts import DEVA_CHARSET

        _NET_DEVA = TemplateNet(CHARSET + DEVA_CHARSET)
    return _NET_DEVA


_NET_MATH: TemplateNet | None = None


def get_net_math() -> TemplateNet:
    """Template net extended with the math fixture alphabet (the 'equ'
    language pack of EquationDetect, equationdetect.cpp:97-112)."""
    global _NET_MATH
    if _NET_MATH is None:
        from ..functions.fonts import MATH_CHARSET

        _NET_MATH = TemplateNet(CHARSET + MATH_CHARSET)
    return _NET_MATH
