"""Classification-category error counting for trainer evaluation.

Port of ErrorCounter (src/training/common/errorcounter.{h,cpp}) with
the shape-to-unichar result expansion of
ShapeClassifier::UnicharClassifySample (src/classify/
shapeclassifier.cpp:41-53, shapetable.cpp:716-750) and the font
property checks (src/ccstruct/fontinfo.cpp:67-92), at the granularity
unittest/mastertrainer_test.cc ErrorCounterTest pins: top-1/top-2/
top-n/top-top error ranks with the 1/32 rating epsilon, multi-unichar
and multi-font counts, rejects, junk accounting, and the
tab-separated report row.

In the Spark engine this is the evaluation reducer for the
distributed trainer: each task counts its shard's categories into a
Counts array and the arrays sum associatively across partitions (a
plain struct aggregation), so the whole report is one map-side
combine — no per-sample data leaves the executor.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# CountTypes (errorcounter.h:69-89)
CT_UNICHAR_TOP_OK = 0
CT_UNICHAR_TOP1_ERR = 1
CT_UNICHAR_TOP2_ERR = 2
CT_UNICHAR_TOPN_ERR = 3
CT_UNICHAR_TOPTOP_ERR = 4
CT_OK_MULTI_UNICHAR = 5
CT_OK_JOINED = 6
CT_OK_BROKEN = 7
CT_REJECT = 8
CT_FONT_ATTR_ERR = 9
CT_OK_MULTI_FONT = 10
CT_NUM_RESULTS = 11
CT_RANK = 12
CT_REJECTED_JUNK = 13
CT_ACCEPTED_JUNK = 14
CT_SIZE = 15

K_RATING_EPSILON = 1.0 / 32  # errorcounter.cpp:37

UNICHAR_SPACE, UNICHAR_JOINED, UNICHAR_BROKEN = 0, 1, 2


@dataclass
class ScoredFont:
    fontinfo_id: int
    score: int


@dataclass
class ShapeRating:
    shape_id: int
    rating: float
    joined: bool = False
    broken: bool = False


@dataclass
class UnicharRating:
    unichar_id: int
    rating: float
    fonts: list[ScoredFont] = field(default_factory=list)


@dataclass
class TrainingSample:
    class_id: int
    font_id: int
    weight: float = 1.0
    is_error: bool = False


class FontInfoTable:
    """fontinfo.cpp:67-92: per-font property words."""

    def __init__(self) -> None:
        self.names: list[str] = []
        self.properties: list[int] = []

    def add(self, name: str, properties: int) -> int:
        self.names.append(name)
        self.properties.append(properties)
        return len(self.names) - 1

    def get_font_info_id(self, name: str) -> int:
        try:
            return self.names.index(name)
        except ValueError:
            return -1

    def set_contains_font_properties(self, font_id: int, font_set: list[ScoredFont]) -> bool:
        props = self.properties[font_id]
        return any(self.properties[f.fontinfo_id] == props for f in font_set)

    def set_contains_multiple_font_properties(self, font_set: list[ScoredFont]) -> bool:
        if not font_set:
            return False
        first = self.properties[font_set[0].fontinfo_id]
        return any(self.properties[f.fontinfo_id] != first for f in font_set[1:])


def unichar_classify_sample(shape_table, shape_results: list[ShapeRating]) -> list[UnicharRating]:
    """UnicharClassifySample + AddShapeToResults: fan shape ratings
    out to unichar ratings in shape order, first (best) shape wins,
    fonts accumulated per unichar."""
    results: list[UnicharRating] = []
    unichar_map: dict[int, int] = {}

    def add_unichar(uid: int, rating: float) -> int:
        idx = unichar_map.get(uid, -1)
        if idx < 0:
            idx = len(results)
            results.append(UnicharRating(uid, rating))
            unichar_map[uid] = idx
        return idx

    for sr in shape_results:
        if sr.joined:
            add_unichar(UNICHAR_JOINED, sr.rating)
        if sr.broken:
            add_unichar(UNICHAR_BROKEN, sr.rating)
        shape = shape_table.get_shape(sr.shape_id)
        for uid, font_ids in shape.unichars.items():
            idx = add_unichar(uid, sr.rating)
            for font_id in sorted(font_ids):
                results[idx].fonts.append(
                    ScoredFont(font_id, int(sr.rating * 32767 + 0.5))
                )
    return results


class ErrorCounter:
    """errorcounter.cpp:160-330."""

    def __init__(self, has_special_codes: bool = True) -> None:
        self.counts = [0] * CT_SIZE
        self.rating_epsilon = K_RATING_EPSILON
        self.scaled_error = 0.0
        self.has_special_codes = has_special_codes

    def accumulate_errors(
        self,
        boosting_mode: int,
        font_table: FontInfoTable,
        results: list[UnicharRating],
        sample: TrainingSample,
    ) -> None:
        """AccumulateErrors (errorcounter.cpp:184-314)."""
        n = self.counts
        num_results = len(results)
        answer_actual_rank = -1
        font_id = sample.font_id
        unichar_id = sample.class_id
        sample.is_error = False
        if num_results == 0:
            sample.is_error = True
            n[CT_REJECT] += 1
            return
        # Rank of the correct answer under the rating epsilon.
        epsilon_rank = 0
        answer_epsilon_rank = -1
        num_top_answers = 0
        prev_rating = results[0].rating
        joined = broken = False
        for res_index, r in enumerate(results):
            if r.rating < prev_rating - self.rating_epsilon:
                epsilon_rank += 1
                prev_rating = r.rating
            if r.unichar_id == unichar_id and answer_epsilon_rank < 0:
                answer_epsilon_rank = epsilon_rank
                answer_actual_rank = res_index
            if r.unichar_id == UNICHAR_JOINED and self.has_special_codes:
                joined = True
            elif r.unichar_id == UNICHAR_BROKEN and self.has_special_codes:
                broken = True
            elif epsilon_rank == 0:
                num_top_answers += 1
        if answer_actual_rank != 0:
            n[CT_UNICHAR_TOPTOP_ERR] += 1
            if boosting_mode == CT_UNICHAR_TOPTOP_ERR:
                sample.is_error = True
        if answer_epsilon_rank == 0:
            n[CT_UNICHAR_TOP_OK] += 1
            if num_top_answers > 1:
                n[CT_OK_MULTI_UNICHAR] += 1
            if font_table.set_contains_font_properties(
                font_id, results[answer_actual_rank].fonts
            ):
                if font_table.set_contains_multiple_font_properties(
                    results[answer_actual_rank].fonts
                ):
                    n[CT_OK_MULTI_FONT] += 1
            else:
                n[CT_FONT_ATTR_ERR] += 1
        else:
            n[CT_UNICHAR_TOP1_ERR] += 1
            if boosting_mode == CT_UNICHAR_TOP1_ERR:
                sample.is_error = True
            if answer_epsilon_rank < 0 or answer_epsilon_rank >= 2:
                n[CT_UNICHAR_TOP2_ERR] += 1
                if boosting_mode == CT_UNICHAR_TOP2_ERR:
                    sample.is_error = True
            if answer_epsilon_rank < 0:
                n[CT_UNICHAR_TOPN_ERR] += 1
                if boosting_mode == CT_UNICHAR_TOPN_ERR:
                    sample.is_error = True
                answer_epsilon_rank = epsilon_rank
        n[CT_NUM_RESULTS] += num_results
        n[CT_RANK] += answer_epsilon_rank
        if joined:
            n[CT_OK_JOINED] += 1
        if broken:
            n[CT_OK_BROKEN] += 1
        if sample.is_error:
            self.scaled_error += sample.weight

    def accumulate_junk(self, results: list[UnicharRating], sample: TrainingSample) -> None:
        """AccumulateJunk (errorcounter.cpp:318-345): junk accepted if
        no answer or the explicit class id answer."""
        if results and results[0].unichar_id != sample.class_id:
            self.counts[CT_ACCEPTED_JUNK] += 1
            sample.is_error = True
            self.scaled_error += sample.weight
        else:
            self.counts[CT_REJECTED_JUNK] += 1
            sample.is_error = False

    def merge(self, other: "ErrorCounter") -> None:
        """The Spark reducer: Counts arrays sum associatively."""
        for i in range(CT_SIZE):
            self.counts[i] += other.counts[i]
        self.scaled_error += other.scaled_error

    def report_string(self) -> str:
        """ReportString (errorcounter.cpp:447-478): the human-readable
        rates followed by tab-separated raw counts."""
        rates = self.compute_rates()
        head = (
            f"Unichar={rates[CT_UNICHAR_TOP1_ERR] * 100:.4g}%[1], "
            f"{rates[CT_UNICHAR_TOP2_ERR] * 100:.4g}%[2], "
            f"{rates[CT_UNICHAR_TOPN_ERR] * 100:.4g}%[n], "
            f"{rates[CT_UNICHAR_TOPTOP_ERR] * 100:.4g}%[T] "
            f"Mult={rates[CT_OK_MULTI_UNICHAR] * 100:.4g}%, "
            f"Jn={rates[CT_OK_JOINED] * 100:.4g}%, "
            f"Brk={rates[CT_OK_BROKEN] * 100:.4g}%, "
            f"Rej={rates[CT_REJECT] * 100:.4g}%, "
            f"FontAttr={rates[CT_FONT_ATTR_ERR] * 100:.4g}%, "
            f"Multi={rates[CT_OK_MULTI_FONT] * 100:.4g}%, "
            f"Answers={rates[CT_NUM_RESULTS]:.3g}, "
            f"Rank={rates[CT_RANK]:.3g}, "
            f"OKjunk={100.0 * rates[CT_REJECTED_JUNK]:.4g}%, "
            f"Badjunk={100.0 * rates[CT_ACCEPTED_JUNK]:.4g}%"
        )
        return head + "".join(f"\t{c}" for c in self.counts)

    def compute_rates(self) -> list[float]:
        """ComputeRates (errorcounter.cpp:483-510)."""
        n = self.counts
        ok_samples = n[CT_UNICHAR_TOP_OK] + n[CT_UNICHAR_TOP1_ERR] + n[CT_REJECT]
        junk_samples = n[CT_REJECTED_JUNK] + n[CT_ACCEPTED_JUNK]
        rates = [0.0] * CT_SIZE
        for ct in range(CT_SIZE):
            denom = junk_samples if ct in (CT_REJECTED_JUNK, CT_ACCEPTED_JUNK) else ok_samples
            rates[ct] = n[ct] / denom if denom > 0 else 0.0
        return rates


def compute_error_rate(
    classifier,
    shape_table,
    font_table: FontInfoTable,
    samples: list[TrainingSample],
    boosting_mode: int = CT_UNICHAR_TOP1_ERR,
    has_special_codes: bool = True,
) -> tuple[ErrorCounter, str]:
    """ComputeErrorRate's sample walk (errorcounter.cpp:45-105):
    classify every sample, expand shapes to unichars, route junk
    (space/joined/broken) to the junk counter."""
    counter = ErrorCounter(has_special_codes)
    for sample in samples:
        shape_results = classifier(sample)
        results = unichar_classify_sample(shape_table, shape_results)
        if has_special_codes and sample.class_id in (
            UNICHAR_SPACE,
            UNICHAR_JOINED,
            UNICHAR_BROKEN,
        ):
            counter.accumulate_junk(results, sample)
        else:
            counter.accumulate_errors(boosting_mode, font_table, results, sample)
    return counter, counter.report_string()
