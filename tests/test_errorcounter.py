"""Port of unittest/mastertrainer_test.cc ErrorCounterTest: the
MockClassifier's engineered error pattern must land in exactly the
right report columns."""

from tesseract_spark.lstm.errorcounter import (
    CT_ACCEPTED_JUNK,
    CT_FONT_ATTR_ERR,
    CT_NUM_RESULTS,
    CT_OK_MULTI_UNICHAR,
    CT_REJECT,
    CT_REJECTED_JUNK,
    CT_SIZE,
    CT_UNICHAR_TOP1_ERR,
    CT_UNICHAR_TOP2_ERR,
    CT_UNICHAR_TOPN_ERR,
    CT_UNICHAR_TOP_OK,
    CT_UNICHAR_TOPTOP_ERR,
    ErrorCounter,
    FontInfoTable,
    ShapeRating,
    TrainingSample,
    UnicharRating,
    compute_error_rate,
)
from tesseract_spark.lstm.shapetable import ShapeTable

# Specs of the MockClassifier (mastertrainer_test.cc:41-50).
K_NUM_TOPN_ERRS = 10
K_NUM_TOP2_ERRS = K_NUM_TOPN_ERRS + 20
K_NUM_TOP1_ERRS = K_NUM_TOP2_ERRS + 30
K_NUM_TOPTOP_ERRS = K_NUM_TOP1_ERRS + 25
K_NUM_NON_REJECT = 1000
K_NUM_CORRECT = K_NUM_NON_REJECT - K_NUM_TOP1_ERRS
K_NUM_ANSWERS = (
    K_NUM_NON_REJECT
    + 2 * (K_NUM_TOP2_ERRS - K_NUM_TOPN_ERRS)
    + (K_NUM_TOP1_ERRS - K_NUM_TOP2_ERRS)
    + (K_NUM_TOPTOP_ERRS - K_NUM_TOP1_ERRS)
)

FALSE_UNICHAR_ID = 67  # mastertrainer_test.cc:69
FALSE_FONT_ID = 25


class MockClassifier:
    """mastertrainer_test.cc:61-139: cheats by looking at the correct
    answer and produces a specific error pattern."""

    def __init__(self, shape_table: ShapeTable) -> None:
        self.shape_table = shape_table
        self.num_done = 0
        self.done_bad_font = False
        self.false_shape = shape_table.add_shape(FALSE_UNICHAR_ID, FALSE_FONT_ID)

    def __call__(self, sample: TrainingSample) -> list[ShapeRating]:
        self.num_done += 1
        if self.num_done > K_NUM_NON_REJECT:
            return []
        shape_id = self.shape_table.find_shape(sample.class_id, sample.font_id)
        wrong_id1 = shape_id - 1 if shape_id > 10 else shape_id + 1
        wrong_id2 = shape_id - 2 if shape_id > 10 else shape_id + 2
        if self.num_done <= K_NUM_TOPN_ERRS:
            return [ShapeRating(wrong_id1, 1.0)]
        if self.num_done <= K_NUM_TOP2_ERRS:
            return [
                ShapeRating(wrong_id1, 1.0),
                ShapeRating(wrong_id2, 0.875),
                ShapeRating(shape_id, 0.75),
            ]
        if self.num_done <= K_NUM_TOP1_ERRS:
            return [ShapeRating(wrong_id1, 1.0), ShapeRating(shape_id, 0.8)]
        if self.num_done <= K_NUM_TOPTOP_ERRS:
            # Top is wrong but within the rating epsilon of correct.
            return [ShapeRating(wrong_id1, 1.0), ShapeRating(shape_id, 0.99)]
        if not self.done_bad_font and sample.class_id == FALSE_UNICHAR_ID:
            self.done_bad_font = True
            return [ShapeRating(self.false_shape, 1.0)]
        return [ShapeRating(shape_id, 1.0)]


def build_fixture():
    """The master-trainer stand-in: one shape per class id over font 0,
    a font table where only the false font's properties differ, and
    1100 samples (the last 100 become rejects)."""
    shape_table = ShapeTable()
    class_ids = list(range(3, 80))
    for cid in class_ids:
        shape_table.add_shape(cid, 0)
    font_table = FontInfoTable()
    for f in range(26):
        font_table.add(f"font{f}", 1 if f == FALSE_FONT_ID else 0)
    samples = [
        TrainingSample(class_ids[i % len(class_ids)], 0) for i in range(1100)
    ]
    return shape_table, font_table, samples


def test_error_counter():
    """mastertrainer_test.cc:247-290 ErrorCounterTest."""
    shape_table, font_table, samples = build_fixture()
    # Add the space character to count junk (test line 256-258).
    if shape_table.find_shape(0, -1) < 0:
        shape_table.add_shape(0, 0)
    classifier = MockClassifier(shape_table)
    counter, report = compute_error_rate(
        classifier, shape_table, font_table, samples, CT_UNICHAR_TOP1_ERR
    )
    results = report.split("\t")
    assert len(results) == CT_SIZE + 1
    values = [int(v) for v in results[1:]]
    num_samples = len(samples)
    assert values[CT_UNICHAR_TOP_OK] == K_NUM_CORRECT
    assert values[CT_FONT_ATTR_ERR] == 1
    assert values[CT_UNICHAR_TOPTOP_ERR] == K_NUM_TOPTOP_ERRS
    assert values[CT_UNICHAR_TOP1_ERR] == K_NUM_TOP1_ERRS
    assert values[CT_UNICHAR_TOP2_ERR] == K_NUM_TOP2_ERRS
    assert values[CT_UNICHAR_TOPN_ERR] == K_NUM_TOPN_ERRS
    # Each TOPTOP err also counts as a multi-unichar.
    assert values[CT_OK_MULTI_UNICHAR] == K_NUM_TOPTOP_ERRS - K_NUM_TOP1_ERRS
    assert values[CT_REJECT] == num_samples - K_NUM_NON_REJECT
    assert values[CT_NUM_RESULTS] == K_NUM_ANSWERS


def test_junk_accounting():
    """AccumulateJunk (errorcounter.cpp:318-345): junk accepted only
    when classified as something other than itself."""
    counter = ErrorCounter()
    junk = TrainingSample(class_id=2, font_id=0)  # UNICHAR_BROKEN
    counter.accumulate_junk([], junk)  # no answer: correctly rejected
    counter.accumulate_junk([UnicharRating(2, 1.0)], junk)  # own id: ok
    counter.accumulate_junk([UnicharRating(40, 1.0)], junk)  # junk error
    assert counter.counts[CT_REJECTED_JUNK] == 2
    assert counter.counts[CT_ACCEPTED_JUNK] == 1


def test_merge_is_associative():
    """The Spark reducer contract: per-shard counters sum to the
    global one."""
    shape_table, font_table, samples = build_fixture()
    classifier = MockClassifier(shape_table)
    whole, _ = compute_error_rate(classifier, shape_table, font_table, samples)

    shape_table2, font_table2, samples2 = build_fixture()
    classifier2 = MockClassifier(shape_table2)
    # Shards must preserve sample order for the mock's counter, but
    # merging the two counters is order-free.
    a, _ = compute_error_rate(classifier2, shape_table2, font_table2, samples2[:700])
    b, _ = compute_error_rate(classifier2, shape_table2, font_table2, samples2[700:])
    b.merge(a)
    assert b.counts == whole.counts
