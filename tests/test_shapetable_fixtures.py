"""Shape / ShapeTable parity — unittest/shapetable_test.cc ported
verbatim (the 352 shape, AddShape merge semantics, and the FullTest
merge/master walk) against lstm/shapetable.py."""

from tesseract_spark.lstm.shapetable import Shape, ShapeTable


def setup_352(font_id: int, shape: Shape) -> None:
    shape.add(3, font_id)
    shape.add(5, font_id)
    shape.add(2, font_id)


def expect_352(font_id: int, shape: Shape) -> None:
    assert shape.size() == 3
    assert shape.contains_unichar(2)
    assert shape.contains_unichar(3)
    assert shape.contains_unichar(5)
    assert not shape.contains_unichar(1)
    assert shape.contains_unichar_and_font(2, font_id)
    assert not shape.contains_unichar_and_font(2, font_id - 1)
    assert not shape.contains_unichar_and_font(font_id, 2)
    assert shape.is_subset_of(shape)


def test_shape_basic_and_serialization():
    # shapetable_test.cc:61-91 BasicTest
    shape1 = Shape()
    assert shape1.size() == 0
    setup_352(101, shape1)
    expect_352(101, shape1)
    # survives serialization round-trip
    shape2 = Shape.deserialize(shape1.serialize())
    expect_352(101, shape2)
    assert shape1.is_subset_of(shape2) and shape2.is_subset_of(shape1)
    assert shape1.is_equal_unichars(shape2)
    expect_352(101, shape1)
    expect_352(101, shape2)


def test_add_shape():
    # shapetable_test.cc:94-124 AddShapeTest
    shape1 = Shape()
    setup_352(101, shape1)
    expect_352(101, shape1)
    shape2 = Shape()
    shape2.add(3, 101)  # duplicates shape1
    shape2.add(5, 110)  # different font to shape1
    shape2.add(7, 101)  # different unichar to shape1
    assert not shape1.is_subset_of(shape2)
    assert not shape2.is_subset_of(shape1)
    shape1.add_shape(shape2)
    assert not shape1.is_subset_of(shape2)
    assert shape2.is_subset_of(shape1)
    assert shape1.size() == 4
    assert not shape1.contains_unichar(1)
    assert shape1.contains_unichar_and_font(5, 101)
    assert shape1.contains_unichar_and_font(5, 110)
    assert not shape1.contains_unichar_and_font(3, 110)
    assert not shape1.contains_unichar_and_font(7, 110)
    assert not shape1.is_equal_unichars(shape2)


def test_shape_table_full():
    # shapetable_test.cc:130-180 FullTest
    shape1 = Shape()
    setup_352(101, shape1)
    st = ShapeTable()
    assert st.add_shape(3, 101) == 0
    assert st.add_shape(5, 101) == 1
    assert st.add_shape(2, 101) == 2
    assert st.num_shapes() == 3
    expect_352(101, shape1)
    assert st.add_whole_shape(shape1) == 3
    for i in range(3):
        assert not st.shapes[i].is_equal_unichars(shape1)
    assert st.shapes[3].is_equal_unichars(shape1)
    assert st.any_multiple_unichars()
    st.delete_shape(3)
    assert not st.any_multiple_unichars()

    # merge back into a single shape like shape1
    assert st.master_unichar_count(0) == 1
    st.merge_shapes(0, 1)
    assert st.merged_unichar_count(1, 2) == 3
    st.merge_shapes(1, 2)
    for i in range(3):
        assert st.master_unichar_count(i) == 3
        # master font count sums the per-unichar font lists
        assert st.master_font_count(i) == 3
    assert st.master_destination_index(1) == 0
    assert st.master_destination_index(2) == 0
    st2 = ShapeTable()
    st2.append_master_shapes(st)
    assert st.num_master_shapes() == 1
    assert st2.num_shapes() == 1
    assert st2.shapes[0].is_equal_unichars(shape1)
    assert st2.any_multiple_unichars()
