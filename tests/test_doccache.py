"""Port of unittest/imagedata_test.cc: DocumentData/DocumentCache
caching under limited memory."""

import pytest

from tesseract_spark.lstm.doccache import (
    CS_ROUND_ROBIN,
    CS_SEQUENTIAL,
    DocumentCache,
    DocumentData,
)
from tesseract_spark.lstm.lstmf import ImageSample

K_IMAGE_SIZE = 1048576  # imagedata_test.cc:36


def make_fake_doc(tmp_path, num_pages: int, doc_id: int) -> tuple[str, list[str]]:
    """MakeFakeDoc (imagedata_test.cc:33-57): zero-filled fake images,
    per-page truth text."""
    fake_image = bytes(K_IMAGE_SIZE)
    doc = DocumentData("My document")
    page_texts = []
    for p in range(num_pages):
        text = f"Page {p} of {num_pages} in doc {doc_id}"
        page_texts.append(text)
        sample = ImageSample(
            imagefilename="noname",
            page_number=p,
            image_png=fake_image,
            language="eng",
            transcription=text,
        )
        assert len(sample.image_png) == K_IMAGE_SIZE
        doc.add_page(sample)
    filename = str(tmp_path / f"documentdata{doc_id}.lstmf")
    doc.save(filename)
    return filename, page_texts


def test_caches_properly(tmp_path):
    """imagedata_test.cc:60-87 CachesProperly."""
    k_num_pages = 12
    # Allowances big enough for roughly 1, 3, 0, all pages.
    k_memory_allowances = [2000000, 4000000, 1000000, 100000000]
    k_page_read_order = [0, 1, 2, 3, 8, 4, 5, 6, 7, 11, 10, 9]
    filename, page_texts = make_fake_doc(tmp_path, k_num_pages, 0)
    for allowance in k_memory_allowances:
        read_doc = DocumentData("My document")
        assert read_doc.load_document(filename, 0, allowance)
        for page in k_page_read_order:
            sample = read_doc.get_page(page)
            assert sample is not None
            assert sample.transcription == page_texts[page]


def test_caches_multi_docs(tmp_path):
    """imagedata_test.cc:90-125 CachesMultiDocs: both strategies
    return pages in their documented order."""
    k_num_pages = [6, 5, 7]
    page_texts = []
    filenames = []
    for d, n in enumerate(k_num_pages):
        filename, texts = make_fake_doc(tmp_path, n, d)
        filenames.append(filename)
        page_texts.append(texts)
    robin_cache = DocumentCache(8000000)
    assert robin_cache.load_documents(filenames, CS_ROUND_ROBIN)
    serial_cache = DocumentCache(8000000)
    assert serial_cache.load_documents(filenames, CS_SEQUENTIAL)
    for p in range(22):
        robin_data = robin_cache.get_page_by_serial(p)
        serial_data = serial_cache.get_page_by_serial(p)
        assert robin_data is not None
        assert serial_data is not None
        robin_doc = p % len(k_num_pages)
        robin_page = p // len(k_num_pages) % k_num_pages[robin_doc]
        assert robin_data.transcription == page_texts[robin_doc][robin_page]
        serial_doc = p // k_num_pages[0] % len(k_num_pages)
        serial_page = p % k_num_pages[0] % k_num_pages[serial_doc]
        assert serial_data.transcription == page_texts[serial_doc][serial_page]


def test_memory_window_is_bounded(tmp_path):
    """The point of the cache: a small allowance keeps only a window
    resident, and seeks outside the window re-read the file."""
    filename, page_texts = make_fake_doc(tmp_path, 12, 7)
    doc = DocumentData("doc")
    assert doc.load_document(filename, 0, 2000000)
    assert doc.num_pages() == 12
    # Window holds far fewer than all pages under a 2 MB allowance.
    assert len(doc.pages) < 12
    assert doc.memory_used <= 3 * K_IMAGE_SIZE
    # A seek to the back still reads correctly.
    assert doc.get_page(11).transcription == page_texts[11]
    # Uncache frees everything but keeps the name.
    saved = doc.uncache()
    assert saved > 0 and doc.memory_used == 0 and not doc.is_cached()
    assert doc.get_page(3).transcription == page_texts[3]


def test_missing_file_fails():
    doc = DocumentData("nope")
    assert not doc.load_document("/nonexistent/file.lstmf", 0, 0)
    assert doc.get_page(0) is None
