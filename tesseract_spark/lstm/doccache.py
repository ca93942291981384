"""Memory-capped training-sample cache over .lstmf documents.

Port of the DocumentData / DocumentCache caching layer
(src/ccstruct/imagedata.cpp:380-790, fixtures in
unittest/imagedata_test.cc): a DocumentData holds one .lstmf file and
keeps only the window of pages that fits its memory allowance,
re-reading the file when a page outside the window is requested; a
DocumentCache spreads an overall budget across documents with two
strategies — CS_ROUND_ROBIN (each document restricted to its fair
share; pages drawn cyclically across documents) and CS_SEQUENTIAL
(whole documents held, least-recently-needed ones evicted).

This is the executor-side sample feeder for distributed fine-tuning
(lstm/training.py): each Spark task walks its shard of .lstmf files
through a DocumentCache so the per-task resident set stays bounded no
matter how large the shard is. The reference's background-loader
thread becomes a synchronous prefetch — Spark tasks are already the
parallelism layer, so a second thread per task buys nothing.
"""

from __future__ import annotations

import os

from .lstmf import ImageSample, read_lstmf, write_lstmf

# imagedata.cpp:43 — documents to read ahead while training.
K_MAX_READ_AHEAD = 8

CS_SEQUENTIAL = 0
CS_ROUND_ROBIN = 1


def _memory_used(sample: ImageSample) -> int:
    """ImageData::MemoryUsed (imagedata.cpp:269-271)."""
    return len(sample.image_png)


class DocumentData:
    """One .lstmf document with a memory-capped page window
    (imagedata.cpp:380-640)."""

    def __init__(self, name: str) -> None:
        self.document_name = name
        self.pages: list[ImageSample] = []
        self.pages_offset = -1
        self.total_pages = -1
        self.memory_used = 0
        self.max_memory = 0
        self._reader = None

    # -- building / saving (imagedata_test.cc MakeFakeDoc path) ------
    def add_page(self, page: ImageSample) -> None:
        """AddPageToDocument (imagedata.cpp:434-438)."""
        self.pages.append(page)
        self.memory_used += _memory_used(page)
        if self.total_pages < 0:
            self.total_pages = 0
        self.total_pages += 1
        if self.pages_offset < 0:
            self.pages_offset = 0

    def save(self, filename: str) -> None:
        """SaveDocument (imagedata.cpp:422-431)."""
        with open(filename, "wb") as f:
            f.write(write_lstmf(self.pages))

    # -- loading ------------------------------------------------------
    def set_document(self, filename: str, max_memory: int, reader=None) -> None:
        """SetDocument (imagedata.cpp:412-418): metadata only, no read."""
        self.document_name = filename
        self.pages_offset = -1
        self.total_pages = -1
        self.max_memory = max_memory
        self._reader = reader

    def load_document(self, filename: str, start_page: int, max_memory: int, reader=None) -> bool:
        """LoadDocument (imagedata.cpp:403-410)."""
        self.set_document(filename, max_memory, reader)
        self.pages_offset = start_page
        return self._recache_pages()

    def num_pages(self) -> int:
        return self.total_pages

    def is_cached(self) -> bool:
        return self.num_pages() >= 0

    def uncache(self) -> int:
        """UnCache (imagedata.cpp:507-521): drop pages, keep metadata."""
        saved = self.memory_used
        self.pages = []
        self.pages_offset = -1
        self.total_pages = -1
        self.memory_used = 0
        return saved

    def _is_page_available(self, index: int) -> ImageSample | None | bool:
        """IsPageAvailable (imagedata.cpp:488-504). Returns the page,
        True for an empty document, or False when a (re)load is needed."""
        num_pages = self.num_pages()
        if num_pages == 0 or index < 0:
            return True
        if num_pages > 0:
            index = index % num_pages
            if self.pages_offset <= index < self.pages_offset + len(self.pages):
                return self.pages[index - self.pages_offset]
        return False

    def load_page_in_background(self, index: int) -> None:
        """LoadPageInBackground (imagedata.cpp:442-464), synchronous:
        Spark tasks are the parallelism layer already."""
        avail = self._is_page_available(index)
        if avail is not False:
            return
        if self.pages_offset == index:
            return
        self.pages_offset = index
        self.pages = []
        self._recache_pages()

    def get_page(self, index: int) -> ImageSample | None:
        """GetPage (imagedata.cpp:468-482): index modulo total pages."""
        while True:
            avail = self._is_page_available(index)
            if avail is True:
                return None
            if avail is not False:
                return avail
            if self.pages_offset != index:
                self.load_page_in_background(index)
            else:
                # Synchronous world: same offset but unavailable means
                # the load failed; retry once then give up.
                if not self._recache_pages():
                    return None

    def _read_blob(self) -> bytes | None:
        if self._reader is not None:
            return self._reader(self.document_name)
        if not os.path.exists(self.document_name):
            return None
        with open(self.document_name, "rb") as f:
            return f.read()

    def _recache_pages(self) -> bool:
        """ReCachePages (imagedata.cpp:541-640): skip pages before
        pages_offset, load until the memory allowance is exceeded,
        skip the rest."""
        self.total_pages = 0
        self.memory_used = 0
        self.pages = []
        blob = self._read_blob()
        if blob is None:
            return False
        try:
            all_pages = read_lstmf(blob)
        except ValueError:
            return False
        loaded_pages = len(all_pages)
        if loaded_pages <= 0:
            return False
        self.pages_offset %= loaded_pages
        for page_idx, sample in enumerate(all_pages):
            if page_idx < self.pages_offset or (
                self.max_memory > 0 and self.memory_used > self.max_memory
            ):
                continue  # SkipDeSerialize
            self.pages.append(sample)
            if not sample.imagefilename:
                sample.imagefilename = self.document_name
                sample.page_number = page_idx
            self.memory_used += _memory_used(sample)
        self.total_pages = loaded_pages
        return bool(self.pages)


class DocumentCache:
    """Budgeted collection of DocumentData (imagedata.cpp:643-790)."""

    def __init__(self, max_memory: int) -> None:
        self.max_memory = max_memory
        self.documents: list[DocumentData] = []
        self.cache_strategy = CS_SEQUENTIAL
        self.num_pages_per_doc = 0

    def load_documents(self, filenames: list[str], cache_strategy: int, reader=None) -> bool:
        """LoadDocuments (imagedata.cpp:652-677): round-robin gives
        each document its fair share; sequential lets the cache evict
        whole documents."""
        self.cache_strategy = cache_strategy
        fair_share_memory = 0
        if cache_strategy == CS_ROUND_ROBIN:
            fair_share_memory = self.max_memory // len(filenames)
        for filename in filenames:
            doc = DocumentData(filename)
            doc.set_document(filename, fair_share_memory, reader)
            self.documents.append(doc)
        if self.documents:
            return self.get_page_by_serial(0) is not None
        return False

    def find_document(self, name: str) -> DocumentData | None:
        for doc in self.documents:
            if doc.document_name == name:
                return doc
        return None

    def total_pages(self) -> int:
        """TotalPages (imagedata.cpp:694-703)."""
        if self.cache_strategy == CS_SEQUENTIAL:
            if self.num_pages_per_doc == 0:
                self.get_page_sequential(0)
            return self.num_pages_per_doc * len(self.documents)
        total = 0
        for doc in self.documents:
            doc.get_page(0)
            total += doc.num_pages()
        return total

    def get_page_by_serial(self, serial: int) -> ImageSample | None:
        if self.cache_strategy == CS_SEQUENTIAL:
            return self.get_page_sequential(serial)
        return self.get_page_round_robin(serial)

    def get_page_round_robin(self, serial: int) -> ImageSample | None:
        """GetPageRoundRobin (imagedata.cpp:708-718)."""
        num_docs = len(self.documents)
        doc_index = serial % num_docs
        page = self.documents[doc_index].get_page(serial // num_docs)
        for offset in range(1, min(K_MAX_READ_AHEAD, num_docs - 1) + 1):
            idx = (serial + offset) % num_docs
            self.documents[idx].load_page_in_background((serial + offset) // num_docs)
        return page

    def get_page_sequential(self, serial: int) -> ImageSample | None:
        """GetPageSequential (imagedata.cpp:723-776) with the
        neighbour-hole eviction heuristics."""
        num_docs = len(self.documents)
        assert num_docs > 0
        if self.num_pages_per_doc == 0:
            self.documents[0].get_page(0)
            self.num_pages_per_doc = self.documents[0].num_pages()
            assert self.num_pages_per_doc > 0, "First document cannot be empty"
            if serial // self.num_pages_per_doc % num_docs > 0:
                self.documents[0].uncache()
        doc_index = serial // self.num_pages_per_doc % num_docs
        page = self.documents[doc_index].get_page(serial % self.num_pages_per_doc)
        total_memory = sum(doc.memory_used for doc in self.documents)
        if total_memory >= self.max_memory:
            num_in_front = self._count_neighbour_docs(doc_index, 1)
            offset = num_in_front - 2
            while offset > 1 and total_memory >= self.max_memory:
                next_index = (doc_index + offset) % num_docs
                total_memory -= self.documents[next_index].uncache()
                offset -= 1
            num_behind = self._count_neighbour_docs(doc_index, -1)
            offset = num_behind
            while offset < 0 and total_memory >= self.max_memory:
                next_index = (doc_index + offset + num_docs) % num_docs
                total_memory -= self.documents[next_index].uncache()
                offset += 1
        next_index = (doc_index + 1) % num_docs
        if not self.documents[next_index].is_cached() and total_memory < self.max_memory:
            self.documents[next_index].load_page_in_background(0)
        return page

    def _count_neighbour_docs(self, index: int, direction: int) -> int:
        """CountNeighbourDocs (imagedata.cpp:780-789)."""
        num_docs = len(self.documents)
        offset = direction
        while abs(offset) < num_docs:
            offset_index = (index + offset + num_docs) % num_docs
            if not self.documents[offset_index].is_cached():
                return offset - direction
            offset += direction
        return num_docs
