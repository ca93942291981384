"""Single-process flagship per-page profiler.

Renders N flagship-distribution pages (same chunk rule as derived.py) from
the real sf documents table and runs recognize_page on each, optionally
under cProfile.  Prints per-page ms and the top cumulative functions.

Usage:
  python tools/profile_flagship.py [N_PAGES] [--profile] [--repeat K]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_pages(n_pages: int, sf_dir: str):
    import pyarrow.parquet as pq

    from tesseract_spark.derived import WORDS_PER_PARA, chunk_page_spec
    from tesseract_spark.functions.compose import compose_page

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pages = []
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        words = (text or "").split(" ")
        n_chunks = (len(words) + WORDS_PER_PARA - 1) // WORDS_PER_PARA
        for i in range(n_chunks):
            if i % 3 == 0:
                continue  # text span
            chunk = " ".join(words[i * WORDS_PER_PARA : (i + 1) * WORDS_PER_PARA])
            spec = chunk_page_spec(int(doc_id), i, chunk)
            pages.append(compose_page(spec))
            if len(pages) >= n_pages:
                return pages
    return pages


def run(pages, repeat: int):
    from tesseract_spark.lstm.templates import get_net
    from tesseract_spark.operators.recognize import recognize_page

    net = get_net()
    best = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        for p in pages:
            recognize_page(p.image, 300, None, net)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200
    do_profile = "--profile" in sys.argv
    repeat = 3
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    pages = load_pages(n_pages, sf_dir)
    print(f"{len(pages)} pages loaded from {sf_dir}")
    # warmup (model build, numpy caches)
    run(pages[:8], 1)
    if do_profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run(pages, 1)
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(45)
    best = run(pages, repeat)
    print(f"best-of-{repeat}: {best*1000/len(pages):.2f} ms/page "
          f"({best:.2f} s / {len(pages)} pages)")


if __name__ == "__main__":
    main()
