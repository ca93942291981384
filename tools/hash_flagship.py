"""Hash the single-process flagship output for output-identity A/B checks.

Runs recognize_page over N flagship-distribution pages (same loader as
profile_flagship) and prints one sha256 over every span's
(kind, text, confidence, n_lines, n_words) — byte-identity evidence for
performance-only changes.
"""

from __future__ import annotations

import hashlib
import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from tools.profile_flagship import load_pages

    from tesseract_spark.lstm.templates import get_net
    from tesseract_spark.operators.recognize import recognize_page

    pages = load_pages(n_pages, sf_dir)
    net = get_net()
    h = hashlib.sha256()
    for p in pages:
        spans, _layout = recognize_page(p.image, 300, None, net)
        for s in spans:
            h.update(
                f"{s.kind}|{s.text}|{s.confidence:.6f}|{s.n_lines}|{s.n_words}\n".encode()
            )
    print(f"{len(pages)} pages sha256={h.hexdigest()}")


if __name__ == "__main__":
    main()
