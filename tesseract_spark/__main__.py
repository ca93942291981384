"""``python -m tesseract_spark`` — the tesseract CLI entry point
(src/tesseract.cpp main)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
