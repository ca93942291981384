"""tesseract_spark — a brand-new PySpark-native OCR/extraction engine.

Re-expresses the *capabilities* of tesseract-ocr/tesseract (reference at
/root/reference, v5.5.3 — see SURVEY.md) as an idiomatic Spark pipeline:

- input: a table of interleaved text+media documents
  ``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``
- media spans are decoded, binarized (Otsu / adaptive / Sauvola), connected-
  component labeled, layout-analyzed (rows, baselines, words, blocks,
  paragraphs), recognized (batched template/LSTM scoring + CTC beam search
  with DAWG dictionary rescoring), and stitched back into ordered span
  sequences matching the reference under span-sequence equality
  ``(kind, text, media_ref, order)``.

All per-image imperative code lives in vectorized pandas/Arrow UDFs
(``mapInPandas`` / ``applyInPandas``); no per-row Python at the Spark level.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-export of the reference-API facade (keeps `import
    # tesseract_spark` light for executors that never touch it)
    if name in ("TessBaseAPI", "ResultIterator"):
        from . import api

        return getattr(api, name)
    raise AttributeError(name)
