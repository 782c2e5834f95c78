"""ocr_suite_spark — a from-scratch, PySpark-native reimplementation of the
capabilities of yowidin/ocr-suite (reference at /root/reference, read-only).

The reference is a C++ video-OCR pipeline (ffmpeg decode -> bounded queue ->
Tesseract OCR threads -> SQLite store + viewer queries). This package recasts
it as a web-scale extraction engine over an interleaved text+media documents
table:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Media spans are decoded, preprocessed (grayscale, Otsu binarization, deskew,
connected-component segmentation) and recognized inside vectorized
pandas/Arrow UDFs; text spans pass through a boilerplate-strip normalizer
(trim + min-length filter, mirroring /root/reference
src/recognition/provider/tesseract.cpp:111-115); results are re-merged by
offset to emit the exact (kind, text, media_ref, order) sequence.

Everything here is idiomatic Spark: declarative DataFrame plans optimized by
Catalyst/AQE, Arrow-batched UDFs only where built-ins cannot express the
semantics (the recognizer), no per-row Python UDFs, no driver-side loops.
"""

__version__ = "0.1.0"

MIN_TOKEN_LEN = 3  # reference: provider.h:26 min_letters_threshold_{3}
