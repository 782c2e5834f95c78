"""Pure numpy/pandas kernels, Spark-free.

These implement the pixel-level semantics of the reference's OCR path
(decode -> preprocess -> recognize, /root/reference
src/ffmpeg/decoder.cpp + src/recognition/provider/tesseract.cpp) as
deterministic functions. They are shared verbatim by the Spark UDFs and by
the pandas test oracle, so Spark-vs-oracle comparisons test the *plumbing*
(partitioning, batching, merge order), not two divergent algorithms.
"""
