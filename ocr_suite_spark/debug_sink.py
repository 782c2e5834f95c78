"""S12 — the debug bitmap sink.

The reference dumps intermediate recognition stages (gray/binarized frames)
as .bmp files while debugging the OCR path (/root/reference
src/recognition/bmp.cpp:52-87, provider/tesseract.cpp debug hooks). Spark
re-expression: a side-output ``foreachPartition`` over the media-span
metadata — each executor decodes, runs the requested stage, and writes one
real 8bpp BMP per span straight from the worker. Deliberately NOT routed
through the table-format seam: debug artifacts are files-for-humans, not a
table, and foreachPartition keeps the write distributed (no driver
collect) and out of the result plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_debug_bitmaps(
    media_meta: DataFrame, out_dir: str, stage: str = "binarized"
) -> None:
    """Write one BMP per media span under ``out_dir``.

    media_meta: (doc_id, offset, media_ref) — the pruned media projection
    from operators.extract.explode_media_meta. stage: 'gray' (decoded
    pixels) or 'binarized' (Otsu ink mask, the recognizer's first stage).
    """
    if stage not in ("gray", "binarized"):
        raise ValueError(f"unknown debug stage {stage!r}")
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        # worker-side imports: the kernels load once per executor process
        import numpy as np

        from .kernels import render
        from .kernels.ocr import binarize

        for r in rows:
            img = render.decode_image(render.resolve_media(r["media_ref"]))
            if stage == "binarized":
                img = np.where(binarize(img), 0, 255).astype(np.uint8)
            name = f"{r['doc_id']}_{int(r['offset']):06d}_{stage}.bmp"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(render.encode_bmp(img))

    media_meta.select("doc_id", "offset", "media_ref").foreachPartition(_write)
