"""Per-stage rate metering — the speed_meter analog.

The reference reports OCR/s and seek/s every 5 seconds from hand-rolled
counters (/root/reference src/recognition/speed_meter.cpp:35-58). Spark's
native equivalent is accumulators: python workers add per-batch decode and
recognize wall time inside the UDF, the driver snapshots after each action.
No extra columns, no extra jobs — observability rides along with the run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class Snapshot:
    n_images: int
    decode_s: float
    ocr_s: float
    wall_s: float

    @property
    def images_per_sec(self) -> float:
        return self.n_images / self.wall_s if self.wall_s > 0 else 0.0

    def as_dict(self) -> dict:
        return {
            "n_images": self.n_images,
            "decode_s": round(self.decode_s, 3),
            "ocr_s": round(self.ocr_s, 3),
            "wall_s": round(self.wall_s, 3),
            "images_per_sec": round(self.images_per_sec, 2),
        }


class SpeedMeter:
    """Driver-side accumulator bundle; pass to extract_flat/extract."""

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.n_images = sc.accumulator(0)
        self.decode_s = sc.accumulator(0.0)
        self.ocr_s = sc.accumulator(0.0)
        self._t0 = time.time()

    def snapshot(self) -> Snapshot:
        return Snapshot(
            n_images=self.n_images.value,
            decode_s=self.decode_s.value,
            ocr_s=self.ocr_s.value,
            wall_s=time.time() - self._t0,
        )
