"""Thin table-format seam (SURVEY.md §7(e)'s promise).

Every managed-table read/write in the pipeline — the extraction output,
the progress store, the materialized corpus — goes through these helpers,
so the storage format is a configuration, not something baked into
operator code. The north rule names an Iceberg table; this sandbox ships
no iceberg-spark runtime jar, so:

- ``parquet`` (default): plain parquet directories, with dynamic partition
  overwrite for idempotent bucket rewrites — semantically the subset of
  Iceberg the pipeline relies on (atomic-enough replace of a partition,
  append, schema-on-read).
- ``iceberg``: uses the DataFrameWriterV2 (``writeTo``) API against a
  configured Spark catalog. Selecting it without a catalog raises
  immediately with the exact configs needed, rather than failing deep in
  a job. The call sites are already format-agnostic, so dropping the
  runtime jar + catalog config in is the ONLY change needed at scale.

Reference analog: the SQLite storage layer behind a single `Database`
facade (/root/reference src/common/database.cpp) — one seam, swappable
backend.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: selected via env so spark-submit jobs flip format without code edits
TABLE_FORMAT = os.environ.get("OCS_TABLE_FORMAT", "parquet")

#: catalog name the iceberg branch expects (spark.sql.catalog.<this>)
ICEBERG_CATALOG = os.environ.get("OCS_ICEBERG_CATALOG", "ocs")


def _require_iceberg(spark: SparkSession) -> None:
    if spark.conf.get(f"spark.sql.catalog.{ICEBERG_CATALOG}", None) is None:
        raise NotImplementedError(
            "OCS_TABLE_FORMAT=iceberg but no Spark catalog named "
            f"'{ICEBERG_CATALOG}' is configured. Provide the "
            "iceberg-spark-runtime jar and set "
            f"spark.sql.catalog.{ICEBERG_CATALOG}=org.apache.iceberg.spark.SparkCatalog "
            f"+ spark.sql.catalog.{ICEBERG_CATALOG}.type=hadoop|hive (jar absent "
            "from this sandbox; parquet fallback carries identical semantics)."
        )


def _ident(path: str) -> str:
    """Map a storage path to an Iceberg table identifier.

    The WHOLE path is encoded (sanitized) plus a short hash of the RAW
    path: sanitization alone collapses 'run-1' and 'run_1' onto one name,
    which would let two runs silently share (and overwrite) one table —
    the hash suffix makes the mapping injective while keeping the
    identifier readable."""
    if "://" not in path and "/" not in path:
        return f"{ICEBERG_CATALOG}.{path}"
    import hashlib
    import re

    tail = re.sub(r"[^A-Za-z0-9_]+", "_", path.strip("/")).strip("_")
    h = hashlib.md5(path.rstrip("/").encode()).hexdigest()[:8]
    return f"{ICEBERG_CATALOG}.db.t_{tail}_{h}"


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """Write a managed table. mode='overwrite' with partition_by uses
    dynamic partition overwrite (only the partitions present in `df` are
    replaced — the idempotent bucket-rewrite primitive resume relies on)."""
    fmt = fmt or TABLE_FORMAT
    if fmt == "iceberg":
        from pyspark.sql import functions as F

        _require_iceberg(df.sparkSession)
        ident = _ident(path)
        writer = df.writeTo(ident).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        # append()/overwritePartitions() require the table to exist; the
        # FIRST write of any run must create it (with its partition spec)
        # or every fresh job would fail before writing a row.
        if not df.sparkSession.catalog.tableExists(ident):
            writer.create()
            return
        if mode == "append":
            writer.append()
        else:
            # dynamic-overwrite analog: replace exactly the partitions in df
            writer.overwritePartitions() if partition_by else writer.createOrReplace()
        return
    if mode == "overwrite" and partition_by:
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def append_table(df: DataFrame, path: str, fmt: str | None = None) -> None:
    write_table(df, path, mode="append", fmt=fmt)


def read_table(
    spark: SparkSession, path: str, schema=None, fmt: str | None = None
) -> DataFrame:
    fmt = fmt or TABLE_FORMAT
    if fmt == "iceberg":
        _require_iceberg(spark)
        return spark.read.format("iceberg").load(_ident(path))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
