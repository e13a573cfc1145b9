"""S8/S9 — append-only CDC journal (JSONL), Spark-native.

The reference writes one JSONL line per upserted job with a file lock
(/root/reference/src/ingestion/cdc.py:42-93). Spark's committed writes
make the lock unnecessary: each batch appends its own part files under
the day's directory — task-isolated files + the output commit protocol
replace filelock. Layout is the reference's
``cdc/YYYYMM/YYYYMMDD/*.json`` (a directory of parts instead of a single
file — same prefix, scan-compatible).

Record shape (cdc.py:57-67): {timestamp, job_id, action, data, metadata}.
``action`` is insert|update, decided set-wise against the pre-merge
table (a single anti-join instead of the reference's per-row xmax check).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def classify_actions(
    batch: DataFrame, existing: DataFrame | None, key: str = "job_id"
) -> DataFrame:
    """Tag each batch row insert/update against the pre-merge table."""
    if existing is None:
        return batch.withColumn("action", F.lit("insert"))
    marks = existing.select(F.col(key)).withColumn("_exists", F.lit(True))
    return (
        batch.join(marks, key, "left")
        .withColumn(
            "action", F.when(F.col("_exists"), F.lit("update")).otherwise(F.lit("insert"))
        )
        .drop("_exists")
    )


def write_cdc(
    batch: DataFrame,
    existing: DataFrame | None,
    cdc_root: str,
    as_of: dt.datetime,
    source: str = "crawler",
    key: str = "job_id",
) -> str:
    """Append one journal record per batch row. Returns the day path."""
    day_path = f"{cdc_root}/{as_of:%Y%m}/{as_of:%Y%m%d}"
    tagged = classify_actions(batch, existing, key)
    data_cols = [c for c in batch.columns]
    records = tagged.select(
        F.lit(as_of.isoformat()).alias("timestamp"),
        F.col(key).alias("job_id"),
        "action",
        F.struct(*[F.col(c) for c in data_cols]).alias("data"),
        F.struct(
            F.lit(source).alias("source"), F.lit("1.0").alias("version")
        ).alias("metadata"),
    )
    records.write.mode("append").json(day_path)
    return day_path


def read_cdc(
    spark: SparkSession, cdc_root: str, since: dt.date | None = None
) -> DataFrame:
    """S9: replay the journal (schema-on-read). ``since`` prunes whole
    month/day directories via the path layout before any file is opened."""
    df = spark.read.option("recursiveFileLookup", "true").json(cdc_root)
    if since is not None:
        df = df.filter(F.col("timestamp") >= F.lit(since.isoformat()))
    return df


def retention_cdc(cdc_root: str, keep_days: int, as_of: dt.date) -> list[str]:
    """S13: drop day directories older than the window. Pure path
    arithmetic — directory names encode the date, no data is read."""
    import os
    import shutil

    cutoff = as_of - dt.timedelta(days=keep_days)
    removed: list[str] = []
    if not os.path.isdir(cdc_root):
        return removed
    for month in sorted(os.listdir(cdc_root)):
        mdir = os.path.join(cdc_root, month)
        if not os.path.isdir(mdir):
            continue
        for day in sorted(os.listdir(mdir)):
            try:
                day_date = dt.datetime.strptime(day, "%Y%m%d").date()
            except ValueError:
                continue
            if day_date < cutoff:
                shutil.rmtree(os.path.join(mdir, day), ignore_errors=True)
                removed.append(f"{month}/{day}")
        if not os.listdir(mdir):
            os.rmdir(mdir)
    return removed
