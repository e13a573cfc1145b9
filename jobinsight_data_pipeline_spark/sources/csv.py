"""CSV interchange — the other lingua franca (crawler exports,
spreadsheet handoffs, warehouse UNLOADs; the reference stages every
bulk load as in-memory CSV for postgres COPY —
/root/reference/src/db/bulk_operations.py:140,216).

Same stance as sources/jsonl.py: Spark's CSV machinery already does the
distributed work; this module pins the production contract around it.

- **Always pass an explicit schema.** Inference is a full extra pass
  (and CSV inference is type-guessy on top — a column of ids that
  happens to look numeric in the sampled rows flips type between
  loads). Freeze the schema in code.
- **Permissive + quarantine, not fail-fast.** Ragged rows (wrong field
  count, unparseable numerics) route to ``_corrupt_record`` for
  counting/triage instead of killing the job.
- **Line-oriented by default — that's what keeps the scan splittable.**
  ``read_csv`` is a text scan + ``from_csv``: byte-range splits, column
  pruning into the parser, and no SPARK-21610-style refusal when a plan
  needs only the corrupt column (the csv datasource shares the json
  one's restriction; the text-scan dodge from sources/jsonl.py applies
  verbatim). The cost: records must not contain raw newlines. Fields
  with embedded NEWLINES need ``read_csv_multiline`` — the csv
  datasource with multiLine=true, which parses each FILE as one stream
  (splittability lost; parallelism = file count, so shard at write
  time). Quotes/escapes/commas inside fields are fine on the line
  path — the writer quotes them and ``from_csv`` unquotes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: one option dict shared by writer and readers — a reader that
#: disagrees with the writer about quote/escape silently mangles data
CSV_OPTIONS = {
    "sep": ",",
    "quote": '"',
    "escape": '"',  # RFC-4180 doubled quotes, not backslash escapes
    "header": "false",  # headers break splittability (every slice
    # would need to know it isn't first) and concat-ability of shards
    # NULL travels as the PostgreSQL-COPY sentinel (the convention the
    # reference's bulk loader rides on): Spark's writer distinguishes
    # NULL (nothing) from empty string ("") but the DEFAULT reader
    # conflates both to NULL — an explicit sentinel keeps '' ≠ NULL
    # through the roundtrip (measured; pinned in test_sources)
    "nullValue": "\\N",
}


def _ddl(schema: StructType) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def write_csv(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` as headerless CSV shards under ``path`` (overwrite),
    RFC-4180 quoting. ``shards`` as in sources/jsonl.write_jsonl: size
    for 100-500 MB files so shard count = task count downstream."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite")
    for k, v in CSV_OPTIONS.items():
        w = w.option(k, v)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read line-oriented CSV with a FROZEN schema. Malformed rows
    (ragged field count, numeric parse failures) land in
    ``_corrupt_record``; ``keep_corrupt`` returns data + quarantine
    columns, else corrupt ROWS are filtered (a malformed line parses to
    all-NULL data columns — dropping just the column would leak a
    phantom null row, the read_jsonl lesson)."""
    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    parsed = F.from_csv(
        F.col("value"),
        _ddl(full),
        dict(
            CSV_OPTIONS,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record",
        ),
    )
    df = (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(parsed.alias("_p"))
        .select("_p.*")
    )
    if keep_corrupt:
        return df
    return df.filter(F.col("_corrupt_record").isNull()).select(
        *[f.name for f in schema.fields]
    )


def read_csv_multiline(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """The escape hatch for CSV whose quoted fields contain raw
    newlines: the csv datasource with multiLine=true. Each FILE parses
    as one stream — no byte-range splits, so parallelism equals file
    count and a single huge file is a single task. Prefer the line
    path; if a corpus needs this, shard it small at write time."""
    r = spark.read.schema(schema)
    for k, v in CSV_OPTIONS.items():
        r = r.option(k, v)
    return r.option("multiLine", "true").option("mode", "PERMISSIVE").csv(path)
