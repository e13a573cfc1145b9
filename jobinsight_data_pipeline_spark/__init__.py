"""jobinsight_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference pipeline
``Trantuan24/JobInsight_Data_Pipeline`` (job-postings ETL: raw → staging →
Kimball star schema with SCD2 dims + daily-grain facts + location bridge,
views, validation, partitioned parquet export) as a library of pure
``DataFrame -> DataFrame`` transformations designed for a large Spark
cluster:

- declarative DataFrame/SQL plans (Catalyst optimizes: pushdown, pruning,
  broadcast, AQE) — no driver-side row loops anywhere;
- explicit ``run_date``/``as_of`` parameters instead of wall-clock reads,
  so every operator is deterministic and oracle-testable;
- arrays stay ``ArrayType`` end-to-end; JSON only at I/O edges;
- upserts/SCD2 as set-based merges over partitioned Parquet.

Layout:
    session.py    SparkSession factory (AQE on, pinned timezone)
    schemas.py    explicit StructType contracts for every table
    functions/    scalar function library (salary/text/location/dates)
    operators/    composite relational operators (scd2, merge, dedup,
                  similarity, text analysis, multimodal)
    plans/        ETL phase plans (raw→staging, dims, facts, views,
                  validation)
    sources/      ingest front + sinks (html, cdc, partitioned lake)
    streaming/    incremental/structured-streaming mode
"""

__version__ = "0.1.0"
