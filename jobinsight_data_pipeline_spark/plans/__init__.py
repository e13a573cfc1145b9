"""ETL phase plans: pure DataFrame→DataFrame pipelines.

raw_to_staging.py  derive staging columns from raw (one projection)
dimensions.py      SCD2/insert-only builders for the 4 dims
facts.py           daily-grain fact merge + location bridge rebuild
views.py           the reference's 7 views as Spark SQL
validation.py      data-quality checks (V1–V8) returning a report dict
"""
