"""Scalar function library (SURVEY.md §2.8 F1–F20).

Native ``pyspark.sql.functions`` expressions wherever Java-regex parity
holds (salary, title, relative-time, html-pair extraction, dates); pandas
UDFs only for the three parsers whose Python-level semantics (ast/json
fallbacks, per-word casing) can't be expressed as Catalyst expressions.
"""

from jobinsight_data_pipeline_spark.functions.salary import (  # noqa: F401
    normalize_salary,
    with_salary_columns,
)
from jobinsight_data_pipeline_spark.functions.dates import (  # noqa: F401
    due_date_from_deadline,
    time_remaining,
    load_month,
    dim_date_frame,
    daily_fact_dates,
    fact_fanout_dates,
)
from jobinsight_data_pipeline_spark.functions.text import (  # noqa: F401
    clean_title,
    clean_company_name_udf,
    parse_last_update,
)
from jobinsight_data_pipeline_spark.functions.location import (  # noqa: F401
    extract_location_info,
    refine_location,
    location_pairs_from_fields,
    parse_locations_udf,
)
