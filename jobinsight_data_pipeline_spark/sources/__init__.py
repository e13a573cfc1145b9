"""Sources & sinks.

lake.py     parquet lakehouse layout: versioned table dirs with atomic
            swap (read-while-rewrite safety without a table format)
html.py     S1 ingest front: HTML job-card files → raw_jobs rows via
            mapInPandas
cdc.py      S8/S9 append-only JSONL change journal (sink + replay source)
export.py   S10/S11/S13 partitioned parquet export, dynamic-overwrite
            restore, retention
"""
