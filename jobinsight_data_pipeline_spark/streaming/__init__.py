"""Structured-Streaming mode: incremental raw→staging→dwh.

incremental.py  file-source stream + foreachBatch merge, the streaming
                re-cast of the reference's 7-day-lookback batch ETL.
"""
