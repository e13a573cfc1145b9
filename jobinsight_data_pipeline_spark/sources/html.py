"""S1 — HTML job-card ingest front.

The reference parses crawled TopCV listing pages with BeautifulSoup in a
thread pool (/root/reference/src/crawler/parser.py:117-472). Here the
file list IS the DataFrame: ``binaryFile`` scan → ``mapInPandas`` batch
parser → raw_jobs rows. Partition parallelism replaces the thread pool;
dedupe is a dropDuplicates.

bs4 itself is not in this image, but its ``'html.parser'`` backend — the
exact treebuilder the reference selects (parser.py:151) — is a wrapper
over the stdlib ``html.parser``, so sources/htmltree.py rebuilds the
same tolerant element tree on that stdlib event stream and this module
walks it with the reference's selector-fallback branches one-for-one
(parser.py:192-377). Nested same-name tags, unclosed tags, stray end
tags, comments, and entity references all behave as bs4 would; fixture
parity is pinned per branch by tests/test_html_fidelity.py.

Pinned deviations (documented in tests/test_html_fidelity.py):
- deadline keeps only the day count (the reference stores the raw text
  and regex-extracts the number later; due_date_from_deadline consumes
  the count directly here);
- text extraction joins fragments with a single space (bs4
  ``get_text(strip=True)`` concatenates bare);
- a '+N' skill chip whose tooltip is HTML keeps the visible chip text
  (the reference drops the chip entirely, parser.py:309-318).
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.schemas import RAW_JOBS
from jobinsight_data_pipeline_spark.sources.htmltree import Element, parse_html


def _clean_field(v: str | None) -> str | None:
    """The reference's _validate_job_data hygiene (parser.py:379-389):
    newlines → spaces, semicolons → commas, whitespace normalized."""
    if not v:
        return v
    v = v.replace("\n", " ").replace("\r", " ").replace(";", ",")
    return " ".join(v.split())


def _prefix_url(href: str | None) -> str | None:
    if href is None:
        return None
    return f"https://www.topcv.vn{href}" if href.startswith("/") else href


def _text(el: Element | None) -> str | None:
    return el.get_text() if el is not None else None


def parse_job_cards(html: str, as_of: dt.datetime) -> list[dict]:
    """Extract the 15-field raw_jobs contract from one listing page,
    mirroring the reference's selector-fallback branches one-for-one
    (parser.py:192-377)."""
    jobs: list[dict] = []
    if "job-item-2" not in html:
        return jobs
    root = parse_html(html)
    for item in root.find_all("div", "job-item-2"):
        # job_id: data-job-id | derived from the first href (parser.py:220-233)
        job_id = item.get("data-job-id") or None
        job_url = None
        if job_id is None:
            link = item.find("a", href=True)
            if link is not None:
                href = link.attrs["href"]
                tail = href.split("?")[0].rsplit("-", 1)[-1].replace(".html", "")
                if tail:
                    job_id = tail
                    job_url = _prefix_url(href)
        if job_id is None:
            continue

        # title: h3.title a span[data-original-title] | h3.title text
        # (parser.py:236-243)
        title = None
        span = item.select_one("h3.title a span[data-original-title]")
        if span is not None and span.get("data-original-title"):
            title = span.attrs["data-original-title"].strip()
        else:
            title = _text(item.find("h3", "title"))
        if not title:  # parser.py:168 — job_id AND title required
            continue

        # job_url: h3.title a href overrides the fallback (parser.py:246-249)
        title_a = item.select_one("h3.title a")
        if title_a is not None and title_a.get("href"):
            job_url = _prefix_url(title_a.attrs["href"])

        # company (parser.py:252-257)
        company = company_url = None
        co = item.find("a", "company")
        if co is not None:
            company = co.get_text()
            company_url = _prefix_url(co.get("href"))

        # location: label.address (+tooltip → detail) | div.info span
        # (parser.py:259-287); tooltip may itself hold HTML — the
        # reference parses it with a nested soup
        location = loc_detail = None
        addr = item.select_one("label.address")
        if addr is not None:
            location = addr.get_text()
            tooltip = addr.get("data-original-title")
            if tooltip:
                loc_detail = _clean_field(parse_html(tooltip).get_text())
            if not loc_detail:
                loc_detail = location
        else:
            info = item.find("div", "info")
            if info is not None:
                location = _text(info.find("span"))
                loc_detail = location

        # salary: label.title-salary | div.salary (parser.py:289-297);
        # span.salary tolerated for older captures
        sal = (
            item.select_one("label.title-salary")
            or item.find("div", "salary")
            or item.find("span", "salary")
        )
        salary = _text(sal)

        # skills: div.skills label.item ('+' pulls tooltip skills) |
        # span.tag-item fallback (parser.py:299-324)
        skills: list[str] = []
        chips = item.select("div.skills label.item")
        if chips:
            for chip in chips:
                skill_text = chip.get_text()
                tooltip = chip.get("data-original-title")
                if skill_text.endswith("+") and tooltip and not tooltip.startswith("<"):
                    skills.extend(s.strip() for s in tooltip.split(","))
                else:
                    skills.append(skill_text)
        else:
            for tag_el in item.find_all("span", "tag-item"):
                t = tag_el.get_text()
                if t:
                    skills.append(t)

        # deadline: label.time strong | div.deadline (parser.py:326-334),
        # normalized to the day count; span.deadline tolerated
        dl = (
            item.select_one("label.time strong")
            or item.find("div", "deadline")
            or item.find("span", "deadline")
        )
        deadline = _text(dl)
        if deadline is not None:
            num = re.search(r"\d+", deadline)
            deadline = num.group(0) if num else None

        # verified employer: span.vip-badge presence (parser.py:336-339)
        verified = item.select_one("span.vip-badge") is not None

        # last_update: label.deadline | span.time | div.label-content
        # containing 'Cập nhật' (parser.py:341-358)
        last_update = _text(
            item.select_one("label.deadline") or item.select_one("span.time")
        )
        if last_update is None:
            for label in item.find_all("div", "label-content"):
                t = label.get_text()
                if "Cập nhật" in t:
                    last_update = t
                    break

        # logo: first a>img (must carry src) | img.img-responsive
        # (parser.py:360-368)
        logo = None
        logo_el = item.select_one("a img")
        if logo_el is not None and logo_el.get("src"):
            logo = logo_el.attrs["src"]
        else:
            img = item.find("img", "img-responsive")
            if img is not None:
                logo = img.get("src", "")

        jobs.append(
            {
                "job_id": job_id,
                "title": _clean_field(title),
                "job_url": job_url,
                "company_name": _clean_field(company),
                "company_url": company_url,
                "salary": _clean_field(salary),
                "skills": skills or None,
                "location": _clean_field(location),
                "location_detail": _clean_field(loc_detail),
                "deadline": deadline,
                "verified_employer": verified,
                "last_update": _clean_field(last_update),
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
