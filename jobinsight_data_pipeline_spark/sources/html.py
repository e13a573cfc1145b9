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

# Opening tags are matched quote-aware — the alternation steps over '>'
# INSIDE quoted attribute values (the address-tooltip branch anticipates
# data-original-title holding literal HTML like 'Hà Nội<br>HCM'; a naive
# [^>]* truncates the attr list there, losing data-job-id and silently
# dropping the card). Both quote styles are stepped over: real crawled
# pages mix them, and bs4 (the reference parser) accepts either.
_QA = r"(?:[^>\"']|\"[^\"]*\"|'[^']*')*"

_CLS_JOB_ITEM = "(?:\"[^\"]*job-item-2[^\"]*\"|'[^']*job-item-2[^']*')"
_JOB_ITEM_RE = re.compile(
    rf"<div\b({_QA}class={_CLS_JOB_ITEM}{_QA})>"
    rf"(.*?)(?=<div\b{_QA}class={_CLS_JOB_ITEM}|\Z)",
    re.DOTALL,
)

# html.parser attribute forms bs4 accepts: double-quoted, single-quoted,
# unquoted (terminated by whitespace or '>')
_ATTRS_RE = re.compile(
    r"([\w-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"'=]+))"
)
_TAG_RES: dict[str, re.Pattern] = {}


def _parse_attrs(s: str) -> dict[str, str]:
    return {
        m.group(1): next(g for g in m.groups()[1:] if g is not None)
        for m in _ATTRS_RE.finditer(s)
    }


def _tag_re(tag: str) -> re.Pattern:
    pat = _TAG_RES.get(tag)
    if pat is None:
        pat = re.compile(
            rf"<{tag}\b({_QA})>(.*?)</{tag}>", re.DOTALL | re.IGNORECASE
        )
        _TAG_RES[tag] = pat
    return pat


def _iter_tags(block: str, tag: str):
    """(attrs dict, inner html) for each non-nested <tag>…</tag>."""
    for m in _tag_re(tag).finditer(block):
        yield _parse_attrs(m.group(1)), m.group(2)


def _find(block: str, tag: str, cls: str | None = None):
    """First <tag> whose class ATTRIBUTE TOKEN list contains ``cls`` —
    token match, not substring, so cls='title' won't hit 'title-salary'
    (BeautifulSoup class_ semantics)."""
    for attrs, inner in _iter_tags(block, tag):
        if cls is None or cls in attrs.get("class", "").split():
            return attrs, inner
    return None, None


def _find_img(block: str, cls: str | None = None):
    """Void-element variant of ``_find`` for <img …>."""
    for m in re.finditer(rf"<img\b({_QA})/?>", block, re.IGNORECASE):
        attrs = _parse_attrs(m.group(1))
        if cls is None or cls in attrs.get("class", "").split():
            return attrs
    return None


def _text(html: str | None) -> str | None:
    """get_text(strip=True) equivalent."""
    if html is None:
        return None
    out = re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", html)).strip()
    return out


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


def parse_job_cards(html: str, as_of: dt.datetime) -> list[dict]:
    """Extract the 15-field raw_jobs contract from one listing page,
    mirroring the reference's selector-fallback branches one-for-one
    (parser.py:192-377); fixture parity is pinned per branch by
    tests/test_html_fidelity.py. One deliberate normalization: deadline
    keeps only the day count (the reference stores the raw text and
    regex-extracts the number later — data_prepare's due-date parse;
    due_date_from_deadline consumes the count directly here)."""
    jobs: list[dict] = []
    if "job-item-2" not in html:
        return jobs
    for m in _JOB_ITEM_RE.finditer(html):
        card_attrs = _parse_attrs(m.group(1))
        # group(2) is the card's INNER html — searching the full match
        # would make the tag regex see the card wrapper itself first and
        # skip nested siblings (finditer is non-overlapping)
        head = m.group(2)

        # job_id: data-job-id | derived from the first href (parser.py:220-233)
        job_id = card_attrs.get("data-job-id") or None
        job_url = None
        if job_id is None:
            first_a, _ = _find(head, "a")
            href = first_a.get("href") if first_a else None
            if href:
                tail = href.split("?")[0].rsplit("-", 1)[-1].replace(".html", "")
                if tail:
                    job_id = tail
                    job_url = _prefix_url(href)
        if job_id is None:
            continue

        # title: h3.title a span[data-original-title] | h3.title text
        _, h3_inner = _find(head, "h3", "title")
        title = None
        if h3_inner is not None:
            for attrs, _inner in _iter_tags(h3_inner, "span"):
                if attrs.get("data-original-title"):
                    title = attrs["data-original-title"].strip()
                    break
            if title is None:
                title = _text(h3_inner)
        if not title:  # parser.py:168 — job_id AND title required
            continue

        # job_url: h3.title a href overrides the fallback (parser.py:246-249)
        if h3_inner is not None:
            a_attrs, _ = _find(h3_inner, "a")
            if a_attrs and a_attrs.get("href"):
                job_url = _prefix_url(a_attrs["href"])

        # company (parser.py:252-257)
        co_attrs, co_inner = _find(head, "a", "company")
        company = _text(co_inner) if co_inner is not None else None
        company_url = _prefix_url(co_attrs.get("href")) if co_attrs else None

        # location: label.address (+tooltip → detail) | div.info span
        # (parser.py:259-287); tooltip may itself hold HTML
        location = loc_detail = None
        addr_attrs, addr_inner = _find(head, "label", "address")
        if addr_inner is not None:
            location = _text(addr_inner)
            tooltip = addr_attrs.get("data-original-title")
            if tooltip:
                loc_detail = _clean_field(_text(tooltip))
            if not loc_detail:
                loc_detail = location
        else:
            _, info_inner = _find(head, "div", "info")
            if info_inner is not None:
                _, span_inner = _find(info_inner, "span")
                if span_inner is not None:
                    location = _text(span_inner)
                    loc_detail = location

        # salary: label.title-salary | div.salary (parser.py:289-297);
        # span.salary tolerated for older captures
        _, sal_inner = _find(head, "label", "title-salary")
        if sal_inner is None:
            _, sal_inner = _find(head, "div", "salary")
        if sal_inner is None:
            _, sal_inner = _find(head, "span", "salary")
        salary = _text(sal_inner) if sal_inner is not None else None

        # skills: div.skills label.item ('+' pulls tooltip skills) |
        # span.tag-item fallback (parser.py:299-324)
        skills: list[str] = []
        _, skills_inner = _find(head, "div", "skills")
        if skills_inner is not None:
            for attrs, inner in _iter_tags(skills_inner, "label"):
                if "item" not in attrs.get("class", "").split():
                    continue
                skill_text = _text(inner) or ""
                tooltip = attrs.get("data-original-title")
                if skill_text.endswith("+") and tooltip and not tooltip.startswith("<"):
                    skills.extend(s.strip() for s in tooltip.split(","))
                else:
                    skills.append(skill_text)
        else:
            for attrs, inner in _iter_tags(head, "span"):
                if "tag-item" in attrs.get("class", "").split():
                    t = _text(inner)
                    if t:
                        skills.append(t)

        # deadline: label.time strong | div.deadline (parser.py:326-334),
        # normalized to the day count; span.deadline tolerated
        deadline = None
        _, time_inner = _find(head, "label", "time")
        if time_inner is not None:
            _, strong_inner = _find(time_inner, "strong")
            if strong_inner is not None:
                deadline = _text(strong_inner)
        if deadline is None:
            _, dl_inner = _find(head, "div", "deadline")
            if dl_inner is None:
                _, dl_inner = _find(head, "span", "deadline")
            if dl_inner is not None:
                deadline = _text(dl_inner)
        if deadline is not None:
            num = re.search(r"\d+", deadline)
            deadline = num.group(0) if num else None

        # verified employer: span.vip-badge presence (parser.py:336-339)
        verified = _find(head, "span", "vip-badge")[0] is not None

        # last_update: label.deadline | span.time | div.label-content
        # containing 'Cập nhật' (parser.py:341-358)
        last_update = None
        _, lu_inner = _find(head, "label", "deadline")
        if lu_inner is not None:
            last_update = _text(lu_inner)
        else:
            _, lu_inner = _find(head, "span", "time")
            if lu_inner is not None:
                last_update = _text(lu_inner)
            else:
                for attrs, inner in _iter_tags(head, "div"):
                    if "label-content" in attrs.get("class", "").split():
                        t = _text(inner) or ""
                        if "Cập nhật" in t:
                            last_update = t
                            break

        # logo: first a>img | img.img-responsive (parser.py:360-368)
        logo = None
        for _a_attrs, a_inner in _iter_tags(head, "a"):
            img = _find_img(a_inner)
            if img and img.get("src"):
                logo = img["src"]
                break
        if logo is None:
            img = _find_img(head, "img-responsive")
            if img:
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
