"""Per-phase performance monitoring.

The Spark-native re-expression of the reference's ``performance_monitor``
context manager (/root/reference/src/crawler-era ETL,
src/etl/raw_to_staging.py:65-108), which timed each ETL phase and logged
process memory via psutil. Here the engine itself is the source of
truth: wall time, the Spark jobs the phase actually ran (scoped with a
job group, so concurrent phases don't cross-count), and driver JVM heap
— no extra dependency, works on any cluster.

Usage::

    report: list[dict] = []
    with performance_monitor(spark, "Data Processing", report):
        df.write.parquet(...)
    # report[-1] == {"phase": ..., "wall_s": ..., "n_jobs": ...,
    #                "driver_heap_used_mb": ..., "ok": True}

Phases nest (each gets its own job group and restores the previous one),
and a failing phase still records its entry with ``ok: False`` before
re-raising — the reference logged failures the same way.
"""

from __future__ import annotations

import logging
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)


def _driver_heap_used_mb(spark: SparkSession) -> float | None:
    try:
        rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        return round((rt.totalMemory() - rt.freeMemory()) / (1024 * 1024), 1)
    except Exception:
        return None  # connect-mode / restricted gateway: wall time only


@contextmanager
def performance_monitor(
    spark: SparkSession, phase: str, report: list[dict] | None = None
):
    """Time a pipeline phase and count the Spark jobs it ran.

    Jobs are attributed via a unique job group set for the phase's
    duration (``statusTracker().getJobIdsForGroup``) — lazy frames built
    inside the block but materialized OUTSIDE it are deliberately not
    counted; materialize inside the block for attribution, exactly like
    the reference timed the save, not the plan construction.
    """
    _PROPS = (
        "spark.jobGroup.id",
        "spark.job.description",
        "spark.job.interruptOnCancel",
    )
    try:
        sc = spark.sparkContext
    except Exception:
        sc = None  # Spark Connect: no classic SparkContext — wall only
    group = f"perf-{uuid.uuid4().hex[:8]}"
    prev = {}
    if sc is not None:
        # setJobGroup overwrites all three thread-local properties —
        # restore every one, or the caller's own group/description is
        # clobbered for every job submitted after the phase
        prev = {k: sc.getLocalProperty(k) for k in _PROPS}
        sc.setJobGroup(group, f"performance_monitor:{phase}")
    entry: dict = {"phase": phase}
    t0 = time.perf_counter()
    try:
        yield entry
        entry["ok"] = True
    except BaseException:
        entry["ok"] = False
        raise
    finally:
        entry["wall_s"] = round(time.perf_counter() - t0, 3)
        entry["n_jobs"] = None
        if sc is not None:
            try:
                entry["n_jobs"] = len(
                    sc.statusTracker().getJobIdsForGroup(group)
                )
            except Exception:
                pass
            for k, v in prev.items():
                sc.setLocalProperty(k, v)
        entry["driver_heap_used_mb"] = _driver_heap_used_mb(spark)
        if report is not None:
            report.append(entry)
        logger.info(
            "phase %s: %.3fs, %s jobs%s",
            phase,
            entry["wall_s"],
            entry["n_jobs"],
            "" if entry["ok"] else " (FAILED)",
        )
