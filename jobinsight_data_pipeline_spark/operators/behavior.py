"""Behavioral event analytics: ordered funnels and cohort retention.

Completes the events-table family (windowed counts, sessionization,
percentiles, pivots) with the two classic product-analytics operators a
warehouse serves on top of a clickstream:

* ``funnel_counts`` — how many users progress through an ordered
  sequence of event types (view → click → purchase), with per-step
  conversion rates.
* ``cohort_retention`` — the acquisition-cohort × periods-since
  retention triangle (of the users whose first event fell in week W,
  how many were active k weeks later?).

Both are pure DataFrame compositions (joins + partial-agg group-bys) —
no windows over the full event stream, no UDFs, no collect. At 100 TB
the per-user reduction happens FIRST (a partial-aggregating groupBy on
the user key), so every subsequent join moves one row per user, not one
row per event, and all shuffles share the user-id key so the exchange
is reused across funnel steps.

Determinism/portability: step ordering uses a zero-padded
``(epoch_micros, event_id)`` string key — lexicographic order equals
tuple order, ``min`` of it is the greedy earliest event, and both
engines (Spark / DuckDB oracle) agree bit-for-bit. Timestamps never
reach an output projection (CLAUDE.md fractional-second invariant);
cohorts are emitted as DATE (Monday of the ISO week — both engines'
``date_trunc('week', …)`` is Monday-based).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _order_key(ts_col: str, tiebreak_col: str) -> F.Column:
    """Zero-padded ``micros:tiebreak`` string whose lexicographic order
    is the (ts, tiebreak) tuple order. Requires non-negative epochs and
    tiebreaks (true of event logs; pre-1970 event streams would need a
    shifted epoch) — ENFORCED, not just documented: '-' sorts below
    digits, so a negative value would silently sort before everything
    regardless of magnitude and corrupt funnel/attribution/path
    ordering. A negative epoch or tiebreak raises instead (two
    comparisons per row; NULLs pass through to the usual NULL-key
    concat)."""
    micros_n = F.expr(f"timestampdiff(MICROSECOND, {_EPOCH}, {ts_col})")
    tb = F.col(tiebreak_col)
    key = F.concat(
        F.lpad(micros_n.cast("string"), 20, "0"),
        F.lit(":"),
        F.lpad(tb.cast("string"), 20, "0"),
    )
    return F.when(
        (micros_n < 0) | (tb < 0),
        F.raise_error(
            F.lit(
                "_order_key: negative epoch micros or tiebreak — "
                "zero-padded lexicographic ordering requires a "
                "non-negative domain (shift pre-1970 timestamps / "
                "negative ids before calling)"
            )
        ).cast("string"),
    ).otherwise(key)


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    within_hours: int | None = None,
    anchor: str = "first",
) -> DataFrame:
    """Ordered-funnel analysis: users reaching each step of ``steps`` in
    strict event order, greedy-from-first-occurrence semantics.

    A user reaches step k if, starting from their EARLIEST step-1 event,
    each subsequent step type occurs strictly later than the previously
    matched event ((ts, tiebreak) tuple order — simultaneous timestamps
    break on the tiebreak column, so the match is deterministic). With
    ``within_hours``, later steps must also complete within that many
    hours of the matched step-1 event (the conversion window).

    Greedy matching is the standard funnel semantic (earliest candidate
    per step): it is deterministic, engine-portable, and computable with
    k-1 equi-joins instead of a per-user sequence scan.

    ``anchor`` picks the other axis product-analytics tools disagree on:

    - ``"first"`` (default): the window is evaluated against the GREEDY
      step-1 anchor — a user whose first step-1 event times out does
      NOT re-anchor to a later one (the original pinned behavior).
    - ``"all"``: windowed RE-ENTRY — EVERY step-1 event anchors its own
      greedy chain, and a user reaches step k if ANY anchor's chain
      does. This is the exhaustive form of re-anchor-on-timeout (for
      distinct-user step counts the two coincide: a user converts iff
      some anchor's chain converts), and it reuses the same frontier
      machinery with the frontier keyed on (user, anchor) instead of
      user — frontier cardinality is the user's step-1 event count, so
      every shuffle still keys on ``id_col`` and nothing is collected.

    Scale shape: the event stream is filtered to the step types once,
    then each step is a partial-aggregating ``groupBy(user)`` (map-side
    combine collapses to ≤1 row per user per step) joined to the ≤1-row
    per-user frontier from the previous step — every shuffle keys on
    ``id_col``, so AQE reuses the exchange; nothing is collected and no
    global sort exists. The final per-step counts are k 1-row
    aggregates unioned and ranked with a k-row window (driver-sized).

    Returns one row per step: ``step`` (1-based BIGINT), ``event_type``,
    ``n_users``, ``conv_ppm`` (vs step 1, integer parts-per-million,
    NULL when step 1 is empty), ``step_ppm`` (vs previous step).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if anchor not in ("first", "all"):
        raise ValueError(f"anchor must be 'first' or 'all', got {anchor!r}")
    okey = _order_key(ts_col, tiebreak_col)
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(id_col).alias("_uid"),
        F.col(type_col).alias("_etype"),
        okey.alias("_okey"),
    )

    # frontier: the greedy match position after step k — one row per
    # user ("first") or per (user, step-1 anchor) ("all")
    s1 = ev.where(F.col("_etype") == steps[0])
    if anchor == "first":
        frontier = (
            s1.groupBy("_uid")
            .agg(F.min("_okey").alias("_at"))
            .withColumn("_anchor", F.col("_at"))
        )
    else:
        frontier = s1.select(
            "_uid",
            F.col("_okey").alias("_at"),
            F.col("_okey").alias("_anchor"),
        )

    def _step_count(fr: DataFrame, step_i: int, name: str) -> DataFrame:
        users = (
            fr if anchor == "first" else fr.select("_uid").distinct()
        )
        return users.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step_i).cast("long").alias("step"),
            F.lit(name).alias("event_type"),
            "n_users",
        )

    step_counts = [_step_count(frontier, 1, steps[0])]
    horizon_us = (
        None if within_hours is None else int(within_hours) * 3_600_000_000
    )
    for i, name in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("_etype") == name).join(frontier, "_uid")
        nxt = nxt.where(F.col("_okey") > F.col("_at"))
        if horizon_us is not None:
            # the okey prefix IS the epoch-micros (zero-padded): compare
            # numerically against the anchor's prefix
            elapsed = F.substring("_okey", 1, 20).cast("long") - F.substring(
                "_anchor", 1, 20
            ).cast("long")
            nxt = nxt.where(elapsed <= F.lit(horizon_us))
        frontier = nxt.groupBy("_uid", "_anchor").agg(
            F.min("_okey").alias("_at")
        )
        step_counts.append(_step_count(frontier, i, name))

    out = step_counts[0]
    for fr in step_counts[1:]:
        out = out.unionByName(fr)
    # k-row frame: the single-partition window is driver-sized by
    # construction (one row per funnel step), not a data-path sort
    w_all = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("step")
    first_n = F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(w_all)
    prev_n = F.lag("n_users").over(w_prev)
    return out.select(
        "step",
        "event_type",
        "n_users",
        (F.col("n_users") * F.lit(1_000_000)).cast("long").alias("_scaled"),
        first_n.alias("_n1"),
        prev_n.alias("_np"),
    ).select(
        "step",
        "event_type",
        "n_users",
        F.expr("_scaled div nullif(_n1, 0)").alias("conv_ppm"),
        F.expr("_scaled div nullif(_np, 0)").alias("step_ppm"),
    )


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    first_seen: DataFrame | None = None,
) -> DataFrame:
    """Weekly cohort-retention triangle: users are assigned to the ISO
    week (Monday-truncated DATE) of their FIRST event; for every
    (cohort_week, k weeks later) cell, count how many of that cohort
    were active — the churn/stickiness report every product warehouse
    serves.

    Scale shape: two partial-aggregating group-bys on the user key (the
    per-user first-event reduction and the distinct (user, week) active
    set — both collapse map-side), one user-key equi-join between the
    two reduced frames, then a (cohort, period) group-by whose
    cardinality is weeks², not events. Cohort sizes re-derive from the
    k=0 diagonal (a user is always active in their own first week), so
    no extra join: ``retention_ppm`` is computed against the cohort's
    own period-0 cell via a per-cohort window over the triangle (a
    weeks²-row frame, not event data).

    With ``first_seen`` (a (id, ts) frame of per-user first-event
    timestamps — e.g. the min-mergeable state a streaming loop
    maintains), the per-user first-event reduction is skipped and the
    given frame cohorts the users instead; since ``min`` commutes, a
    correctly-maintained incremental state yields EXACTLY the batch
    result (the streaming ≡ batch pin the stream_cohort gate enforces).

    Returns ``cohort_week`` DATE, ``period_weeks`` BIGINT, ``n_active``
    BIGINT, ``retention_ppm`` BIGINT (exact integer ppm of the cohort).
    """
    uid, ts = F.col(id_col), F.col(ts_col)
    if first_seen is None:
        first = events.groupBy(uid.alias("_uid")).agg(
            F.to_date(F.date_trunc("week", F.min(ts))).alias("cohort_week")
        )
    else:
        first = first_seen.select(
            F.col(id_col).alias("_uid"),
            F.to_date(F.date_trunc("week", F.col(ts_col))).alias(
                "cohort_week"
            ),
        )
    active = (
        events.select(
            uid.alias("_uid"),
            F.to_date(F.date_trunc("week", ts)).alias("_week"),
        )
        .distinct()
    )
    cells = (
        active.join(first, "_uid")
        .select(
            "cohort_week",
            F.expr("datediff(_week, cohort_week) div 7").alias(
                "period_weeks"
            ),
        )
        .groupBy("cohort_week", "period_weeks")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w = Window.partitionBy("cohort_week").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cohort_n = F.max(
        F.when(F.col("period_weeks") == 0, F.col("n_active"))
    ).over(w)
    return cells.select(
        "cohort_week",
        "period_weeks",
        "n_active",
        F.col("n_active").alias("_na"),
        cohort_n.alias("_cn"),
    ).select(
        "cohort_week",
        "period_weeks",
        "n_active",
        F.expr("(_na * 1000000) div nullif(_cn, 0)").alias("retention_ppm"),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Last-touch conversion attribution: every conversion event credits
    the user's LATEST preceding touch event (same-microsecond touches
    count — <= semantics), the marketing-analytics report behind
    channel ROI. Composes the engine's as-of join (operators/asof —
    one shuffle of touches+conversions, no range fan-out); touches
    first dedup to one per (user, ts) keeping the max tiebreak (the
    as-of contract requires unique version timestamps — the
    freshest-write rule, deterministic on both engines).

    Returns one row per attributed touch type (plus ``'none'`` for
    conversions with no preceding touch): conversion count, distinct
    converting users, and — when ``value_col`` is set — the exact
    integer sum of ``floor(value·10⁴)`` (quantize-then-sum: immune to
    float summation order, the CLAUDE.md discipline).
    """
    from pyspark.sql.window import Window as W

    from jobinsight_data_pipeline_spark.operators.asof import asof_join

    touches = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(id_col),
        F.col(ts_col),
        F.col(type_col).alias("touch_type"),
        F.col(tiebreak_col).alias("touch_id"),
    )
    w = W.partitionBy(id_col, ts_col).orderBy(F.desc("touch_id"))
    touches = (
        touches.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    conv_cols = [id_col, ts_col, tiebreak_col] + (
        [value_col] if value_col else []
    )
    conversions = events.where(
        F.col(type_col) == F.lit(conversion_type)
    ).select(*conv_cols)
    att = asof_join(
        conversions,
        touches,
        id_col,
        ts_col,
        ts_col,
        ["touch_type", "touch_id"],
    )
    aggs = [
        F.count(F.lit(1)).alias("n_conversions"),
        F.countDistinct(id_col).alias("n_users"),
    ]
    if value_col:
        aggs.append(
            F.sum(
                F.floor(F.col(value_col) * F.lit(10000.0)).cast("long")
            ).alias("value_q4")
        )
    return att.groupBy(
        F.coalesce("touch_type", F.lit("none")).alias("touch_type")
    ).agg(*aggs)


def first_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """First-touch attribution — the acquisition-channel complement of
    :func:`last_touch_attribution`: every conversion credits the user's
    EARLIEST touch event, provided it precedes the conversion in
    (ts, tiebreak) tuple order (a simultaneous touch with the smaller
    tiebreak counts). The first touch is a per-user SCALAR, so the
    whole report is one partial-aggregating groupBy on the user (min of
    the order-key struct carries the channel along) plus one reduced
    equi-join onto conversions — cheaper than the as-of union since no
    per-event forward fill is needed.

    Same output contract as last-touch: ``touch_type`` (or ``'none'``),
    ``n_conversions``, ``n_users``, and exact quantize-then-sum
    ``value_q4`` when ``value_col`` is set.
    """
    okey = _order_key(ts_col, tiebreak_col)
    first = (
        events.where(F.col(type_col).isin(list(touch_types)))
        .select(
            F.col(id_col),
            F.struct(
                okey.alias("k"), F.col(type_col).alias("t")
            ).alias("_ft"),
        )
        .groupBy(id_col)
        .agg(F.min("_ft").alias("_ft"))
    )
    conv_cols = [F.col(id_col), okey.alias("_ck")] + (
        [F.col(value_col)] if value_col else []
    )
    conversions = events.where(
        F.col(type_col) == F.lit(conversion_type)
    ).select(*conv_cols)
    att = conversions.join(first, id_col, "left").select(
        id_col,
        *( [value_col] if value_col else [] ),
        F.when(
            F.col("_ft").isNotNull() & (F.col("_ft.k") <= F.col("_ck")),
            F.col("_ft.t"),
        ).otherwise(F.lit("none")).alias("touch_type"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_conversions"),
        F.countDistinct(id_col).alias("n_users"),
    ]
    if value_col:
        aggs.append(
            F.sum(
                F.floor(F.col(value_col) * F.lit(10000.0)).cast("long")
            ).alias("value_q4")
        )
    return att.groupBy("touch_type").agg(*aggs)


def top_session_paths(
    events: DataFrame,
    session_col: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_steps: int = 5,
    k: int = 20,
) -> DataFrame:
    """Session path analysis: the top-k most common event-type
    SEQUENCES across sessions (first ``max_steps`` events per session,
    joined ``a>b>c``) — the navigation report beside funnels (funnels
    test ONE hypothesized order; paths discover which orders actually
    happen).

    Per-session assembly is one groupBy whose ``collect_list`` of
    (order-key, type) structs sorts INSIDE the aggregate row
    (``array_sort`` — collect_list order is partitioning-dependent, the
    sort makes it total via the (ts, tiebreak) key), so no window over
    the event stream and no per-session sort shuffle beyond the
    session-key aggregation; the path table then partial-aggregates to
    ≤ distinct-paths rows and a heap top-k cuts with (count desc, path
    asc) ties. Bounded state: only the first ``max_steps`` entries
    survive the slice, so a pathological million-event session
    contributes one bounded row."""
    okey = _order_key(ts_col, tiebreak_col)
    per = (
        events.select(
            F.col(session_col).alias("_sid"),
            F.struct(okey.alias("k"), F.col(type_col).alias("t")).alias(
                "_e"
            ),
        )
        .groupBy("_sid")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(F.collect_list("_e")),
                        lambda s: s["t"],
                    ),
                    1,
                    int(max_steps),
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        per.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(int(k))
    )
