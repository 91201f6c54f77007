"""Warehouse-classic sequence/session analytics (SURVEY §2.D/§2.E ext).

The reference engine's review dataflow stops at ranked retrieval; a
production deployment of the same data runs these warehouse classics next
to it — streak detection, concurrency sweeps, SCD2 dimension builds,
marketing attribution, sliding distinct actives, rank statistics and
regression. Each query is expressed Spark-first with a DuckDB oracle, and
each picks the physical shape that survives a 1000-executor 100 TB run
(noted per query).

Determinism strategy follows roster_analytics: monetary doubles quantize
to integer cents with ``floor(x*100+0.5)`` before aggregation (integer
sums are order-independent); rank statistics stay in scaled-integer
space until one final shared-expression double formula; OLS shares its
literal expression text between Spark ``selectExpr`` and the oracle SQL
so both engines evaluate the identical IEEE-754 tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from review_engine_spark.functions.packing import pack_pair, unpack_pair
from review_engine_spark.plans import declared
from review_engine_spark.sources.io import read_parquet_table


# ---------------------------------------------------------------------------
# Gaps-and-islands — per-user activity streaks. The classic trick: for
# distinct active days, ``day - row_number() days`` is constant within a
# run of consecutive dates, so one per-user window + two hash aggregates
# produce islands with NO self-join. Scale: single shuffle on user_id;
# per-user day counts are calendar-bounded.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    r AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        FROM d
    ),
    i AS (
        SELECT user_id, grp, count(*) AS len FROM r GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM i GROUP BY user_id
    """
)
def q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal consecutive-day activity streaks per user
    via the day - row_number() constant trick.
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn("grp", F.date_sub(F.col("day"), F.row_number().over(w)))
    i = r.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return i.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("active_days"),
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency — peak number of simultaneously-open 5-minute
# event spans per (event_type, day). Each span emits a +1 at its start
# and a -1 at its end (exclusive, clipped to midnight so the partition
# key bounds the window); the running sum over (t, delta) is the live
# count, with RANGE peer semantics (both engines' default frame) making
# equal-instant ties order-free. Scale: the window partitions on
# (event_type, day) — thousands of independent partitions, never a
# global sort. Spans are clipped to the day boundary, which is what
# makes the per-day partitioning exact rather than approximate.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day, ts AS t, 1 AS delta
        FROM events
        UNION ALL
        SELECT event_type, CAST(ts AS DATE) AS day,
               least(ts + INTERVAL 5 MINUTE,
                     CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)) AS t,
               -1 AS delta
        FROM events
    ),
    r AS (
        SELECT event_type, day,
               sum(delta) OVER (
                   PARTITION BY event_type, day ORDER BY t, delta) AS live
        FROM e
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(max(live) AS BIGINT) AS max_concurrent
    FROM r GROUP BY event_type, day
    """
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per (event_type, day): +1/-1 sweep-line over
    5-minute event intervals.
    """
    ev = read_parquet_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.col("ts").alias("start"),
        F.least(
            F.col("ts") + F.expr("INTERVAL 5 MINUTES"),
            F.date_add(F.to_date("ts"), 1).cast("timestamp"),
        ).alias("end"),
    )
    deltas = ev.select(
        "event_type",
        "day",
        F.explode(
            F.array(
                F.struct(F.col("start").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("end").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("d"),
    ).select("event_type", "day", "d.t", "d.delta")
    w = Window.partitionBy("event_type", "day").orderBy("t", "delta")
    live = deltas.withColumn("live", F.sum("delta").over(w))
    return (
        live.groupBy("event_type", "day")
        .agg(F.max("live").alias("max_concurrent"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "max_concurrent",
        )
    )


# ---------------------------------------------------------------------------
# SCD2 dimension build — collapse each user's event_type sequence into
# type-2 slowly-changing-dimension rows (value, valid_from, valid_to,
# version); valid_to is NULL on the current row. Change detection via
# lag(), versioning via a second row_number over change rows only.
# Scale: two stacked windows over the SAME (user_id, ts, event_id)
# ordering — Catalyst plans one shuffle + one sort, the second Window
# reuses the partitioning/ordering.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH s AS (
        SELECT user_id, event_type, ts,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    c AS (
        SELECT user_id, event_type, ts AS valid_from
        FROM s WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY valid_from) AS BIGINT) AS version,
           event_type, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from) AS valid_to
    FROM c
    """
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension build: event-type change points folded into validity
    intervals per user (lag + cumulative flag).
    """
    ev = read_parquet_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        F.row_number().over(wv).cast("long").alias("version"),
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution — credit each purchase's value (integer cents)
# to the latest click by the same user within the prior 7 days, then
# roll credited revenue up by touch day. Equi-join on user_id carries
# the range predicate as a post-join filter (per-user histories are
# bounded), and the per-purchase argmax is a row_number window over the
# purchase key. Integer-cent sums keep the rollup order-independent.
# Scale: one user_id shuffle for the join, one purchase-key window —
# both keys high-cardinality; nothing global.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS c_ts, event_id AS c_id
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.p_id, p.cents, c.c_ts,
               row_number() OVER (
                   PARTITION BY p.p_id
                   ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.c_ts <= p.p_ts
                     AND c.c_ts > p.p_ts - INTERVAL 7 DAY
    )
    SELECT strftime(CAST(c_ts AS DATE), '%Y-%m-%d') AS touch_day,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS attributed_cents
    FROM j WHERE rn = 1
    GROUP BY touch_day
    """
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's most
    recent prior click/view inside a window.
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    j = p.join(c, "user_id").where(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w = Window.partitionBy("p_id").orderBy(
        F.col("c_ts").desc(), F.col("c_id").desc()
    )
    last = j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return last.groupBy(
        F.date_format("c_ts", "yyyy-MM-dd").alias("touch_day")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.sum("cents").alias("attributed_cents"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average — per-user TWAP of `value`, each observation
# weighted by the whole seconds it stays current (until the next event).
# Weights are integer epoch-second gaps and values integer cents, so
# sum(cents*dur) and sum(dur) are exact BIGINT sums; one final double
# division is engine-identical. Users whose observed duration is zero
# (single event) are excluded on both sides. Scale: one user_id window +
# one aggregate, no global state.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               epoch_us(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
               - epoch_us(ts) // 1000000 AS dur
        FROM events
    )
    SELECT user_id,
           CAST(sum(dur) AS BIGINT) AS total_secs,
           round(sum(cents * dur) / (sum(dur) * 100.0), 6) AS twap
    FROM s WHERE dur IS NOT NULL
    GROUP BY user_id HAVING sum(dur) > 0
    """
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each reading weighted by its
    holding duration to the next event.
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (
            F.unix_timestamp(F.lead("ts").over(w))
            - F.unix_timestamp(F.col("ts"))
        ).alias("dur"),
    ).where(F.col("dur").isNotNull())
    return (
        s.groupBy("user_id")
        .agg(
            F.sum("dur").alias("total_secs"),
            F.round(
                F.sum(F.col("cents") * F.col("dur"))
                / (F.sum("dur") * F.lit(100.0)),
                6,
            ).alias("twap"),
        )
        .where(F.col("total_secs") > 0)
    )


# ---------------------------------------------------------------------------
# Top-k event paths — the 20 most common "first five event types" journeys.
# The per-user prefix comes from one ordered collect (array_sort over
# (ts, event_id, type) structs — order-free merge), sliced to 5 and
# joined with '>'; the final top-20 is totally ordered (count DESC, path)
# so the row SET is deterministic under ties. Scale: per-user state is
# capped at the full event list; at unbounded per-user history, pre-filter
# to rank<=5 with a row_number window first (same shuffle count).
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT 20
    """
)
def q_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k first-5-event paths: users' opening event-type sequences
    ranked by frequency.
    """
    ev = read_parquet_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
        lambda s: s.event_type,
    )
    paths = first5.groupBy("user_id").agg(
        F.array_join(arr, ">").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct actives — trailing-window COUNT DISTINCT per day,
# rewritten scale-first: COUNT(DISTINCT) over a sliding window has no
# partial-aggregate form, so instead each distinct (user, day) fact emits
# the 7 window-end days it contributes to (sequence + explode), and a
# plain distinct-count per window day finishes it. Two hash shuffles,
# both on high-cardinality keys; the calendar dimension (bounded) is
# broadcast to trim windows that extend past observed days. This is the
# shape that survives 100 TB where `days JOIN facts BETWEEN` (the oracle
# form) degenerates to a range join.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(days.day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_7d
    FROM days JOIN du
      ON du.day BETWEEN days.day - 6 AND days.day
    GROUP BY days.day
    """
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day: distinct-user contributions
    expanded over a day range (no double count).
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    observed = contrib.join(F.broadcast(days), "day", "left_semi")
    return (
        observed.groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "active_7d"
        )
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U — rank-sum test of `value` between click and view
# events, computed WITHOUT a global per-row rank: values quantize to
# cents, counts aggregate per distinct cent value, and average ranks come
# from a running sum over the distinct-value table (bounded by the value
# domain, NOT the corpus — ~50k rows at any scale, so the single-ordered
# window is safe). All rank mass stays in doubled-integer space
# (2*rank is an integer) until the final shared-form z expression.
# Tie-corrected normal approximation.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH s AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
        FROM events WHERE event_type IN ('click', 'view')
    ),
    c AS (
        SELECT v, CAST(count(*) AS BIGINT) AS n, CAST(sum(g) AS BIGINT) AS na
        FROM s GROUP BY v
    ),
    r AS (
        SELECT v, n, na,
               CAST(sum(n) OVER (ORDER BY v) AS BIGINT) - n AS below
        FROM c
    ),
    agg AS (
        SELECT CAST(sum(na * (2 * below + n + 1)) AS BIGINT) AS ra2,
               CAST(sum(na) AS BIGINT) AS n1,
               CAST(sum(n - na) AS BIGINT) AS n2,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(n * n * n - n) AS BIGINT) AS ties
        FROM r
    )
    SELECT n1 AS n_click, n2 AS n_view,
           round((ra2 - 2e0 * n1 * (n1 + 1) / 2e0) / 2e0, 4) AS u_stat,
           round(((ra2 - 2.0 * n1 * (n1 + 1) / 2.0) / 2.0
                  - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                        * ((nn + 1.0) - CAST(ties AS DOUBLE)
                           / (CAST(nn AS DOUBLE) * (nn - 1.0)))), 6) AS z
    FROM agg
    """
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U via rank sums: click vs view value distributions with
    midrank ties (exact cents).
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type").isin("click", "view")).select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g"),
    )
    c = s.groupBy("v").agg(
        F.count("*").alias("n"), F.sum("g").cast("long").alias("na")
    )
    r = c.withColumn(
        "below",
        # bounded: window runs over the distinct-cent-value table (value
        # domain, ~10^4 rows at any corpus size), not the corpus.
        F.sum("n").over(Window.orderBy("v")).cast("long") - F.col("n"),  # bounded
    )
    agg = r.agg(
        F.sum(F.col("na") * (2 * F.col("below") + F.col("n") + 1))
        .cast("long")
        .alias("ra2"),
        F.sum("na").cast("long").alias("n1"),
        F.sum(F.col("n") - F.col("na")).cast("long").alias("n2"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        .cast("long")
        .alias("ties"),
    )
    return agg.selectExpr(
        "n1 AS n_click",
        "n2 AS n_view",
        # 2e0 not 2.0: Spark parses 2.0 as DECIMAL(2,1), which propagates
        # through round() and hands the driver a Decimal cell (r5's one
        # red). 2e0 is DOUBLE in both engines; u_stat is a half-integer,
        # exact in binary64, so the shared formula stays bit-identical.
        "round((ra2 - 2e0 * n1 * (n1 + 1) / 2e0) / 2e0, 4) AS u_stat",
        "round(((ra2 - 2.0 * n1 * (n1 + 1) / 2.0) / 2.0"
        "       - CAST(n1 AS DOUBLE) * n2 / 2.0)"
        "      / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0"
        "             * ((nn + 1.0) - CAST(ties AS DOUBLE)"
        "                / (CAST(nn AS DOUBLE) * (nn - 1.0)))), 6) AS z",
    )


# ---------------------------------------------------------------------------
# OLS via normal equations — two-regressor least squares
# (l_extendedprice ~ l_quantity + l_discount) solved in closed form from
# nine distributive integer sums (quantity units, discount basis points,
# price cents), then one Cramer's-rule expression evaluated from the
# SAME literal formula text in Spark selectExpr and the oracle SQL, so
# both engines run the identical IEEE-754 tree. Scale: the whole
# regression is one partial-aggregable scan — the textbook
# "ML as aggregation" shape; sums fit int64 through ~10^9 rows (promote
# to DECIMAL(38,0) beyond).
# ---------------------------------------------------------------------------
_OLS_SUMS = """
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x1) AS BIGINT) AS sx1,
        CAST(sum(x2) AS BIGINT) AS sx2,
        CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x1 * x1) AS BIGINT) AS s11,
        CAST(sum(x1 * x2) AS BIGINT) AS s12,
        CAST(sum(x2 * x2) AS BIGINT) AS s22,
        CAST(sum(x1 * y) AS BIGINT) AS s1y,
        CAST(sum(x2 * y) AS BIGINT) AS s2y
"""

_OLS_DOUBLES = (
    "CAST(n AS DOUBLE) AS dn, CAST(sx1 AS DOUBLE) AS a1, "
    "CAST(sx2 AS DOUBLE) AS a2, CAST(sy AS DOUBLE) AS ay, "
    "CAST(s11 AS DOUBLE) AS b11, CAST(s12 AS DOUBLE) AS b12, "
    "CAST(s22 AS DOUBLE) AS b22, CAST(s1y AS DOUBLE) AS b1y, "
    "CAST(s2y AS DOUBLE) AS b2y"
)

_OLS_DET = (
    "(dn * (b11 * b22 - b12 * b12) - a1 * (a1 * b22 - b12 * a2)"
    " + a2 * (a1 * b12 - b11 * a2))"
)
_OLS_D0 = (
    "(ay * (b11 * b22 - b12 * b12) - a1 * (b1y * b22 - b12 * b2y)"
    " + a2 * (b1y * b12 - b11 * b2y))"
)
_OLS_D1 = (
    "(dn * (b1y * b22 - b2y * b12) - ay * (a1 * b22 - b12 * a2)"
    " + a2 * (a1 * b2y - b1y * a2))"
)
_OLS_D2 = (
    "(dn * (b11 * b2y - b12 * b1y) - a1 * (a1 * b2y - b1y * a2)"
    " + ay * (a1 * b12 - b11 * a2))"
)

_OLS_BETAS = (
    f"round({_OLS_D0} / {_OLS_DET}, 6) AS beta0_cents",
    f"round({_OLS_D1} / {_OLS_DET}, 6) AS beta1_cents_per_unit",
    f"round({_OLS_D2} / {_OLS_DET}, 6) AS beta2_cents_per_bp",
)


@declared(
    oracle=f"""
    WITH q AS (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
               CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ),
    sums AS (SELECT {_OLS_SUMS} FROM q),
    d AS (SELECT {_OLS_DOUBLES} FROM sums)
    SELECT {', '.join(_OLS_BETAS)} FROM d
    """
)
def q_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS fit of revenue on quantity and discount, solved in
    closed form from exact integer sums.
    """
    li = read_parquet_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1",
        "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y",
    )
    sums = li.agg(
        F.expr("count(*)").cast("long").alias("n"),
        F.expr("sum(x1)").cast("long").alias("sx1"),
        F.expr("sum(x2)").cast("long").alias("sx2"),
        F.expr("sum(y)").cast("long").alias("sy"),
        F.expr("sum(x1 * x1)").cast("long").alias("s11"),
        F.expr("sum(x1 * x2)").cast("long").alias("s12"),
        F.expr("sum(x2 * x2)").cast("long").alias("s22"),
        F.expr("sum(x1 * y)").cast("long").alias("s1y"),
        F.expr("sum(x2 * y)").cast("long").alias("s2y"),
    )
    d = sums.selectExpr(*_OLS_DOUBLES.split(", "))
    return d.selectExpr(*_OLS_BETAS)


# ---------------------------------------------------------------------------
# Interval merge — coalesce each user's overlapping 5-minute activity
# spans into maximal intervals (the "merge overlapping intervals"
# classic): a span starts a new interval iff its start exceeds the
# running max of all previous ends; interval ids are the running sum of
# those flags. Covered time sums exact integer microseconds. Scale: two
# stacked windows on the same (user_id, ts) ordering — one shuffle.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH s AS (
        SELECT user_id, ts AS start, ts + INTERVAL 5 MINUTE AS fin,
               event_id
        FROM events
    ),
    f AS (
        SELECT user_id, start, fin, event_id,
               CASE WHEN start > max(fin) OVER (
                        PARTITION BY user_id ORDER BY start, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_flag
        FROM s
    ),
    g AS (
        SELECT user_id, start, fin,
               sum(new_flag) OVER (
                   PARTITION BY user_id ORDER BY start, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
        FROM f
    ),
    i AS (
        SELECT user_id, iid,
               epoch_us(max(fin)) - epoch_us(min(start)) AS span_us
        FROM g GROUP BY user_id, iid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(span_us) AS BIGINT) AS covered_us
    FROM i GROUP BY user_id
    """
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge: per-user 5-minute event intervals
    coalesced by the running-max-end island method.
    """
    ev = read_parquet_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("fin"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("start", "event_id")
    prev_end = F.max("fin").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "new_flag",
        F.when(F.col("start") > prev_end, 1).otherwise(0),
    )
    wi = Window.partitionBy("user_id").orderBy("start", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grouped = flagged.withColumn("iid", F.sum("new_flag").over(wi))
    intervals = grouped.groupBy("user_id", "iid").agg(
        (
            F.expr("unix_micros(max(fin))") - F.expr("unix_micros(min(start))")
        ).alias("span_us")
    )
    return intervals.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("span_us").cast("long").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival — time from first signup to first subsequent
# purchase per user, right-censored at the corpus observation end. The
# survival curve multiplies (1 - d/n) factors in time order; because a
# windowed cumulative PRODUCT has no builtin, the factor prefix is
# collected per row (ordered-frame collect_list over the
# calendar-bounded distinct-duration table) and folded left-to-right —
# identical multiply sequence on both engines, so bit-identical curves.
# Scale: everything after the per-user min-aggregation lives on the
# distinct-duration table (bounded by the calendar, not the corpus).
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH su AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN su ON su.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
        GROUP BY e.user_id
    ),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    d AS (
        SELECT su.user_id,
               (epoch_us(coalesce(pu.p_ts, obs.end_ts))
                - epoch_us(su.s_ts)) // 86400000000 AS t_days,
               CASE WHEN pu.p_ts IS NULL THEN 0 ELSE 1 END AS died
        FROM su LEFT JOIN pu ON su.user_id = pu.user_id CROSS JOIN obs
    ),
    per_t AS (
        SELECT t_days, CAST(count(*) AS BIGINT) AS m,
               CAST(sum(died) AS BIGINT) AS deaths
        FROM d GROUP BY t_days
    ),
    risk AS (
        SELECT t_days, m, deaths,
               CAST(sum(m) OVER () AS BIGINT)
               - CAST(sum(m) OVER (ORDER BY t_days) AS BIGINT)
               + m AS at_risk
        FROM per_t
    ),
    fac AS (
        SELECT t_days, deaths, at_risk,
               1.0 - CAST(deaths AS DOUBLE) / at_risk AS factor
        FROM risk
    ),
    pre AS (
        SELECT t_days, deaths, at_risk,
               list(factor) OVER (
                   ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
        FROM fac
    )
    SELECT t_days, deaths, at_risk,
           list_reduce(fs, (a, b) -> a * b) AS survival
    FROM pre
    """
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of signup-to-purchase conversion with
    right-censoring at horizon.
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    obs = ev.agg(F.max("ts").alias("end_ts"))
    d = (
        su.join(pu, "user_id", "left")
        .join(F.broadcast(obs))
        .select(
            F.expr(
                "(unix_micros(coalesce(p_ts, end_ts)) - unix_micros(s_ts))"
                " div 86400000000"
            ).alias("t_days"),
            F.when(F.col("p_ts").isNull(), 0).otherwise(1).alias("died"),
        )
    )
    per_t = d.groupBy("t_days").agg(
        F.count("*").alias("m"), F.sum("died").cast("long").alias("deaths")
    )
    # bounded: distinct durations are calendar-bounded, not corpus-scaled.
    w_all = Window.orderBy("t_days").rowsBetween(  # bounded
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = Window.orderBy("t_days")  # bounded
    risk = per_t.select(
        "t_days",
        "m",
        "deaths",
        (
            F.sum("m").over(w_all).cast("long")
            - F.sum("m").over(w_run).cast("long")
            + F.col("m")
        ).alias("at_risk"),
    )
    fac = risk.withColumn(
        "factor", F.lit(1.0) - F.col("deaths").cast("double") / F.col("at_risk")
    )
    w_pre = Window.orderBy("t_days").rowsBetween(  # bounded
        Window.unboundedPreceding, Window.currentRow
    )
    pre = fac.withColumn("fs", F.collect_list("factor").over(w_pre))
    surv = F.aggregate(
        F.slice(F.col("fs"), 2, F.greatest(F.size("fs") - 1, F.lit(0))),
        F.element_at(F.col("fs"), 1),
        lambda a, b: a * b,
    )
    # raw double, not round(,6): the factor product folds the identical
    # IEEE op sequence on both engines (factors are exact divisions of
    # exact ints), and round() itself is the cross-engine hazard — the
    # q_ewma second-seed sf0.1 catch (round 8, NOTES.md)
    return pre.select("t_days", "deaths", "at_risk", surv.alias("survival"))


# ---------------------------------------------------------------------------
# Robust outliers — per-event-type median + MAD over integer cents, and
# the count of modified-z outliers (|0.6745·(x-med)/MAD| > 3.5,
# Iglewicz-Hoaglin). Exact medians over integers interpolate to halves
# (binary-exact), so the two-pass median-of-absolute-deviations is
# engine-identical; the outlier predicate shares its literal expression
# text. Scale: exact percentile keeps a per-group value-count map —
# bounded by the cent domain; the med/MAD table (5 rows) broadcasts
# back for the outlier count.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    med AS (
        SELECT event_type, median(cents) AS med FROM s GROUP BY event_type
    ),
    mad AS (
        SELECT s.event_type, any_value(med.med) AS med,
               median(abs(s.cents - med.med)) AS mad
        FROM s JOIN med ON s.event_type = med.event_type
        GROUP BY s.event_type
    )
    SELECT s.event_type,
           any_value(mad.med) AS med_cents,
           any_value(mad.mad) AS mad_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN 0.6745 * abs(s.cents - mad.med) / mad.mad > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM s JOIN mad ON s.event_type = mad.event_type
    GROUP BY s.event_type
    """
)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-scores per event type; |z| > 3.5 outliers
    flagged (exact integer cents).
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    med = s.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5D)").alias("med")
    )
    mad = (
        s.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(cents - med), 0.5D)").alias("mad"),
        )
    )
    return (
        s.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med_cents"),
            F.first("mad").alias("mad_cents"),
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.expr("0.6745 * abs(cents - med) / mad > 3.5"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Resource-allocation link prediction — for customer pairs sharing
# purchased parts, score = Σ_shared 1/degree(part), in exact fixed-point
# micro-units (floor(1e6/deg) is an integer, so the pair sum is
# order-independent). Degree blocking (2..50 users per part) bounds the
# per-part pair fan-out — the standard guard that keeps the self-join
# linear in shared-part mass rather than quadratic in the hottest key.
# Top-100 under a total order.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH up AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (
        SELECT p, CAST(count(*) AS BIGINT) AS deg FROM up GROUP BY p
    ),
    keep AS (SELECT p, deg FROM deg WHERE deg BETWEEN 2 AND 50),
    pairs AS (
        SELECT a.u AS u1, b.u AS u2,
               CAST(floor(1000000.0 / k.deg) AS BIGINT) AS w
        FROM up a JOIN up b ON a.p = b.p AND a.u < b.u
        JOIN keep k ON k.p = a.p
    )
    SELECT u1, u2,
           CAST(sum(w) AS BIGINT) AS score_micro,
           CAST(count(*) AS BIGINT) AS shared_parts
    FROM pairs GROUP BY u1, u2
    ORDER BY score_micro DESC, u1, u2 LIMIT 100
    """
)
def q_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction: candidate part pairs scored by
    sum(1/deg) over shared customers (degree-capped).
    """
    o = read_parquet_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    up = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # Pair enumeration WITHOUT a self-join: one aggregation collects each
    # kept part's (bounded, ≤50) user list, and the C(deg,2) pairs expand
    # narrowly from the materialized array — the base join+distinct is
    # computed once instead of once per self-join side, and the only other
    # shuffle is the final per-pair score aggregation. (Measured: fusing
    # the dedup into a collect_set groupBy is SLOWER — 7.4s vs 5.5s at
    # sf0.1 — because hash-distinct of near-distinct rows is cheaper than
    # object-set partial aggregation, and the saved shuffle is ~10 MB.)
    per_part = (
        up.groupBy("p")
        .agg(
            F.array_sort(F.collect_list("u")).alias("us"),
            F.count("*").alias("deg"),
        )
        .where(F.col("deg").between(2, 50))
        .withColumn("w", F.expr("CAST(floor(1000000.0 / deg) AS BIGINT)"))
    )
    # Pairs travel as ONE packed BIGINT (u1·2^32 + u2) — a long-keyed
    # hash aggregate is ~10× faster than the equivalent struct-keyed
    # one, and the shuffle row shrinks to 16 bytes. The u<2^31 / v<2^32
    # injectivity bound is ENFORCED by pack_pair's assert_true guard
    # (ADVICE r10: custkeys beyond 2^31 would otherwise corrupt pairs
    # silently at exactly the scale this plan targets). Unpack with
    # exact integer div/mod (no double round-trip).
    pair_arr = F.flatten(
        F.transform(
            F.col("us"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("us"), i + 2, F.greatest(F.size("us") - i - 1, F.lit(0))
                ),
                lambda y: pack_pair(x, y),
            ),
        )
    )
    pairs = per_part.select("w", F.explode(pair_arr).alias("uu"))
    u1_dec, u2_dec = unpack_pair("uu")
    return (
        pairs.groupBy("uu")
        .agg(
            F.sum("w").cast("long").alias("score_micro"),
            F.count("*").alias("shared_parts"),
        )
        .select(
            u1_dec.alias("u1"),
            u2_dec.alias("u2"),
            "score_micro",
            "shared_parts",
        )
        .orderBy(F.col("score_micro").desc(), "u1", "u2")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Winsorized mean — per event_type, clamp cents into the exact
# [p05, p95] percentile bounds (quantized back to whole cents so the
# clipped sum stays an order-independent integer) and report the
# winsorized mean. The 5-row bounds table broadcasts back. Scale: exact
# percentile state is bounded by the cent domain; swap approx_percentile
# in where the domain is unbounded.
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    b AS (
        SELECT event_type,
               CAST(floor(quantile_cont(cents, 0.05)) AS BIGINT) AS lo,
               CAST(floor(quantile_cont(cents, 0.95)) AS BIGINT) AS hi
        FROM s GROUP BY event_type
    )
    SELECT s.event_type, any_value(b.lo) AS lo_cents,
           any_value(b.hi) AS hi_cents,
           round(CAST(sum(least(greatest(s.cents, b.lo), b.hi)) AS BIGINT)
                 / (count(*) * 100.0), 6) AS wins_mean
    FROM s JOIN b ON s.event_type = b.event_type
    GROUP BY s.event_type
    """
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at p05/p95 per event type: clamped means beside raw
    means (exact quantile cut points).
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    b = s.groupBy("event_type").agg(
        F.expr("CAST(floor(percentile(cents, 0.05D)) AS BIGINT)").alias("lo"),
        F.expr("CAST(floor(percentile(cents, 0.95D)) AS BIGINT)").alias("hi"),
    )
    return (
        s.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("lo").alias("lo_cents"),
            F.first("hi").alias("hi_cents"),
            F.round(
                F.sum(F.least(F.greatest("cents", F.col("lo")), F.col("hi")))
                .cast("long")
                / (F.count("*") * F.lit(100.0)),
                6,
            ).alias("wins_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Spend deciles — users bucketed by total purchase spend into 10 bands.
# Deliberately NOT ntile(): a global ntile is a single-partition sort
# over every user. Instead the 9 exact decile boundaries (one bounded
# aggregate) broadcast back and each user buckets by comparison —
# embarrassingly parallel, same result set semantics (boundary ties land
# in the lower band on both engines, since bucketing is a pure
# comparison against identical doubles).
# ---------------------------------------------------------------------------
@declared(
    oracle="""
    WITH spend AS (
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    b AS (
        SELECT quantile_cont(cents, [0.1, 0.2, 0.3, 0.4, 0.5,
                                     0.6, 0.7, 0.8, 0.9]) AS qs
        FROM spend
    ),
    dec AS (
        SELECT s.user_id, s.cents,
               1 + len(list_filter(b.qs, q -> q < s.cents)) AS decile
        FROM spend s CROSS JOIN b
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM dec GROUP BY decile
    """
)
def q_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles: per-user purchase cents bucketed by
    ntile(10) with decile boundary stats.
    """
    ev = read_parquet_table(spark, sf_dir, "events")
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    b = spend.agg(
        F.expr(
            "percentile(cents, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D,"
            " 0.6D, 0.7D, 0.8D, 0.9D))"
        ).alias("qs")
    )
    dec = spend.join(F.broadcast(b)).select(
        "user_id",
        "cents",
        (
            1 + F.size(F.filter("qs", lambda q: q < F.col("cents")))
        ).alias("decile"),
    )
    return dec.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count("*").alias("n_users"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
