"""Corpus-search / entity-resolution / product-analytics operators.

Round-9 continuation widening: the operator shapes a reference user
running training-data + product pipelines would expect beside the
dedup/ANN/curation families, each fully SQL-oracle-paired:

- BM25 ranked retrieval over the documents corpus (operators/bm25.py —
  the lexical-search twin of the kNN embedding family),
- blocked fuzzy entity matching (operators/linkage.py — edit-distance
  record linkage, the supervised cousin of blocked near-dup joins),
- cohort retention and rolling 7-day distinct actives (classic
  product analytics over the events table),
- per-series z-score anomaly detection (decimal-exact moments so the
  threshold compare is bit-identical to the oracle),
- one-sided CUSUM changepoint alarms (operators/cusum.py — a stateful
  recursion compiled to two running windows over exact decimals),
- last-touch attribution through the library as-of join,
- equi-width histogram with broadcast-scalar bounds.

Scale notes are per-query; every quadratic is blocked, every scalar
is a broadcast, every aggregate is map-side combinable.  The
parameterized operators get randomized DuckDB-mirror differentials in
tests/test_random_analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.operators.bm25 import bm25_oracle_sql, bm25_topk
from core2_spark.operators.cusum import cusum_alarms, cusum_oracle_sql
from core2_spark.operators.linkage import (
    blocked_fuzzy_oracle_sql,
    blocked_fuzzy_pairs,
)
from core2_spark.queries.registry import query
from core2_spark.queries.util import EPS, SQL_EPS, sql_quote

# Fixed search terms for the BM25 query: present in the synthetic
# corpus vocabulary with distinct document frequencies.
_BM25_TERMS = ("spark", "merge", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 15


@query(
    "text_bm25_search_topk",
    oracle=bm25_oracle_sql(_BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK),
)
def text_bm25_search_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) ranked retrieval for a fixed 3-term query.

    The lexical-search twin of `knn_brute_force_cosine`, via the
    reusable operator (operators/bm25.py — see there for the scale
    and exactness story); tests/test_random_analytics.py drives the
    same operator with randomized terms/k1/b/topk against generated
    DuckDB mirrors.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return bm25_topk(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK)


@query(
    "entity_fuzzy_match_blocked",
    oracle=blocked_fuzzy_oracle_sql(
        table="customer",
        key_col="c_custkey",
        name_col="c_name",
        block_cols=("c_nationkey",),
        prefix_len=14,
        max_dist=2,
    ),
)
def entity_fuzzy_match_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: candidate pairs within a blocking
    key (nation × 14-char name prefix), matched at Levenshtein ≤ 2,
    via the reusable operator (operators/linkage.py — see there for
    the blocking/scale story; sf1: max block 455 rows → ~30M
    comparisons total vs 11G unblocked).
    tests/test_random_analytics.py drives the operator with randomized
    prefix lengths and thresholds against generated DuckDB mirrors.
    """
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return blocked_fuzzy_pairs(
        c,
        key_col="c_custkey",
        name_col="c_name",
        block_cols=("c_nationkey",),
        prefix_len=14,
        max_dist=2,
    )




def retention_cohorts(
    ev, *, cohort_event: str = "purchase", cohort_min_value: float = 200.0,
    activity_event: str = "purchase", horizon_days: int = 6,
):
    """Parameterized cohort-retention pipeline (the registered query
    fixes cohort=first purchase>200, activity=purchases, horizon=6);
    tests/test_random_analytics.py drives random parameters against a
    generated DuckDB mirror."""
    coh = (
        ev.filter(
            (F.col("event_type") == cohort_event)
            & (F.col("value") > cohort_min_value)
        )
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    )
    act = (
        ev.filter(F.col("event_type") == activity_event)
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    offset = F.datediff(F.col("d"), F.col("cohort_day"))
    ret = (
        coh.join(act, "user_id")
        .filter((F.col("d") >= F.col("cohort_day")) & (offset <= horizon_days))
        .groupBy("cohort_day", offset.cast("int").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    sz = coh.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    return (
        ret.join(sz, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "cohort_size",
            "active_users",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size")
                + F.lit(EPS),
                4,
            ).alias("retention_rate"),
        )
        .orderBy("cohort_day", "day_offset")
    )


def retention_oracle_sql(
    *, cohort_event: str = "purchase", cohort_min_value: float = 200.0,
    activity_event: str = "purchase", horizon_days: int = 6,
) -> str:
    """DuckDB mirror of :func:`retention_cohorts`."""
    return f"""
    WITH coh AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events
        WHERE event_type = {sql_quote(cohort_event)}
          AND value > {cohort_min_value!r}
        GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events
        WHERE event_type = {sql_quote(activity_event)}
    ),
    ret AS (
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, a.d) AS INTEGER) AS day_offset,
               CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_users
        FROM coh c
        JOIN act a
          ON a.user_id = c.user_id
         AND a.d >= c.cohort_day
         AND date_diff('day', c.cohort_day, a.d) <= {horizon_days}
        GROUP BY 1, 2
    ),
    sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
           FROM coh GROUP BY 1)
    SELECT r.cohort_day, r.day_offset, s.cohort_size, r.active_users,
           ROUND(CAST(r.active_users AS DOUBLE) / s.cohort_size + {SQL_EPS}, 4)
               AS retention_rate
    FROM ret r
    JOIN sz s ON s.cohort_day = r.cohort_day
    ORDER BY r.cohort_day, r.day_offset
    """


def rolling_actives(ev, *, window_days: int = 7):
    """Parameterized rolling distinct-actives pipeline; see the
    registered query's docstring for the explode-into-windows shape."""
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    bounds = ev.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    contrib = days.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("k"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("k")).alias("end_day"))
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("end_day") <= F.col("mx"))
        .groupBy("end_day")
        .agg(F.countDistinct("user_id").alias(f"active_users_{window_days}d"))
        .orderBy("end_day")
    )


def rolling_actives_oracle_sql(*, window_days: int = 7) -> str:
    """DuckDB mirror of :func:`rolling_actives`."""
    return f"""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    bounds AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
    contrib AS (
        SELECT user_id, d + CAST(r.k AS INTEGER) AS end_day
        FROM days CROSS JOIN range({window_days}) r(k)
    )
    SELECT c.end_day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_users_{window_days}d
    FROM contrib c CROSS JOIN bounds b
    WHERE c.end_day <= b.mx
    GROUP BY c.end_day
    ORDER BY c.end_day
    """


@query(
    "events_retention_cohorts",
    oracle=retention_oracle_sql(
        cohort_event="purchase",
        cohort_min_value=200.0,
        activity_event="purchase",
        horizon_days=6,
    ),
)
def events_retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users cohorted by the day of their first
    high-value purchase (> 200), tracked over purchase activity for
    offsets 0–6 days, via the parameterized pipeline above (which
    tests/test_random_analytics.py drives with random cohort/activity
    events, thresholds and horizons).

    Product-analytics staple.  Two filtered aggregates over one fact
    scan (cohort assignment + distinct active days), then a per-user
    equi-join bounded by the horizon — the join explodes each cohort
    row into ≤ horizon+1 activity rows, so output stays linear in the
    cohort count.  At 100 TB the activity side is pre-shrunk by the
    DISTINCT (user, day) projection before the shuffle.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return retention_cohorts(
        ev,
        cohort_event="purchase",
        cohort_min_value=200.0,
        activity_event="purchase",
        horizon_days=6,
    )


@query(
    "ts_zscore_anomalies",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                    AS DOUBLE) AS sxx
        FROM events
        WHERE event_type = 'click'
        GROUP BY user_id
    ),
    m AS (
        SELECT user_id,
               sx / n AS mean_v,
               sxx / n - (sx / n) * (sx / n) AS var_v
        FROM s
    )
    SELECT e.event_id, e.user_id, e.value,
           ROUND((e.value - m.mean_v) / sqrt(m.var_v) + {SQL_EPS}, 4) AS zscore
    FROM events e
    JOIN m ON m.user_id = e.user_id
    WHERE e.event_type = 'click'
      AND m.var_v > 0
      AND ABS((e.value - m.mean_v) / sqrt(m.var_v)) > 2.5
    ORDER BY e.event_id
    """,
)
def ts_zscore_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score anomaly detection over click values.

    The per-user mean/variance are computed from DECIMAL(18,6)-exact
    Σx and Σx² (the util.py exactness discipline: the 2-decimal
    fixture values are recovered exactly, summed exactly, and only
    then divided in double), so mean, variance, and every z-score are
    bit-identical to the oracle — the |z| > 2.5 threshold can never
    flip on a last-ulp difference.  One map-side-combinable aggregate
    + one equi-join back to the fact; at 100 TB the moments table is
    |users|-sized and broadcastable.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click")
    dec = F.col("value").cast("decimal(18,6)")
    s = clicks.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    m = s.select(
        "user_id",
        (F.col("sx") / F.col("n")).alias("mean_v"),
        (
            F.col("sxx") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))
        ).alias("var_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.sqrt(F.col("var_v"))
    return (
        clicks.join(F.broadcast(m), "user_id")
        .filter((F.col("var_v") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(z + F.lit(EPS), 4).alias("zscore"),
        )
        .orderBy("event_id")
    )


def histogram_equi_width(df: DataFrame, value: F.Column, *, bins: int = 10) -> DataFrame:
    """Equi-width ``bins``-bin histogram of ``value``.

    Two-pass histogram: a scalar min/max aggregate (1 row, broadcast
    cross join — no driver collect, so the same plan runs unchanged on
    a cluster) then a map-side-combinable count per bin.  Bin edges
    are computed with the identical double expression on both sides,
    so FLOOR can never disagree at a bin boundary.  Degenerate
    all-equal columns (mx == mn) would otherwise hit 0/0 → floor(NaN)
    (NULL bin in Spark, an error in DuckDB's BIGINT cast) — guarded to
    bin 0 identically on both sides.
    """
    mm = df.agg(F.min(value).alias("mn"), F.max(value).alias("mx"))
    bin_id = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    (value - F.col("mn"))
                    * F.lit(float(bins))
                    / (F.col("mx") - F.col("mn"))
                ),
                F.lit(bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bin_id")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(bins))
    return (
        df.crossJoin(F.broadcast(mm))
        .select(bin_id, "mn", "mx")
        .groupBy("bin_id", "mn", "mx")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bin_id",
            F.round(F.col("mn") + F.col("bin_id") * width + F.lit(EPS), 4).alias(
                "bin_lo"
            ),
            F.round(
                F.col("mn") + (F.col("bin_id") + 1) * width + F.lit(EPS), 4
            ).alias("bin_hi"),
            "cnt",
        )
        .orderBy("bin_id")
    )


def histogram_oracle_sql(value_sql: str, *, table: str, bins: int = 10) -> str:
    """DuckDB mirror of :func:`histogram_equi_width` (same guarded
    bin expression, same edge arithmetic)."""
    return f"""
    WITH src AS (SELECT ({value_sql}) AS v FROM {table}),
    mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM src),
    binned AS (
        SELECT CASE WHEN mm.mx > mm.mn
                    THEN LEAST(CAST(FLOOR((src.v - mm.mn) * {float(bins)!r}
                                          / (mm.mx - mm.mn)) AS BIGINT),
                               {bins - 1})
                    ELSE 0 END AS bin_id
        FROM src CROSS JOIN mm
    )
    SELECT b.bin_id,
           ROUND(mm.mn + b.bin_id * (mm.mx - mm.mn) / {float(bins)!r}
                 + {SQL_EPS}, 4) AS bin_lo,
           ROUND(mm.mn + (b.bin_id + 1) * (mm.mx - mm.mn) / {float(bins)!r}
                 + {SQL_EPS}, 4) AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM binned b CROSS JOIN mm
    GROUP BY b.bin_id, mm.mn, mm.mx
    ORDER BY b.bin_id
    """


@query(
    "agg_histogram_equi_width",
    oracle=histogram_oracle_sql("o_totalprice", table="orders"),
)
def agg_histogram_equi_width_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 10-bin histogram of order totals, via the reusable
    helper above (see there for the plan shape and the degenerate
    guard)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return histogram_equi_width(o, F.col("o_totalprice"))


@query(
    "agg_histogram_degenerate",
    oracle=histogram_oracle_sql(
        "CAST(o_orderkey AS DOUBLE) - o_orderkey + 42.5", table="orders"
    ),
)
def agg_histogram_degenerate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-edge twin of `agg_histogram_equi_width`: every value
    identical (mx == mn), which unguarded hits 0/0 → floor(NaN) — a
    NULL bin in Spark but a hard CAST error in DuckDB (divergence
    flagged by the r9 advisor).  Pinned in the driver gate so the
    guard can never regress on one engine only."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return histogram_equi_width(
        o, F.col("o_orderkey").cast("double") - F.col("o_orderkey") + F.lit(42.5)
    )


@query(
    "ts_cusum_changepoint",
    oracle=cusum_oracle_sql(k=5.0, h=50.0),
)
def ts_cusum_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint alarms over per-user click values
    (slack k=5, alarm level h=50 in value units), via the reusable
    operator (operators/cusum.py — see there for how the stateful
    recursion compiles to two running-window passes over exact scaled
    decimals); tests/test_random_analytics.py drives the operator with
    randomized k/h/event-type against generated DuckDB mirrors.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return cusum_alarms(
        ev.filter(F.col("event_type") == "click"),
        series_col="user_id",
        order_col="ts",
        id_col="event_id",
        value_col="value",
        k=5.0,
        h=50.0,
    )


@query(
    "events_attribution_last_touch",
    oracle=f"""
    WITH touches AS (
        SELECT user_id, ts, max_by(event_type, event_id) AS touch_type
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT p.user_id, p.ts, p.value, t.ts AS touch_ts, t.touch_type
        FROM p ASOF LEFT JOIN touches t
          ON p.user_id = t.user_id AND p.ts >= t.ts
    )
    SELECT CASE WHEN touch_ts IS NULL OR touch_ts < ts - INTERVAL 3 DAY
                THEN 'none' ELSE touch_type END AS channel,
           CAST(COUNT(*) AS BIGINT) AS purchases,
           {{dsum}} AS revenue
    FROM j
    GROUP BY 1
    ORDER BY channel
    """.format(dsum="ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"
               f" + {SQL_EPS}, 4)"),
)
def events_attribution_last_touch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent click/view within a 3-day lookback, else
    'none'; revenue rolls up per channel with exact-decimal sums.

    Applies the library as-of join (operators/asof_join.py — the
    union+window matcher, one shuffle on user_id, no range join) to
    the attribution domain; the oracle uses DuckDB's NATIVE ASOF LEFT
    JOIN, so the two independent as-of implementations must agree on
    every match including same-instant and beyond-lookback edges.
    Touches are pre-deduplicated per (user, instant) with max_by for
    a deterministic match on timestamp collisions.
    """
    from core2_spark.operators.asof_join import asof_join
    from core2_spark.queries.util import dsum

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("touch_type"))
        .withColumn("touch_ts", F.col("ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = asof_join(
        purchases,
        touches,
        ts_col="ts",
        by_cols=["user_id"],
        value_cols=["touch_type", "touch_ts"],
        direction="backward",
    )
    channel = F.when(
        F.col("touch_ts").isNull()
        | (F.col("touch_ts") < F.col("ts") - F.expr("INTERVAL 3 DAYS")),
        F.lit("none"),
    ).otherwise(F.col("touch_type"))
    return (
        j.select(channel.alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count("*").alias("purchases"),
            dsum("value", 4).alias("revenue"),
        )
        .orderBy("channel")
    )


@query(
    "events_rolling_7d_actives",
    oracle=rolling_actives_oracle_sql(window_days=7),
)
def events_rolling_7d_actives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users (the WAU curve) per end day.

    Sliding COUNT DISTINCT cannot ride a window frame (distinct state
    is not subtractable), and re-scanning a 7-day range per day is
    quadratic in the window.  The scale-correct shape (rolling_actives
    above, random-window differential in test_random_analytics.py):
    project to distinct (user, day) once, explode each activity day
    into the ≤ window end days it contributes to (a constant ×W
    map-side blowup of the already-deduplicated pairs), then one
    count-distinct per end day.  Linear in |user-days|, two shuffles
    total, any window length.  Trailing windows past the data's last
    day are clipped via a broadcast scalar bound.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return rolling_actives(ev, window_days=7)


def linear_multitouch(
    ev,
    *,
    touch_events: tuple[str, ...] = ("click", "view"),
    purchase_event: str = "purchase",
    lookback_days: int = 3,
):
    """Linear multi-touch attribution: every touch event in the
    lookback shares a purchase's credit equally (1/n of the count and
    of the revenue) — the fractional-credit counterpart of the
    last-touch query.

    Shape: NO JOIN, NO SLIDING FRAME — prefix-sum differences at probe
    rows.  The pair set itself is the enemy: one zipf hot user owning
    20% of sf1 events has ~40k purchases × ~8k in-window touches =
    320M TRUE pairs, so a per-user equi-join + range filter (75 s at
    sf1 zipf vs 0.75 s uniform) and even a windowed interval range
    frame (Spark evaluates sliding frames O(rows × frame-width):
    129 s) both die on that one key.  Interval aggregation that never
    materializes pairs:

    1. ``n_touches(p) = C(p_ts) − C(p_ts − L − 1µs)`` where C is the
       per-user RUNNING count of deduplicated touches — evaluated by
       unioning two zero-weight probe rows per purchase into the touch
       timeline and taking one unbounded-preceding range frame
       (incremental, O(n) per partition in Spark's window exec);
    2. each purchase's credit shares (1/n count, value/n revenue, both
       ×10⁶-scaled exact decimals) form a second per-user timeline
       whose running sums are probed the same way at ``t_ts + L`` and
       ``t_ts − 1µs`` per touch: per-touch credit = S(hi) − S(lo).

    Both probe regroupings are groupBys on unique keys (event_id /
    (user, instant)) — evenly distributed whatever the user skew; the
    zipf probe (scripts/probe_zipf_skew.py) is the regression check,
    tests/test_random_analytics.py the randomized differential.

    Exactness: every share is the identical scaled-decimal division in
    both engines (value×10⁶/n; 10⁶/n for the count credit), running
    sums and their differences are exact decimal algebra, so the
    per-channel totals telescope to the oracle's per-pair sums
    bit-for-bit before the one double division + nudged round.
    """
    from pyspark.sql import Window

    look_us = lookback_days * 86_400 * 1_000_000
    touches = (
        ev.filter(F.col("event_type").isin(*touch_events))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("touch_type"))
        .select("user_id", F.unix_micros("ts").alias("t_ord"), "touch_type")
    )
    purchases = ev.filter(F.col("event_type") == purchase_event).select(
        "event_id", "user_id", F.unix_micros("ts").alias("p_ord"), "value"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ord")
        .rangeBetween(Window.unboundedPreceding, 0)
    )

    # -- pass 1: n_touches per purchase via probes into the touch
    #    timeline (ct=1 on touch rows, 0 on probes; the range-running
    #    frame makes same-instant touches visible to the hi probe) --
    def probe(df, ord_col, kind):
        return df.select(
            "user_id",
            "event_id",
            "p_ord",
            "value",
            ord_col.alias("ord"),
            F.lit(kind).alias("kind"),
            F.lit(0).alias("ct"),
        )

    tl1 = (
        touches.select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("p_ord"),
            F.lit(None).cast("double").alias("value"),
            F.col("t_ord").alias("ord"),
            F.lit(None).cast("string").alias("kind"),
            F.lit(1).alias("ct"),
        )
        .unionByName(probe(purchases, F.col("p_ord"), "hi"))
        .unionByName(probe(purchases, F.col("p_ord") - look_us - 1, "lo"))
        .withColumn("c_run", F.sum("ct").over(w_run))
    )
    n_df = (
        tl1.filter(F.col("kind").isNotNull())
        .groupBy("event_id")
        .agg(
            F.max("user_id").alias("user_id"),
            F.max("p_ord").alias("p_ord"),
            F.max("value").alias("value"),
            (
                F.max(F.when(F.col("kind") == "hi", F.col("c_run")))
                - F.max(F.when(F.col("kind") == "lo", F.col("c_run")))
            ).alias("n_touches"),
        )
        .filter(F.col("n_touches") > 0)
    )
    n_dec = F.col("n_touches").cast("decimal(18,0)")
    shares = n_df.select(
        "user_id",
        F.col("p_ord").alias("ord"),
        (F.lit(1).cast("decimal(18,6)") * F.lit(1000000) / n_dec).alias("s_cnt"),
        (
            F.col("value").cast("decimal(18,6)") * F.lit(1000000) / n_dec
        ).alias("s_rev"),
    )

    # -- pass 2: per-touch credit via probes into the purchase-share
    #    running sums (hi at t+3d includes a purchase AT the horizon;
    #    lo at t−1µs keeps a same-instant purchase creditable) --
    def tprobe(ord_col, kind):
        return touches.select(
            "user_id",
            "t_ord",
            "touch_type",
            ord_col.alias("ord"),
            F.lit(kind).alias("kind"),
            F.lit(None).cast("decimal(18,6)").alias("s_cnt"),
            F.lit(None).cast("decimal(18,6)").alias("s_rev"),
        )

    tl2 = (
        # s_cnt/s_rev keep their raw division scale — the union merely
        # widens the probe rows' null literals to match, so per-share
        # values stay bit-identical to the oracle's division results.
        shares.select(
            "user_id",
            F.lit(None).cast("long").alias("t_ord"),
            F.lit(None).cast("string").alias("touch_type"),
            "ord",
            F.lit(None).cast("string").alias("kind"),
            "s_cnt",
            "s_rev",
        )
        .unionByName(tprobe(F.col("t_ord") + look_us, "hi"))
        .unionByName(tprobe(F.col("t_ord") - 1, "lo"))
        .withColumn("cnt_run", F.sum("s_cnt").over(w_run))
        .withColumn("rev_run", F.sum("s_rev").over(w_run))
    )
    zero = F.lit(0).cast("decimal(28,6)")
    credited = (
        tl2.filter(F.col("kind").isNotNull())
        .groupBy("user_id", "t_ord")
        .agg(
            F.max("touch_type").alias("touch_type"),
            (
                F.coalesce(
                    F.max(F.when(F.col("kind") == "hi", F.col("cnt_run"))), zero
                )
                - F.coalesce(
                    F.max(F.when(F.col("kind") == "lo", F.col("cnt_run"))), zero
                )
            ).alias("c_cnt"),
            (
                F.coalesce(
                    F.max(F.when(F.col("kind") == "hi", F.col("rev_run"))), zero
                )
                - F.coalesce(
                    F.max(F.when(F.col("kind") == "lo", F.col("rev_run"))), zero
                )
            ).alias("c_rev"),
        )
        .filter(F.col("c_cnt") > 0)
    )
    return (
        credited.groupBy(F.col("touch_type").alias("channel"))
        .agg(
            F.round(
                F.sum("c_cnt").cast("double") / F.lit(1000000.0) + F.lit(EPS), 4
            ).alias("credited_purchases"),
            F.round(
                F.sum("c_rev").cast("double") / F.lit(1000000.0) + F.lit(EPS), 4
            ).alias("credited_revenue"),
        )
        .orderBy("channel")
    )


def multitouch_oracle_sql(
    *,
    touch_events: tuple[str, ...] = ("click", "view"),
    purchase_event: str = "purchase",
    lookback_days: int = 3,
) -> str:
    """DuckDB mirror of :func:`linear_multitouch` — deliberately the
    NAIVE join form (per-user equi-join + range filter + per-purchase
    window count), so the prefix-sum algebra is checked against an
    independently-shaped computation."""
    touch_in = ", ".join(sql_quote(t) for t in touch_events)
    return f"""
    WITH touches AS (
        SELECT user_id, ts, max_by(event_type, event_id) AS touch_type
        FROM events WHERE event_type IN ({touch_in})
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = {sql_quote(purchase_event)}
    ),
    j AS (
        SELECT p.event_id, p.value, t.touch_type,
               CAST(COUNT(*) OVER (PARTITION BY p.event_id) AS BIGINT) AS n_touches
        FROM p JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts >= p.ts - INTERVAL {lookback_days} DAY
    )
    SELECT touch_type AS channel,
           ROUND(CAST(SUM(CAST(1 AS DECIMAL(18,6)) * 1000000
                          / CAST(n_touches AS DECIMAL(18,0)))
                      AS DOUBLE) / 1000000.0 + {SQL_EPS}, 4)
               AS credited_purchases,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000
                          / CAST(n_touches AS DECIMAL(18,0)))
                      AS DOUBLE) / 1000000.0 + {SQL_EPS}, 4) AS credited_revenue
    FROM j
    GROUP BY touch_type
    ORDER BY channel
    """


@query(
    "events_attribution_linear_multitouch",
    oracle=multitouch_oracle_sql(
        touch_events=("click", "view"), purchase_event="purchase", lookback_days=3
    ),
)
def events_attribution_linear_multitouch_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear multi-touch attribution over a 3-day lookback, via the
    parameterized prefix-sum operator above (see there for why the
    join form is a zipf-skew time bomb and how probe rows replace it);
    tests/test_random_analytics.py drives random touch/purchase event
    sets and lookbacks against generated join-form DuckDB mirrors."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return linear_multitouch(
        ev,
        touch_events=("click", "view"),
        purchase_event="purchase",
        lookback_days=3,
    )
