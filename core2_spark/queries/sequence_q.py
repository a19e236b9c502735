"""Ordered-sequence / event-pattern analytics (MATCH_RECOGNIZE-lite).

The reference's SQL dialect had no row-pattern matching (SQL:2016
MATCH_RECOGNIZE), but ordered-sequence detection over an event log is
a core analytics capability any engine replacing it at scale needs —
funnel analysis and consecutive-run detection are the two canonical
shapes.  Both compile to plain joins/windows (no per-row UDFs), so
they get full DuckDB value oracles like every relational query.

Scale notes: the funnel is K successive (groupBy user + join on user)
stages — all shuffles share the user_id key, so at 100 TB the stages
stay co-partitioned after the first exchange; each stage's event scan
pushes its event_type filter to Parquet.  The run detector is the
gaps-and-islands window pattern: two ordered windows and an
aggregation, all partitioned by user_id, output bounded by user count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")
_HORIZON = "INTERVAL 3 DAYS"  # per-stage conversion window


@query(
    "events_funnel_ordered",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
               WHERE event_type='signup' GROUP BY 1),
    v AS (SELECT e.user_id, MIN(e.ts) AS v_ts FROM events e
          JOIN s ON e.user_id=s.user_id
           AND e.ts > s.s_ts AND e.ts <= s.s_ts + INTERVAL 3 DAYS
          WHERE e.event_type='view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
          JOIN v ON e.user_id=v.user_id
           AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 3 DAYS
          WHERE e.event_type='click' GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
          JOIN c ON e.user_id=c.user_id
           AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 3 DAYS
          WHERE e.event_type='purchase' GROUP BY 1)
    SELECT 1 AS stage_idx, 'signup' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM s
    UNION ALL SELECT 2, 'view', COUNT(*) FROM v
    UNION ALL SELECT 3, 'click', COUNT(*) FROM c
    UNION ALL SELECT 4, 'purchase', COUNT(*) FROM p
    ORDER BY stage_idx
    """,
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: per user, the first signup, then the
    first view/click/purchase each STRICTLY AFTER the previous stage's
    event and within a 3-day horizon of it — order matters, so this is
    sequence matching, not set membership.  Emits per-stage completion
    counts (all-integer, engine-exact).  Compiled by the reusable
    operator (operators/sequences.py), which the randomized sequence
    differential (tests/test_random_sequences.py) drives with random
    stage chains and horizons."""
    from core2_spark.operators.sequences import funnel

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return funnel(ev, list(_FUNNEL_STAGES), horizon=_HORIZON)


@query(
    "events_error_burst_runs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), err AS (
      SELECT user_id, rn,
             rn - ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY rn) AS grp
      FROM seq WHERE event_type = 'error'
    ), runs AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM err GROUP BY user_id, grp
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_bursts,
           MAX(run_len) AS max_run
    FROM runs WHERE run_len >= 3
    GROUP BY user_id
    ORDER BY n_bursts DESC, max_run DESC, user_id
    """,
)
def events_error_burst_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-run detection (gaps-and-islands): users whose event
    stream contains runs of >= 3 back-to-back 'error' events with no
    other event type between — the MATCH_RECOGNIZE `X{3,}` shape via
    two ordered windows (global row number minus per-class row number
    is constant within a run).  Deterministic ordering ties broken by
    event_id; output bounded by user count at any scale.  Compiled by
    the reusable operator (operators/sequences.py)."""
    from core2_spark.operators.sequences import consecutive_runs

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return consecutive_runs(ev, "error", min_run=3)
