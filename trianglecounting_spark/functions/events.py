"""Event-stream analytics over the `events` table — sessionization.

Gap-based sessionization (split a user's event stream wherever the gap to
the previous event exceeds a threshold) is the canonical stateful windowing
op of clickstream/telemetry analytics. The batch form here is two window
functions — lag + a running sum of session-break flags — entirely
JVM-side, shuffling once on user_id; the per-user ordering key is
(ts, event_id), a total order, so session boundaries are deterministic even
under timestamp ties. Timestamps are compared in epoch seconds (exact
integer MICROSECOND diffs in both engines (Spark timestamp_diff / DuckDB
epoch_us) — second-granularity diffs would truncate differently than a
fractional epoch compare on sub-second timestamps.

Structured Streaming's native analogue is ``session_window`` (a watermarked
state-store op — streaming/edges.py holds this repo's streaming state
patterns); at 100 TB the batch form below is ONE shuffle keyed on user_id,
with AQE handling hot users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user gap sessions. Output one row per session:
    ``(user_id, session_no, start_ts, end_ts, n_events, sum_value)`` with
    timestamps rendered as strings (engine-portable hashing, same convention
    as the events_hourly lane) and sum_value rounded to 6dp."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev = F.lag(F.col("ts")).over(w)
    brk = (
        F.when(
            prev.isNull()
            | (F.timestamp_diff("MICROSECOND", prev, F.col("ts")) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    flagged = events.select(
        "user_id", "ts", "event_id", "value", brk.alias("__brk")
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("__brk").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return sess.groupBy("user_id", "session_no").agg(
        F.date_format(F.min("ts"), fmt).alias("start_ts"),
        F.date_format(F.max("ts"), fmt).alias("end_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def sessionize_sql(gap_minutes: int = 30, events_sql: str = "events") -> str:
    """DuckDB twin of ``sessionize`` — identical ordering key, gap rule,
    running-sum session numbering, and output rendering."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
         THEN 1 ELSE 0 END AS brk
  FROM {events_sql}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
      ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM o
)
SELECT user_id, session_no,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
  CAST(count(*) AS BIGINT) AS n_events,
  round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no
""".strip()


def event_transition_graph(events: DataFrame) -> DataFrame:
    """Markov transition graph of the event stream: one weighted directed
    edge per ordered pair of CONSECUTIVE events within a user's stream —
    the sequence-mining front door (funnel analysis, next-event prediction,
    anomalous-flow detection), and a second deterministic edge source for
    the graph engine: its output feeds ``pagerank_weighted`` / ``scc`` /
    ``salsa`` unchanged.

        src = event_type of step k, dst = event_type of step k+1
        n   = #occurrences of that transition (exact integer)
        p   = n / Σ_dst n   (row-stochastic transition probability, 6dp)

    Ordering inside a user is the TOTAL key (ts, event_id) — deterministic
    under timestamp ties, same contract as :func:`sessionize`. Scale: ONE
    shuffle keyed on user_id (the lag window), then a map-side-combined
    count keyed by the bounded (src, dst) type-pair vocabulary and a
    broadcast-sized per-src normalizer join — hot users cost their own
    partition's sort, nothing else.

    Output: ``(src: string, dst: string, n: long, p: double)``.
    No counterpart in /root/reference; events-analytics family.
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    steps = events.select(
        "user_id",
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).where(F.col("src").isNotNull())
    counts = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    norm = counts.groupBy("src").agg(F.sum("n").cast("long").alias("__t"))
    return (
        counts.join(F.broadcast(norm), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / F.col("__t").cast("double"), 6).alias("p"),
        )
    )


def event_transition_graph_sql(events_rel: str = "events") -> str:
    """DuckDB twin of :func:`event_transition_graph` — identical total
    order, counts, and normalization."""
    return (
        "WITH st AS MATERIALIZED (SELECT user_id, event_type AS dst, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS src "
        f"FROM {events_rel}), "
        "c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM st "
        "WHERE src IS NOT NULL GROUP BY src, dst), "
        "t AS (SELECT src, CAST(sum(n) AS BIGINT) AS tt FROM c GROUP BY src) "
        "SELECT c.src, c.dst, c.n, "
        "round(CAST(c.n AS DOUBLE) / CAST(t.tt AS DOUBLE), 6) AS p "
        "FROM c JOIN t USING (src) ORDER BY c.src, c.dst"
    )


def funnel(events: DataFrame,
           steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered conversion funnel: how many users performed ``steps[0]``, then
    ``steps[1]`` strictly after it, then ``steps[2]`` after that, … — the
    canonical product-analytics query over an event stream.

    A user completes step *i* iff events of types ``steps[0..i]`` exist at
    strictly increasing timestamps; matching is greedy-earliest (take the
    MIN qualifying timestamp per step), which decides existence exactly and
    makes the per-user match unique, hence deterministic in both engines.

    Output, one row per step: ``(step, event_type, n_users)`` — all counts
    int64, no floats.

    Scale: step k is one filtered scan of the (type-pruned) events plus an
    equi-join on ``user_id`` against the step-(k−1) user table (|users| rows,
    shrinking monotonically), then a map-side-combinable min/count — no
    windows, no per-user event collection, hot users cost only their own
    aggregate. With ``len(steps)`` fixed this is a constant number of
    user-keyed shuffles regardless of corpus size.
    """
    out = None
    cur = None
    for i, st in enumerate(steps):
        ev = events.where(F.col("event_type") == st).select(
            "user_id", F.col("ts").alias("__ts")
        )
        if i == 0:
            cur = ev.groupBy("user_id").agg(F.min("__ts").alias("t"))
        else:
            cur = (
                ev.join(cur, "user_id")
                .where(F.col("__ts") > F.col("t"))
                .groupBy("user_id")
                .agg(F.min("__ts").alias("t"))
            )
        # lazy localCheckpoint: step k's table is referenced by its own count
        # AND by step k+1's join — without it each step re-evaluates the full
        # chain of previous steps (O(len(steps)²) scans of the event table)
        cur = cur.localCheckpoint(eager=False)
        row = cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(st).alias("event_type"),
            "n_users",
        )
        out = row if out is None else out.unionAll(row)
    return out


def funnel_sql(steps: tuple[str, ...] = ("view", "click", "purchase"),
               events_rel: str = "events") -> str:
    """DuckDB twin of :func:`funnel` — the same greedy-earliest step chain
    as explicit CTEs."""
    parts = []
    for i, st in enumerate(steps, start=1):
        if i == 1:
            parts.append(
                f"fun_s1 AS (SELECT user_id, min(ts) AS t FROM {events_rel} "
                f"WHERE event_type = '{st}' GROUP BY user_id)"
            )
        else:
            parts.append(
                f"fun_s{i} AS (SELECT e.user_id, min(e.ts) AS t "
                f"FROM {events_rel} e JOIN fun_s{i-1} p ON p.user_id = e.user_id "
                f"AND e.ts > p.t WHERE e.event_type = '{st}' GROUP BY e.user_id)"
            )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, '{st}' AS event_type, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM fun_s{i}"
        for i, st in enumerate(steps, start=1)
    )
    return "WITH " + ", ".join(parts) + " " + union
