"""Skew handling invariance + streaming ingestion micro-batch semantics."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from trianglecounting_spark.operators.normalize import degrees, orient_dodg
from trianglecounting_spark.operators.skew import (
    capped_adjacency,
    salted_count,
    salted_degrees,
)
from trianglecounting_spark.sources import generators as g
from trianglecounting_spark.streaming.edges import (
    edge_rate_per_window,
    normalize_stream,
    stream_raw_edges,
)


def test_salted_degrees_equal_plain(spark):
    """Salting must not change results (property test, SURVEY.md §7 step 3)."""
    e = g.star_graph(spark, 500)  # deg(0)=499: the skew fixture
    plain = {r.v: r.deg for r in degrees(e).collect()}
    salted = {r.v: r.deg for r in salted_degrees(e, salts=8).collect()}
    assert plain == salted


def test_salted_count_generic(spark):
    df = spark.range(1000).select((F.col("id") % 3).alias("k"))
    got = {r.k: r.cnt for r in salted_count(df, "k", salts=16).collect()}
    assert got == {0: 334, 1: 333, 2: 333}


def test_capped_adjacency_splits_hubs(spark):
    e = g.star_graph(spark, 300)
    directed = e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    adj = capped_adjacency(directed, cap=100).collect()
    hub_rows = [r for r in adj if r.src == 0]
    assert len(hub_rows) == 3  # 299 neighbors hash-spread over ⌈299/100⌉ chunks
    all_nbrs = sorted(x for r in hub_rows for x in r.nbrs)
    assert all_nbrs == list(range(1, 300))  # counts invariant: no loss, no dup
    # hash chunks are ~cap in EXPECTATION; assert no chunk degenerates to the
    # whole hub (the property the old single-window implementation violated
    # upstream: the full list went through one task)
    assert all(len(r.nbrs) <= 2 * 100 for r in hub_rows)
    # deterministic: same chunk assignment on re-run
    again = capped_adjacency(directed, cap=100).collect()
    assert sorted((r.src, r.part, tuple(r.nbrs)) for r in adj) == sorted(
        (r.src, r.part, tuple(r.nbrs)) for r in again
    )


def test_capped_adjacency_mega_hub_no_single_reducer(spark):
    """A 100k-degree hub must land in many chunks, each far below the hub's
    degree — the skew guarantee at 10^8-degree web-hub scale."""
    e = g.star_graph(spark, 100_001)
    directed = e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    sizes = (
        capped_adjacency(directed, cap=4096)
        .where(F.col("src") == 0)
        .select(F.size("nbrs").alias("sz"))
        .collect()
    )
    assert len(sizes) == 25  # ⌈100000/4096⌉
    assert sum(r.sz for r in sizes) == 100_000
    assert max(r.sz for r in sizes) < 2 * 4096


def test_dodg_bounds_out_degree_on_star(spark):
    """Orientation sends the hub's edges *into* the hub (leaves have lower
    degree) — out-degree is bounded, the kernel group for the hub is empty."""
    e = g.star_graph(spark, 1000)
    d = orient_dodg(e)
    out = d.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert out == 1  # every leaf points at the hub


def test_streaming_normalize_and_rate(spark, tmp_path):
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    batch = spark.createDataFrame(
        [(2, 1, "2024-01-01 00:00:10"), (1, 2, "2024-01-01 00:00:20"),
         (3, 3, "2024-01-01 00:01:05"), (4, 5, "2024-01-01 00:01:30")],
        "src long, dst long, ts_s string",
    ).select("src", "dst", F.col("ts_s").cast("timestamp").alias("ts"))
    batch.write.mode("overwrite").parquet(str(src_dir))

    raw = stream_raw_edges(spark, str(src_dir))
    q = (
        normalize_stream(raw)
        .writeStream.format("memory")
        .queryName("norm_edges")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = sorted((r.u, r.v) for r in spark.sql("select * from norm_edges").collect())
    assert rows == [(1, 2), (1, 2), (4, 5)]  # self-loop dropped; same-(u,v) diff ts kept

    q2 = (
        edge_rate_per_window(raw, "1 minute")
        .writeStream.format("memory")
        .queryName("edge_rate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    rates = {
        str(r.window_start): r.n_edges
        for r in spark.sql("select * from edge_rate").collect()
    }
    assert sum(rates.values()) == 4
    assert len(rates) == 2


def test_streaming_stateful_dedup(spark, tmp_path):
    """State-store dedup: duplicates across micro-batch history are dropped
    without rescanning the table (O(1)/row vs the anti-join's O(history))."""
    from trianglecounting_spark.streaming.edges import (
        append_to_edge_table_stateful,
        normalize_stream,
        stream_raw_edges,
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    b1 = spark.createDataFrame(
        [(1, 2, "2024-01-01 00:00:10"), (3, 4, "2024-01-01 00:00:20")],
        "src long, dst long, ts_s string",
    ).select("src", "dst", F.col("ts_s").cast("timestamp").alias("ts"))
    b2 = spark.createDataFrame(
        [(2, 1, "2024-01-01 00:05:00"), (5, 6, "2024-01-01 00:05:10")],
        "src long, dst long, ts_s string",
    ).select("src", "dst", F.col("ts_s").cast("timestamp").alias("ts"))
    b1.write.parquet(str(src_dir / "f1"))
    b2.write.parquet(str(src_dir / "f2"))

    raw = stream_raw_edges(spark, str(src_dir) + "/*")
    q = (
        append_to_edge_table_stateful(
            normalize_stream(raw), str(tmp_path / "tbl"), str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted((r.u, r.v) for r in spark.read.parquet(str(tmp_path / "tbl")).collect())
    assert rows == [(1, 2), (3, 4), (5, 6)]  # (2,1) deduped against (1,2)


def test_streaming_degrees_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator: cumulative per-vertex degree via
    applyInPandasWithState; final state equals the static batch degrees."""
    from trianglecounting_spark.streaming.edges import (
        stream_raw_edges,
        streaming_degrees,
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    batch = spark.createDataFrame(
        [(0, 1, "2024-01-01 00:00:01"), (0, 2, "2024-01-01 00:00:02"),
         (1, 2, "2024-01-01 00:00:03"), (0, 3, "2024-01-01 00:00:04")],
        "src long, dst long, ts_s string",
    ).select("src", "dst", F.col("ts_s").cast("timestamp").alias("ts"))
    batch.write.parquet(str(src_dir / "f1"))

    q = (
        streaming_degrees(stream_raw_edges(spark, str(src_dir) + "/*"))
        .writeStream.format("memory")
        .queryName("sdeg")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits per-batch rows; cumulative degree is monotone → max
    rows = spark.sql("select v, max(deg) as deg from sdeg group by v").collect()
    got = {r.v: r.deg for r in rows}
    assert got == {0: 3, 1: 2, 2: 2, 3: 1}


def test_streaming_stateful_dedup_survives_restart(spark, tmp_path):
    """The state store must recover from the checkpoint across query
    restarts: an edge seen before the restart is still deduped after it."""
    from trianglecounting_spark.streaming.edges import (
        append_to_edge_table_stateful,
        normalize_stream,
        stream_raw_edges,
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")

    def run_once():
        raw = stream_raw_edges(spark, str(src_dir) + "/*")
        q = (
            append_to_edge_table_stateful(normalize_stream(raw), tbl, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = spark.createDataFrame(
        [(1, 2, "2024-01-01 00:00:10"), (3, 4, "2024-01-01 00:00:20")],
        "src long, dst long, ts_s string",
    ).select("src", "dst", F.col("ts_s").cast("timestamp").alias("ts"))
    b1.write.parquet(str(src_dir / "f1"))
    run_once()  # first lifetime: seeds the state store

    # second lifetime: re-sends (1,2) (reversed) + a new edge
    b2 = spark.createDataFrame(
        [(2, 1, "2024-01-01 01:00:00"), (7, 8, "2024-01-01 01:00:10")],
        "src long, dst long, ts_s string",
    ).select("src", "dst", F.col("ts_s").cast("timestamp").alias("ts"))
    b2.write.parquet(str(src_dir / "f2"))
    run_once()

    rows = sorted((r.u, r.v) for r in spark.read.parquet(tbl).collect())
    assert rows == [(1, 2), (3, 4), (7, 8)]  # (2,1) deduped ACROSS the restart


def test_streaming_maintained_triangle_count(spark, tmp_path):
    """The incremental foreachBatch sink keeps the sidecar count equal to an
    exact kernel recount of the accumulated table across multiple drains
    (each drain = a new micro-batch against the grown graph)."""
    from trianglecounting_spark.operators.normalize import normalize_edges
    from trianglecounting_spark.operators.triangles import triangle_count_kernel
    from trianglecounting_spark.sources import generators as g
    from trianglecounting_spark.streaming.edges import (
        maintain_triangle_count,
        normalize_stream,
        read_maintained_triangle_count,
        stream_raw_edges,
    )

    e = normalize_edges(g.rmat_graph(spark, scale=7, edge_factor=8)).collect()
    half = len(e) // 2
    src_dir, tbl, ckpt = (str(tmp_path / x) for x in ("src", "tbl", "ckpt"))

    def drain(rows, fname):
        spark.createDataFrame(
            [(r.u, r.v, "2024-01-01 00:00:00") for r in rows],
            "src long, dst long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "append"
        ).parquet(src_dir)
        q = maintain_triangle_count(
            normalize_stream(stream_raw_edges(spark, src_dir)), tbl, ckpt
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    drain(e[:half], "b0")
    drain(e[half:], "b1")
    table = spark.read.parquet(tbl)
    expected = triangle_count_kernel(table.select("u", "v")).collect()[0].triangles
    assert read_maintained_triangle_count(tbl) == expected
    assert table.count() == len(e)


def test_maintain_triangle_count_fresh_checkpoint_raises(spark, tmp_path):
    """Pointing a FRESH checkpoint at an existing table+sidecar must raise:
    batch_id would restart at 0 <= the sidecar's recorded batch_id, so every
    delta would be silently skipped while appends continue (ADVICE r3)."""
    import pytest as _pytest

    from trianglecounting_spark.streaming.edges import (
        maintain_triangle_count,
        normalize_stream,
        read_maintained_triangle_count,
        stream_raw_edges,
    )

    src_dir, tbl, ckpt = (str(tmp_path / x) for x in ("src", "tbl", "ckpt"))
    spark.createDataFrame(
        [(1, 2, "2024-01-01 00:00:00"), (2, 3, "2024-01-01 00:00:00"),
         (1, 3, "2024-01-01 00:00:00")],
        "src long, dst long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "append"
    ).parquet(src_dir)
    q = maintain_triangle_count(
        normalize_stream(stream_raw_edges(spark, src_dir)), tbl, ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert read_maintained_triangle_count(tbl) == 1
    # resuming the SAME checkpoint is fine (the supported restart path)
    maintain_triangle_count(
        normalize_stream(stream_raw_edges(spark, src_dir)), tbl, ckpt
    )
    # a fresh checkpoint over the existing table+sidecar must refuse
    with _pytest.raises(ValueError, match="fresh checkpoint"):
        maintain_triangle_count(
            normalize_stream(stream_raw_edges(spark, src_dir)),
            tbl,
            str(tmp_path / "ckpt_fresh"),
        )


def test_streaming_window_drops_late_data_past_watermark(spark, tmp_path):
    """Watermark semantics end-to-end across a restart: drain 1 advances the
    event-time watermark (max ts − 10 min); a row arriving in drain 2 whose
    window closed before that watermark is DROPPED (append mode emits the
    closed window from drain-1 state only), while in-order drain-2 rows keep
    accumulating. This is the late-arrival contract a crawl-ingest pipeline
    relies on for bounded state."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir()

    def write_rows(rows, mode):
        spark.createDataFrame(rows, "src long, dst long, ts_s string").select(
            "src", "dst", F.col("ts_s").cast("timestamp").alias("ts")
        ).write.mode(mode).parquet(str(src))

    def drain():
        q = (
            edge_rate_per_window(stream_raw_edges(spark, str(src)), "1 minute")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # drain 1: two rows in the 00:00 window + one at 00:20 that pushes the
    # watermark to 00:10 (past the 00:00 window's end)
    write_rows(
        [(1, 2, "2024-01-01 00:00:10"), (3, 4, "2024-01-01 00:00:40"),
         (5, 6, "2024-01-01 00:20:00")],
        "overwrite",
    )
    drain()
    # drain 2: one LATE row for the already-expired 00:00 window (must be
    # dropped) + one fresh row at 00:21 (keeps state alive, not yet emitted)
    write_rows([(7, 8, "2024-01-01 00:00:30"), (9, 10, "2024-01-01 00:21:00")], "append")
    drain()

    got = {
        str(r.window_start): r.n_edges
        for r in spark.read.parquet(str(out)).collect()
    }
    # the 00:00 window was emitted with the TWO drain-1 rows only — the late
    # third row never entered it; later windows are still open (unemitted)
    assert got == {"2024-01-01 00:00:00": 2}


def test_streaming_sessions_match_batch_sessionize(spark, tmp_path):
    """Native session_window over an availableNow drain groups exactly like
    the batch gap sessionizer (away from the exact-gap boundary): same
    (user, n_events, sum_value) multiset, and session_end = last ts + gap."""
    from trianglecounting_spark.functions.events import sessionize
    from trianglecounting_spark.streaming.edges import streaming_sessions

    rows = [
        (1, "2024-01-01 10:00:00.25", 7, 1.0),
        (2, "2024-01-01 10:20:00.50", 7, 2.0),
        (3, "2024-01-01 11:10:00.75", 7, 4.0),   # 50-min gap -> new session
        (4, "2024-01-01 09:00:00.10", 8, 8.0),
        (5, "2024-01-01 09:10:00.20", 8, 16.0),
    ]
    src = tmp_path / "events_src"
    src.mkdir()
    batch_df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    batch_df.write.parquet(str(src / "p0"))

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        ).parquet(str(src / "*"))
        q = (
            streaming_sessions(stream, gap_minutes=30, watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sessions_out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    out = tmp_path / "sessions_out"
    # first drain: watermark = max(ts) - 30min = 10:40, so ONLY user 8's
    # session (ended 09:40) has passed it; both user-7 sessions stay open
    # in the state store
    drain()
    first = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    ).parquet(str(out))
    assert [(r.user_id, r.n_events, r.sum_value) for r in first.collect()]         == [(8, 2, 24.0)]
    # a much-later sentinel event advances the watermark past every real
    # session on the next drain (same checkpoint = restart + catch-up)
    spark.createDataFrame(
        [(99, "2024-01-02 00:00:00", 99, 0.0)],
        "event_id long, ts string, user_id long, value double",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value"
    ).write.parquet(str(src / "p1"))
    drain()
    got = sorted(
        (r.user_id, r.n_events, r.sum_value)
        for r in spark.read.parquet(str(out)).collect()
    )
    want = sorted(
        (r.user_id, r.n_events, r.sum_value)
        for r in sessionize(batch_df, gap_minutes=30).collect()
    )
    assert got == want == [(7, 1, 4.0), (7, 2, 3.0), (8, 2, 24.0)]
