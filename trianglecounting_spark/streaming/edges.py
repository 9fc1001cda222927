"""Streaming ingestion: micro-batch edge normalization + windowed edge rates.

The reference is strictly batch (SURVEY.md §2.6) — this module is the engine's
forward-looking ingestion path for a crawl that *streams* pages/edges in: the
same normalization semantics exposed over readStream, plus a watermarked
windowed aggregation of edge-arrival rates. Exact global triangle counting
stays a batch job over the checkpointed edge table (triangle count is not
incrementally maintainable without O(m) state; the literature's streaming
variants are approximate — REPT, see PAPERS.md — and the north_rule demands
exact counts).

Pattern: readStream (parquet/file source) → normalize columns →
dropDuplicates within watermark → append to the canonical edge table;
`foreachBatch` gives each micro-batch the full batch API (the dedup against
the historical table is a per-batch anti-join).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import DataStreamWriter


def stream_raw_edges(spark: SparkSession, path: str, schema: str = "src long, dst long, ts timestamp") -> DataFrame:
    """File-source stream of raw (src, dst, ts) rows."""
    return spark.readStream.schema(schema).parquet(path)


def _is_resumable_checkpoint(checkpoint: str) -> bool:
    """True only if ``checkpoint`` holds actual Structured Streaming state —
    an ``offsets/`` dir with at least one entry, or a ``metadata`` file. A
    merely-existing empty directory (pre-created by ``mkdir -p`` or tooling)
    is FRESH: the query would restart batch_id at 0, so the misuse guards
    below must treat it exactly like a nonexistent path."""
    import os

    offsets = os.path.join(checkpoint, "offsets")
    if os.path.isdir(offsets) and os.listdir(offsets):
        return True
    return os.path.exists(os.path.join(checkpoint, "metadata"))


def normalize_stream(raw: DataFrame) -> DataFrame:
    """Same canonicalization as operators.normalize.normalize_edges, streaming:
    projection + self-loop filter are stateless; duplicate suppression is
    bounded by a watermark (exact global dedup happens at the batch sink)."""
    out = raw.select(
        F.least(F.col("src"), F.col("dst")).alias("u"),
        F.greatest(F.col("src"), F.col("dst")).alias("v"),
        F.col("ts"),
    ).where(F.col("u") != F.col("v"))
    return out.withWatermark("ts", "10 minutes").dropDuplicates(["u", "v", "ts"])


def edge_rate_per_window(raw: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window edge counts — the streaming metrics feed."""
    return (
        raw.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.col("w.start").alias("window_start"), "n_edges")
    )


def append_to_edge_table(stream: DataFrame, table_path: str, checkpoint: str) -> DataStreamWriter:
    """foreachBatch sink: per micro-batch, anti-join against the existing edge
    table then append — exact dedup across the whole history without keeping
    unbounded state in the streaming query itself."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        edges = batch.select("u", "v").dropDuplicates(["u", "v"])
        try:
            existing = spark.read.parquet(table_path)
            edges = edges.join(existing, ["u", "v"], "left_anti")
        except AnalysisException:
            # genuinely-first batch: the table doesn't exist yet. Any OTHER
            # error (transient FS failure, corrupt footer) must propagate and
            # fail the micro-batch so streaming retry semantics apply —
            # swallowing it would skip the historical anti-join and append
            # duplicates silently.
            pass
        edges.write.mode("append").parquet(table_path)

    return stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )


def maintain_triangle_count(
    stream: DataFrame, table_path: str, checkpoint: str
) -> DataStreamWriter:
    """foreachBatch sink that keeps a RUNNING EXACT global triangle count
    while appending the canonical edge table: per micro-batch, the batch is
    deduplicated against the table, its exact triangle delta is computed with
    ``triangle_count_delta`` (three batch-sized joins —
    O(|batch| · avg degree) per batch, never a recount of the accumulated
    graph), and the count is durably updated in a ``_TRIANGLES.json`` sidecar
    next to the table.

    Replay safety (foreachBatch is at-least-once): the sidecar records the
    last applied ``batch_id`` and is written BEFORE the edge append —
    * replayed batch with sidecar already advanced → delta is skipped (it was
      already counted) and only the append re-runs, which the anti-join
      against the table makes idempotent;
    * crash before the sidecar write → nothing was appended either, so the
      replay recomputes the identical delta against the identical table.

    Result invariant after any drain: sidecar count == exact triangle count
    of the table's edge set (asserted in tests against a kernel recount).
    """
    import json
    import os

    from trianglecounting_spark.operators.triangles import triangle_count_delta

    state_path = table_path.rstrip("/") + "_TRIANGLES.json"

    # Same misuse guard as append_to_edge_table_stateful: a FRESH checkpoint
    # restarts batch_id at 0, which is <= any recorded sidecar batch_id — the
    # replay guard below would then silently skip EVERY delta while appends
    # continue, and the maintained count would diverge from the table without
    # an error. Resume the original checkpoint, or start from a clean table.
    if (
        (
            (os.path.isdir(table_path) and os.listdir(table_path))
            or os.path.exists(state_path)
        )
        and not _is_resumable_checkpoint(checkpoint)
    ):
        raise ValueError(
            f"maintain_triangle_count: {table_path} (or its _TRIANGLES.json "
            f"sidecar) already exists but {checkpoint} is a fresh checkpoint — "
            "a restarted batch_id sequence would skip deltas and silently "
            "diverge the maintained count. Resume the original checkpoint, or "
            "point at a clean table+sidecar."
        )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        edges_b = batch.select("u", "v").dropDuplicates(["u", "v"])
        try:
            existing = spark.read.parquet(table_path)
            have_table = True
        except AnalysisException:
            existing = spark.createDataFrame([], "u long, v long")
            have_table = False
        state = {"count": 0, "batch_id": -1}
        if os.path.exists(state_path):
            with open(state_path) as f:
                state = json.load(f)
        if batch_id > state["batch_id"]:
            edges_b = edges_b.localCheckpoint(eager=True)
            delta = triangle_count_delta(existing, edges_b).collect()[0].new_triangles
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"count": state["count"] + int(delta), "batch_id": batch_id}, f
                )
            os.replace(tmp, state_path)
        if have_table:
            edges_b = edges_b.join(existing, ["u", "v"], "left_anti")
        edges_b.write.mode("append").parquet(table_path)

    return stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )


def read_maintained_triangle_count(table_path: str) -> int:
    """The running count the ``maintain_triangle_count`` sink keeps durable."""
    import json

    with open(table_path.rstrip("/") + "_TRIANGLES.json") as f:
        return int(json.load(f)["count"])


def streaming_degrees(raw: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    cumulative per-vertex degree over the (src, dst, ts) edge stream.

    This is the pattern the engine uses for any per-key running aggregate the
    built-in streaming aggs can't express: state = one long per vertex, each
    micro-batch's updates arrive as Arrow-backed pandas frames (vectorized —
    the group's batch is counted with ``len``, never iterated per row), and
    only touched keys are loaded/emitted. State is sharded by the streaming
    state store across executors and restored from the checkpoint on restart
    — the same resumability contract as the batch IterationCheckpointer.

    Output (update mode): one ``(v, deg)`` row per touched vertex per batch,
    carrying the cumulative degree.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    endpoints = raw.select(F.explode(F.array("src", "dst")).alias("v"))

    def update(key, pdfs, state: GroupState):
        cnt = state.get[0] if state.exists else 0
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"v": [key[0]], "deg": [cnt]})

    return endpoints.groupBy("v").applyInPandasWithState(
        update,
        outputStructType="v long, deg long",
        stateStructType="deg long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def append_to_edge_table_stateful(
    stream: DataFrame, table_path: str, checkpoint: str
) -> DataStreamWriter:
    """Scale path for exact whole-history dedup: ``dropDuplicates`` on (u, v)
    backed by the streaming STATE STORE — O(1) per row against a
    hash-partitioned, checkpoint-persisted key set, instead of
    ``append_to_edge_table``'s per-batch anti-join that rescans the full
    table (O(history) per micro-batch). State size is the distinct-edge
    count — the information-theoretic floor for exact dedup — sharded across
    executors and recovered from the checkpoint on restart, so a crawl that
    streams for months never re-reads the canonical table on the hot path.

    Contract: the state covers only edges THIS query has streamed — it must
    start from an empty table + fresh checkpoint (or resume its own
    checkpoint). Pointing a fresh query at a pre-existing table would
    silently append duplicates of the historical rows, so that combination
    raises; seeding history into the state store is not expressible — use
    ``append_to_edge_table`` (per-batch anti-join) to extend a table written
    by another writer.
    """
    import os

    if (
        os.path.isdir(table_path)
        and os.listdir(table_path)
        and not _is_resumable_checkpoint(checkpoint)
    ):
        raise ValueError(
            f"append_to_edge_table_stateful: {table_path} already has data but "
            f"{checkpoint} is a fresh checkpoint — the state store cannot know "
            "the historical edges and would append duplicates. Resume the "
            "original checkpoint, or use append_to_edge_table (anti-join)."
        )
    deduped = stream.select("u", "v").dropDuplicates(["u", "v"])
    return (
        deduped.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def streaming_sessions(events: DataFrame, gap_minutes: int = 30,
                       watermark: str = "2 hours") -> DataFrame:
    """Native ``session_window`` sessionization of a (user_id, ts, value)
    event stream — the streaming twin of ``functions.events.sessionize``.

    The state store merges any events whose [ts, ts+gap) windows overlap, so
    a session closes once the watermark passes its end: late events inside
    the watermark extend/merge sessions, later ones are dropped — the
    standard trade a 100 TB clickstream pipeline makes to emit sessions
    continuously instead of re-batching the day.

    Boundary note: ``session_window`` starts a NEW session at gap exactly =
    the threshold (merge requires next_ts < prev_ts + gap), while the batch
    form breaks only at gap > threshold; on real (sub-second-resolution)
    streams exact-at-gap events are measure-zero, and the differential test
    pins the agreement away from the boundary.

    Output (append mode, on completion of each session):
    ``(user_id, session_start, session_end, n_events, sum_value)``.
    """
    sw = F.session_window(F.col("ts"), f"{gap_minutes} minutes")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(sw, F.col("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
