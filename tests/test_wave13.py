"""Round-5 thirteenth wave: snapshot consolidation (per-url latest-capture
dedup + churn stats over a multi-capture crawl table)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _captures(spark, rows):
    # rows: (url, iso_ts, text)
    return spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(t), x) for u, t, x in rows],
        "url string, warc_ts timestamp, text string",
    )


def test_latest_snapshot_closed_form(spark):
    from trianglecounting_spark.sources.pages import latest_snapshot

    rows = [
        # url A: 3 captures, text changes once (2 versions), newest = 2024-02-01
        ("a", "2024-01-01T00:00:00", "alpha"),
        ("a", "2024-01-15T00:00:00", "alpha"),
        ("a", "2024-02-01T00:00:00", "alpha CHANGED"),
        # url B: 1 capture
        ("b", "2024-01-05T00:00:00", "beta"),
        # url C: 2 byte-identical re-crawls
        ("c", "2024-01-02T00:00:00", "gamma"),
        ("c", "2024-01-09T00:00:00", "gamma"),
    ]
    out = {
        r["url"]: r
        for r in latest_snapshot(_captures(spark, rows)).collect()
    }
    assert out["a"]["n_captures"] == 3 and out["a"]["n_versions"] == 2
    assert out["b"]["n_captures"] == 1 and out["b"]["n_versions"] == 1
    assert out["c"]["n_captures"] == 2 and out["c"]["n_versions"] == 1
    # latest_fp tracks the NEWEST capture's text, not the majority
    import hashlib

    assert out["a"]["latest_fp"] == hashlib.md5(b"alpha CHANGED").hexdigest()
    # epoch of 2024-02-01T00:00:00Z
    assert out["a"]["latest_epoch"] == 1706745600
    assert out["c"]["latest_epoch"] == 1704758400


def test_url_snapshots_lane_invariants(spark):
    """The contract fixture's closed form: doc i has (i % 3) + 1 captures a
    week apart; odd docs churn every capture, even docs never."""
    import __spark_entry__ as m
    from tests.conftest import SF_SMALL

    snap = m.extra_queries()["url_snapshots"](spark, SF_SMALL)
    doc_id = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    checked = snap.select(
        doc_id.alias("i"), "n_captures", "n_versions", "latest_epoch"
    )
    bad = checked.where(
        (F.col("n_captures") != F.col("i") % 3 + 1)
        | (
            F.when(F.col("i") % 2 == 0, F.col("n_versions") != 1).otherwise(
                F.col("n_versions") != F.col("n_captures")
            )
        )
        | (
            F.col("latest_epoch")
            != F.lit(1704067200) + (F.col("i") % 3) * 7 * 86400
        )
    )
    assert bad.count() == 0
    assert snap.count() == 500  # one row per distinct url
