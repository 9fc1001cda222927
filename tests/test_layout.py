"""Bucketed physical layout: exchange-free kernel join + result parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from trianglecounting_spark.operators import triangles as t
from trianglecounting_spark.operators.normalize import normalize_edges
from trianglecounting_spark.plans.layout import (
    count_shuffle_exchanges,
    write_graph_layout,
)
from trianglecounting_spark.sources import generators as g


def test_bucketed_layout_exchange_free_and_exact(spark, tmp_path):
    edges = normalize_edges(g.rmat_graph(spark, 10, 8)).localCheckpoint(eager=True)
    e_tbl, a_tbl, h_tbl = write_graph_layout(
        edges, str(tmp_path), buckets=8, prefix="tl1"
    )
    # Iceberg-style snapshot manifest written atomically alongside the tables
    import json

    manifest = json.loads((tmp_path / "_LAYOUT_MANIFEST.json").read_text())
    assert manifest["buckets"] == 8
    assert manifest["rows"][e_tbl] == edges.count()

    # force the join to actually use co-located buckets (a broadcast join
    # would also be exchange-free but wouldn't prove the layout)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        laid_out, _hub = t.bucketed_kernel_layout(spark, e_tbl, a_tbl)
        # exactly ONE shuffle: the final src CSR grouping. The dst join reads
        # both bucketed tables in place.
        assert count_shuffle_exchanges(laid_out) == 1, laid_out._jdf.queryExecution().executedPlan().toString()

        tri_bucketed = (
            t.triangle_count_kernel_bucketed(spark, e_tbl, a_tbl).collect()[0].triangles
        )
        # materialized hub CSR path: same count, zero hub-selection jobs
        tri_hub_tbl = (
            t.triangle_count_kernel_bucketed(spark, e_tbl, a_tbl, hub_table=h_tbl)
            .collect()[0]
            .triangles
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    tri = t.triangle_count_kernel(edges).collect()[0].triangles
    assert tri_bucketed == tri
    assert tri_hub_tbl == tri

    sup_b = (
        t.triangle_per_edge_support_bucketed(spark, e_tbl, a_tbl, hub_table=h_tbl)
        .agg(F.sum("support").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    sup = (
        t.triangle_per_edge_support(edges)
        .agg(F.sum("support").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert (sup_b.s, sup_b.n) == (sup.s, sup.n)
    assert sup_b.s == 3 * tri


def test_bucketed_layout_no_hubs_edge_case(spark, tmp_path):
    """Graph with no hub candidates (all in-degrees 1): empty hub CSR table,
    counts still exact via the join path."""
    edges = g.cycle_graph(spark, 40).localCheckpoint(eager=True)
    e_tbl, a_tbl, h_tbl = write_graph_layout(
        edges, str(tmp_path), buckets=4, prefix="tl2"
    )
    assert spark.table(h_tbl).count() == 0
    tri = (
        t.triangle_count_kernel_bucketed(spark, e_tbl, a_tbl, hub_table=h_tbl)
        .collect()[0]
        .triangles
    )
    assert tri == 0
