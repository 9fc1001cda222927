"""Normalization operators — mirrors the invariants the reference's
preprocessing establishes (pre_processing.h:8-66): canonical orientation,
self-loop removal, dedup, and insensitivity of downstream answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from trianglecounting_spark.operators import (
    adjacency,
    degrees,
    max_node_id,
    normalize_edges,
    orient_dodg,
)
from trianglecounting_spark.operators.triangles import triangle_count_sql
from trianglecounting_spark.sources import generators as g


def test_normalize_removes_loops_dups_and_orients(spark):
    raw = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (2, 5), (5, 2), (None, 1)],
        "src long, dst long",
    )
    got = sorted((r.u, r.v) for r in normalize_edges(raw).collect())
    assert got == [(1, 2), (2, 5)]


def test_normalization_insensitivity(spark):
    """Dirty multigraph (both orientations + dups + loops) gives the same
    triangle count as the clean edge set — the reference's core contract."""
    clean = g.two_cliques_bridge(spark)
    dirty = (
        clean.select("u", "v")
        .unionAll(clean.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .unionAll(clean.limit(7))
        .unionAll(spark.range(5).select(F.col("id").alias("u"), F.col("id").alias("v")))
    )
    n_clean = triangle_count_sql(clean).collect()[0].triangles
    n_dirty = triangle_count_sql(normalize_edges(dirty, "u", "v")).collect()[0].triangles
    assert n_clean == n_dirty == 40


def test_degrees_and_max_id(spark):
    e = g.star_graph(spark, 10)
    deg = {r.v: r.deg for r in degrees(e).collect()}
    assert deg[0] == 9
    assert all(deg[i] == 1 for i in range(1, 10))
    assert max_node_id(e).collect()[0].max_node_id == 9


def test_dodg_orientation_properties(spark):
    """DODG: one directed edge per undirected edge, oriented by (deg, id)."""
    e = g.two_cliques_bridge(spark)
    d = orient_dodg(e)
    assert d.count() == e.count()
    # re-canonicalizing the DODG must give back the original edge set
    back = sorted(
        (r.u, r.v)
        for r in d.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).collect()
    )
    orig = sorted((r.u, r.v) for r in e.collect())
    assert back == orig
    # rank monotonicity: deg(src) < deg(dst), or equal-deg and src < dst
    deg = {r.v: r.deg for r in degrees(e).collect()}
    for r in d.collect():
        assert (deg[r.src], r.src) < (deg[r.dst], r.dst)


def test_adjacency_sorted_lists(spark):
    e = g.complete_graph(spark, 5)
    adj = {r.src: r.nbrs for r in adjacency(orient_dodg(e)).collect()}
    for u, nbrs in adj.items():
        assert nbrs == sorted(nbrs)
    # K5 with identical degrees orients by id: vertex i points at i+1..4
    assert adj[0] == [1, 2, 3, 4]
    assert 4 not in adj  # sink vertex has no out-edges


def test_vertex_id_permutation_invariance(spark):
    """Triangle count is invariant under relabeling vertex ids."""
    e = g.two_cliques_bridge(spark)
    relabeled = e.select(
        (F.col("u") * 7919 % 100003).alias("a"), (F.col("v") * 7919 % 100003).alias("b")
    ).select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
    assert (
        triangle_count_sql(relabeled).collect()[0].triangles
        == triangle_count_sql(e).collect()[0].triangles
    )
