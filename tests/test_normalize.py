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
    rank_by_degree,
)
from trianglecounting_spark.operators.normalize import scalable_dense_rank
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


def test_rank_by_degree_dense_and_ordered(spark):
    """new_id is a dense permutation [0, |V|) ordered by (deg desc, v asc)."""
    e = g.two_cliques_bridge(spark)
    deg = degrees(e)
    ranked = {r.v: r.new_id for r in rank_by_degree(deg).collect()}
    degs = {r.v: r.deg for r in deg.collect()}
    assert sorted(ranked.values()) == list(range(len(degs)))
    by_rank = sorted(ranked, key=ranked.get)
    assert by_rank == sorted(degs, key=lambda v: (-degs[v], v))
    # ascending variant
    asc = {r.v: r.new_id for r in rank_by_degree(deg, descending=False).collect()}
    by_rank_asc = sorted(asc, key=asc.get)
    assert by_rank_asc == sorted(degs, key=lambda v: (degs[v], v))


def test_scalable_dense_rank_large_deterministic(spark):
    """200k keys, many duplicates of the order prefix: ranks are the exact
    row_number of the total order, identical across partitionings and re-runs
    (the determinism the round-1 zipWithIndex path could not guarantee under
    recompute), with no per-row Python anywhere in the plan."""
    df = spark.range(200_000).select(
        F.col("id").alias("v"), (F.col("id") % 97).alias("grp")
    )
    order = [F.col("grp").asc(), F.col("v").desc()]
    r1 = scalable_dense_rank(df, order, ["v"], out_col="rk")
    r2 = scalable_dense_rank(df.repartition(13), order, ["v"], out_col="rk")
    m1 = {r.v: r.rk for r in r1.collect()}
    assert sorted(m1.values()) == list(range(200_000))
    # closed form: rank = grp * (rows in earlier groups) + position by v desc
    # group sizes: grp < 200000%97 → ceil, else floor
    import math

    n, g_count = 200_000, 97
    sizes = [n // g_count + (1 if gg < n % g_count else 0) for gg in range(g_count)]
    starts = [sum(sizes[:gg]) for gg in range(g_count)]
    for v in (0, 1, 96, 97, 150_000, 199_999):
        grp = v % 97
        # members of grp are v ≡ grp (mod 97), ranked by v DESC within grp
        pos = (sizes[grp] - 1) - (v - grp) // 97
        assert m1[v] == starts[grp] + pos, v
    assert {r.v: r.rk for r in r2.collect()} == m1


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


def test_graph_stats_closed_form(spark):
    """Star K1,4 (center 0): n=5, m=4, max_deg=4, density=0.4,
    assortativity=-1 (perfectly disassortative — every edge joins deg 4 to
    deg 1)."""
    from trianglecounting_spark.operators.normalize import graph_stats

    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "u long, v long")
    r = graph_stats(star).collect()[0]
    assert (r.n_vertices, r.n_edges, r.max_deg) == (5, 4, 4)
    assert r.avg_deg == 1.6
    assert r.density == 0.4
    assert r.assortativity == -1.0


def test_powerlaw_alpha_closed_form_and_empty_tail(spark):
    """Star graph: hub degree n-1, leaves degree 1. With dmin between, the
    tail is just the hub -> alpha = 1 + 1/ln((n-1)/(dmin-0.5)). Empty tail
    -> n_tail 0, alpha NULL."""
    import math

    from pyspark.sql import functions as F

    from trianglecounting_spark.operators.normalize import powerlaw_alpha

    n = 40
    star = spark.createDataFrame([(0, i) for i in range(1, n)], "u long, v long")
    r = powerlaw_alpha(star, dmin=10).collect()[0]
    assert r.dmin == 10 and r.n_tail == 1
    assert math.isclose(
        r.alpha, round(1.0 + 1.0 / math.log((n - 1) / 9.5), 6), abs_tol=1e-9
    )
    r2 = powerlaw_alpha(star, dmin=1000).collect()[0]
    assert r2.n_tail == 0 and r2.alpha is None
    # partitioning determinism of the ordered fold
    r3 = powerlaw_alpha(star.repartition(7), dmin=10).collect()[0]
    assert r3.alpha == r.alpha


def test_rich_club_closed_forms(spark):
    """K4 plus a pendant leaf on vertex 0: degrees (4,3,3,3,1).
    k=1 -> club {0,1,2,3} (deg>1): n_k=4, e_k=6 (all K4 edges), phi=1.0.
    k=3 -> club {0}: n_k=1, e_k=0, phi NULL (needs >=2 members).
    k=8 -> empty club: zeros, phi NULL."""
    from trianglecounting_spark.operators.normalize import rich_club

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g_ = spark.createDataFrame(k4 + [(0, 9)], "u long, v long")
    rows = {r.k: r for r in rich_club(g_, ks=[1, 3, 8]).collect()}
    assert (rows[1].n_k, rows[1].e_k, rows[1].phi) == (4, 6, 1.0)
    assert (rows[3].n_k, rows[3].e_k, rows[3].phi) == (1, 0, None)
    assert (rows[8].n_k, rows[8].e_k, rows[8].phi) == (0, 0, None)
    # partitioning determinism
    rows2 = {r.k: r for r in rich_club(g_.repartition(5), ks=[1, 3, 8]).collect()}
    assert rows == rows2


def test_degree_gini_closed_forms(spark):
    """Regular graph (triangle: all degrees 2) -> gini 0. Star K1,4:
    degrees sorted [1,1,1,1,4], n=5, T=8, 2*sum(i*d) = 2*(1+2+3+4+20) = 60,
    G = 60/40 - 6/5 = 0.3 (checked against the mean-absolute-difference
    form: MAD 24/25, G = 0.96/(2*1.6) = 0.3)."""
    import math

    from trianglecounting_spark.operators.normalize import degree_gini

    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "u long, v long")
    r = degree_gini(tri).collect()[0]
    assert (r.n, r.sum_deg, r.gini) == (3, 6, 0.0)
    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "u long, v long")
    r2 = degree_gini(star).collect()[0]
    assert (r2.n, r2.sum_deg) == (5, 8)
    assert math.isclose(r2.gini, 0.3, abs_tol=1e-9)
    r3 = degree_gini(star.repartition(7)).collect()[0]
    assert r3.gini == r2.gini


def test_molloy_reed_closed_form(spark):
    """Star K1,4: degrees [4,1,1,1,1] -> sum 8, sum sq 20, kappa 2.5
    (supercritical); triangle (2-regular): kappa = 12/6 = 2.0 exactly."""
    from trianglecounting_spark.operators.normalize import molloy_reed

    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "u long, v long")
    r = molloy_reed(star).collect()[0]
    assert (r.n, r.sum_deg, r.sum_deg2, r.kappa) == (5, 8, 20, 2.5)
    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "u long, v long")
    r2 = molloy_reed(tri).collect()[0]
    assert (r2.sum_deg, r2.sum_deg2, r2.kappa) == (6, 12, 2.0)
