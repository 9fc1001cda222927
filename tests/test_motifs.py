"""4-clique and square (4-cycle) counting — closed forms + differentials."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trianglecounting_spark.operators.motifs import (
    four_clique_count,
    square_count,
    square_count_codeg,
)
from trianglecounting_spark.sources import generators as g


def _comb(n: int, k: int) -> int:
    return math.comb(n, k)


def test_complete_graph_closed_forms(spark):
    # K_n: C(n,4) 4-cliques; 3·C(n,4) squares (each 4-subset gives 3 C4s)
    k7 = g.complete_graph(spark, 7)
    assert four_clique_count(k7).collect()[0][0] == _comb(7, 4)
    assert square_count(k7).collect()[0][0] == 3 * _comb(7, 4)


def test_cycle_graphs(spark):
    # C4 is itself one square and no 4-clique; C6 has neither
    c4 = g.cycle_graph(spark, 4)
    assert four_clique_count(c4).collect()[0][0] == 0
    assert square_count(c4).collect()[0][0] == 1
    assert square_count(g.cycle_graph(spark, 6)).collect()[0][0] == 0


def test_complete_bipartite_squares(spark):
    # K_{a,b}: no triangles (hence no 4-cliques); C(a,2)·C(b,2) squares
    a, b = 4, 5
    left = range(a)
    right = range(a, a + b)
    rows = [(u, v) for u in left for v in right]
    e = spark.createDataFrame(rows, "u long, v long")
    assert four_clique_count(e).collect()[0][0] == 0
    assert square_count(e).collect()[0][0] == _comb(a, 2) * _comb(b, 2)


def test_rmat_differential_vs_bruteforce_sql(spark):
    """Declarative cross-check on an irregular graph: the 6-way DODG join
    (Catalyst plan, no kernel) must agree with the kernel-extension plan,
    and the square count must agree with a wedge-pair SQL aggregate."""
    from trianglecounting_spark.operators.normalize import normalize_edges, orient_dodg

    e = normalize_edges(g.rmat_graph(spark, scale=8, edge_factor=6)).localCheckpoint(
        eager=False
    )

    d = orient_dodg(e).localCheckpoint(eager=False)
    d.createOrReplaceTempView("motif_d")
    brute_quads = spark.sql(
        "SELECT CAST(count(*) AS LONG) AS four_cliques FROM motif_d ab "
        "JOIN motif_d ac ON ac.src = ab.src "
        "JOIN motif_d bc ON bc.src = ab.dst AND bc.dst = ac.dst "
        "JOIN motif_d ax ON ax.src = ab.src "
        "JOIN motif_d bx ON bx.src = ab.dst AND bx.dst = ax.dst "
        "JOIN motif_d cx ON cx.src = ac.dst AND cx.dst = ax.dst"
    ).collect()[0][0]
    assert four_clique_count(e).collect()[0][0] == brute_quads

    sym = e.selectExpr("u AS src", "v AS dst").unionAll(
        e.selectExpr("v AS src", "u AS dst")
    )
    sym.createOrReplaceTempView("motif_sym")
    brute_squares = spark.sql(
        "WITH codeg AS (SELECT n1.dst AS u, n2.dst AS w, count(*) AS cd "
        "FROM motif_sym n1 JOIN motif_sym n2 "
        "ON n1.src = n2.src AND n1.dst < n2.dst GROUP BY n1.dst, n2.dst) "
        "SELECT CAST(sum(cd * (cd - 1) DIV 2) DIV 2 AS LONG) FROM codeg"
    ).collect()[0][0]
    # both square plans — the degree-ordered wedge-pair identity and the
    # naive codeg twin — against the independent SQL aggregate
    assert square_count(e).collect()[0][0] == brute_squares
    assert square_count_codeg(e).collect()[0][0] == brute_squares


def test_random_walks_shape_and_validity(spark):
    """Every walk starts at its walk_id, has walk_len steps, and every
    transition follows a real (symmetric) edge; repeated runs are identical."""
    from trianglecounting_spark.operators.walks import random_walks

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "u long, v long"
    )
    rows = random_walks(e, walk_len=5).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.node
    assert set(walks) == {0, 1, 2, 3}
    sym = {(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)}
    sym |= {(b, a) for a, b in sym}
    for w, steps in walks.items():
        assert len(steps) == 5
        assert steps[0] == w
        for t in range(4):
            assert (steps[t], steps[t + 1]) in sym
    again = sorted((r.walk_id, r.step, r.node)
                   for r in random_walks(e, walk_len=5).collect())
    assert again == sorted((r.walk_id, r.step, r.node) for r in rows)


def test_directed_triangle_census_hand_cases(spark):
    from trianglecounting_spark.operators.motifs import directed_triangle_census

    # one cyclic + one transitive + one fully-reciprocated triangle
    arcs = (
        [(0, 1), (1, 2), (2, 0)]            # cyclic
        + [(3, 4), (4, 5), (3, 5)]          # transitive
        + [(6, 7), (7, 6), (7, 8), (8, 7), (6, 8), (8, 6)]  # all 6 arcs
    )
    de = spark.createDataFrame(arcs, "src long, dst long")
    row = directed_triangle_census(de).collect()[0]
    # reciprocated triangle contributes 2 cyclic + 6 transitive assignments
    assert row.cyclic_triangles == 1 + 2
    assert row.transitive_triangles == 1 + 6


def test_directed_triangle_census_matches_duckdb(spark):
    import duckdb

    from trianglecounting_spark.operators.motifs import (
        directed_triangle_census,
        directed_triangle_census_sql,
    )

    arcs = [
        (a, b)
        for a in range(40)
        for b in range(40)
        if a != b and ((a * 2654435761 + b * 40503) % 97) < 9
    ]
    con = duckdb.connect()
    ctes = (
        "de AS MATERIALIZED (SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in arcs)
        + ") t(src, dst))"
    )
    oc = con.execute(directed_triangle_census_sql(ctes)).fetchall()[0]
    con.close()
    de = spark.createDataFrame(arcs, "src long, dst long")
    row = directed_triangle_census(de).collect()[0]
    assert (row.cyclic_triangles, row.transitive_triangles) == tuple(oc)
