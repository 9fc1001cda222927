"""HyperBall approximate neighborhood function — accuracy + convergence."""

from __future__ import annotations

from trianglecounting_spark.operators.hyperball import (
    effective_diameter,
    hyperball_balls,
    hyperball_state,
    neighborhood_function,
)
from trianglecounting_spark.sources import generators as g


def _path_graph(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "u long, v long"
    )


def test_path_ball_estimates_near_exact(spark):
    """P_20 at t=3: exact |B(v,3)| = 7 interior / less at the ends. With
    m=64 registers and balls ≤ 7, the linear-counting branch is active and
    per-vertex error is small — assert 25% relative accuracy everywhere."""
    n, t = 20, 3
    est = {r["v"]: r["ball_est"] for r in hyperball_balls(_path_graph(spark, n), t).collect()}
    assert set(est) == set(range(n))
    for v in range(n):
        exact = min(n - 1, v + t) - max(0, v - t) + 1
        assert abs(est[v] - exact) / exact < 0.25, (v, est[v], exact)


def test_anf_curve_monotone_and_plateaus(spark):
    """On C8 (diameter 4) the ANF curve must be nondecreasing and flat from
    t=4 on; the register state itself must be a fixpoint past the diameter."""
    c8 = g.cycle_graph(spark, 8)
    curve = dict(neighborhood_function(c8, 6))
    assert all(curve[t] <= curve[t + 1] + 1e-9 for t in range(6))
    assert curve[4] == curve[5] == curve[6]
    s4 = sorted(map(tuple, hyperball_state(c8, 4).collect()))
    s5 = sorted(map(tuple, hyperball_state(c8, 5).collect()))
    assert s4 == s5


def test_effective_diameter_small_graphs(spark):
    # K8: everyone reaches everyone at t=1 → effective diameter ≤ 1
    assert effective_diameter(g.complete_graph(spark, 8), t_max=4) <= 1.0
    # P_16: true diameter 15; 90%-effective diameter must land well above K8's
    d = effective_diameter(_path_graph(spark, 16), t_max=20)
    assert 6.0 < d <= 15.0


def test_closeness_centrality_star(spark):
    """Star S_16: exact farness(center) = 16, r = 17 → C = 16/16 = 1.0;
    leaf farness = 1 + 15·2 = 31 → C = 16/31 ≈ 0.516. t=2 truncation is
    exact (the star's diameter). Assert 25% relative accuracy."""
    from trianglecounting_spark.operators.hyperball import closeness_centrality_approx

    st = g.star_graph(spark, 17)  # center 0 + 16 leaves
    c = {r["v"]: r["closeness"] for r in closeness_centrality_approx(st, 2).collect()}
    assert abs(c[0] - 1.0) < 0.25
    leaves = [c[v] for v in c if v != 0]
    assert all(abs(x - 16.0 / 31.0) / (16.0 / 31.0) < 0.25 for x in leaves)


def test_harmonic_centrality_star(spark):
    """Star S_16: exact H(center) = 16, H(leaf) = 1 + 15/2 = 8.5 (truncation
    at t=2 is exact — the star's diameter). Assert 25% relative accuracy."""
    from trianglecounting_spark.operators.hyperball import harmonic_centrality_approx

    st = g.star_graph(spark, 17)  # center 0 + 16 leaves
    h = {r["v"]: r["harmonic"] for r in harmonic_centrality_approx(st, 2).collect()}
    assert abs(h[0] - 16.0) / 16.0 < 0.25
    leaves = [h[v] for v in h if v != 0]
    assert all(abs(x - 8.5) / 8.5 < 0.25 for x in leaves)


def test_betweenness_closed_forms(spark):
    """Brandes pivot accumulation on shapes with known values (all vertices
    as pivots => directed betweenness = 2x the undirected textbook value)."""
    from trianglecounting_spark.operators.centrality import betweenness_pivots

    p5 = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)], "u long, v long")
    r = {x.v: x.bc for x in betweenness_pivots(p5, n_pivots=5).collect()}
    assert r == {0: 0.0, 1: 6.0, 2: 8.0, 3: 6.0, 4: 0.0}

    # diamond: the two equal shortest paths split the dependency
    dia = spark.createDataFrame([(0, 1), (0, 2), (1, 3), (2, 3)], "u long, v long")
    r = {x.v: x.bc for x in betweenness_pivots(dia, n_pivots=4).collect()}
    assert r == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}

    # star: all shortest leaf-leaf paths cross the hub
    st = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "u long, v long")
    r = {x.v: x.bc for x in betweenness_pivots(st, n_pivots=4).collect()}
    assert r == {0: 6.0, 1: 0.0, 2: 0.0, 3: 0.0}

    # disconnected component: zero bc, still present in the output
    two = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "u long, v long")
    r = {x.v: x.bc for x in betweenness_pivots(two, n_pivots=7).collect()}
    assert r[1] == 2.0 and r[5] == 0.0 and r[6] == 0.0
