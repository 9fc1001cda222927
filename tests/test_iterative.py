"""Iterative algorithms: PageRank, connected components, label propagation,
k-truss — closed-form fixtures + checkpoint/resume."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trianglecounting_spark.operators.components import connected_components
from trianglecounting_spark.operators.ktruss import ktruss, ktruss_rounds
from trianglecounting_spark.operators.labelprop import label_propagation
from trianglecounting_spark.operators.pagerank import pagerank
from trianglecounting_spark.plans.checkpoint import IterationCheckpointer
from trianglecounting_spark.sources import generators as g


def test_pagerank_uniform_on_regular_graph(spark):
    """On a vertex-transitive graph (cycle), PageRank is exactly uniform."""
    pr = pagerank(g.cycle_graph(spark, 50), iterations=5).collect()
    assert len(pr) == 50
    for r in pr:
        assert math.isclose(r.score, 1 / 50, rel_tol=1e-9)


def test_pagerank_sums_to_one(spark):
    e = g.two_cliques_bridge(spark)
    total = pagerank(e, iterations=10).agg(F.sum("score")).collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_pagerank_star_hub_dominates(spark):
    pr = {r.v: r.score for r in pagerank(g.star_graph(spark, 20), iterations=20).collect()}
    assert pr[0] > 10 * pr[1]


def test_cc_fixtures(spark):
    comp = {r.v: r.component for r in connected_components(g.two_cliques_bridge(spark)).collect()}
    assert set(comp.values()) == {0}
    comp = {r.v: r.component for r in connected_components(g.disjoint_triangles(spark, 10)).collect()}
    assert set(comp.values()) == {3 * k for k in range(10)}
    for v, c in comp.items():
        assert c == (v // 3) * 3


def test_cc_long_path(spark):
    """Path graph stresses the O(log n) round convergence of star contraction."""
    n = 200
    path = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    comp = connected_components(path).select("component").distinct().collect()
    assert [r.component for r in comp] == [0]


def test_label_propagation_cliques(spark):
    """Two cliques + bridge: after a few rounds each clique converges to its
    minimum label (deterministic min-tie-break)."""
    labels = {r.v: r.label for r in label_propagation(g.two_cliques_bridge(spark), rounds=4).collect()}
    assert set(labels[v] for v in range(6)) == {0}
    assert set(labels[v] for v in range(10, 16)) == {10}


def test_ktruss_two_cliques(spark):
    """4-truss of K6+K6+bridge: every K6 edge has support ≥ 4 ≥ k-2=2; the
    bridge has support 0 and is peeled. 6-truss: K6 edges have support 4 = k-2;
    7-truss empty (need support 5 > max 4)."""
    e = g.two_cliques_bridge(spark)
    t4 = ktruss(e, k=4)
    assert t4.count() == 30  # two K6s, bridge gone
    t6 = ktruss(e, k=6)
    assert t6.count() == 30
    t7 = ktruss(e, k=7)
    assert t7.count() == 0


def test_ktruss_rounds_converges_to_fixpoint(spark):
    e = g.two_cliques_bridge(spark)
    r1 = sorted((r.u, r.v) for r in ktruss_rounds(e, 4, 1).collect())
    r3 = sorted((r.u, r.v) for r in ktruss_rounds(e, 4, 3).collect())
    fix = sorted((r.u, r.v) for r in ktruss(e, 4).collect())
    assert r1 == r3 == fix  # converges in one peel here; extra rounds idempotent


def test_checkpoint_resume(spark, tmp_path):
    """Kill-and-resume: restoring from iteration k yields the same final ranks
    as an uninterrupted run (north_rule resumability)."""
    e = g.two_cliques_bridge(spark)
    full = {r.v: r.score for r in pagerank(e, iterations=8).collect()}

    ck_dir = str(tmp_path / "ck")
    ck = IterationCheckpointer(spark, ck_dir, every=2)
    # run only to iteration 4 by asking for 4 iterations with checkpointing
    pagerank(e, iterations=4, checkpointer=ck)
    assert ck.latest() == 4
    # resume: a fresh call for 8 iterations restores iter 4 and continues
    resumed = {r.v: r.score for r in pagerank(e, iterations=8, checkpointer=ck).collect()}
    for v in full:
        assert math.isclose(full[v], resumed[v], rel_tol=1e-12), v


def test_checkpoint_metrics_written(spark, tmp_path):
    import json
    import os

    ck = IterationCheckpointer(spark, str(tmp_path / "ck2"), every=1)
    pagerank(g.cycle_graph(spark, 30), iterations=2, checkpointer=ck)
    m = json.load(open(os.path.join(str(tmp_path / "ck2"), "iter=2", "metrics.json")))
    assert m["rows"] == 30
    assert sum(p["rows"] for p in m["partitions"]) == 30


def test_kcore_closed_forms(spark):
    from trianglecounting_spark.operators.kcore import kcore, kcore_rounds

    e = g.two_cliques_bridge(spark)
    # every vertex has degree >= 5 (bridge endpoints have 6) → 5-core = G
    assert kcore(e, k=5).count() == e.count()
    # 6-core: K6 vertices lose the bridge endpoints' neighbors first and the
    # whole graph unravels
    assert kcore(e, k=6).count() == 0
    # star: every leaf has degree 1 → 2-core empty
    assert kcore(g.star_graph(spark, 50), k=2).count() == 0
    # cycle: 2-regular → 2-core is the whole cycle
    assert kcore(g.cycle_graph(spark, 12), k=2).count() == 12
    # fixed-round form converges to the fixpoint
    got = sorted((r.u, r.v) for r in kcore_rounds(e, k=5, rounds=3).collect())
    want = sorted((r.u, r.v) for r in kcore(e, k=5).collect())
    assert got == want


def test_pagerank_convergence_mode(spark):
    """tol mode stops early once the L1 delta is below tol and agrees with a
    long fixed run to the oracle precision (north_star: 'at convergence')."""
    e = g.two_cliques_bridge(spark)
    conv = {r.v: r.score for r in pagerank(e, iterations=60, tol=1e-8).collect()}
    fixed = {r.v: r.score for r in pagerank(e, iterations=60).collect()}
    assert abs(sum(conv.values()) - 1.0) < 1e-9
    assert all(abs(conv[v] - fixed[v]) < 1e-6 for v in fixed)
