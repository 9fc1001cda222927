"""Differential tests for the redundant-parity lanes cut from the official
driver contract (round 5): the driver's correctness artifact records at most
50 rows, so ``queries()`` holds exactly 50 — one per operator lane — and each
cut query lives in ``extra_queries()``, proven here against its surviving
twin (Spark-vs-Spark; the DuckDB-oracle gate for the same ten runs via
``tools/check_contract.py --all``).

Cut → twin map:
  degree_histogram → recompute from ``degrees`` rows
  max_node_id      → max over ``degrees`` vertex ids / graph_stats
  triangle_count   → ``triangle_count_kernel`` (Catalyst plan vs Arrow kernel)
  wedge_count      → closed form Σ deg·(deg−1)/2 over ``degrees``
  support_topk     → top-20 recomputed from ``triangle_per_edge`` rows
  pagerank_tol     → ``pagerank`` fixed-iteration boundary behaviors
  link_prediction_cn → projection of ``link_prediction_scores``
  ktruss / kcore   → fixed-round forms converge to the fixpoint forms
  cosine_topk_kernel → ``cosine_topk`` (mapInPandas matmul vs SQL plan)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from trianglecounting_spark.operators.kcore import kcore, kcore_rounds
from trianglecounting_spark.operators.ktruss import ktruss, ktruss_rounds
from trianglecounting_spark.operators.pagerank import pagerank

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def extras():
    return entry.extra_queries()


@pytest.fixture(scope="module")
def official():
    return entry.queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_contract_is_exactly_50_rows():
    """The driver artifact caps at 50 rows (observed r3+r4): the official
    registry must never exceed it, every official query must have an oracle,
    and the extra registry must stay disjoint + fully oracled."""
    q, o = entry.queries(), entry.oracle_sql()
    eq, eo = entry.extra_queries(), entry.extra_oracle_sql()
    assert len(q) == 50
    assert set(q) == set(o)
    assert set(eq) == set(eo)
    assert not (set(q) & set(eq))


def test_degree_histogram_matches_degrees(spark, extras, official):
    degs = _rows(official["degrees"](spark, SF_SMALL))
    hist: dict[int, int] = {}
    for _v, d in degs:
        hist[d] = hist.get(d, 0) + 1
    got = _rows(extras["degree_histogram"](spark, SF_SMALL))
    assert got == sorted(hist.items())


def test_max_node_id_matches_degrees(spark, extras, official):
    degs = _rows(official["degrees"](spark, SF_SMALL))
    (got,) = extras["max_node_id"](spark, SF_SMALL).collect()[0]
    assert got == max(v for v, _d in degs)


def test_triangle_count_sql_plan_matches_kernel(spark, extras, official):
    sql_n = extras["triangle_count"](spark, SF_SMALL).collect()[0][0]
    kern_n = official["triangle_count_kernel"](spark, SF_SMALL).collect()[0][0]
    assert sql_n == kern_n > 0


def test_wedge_count_closed_form(spark, extras, official):
    degs = _rows(official["degrees"](spark, SF_SMALL))
    expect = sum(d * (d - 1) // 2 for _v, d in degs)
    (got,) = extras["wedge_count"](spark, SF_SMALL).collect()[0]
    assert got == expect


def test_support_topk_matches_per_edge(spark, extras, official):
    per_edge = [tuple(r) for r in official["triangle_per_edge"](spark, SF_SMALL).collect()]
    expect = sorted(per_edge, key=lambda r: (-r[2], r[0], r[1]))[:20]
    got = [tuple(r) for r in extras["support_topk"](spark, SF_SMALL).collect()]
    assert got == expect


def test_pagerank_tol_boundaries(spark):
    """tol-mode is the fixed-iteration engine plus a stopping rule: a huge
    tol stops after the first step (== pagerank(1)); a vanishing tol never
    binds (== pagerank(cap)). Scores rounded to 6dp like the contract rows —
    partial-aggregation order makes raw doubles non-bit-identical."""
    from pyspark.sql import functions as F

    def _r6(df):
        return _rows(df.select("v", F.round("score", 6).alias("score")))

    e = entry._sampled_edges(spark, SF_SMALL)
    one = _r6(pagerank(e, iterations=1))
    huge = _r6(pagerank(e, iterations=6, tol=1e9))
    assert huge == one
    cap = _r6(pagerank(e, iterations=4))
    tiny = _r6(pagerank(e, iterations=4, tol=1e-300))
    assert tiny == cap


def test_link_prediction_cn_is_scores_projection(spark, extras, official):
    scores = official["link_prediction_scores"](spark, SF_SMALL)
    expect = _rows(scores.select("a", "b", "common"))
    got = _rows(extras["link_prediction_cn"](spark, SF_SMALL))
    assert got == expect
    assert len(got) > 0


def test_ktruss_rounds_converges_to_fixpoint(spark):
    e = entry._sampled_edges(spark, SF_SMALL)
    fix = _rows(ktruss(e, k=4, max_iterations=30))
    rounds = _rows(ktruss_rounds(e, k=4, rounds=10))
    assert rounds == fix


def test_kcore_rounds_converges_to_fixpoint(spark):
    e = entry._sampled_edges(spark, SF_SMALL)
    fix = _rows(kcore(e, k=4, max_iterations=30))
    rounds = _rows(kcore_rounds(e, k=4, rounds=12))
    assert rounds == fix


def test_cosine_topk_kernel_matches_sql_plan_contract(spark, extras, official):
    """Contract-configured twin of test_functions.test_cosine_kernel_matches
    _sql_plan: the exact mapInPandas matmul kernel and the Catalyst
    brute-force plan rank the same neighbors at the driver's parameters."""
    got = _rows(extras["cosine_topk_kernel"](spark, SF_SMALL))
    expect = _rows(official["cosine_topk"](spark, SF_SMALL))
    assert [r[:2] for r in got] == [r[:2] for r in expect]
    for g, x in zip(got, expect):
        assert g[2] == pytest.approx(x[2], abs=1e-6)
