"""Property-based tests (hypothesis): random small graphs / corpora checked
against brute-force Python oracles — the class of invariant the reference
asserts by construction (exact counts, canonicalization idempotence) probed
over adversarial inputs instead of fixtures.

Examples are kept small (≤ 12 vertices) and counts low: every example runs
real Spark jobs, so the budget here is seconds per property, not shrink
depth. deadline=None because JVM warmup makes wall-time flaky.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from trianglecounting_spark.operators import normalize_edges
from trianglecounting_spark.operators.triangles import (
    triangle_count_kernel,
    triangle_count_sql,
    triangle_per_edge_support,
)

_PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random undirected graphs as edge sets over ≤ 12 vertices, including
# self-loops and duplicates so normalization is exercised too
_edge = st.tuples(st.integers(0, 11), st.integers(0, 11))
_edges = st.lists(_edge, min_size=0, max_size=40)


def _brute_triangles(pairs):
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


@given(_edges)
@_PROP
def test_triangle_plans_match_bruteforce(spark, raw):
    """Kernel plan == declarative SQL plan == Python brute force, on any
    messy edge list (loops, dups, both orientations)."""
    df = spark.createDataFrame(
        [(u, v) for u, v in raw] or [(0, 0)], "src long, dst long"
    )
    e = normalize_edges(df)
    expect = _brute_triangles(raw)
    assert triangle_count_kernel(e).collect()[0][0] == expect
    assert triangle_count_sql(e).collect()[0][0] == expect


@given(_edges)
@_PROP
def test_per_edge_support_sums_to_three_triangles(spark, raw):
    """Σ_e support(e) = 3Δ, support ≤ min-degree−1 bound implied by edge
    count — the k-truss input's defining identity."""
    df = spark.createDataFrame(
        [(u, v) for u, v in raw] or [(0, 0)], "src long, dst long"
    )
    e = normalize_edges(df)
    sup = triangle_per_edge_support(e)
    total = sup.agg(F.sum("support")).collect()[0][0] or 0
    assert total == 3 * _brute_triangles(raw)


@given(_edges)
@_PROP
def test_normalize_idempotent_and_canonical(spark, raw):
    """normalize(normalize(x)) == normalize(x); output has u < v, no dups."""
    df = spark.createDataFrame(
        [(u, v) for u, v in raw] or [(0, 0)], "src long, dst long"
    )
    e = normalize_edges(df)
    rows = sorted((r.u, r.v) for r in e.collect())
    assert all(u < v for u, v in rows)
    assert len(rows) == len(set(rows))
    again = sorted(
        (r.u, r.v)
        for r in normalize_edges(
            e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        ).collect()
    )
    assert again == rows


@given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                min_size=1, max_size=14, unique_by=lambda t: t[0]))
@_PROP
def test_resolve_redirects_invariants(spark, raw):
    """On ANY functional map: resolved finals are outside the redirect
    domain, unresolved rows park at exactly cap hops, resolved hop counts
    equal the true (Python-walked) chain length, and finals agree with a
    literal step-by-step walk."""
    from trianglecounting_spark.operators.redirects import resolve_redirects

    red = {u: v for u, v in raw if u != v}
    if not red:
        return
    rd = spark.createDataFrame(list(red.items()), "src long, dst long")
    got = {r.src: (r.final, r.hops, r.resolved)
           for r in resolve_redirects(rd, cap=16).collect()}
    assert set(got) == set(red)
    for src, (final, hops, resolved) in got.items():
        cur, steps = src, 0
        while cur in red and steps < 16:
            cur, steps = red[cur], steps + 1
        if resolved:
            assert final not in red and (final, hops) == (cur, steps)
        else:
            assert hops == 16 and final == cur and final in red


@given(_edges)
@_PROP
def test_eigenvector_centrality_bruteforce(spark, raw):
    """Walk-count power iteration == dense integer matrix power on the
    normalized adjacency, any messy input."""
    from trianglecounting_spark.operators.pagerank import eigenvector_centrality

    pairs = {(min(u, v), max(u, v)) for u, v in raw if u != v}
    if not pairs:
        return
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    x = {v: 1 for v in adj}
    for _ in range(4):
        x = {v: sum(x[u] for u in adj[v]) for v in adj}
    mx = max(x.values())
    expect = {v: round(c / mx, 6) for v, c in x.items()}
    df = spark.createDataFrame(sorted(pairs), "u long, v long")
    got = {r.v: r.score for r in eigenvector_centrality(df).collect()}
    assert got == expect
