"""k-core decomposition by iterative degree peeling.

The k-core of G is the maximal subgraph where every vertex has degree ≥ k.
Peeling: drop vertices with degree < k (and their edges), recompute degrees,
repeat to fixpoint. Companion to k-truss (edge-support peeling, ktruss.py) —
the standard web-graph denoising pass before community/centrality analytics.
Absent from the reference (a TC engine); added for the link-graph suite.

Each round = one degree aggregation + one semi-join filter — two shuffles on
the SHRINKING edge set, all Column expressions. Exact integer labels, so
results are partitioning-invariant; the fixed-round form is oracle-matched
(rounds are idempotent once converged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trianglecounting_spark.plans.cache import (
    persistent_rdd_ids,
    release_ids,
    tracked_checkpoint,
)


def _peel_once(cur: DataFrame, k: int) -> DataFrame:
    from trianglecounting_spark.operators.normalize import degrees

    keep = degrees(cur).where(F.col("deg") >= k).select("v")
    ku = keep.select(F.col("v").alias("u"))
    kv = keep.select(F.col("v").alias("v"))
    # semi-joins: an edge survives iff BOTH endpoints survive
    return cur.join(ku, "u", "left_semi").join(kv, "v", "left_semi")


def kcore(edges: DataFrame, k: int, max_iterations: int = 100) -> DataFrame:
    """Edges of the k-core subgraph ``(u, v)`` with u < v. Runs to fixpoint."""
    spark = edges.sparkSession
    cur, cur_ids = tracked_checkpoint(edges.select("u", "v"))
    n_cur = cur.count()
    for _ in range(max_iterations):
        before = persistent_rdd_ids(spark)
        nxt, nxt_ids = tracked_checkpoint(_peel_once(cur, k), before=before)
        n_nxt = nxt.count()
        release_ids(spark, cur_ids)
        cur, cur_ids = nxt, nxt_ids
        if n_nxt == n_cur:
            break
        n_cur = n_nxt
    return cur


def kcore_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Exactly `rounds` peels — the deterministic oracle-matched contract."""
    spark = edges.sparkSession
    cur, cur_ids = tracked_checkpoint(edges.select("u", "v"))
    for _ in range(rounds):
        before = persistent_rdd_ids(spark)
        cur, nxt_ids = tracked_checkpoint(_peel_once(cur, k), before=before)
        release_ids(spark, cur_ids)
        cur_ids = nxt_ids
    return cur


def kcore_unrolled_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB oracle for ``kcore_rounds``: per round, degree filter + edge
    semi-join, identical semantics."""
    parts = [f"WITH t0 AS MATERIALIZED ({edges_sql})"]
    for r in range(rounds):
        parts.append(
            f"deg{r} AS MATERIALIZED (SELECT x AS v, count(*) AS deg FROM "
            f"(SELECT u AS x FROM t{r} UNION ALL SELECT v AS x FROM t{r}) GROUP BY x)"
        )
        parts.append(
            f"keep{r} AS MATERIALIZED (SELECT v FROM deg{r} WHERE deg >= {k})"
        )
        parts.append(
            f"t{r+1} AS MATERIALIZED (SELECT t.u, t.v FROM t{r} t "
            f"WHERE t.u IN (SELECT v FROM keep{r}) AND t.v IN (SELECT v FROM keep{r}))"
        )
    return ", ".join(parts) + f" SELECT u, v FROM t{rounds} ORDER BY u, v"
