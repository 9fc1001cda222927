"""k-truss decomposition by iterative support peeling — north_star algorithm.

The k-truss of G is the maximal subgraph where every edge is in ≥ k-2
triangles (support ≥ k-2). Peeling: compute per-edge support (the per-edge
output of the triangle operators), drop under-supported edges, repeat until a
pass removes nothing. The reference computes only the global count; per-edge
support + peeling are our extension (SURVEY.md §7 step 5).

Each round = one triangle enumeration (three-way DODG self-join) + a filter —
integer-exact, so partitioning-invariant. For the deterministic oracle
contract the fixed-round form ``ktruss_rounds`` peels exactly R times (the
final rounds are idempotent once converged); `ktruss` runs to fixpoint.

Scale: each round's cost is the triangle join on the *surviving* subgraph —
monotonically shrinking. Persist + lineage checkpoint per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from trianglecounting_spark.operators.triangles import triangle_per_edge_support
from trianglecounting_spark.plans.cache import (
    persistent_rdd_ids,
    release_ids,
    tracked_checkpoint,
)
from trianglecounting_spark.plans.checkpoint import IterationCheckpointer


def _peel_once(cur: DataFrame, k: int) -> DataFrame:
    sup = triangle_per_edge_support(cur)
    return sup.where(F.col("support") >= k - 2).select("u", "v")


def ktruss(
    edges: DataFrame,
    k: int,
    max_iterations: int = 100,
    checkpointer: IterationCheckpointer | None = None,
) -> DataFrame:
    """Edges of the k-truss subgraph: ``(u, v)`` with u < v. Runs to fixpoint."""
    spark = edges.sparkSession
    cur = edges.select("u", "v").persist(StorageLevel.MEMORY_AND_DISK)
    cur_ids: set[int] = set()
    n_cur = cur.count()
    start = 0
    if checkpointer is not None:
        restored = checkpointer.restore()
        if restored is not None:
            start, cur = restored
            n_cur = cur.count()
    for it in range(start + 1, max_iterations + 1):
        # eager localCheckpoint: materialize + truncate lineage per round;
        # tracked so the previous round's blocks AND the peel's kernel-internal
        # DODG/adjacency materializations are released deterministically
        before = persistent_rdd_ids(spark)
        nxt, nxt_ids = tracked_checkpoint(_peel_once(cur, k), before=before)
        n_nxt = nxt.count()
        if checkpointer is not None:
            nxt = checkpointer.maybe_save(it, nxt)
        cur.unpersist()
        release_ids(spark, cur_ids)
        cur, cur_ids = nxt, nxt_ids
        if n_nxt == n_cur:
            break
        n_cur = n_nxt
    return cur


def ktruss_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Exactly `rounds` peels — the deterministic oracle-matched contract.

    Each round materializes (eager localCheckpoint): the peel references its
    input ~5× (degree join ×2, triangle join ×3), so an unmaterialized chain
    re-evaluates upstream work exponentially in the round count.
    """
    spark = edges.sparkSession
    cur, cur_ids = tracked_checkpoint(edges.select("u", "v"))
    for _ in range(rounds):
        before = persistent_rdd_ids(spark)
        cur, nxt_ids = tracked_checkpoint(_peel_once(cur, k), before=before)
        release_ids(spark, cur_ids)
        cur_ids = nxt_ids
    return cur


def ktruss_unrolled_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB oracle for ``ktruss_rounds``: per round, support via the
    symmetric-adjacency two-join (count of common neighbors w of u and v),
    then the >= k-2 filter."""
    parts = [f"WITH t0 AS MATERIALIZED ({edges_sql})"]
    for r in range(rounds):
        parts.append(
            f"sym{r} AS MATERIALIZED (SELECT u AS src, v AS dst FROM t{r} "
            f"UNION ALL SELECT v AS src, u AS dst FROM t{r})"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT t.u, t.v, count(*) AS sup FROM t{r} t "
            f"JOIN sym{r} a ON a.src = t.u JOIN sym{r} b ON b.src = t.v AND b.dst = a.dst "
            f"GROUP BY t.u, t.v)"
        )
        parts.append(
            f"t{r+1} AS MATERIALIZED (SELECT t.u, t.v FROM t{r} t JOIN s{r} s "
            f"ON s.u = t.u AND s.v = t.v WHERE s.sup >= {k - 2})"
        )
    return ", ".join(parts) + f" SELECT u, v FROM t{rounds} ORDER BY u, v"
