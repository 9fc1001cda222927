"""Connected components via alternating large-star / small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
the algorithm named by the north_star; absent from the reference).

Both operations are pure DataFrame groupBy/join plans — no UDFs:

  large-star(u): m = min(N(u) ∪ {u}); connect every neighbor v > u to m.
  small-star(u): on the parent-pointer graph (edges u→v with v < u),
                 m = min(children ∪ {u}); connect u and all children to m.

Converges in O(log² n) rounds on any graph; at fixpoint every vertex points
at its component's minimum id. Each round is two shuffles (groupBy min + join)
— web-scale friendly: no per-vertex state beyond the edge/pointer table, skew
from mega-hubs is one group with one `min` aggregate (cheap) plus a join AQE
can split.

Output/parity: exact integer labels (north_rule: exact equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from trianglecounting_spark.operators.normalize import undirect
from trianglecounting_spark.plans.cache import release_ids, tracked_checkpoint
from trianglecounting_spark.plans.checkpoint import IterationCheckpointer
from trianglecounting_spark.plans.tuning import iteration_partitions, scoped_shuffle_partitions


def _large_star(sym: DataFrame) -> DataFrame:
    """Symmetric edge table (src,dst) → edges (v, m) for every nbr v > src.

    No dedup here: the only consumer is ``_small_star``, whose min-aggregate
    is duplicate-insensitive and whose own output IS deduped — dropping the
    distinct saves one full shuffle per round."""
    mins = sym.groupBy("src").agg(
        F.least(F.col("src"), F.min("dst")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Parent-pointer edges (src > dst) → re-point src and all its children
    at the minimum of the star."""
    mins = edges.groupBy("src").agg(F.least(F.col("src"), F.min("dst")).alias("m"))
    repoint_children = (
        edges.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    repoint_self = mins.select(F.col("src"), F.col("m").alias("dst"))
    return repoint_children.unionAll(repoint_self).where(
        F.col("src") != F.col("dst")
    ).distinct()


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpointer: IterationCheckpointer | None = None,
) -> DataFrame:
    """Exact connected components of the canonical (u<v) edge table.

    Output: ``(v: long, component: long)`` for every vertex that appears in an
    edge; component = min vertex id of the component. Isolated vertices don't
    appear in an edge table, so they label themselves trivially upstream.
    """
    spark = edges.sparkSession
    vertices = (
        edges.select(F.explode(F.array("u", "v")).alias("v")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cur = undirect(edges).distinct()
    start = 0
    if checkpointer is not None:
        restored = checkpointer.restore()
        if restored is not None:
            start, cur = restored
    cur, cur_ids = tracked_checkpoint(cur)
    n_cur = cur.count()
    with scoped_shuffle_partitions(spark, iteration_partitions(spark, 2 * n_cur)):
        for k in range(start + 1, max_iterations + 1):
            # large-star needs the symmetric closure of the current pointer
            # graph; duplicates don't change mins, and _large_star/_small_star
            # dedup their outputs, so no distinct here.
            sym = cur.unionAll(
                cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            after_large = _large_star(sym)
            # tracked localCheckpoint (eager) truncates lineage — without it
            # each round's plan contains all previous rounds and planning grows
            # superlinearly — and lets us release round k-1's blocks on time.
            after_small, next_ids = tracked_checkpoint(_small_star(after_large))
            # Fixpoint check: both sides are distinct sets, so equal size +
            # zero rows missing from `cur` ⇒ equal sets. The size probe is a
            # near-free count on the just-materialized checkpoint; the
            # membership join runs ONLY when sizes agree (i.e. at most the
            # final round plus rare coincidences) — early rounds pay one
            # metadata-cheap action, not a join.
            n_next = after_small.count()
            if n_next != n_cur:
                changed = True
            else:
                added = (
                    after_small.join(cur, ["src", "dst"], "left_anti")
                    .limit(1)
                    .count()
                )
                changed = added > 0
            if checkpointer is not None:
                after_small = checkpointer.maybe_save(k, after_small)
            # round k is durable and the probe has read round k-1 — release it
            release_ids(spark, cur_ids)
            cur, cur_ids, n_cur = after_small, next_ids, n_next
            if not changed:
                break
    # At fixpoint cur is (v, component_min) for every non-minimum vertex;
    # component minima point at themselves.
    labels = cur.select(F.col("src").alias("v"), F.col("dst").alias("component"))
    out, _ = tracked_checkpoint(
        vertices.join(labels, "v", "left")
        .select("v", F.coalesce("component", F.col("v")).cast("long").alias("component"))
    )
    # the result is materialized — the vertex cache and the final round's
    # pointer blocks are no longer referenced
    vertices.unpersist()
    release_ids(spark, cur_ids)
    return out


def cc_minlabel_unrolled_sql(edges_sql: str, rounds: int = 20) -> str:
    """DuckDB oracle: min-label flooding for `rounds` synchronous rounds —
    exact CC labels provided rounds ≥ graph diameter (verified in tests for
    the sf0.01 oracle graph). Column names match connected_components()."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v AS src, u AS dst FROM e)",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lbl FROM sym)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT p.v AS v, least(p.lbl, coalesce(min(q.lbl), p.lbl)) AS lbl "
            f"FROM l{k-1} p LEFT JOIN sym s ON s.dst = p.v "
            f"LEFT JOIN l{k-1} q ON q.v = s.src GROUP BY p.v, p.lbl)"
        )
    return (
        ", ".join(parts)
        + f" SELECT v, CAST(lbl AS BIGINT) AS component FROM l{rounds} ORDER BY v"
    )


def component_size_dist(edges: DataFrame) -> DataFrame:
    """Component-size distribution — the percolation report (giant-component
    fraction, periphery shape): ``(size, n_components)`` per occupied size.
    Two map-side-combined counts on top of ``connected_components``; output
    bounded by the number of DISTINCT sizes (≤ √(2n))."""
    cc = connected_components(edges)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
    )


def component_size_dist_sql(edges_sql: str, rounds: int = 25) -> str:
    """DuckDB twin of ``component_size_dist`` over the unrolled min-label
    CC oracle."""
    cc = cc_minlabel_unrolled_sql(edges_sql, rounds=rounds)
    return (
        f"WITH csd_cc AS ({cc}), "
        "csd_s AS (SELECT component, CAST(count(*) AS BIGINT) AS size "
        "FROM csd_cc GROUP BY component) "
        "SELECT size, CAST(count(*) AS BIGINT) AS n_components "
        "FROM csd_s GROUP BY size"
    )
