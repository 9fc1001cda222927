"""Graph-neighborhood feature aggregation — GNN-style feature engineering.

The sampled-neighborhood mean aggregate of GraphSAGE (Hamilton et al. 2017,
eq. 2, the AGGREGATE-mean variant): each vertex's k-hop feature is the
element-wise mean of its neighbors' (k-1)-hop features. At corpus scale this
is the standard way to turn a link graph + per-page embeddings into
link-aware page features for ranking/classification training sets — a
first-class training-data-pipeline operator, not a model.

Scale shape (the part that matters at 100 TB):
  * Features are exploded ONCE per hop into ``(v, dim, val)`` — a narrow
    ×dim row multiplication with no shuffle — so the aggregation is a plain
    ``groupBy(v, dim).avg`` : algebraic, map-side combined, hub-safe (a
    10⁷-degree hub costs one partial per partition per dim, never a
    collected array of 10⁷ neighbor vectors).
  * Reassembly into ``array<double>`` is a bounded per-vertex sort of
    exactly ``dim`` structs.
  * The edge table is symmetrized and reused across hops; each hop shuffles
    only the feature table.

Exactness: the test embeddings are integer-grid doubles, so sums are exact
in any order (< 2⁵³) and the mean is one exact IEEE division — engine and
oracle agree bit-for-bit before the declared 6dp rounding.

No counterpart in /root/reference (graph-only engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trianglecounting_spark.operators.normalize import undirect


def neighbor_mean_features(edges: DataFrame, feats: DataFrame,
                           hops: int = 1) -> DataFrame:
    """Element-wise mean of neighbors' features, iterated ``hops`` times.

    ``edges``: canonical ``(u, v)``; ``feats``: ``(v, feat: array<double>)``.
    Output: ``(v, feat: array<double>)`` for every vertex with at least one
    featured neighbor (hop 1) / featured 2-hop neighborhood (hop 2, ...).
    The mean is over the neighbors that HAVE features — partially-featured
    graphs aggregate what exists rather than imputing zeros.
    """
    sym = undirect(edges)
    cur = feats
    for _ in range(hops):
        flat = cur.select(
            F.col("v").alias("src"),
            F.posexplode(F.col("feat")).alias("dim", "val"),
        )
        agg = (
            sym.join(flat, "src")
            .groupBy(F.col("dst").alias("v"), "dim")
            .agg(F.avg("val").alias("val"))
        )
        cur = agg.groupBy("v").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "val"))),
                lambda s: s.val,
            ).alias("feat")
        )
    return cur


def neighbor_mean_exploded(edges: DataFrame, feats: DataFrame,
                           hops: int = 1) -> DataFrame:
    """Oracle-shaped form: ``(v, dim, val)`` with ``val`` rounded to 6dp —
    the hash-comparable projection of :func:`neighbor_mean_features`."""
    out = neighbor_mean_features(edges, feats, hops=hops)
    return out.select(
        "v", F.posexplode(F.col("feat")).alias("dim", "val")
    ).select("v", F.col("dim").cast("long").alias("dim"),
             (F.round("val", 6) + F.lit(0.0)).alias("val"))  # +0.0 folds -0.0


def neighbor_mean_exploded_sql(edges_sql: str, hops: int = 1,
                               feats_rel: str =
                               "(SELECT vec_id AS v, embedding FROM embeddings)"
                               ) -> str:
    """DuckDB twin of :func:`neighbor_mean_exploded`: the identical hop
    recurrence over the exploded ``(v, dim, val)`` relation."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM e "
        "UNION ALL SELECT v, u FROM e)",
        f"f0 AS MATERIALIZED (SELECT v, CAST(pos - 1 AS BIGINT) AS dim, "
        f"CAST(embedding[pos] AS DOUBLE) AS val "
        f"FROM {feats_rel}, unnest(generate_series(1, len(embedding))) AS t(pos))",
    ]
    for k in range(1, hops + 1):
        parts.append(
            f"f{k} AS MATERIALIZED (SELECT s.dst AS v, x.dim, avg(x.val) AS val "
            f"FROM sym s JOIN f{k-1} x ON x.v = s.src GROUP BY s.dst, x.dim)"
        )
    return (
        ", ".join(parts)
        + f" SELECT v, dim, round(val, 6) + 0.0 AS val FROM f{hops} ORDER BY v, dim"
    )
