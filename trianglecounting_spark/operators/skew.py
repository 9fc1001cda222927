"""Explicit skew handling for power-law web graphs (north_rule requirement).

The DODG orientation already bounds *out*-degree at O(√m) — the reference's
own skew defense (`pre_processing_dodg.h:6-9`; tech_report.md:15). Two places
still see raw power-law skew and get explicit treatment here:

1. **Degree counting / any groupBy on raw vertex ids** — a 10^8-degree hub
   funnels its rows into one reducer. `salted_count` does two-stage
   aggregation: group by (key, salt) then by key. (Spark's partial aggregation
   already mitigates this; the salted form guarantees bounded reducer input
   even when upstream partial aggregation is defeated, e.g. after a join.)

2. **Adjacency grouping before DODG is available** — `capped_adjacency`
   splits a hub's neighbor list into ⌈deg/cap⌉ chunk rows so no single
   collect_list exceeds `cap` elements.

Property (tested): results are invariant under salting — identical to the
unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_count(df: DataFrame, key: str, salts: int = 32, out: str = "cnt") -> DataFrame:
    """groupBy(key).count() with a two-stage salted shuffle.

    Stage 1 groups by (key, hash(row)%salts) — hub rows spread over `salts`
    reducers; stage 2 sums the ≤`salts` partials per key."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(out))


def salted_degrees(edges: DataFrame, salts: int = 32) -> DataFrame:
    """Skew-proof version of operators.normalize.degrees (same output)."""
    endpoints = edges.select(F.explode(F.array("u", "v")).alias("v"))
    return salted_count(endpoints, "v", salts, out="deg")


def capped_adjacency(directed: DataFrame, cap: int = 4096) -> DataFrame:
    """Adjacency lists with hub splitting: output (src, part, nbrs) where each
    nbrs chunk has ≤ cap elements, chunks sorted and deterministic
    (part = nbr_rank // cap). Downstream kernels union over chunks; counts are
    chunk-additive because intersection distributes over the partition of
    N⁺(dst)."""
    ranked = directed.withColumn(
        "_rk",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("src").orderBy("dst")
        ),
    )
    return (
        ranked.withColumn("part", ((F.col("_rk") - 1) / cap).cast("long"))
        .groupBy("src", "part")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )
