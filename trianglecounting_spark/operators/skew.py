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
    """Adjacency lists with hub splitting: output (src, part, nbrs) where a
    degree-d source's neighbors are spread over ⌈d/cap⌉ hash-assigned chunks
    (part = xxhash64(dst) mod ⌈d/cap⌉). Chunks are deterministic (pure function
    of (dst, d, cap)); each holds ~cap neighbors in expectation. Downstream
    kernels union over chunks; counts are chunk-additive because intersection
    distributes over any partition of N⁺(dst).

    Deliberately NOT a row_number window: rank-chunking routes a mega-hub's
    entire neighbor list through ONE window task before splitting — the exact
    hotspot this helper exists to remove. Hash assignment needs only the
    per-src degree (one skew-immune partial-agg count), and every chunk's rows
    flow through ordinary hash-partitioned groupBy reducers.
    """
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    n_chunks = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("_deg") / F.lit(cap)).cast("long")
    )
    return (
        directed.join(deg, "src")
        .withColumn("part", F.pmod(F.xxhash64(F.col("dst")), n_chunks))
        .groupBy("src", "part")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )
