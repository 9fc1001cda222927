"""Exact triangle counting — the reference's core query, two physical plans.

The reference implements Δ = Σ_{(u,v) ∈ DODG} |N⁺(u) ∩ N⁺(v)| with five
hand-picked physical intersection strategies (SURVEY.md §2.5, J3–J7). Here:

1. ``triangle_count_sql`` — the fully declarative plan: a three-way self-join
   of the oriented edge table. Catalyst chooses the physical join (SMJ or
   shuffled-hash, AQE-skew-split); whole-stage codegen keeps it JVM-side.
   This is the *idiomatic Spark* strategy and the differential oracle.

2. ``triangle_count_kernel`` — the reference-mirroring plan: co-partitioned
   adjacency lists + an Arrow-vectorized numpy intersection kernel
   (`applyInPandas`), with the size-ratio dispatch between sorted-merge
   (`SetInterCntVecMerge`, `util/set_inter_cnt_utils.h:375-386`) and galloping
   (`SetInterLookup`, `util/set_inter_cnt_utils.h:13-48`) re-expressed as
   ``np.intersect1d`` vs ``np.searchsorted``.

Both return exact LongType counts — integer end-to-end, so results are
partitioning-invariant (no FP accumulation; north_rule requires exact parity).

Scale notes: on the DODG, out-degree ≤ O(√m), so (a) adjacency groups are
bounded, (b) the kernel's per-group work is bounded, (c) the nbrs-array
replication in the join is at most √m copies of a √m-length list per hub.
The three-way-join plan shuffles wedge candidates (Σ deg⁺(v)² rows) — DODG
orientation is precisely what keeps that tractable on power-law graphs.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from trianglecounting_spark.operators.normalize import adjacency, orient_dodg, undirect


# ---------------------------------------------------------------------------
# Plan 1: declarative three-way join (Catalyst-owned physical strategy)
# ---------------------------------------------------------------------------

def triangle_count_sql(edges: DataFrame) -> DataFrame:
    """Global exact triangle count via three-way self-join of the DODG.

    Plan: e1(a,b) ⋈ e2(b,c) on b ⋈ e3(a,c) on (a,c) → count(*).
    Each triangle {x,y,z} with rank x<y<z matches exactly once with
    a=x, b=y, c=z (DODG property, `pre_processing_dodg.h:6-9`).
    Output: one row ``(triangles: long)``.
    """
    d = orient_dodg(edges)
    e1 = d.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = d.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = d.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )


def triangle_enumerate(edges: DataFrame) -> DataFrame:
    """Materialize each triangle once as ``(a, b, c)`` with rank a < b < c.

    Same join as ``triangle_count_sql`` without the final aggregate; feeds
    per-edge support and k-truss.
    """
    d = orient_dodg(edges)
    e1 = d.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = d.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = d.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_per_edge_support(edges: DataFrame) -> DataFrame:
    """Per-undirected-edge triangle count (support) — the k-truss input.

    Each triangle (a,b,c) contributes +1 support to edges (a,b), (a,c), (b,c).
    The reference computes only per-*directed*-edge intersection counts; the
    per-edge explode is our extension required for k-truss (north_star).
    Output: ``(u, v, support: long)`` for every edge, u < v (support 0 kept).
    """
    tris = triangle_enumerate(edges)
    # corners are in RANK order (deg, id) — canonicalize each incidence pair
    # by id so it joins the (u < v by id) edge table
    def pair(x, y):
        return tris.select(F.least(x, y).alias("u"), F.greatest(x, y).alias("v"))

    incidences = (
        pair("a", "b").unionAll(pair("a", "c")).unionAll(pair("b", "c"))
    )
    support = incidences.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return (
        edges.join(support, ["u", "v"], "left")
        .select("u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support"))
    )


def wedge_count(edges: DataFrame) -> DataFrame:
    """Number of wedges (paths of length 2) = Σ_v C(deg(v), 2).

    The clustering-coefficient denominator; pure aggregate, no join.
    Output: one row ``(wedges: long)``.
    """
    from trianglecounting_spark.operators.normalize import degrees

    return degrees(edges).agg(
        F.sum(F.col("deg") * (F.col("deg") - F.lit(1)) / F.lit(2))
        .cast("long")
        .alias("wedges")
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle count + local clustering numerator/denominator.

    Output: ``(v, tri: long, wedges_v: long)`` — integers only, so the driver
    hash is stable; callers divide. Global coefficient = 3·Δ / Σ wedges.
    """
    from trianglecounting_spark.operators.normalize import degrees

    tris = triangle_enumerate(edges)
    per_vertex_tri = (
        tris.select(F.col("a").alias("v"))
        .unionAll(tris.select(F.col("b").alias("v")))
        .unionAll(tris.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    return (
        degrees(edges)
        .join(per_vertex_tri, "v", "left")
        .select(
            "v",
            F.coalesce("tri", F.lit(0)).cast("long").alias("tri"),
            (F.col("deg") * (F.col("deg") - F.lit(1)) / F.lit(2))
            .cast("long")
            .alias("wedges_v"),
        )
    )


# ---------------------------------------------------------------------------
# Plan 2: Arrow-vectorized intersection kernel over co-partitioned adjacency
# ---------------------------------------------------------------------------

# The reference dispatches per neighbor-pair on a size-ratio rule (>2 → 1×N
# galloping shape, else N×M merge; `set_inter_cnt_utils.h:161-171`). In numpy
# the analogue: searchsorted the small side into the big side when the ratio
# is large, else a single intersect1d merge.
_GALLOP_RATIO = 8.0


def _intersect_count(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∩ b| for sorted unique int64 arrays — numpy re-expression of the
    reference's merge (J4) / galloping (J5) intersectors."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb >= _GALLOP_RATIO * la:
        # galloping analogue: binary-search each small element into the big side
        idx = np.searchsorted(b, a)
        idx[idx == lb] = lb - 1
        return int(np.count_nonzero(b[idx] == a))
    return int(np.intersect1d(a, b, assume_unique=True).size)


def _tc_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group kernel: all out-edges of one src vertex u, each row carrying
    N⁺(dst) as ``nbrs``. N⁺(u) is exactly the group's dst column — the group
    IS u's CSR row, so no second adjacency join is needed."""
    u = pdf["src"].iloc[0]
    nbrs_u = np.sort(pdf["dst"].to_numpy(dtype=np.int64))
    total = 0
    for nb in pdf["nbrs"]:
        if nb is not None and len(nb) > 0:
            total += _intersect_count(nbrs_u, np.asarray(nb, dtype=np.int64))
    return pd.DataFrame({"src": [u], "tri_cnt": [total]})


def _tc_kernel_per_edge(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group kernel emitting per-directed-edge counts (u, v, cnt)."""
    nbrs_u = np.sort(pdf["dst"].to_numpy(dtype=np.int64))
    out_v, out_c = [], []
    for v, nb in zip(pdf["dst"], pdf["nbrs"]):
        c = 0
        if nb is not None and len(nb) > 0:
            c = _intersect_count(nbrs_u, np.asarray(nb, dtype=np.int64))
        out_v.append(v)
        out_c.append(c)
    return pd.DataFrame(
        {"src": pdf["src"].to_numpy(), "dst": out_v, "cnt": np.asarray(out_c, dtype=np.int64)}
    )


def _edges_with_dst_adjacency(edges: DataFrame, num_partitions: int | None) -> DataFrame:
    """DODG edges joined with the adjacency list of their *destination*.

    One join instead of two: the kernel recovers N⁺(src) from the group itself.
    Left join keeps sink vertices (empty N⁺(dst)) — they contribute 0.
    """
    d = orient_dodg(edges)
    adj = adjacency(d, num_partitions)
    adj_dst = adj.select(F.col("src").alias("dst"), F.col("nbrs"))
    joined = d.join(adj_dst, "dst", "left")
    if num_partitions is not None:
        joined = joined.repartition(num_partitions, "src")
    return joined


def triangle_count_kernel(
    edges: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Global exact triangle count via the vectorized intersection kernel.

    Physical plan: DODG → adjacency (one shuffle) → edges ⋈ adj on dst (one
    shuffle, AQE-skew-split) → groupBy(src) applyInPandas (one shuffle) → sum.
    Mirrors `CountTriBMPAndMergeWithPackDODG` (`triangle_counting.h:36-129`)
    with numpy replacing SIMD intrinsics. Output: one row ``(triangles: long)``.
    """
    grouped = _edges_with_dst_adjacency(edges, num_partitions).groupBy("src")
    per_vertex = grouped.applyInPandas(_tc_kernel, schema="src long, tri_cnt long")
    return per_vertex.agg(F.sum("tri_cnt").cast("long").alias("triangles"))


def triangle_count_per_directed_edge_kernel(
    edges: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Per-DODG-edge intersection counts ``(src, dst, cnt)`` — the kernel
    analogue of the reference's per-edge loop body, and the base quantity the
    per-edge support explode starts from."""
    grouped = _edges_with_dst_adjacency(edges, num_partitions).groupBy("src")
    return grouped.applyInPandas(
        _tc_kernel_per_edge, schema="src long, dst long, cnt long"
    )
