"""Edge-table normalization and degree-ordered orientation.

These are the DataFrame re-expressions of the reference's preprocessing pipeline
(`triangle-counting/pre_processing.h:8-66` canonicalize+sort+dedup,
`triangle-counting/pre_processing_dodg.h:6-112` degree-ordered orientation,
`triangle-counting/pre_processing.h:200-253` degree-descending renumbering).

Everything here is pure Column expressions — Catalyst fuses the projection,
self-loop filter, and dedup aggregate into two stages with partial aggregation,
which is exactly the reference's hand-fused "Operator Fusion" pipeline
(`triangle_counting_main.cpp:100-104`) done by the optimizer instead of by hand.

Scale notes (100 TB / 10^12-edge deployment):
  * ``normalize_edges`` is one hash-shuffle on (u, v) — unavoidable for exact
    dedup, and the *only* full-edge shuffle before adjacency grouping.
  * ``degrees`` uses explode + partial hash aggregation: map-side combine means
    the shuffle carries at most one (vertex, partial_count) row per vertex per
    partition, not one row per edge endpoint.
  * ``orient_dodg`` joins the edge table with the degree table twice. The degree
    table has |V| rows (~10^10 at full scale): too big to broadcast, so these are
    shuffle joins on u and then v — Spark reuses the dedup shuffle's hash
    partitioning on the first join when keys align. AQE handles hub skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def normalize_edges(raw: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Arbitrary multi-graph edge list → canonical simple undirected edge table.

    Output: ``(u: long, v: long)`` with ``u < v``, distinct, no self-loops.
    Mirrors the reference's canonicalize-swap (`pre_processing.h:22-27`),
    self-loop predicate (`pre_processing.h:57`), and sorted-run dedup
    (`pre_processing.h:52-63`) — except Spark needs no sort: ``dropDuplicates``
    is a hash aggregate with map-side partial dedup.
    """
    s, d = F.col(src).cast("long"), F.col(dst).cast("long")
    return (
        raw.select(F.least(s, d).alias("u"), F.greatest(s, d).alias("v"))
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .dropDuplicates(["u", "v"])
    )


def undirect(edges: DataFrame) -> DataFrame:
    """Canonical (u<v) edge table → both-direction directed edge table.

    The reference's undirected CSR scatters each edge in both directions
    (`pre_processing.h:141-149`); in Spark that's a union with the swapped
    projection — no shuffle, it's a narrow transform.
    Output: ``(src, dst)`` with both (u,v) and (v,u) present.
    """
    return edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex degree of the canonical undirected edge table.

    Output ``(v: long, deg: long)``. Mirrors `EdgeListHistogram`
    (`pre_processing.h:69-102`): both endpoints counted. The explode keeps it a
    single scan; partial aggregation is Spark's version of the per-thread uint8
    counter flush.
    """
    return (
        edges.select(F.explode(F.array("u", "v")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def max_node_id(edges: DataFrame) -> DataFrame:
    """Max vertex id (reference computes it inline during canonicalization,
    `triangle_counting_main.cpp:76-82`). Output: 1 row ``(max_node_id: long)``."""
    return edges.agg(F.max(F.greatest("u", "v")).alias("max_node_id"))


def orient_dodg(edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Degree-ordered directed graph: keep each undirected edge once, directed
    from lower rank to higher rank, rank = (degree, vertex id).

    Mirrors ``RankLT`` (`pre_processing_dodg.h:6-9`). This is the workload-
    reduction rewrite Catalyst cannot know about (SURVEY.md §4): it guarantees
    each triangle is enumerated exactly once and caps out-degree at O(√m),
    which simultaneously bounds the adjacency-group size for the kernel —
    built-in skew protection for power-law graphs.

    Output: ``(src, dst)`` directed, src ranked below dst.
    """
    deg = deg if deg is not None else degrees(edges)
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("v").alias("v"), F.col("deg").alias("deg_v"))
    j = edges.join(du, "u").join(dv, "v")
    keep_uv = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    return j.select(
        F.when(keep_uv, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(keep_uv, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def adjacency(directed: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Directed edge table → sorted adjacency-list table (the DataFrame CSR).

    Output: ``(src: long, nbrs: array<long> sorted ascending)`` — one CSR row
    per DataFrame row (mirrors `graph_t`, `triangle-counting/util/graph.h:5-13`,
    with the per-list sort of `pre_processing.h:190`).

    On a DODG input the list length is bounded by O(√m), so no single group can
    blow up an executor even on a power-law web graph; ``num_partitions`` lets
    callers pin the partitioning so the downstream kernel join is co-partitioned.
    """
    grouped = directed if num_partitions is None else directed.repartition(num_partitions, "src")
    return grouped.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))


def scalable_dense_rank(
    df: DataFrame,
    order: list[Column],
    key_cols: list[str],
    out_col: str = "new_id",
) -> DataFrame:
    """Dense global row numbering (0..N-1) by a TOTAL order — no single-task
    window, no per-row Python.

    Physical plan (the distributed counting-sort shape, mirroring the
    reference's renumbering `pre_processing.h:200-253` and the Karypis
    counting-sort `2017-karypis-hepc-tc/ptc.c:79-124`):

      1. range-partitioned global sort (Spark's scalable sort — partition p
         holds a contiguous slice of the total order);
      2. per-partition local index via ``mapInArrow`` — one ``np.arange`` per
         Arrow batch, a narrow Arrow-vectorized pass;
      3. per-partition row counts (a ≤#partitions-row collect) → cumulative
         offsets → broadcast join; rank = offset[partition] + local index.

    The sorted+indexed table is cached between the counts action and the
    result materialization so both see the identical range partitioning
    (re-planning could re-sample different range boundaries); the result is
    returned materialized (lineage-free) and the cache is dropped before
    returning — no persistent blocks beyond the result leak out.

    At 10^12 rows this is one sort shuffle + one narrow pass + a metadata-size
    collect — the same cost envelope as any distributed sort, with zero rows
    ever touching the driver or a Python scalar loop.
    """
    import numpy as np
    import pyarrow as pa

    from trianglecounting_spark.plans.cache import tracked_checkpoint

    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    with_pid = df.sort(*order).select(*key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # fresh StructType — StructType.add would mutate the DataFrame's cached schema
    out_schema = StructType(
        list(with_pid.schema.fields) + [StructField("_lidx", LongType())]
    )

    def add_local_index(batches):
        base = 0
        for b in batches:
            idx = pa.array(np.arange(base, base + b.num_rows, dtype=np.int64))
            yield b.append_column("_lidx", idx)
            base += b.num_rows

    indexed = with_pid.mapInArrow(add_local_index, out_schema).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = {
        r["_pid"]: r["_cnt"]
        for r in indexed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    result = indexed.join(F.broadcast(off_df), "_pid").select(
        *key_cols, (F.col("_off") + F.col("_lidx")).alias(out_col)
    )
    out, _ = tracked_checkpoint(result)
    indexed.unpersist()
    return out


def scalable_running_sum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    key_cols: list[str],
    out_col: str = "running",
) -> DataFrame:
    """EXCLUSIVE global prefix sum of ``value_col`` by a TOTAL ``order`` — the
    weighted generalization of :func:`scalable_dense_rank` (which is this
    with all weights 1). No single-task window, no per-row Python.

    Physical plan (same distributed counting-sort shape):

      1. range-partitioned global sort — partition p holds a contiguous
         slice of the total order;
      2. per-partition EXCLUSIVE cumsum via ``mapInArrow`` (one
         ``np.cumsum`` per Arrow batch, carrying the batch base);
      3. per-partition value totals (a ≤#partitions-row collect) →
         cumulative offsets → broadcast join; running = offset[partition]
         + local exclusive cumsum.

    Values must be non-null int64 (the caller casts); the result column is
    int64, so sums must stay under 2⁶³ — at 100 TB that holds for token
    counts (10¹² docs × 10³ tokens ≈ 10¹⁵ ≪ 9.2·10¹⁸).

    Output schema contract: exactly ``key_cols + [value_col, out_col]`` —
    any other input column is PROJECTED AWAY (the sort/cumsum pipeline
    carries only what it needs per guide §2.3; callers wanting pass-through
    columns re-join on ``key_cols``).
    """
    import numpy as np
    import pyarrow as pa

    from trianglecounting_spark.plans.cache import tracked_checkpoint

    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    with_pid = (
        df.sort(*order)
        .select(*key_cols, F.col(value_col).cast("long").alias("_val"))
        .withColumn("_pid", F.spark_partition_id())
    )
    out_schema = StructType(
        list(with_pid.schema.fields) + [StructField("_lsum", LongType())]
    )

    def add_local_exclusive_cumsum(batches):
        base = 0
        for b in batches:
            vals = b.column("_val").to_numpy(zero_copy_only=False)
            if len(vals) == 0:
                # Spark does not normally emit empty Arrow batches but does
                # not guarantee it — excl[0] below would be an IndexError
                yield b.append_column("_lsum", pa.array([], pa.int64()))
                continue
            csum = np.cumsum(vals, dtype=np.int64)
            excl = np.empty_like(csum)
            excl[0] = 0
            excl[1:] = csum[:-1]
            yield b.append_column("_lsum", pa.array(excl + base))
            base += int(csum[-1])

    indexed = with_pid.mapInArrow(add_local_exclusive_cumsum, out_schema).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    totals = {
        r["_pid"]: r["_tot"]
        for r in indexed.groupBy("_pid")
        .agg(F.coalesce(F.sum("_val"), F.lit(0)).alias("_tot"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals) + 1 if totals else 0):
        offsets.append((pid, acc))
        acc += totals.get(pid, 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    result = indexed.join(F.broadcast(off_df), "_pid").select(
        *key_cols,
        F.col("_val").alias(value_col),
        (F.col("_off") + F.col("_lsum")).alias(out_col),
    )
    out, _ = tracked_checkpoint(result)
    indexed.unpersist()
    return out


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row global profile of the canonical edge table: vertex/edge
    counts, degree extremes, density, and degree assortativity (Newman 2002,
    the standard power-law-web-graph report number).

    Assortativity is Pearson correlation of endpoint degrees over edges,
    computed from INTEGER sums (Σjk, Σ(j+k), Σ(j²+k²) are exact int64), with
    one double expression at the end — so the value is bit-identical across
    engines and partitionings despite being a float. Two shuffles total
    (degree agg + the degree joins share partitioning with orient_dodg's).

    Output: ``(n_vertices, n_edges, max_deg, avg_deg, density,
    assortativity)`` — floats rounded to 6 digits.
    """
    deg = degrees(edges).localCheckpoint(eager=False)
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("ju"))
    dv = deg.select(F.col("v").alias("v"), F.col("deg").alias("jv"))
    j = edges.join(du, "u").join(dv, "v")
    sums = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("ju") * F.col("jv")).alias("s_jk"),
        F.sum(F.col("ju") + F.col("jv")).alias("s_sum"),
        F.sum(F.col("ju") * F.col("ju") + F.col("jv") * F.col("jv")).alias("s_sq"),
    )
    dstats = deg.agg(
        F.count(F.lit(1)).alias("n"), F.max("deg").alias("max_deg")
    )
    m, jk, jsum, jsq = F.col("m"), F.col("s_jk"), F.col("s_sum"), F.col("s_sq")
    half_mean = jsum / (m * F.lit(2.0))  # M⁻¹ Σ ½(j+k)
    num = jk / m - half_mean * half_mean
    den = jsq / (m * F.lit(2.0)) - half_mean * half_mean
    n = F.col("n").cast("double")
    return sums.crossJoin(dstats).select(
        F.col("n").cast("long").alias("n_vertices"),
        m.cast("long").alias("n_edges"),
        F.col("max_deg").cast("long").alias("max_deg"),
        F.round(m * F.lit(2.0) / n, 6).alias("avg_deg"),
        F.round(m * F.lit(2.0) / (n * (n - F.lit(1.0))), 6).alias("density"),
        F.round(num / den, 6).alias("assortativity"),
    )


def graph_stats_sql(edges_sql: str) -> str:
    """DuckDB twin of ``graph_stats`` — identical integer sums, identical
    final double expression."""
    return (
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "deg AS MATERIALIZED (SELECT x AS v, count(*) AS deg FROM "
        "(SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x), "
        "s AS MATERIALIZED (SELECT count(*) AS m, "
        "sum(du.deg * dv.deg) AS s_jk, sum(du.deg + dv.deg) AS s_sum, "
        "sum(du.deg * du.deg + dv.deg * dv.deg) AS s_sq "
        "FROM e JOIN deg du ON du.v = e.u JOIN deg dv ON dv.v = e.v), "
        "ds AS MATERIALIZED (SELECT count(*) AS n, max(deg) AS max_deg FROM deg) "
        "SELECT CAST(ds.n AS BIGINT) AS n_vertices, CAST(s.m AS BIGINT) AS n_edges, "
        "CAST(ds.max_deg AS BIGINT) AS max_deg, "
        "round(s.m * 2.0 / CAST(ds.n AS DOUBLE), 6) AS avg_deg, "
        "round(s.m * 2.0 / (CAST(ds.n AS DOUBLE) * (ds.n - 1.0)), 6) AS density, "
        "round((CAST(s.s_jk AS DOUBLE) / s.m - "
        "(CAST(s.s_sum AS DOUBLE) / (s.m * 2.0)) * (CAST(s.s_sum AS DOUBLE) / (s.m * 2.0))) / "
        "(CAST(s.s_sq AS DOUBLE) / (s.m * 2.0) - "
        "(CAST(s.s_sum AS DOUBLE) / (s.m * 2.0)) * (CAST(s.s_sum AS DOUBLE) / (s.m * 2.0))), 6) "
        "AS assortativity FROM s, ds"
    )


def rank_by_degree(deg: DataFrame, descending: bool = True) -> DataFrame:
    """Dense rank permutation by degree: ``(v, new_id)`` with new_id in [0, |V|).

    Mirrors ``ReorderDegDescending`` (`pre_processing.h:200-253`) / the Karypis
    ascending counting-sort (`2017-karypis-hepc-tc/ptc.c:79-124`). In the
    reference this buys cache locality + a dense hub id range for bitmap
    packing; in Spark its use is hub identification (rank < K ⇒ broadcastable
    hub set). (deg, v) is a total order, so the rank is deterministic.
    """
    order = [F.col("deg").desc(), F.col("v").asc()] if descending else [
        F.col("deg").asc(), F.col("v").asc()]
    return scalable_dense_rank(deg, order, ["v"], out_col="new_id").select(
        F.col("v").cast("long"), F.col("new_id").cast("long")
    )


def powerlaw_alpha(edges: DataFrame, dmin: int = 10) -> DataFrame:
    """One-row power-law tail fit of the degree distribution: the
    continuous-approximation MLE of Clauset-Shalizi-Newman (2009, eq. 3.7),

        alpha = 1 + n_tail / Σ_{deg≥dmin} ln(deg / (dmin − ½)),

    the standard "is this graph web-shaped?" report number next to
    ``graph_stats``'s assortativity. Output: ``(dmin, n_tail, alpha)``,
    alpha rounded to 6dp (NULL when the tail is empty).

    Determinism: the ln-sum is NOT taken with a distributed float aggregate
    (whose combine order varies run to run). The degree HISTOGRAM is exact
    integers (map-side-combined count), is at most max-degree rows, and is
    folded in ascending-degree order inside one array expression — a fixed
    IEEE operation sequence, mirrored in the oracle's ordered list fold.
    At any scale the histogram stays tiny relative to the graph (bounded by
    the distinct-degree count), so the single-task fold is O(max_deg).
    """
    hist = (
        degrees(edges)
        .where(F.col("deg") >= dmin)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    folded = hist.agg(
        F.sum("cnt").cast("long").alias("n_tail"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("deg", "cnt"))),
            F.lit(0.0),
            lambda acc, s: acc
            + s.cnt.cast("double")
            * F.log(s.deg.cast("double") / F.lit(dmin - 0.5)),
        ).alias("s_ln"),
    )
    return folded.select(
        F.lit(dmin).cast("long").alias("dmin"),
        F.coalesce(F.col("n_tail"), F.lit(0)).cast("long").alias("n_tail"),
        F.round(
            F.lit(1.0) + F.col("n_tail").cast("double") / F.col("s_ln"), 6
        ).alias("alpha"),
    )


def powerlaw_alpha_sql(edges_sql: str, dmin: int = 10) -> str:
    """DuckDB twin of ``powerlaw_alpha`` — identical ascending-degree
    ordered fold (list_sum folds in list order)."""
    return (
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "deg AS MATERIALIZED (SELECT x AS v, count(*) AS deg FROM "
        "(SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x), "
        f"hist AS MATERIALIZED (SELECT deg, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM deg WHERE deg >= {dmin} GROUP BY deg), "
        "f AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_tail, "
        "list_sum(list_transform(list_sort(list(struct_pack(d := deg, c := cnt))), "
        f"s -> CAST(s.c AS DOUBLE) * ln(CAST(s.d AS DOUBLE) / {dmin - 0.5}))) "
        "AS s_ln FROM hist) "
        f"SELECT CAST({dmin} AS BIGINT) AS dmin, n_tail, "
        "round(1.0 + CAST(n_tail AS DOUBLE) / s_ln, 6) AS alpha FROM f"
    )


def rich_club(edges: DataFrame, ks: list[int] | None = None) -> DataFrame:
    """Rich-club coefficients: for each threshold k, the edge density among
    vertices of degree > k (Colizza et al. 2006) — the "do hubs link to
    hubs?" web-science report, one row per k:
    ``(k, n_k, e_k, phi)`` with phi = 2·e_k / (n_k·(n_k−1)), 6dp (NULL when
    n_k < 2).

    All counts are exact integers (one degree join + one filter per the
    exploded k list); the only float is the final per-row division. Scale:
    the k list is a literal array — one explode (×|ks|) over the degree
    table and one over the degree-joined edges, both map-side-combined
    counts; no per-k passes over the graph.
    """
    ks = ks or [2, 4, 8, 16, 32, 64]
    karr = F.array([F.lit(k) for k in ks])
    deg = degrees(edges).localCheckpoint(eager=False)
    nk = (
        deg.select(F.explode(karr).alias("k"), "deg")
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("v").alias("v"), F.col("deg").alias("dv"))
    ek = (
        edges.join(du, "u").join(dv, "v")
        .select(F.explode(karr).alias("k"), "du", "dv")
        .where((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    base = edges.sparkSession.createDataFrame([(k,) for k in ks], "k long")
    return (
        base.join(nk, "k", "left").join(ek, "k", "left")
        .select(
            "k",
            F.coalesce("n_k", F.lit(0)).cast("long").alias("n_k"),
            F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
            F.when(
                F.coalesce("n_k", F.lit(0)) >= 2,
                F.round(
                    F.lit(2.0) * F.coalesce("e_k", F.lit(0))
                    / (F.col("n_k") * (F.col("n_k") - 1)),
                    6,
                ),
            ).alias("phi"),
        )
    )


def rich_club_sql(edges_sql: str, ks: list[int] | None = None) -> str:
    """DuckDB twin of ``rich_club``."""
    ks = ks or [2, 4, 8, 16, 32, 64]
    klist = ", ".join(f"({k})" for k in ks)
    return (
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "deg AS MATERIALIZED (SELECT x AS v, count(*) AS deg FROM "
        "(SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x), "
        f"ks(k) AS (VALUES {klist}), "
        "nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM ks, deg "
        "WHERE deg > k GROUP BY k), "
        "ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_k FROM ks, "
        "(SELECT du.deg AS du, dv.deg AS dv FROM e "
        "JOIN deg du ON du.v = e.u JOIN deg dv ON dv.v = e.v) "
        "WHERE du > k AND dv > k GROUP BY k) "
        "SELECT CAST(ks.k AS BIGINT) AS k, "
        "CAST(coalesce(nk.n_k, 0) AS BIGINT) AS n_k, "
        "CAST(coalesce(ek.e_k, 0) AS BIGINT) AS e_k, "
        "CASE WHEN coalesce(nk.n_k, 0) >= 2 THEN "
        "round(2.0 * coalesce(ek.e_k, 0) / (nk.n_k * (nk.n_k - 1)), 6) END AS phi "
        "FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k"
    )


def degree_gini(edges: DataFrame) -> DataFrame:
    """Gini coefficient of the degree distribution — the standard
    "how centralized is this web graph?" inequality scalar (0 = regular
    graph, →1 = one mega-hub):

        G = (2·Σ_i i·d_(i)) / (n·Σd) − (n+1)/n,   d sorted ascending.

    Output one row ``(n, sum_deg, gini)``, gini at 6dp (NULL when n < 2 or
    the degree sum is 0).

    Exactness: over each group of equal degrees at cumulative offset
    ``cum``, 2·Σ i·d collapses to the integer d·cnt·(2·cum + cnt + 1), so
    the whole numerator is one decimal(38) sum of per-degree integer terms
    — no float until the final expression, bit-stable across
    partitionings. The running offset is a window over the degree
    HISTOGRAM (≤ max_deg rows — a single-task window over a tiny table,
    same bound as powerlaw_alpha's fold), never over the vertex table.
    """
    from pyspark.sql import Window

    hist = (
        degrees(edges)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, -1)
    dec = "decimal(38,0)"
    terms = hist.select(
        "deg",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum"),
    ).select(
        F.col("cnt").cast(dec).alias("cnt_d"),
        (F.col("deg").cast(dec) * F.col("cnt").cast(dec)).alias("dsum"),
        (
            F.col("deg").cast(dec)
            * F.col("cnt").cast(dec)
            * (
                F.lit(2).cast(dec) * F.col("cum").cast(dec)
                + F.col("cnt").cast(dec)
                + F.lit(1).cast(dec)
            )
        ).alias("num2"),
    )
    agg = terms.agg(
        F.sum("cnt_d").alias("n"),
        F.sum("dsum").alias("sum_deg"),
        F.sum("num2").alias("s2"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("sum_deg").cast("long").alias("sum_deg"),
        F.when(
            (F.col("n") >= 2) & (F.col("sum_deg") > 0),
            F.round(
                F.col("s2").cast("double") / (n * F.col("sum_deg").cast("double"))
                - (n + F.lit(1.0)) / n,
                6,
            ),
        ).alias("gini"),
    )


def degree_gini_sql(edges_sql: str) -> str:
    """DuckDB twin of ``degree_gini`` — identical histogram window and the
    same parenthesized final expression."""
    return (
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "deg AS (SELECT x AS v, count(*) AS deg FROM "
        "(SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x), "
        "hist AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY deg), "
        "t AS (SELECT deg, cnt, CAST(coalesce(sum(cnt) OVER "
        "(ORDER BY deg ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum "
        "FROM hist), "
        "a AS (SELECT sum(CAST(cnt AS HUGEINT)) AS n, "
        "sum(CAST(deg AS HUGEINT) * CAST(cnt AS HUGEINT)) AS sum_deg, "
        "sum(CAST(deg AS HUGEINT) * CAST(cnt AS HUGEINT) * "
        "(2 * CAST(cum AS HUGEINT) + CAST(cnt AS HUGEINT) + 1)) AS s2 FROM t) "
        "SELECT CAST(n AS BIGINT) AS n, CAST(sum_deg AS BIGINT) AS sum_deg, "
        "CASE WHEN n >= 2 AND sum_deg > 0 THEN "
        "round(CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sum_deg AS DOUBLE)) "
        "- (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) END AS gini FROM a"
    )


def molloy_reed(edges: DataFrame) -> DataFrame:
    """Molloy-Reed percolation criterion κ = ⟨k²⟩/⟨k⟩ — the robustness
    scalar of network science: a configuration-model graph has a giant
    component iff κ > 2, and κ drives the targeted-attack threshold
    f_c = 1 − 1/(κ−1). One row ``(n, sum_deg, sum_deg2, kappa)``, κ at 6dp.

    Exactness: Σd and Σd² are decimal(38) sums of per-vertex integers
    (d² ≤ 2⁶⁴ needs the wide type at web scale); κ is one double division.
    One aggregate over the degree table — no extra shuffle beyond degrees'.
    """
    dec = "decimal(38,0)"
    agg = degrees(edges).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("deg").cast(dec)).alias("sum_deg"),
        F.sum(F.col("deg").cast(dec) * F.col("deg").cast(dec)).alias("sum_deg2"),
    )
    return agg.select(
        "n",
        F.col("sum_deg").cast("long").alias("sum_deg"),
        F.col("sum_deg2").cast("long").alias("sum_deg2"),
        F.when(
            F.col("sum_deg") > 0,
            F.round(
                F.col("sum_deg2").cast("double") / F.col("sum_deg").cast("double"), 6
            ),
        ).alias("kappa"),
    )


def molloy_reed_sql(edges_sql: str) -> str:
    """DuckDB twin of ``molloy_reed``."""
    return (
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "deg AS (SELECT x AS v, count(*) AS deg FROM "
        "(SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x), "
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "sum(CAST(deg AS HUGEINT)) AS sum_deg, "
        "sum(CAST(deg AS HUGEINT) * CAST(deg AS HUGEINT)) AS sum_deg2 FROM deg) "
        "SELECT n, CAST(sum_deg AS BIGINT) AS sum_deg, "
        "CAST(sum_deg2 AS BIGINT) AS sum_deg2, "
        "CASE WHEN sum_deg > 0 THEN "
        "round(CAST(sum_deg2 AS DOUBLE) / CAST(sum_deg AS DOUBLE), 6) END AS kappa "
        "FROM a"
    )
