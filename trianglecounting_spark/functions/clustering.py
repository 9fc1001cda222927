"""Deterministic embedding clustering + SemDeDup-style semantic dedup.

The scale path for embedding dedup at 100 TB is cluster-then-compare
(SemDeDup, Abbas et al. 2023): k-means the corpus, then do pairwise cosine
ONLY within a cluster — never all-pairs. This module implements both halves
so the whole pipeline is one declarative plan, and makes the k-means itself
exact-oracle-checkable, which needs two determinism devices:

1. **Integer-grid points** (``similarity.int_grid``): q = floor(x·scale) kept
   as doubles. Centroid state is then (cell, n, s) with s = the elementwise
   SUM of member vectors — exact integers, order-independent — instead of a
   float mean, which would depend on aggregation order.
2. **Integer-exact distance numerator**: comparing ||x − s/n||² across cells
   uses    dist² = (n²·|x|² − 2n·(x·s) + |s|²) / n²
   whose numerator is a sum/product of exact integers. With the magnitude
   budget   dim · (scale·|x|ₘₐₓ)² · n²  <  2⁵³
   (here 64 · ~531² · 500² ≈ 1.8e13), every term and the total are exact in a
   double in BOTH engines regardless of summation order; the single closing
   division is one IEEE op, so the rounded(6dp) dist² is bit-portable. Ties
   at the 6dp boundary cannot occur: num/n² rounds to a 7th decimal digit of
   5 only if 10⁷/n² is odd — impossible for a square divisor of 10⁷.

Lloyd iterations run a FIXED count in both engines (no fixpoint detection
needed for parity). Seeds = the k lowest-id vectors, the same deterministic
convention as ``similarity.ann_ivf_topk``.

Plan shape per iteration: one broadcast crossJoin (points × k centroids) +
one per-point window argmin + one posexplode/groupBy centroid re-sum —
shuffles keyed on (cell, pos), k·dim keys, never skewed. SemDeDup's pair
stage joins members on the cluster id; production bounds cluster sizes by
scaling k with the corpus (k ∝ N/target_cluster_size), which keeps the
per-cluster quadratic term constant — same shape as the reference-free
LSH-bucket cap in similarity.py.

No counterpart in /root/reference (a triangle-counting engine); this is part
of the LLM-training-data operator family the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from trianglecounting_spark.functions.similarity import _dot, _norm


def _quantized(embeddings: DataFrame, id_col: str, vec_col: str,
               scale: int) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x * scale).cast("double")
        ).alias("q"),
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per point: rounded exact-numerator dist², ties to the
    lowest cell id."""
    xx = _dot(F.col("q"), F.col("q"))
    xs = _dot(F.col("q"), F.col("s"))
    ss = _dot(F.col("s"), F.col("s"))
    n = F.col("n")
    d2 = F.round((n * n * xx - 2 * n * xs + ss) / (n * n), 6)
    scored = pts.crossJoin(F.broadcast(cent)).select(
        "vec_id", "q", "cell", d2.alias("dist2")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("vec_id", "q", "cell", "dist2")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroid state (cell, n, s): exact member count + elementwise
    integer sum (posexplode → per-(cell,pos) sum → array rebuilt in pos
    order). Empty cells simply drop out — identically in the SQL twin."""
    sums = (
        assigned.select("cell", F.posexplode("q").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.sum("val").alias("sv"))
    )
    s = sums.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sv"))),
            lambda x: x["sv"],
        ).alias("s")
    )
    n = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    return n.join(s, "cell")


def kmeans_assign(embeddings: DataFrame, k: int = 8, iters: int = 3,
                  scale: int = 1000, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic Lloyd k-means over the integer grid. Runs ``iters``
    assignment passes (with ``iters − 1`` centroid recomputes between them)
    and returns the final assignment ``(vec_id, cluster, dist2)``."""
    pts = _quantized(embeddings, id_col, vec_col, scale)
    cent = pts.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cell"),
        F.lit(1.0).alias("n"),
        F.col("q").alias("s"),
    )
    assigned = _assign(pts, cent)
    for _ in range(iters - 1):
        assigned = _assign(pts, _recompute(assigned))
    return assigned.select(
        "vec_id", F.col("cell").alias("cluster"), "dist2"
    )


def _kmeans_ctes(k: int, iters: int, scale: int, dim: int,
                 emb_sql: str) -> tuple[list[str], str]:
    """Shared CTE chain for the DuckDB twins; returns (ctes, final_asg)."""
    ctes = [
        "pts AS MATERIALIZED (SELECT vec_id, list_transform(embedding::DOUBLE[], "
        f"x -> CAST(floor(x * {scale}) AS DOUBLE)) AS q FROM {emb_sql})",
        f"cent0 AS MATERIALIZED (SELECT vec_id AS cell, 1.0 AS n, q AS s "
        f"FROM pts ORDER BY vec_id LIMIT {k})",
    ]
    ldp = "list_dot_product"
    for t in range(iters):
        ctes.append(
            f"asg{t} AS MATERIALIZED (SELECT vec_id, q, cell, dist2 FROM ("
            f"SELECT p.vec_id, p.q, c.cell, "
            f"round((c.n*c.n*{ldp}(p.q,p.q) - 2*c.n*{ldp}(p.q,c.s) "
            f"+ {ldp}(c.s,c.s)) / (c.n*c.n), 6) AS dist2, "
            f"row_number() OVER (PARTITION BY p.vec_id ORDER BY "
            f"round((c.n*c.n*{ldp}(p.q,p.q) - 2*c.n*{ldp}(p.q,c.s) "
            f"+ {ldp}(c.s,c.s)) / (c.n*c.n), 6) ASC, c.cell ASC) AS rk "
            f"FROM pts p CROSS JOIN cent{t} c) WHERE rk = 1)"
        )
        if t < iters - 1:
            ctes.append(
                f"cent{t+1} AS MATERIALIZED (SELECT n.cell, n.n, s.s FROM "
                f"(SELECT cell, CAST(count(*) AS DOUBLE) AS n FROM asg{t} "
                f"GROUP BY cell) n JOIN "
                f"(SELECT cell, list(sv ORDER BY i) AS s FROM "
                f"(SELECT cell, i, sum(q[i]) AS sv FROM asg{t}, "
                f"(SELECT unnest(range(1, {dim + 1})) AS i) GROUP BY cell, i) "
                f"GROUP BY cell) s USING (cell))"
            )
    return ctes, f"asg{iters - 1}"


def kmeans_assign_sql(k: int = 8, iters: int = 3, scale: int = 1000,
                      dim: int = 64, emb_sql: str = "embeddings") -> str:
    """DuckDB twin of ``kmeans_assign`` — identical seeds, grid, exact
    numerator, rounding, and tie-break."""
    ctes, final = _kmeans_ctes(k, iters, scale, dim, emb_sql)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT vec_id, cell AS cluster, dist2 FROM {final} ORDER BY vec_id"
    )


def semantic_dedup(embeddings: DataFrame, k: int = 8, iters: int = 3,
                   scale: int = 1000, threshold: float = 0.2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means, then inside each cluster drop
    any vector whose cosine to a LOWER-id cluster-mate is ≥ ``threshold``.
    Output ``(vec_id, cluster, keep)`` for every vector.

    The pair stage is cluster-bounded — candidates come from a self-join on
    the cluster id, so total comparison volume is Σ|cluster|², controlled by
    k, never the corpus-quadratic all-pairs. Cosine is computed on the
    ORIGINAL float embeddings (the cluster step only gates candidates) and
    rounded to 6dp before the threshold test, the same portability contract
    as similarity.cosine_topk."""
    members = kmeans_assign(embeddings, k=k, iters=iters, scale=scale,
                            id_col=id_col, vec_col=vec_col)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    m = members.select("vec_id", "cluster").join(e, "vec_id")
    a = m.select(
        F.col("vec_id"), F.col("cluster"), F.col("v").alias("va")
    )
    b = m.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("cluster"),
        F.col("v").alias("vb"),
    )
    sim = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("nbr_id") < F.col("vec_id"))
        .where(F.round(sim, 6) >= threshold)
        .select("vec_id")
        .distinct()
        .withColumn("__drop", F.lit(1))
    )
    return (
        members.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select("vec_id", "cluster", F.col("__drop").isNull().alias("keep"))
    )


def semantic_dedup_sql(k: int = 8, iters: int = 3, scale: int = 1000,
                       threshold: float = 0.2, dim: int = 64,
                       emb_sql: str = "embeddings") -> str:
    """DuckDB twin of ``semantic_dedup``."""
    ctes, final = _kmeans_ctes(k, iters, scale, dim, emb_sql)
    ldp = "list_dot_product"
    ctes.append(
        f"m AS MATERIALIZED (SELECT a.vec_id, a.cell AS cluster, "
        f"e.embedding::DOUBLE[] AS v FROM {final} a "
        f"JOIN {emb_sql} e USING (vec_id))"
    )
    ctes.append(
        "dropped AS (SELECT DISTINCT a.vec_id FROM m a JOIN m b "
        "ON a.cluster = b.cluster AND b.vec_id < a.vec_id "
        f"WHERE round({ldp}(a.v, b.v) / (sqrt({ldp}(a.v, a.v)) "
        f"* sqrt({ldp}(b.v, b.v))), 6) >= {threshold})"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT m.vec_id, m.cluster, d.vec_id IS NULL AS keep FROM m "
        "LEFT JOIN dropped d ON d.vec_id = m.vec_id ORDER BY m.vec_id"
    )
