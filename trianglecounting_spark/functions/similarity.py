"""Embedding similarity search over the `embeddings` table.

Brute-force exact cosine top-k as the verifiable baseline, and an LSH-bucketed
approximate variant as the scale path (the 100 TB design: candidate
generation via sign-random-projection buckets, exact re-rank inside buckets).

Float determinism: cosine similarity is a short fixed-order dot product
(`aggregate` over zipped arrays both here and in DuckDB's list_*), rounded to
6 digits for the oracle hash. Top-k per query is rank-deterministic with the
tie-break (sim DESC, candidate id ASC).

Hot path stays JVM-side: `F.zip_with` + `F.aggregate` compile to codegen'd
array expressions — no Python. The pandas-UDF variant (`cosine_topk_kernel`)
exists for the wide-vector regime where numpy matmul beats per-element
codegen; both return identical results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_topk(embeddings: DataFrame, k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for every vector (excluding itself).

    Output (vec_id, nbr_id, sim, rnk). Physical plan: block-nested-loop
    self-join (cartesian within Spark's BroadcastNestedLoopJoin when one side
    broadcasts) + windowed rank. O(n²) by definition — the exact baseline; use
    `ann_lsh_topk` at scale.
    """
    a = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    pairs = (
        a.crossJoin(b)
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "nbr_id", F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nbr_id", "sim", F.col("rnk").cast("long").alias("rnk"))
    )


def cosine_topk_sql(k: int = 5) -> str:
    """DuckDB oracle: same join + window, list_dot_product for the fixed-order
    dot. Rounded to 6 digits; ties broken identically."""
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, nbr_id, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rnk
  FROM pairs
) SELECT vec_id, nbr_id, sim, CAST(rnk AS BIGINT) AS rnk FROM ranked
WHERE rnk <= {k} ORDER BY vec_id, rnk
""".strip()


# ---------------------------------------------------------------------------
# Scale path: sign-random-projection LSH buckets + in-bucket exact re-rank
# ---------------------------------------------------------------------------

def _srp_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a counter-based hash —
    reproducible across processes with no RNG state."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) / float(1 << 32)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_planes_int(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Integer-valued hyperplanes in [-1000, 1000] from the same counter-based
    hash. With integer-grid embeddings (``int_grid``), every plane dot product
    is an exact integer in a double, so bucket SIGNS are bit-portable across
    engines — the property that lets the driver hash-compare ANN buckets
    against a DuckDB oracle (float planes put sign flips at the mercy of FP
    summation order)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(float(int(h[:8], 16) % 2001 - 1000))
        planes.append(row)
    return planes


def int_grid(embeddings: DataFrame, vec_col: str = "embedding", scale: int = 1000) -> DataFrame:
    """Quantize an embedding column to an integer grid (floor(x·scale), kept
    as double): exact integer arithmetic inside doubles, identical in Spark
    and DuckDB. floor (not round) dodges cross-engine round-half conventions."""
    return embeddings.withColumn(
        vec_col,
        F.transform(F.col(vec_col), lambda x: F.floor(x * scale).cast("double")),
    )


def srp_bucket(embeddings: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
               vec_col: str = "embedding",
               planes: list[list[float]] | None = None) -> DataFrame:
    """Assign each vector its sign-random-projection bucket id (long)."""
    planes = planes if planes is not None else _srp_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(F.col(vec_col), plane_arr)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return embeddings.withColumn("bucket", bucket)


# Universal-hash constants for the hot-bucket salt split: pure int64
# arithmetic with no overflow ((x % M)·A < 2^62), identical in Spark and
# DuckDB, so capped bucket assignments — and therefore the candidate set —
# are bit-portable across engines.
_CAP_M = 1_000_000_007
_CAP_A = 2_654_435_761
BUCKET_CAP_DEFAULT = 20_000


def _salted(bucketed: DataFrame, bucket_cap: int, seed: int) -> DataFrame:
    """Bound the LSH self-join's per-bucket pair volume: a bucket of size s
    is split into ``ceil(s / bucket_cap)`` salt groups by a universal hash of
    ``vec_id``, and the candidate join keys on (bucket, salt).

    Rationale (100 TB): a degenerate embedding cluster — all vectors on one
    side of every plane, common in near-duplicate-heavy corpora — puts n rows
    in one bucket and the uncapped join emits n² pairs; AQE splits the shuffle
    but not the pair volume. Salting caps any single bucket's output at
    ~nsplit·cap² pairs (linear in s for fixed cap), the same hub-capping move
    as `capped_adjacency`. Id-hash (not re-projection) splitting is the only
    rule that also bounds IDENTICAL vectors, which collide under every
    possible hyperplane. Cost: recall inside over-full buckets only — pairs
    across salt groups are dropped, exactly the n² flood being bounded; under
    the cap the salt is constant 0 and results are unchanged.
    """
    sizes = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz"))
    nsplit = F.ceil(F.col("_bsz") / F.lit(float(bucket_cap))).cast("long")
    salt = (
        (F.col("vec_id") % F.lit(_CAP_M)) * F.lit(_CAP_A) + F.lit(seed)
    ) % F.lit(_CAP_M) % nsplit
    return (
        bucketed.join(sizes, "bucket")
        .select("vec_id", "bucket", salt.alias("salt"))
    )


def _cap_sql_ctes(bucket_cols_table: str, tables: int, bucket_cap: int,
                  seed: int) -> tuple[str, list[str]]:
    """DuckDB twin of ``_salted``: per-table salted-bucket CTEs over the
    bucket table ``b``. Returns (ctes_sql, per-table CTE names)."""
    ctes, names = [], []
    for t in range(tables):
        ctes.append(
            f"bsz{t} AS MATERIALIZED (SELECT bkt{t} AS k, count(*) AS c "
            f"FROM {bucket_cols_table} GROUP BY bkt{t})"
        )
        ctes.append(
            f"bs{t} AS MATERIALIZED (SELECT b.vec_id, b.bkt{t}, "
            f"((b.vec_id % {_CAP_M}) * {_CAP_A} + {seed}) % {_CAP_M} "
            f"% CAST(ceil(z.c * 1.0 / {bucket_cap}) AS BIGINT) AS salt "
            f"FROM {bucket_cols_table} b JOIN bsz{t} z ON z.k = b.bkt{t})"
        )
        names.append(f"bs{t}")
    return ", ".join(ctes), names


def ann_lsh_topk(embeddings: DataFrame, dim: int, k: int = 5, n_planes: int = 8,
                 seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
                 tables: int = 1,
                 planes_per_table: list[list[list[float]]] | None = None,
                 bucket_cap: int = BUCKET_CAP_DEFAULT) -> DataFrame:
    """Approximate top-k: candidate pairs from ``tables`` independent SRP
    bucket tables (OR-ing — the standard LSH recall lever), deduplicated, then
    ONE exact cosine re-rank over the distinct candidate set.

    Each table's self-join is on its `bucket` — expected bucket size
    n/2^planes, so the pair space shrinks by ~2^planes vs brute force while
    extra tables recover recall multiplicatively; buckets over ``bucket_cap``
    are salt-split (``_salted``) so no degenerate cluster can emit O(n²)
    pairs. Candidates-then-rerank keeps the (wide) vector payload out of the
    candidate shuffle: the per-table joins move only (bucket, salt, id)
    rows; vectors are joined back once.
    Output schema identical to `cosine_topk`.
    """
    if planes_per_table is None:
        planes_per_table = [
            _srp_planes(dim, n_planes, seed + t) for t in range(tables)
        ]
    ids_only = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    cands = None
    for planes in planes_per_table:
        bucketed = srp_bucket(ids_only, dim, n_planes, seed, vec_col, planes=planes)
        salted = _salted(bucketed, bucket_cap, seed)
        a = salted.select("bucket", "salt", "vec_id")
        b = salted.select("bucket", "salt", F.col("vec_id").alias("nbr_id"))
        p = (
            a.join(b, ["bucket", "salt"])
            .where(F.col("vec_id") != F.col("nbr_id"))
            .select("vec_id", "nbr_id")
        )
        cands = p if cands is None else cands.unionAll(p)
    cands = cands.distinct()
    va = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    pairs = cands.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id", "nbr_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nbr_id", "sim", F.col("rnk").cast("long").alias("rnk"))
    )


def ann_lsh_topk_portable(embeddings: DataFrame, dim: int, k: int = 5,
                          n_planes: int = 6, seed: int = 42, tables: int = 2,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          scale: int = 1000,
                          bucket_cap: int = BUCKET_CAP_DEFAULT) -> DataFrame:
    """Engine-portable ANN: integer-grid embeddings × integer planes make
    every bucket sign exact, so the result is hash-comparable against the
    DuckDB twin ``ann_lsh_topk_sql`` (the driver CORRECTNESS gate)."""
    grid = int_grid(embeddings, vec_col, scale)
    planes = [srp_planes_int(dim, n_planes, seed + t) for t in range(tables)]
    return ann_lsh_topk(
        grid, dim, k, n_planes, seed, id_col, vec_col,
        tables=tables, planes_per_table=planes, bucket_cap=bucket_cap,
    )


def ann_lsh_topk_sql(dim: int, k: int = 5, n_planes: int = 6, seed: int = 42,
                     tables: int = 2, scale: int = 1000,
                     bucket_cap: int = BUCKET_CAP_DEFAULT) -> str:
    """DuckDB oracle for ``ann_lsh_topk_portable``: identical integer planes
    (emitted as literals), identical floor-grid quantization, identical
    hot-bucket salt split, identical candidate OR-ing + re-rank + rounding +
    tie-break."""
    plane_sets = [srp_planes_int(dim, n_planes, seed + t) for t in range(tables)]

    def bucket_expr(planes: list[list[float]]) -> str:
        terms = []
        for p, plane in enumerate(planes):
            lits = ", ".join(str(int(x)) for x in plane)
            terms.append(
                f"(CASE WHEN list_dot_product(e, [{lits}]::DOUBLE[]) >= 0 "
                f"THEN {1 << p} ELSE 0 END)"
            )
        return " + ".join(terms)

    bucket_cols = ", ".join(
        f"{bucket_expr(ps)} AS bkt{t}" for t, ps in enumerate(plane_sets)
    )
    cap_ctes, names = _cap_sql_ctes("b", tables, bucket_cap, seed)
    cand_selects = " UNION ".join(
        f"SELECT a.vec_id AS vec_id, b2.vec_id AS nbr_id FROM {names[t]} a "
        f"JOIN {names[t]} b2 ON a.bkt{t} = b2.bkt{t} AND a.salt = b2.salt "
        f"AND a.vec_id <> b2.vec_id"
        for t in range(tables)
    )
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * {scale})) AS e
  FROM embeddings
), b AS MATERIALIZED (
  SELECT vec_id, {bucket_cols} FROM emb
), {cap_ctes}, cand AS MATERIALIZED (
  {cand_selects}
), pairs AS (
  SELECT c.vec_id, c.nbr_id,
         round(list_dot_product(x.e, y.e) /
               (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6) AS sim
  FROM cand c JOIN emb x ON x.vec_id = c.vec_id JOIN emb y ON y.vec_id = c.nbr_id
), ranked AS (
  SELECT vec_id, nbr_id, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rnk
  FROM pairs
) SELECT vec_id, nbr_id, sim, CAST(rnk AS BIGINT) AS rnk FROM ranked
WHERE rnk <= {k} ORDER BY vec_id, rnk
""".strip()


# ---------------------------------------------------------------------------
# Pandas-UDF matmul kernel (wide-vector regime)
# ---------------------------------------------------------------------------

def cosine_topk_kernel(embeddings: DataFrame, k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       max_rows: int = 1_000_000) -> DataFrame:
    """Brute-force exact top-k via a broadcast matrix + mapInPandas matmul.

    The full (normalized) matrix is broadcast once; each Arrow batch computes
    a `batch × all` similarity block with one numpy matmul and extracts top-k
    with argpartition. This is the SMALL-REGIME tool by declared design (the
    matrix is collected on the driver): ``max_rows`` makes the cap an enforced
    contract rather than a docstring — beyond it, use ``ann_lsh_topk`` (no
    collect, no all-pairs). Results identical to `cosine_topk` (same rounding
    and tie-break).
    """
    spark = embeddings.sparkSession
    # the cap is enforced on the collect itself (limit probe) — a separate
    # count() action would evaluate the whole upstream plan twice when the
    # input is an unmaterialized pipeline
    rows = embeddings.select(id_col, vec_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"cosine_topk_kernel is the small-regime exact tool: > "
            f"max_rows={max_rows} vectors; use ann_lsh_topk (bucketed, "
            "distributed) at this scale"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(q @ all_mat.T, 6)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            out = {"vec_id": [], "nbr_id": [], "sim": [], "rnk": []}
            for i, qid in enumerate(qids):
                row = sims[i]
                mask = all_ids != qid
                cand_ids, cand_sims = all_ids[mask], row[mask]
                # sort by (-sim, id): lexsort keys are last-key-primary
                ordr = np.lexsort((cand_ids, -cand_sims))[:k]
                out["vec_id"].extend([qid] * len(ordr))
                out["nbr_id"].extend(cand_ids[ordr].tolist())
                out["sim"].extend(cand_sims[ordr].tolist())
                out["rnk"].extend(range(1, len(ordr) + 1))
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col).mapInPandas(
        block, schema="vec_id long, nbr_id long, sim double, rnk long"
    )


def embedding_near_duplicates(embeddings: DataFrame, dim: int, threshold: float = 0.95,
                              n_planes: int = 6, seed: int = 42, tables: int = 2,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              portable: bool = False, scale: int = 1000,
                              bucket_cap: int = BUCKET_CAP_DEFAULT) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH candidate generation
    (multi-table SRP buckets — never all-pairs, hot buckets salt-split) +
    exact cosine filter.

    The embedding-space member of the dedup family (dedup.py holds the text
    ones): output ``(id_a, id_b, sim)`` with id_a < id_b, sim ≥ threshold,
    rounded to 6 digits. ``portable=True`` uses the integer-grid/-plane
    variant so the result is oracle-hashable across engines.
    """
    emb = int_grid(embeddings, vec_col, scale) if portable else embeddings
    planes = (
        [srp_planes_int(dim, n_planes, seed + t) for t in range(tables)]
        if portable
        else [_srp_planes(dim, n_planes, seed + t) for t in range(tables)]
    )
    ids_only = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    cands = None
    for ps in planes:
        bucketed = srp_bucket(ids_only, dim, n_planes, seed, vec_col, planes=ps)
        salted = _salted(bucketed, bucket_cap, seed)
        a = salted.select("bucket", "salt", F.col("vec_id").alias("id_a"))
        b = salted.select("bucket", "salt", F.col("vec_id").alias("id_b"))
        p = (
            a.join(b, ["bucket", "salt"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = p if cands is None else cands.unionAll(p)
    cands = cands.distinct()
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def embedding_near_duplicates_sql(dim: int, threshold: float = 0.95, n_planes: int = 6,
                                  seed: int = 42, tables: int = 2,
                                  scale: int = 1000,
                                  bucket_cap: int = BUCKET_CAP_DEFAULT) -> str:
    """DuckDB twin of ``embedding_near_duplicates(portable=True)``."""
    plane_sets = [srp_planes_int(dim, n_planes, seed + t) for t in range(tables)]

    def bucket_expr(planes: list[list[float]]) -> str:
        terms = []
        for p, plane in enumerate(planes):
            lits = ", ".join(str(int(x)) for x in plane)
            terms.append(
                f"(CASE WHEN list_dot_product(e, [{lits}]::DOUBLE[]) >= 0 "
                f"THEN {1 << p} ELSE 0 END)"
            )
        return " + ".join(terms)

    bucket_cols = ", ".join(
        f"{bucket_expr(ps)} AS bkt{t}" for t, ps in enumerate(plane_sets)
    )
    cap_ctes, names = _cap_sql_ctes("b", tables, bucket_cap, seed)
    cand_selects = " UNION ".join(
        f"SELECT a.vec_id AS id_a, b2.vec_id AS id_b FROM {names[t]} a "
        f"JOIN {names[t]} b2 ON a.bkt{t} = b2.bkt{t} AND a.salt = b2.salt "
        f"AND a.vec_id < b2.vec_id"
        for t in range(tables)
    )
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> floor(x * {scale})) AS e
  FROM embeddings
), b AS MATERIALIZED (
  SELECT vec_id, {bucket_cols} FROM emb
), {cap_ctes}, cand AS MATERIALIZED (
  {cand_selects}
)
SELECT c.id_a, c.id_b,
       round(list_dot_product(x.e, y.e) /
             (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6) AS sim
FROM cand c JOIN emb x ON x.vec_id = c.id_a JOIN emb y ON y.vec_id = c.id_b
WHERE round(list_dot_product(x.e, y.e) /
            (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6) >= {threshold}
ORDER BY id_a, id_b
""".strip()


def ann_ivf_topk(embeddings: DataFrame, n_cells: int = 16, nprobe: int = 2,
                 k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
                 cell_cap: int = BUCKET_CAP_DEFAULT, seed: int = 42) -> DataFrame:
    """IVF-style ANN top-k — the inverted-file counterpart to `ann_lsh_topk`
    (the brief's "IVF or LSH-bucketed variant as the scale path"; this is the
    IVF member).

    Coarse quantizer: the ``n_cells`` lowest-id vectors serve as
    deterministic centroid seeds (production swaps in k-means centroids; the
    routing + join SHAPE — which is what costs anything at scale — is
    identical, and determinism is what makes the DuckDB oracle exact).
    Routing: every vector scores all centroids (a broadcast of ``n_cells``
    vectors; O(n·C) dot products — the standard IVF assignment cost) and is
    ASSIGNED to its top cell; at query time it PROBES its ``nprobe`` best
    cells. Candidates = probe list ⋈ member list on the cell id — each
    member sits in exactly one cell, so a (vec, nbr) pair arises at most
    once and needs NO distinct. Exact cosine re-rank, same output schema as
    `cosine_topk`.

    Skew: a degenerate corpus can route everything into one cell; members
    AND probes are salt-split by the same id-hash once a cell exceeds
    ``cell_cap`` (the `_salted` rule — volume capped at ~nsplit·cap² per
    cell, recall loss confined to over-full cells, salt constant 0 under the
    cap). Cell similarity is rounded to 6dp BEFORE ranking so the argmax is
    engine-portable.
    """
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    cents = (
        e.orderBy("vec_id").limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
    )
    csim = _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell", F.round(csim, 6).alias("csim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    ranked = scored.withColumn("crk", F.row_number().over(w))
    members = ranked.where(F.col("crk") == 1).select("vec_id", "cell")
    probes = ranked.where(F.col("crk") <= nprobe).select("vec_id", "cell")

    sizes = members.groupBy("cell").agg(F.count(F.lit(1)).alias("_csz"))
    nsplit = F.ceil(F.col("_csz") / F.lit(float(cell_cap))).cast("long")
    salt = (
        (F.col("vec_id") % F.lit(_CAP_M)) * F.lit(_CAP_A) + F.lit(seed)
    ) % F.lit(_CAP_M) % nsplit
    mem_s = members.join(sizes, "cell").select(
        F.col("vec_id").alias("nbr_id"), "cell", salt.alias("salt")
    )
    probe_s = probes.join(sizes, "cell").select("vec_id", "cell", salt.alias("salt"))
    cands = (
        probe_s.join(mem_s, ["cell", "salt"])
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "nbr_id")
    )
    va = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    pairs = cands.join(va, "vec_id").join(vb, "nbr_id").select(
        "vec_id", "nbr_id", F.round(sim, 6).alias("sim")
    )
    wr = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nbr_id", "sim", F.col("rnk").cast("long").alias("rnk"))
    )


def ann_ivf_topk_sql(n_cells: int = 16, nprobe: int = 2, k: int = 5,
                     cell_cap: int = BUCKET_CAP_DEFAULT, seed: int = 42) -> str:
    """DuckDB twin of ``ann_ivf_topk`` — same seeds-as-centroids, same
    rounded-then-ranked assignment, same id-hash salt rule."""
    ldp = "list_dot_product"
    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS MATERIALIZED (SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT {n_cells}),
scored AS (SELECT e.vec_id, c.cell,
    round({ldp}(e.v, c.cv) / (sqrt({ldp}(e.v, e.v)) * sqrt({ldp}(c.cv, c.cv))), 6) AS csim
  FROM e CROSS JOIN cents c),
ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
    ORDER BY csim DESC, cell ASC) AS crk FROM scored),
members AS MATERIALIZED (SELECT vec_id, cell FROM ranked WHERE crk = 1),
probes AS MATERIALIZED (SELECT vec_id, cell FROM ranked WHERE crk <= {nprobe}),
csz AS (SELECT cell, count(*) AS c FROM members GROUP BY cell),
mem_s AS (SELECT m.vec_id AS nbr_id, m.cell,
    ((m.vec_id % {_CAP_M}) * {_CAP_A} + {seed}) % {_CAP_M}
    % CAST(ceil(z.c * 1.0 / {cell_cap}) AS BIGINT) AS salt
  FROM members m JOIN csz z USING (cell)),
probe_s AS (SELECT p.vec_id, p.cell,
    ((p.vec_id % {_CAP_M}) * {_CAP_A} + {seed}) % {_CAP_M}
    % CAST(ceil(z.c * 1.0 / {cell_cap}) AS BIGINT) AS salt
  FROM probes p JOIN csz z USING (cell)),
cands AS (SELECT p.vec_id, m.nbr_id FROM probe_s p
  JOIN mem_s m ON m.cell = p.cell AND m.salt = p.salt
  WHERE p.vec_id <> m.nbr_id),
pairs AS (SELECT c.vec_id, c.nbr_id,
    round({ldp}(a.v, b.v) / (sqrt({ldp}(a.v, a.v)) * sqrt({ldp}(b.v, b.v))), 6) AS sim
  FROM cands c JOIN e a ON a.vec_id = c.vec_id JOIN e b ON b.vec_id = c.nbr_id)
SELECT vec_id, nbr_id, sim, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
      ORDER BY sim DESC, nbr_id ASC) AS rnk FROM pairs)
WHERE rnk <= {k} ORDER BY vec_id, rnk
""".strip()
