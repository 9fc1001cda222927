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


def srp_bucket(embeddings: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector its sign-random-projection bucket id (long)."""
    planes = _srp_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(F.col(vec_col), plane_arr)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return embeddings.withColumn("bucket", bucket)


def ann_lsh_topk(embeddings: DataFrame, dim: int, k: int = 5, n_planes: int = 8,
                 seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine re-rank within each SRP bucket.

    The self-join is on `bucket` — expected bucket size n/2^planes, so the
    pair space shrinks by ~2^planes vs brute force. Recall measured in tests.
    Output schema identical to `cosine_topk`.
    """
    bucketed = srp_bucket(embeddings, dim, n_planes, seed, vec_col)
    a = bucketed.select("bucket", F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    b = bucketed.select("bucket", F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    pairs = (
        a.join(b, "bucket")
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "nbr_id", F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nbr_id", "sim", F.col("rnk").cast("long").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Pandas-UDF matmul kernel (wide-vector regime)
# ---------------------------------------------------------------------------

def cosine_topk_kernel(embeddings: DataFrame, k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact top-k via a broadcast matrix + mapInPandas matmul.

    The full (normalized) matrix is broadcast once; each Arrow batch computes
    a `batch × all` similarity block with one numpy matmul and extracts top-k
    with argpartition. Right shape for ≤ ~10^6 vectors × wide dims; beyond
    that, ann_lsh_topk. Results identical to `cosine_topk` (same rounding and
    tie-break).
    """
    spark = embeddings.sparkSession
    rows = embeddings.select(id_col, vec_col).collect()
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
