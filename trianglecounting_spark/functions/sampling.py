"""Deterministic sampling operators — the data-mixing stage of a training
pipeline.

At 100 TB you never sample with an RNG: selection must be reproducible across
reruns, restarts, and engines, and must not depend on partitioning. Both
operators here key selection off a counter-based integer hash of the ROW ID
(same constants family as the LSH salt split in functions/similarity.py —
pure int64 arithmetic, no overflow, identical in Spark and DuckDB):

* ``hash_sample`` — Bernoulli-style: keep a row iff H(id) mod 10⁶ falls under
  the fraction. A pure narrow filter: NO shuffle, pushes down to the scan,
  cost O(rows scanned). The standard "p% of the corpus" cut.
* ``stratified_sample`` — per-stratum fixed-size: rank rows inside each
  stratum by (H(id), id) and keep the first ``cap``. One window shuffle keyed
  on the stratum columns; a uniform-without-replacement draw per stratum, the
  shape used for language/source mixing quotas. Skewed strata cost only their
  own partition's sort; the per-stratum output is exactly min(cap, |stratum|)
  rows, so downstream sizes are known a priori.

No counterpart in /root/reference; part of the LLM-training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_M = 1_000_000_007
_A = 2_654_435_761


def _h(id_col: F.Column, seed: int) -> F.Column:
    return ((id_col % F.lit(_M)) * F.lit(_A) + F.lit(seed)) % F.lit(_M)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                seed: int = 42) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically: H(id) mod 10⁶ under the
    threshold. Narrow map — no shuffle, partitioning-invariant."""
    thresh = int(fraction * 1_000_000)
    return df.where((_h(F.col(id_col), seed) % F.lit(1_000_000)) < thresh)


def hash_sample_sql(table: str, id_col: str, fraction: float,
                    seed: int = 42) -> str:
    """DuckDB twin of ``hash_sample``."""
    thresh = int(fraction * 1_000_000)
    return (
        f"SELECT * FROM {table} WHERE "
        f"(({id_col} % {_M}) * {_A} + {seed}) % {_M} % 1000000 < {thresh} "
        f"ORDER BY {id_col}"
    )


def stratified_sample(df: DataFrame, strata_cols: list[str], id_col: str,
                      cap: int, seed: int = 42) -> DataFrame:
    """Exactly min(cap, |stratum|) rows per stratum, drawn uniformly without
    replacement in hash order (ties broken by id — total order, so the draw
    is unique)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _h(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def stratified_sample_sql(table: str, strata_cols: list[str], id_col: str,
                          cap: int, seed: int = 42,
                          select_cols: str = "* EXCLUDE (rk)") -> str:
    """DuckDB twin of ``stratified_sample``."""
    strata = ", ".join(strata_cols)
    return (
        f"SELECT {select_cols} FROM (SELECT *, row_number() OVER ("
        f"PARTITION BY {strata} ORDER BY "
        f"(({id_col} % {_M}) * {_A} + {seed}) % {_M} ASC, {id_col} ASC) AS rk "
        f"FROM {table}) WHERE rk <= {cap} ORDER BY {id_col}"
    )


def domain_mixture(docs: DataFrame, domain_col: str = "domain",
                   alpha: float = 0.7) -> DataFrame:
    """Temperature-based domain re-weighting — the data-MIXING step after
    sampling: each domain's draw probability is proportional to
    ``n_docs^alpha`` (alpha < 1 up-weights small domains / down-weights
    mega-domains; alpha = 1 is natural frequency, alpha = 0 uniform — the
    multinomial temperature scheme used for corpus/language balancing).
    Output one row per domain: ``(domain, n_docs, weight)`` with
    Σ weight = 1 (6dp).

    Determinism: per-domain ``pow(n, alpha)`` is a single IEEE op, but the
    normalizer Σ_d n_d^alpha must NOT be a distributed float sum. Like
    ``powerlaw_alpha``, it folds the exact integer count-HISTOGRAM
    (Σ_c k_c·c^alpha over counts c ascending) — at most max-count rows, a
    fixed operation sequence mirrored in the oracle. Everything else is two
    map-side-combined integer counts + one tiny crossJoin of the scalar.
    """
    counts = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    hist = counts.groupBy("n_docs").agg(F.count(F.lit(1)).cast("long").alias("k"))
    norm = hist.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("n_docs").alias("c"), "k"))),
            F.lit(0.0),
            lambda acc, s: acc
            + s.k.cast("double") * F.pow(s.c.cast("double"), F.lit(alpha)),
        ).alias("__s")
    )
    return counts.crossJoin(norm).select(
        F.col(domain_col).alias("domain"),
        "n_docs",
        F.round(
            F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("__s"), 6
        ).alias("weight"),
    )


def domain_mixture_sql(docs_sql: str, domain_col: str = "domain",
                       alpha: float = 0.7) -> str:
    """DuckDB twin of :func:`domain_mixture` — identical ascending-count
    histogram fold for the normalizer."""
    return (
        f"WITH src AS ({docs_sql}), "
        f"c AS (SELECT {domain_col} AS domain, CAST(count(*) AS BIGINT) AS n_docs "
        f"FROM src GROUP BY {domain_col}), "
        "h AS (SELECT n_docs AS cc, CAST(count(*) AS BIGINT) AS k FROM c GROUP BY n_docs), "
        "s AS (SELECT list_sum(list_transform(list_sort(list(struct_pack(c := cc, k := k))), "
        f"x -> CAST(x.k AS DOUBLE) * pow(CAST(x.c AS DOUBLE), {alpha}))) AS sv FROM h) "
        f"SELECT c.domain, c.n_docs, "
        f"round(pow(CAST(c.n_docs AS DOUBLE), {alpha}) / s.sv, 6) AS weight "
        "FROM c, s"
    )
