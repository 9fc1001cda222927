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
