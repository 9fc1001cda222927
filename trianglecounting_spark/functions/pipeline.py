"""End-to-end corpus-cleaning FUNNEL — the composite a real training-data
pipeline runs, as one query: exact dedup → near-dup dedup → quality filter →
decontamination → token budget. Demonstrates that the per-stage operators
(functions/dedup.py, textstats.py) compose into the pipeline a user of the
engine actually ships, and gives the one-row report every data team looks at
first: how many documents (and tokens) survive each cut.

Stage semantics — flags are computed on the FULL corpus and applied as
cumulative conjunctions (the production shape: compute flags once, choose
filter policies later without re-running upstream stages):

  1. exact_keep   — doc is the min-doc_id representative of its normalized
                    md5 group (byte-dup removal).
  2. near_keep    — doc is the representative of its MinHash-LSH connected
                    cluster (``dedup_clusters``).
  3. quality_keep — passes the Gopher rules (``gopher_rules``).
  4. clean        — not part of the held-out eval split (doc_id % eval_mod
                    == 0) and shares no word-n-gram with it
                    (``decontaminate``).

Scale: every flag table is doc_id-keyed, so the final assembly is a chain of
co-partitioned joins feeding ONE map-side-combined conditional aggregate; the
heavy lifting (LSH banding, CC on the pair graph, eval-gram broadcast join)
is exactly the already-audited per-stage plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trianglecounting_spark.functions import dedup as DD
from trianglecounting_spark.functions import textstats as TS


def pipeline_funnel(
    docs: DataFrame,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    n_gram: int = 8,
    eval_mod: int = 97,
) -> DataFrame:
    """One row: ``(n_docs, n_exact, n_near, n_quality, n_clean,
    tokens_clean)`` — survivors after each cumulative stage and the final
    token budget. Integer counts only."""
    is_eval = F.col("doc_id") % eval_mod == 0

    fp = docs.select("doc_id", F.md5(DD._norm_col().cast("binary")).alias("fp"))
    exact = (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("__keep"))
        .join(fp, "fp")
        .select("doc_id", (F.col("doc_id") == F.col("__keep")).alias("exact_keep"))
    )
    near = DD.dedup_clusters(docs, k=k, num_hashes=num_hashes, bands=bands).select(
        "doc_id", (F.col("doc_id") == F.col("keep_id")).alias("near_keep")
    )
    quality = TS.gopher_rules(docs).select("doc_id", F.col("keep").alias("quality_keep"))
    contam = TS.decontaminate(
        docs.where(~is_eval), docs.where(is_eval), n=n_gram
    ).select("doc_id", "contaminated")
    tokens = TS.token_count(docs)

    flags = (
        docs.select("doc_id", is_eval.alias("is_eval"))
        .join(exact, "doc_id")
        .join(near, "doc_id")
        .join(quality, "doc_id")
        .join(contam, "doc_id", "left")
        .join(tokens, "doc_id")
        .select(
            "*",
            (F.col("exact_keep") & F.col("near_keep")).alias("__s2"),
        )
    )
    s3 = F.col("__s2") & F.col("quality_keep")
    s4 = s3 & ~F.col("is_eval") & ~F.coalesce(F.col("contaminated"), F.lit(False))
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("exact_keep").cast("long")).cast("long").alias("n_exact"),
        F.sum(F.col("__s2").cast("long")).cast("long").alias("n_near"),
        F.sum(s3.cast("long")).cast("long").alias("n_quality"),
        F.sum(s4.cast("long")).cast("long").alias("n_clean"),
        F.sum(F.when(s4, F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tokens_clean"),
    )


def pipeline_funnel_sql(
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    n_gram: int = 8,
    eval_mod: int = 97,
    docs_rel: str = "documents",
) -> str:
    """DuckDB twin of :func:`pipeline_funnel`, composed from the per-stage
    SQL twins (cluster assignment, Gopher rules, decontamination)."""
    near = DD.dedup_clusters_sql(k=k, num_hashes=num_hashes, bands=bands)
    gopher = TS.gopher_rules_sql(docs_rel)
    decon = TS.decontaminate_sql(
        n=n_gram, eval_pred=f"doc_id % {eval_mod} = 0", docs_rel=docs_rel
    )
    return (
        f"WITH pf_fp AS (SELECT doc_id, md5({DD._NORM_SQL}) AS fp "
        f"FROM {docs_rel}), "
        "pf_ex AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY fp) "
        "AS exact_keep FROM pf_fp), "
        f"pf_near AS (SELECT doc_id, doc_id = keep_id AS near_keep FROM ({near})), "
        f"pf_q AS (SELECT doc_id, keep AS quality_keep FROM ({gopher})), "
        f"pf_dc AS (SELECT doc_id, contaminated FROM ({decon})), "
        f"pf_tc AS (SELECT doc_id, CAST(len(regexp_extract_all(text, "
        f"'[A-Za-z0-9'']+')) AS BIGINT) AS n_tokens FROM {docs_rel}), "
        f"pf AS (SELECT d.doc_id, (d.doc_id % {eval_mod} = 0) AS is_eval, "
        "e.exact_keep, e.exact_keep AND n.near_keep AS s2, q.quality_keep, "
        "coalesce(c.contaminated, false) AS contaminated, t.n_tokens "
        f"FROM {docs_rel} d "
        "JOIN pf_ex e ON e.doc_id = d.doc_id "
        "JOIN pf_near n ON n.doc_id = d.doc_id "
        "JOIN pf_q q ON q.doc_id = d.doc_id "
        "LEFT JOIN pf_dc c ON c.doc_id = d.doc_id "
        "JOIN pf_tc t ON t.doc_id = d.doc_id) "
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(CASE WHEN exact_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact, "
        "CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_near, "
        "CAST(sum(CASE WHEN s2 AND quality_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality, "
        "CAST(sum(CASE WHEN s2 AND quality_keep AND NOT is_eval AND NOT contaminated "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_clean, "
        "CAST(sum(CASE WHEN s2 AND quality_keep AND NOT is_eval AND NOT contaminated "
        "THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_clean FROM pf"
    )
