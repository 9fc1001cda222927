"""Deterministic synthetic `pages` fixture (FIXTURES.md §1).

Builds the Common-Crawl-style pages table whose hrefs encode a known link
graph, entirely with Column expressions (distributed generation, no driver
loop): page i links to pages (i*7 + 13*j) % n for j in 1..out_deg. Used by
tests and by the pages-pipeline queries — the expected edge set is computable
in closed form (and in the DuckDB oracle) from the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_SITES = 50


def page_url(i: F.Column) -> F.Column:
    return F.concat(
        F.lit("https://site"),
        (i % N_SITES).cast("string"),
        F.lit(".example/page/"),
        i.cast("string"),
    )


def synth_pages(spark: SparkSession, n: int = 1000, out_deg: int = 3) -> DataFrame:
    """(url, warc_ts, html, text, lang) — schema per BASELINE.json input_hint."""
    base = spark.range(n)
    i = F.col("id")
    targets = F.transform(
        F.sequence(F.lit(1), F.lit(out_deg)),
        lambda j: page_url((i * 7 + 13 * j) % n),
    )
    anchors = F.aggregate(
        targets,
        F.lit(""),
        lambda acc, t: F.concat(acc, F.lit('<a href="'), t, F.lit('">link</a> ')),
    )
    body_text = F.concat(
        F.lit("Page "), i.cast("string"), F.lit(" of site "), (i % N_SITES).cast("string"),
        F.lit(". The quick brown fox jumps over the lazy dog "), i.cast("string"), F.lit(".")
    )
    html = F.concat(
        F.lit("<html><head><title>p"), i.cast("string"), F.lit("</title>"),
        F.lit("<script>var x=1;</script></head><body><p>"), body_text,
        F.lit("</p>"), anchors, F.lit("</body></html>"),
    )
    return base.select(
        page_url(i).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=i)).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        body_text.alias("text"),
        F.when(i % 10 != 0, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
    )


def expected_link_id_edges(spark: SparkSession, n: int = 1000, out_deg: int = 3) -> DataFrame:
    """The closed-form (src_page, dst_page) id edges synth_pages encodes —
    ids are positions in the sorted-url dictionary, so tests compare via urls
    instead: this returns (src_url, dst_url)."""
    base = spark.range(n)
    i = F.col("id")
    rows = []
    for j in range(1, out_deg + 1):
        rows.append(base.select(page_url(i).alias("src_url"), page_url((i * 7 + 13 * j) % n).alias("dst_url")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
