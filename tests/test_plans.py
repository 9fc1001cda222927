"""Physical-plan audits: the properties .explain() must show at scale.

These lock in optimizer behavior the 100 TB design depends on — column
pruning reaching the parquet scans, and the kernel layout's exchange count —
so a refactor that silently widens a scan or adds a shuffle fails CI, not a
cluster bill.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trianglecounting_spark.functions import similarity as sim
from trianglecounting_spark.functions import textstats as ts
from trianglecounting_spark.sources import generators as g

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_copart_scan_prunes_to_two_columns(spark):
    """The co-occurrence graph projects 2 of lineitem's 16 columns — the
    pruning must reach the parquet ReadSchema (a scan that reads all columns
    for a 2-column projection multiplies the 100 TB scan bill by ~8)."""
    plan = _plan(g.copart_graph(spark, SF))
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"l_orderkey", "l_partkey"}, cols


def test_token_count_scan_prunes_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ts.token_count(docs))
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"doc_id", "text"}, cols


def test_text_path_stays_jvm_side(spark):
    """Text stats are pure Column expressions — no Python eval operator may
    appear in the plan, and the parquet scan must be vectorized. (The
    higher-order aggregate/filter lambdas are interpreted JVM expressions —
    outside whole-stage codegen but still never row-at-a-time Python.)"""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ts.quality_score(docs))
    assert "Batched: true" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_cosine_topk_kernel_enforces_scale_cap(spark):
    emb = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="small-regime"):
        sim.cosine_topk_kernel(emb, k=2, max_rows=10)


def test_ngram_dup_ratio_stays_jvm_side_and_shuffle_free(spark):
    """The per-doc repetition ratio is a pure narrow map: no Python eval
    operator, no shuffle Exchange — at 100 TB it must ride the document scan
    and nothing else."""
    from trianglecounting_spark.plans.layout import count_shuffle_exchanges

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = ts.ngram_dup_ratio(docs, n=3)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan
    assert count_shuffle_exchanges(df) == 0, plan
