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


def test_checkpointed_state_partitioning_survives_for_delta_joins(spark):
    """The adaptive delta k-truss keys every per-round membership/decrement
    join on the state's (src, dst) hash partitioning: a localCheckpointed
    ``repartition(n, src, dst)`` must surface its distribution to Catalyst
    (LogicalRDD preserves outputPartitioning), so the equi-join adds an
    Exchange ONLY on the small (removal-neighborhood) side — 1 shuffle, not
    2. A regression here silently doubles every delta round's shuffle volume
    at scale."""
    from trianglecounting_spark.plans.layout import count_shuffle_exchanges

    state = (
        spark.range(2000)
        .select(
            (F.col("id") % 97).alias("src"),
            (F.col("id") % 89).alias("dst"),
            F.lit(1).cast("long").alias("support"),
        )
        .repartition(8, "src", "dst")
        .localCheckpoint(eager=True)
    )
    dec = spark.range(40).select(
        (F.col("id") % 7).alias("src"),
        (F.col("id") % 5).alias("dst"),
        F.lit(1).cast("long").alias("__lost"),
    )
    joined = state.join(dec, ["src", "dst"], "left").select(
        "src", "dst", (F.col("support") - F.coalesce("__lost", F.lit(0))).alias("support")
    )
    n_ex = count_shuffle_exchanges(joined)
    assert n_ex <= 1, _plan(joined)


def test_encode_docs_broadcasts_the_vocab(spark):
    """The term join in encode_docs must be a BroadcastHashJoin — a
    shuffled join would repartition the exploded corpus by Zipf-skewed
    words ("the" alone is ~5% of tokens), the classic hot-key pileup."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ts.encode_docs(docs, ts.build_vocab(docs, min_count=2)))
    assert "BroadcastHashJoin" in plan, plan
    # and the corpus side must not hash-exchange on the term
    import re

    assert not re.search(r"Exchange hashpartitioning\(term", plan), plan


def test_token_count_quantiles_has_no_corpus_window(spark):
    """Exact quantiles must come from the counting-sort rank, never a
    single-partition Window over the corpus (the scale trap this operator
    exists to avoid)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ts.token_count_quantiles(docs))
    assert "Window" not in plan, plan


def test_readability_and_heaps_stay_jvm_side(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (ts.readability(docs), ts.heaps_beta(docs)):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # readability is a pure narrow projection: no exchange at all
    assert "Exchange" not in _plan(ts.readability(docs))


def test_unigram_lm_score_has_no_corpus_window_and_no_python(spark):
    """The tercile bucketing must ride the counting-sort rank (no
    single-partition Window over the corpus) and the whole scoring path
    must stay JVM-side."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ts.unigram_lm_score(docs))
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # the vocab-count join must broadcast — never hash-exchange the
    # per-doc term table by the Zipf-skewed word key (audited on the
    # scoring stage: the rank step materializes lineage above it)
    import re

    score_plan = _plan(ts.unigram_doc_nll(docs))
    assert re.search(r"BroadcastHashJoin \[term", score_plan), score_plan
    # (the one legitimate term exchange is the vocab-count aggregate — its
    # map-side partial combine shrinks the shuffle to ~|vocab| rows; the
    # JOIN must never shuffle the tf table by term)
    assert not re.search(
        r"(SortMergeJoin|ShuffledHashJoin) \[term", score_plan
    ), score_plan
