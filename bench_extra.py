"""Per-lane isolation benchmark (guide §1.1/§1.4) — NOT the frozen bench.py.

Runs a chosen subset of the bench.py lanes in a quiet JVM, each repeated
``--repeats`` times with the same cache-release protocol as bench.py, and
prints one JSON line ``{"lane": [t1, t2, ...], ...}``. Used for the
round-6 optimization loop: isolate one lane, change its plan, re-measure,
without paying the full ~17-minute suite.

Usage:
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
        python bench_extra.py coreness mis square_count --repeats 3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from pyspark.sql import functions as F

    from trianglecounting_spark.session import get_spark
    from trianglecounting_spark.sources import generators as g
    from trianglecounting_spark.operators import triangles as t
    from trianglecounting_spark.plans.cache import (
        persistent_rdd_ids,
        release_all_cached,
    )

    spark = get_spark(app_name="tc-spark-bench-extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # identical warmup + input construction to bench.py
    spark.range(100_000).repartition(8).groupBy(
        (F.col("id") % 10).alias("k")
    ).count().collect()

    def _ident(bs):
        yield from bs

    spark.range(1_000).mapInArrow(_ident, "id long").count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    edges = g.copart_graph(spark, sf_dir).localCheckpoint(eager=True)
    protected = set(persistent_rdd_ids(spark))
    edges.count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def _sampled(e, p_inv=8, seed=42):
        h = F.pmod(
            F.pmod(F.col("u"), F.lit(t._SAMPLE_M)) * F.lit(t._SAMPLE_A)
            + F.pmod(F.col("v"), F.lit(t._SAMPLE_M)) * F.lit(t._SAMPLE_B)
            + F.lit(seed),
            F.lit(t._SAMPLE_M),
        )
        return e.where(F.pmod(h, F.lit(p_inv)) == 0)

    def _recip_directed(e):
        s = _sampled(e)
        h2 = F.pmod(
            F.pmod(F.col("u"), F.lit(t._SAMPLE_M)) * F.lit(t._SAMPLE_A)
            + F.pmod(F.col("v"), F.lit(t._SAMPLE_M)) * F.lit(t._SAMPLE_B)
            + F.lit(7),
            F.lit(t._SAMPLE_M),
        )
        fwd = s.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        back = s.where(F.pmod(h2, F.lit(3)) == 0).select(
            F.col("v").alias("src"), F.col("u").alias("dst")
        )
        return fwd.unionAll(back)

    def lanes():
        from trianglecounting_spark.operators.pagerank import (
            pagerank,
            eigenvector_centrality,
            katz_centrality,
            salsa,
            trustrank,
        )
        from trianglecounting_spark.operators.components import (
            attack_tolerance,
            connected_components,
        )
        from trianglecounting_spark.operators.labelprop import (
            conductance,
            label_propagation,
        )
        from trianglecounting_spark.operators.bfs import bfs_distances
        from trianglecounting_spark.operators.scc import scc
        from trianglecounting_spark.operators.ktruss import (
            ktruss,
            ktruss_incremental,
            trussness,
        )
        from trianglecounting_spark.operators.kcore import coreness
        from trianglecounting_spark.operators.mis import maximal_independent_set
        from trianglecounting_spark.operators.motifs import (
            four_clique_count,
            square_count,
        )
        from trianglecounting_spark.operators.hyperball import hyperball_balls
        from trianglecounting_spark.operators.centrality import betweenness_pivots
        from trianglecounting_spark.operators.redirects import resolve_redirects
        from trianglecounting_spark.operators.normalize import undirect
        from trianglecounting_spark.functions import clustering as cl
        from trianglecounting_spark.functions import dedup as dd
        from trianglecounting_spark.functions import similarity as sim
        from trianglecounting_spark.functions import textstats as ts
        from trianglecounting_spark.functions.sampling import (
            dsir_weights,
            pack_sequences,
        )
        from trianglecounting_spark.functions import events as EV
        from trianglecounting_spark.functions.pipeline import pipeline_funnel

        return {
            "triangle_count_kernel": lambda: t.triangle_count_kernel(edges)
            .collect()[0].triangles,
            "triangle_per_edge": lambda: t.triangle_per_edge_support(edges)
            .agg(F.sum("support")).collect(),
            "pagerank_10": lambda: pagerank(edges, iterations=10)
            .agg(F.sum("score")).collect(),
            "connected_components": lambda: connected_components(edges)
            .agg(F.countDistinct("component")).collect(),
            "label_propagation_4": lambda: label_propagation(edges, rounds=4)
            .agg(F.countDistinct("label")).collect(),
            "bfs_levels": lambda: bfs_distances(_sampled(edges))
            .agg(F.max("dist")).collect(),
            "eigencentrality_4": lambda: eigenvector_centrality(
                edges, iterations=4
            ).agg(F.max("score")).collect(),
            "katz_4": lambda: katz_centrality(edges, iterations=4)
            .agg(F.max("katz")).collect(),
            "salsa_5": lambda: salsa(_recip_directed(edges), iterations=5)
            .agg(F.max("authority")).collect(),
            "dsir_weights": lambda: dsir_weights(
                docs, docs.where("doc_id % 23 = 0")
            ).where(F.col("selected")).count(),
            "conductance_lp": lambda: conductance(
                edges, label_propagation(edges, rounds=4)
            ).agg(F.max("phi")).collect(),
            "resolve_redirects": lambda: resolve_redirects(
                undirect(edges).groupBy(F.col("src")).agg(
                    F.min("dst").alias("dst")
                )
            ).agg(F.sum(F.col("resolved").cast("long"))).collect(),
            "attack_tolerance": lambda: attack_tolerance(_sampled(edges)).collect(),
            "betweenness_16": lambda: betweenness_pivots(
                _sampled(edges), n_pivots=16
            ).agg(F.sum("bc")).collect(),
            "minhash_lsh_pairs": lambda: dd.minhash_lsh_pairs(docs).count(),
            "ngram_top_dups": lambda: ts.ngram_top_dups(docs, n=3, top=20).collect(),
            "duplicated_spans": lambda: ts.duplicated_span_stats(docs, k=20, w=8)
            .agg(F.sum("n_dup_fps")).collect(),
            "ann_lsh_topk": lambda: sim.ann_lsh_topk(
                emb, dim=64, k=5, n_planes=6, tables=2
            ).count(),
            "semantic_dedup": lambda: cl.semantic_dedup(
                emb, k=8, iters=3, threshold=0.2
            ).where(F.col("keep")).count(),
            "pipeline_funnel": lambda: pipeline_funnel(docs).collect(),
            "pack_sequences": lambda: pack_sequences(docs, seq_len=2048)
            .agg(F.max("last_seq")).collect(),
            "bpe_merges_8": lambda: ts.bpe_train(docs, n_merges=8).count(),
            "events_funnel": lambda: EV.funnel(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect(),
            "scc": lambda: scc(_recip_directed(edges)).agg(
                F.count_distinct("label")
            ).collect(),
            "ktruss_fixpoint_k6": lambda: ktruss(edges, k=6, max_iterations=30).count(),
            "ktruss_incr_k6": lambda: ktruss_incremental(
                edges, k=6, max_iterations=30
            ).count(),
            "coreness": lambda: coreness(edges).agg(F.max("coreness")).collect(),
            "square_count": lambda: square_count(edges).collect()[0].squares,
            "four_clique_count": lambda: four_clique_count(edges)
            .collect()[0].four_cliques,
            "hyperball_t3": lambda: hyperball_balls(_sampled(edges), t=3).count(),
            "mis": lambda: maximal_independent_set(edges)
            .agg(F.sum("in_mis")).collect(),
            "trussness": lambda: trussness(_sampled(edges))
            .agg(F.max("trussness")).collect(),
            "trustrank_5": lambda: trustrank(
                _recip_directed(edges), seeds=[0, 1, 2], iterations=5
            ).agg(F.max("spam_mass")).collect(),
        }

    table = lanes()
    out: dict[str, list[float]] = {}
    results: dict[str, object] = {}
    for name in args:
        fn = table[name]
        for _ in range(repeats):
            release_all_cached(spark, keep=protected)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            results[name] = fn()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"times": out, "results": {k: str(v)[:80] for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
