"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "spread": {...[min,max] for repeated...},
     "sf": <sf>, "edges": N, "triangles": N, "edges_per_sec": ...}

The headline metric mirrors BASELINE.md: end-to-end triangle-count wall time
(scan → normalize → DODG → count) plus the companion operators. Measurement
protocol (VERDICT r3 #4 — this sandbox's hypervisor shows up to 2× run-to-run
variance, memory: sandbox-perf-quirks): one-time build phases (warmup,
edge-table build, layout write, the sf0.01 SQL-parity differential check) are
measured once — they are pay-once costs by design — and every steady-state
query runs $SPARK_GRAFT_REPEATS times (default 3); "queries" holds the MEDIAN
and "spread" the [min, max], so a single noisy run can't masquerade as a
regression. Scaling evidence (N vs 4N cores) is produced by
tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    # iterative heavyweights (SCC, fixpoint peels): tens of seconds per run at
    # sf0.1, so they get their own (smaller) repeat count — still ≥2 so the
    # artifact carries a [min,max] spread for them like everything else
    heavy_repeats = max(1, int(os.environ.get("SPARK_GRAFT_HEAVY_REPEATS", "2")))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from trianglecounting_spark.session import get_spark
    from trianglecounting_spark.sources import generators as g
    from trianglecounting_spark.operators import triangles as t
    from trianglecounting_spark.operators.pagerank import pagerank
    from trianglecounting_spark.operators.components import connected_components
    from trianglecounting_spark.operators.labelprop import label_propagation
    from trianglecounting_spark.operators.ktruss import (
        ktruss,
        ktruss_incremental,
        trussness,
    )
    from trianglecounting_spark.operators.mis import maximal_independent_set
    from trianglecounting_spark.operators.kcore import coreness
    from trianglecounting_spark.functions import clustering as cl
    from trianglecounting_spark.functions import events as EV
    from trianglecounting_spark.operators.centrality import betweenness_pivots
    from trianglecounting_spark.operators.scc import scc
    from trianglecounting_spark.operators.bfs import bfs_distances
    from trianglecounting_spark.operators.motifs import four_clique_count, square_count
    from trianglecounting_spark.operators.hyperball import hyperball_balls
    from trianglecounting_spark.functions import dedup as dd
    from trianglecounting_spark.functions import similarity as sim
    from trianglecounting_spark.functions import textstats as ts

    from pyspark.sql import Observation

    from trianglecounting_spark.plans.cache import persistent_rdd_ids, release_all_cached

    spark = get_spark(app_name="tc-spark-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    once: dict[str, float] = {}          # pay-once phases, single measurement
    reps: dict[str, list[float]] = {}    # steady-state, one value per repeat
    stats: dict[str, float] = {}
    protected: set[int] = set()  # the input edge tables' checkpoint blocks

    def _run(fn):
        # deterministically release the previous query's cache/checkpoint
        # blocks before timing (plans/cache.py — not a GC-timing workaround)
        release_all_cached(spark, keep=protected)
        t0 = time.time()
        out = fn()
        return out, round(time.time() - t0, 3)

    def timed_once(name, fn):
        out, dt = _run(fn)
        once[name] = dt
        return out

    def timed_rep(name, fn):
        out, dt = _run(fn)
        reps.setdefault(name, []).append(dt)
        return out

    # First-job warmup isolated into its OWN line (r2 showed build_edges
    # 3.4s→8.8s once caches were released between queries; the delta was
    # JVM/codegen + Python-worker spawn riding on the first measured query):
    # a tiny shuffle + a tiny Arrow kernel + one parquet footer read touch
    # every engine path the suite uses, so build_edges measures the build.
    def _warmup():
        spark.range(100_000).repartition(8).groupBy(
            (F.col("id") % 10).alias("k")
        ).count().collect()

        def _ident(bs):
            yield from bs

        spark.range(1_000).mapInArrow(_ident, "id long").count()
        spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timed_once("session_warmup", _warmup)

    # edge table build (scan + normalize + co-occurrence join) — one-time
    edges = timed_once(
        "build_edges",
        lambda: g.copart_graph(spark, sf_dir).localCheckpoint(eager=True),
    )
    protected.update(persistent_rdd_ids(spark))
    n_edges = edges.count()
    stats["edges"] = n_edges

    # bucketed physical layout: pay the co-location once (build_layout), then
    # the kernel join is exchange-free on read — the 100 TB steady-state shape
    import tempfile

    from trianglecounting_spark.plans.layout import write_graph_layout

    layout_dir = tempfile.mkdtemp(prefix="tc_layout_")
    e_tbl, a_tbl, h_tbl = timed_once(
        "build_layout", lambda: write_graph_layout(edges, layout_dir, buckets=64)
    )

    # declarative 3-way-join parity check at sf0.01 (its documented role is the
    # differential oracle; timing the full wedge volume at sf0.1 made the suite
    # 35% oracle-replay — VERDICT r1). One-time: it carries an assert, not a
    # steady-state measurement.
    sql_dir = sf_dir.replace("sf0.1", "sf0.01")
    if os.path.isdir(sql_dir):
        release_all_cached(spark, keep=protected)
        sql_edges = g.copart_graph(spark, sql_dir).localCheckpoint(eager=True)
        protected.update(persistent_rdd_ids(spark))
        tri_sql = timed_once(
            "triangle_count_sql_parity_sf0.01",
            lambda: t.triangle_count_sql(sql_edges).collect()[0].triangles,
        )
        kernel_small = t.triangle_count_kernel(sql_edges).collect()[0].triangles
        assert tri_sql == kernel_small, (tri_sql, kernel_small)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    # deterministic hash-sampled subgraph + reciprocated directed variant —
    # the same constructions the driver contract uses (avg degree ~6, so BFS
    # and SCC actually iterate instead of finishing in two rounds)
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

    tri = None
    probes = None
    for r in range(repeats):
        obs = Observation(f"kernel_metrics_{r}")
        tri_r = timed_rep(
            "triangle_count_kernel",
            lambda: t.triangle_count_kernel(edges, observation=obs)
            .collect()[0]
            .triangles,
        )
        probes_r = int(obs.get["probes"])
        if tri is None:
            tri, probes = tri_r, probes_r
        assert tri_r == tri, (tri_r, tri)

        tri_b = timed_rep(
            "triangle_count_kernel_bucketed",
            lambda: t.triangle_count_kernel_bucketed(
                spark, e_tbl, a_tbl, hub_table=h_tbl
            )
            .collect()[0]
            .triangles,
        )
        assert tri_b == tri, (tri_b, tri)
        timed_rep(
            "triangle_per_edge_bucketed",
            lambda: t.triangle_per_edge_support_bucketed(
                spark, e_tbl, a_tbl, hub_table=h_tbl
            )
            .agg(F.sum("support"))
            .collect(),
        )
        timed_rep(
            "triangle_per_edge",
            lambda: t.triangle_per_edge_support(edges).agg(F.sum("support")).collect(),
        )
        timed_rep(
            "pagerank_10",
            lambda: pagerank(edges, iterations=10).agg(F.sum("score")).collect(),
        )
        timed_rep(
            "connected_components",
            lambda: connected_components(edges).agg(F.countDistinct("component")).collect(),
        )
        timed_rep(
            "label_propagation_4",
            lambda: label_propagation(edges, rounds=4).agg(F.countDistinct("label")).collect(),
        )
        timed_rep(
            "bfs_levels",
            lambda: bfs_distances(_sampled(edges)).agg(F.max("dist")).collect(),
        )
        # round-5 ninth-wave lanes: integer power iteration, pointer-doubled
        # redirect resolution, hub-attack robustness (3 CC fixpoints)
        from trianglecounting_spark.operators.pagerank import (
            eigenvector_centrality,
        )
        from trianglecounting_spark.operators.redirects import resolve_redirects
        from trianglecounting_spark.operators.components import attack_tolerance
        from trianglecounting_spark.operators.normalize import undirect

        timed_rep(
            "eigencentrality_4",
            lambda: eigenvector_centrality(edges, iterations=4)
            .agg(F.max("score")).collect(),
        )
        # round-5 eleventh-wave lanes: attenuated walk sums, the stochastic
        # hub/authority walk (on the reciprocated directed sample), DSIR
        # data selection, per-community conductance of the LP labeling
        from trianglecounting_spark.operators.pagerank import (
            katz_centrality,
            salsa,
        )
        from trianglecounting_spark.operators.labelprop import conductance
        from trianglecounting_spark.functions.sampling import dsir_weights

        timed_rep(
            "katz_4",
            lambda: katz_centrality(edges, iterations=4)
            .agg(F.max("katz")).collect(),
        )
        timed_rep(
            "salsa_5",
            lambda: salsa(_recip_directed(edges), iterations=5)
            .agg(F.max("authority")).collect(),
        )
        timed_rep(
            "dsir_weights",
            lambda: dsir_weights(docs, docs.where("doc_id % 23 = 0"))
            .where(F.col("selected")).count(),
        )
        timed_rep(
            "conductance_lp",
            lambda: conductance(
                edges, label_propagation(edges, rounds=4)
            ).agg(F.max("phi")).collect(),
        )
        timed_rep(
            "resolve_redirects",
            lambda: resolve_redirects(
                undirect(edges).groupBy(F.col("src")).agg(
                    F.min("dst").alias("dst")
                )
            ).agg(F.sum(F.col("resolved").cast("long"))).collect(),
        )
        timed_rep(
            "attack_tolerance",
            lambda: attack_tolerance(_sampled(edges)).collect(),
        )
        # incremental-CC payoff: maintenance step alone (labels prebuilt,
        # pay-once) vs the full fixpoint above ("connected_components" row)
        from trianglecounting_spark.operators.components import (
            connected_components_incremental,
        )

        h10 = (
            F.pmod(F.col("u") * 2654435761 + F.col("v") * 40503, F.lit(1 << 31))
            % 10
        )
        base_labels = connected_components(edges.where(h10 != 0))
        base_labels.count()
        # base labels are pay-once INPUT state for the maintenance step —
        # protect their checkpoint blocks from _run's pre-query release
        # (a localCheckpoint is not recomputable once freed)
        protected.update(persistent_rdd_ids(spark))
        timed_rep(
            "cc_incremental_step",
            lambda: connected_components_incremental(
                base_labels, edges.where(h10 == 0)
            ).select("component").distinct().count(),
        )
        # Brandes pivot betweenness on the sampled subgraph (round 5)
        timed_rep(
            "betweenness_16",
            lambda: betweenness_pivots(_sampled(edges), n_pivots=16)
            .agg(F.sum("bc")).collect(),
        )
        timed_rep("minhash_lsh_pairs", lambda: dd.minhash_lsh_pairs(docs).count())
        timed_rep(
            "token_quality",
            lambda: ts.quality_score(docs).agg(F.sum("n_words")).collect(),
        )
        timed_rep(
            "bm25_topk",
            lambda: ts.bm25_topk(
                docs, ["customer", "stream", "merge"], top=20
            ).count(),
        )
        timed_rep(
            "sessionize",
            lambda: EV.sessionize(
                spark.read.parquet(f"{sf_dir}/events.parquet"), 30
            ).count(),
        )
        timed_rep(
            "ngram_top_dups",
            lambda: ts.ngram_top_dups(docs, n=3, top=20).collect(),
        )
        timed_rep(
            "duplicated_spans",
            lambda: ts.duplicated_span_stats(docs, k=20, w=8)
            .agg(F.sum("n_dup_fps"))
            .collect(),
        )
        timed_rep("cosine_topk_kernel", lambda: sim.cosine_topk_kernel(emb, k=5).count())
        # the scale path: bucketed candidates, no driver collect, no all-pairs
        timed_rep(
            "ann_lsh_topk",
            lambda: sim.ann_lsh_topk(emb, dim=64, k=5, n_planes=6, tables=2).count(),
        )
        # SemDeDup: deterministic k-means + cluster-bounded cosine dedup
        timed_rep(
            "semantic_dedup",
            lambda: cl.semantic_dedup(emb, k=8, iters=3, threshold=0.2)
            .where(F.col("keep")).count(),
        )
        # flagship composite: the full cleaning funnel in one query
        from trianglecounting_spark.functions.pipeline import pipeline_funnel

        timed_rep(
            "pipeline_funnel",
            lambda: pipeline_funnel(docs).collect(),
        )
        # round-5 twelfth wave: packing, tokenizer training, events funnel
        from trianglecounting_spark.functions.sampling import pack_sequences
        from trianglecounting_spark.functions.events import funnel as ev_funnel

        timed_rep(
            "pack_sequences",
            lambda: pack_sequences(docs, seq_len=2048)
            .agg(F.max("last_seq")).collect(),
        )
        timed_rep(
            "bpe_merges_8",
            lambda: ts.bpe_train(docs, n_merges=8).count(),
        )
        timed_rep(
            "events_funnel",
            lambda: ev_funnel(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect(),
        )

    # iterative heavyweights — their own repeat count (≥2 keeps the spread)
    for _ in range(heavy_repeats):
        timed_rep(
            "scc",
            lambda: scc(_recip_directed(edges)).agg(
                F.count_distinct("label")
            ).collect(),
        )
        timed_rep(
            "ktruss_fixpoint_k6",
            lambda: ktruss(edges, k=6, max_iterations=30).count(),
        )
        # full core decomposition in one h-index fixpoint (round 5)
        timed_rep(
            "coreness",
            lambda: coreness(edges).agg(F.max("coreness")).collect(),
        )
        # round-5 motif/ANF lanes (probe at sf0.1/32c: squares 34 s —
        # the honest exact-codegree wedge volume; 4-cliques 19 s;
        # hyperball 21 s for 3 merge rounds on the sampled subgraph)
        timed_rep(
            "square_count",
            lambda: square_count(edges).collect()[0].squares,
        )
        timed_rep(
            "four_clique_count",
            lambda: four_clique_count(edges).collect()[0].four_cliques,
        )
        timed_rep(
            "hyperball_t3",
            lambda: hyperball_balls(_sampled(edges), t=3).count(),
        )
        # round-5 symmetry-breaking + decomposition lanes: MIS peels the
        # full 1.2 M-edge graph (few rounds — dense graphs decide fast);
        # trussness fixpoints the sampled eighth (~150 K edges — the
        # triangle-incidence volume is the cost driver)
        timed_rep(
            "mis",
            lambda: maximal_independent_set(edges)
            .agg(F.sum("in_mis")).collect(),
        )
        timed_rep(
            "trussness",
            lambda: trussness(_sampled(edges))
            .agg(F.max("trussness")).collect(),
        )
        # TrustRank spam mass (round-5 twelfth wave): two 5-iteration
        # PageRank-family walks + one |V|-row join over the reciprocated
        # directed sample
        from trianglecounting_spark.operators.pagerank import trustrank

        timed_rep(
            "trustrank_5",
            lambda: trustrank(
                _recip_directed(edges), seeds=[0, 1, 2], iterations=5
            ).agg(F.max("spam_mass")).collect(),
        )

    # peel-tail regime (measured once — an A/B, not a steady-state metric):
    # the sf0.1 core converges in a handful of big-batch rounds, where the
    # bulk Arrow-kernel recount wins; attaching a triangle strip adds a long
    # cascade of 2-edge removal rounds, and there the delta form's per-round
    # cost tracks the REMOVAL NEIGHBORHOOD while the bulk form recounts the
    # whole surviving ~1.1 M-edge core every round (post stats-fix round-5
    # probe at this n=20 config: incr 22.5 s vs bulk 38.2 s; the pre-fix
    # n=30 cascade measured 46.8 s vs 105.9 s with both forms paying the
    # compounding-BigInt driver tax plans/cache.py now strips)
    _strip_n = 20
    _B = 1_000_000_000
    strip = spark.createDataFrame(
        [(_B + i, _B + i + 1) for i in range(_strip_n - 1)]
        + [(_B + i, _B + i + 2) for i in range(_strip_n - 2)],
        "u long, v long",
    )
    tail_edges = edges.unionAll(strip).localCheckpoint(eager=True)
    protected.update(persistent_rdd_ids(spark))
    tail_bulk = timed_once(
        "ktruss_tail_bulk_k4",
        lambda: ktruss(tail_edges, k=4, max_iterations=60).count(),
    )
    tail_incr = timed_once(
        "ktruss_tail_incr_k4",
        lambda: ktruss_incremental(tail_edges, k=4, max_iterations=60).count(),
    )
    assert tail_bulk == tail_incr, (tail_bulk, tail_incr)

    queries = dict(once)
    spread: dict[str, list[float]] = {}
    for name, vals in reps.items():
        queries[name] = round(statistics.median(vals), 3)
        spread[name] = [round(min(vals), 3), round(max(vals), 3)]

    total = round(sum(queries.values()), 3)
    # round-4-comparable subtotal: the suite gained 5 new benched queries in
    # round 5 (bfs/ngram_top_dups/duplicated_spans/scc/ktruss×2), so the
    # headline total is not comparable to BENCH_r04's — this subtotal (over
    # exactly the r4 key set) is
    _R4_KEYS = {
        "session_warmup", "build_edges", "build_layout",
        "triangle_count_sql_parity_sf0.01", "triangle_count_kernel",
        "triangle_count_kernel_bucketed", "triangle_per_edge_bucketed",
        "triangle_per_edge", "pagerank_10", "connected_components",
        "label_propagation_4", "minhash_lsh_pairs", "token_quality",
        "cosine_topk_kernel", "ann_lsh_topk",
    }
    total_r4_core = round(sum(v for k, v in queries.items() if k in _R4_KEYS), 3)
    kernel_sec = max(queries["triangle_count_kernel"], 1e-9)
    print(
        json.dumps(
            {
                "metric": "link-graph analytics suite wall time",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "spread": spread,
                "value_r4_core": total_r4_core,
                "repeats": repeats,
                "heavy_repeats": heavy_repeats,
                "sf": float(sf),
                "cores": cores,
                "edges": int(n_edges),
                "triangles": int(tri),
                "probes": probes,
                "edges_per_sec": round(n_edges / kernel_sec, 1),
                "triangles_per_sec": round(tri / kernel_sec, 1),
                "probes_per_sec": round(probes / kernel_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
