"""Text-lane SCALE evidence: run the dedup/quality/funnel family on a
deterministic synthetic corpus 10-100x the sf0.1 documents table.

The graph kernel has large-graph evidence (tools/bench_large.py, R-MAT
scale 22); this is the text-side twin — the corpus comes from
``sources.generators.synth_corpus`` (planted exact dups every id%100==7,
near dups at id%100==8, Zipf-skewed vocabulary), is written to parquet
first so every stage reads the same on-disk shape the real lanes read,
and each stage reports wall seconds + docs/s.

Usage:  python tools/bench_corpus.py [--docs 200000] [--cores 32]
Prints one JSON line; append the summary to BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from trianglecounting_spark.session import get_spark  # noqa: E402
from trianglecounting_spark.sources.generators import synth_corpus  # noqa: E402
from trianglecounting_spark.functions import dedup as dd  # noqa: E402
from trianglecounting_spark.functions import textstats as ts  # noqa: E402
from trianglecounting_spark.functions.pipeline import pipeline_funnel  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-corpus", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_corpus_")
    path = f"{tmp}/documents.parquet"
    t0 = time.time()
    synth_corpus(spark, args.docs).repartition(args.cores).write.parquet(path)
    gen_s = time.time() - t0
    docs = spark.read.parquet(path)

    results: dict[str, float] = {"generate_write": round(gen_s, 2)}
    checks: dict[str, int] = {}

    def timed(name: str, fn) -> None:
        t = time.time()
        checks[name] = int(fn())
        results[name] = round(time.time() - t, 2)

    timed("exact_dedup_groups", lambda: dd.exact_duplicates(docs).count())
    timed("minhash_lsh_pairs", lambda: dd.minhash_lsh_pairs(docs).count())
    timed(
        "dedup_clusters_survivors",
        lambda: dd.dedup_clusters(docs)
        .where(F.col("doc_id") == F.col("keep_id"))
        .count(),
    )
    timed(
        "gopher_keep",
        lambda: ts.gopher_rules(docs).where(F.col("keep")).count(),
    )
    timed(
        "funnel_clean_docs",
        lambda: pipeline_funnel(docs).collect()[0]["n_clean"],
    )

    # sanity: the planted structure must be recovered exactly
    n_exact_groups = checks["exact_dedup_groups"]
    expect_groups = sum(1 for i in range(args.docs) if i % 100 == 7)
    assert n_exact_groups == expect_groups, (n_exact_groups, expect_groups)

    total = round(sum(results.values()), 2)
    print(
        json.dumps(
            {
                "metric": "corpus_bench_wall",
                "value": total,
                "unit": "sec",
                "docs": args.docs,
                "cores": args.cores,
                "stages": results,
                "counts": checks,
                "docs_per_sec": {
                    k: round(args.docs / v, 1) for k, v in results.items() if v > 0
                },
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
