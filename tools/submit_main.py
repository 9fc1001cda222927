"""spark-submit entry point (north_rule: "run via spark-submit --py-files on
multi-executor clusters").

Package the engine and submit any driver-contract query:

    zip -r /tmp/tc_spark.zip trianglecounting_spark __spark_entry__.py
    spark-submit --master <yarn|k8s://...|spark://...|local[N]> \
        --py-files /tmp/tc_spark.zip \
        tools/submit_main.py <query> --sf-dir /path/to/tables \
        [--output /path/out.parquet] [--show 20]

The master, executor count, and memory come from the spark-submit command —
this script never overrides them (SPARK_GRAFT_INHERIT_MASTER defers the
session factory to the cluster manager). `<query>` is any key of
`__spark_entry__.queries()` (`--list` prints them); results are written to
`--output` as parquet or shown on stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_INHERIT_MASTER", "1")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="queries() key, e.g. triangle_count_kernel")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.001"))
    ap.add_argument("--output", default=None, help="parquet output path")
    ap.add_argument("--show", type=int, default=20, help="rows to print when no --output")
    ap.add_argument("--list", action="store_true", help="list available queries")
    args = ap.parse_args()

    import __spark_entry__ as contract

    qs = {**contract.queries(), **contract.extra_queries()}
    if args.list or not args.query:
        print("\n".join(sorted(qs)))
        return
    if args.query not in qs:
        ap.error(f"unknown query {args.query!r}; --list shows the {len(qs)} available")

    from trianglecounting_spark.session import get_spark

    spark = get_spark(app_name=f"tc-spark-{args.query}")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    df = qs[args.query](spark, args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"{args.query}: wrote {n} rows to {args.output} in {time.time() - t0:.1f}s")
    else:
        df.show(args.show, truncate=False)
        print(f"{args.query}: {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
