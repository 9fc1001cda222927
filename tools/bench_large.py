"""Large-graph kernel benchmark: R-MAT scale 21-23 through normalize →
layout → Arrow intersection kernel, with probes/s and peak RSS — the 10×
scale point for the 100 TB design story (VERDICT r4 'Next round' #4).

Usage:
    python tools/bench_large.py [--scale 22] [--edge-factor 16] [--cores 32]
        [--export-dir DIR]   # also write canonical edges for DuckDB validation
        [--repeats 2]

Prints one JSON line with edges, triangles, probes, kernel seconds,
edges/s, probes/s, and peak RSS of the driver (python) and the JVM
(children max-rss, valid after the session stops). Validation: run DuckDB on
the exported canonical edge parquet in a SEPARATE process (fd-limit and
memory isolation):
    python tools/bench_large.py --validate-dir DIR   # DuckDB-only mode
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def validate(export_dir: str, chunks: int = 32) -> None:
    """DuckDB exact triangle count of the exported canonical edges — the
    definitional DODG 3-way join, same as the sf oracle, CHUNKED on
    hash(e1.src) so the wedge intermediate stays bounded. The monolithic
    join on a 64 M-edge graph spilled >78 GB of DuckDB temp and died on
    disk; 32 chunks of the identical query summed to the same exact count
    in 278 s (validated against the Spark kernel at R-MAT scale 22:
    2,113,086,539 triangles both sides)."""
    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA threads=24")
    con.execute(
        f"""
CREATE TEMP TABLE d AS
WITH e AS (SELECT u, v FROM read_parquet('{export_dir}/*.parquet')),
deg AS (SELECT x AS v, count(*) AS deg FROM
  (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x)
SELECT
  CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
       THEN e.u ELSE e.v END AS src,
  CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
       THEN e.v ELSE e.u END AS dst
FROM e JOIN deg du ON du.v = e.u JOIN deg dv ON dv.v = e.v
"""
    )
    total = 0
    t0 = time.time()
    for c in range(chunks):
        (n,) = con.execute(
            f"""
SELECT count(*) FROM (SELECT * FROM d WHERE hash(src) % {chunks} = {c}) e1
JOIN d e2 ON e2.src = e1.dst
JOIN d e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""
        ).fetchone()
        total += int(n)
        print(f"chunk {c + 1}/{chunks}: cum {total}", file=sys.stderr, flush=True)
    print(json.dumps({"oracle_triangles": total, "duckdb_sec": round(time.time() - t0, 1)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22)
    ap.add_argument("--edge-factor", type=int, default=16)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--export-dir", default=None)
    ap.add_argument("--validate-dir", default=None)
    args = ap.parse_args()

    if args.validate_dir:
        validate(args.validate_dir)
        return

    from pyspark.sql import Observation, functions as F

    from trianglecounting_spark.session import get_spark
    from trianglecounting_spark.sources import generators as g
    from trianglecounting_spark.operators.normalize import normalize_edges
    from trianglecounting_spark.operators import triangles as t

    spark = get_spark(
        app_name=f"tc-large-s{args.scale}",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    edges = normalize_edges(
        g.rmat_graph(spark, args.scale, args.edge_factor)
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    t_build = round(time.time() - t0, 1)

    if args.export_dir:
        edges.write.mode("overwrite").parquet(args.export_dir)

    # kernel timing with probe instrumentation (same protocol as bench.py)
    tri = probes = None
    t_kernel = float("inf")
    kernel_times = []
    for r in range(args.repeats):
        obs = Observation(f"large_{r}")
        t1 = time.time()
        row = t.triangle_count_kernel(edges, observation=obs).collect()[0]
        dt = time.time() - t1
        kernel_times.append(round(dt, 1))
        t_kernel = min(t_kernel, dt)
        if tri is None:
            tri, probes = int(row.triangles), int(obs.get["probes"])
        assert int(row.triangles) == tri

    py_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    # JVM peak RSS read from /proc BEFORE the session stops (RUSAGE_CHILDREN
    # only counts reaped children, which pyspark's gateway is not)
    jvm_rss_mb = -1
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if f.read().strip() != "java":
                        continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmHWM:"):
                            jvm_rss_mb = max(jvm_rss_mb, int(line.split()[1]) // 1024)
            except OSError:
                continue
    except OSError:
        pass
    spark.stop()

    print(
        json.dumps(
            {
                "scale": args.scale,
                "edge_factor": args.edge_factor,
                "cores": args.cores,
                "edges": int(n_edges),
                "build_sec": t_build,
                "kernel_sec_best": round(t_kernel, 1),
                "kernel_sec_all": kernel_times,
                "triangles": tri,
                "probes": probes,
                "edges_per_sec": round(n_edges / t_kernel, 1),
                "probes_per_sec": round(probes / t_kernel, 1),
                "driver_peak_rss_mb": py_rss_mb,
                "jvm_peak_rss_mb": jvm_rss_mb,
            }
        )
    )


if __name__ == "__main__":
    main()
