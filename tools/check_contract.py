"""Local simulator of the driver's correctness gate.

Runs every oracle_sql() in DuckDB first (captures results), then every
queries() entry in Spark, and compares row-count + column-name-sorted,
order-insensitive values. Usage:
    python tools/check_contract.py [--all] [sf_dir] [only_query ...]

--all additionally runs the extra_queries()/extra_oracle_sql() registry (the
redundant-parity lanes kept out of the driver's 50-row-capped contract);
naming an extra query explicitly also pulls it in without --all.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(x):
    import math

    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return f"{x:.6f}"
    if isinstance(x, bool):
        return str(int(x))
    return str(x)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x1f".join(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    json_out = None
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
        elif a != "--all":
            argv.append(a)
    include_all = "--all" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    extra_q, extra_o = entrymod.extra_queries(), entrymod.extra_oracle_sql()
    if include_all or (only & set(extra_q)):
        qs = {**qs, **{k: v for k, v in extra_q.items() if include_all or k in only}}
        oracles = {**oracles, **{k: v for k, v in extra_o.items() if include_all or k in only}}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle_res = {}
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
            oracle_res[name] = (cols, rows, time.time() - t0)
        except Exception as ex:
            oracle_res[name] = ("ERROR", str(ex)[:300], time.time() - t0)
    con.close()
    print("oracle done:", {k: (len(v[1]) if v[0] != "ERROR" else "ERR") for k, v in oracle_res.items()}, flush=True)

    from trianglecounting_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_fail = 0
    results = {}  # --json artifact: per-query status/rows/wall (VERDICT r5 #3)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {str(ex)[:300]}", flush=True)
            results[name] = {"status": "FAIL", "err": str(ex)[:200]}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracle_res:
            print(f"PASS(rows-only) {name}: {len(rows)} rows  [{dt:.1f}s]", flush=True)
            results[name] = {"status": "PASS(rows-only)", "rows": len(rows),
                             "spark_s": round(dt, 1)}
            continue
        ocols, orows, odt = oracle_res[name]
        if ocols == "ERROR":
            print(f"FAIL {name}: oracle error {orows}", flush=True)
            results[name] = {"status": "FAIL", "err": f"oracle: {orows[:200]}"}
            n_fail += 1
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: schema {sorted(cols)} != {sorted(ocols)}", flush=True)
            results[name] = {"status": "FAIL", "err": "schema mismatch"}
            n_fail += 1
            continue
        a, b = canon(rows, cols), canon(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} != {len(b)}", flush=True)
            results[name] = {"status": "FAIL", "err": f"rowcount {len(a)} != {len(b)}"}
            n_fail += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}", flush=True)
            results[name] = {"status": "FAIL", "err": "values differ"}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows  [spark {dt:.1f}s, duck {odt:.1f}s]", flush=True)
            results[name] = {"status": "PASS", "rows": len(a),
                             "spark_s": round(dt, 1), "duck_s": round(odt, 1)}
    print(f"done: {n_fail} failures", flush=True)
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "n_fail": n_fail,
                 "n_pass": sum(1 for r in results.values()
                               if r["status"].startswith("PASS")),
                 "queries": results},
                f, indent=1, sort_keys=True,
            )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
