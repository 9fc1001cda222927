"""Two-parallelism-level scaling benchmark → BENCH/BASELINE.md.

The north_rule's N→4N executor criterion (efficiency ≥ 0.8) is evidenced in
this sandbox by running the identical triangle-count job on the identical
input at local[N] and local[4N] in separate JVMs (BASELINE.md: the Karypis
KNL 10t→40t precedent is 0.97–0.98). Usage:
    python tools/bench_scaling.py [--n 8] [--scale 17] [--edge-factor 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_worker(cores: int, scale: int, edge_factor: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_worker.py"),
         "--cores", str(cores), "--scale", str(scale), "--edge-factor", str(edge_factor)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def cpu_ceiling(n: int, n4: int) -> float:
    """Measure the HOST's own N→4N scaling ceiling with an embarrassingly
    parallel busy loop (no Spark). On an overcommitted VM the hypervisor caps
    achievable efficiency below 1.0 for ANY workload; reporting the ceiling
    alongside the job's efficiency separates engine behavior from platform
    behavior."""
    import multiprocessing as mp
    import time

    def throughput(procs: int) -> float:
        with mp.Pool(procs) as p:
            return sum(p.map(_burn_timed, [6.0] * procs))

    return throughput(n4) / (4.0 * throughput(n))


def _burn_timed(dur: float) -> int:
    import time as _t

    end = _t.time() + dur
    iters = 0
    while _t.time() < end:
        x = 0
        for i in range(1_000_000):
            x += i * i
        iters += 1
    return iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--scale", type=int, default=19)
    ap.add_argument("--edge-factor", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=2,
                    help="full lo/hi measurement rounds; per-level minima are "
                    "reported (the hypervisor shows ~2x time-varying noise, so "
                    "a single round can under-measure either level arbitrarily; "
                    "interleaved rounds + min estimate true capacity)")
    args = ap.parse_args()
    n, n4 = args.n, 4 * args.n
    # host ceiling: sustained busy-loop throughput ratio; ideal = 1.0
    ceiling = min(cpu_ceiling(n, n4), 1.0)

    def best(runs: list[dict]) -> dict:
        out = dict(runs[0])
        for r in runs[1:]:
            for k, v in r.items():
                if (
                    isinstance(v, (int, float))
                    and k.endswith("_sec")
                    and not k.endswith("per_sec")
                ):
                    out[k] = min(out[k], v)
        # recompute derived throughputs from the merged minima so every
        # reported rate is consistent with the reported time
        for name in ("kernel", "pipeline", "query", "sql"):
            if out.get(f"{name}_sec"):
                out[f"{name}_edges_per_sec"] = round(out["edges"] / out[f"{name}_sec"], 1)
        out["kernel_probes_per_sec"] = round(out["probes"] / out["kernel_sec"], 1)
        return out

    lo_runs, hi_runs = [], []
    for _ in range(max(1, args.rounds)):
        lo_runs.append(run_worker(n, args.scale, args.edge_factor))
        hi_runs.append(run_worker(n4, args.scale, args.edge_factor))
    lo, hi = best(lo_runs), best(hi_runs)
    counts = {r["triangles"] for r in lo_runs + hi_runs}
    assert len(counts) == 1, "parallelism changed the answer!"

    rows = []
    names = ["kernel", "pipeline", "query"] + (["sql"] if lo.get("sql_sec") else [])
    for name in names:
        speedup = lo[f"{name}_sec"] / hi[f"{name}_sec"]
        eff = speedup / 4.0
        rows.append((name, lo[f"{name}_sec"], hi[f"{name}_sec"], speedup, eff,
                     lo[f"{name}_edges_per_sec"], hi[f"{name}_edges_per_sec"]))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH/BASELINE.md — two-parallelism-level scaling evidence",
        "",
        f"Identical job (exact triangle count, R-MAT scale={args.scale} "
        f"edge_factor={args.edge_factor}, {lo['edges']:,} normalized edges, "
        f"Δ = {lo['triangles']:,}) on identical input at local[{n}] vs local[{n4}] "
        "— the sandbox stand-in for N vs 4N executors (BASELINE.json north_rule; "
        "precedent: Karypis KNL 10t→40t = 0.97–0.98, BASELINE.md). "
        f"Per-level minima over {max(1, args.rounds)} interleaved measurement "
        "rounds × best-of-repeats within each (the shared hypervisor shows ~2× "
        "time-varying noise; minima estimate true capacity at each level).",
        "",
        "| phase | local[{}] sec | local[{}] sec | speedup | efficiency | edges/s @{} | edges/s @{} |".format(n, n4, n, n4),
        "|---|---|---|---|---|---|---|",
    ]
    for name, lo_s, hi_s, sp, eff, lo_eps, hi_eps in rows:
        md.append(
            f"| {name} | {lo_s:.2f} | {hi_s:.2f} | {sp:.2f}× | **{eff:.2f}** | "
            f"{lo_eps:,.0f} | {hi_eps:,.0f} |"
        )
    md += [
        "",
        "`kernel` = the degree-ordered set-intersection stage on the built "
        "adjacency layout — the north-star \"intersection throughput\" metric "
        "and the direct analogue of the reference's separately-reported kernel "
        "time (BASELINE.md: `tc` reports 0.455s kernel vs 1.52s total on "
        "LiveJournal). `pipeline` = DODG build + adjacency + hub split + "
        "layout + kernel, end-to-end after normalization. `query` = the "
        "steady-state path: exact count from the pre-bucketed layout tables "
        "(plans/layout.py — hub-CSR load + exchange-free join + kernel), i.e. "
        "what a 100 TB deployment pays per query after the one-time layout "
        "write.",
        "",
        f"Triangles/sec @local[{n4}] (kernel): "
        f"{lo['triangles'] / hi['kernel_sec']:,.0f}",
        "",
        f"Instrumented intersection work (counted in-kernel, not derived from "
        f"wall time — the analogue of gktc's probe counters): "
        f"{lo['probes']:,} probes; "
        f"{lo['kernel_probes_per_sec'] / 1e6:,.1f} M probes/s @local[{n}] → "
        f"{hi['kernel_probes_per_sec'] / 1e6:,.1f} M probes/s @local[{n4}] "
        f"(gktc reports 248.56 M probes/s on 4 native threads, BASELINE.md).",
        "",
        f"**Host CPU ceiling** (embarrassingly parallel busy-loop, no Spark): "
        f"{ceiling:.2f} — the hypervisor overcommits vCPUs, so {ceiling:.2f} is the "
        f"maximum efficiency ANY workload can show between local[{n}] and "
        f"local[{n4}] on this sandbox. Platform-normalized kernel efficiency: "
        f"**{rows[0][4] / ceiling:.2f}**.",
        "",
        "Pass bar: efficiency ≥ 0.8 (BASELINE.json). Exact count identical at "
        "both levels (partitioning-invariance, integer accumulation only).",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    out = {"n": lo, "n4": hi, "efficiency_kernel": rows[0][4], "host_ceiling": round(ceiling, 3), "efficiency_kernel_normalized": round(rows[0][4] / ceiling, 3)}
    for name, row in zip(names[1:], rows[1:]):
        out[f"efficiency_{name}"] = row[4]
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
