"""Instrument the kernel stage: per-partition wall time, rows, hub rows, pid."""

import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from trianglecounting_spark.session import get_spark
from trianglecounting_spark.sources import generators as g
from trianglecounting_spark.operators.normalize import normalize_edges
from trianglecounting_spark.operators import triangles as T

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
scale = int(sys.argv[2]) if len(sys.argv) > 2 else 19

spark = get_spark(app_name=f"dbgk-{cores}", cores=cores, shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")

edges = normalize_edges(g.rmat_graph(spark, scale, 16)).localCheckpoint(True)
edges.count()
laid_out, hub_bc = T._edges_with_dst_adjacency(edges, 128)
laid_out = laid_out.localCheckpoint(True)
laid_out.count()


def instr(batches):
    import pyarrow as pa

    t0 = time.time()
    hub_idx = hub_bc.value
    t_bc = time.time() - t0
    tbl = T._partition_table(batches)
    t_tbl = time.time() - t0
    total = 0
    rows = hubrows = groups = 0
    jvol = hvol = 0
    if tbl is not None:
        srcs, dsts, j_offsets, j_values, hub_pos = T._partition_views(tbl, hub_idx)
        _ids, offs, vals = hub_idx
        rows = len(srcs)
        hub_rows = np.flatnonzero(hub_pos >= 0)
        hubrows = len(hub_rows)
        bounds = T._group_bounds(srcs)
        groups = len(bounds) - 1
        lo = 0
        for k in range(groups):
            gs, ge = bounds[k], bounds[k + 1]
            nbrs_u = np.sort(dsts[gs:ge])
            jseg = j_values[j_offsets[gs]:j_offsets[ge]]
            jvol += jseg.size
            if jseg.size:
                total += T._hits(nbrs_u, jseg)
            hi = np.searchsorted(hub_rows, ge, side="left")
            for i in hub_rows[lo:hi]:
                p = hub_pos[i]
                seg = vals[offs[p]:offs[p + 1]]
                hvol += seg.size
                total += T._hits(nbrs_u, seg)
            lo = hi
    yield pa.RecordBatch.from_pydict({
        "pid": pa.array([os.getpid()], pa.int64()),
        "rows": pa.array([rows], pa.int64()),
        "hubrows": pa.array([hubrows], pa.int64()),
        "groups": pa.array([groups], pa.int64()),
        "jvol": pa.array([jvol], pa.int64()),
        "hvol": pa.array([hvol], pa.int64()),
        "bc_sec": pa.array([round(t_bc, 3)], pa.float64()),
        "tbl_sec": pa.array([round(t_tbl, 3)], pa.float64()),
        "secs": pa.array([round(time.time() - t0, 3)], pa.float64()),
        "tri": pa.array([total], pa.int64()),
    })


t0 = time.time()
stats = laid_out.mapInArrow(
    instr,
    "pid long, rows long, hubrows long, groups long, jvol long, hvol long, "
    "bc_sec double, tbl_sec double, secs double, tri long",
).collect()
wall = time.time() - t0
import collections
pids = collections.Counter(r.pid for r in stats)
secs = sorted(r.secs for r in stats)
print(f"wall={wall:.1f}s tasks={len(stats)} pids={len(pids)} tri={sum(r.tri for r in stats)}")
print(f"task secs: min={secs[0]} p50={secs[len(secs)//2]} max={secs[-1]} sum={sum(secs):.1f}")
print(f"bc max={max(r.bc_sec for r in stats)} tbl max={max(r.tbl_sec for r in stats)}")
print(f"rows={sum(r.rows for r in stats):,} hubrows={sum(r.hubrows for r in stats):,} "
      f"groups={sum(r.groups for r in stats):,}")
print(f"jvol={sum(r.jvol for r in stats):,} hvol={sum(r.hvol for r in stats):,}")
spark.stop()
