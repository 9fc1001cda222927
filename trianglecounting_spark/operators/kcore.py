"""k-core decomposition by iterative degree peeling.

The k-core of G is the maximal subgraph where every vertex has degree ≥ k.
Peeling: drop vertices with degree < k (and their edges), recompute degrees,
repeat to fixpoint. Companion to k-truss (edge-support peeling, ktruss.py) —
the standard web-graph denoising pass before community/centrality analytics.
Absent from the reference (a TC engine); added for the link-graph suite.

Each round = one degree aggregation + one semi-join filter — two shuffles on
the SHRINKING edge set, all Column expressions. Exact integer labels, so
results are partitioning-invariant; the fixed-round form is oracle-matched
(rounds are idempotent once converged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trianglecounting_spark.plans.cache import (
    barrier_checkpoint,
    persistent_rdd_ids,
    release_ids,
    tracked_checkpoint,
)

# Reliable-checkpoint barrier cadence for deep peel cascades. localCheckpoint
# does NOT cut the underlying RDD DAG, and a driver-side per-job traversal
# walks lineage PATHS — O(refs^depth). With this loop's ≥3 state references
# per round, a ~20-round chain cascade at sf0.1 pinned the driver in
# BigInteger stats arithmetic for >25 min while the bulk peel took 23 s
# (measured round 5); a file barrier every 12 rounds caps the walkable depth,
# same contract as operators/scc.py's floods.
_BARRIER_EVERY = 12


def _peel_once(cur: DataFrame, k: int) -> DataFrame:
    from trianglecounting_spark.operators.normalize import degrees

    keep = degrees(cur).where(F.col("deg") >= k).select("v")
    ku = keep.select(F.col("v").alias("u"))
    kv = keep.select(F.col("v").alias("v"))
    # semi-joins: an edge survives iff BOTH endpoints survive
    return cur.join(ku, "u", "left_semi").join(kv, "v", "left_semi")


def kcore(edges: DataFrame, k: int, max_iterations: int = 100) -> DataFrame:
    """Edges of the k-core subgraph ``(u, v)`` with u < v. Runs to fixpoint."""
    spark = edges.sparkSession
    cur, cur_ids = tracked_checkpoint(edges.select("u", "v"))
    n_cur = cur.count()
    for _ in range(max_iterations):
        before = persistent_rdd_ids(spark)
        nxt, nxt_ids = tracked_checkpoint(_peel_once(cur, k), before=before)
        n_nxt = nxt.count()
        release_ids(spark, cur_ids)
        cur, cur_ids = nxt, nxt_ids
        if n_nxt == n_cur:
            break
        n_cur = n_nxt
    return cur


def kcore_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Exactly `rounds` peels — the deterministic oracle-matched contract."""
    spark = edges.sparkSession
    cur, cur_ids = tracked_checkpoint(edges.select("u", "v"))
    for _ in range(rounds):
        before = persistent_rdd_ids(spark)
        cur, nxt_ids = tracked_checkpoint(_peel_once(cur, k), before=before)
        release_ids(spark, cur_ids)
        cur_ids = nxt_ids
    return cur


def kcore_unrolled_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB oracle for ``kcore_rounds``: per round, degree filter + edge
    semi-join, identical semantics."""
    parts = [f"WITH t0 AS MATERIALIZED ({edges_sql})"]
    for r in range(rounds):
        parts.append(
            f"deg{r} AS MATERIALIZED (SELECT x AS v, count(*) AS deg FROM "
            f"(SELECT u AS x FROM t{r} UNION ALL SELECT v AS x FROM t{r}) GROUP BY x)"
        )
        parts.append(
            f"keep{r} AS MATERIALIZED (SELECT v FROM deg{r} WHERE deg >= {k})"
        )
        parts.append(
            f"t{r+1} AS MATERIALIZED (SELECT t.u, t.v FROM t{r} t "
            f"WHERE t.u IN (SELECT v FROM keep{r}) AND t.v IN (SELECT v FROM keep{r}))"
        )
    return ", ".join(parts) + f" SELECT u, v FROM t{rounds} ORDER BY u, v"


def kcore_incremental(
    edges: DataFrame, k: int, max_iterations: int = 100
) -> DataFrame:
    """Fixpoint k-core with DELTA degree maintenance — same output as
    ``kcore`` (differential-tested), the degree-peel analog of
    ``ktruss_incremental``'s support maintenance.

    ``kcore`` re-aggregates degrees over ALL surviving edge endpoints every
    round (a full 2·|E| shuffle); after round one only neighbors of removed
    vertices change, so this form maintains a ``(v, deg)`` state and
    decrements exactly the survivors adjacent to the removed batch R:

    * removed vertices are BROADCAST (a peel batch is vertex-count bounded),
      so classifying edges as dead/alive is a scan of the edge state, never
      a shuffle of it;
    * an edge with one endpoint in R decrements its surviving endpoint by 1;
      an edge with both endpoints in R decrements nobody — the two broadcast
      left-join flags distinguish the cases exactly;
    * per-round shuffle volume is the decrement aggregate,
      O(edges incident to R), not O(|survivors|).

    Each round checkpoints both states (eager localCheckpoint, tracked),
    with a reliable-file barrier every ``_BARRIER_EVERY`` rounds.

    Bulk-vs-delta, MEASURED (round 5, sf0.1 core = 1.196 M edges, local[32]):
    unlike k-truss — whose bulk round re-runs the triangle kernel and loses
    the cascade tail 46.8 s vs 105.9 s — k-core's bulk round is a single
    whole-stage-codegen degree aggregate, so bulk stays ahead even on a
    ~20-round chain-cascade tail (bulk 19.2 s vs delta 24.1 s; dense-core
    full collapse at k=110: 2.4 s vs 3.8 s). The delta form's advantage is
    asymptotic, not local: its per-round shuffle is O(edges incident to the
    removed batch) versus bulk's O(|survivors|) full re-aggregate, which
    crosses over when survivors are ~100× the removal neighborhood for many
    rounds — the web-periphery regime at 100 TB, not reproducible at sf0.1.
    """
    from trianglecounting_spark.operators.normalize import degrees
    from trianglecounting_spark.plans.tuning import iteration_partitions

    spark = edges.sparkSession
    e_state, e_ids = tracked_checkpoint(edges.select("u", "v"))
    n_part = iteration_partitions(spark, e_state.count())
    d_state, d_ids = tracked_checkpoint(
        degrees(e_state).repartition(n_part, "v")
    )

    for _it in range(max_iterations):
        removed = d_state.where(F.col("deg") < k).select("v")
        if removed.count() == 0:
            break
        ru = F.broadcast(removed.select(F.col("v").alias("u"), F.lit(1).alias("__du")))
        rv = F.broadcast(removed.select("v", F.lit(1).alias("__dv")))
        flagged = e_state.join(ru, "u", "left").join(rv, "v", "left")
        new_e_plan = flagged.where(
            F.col("__du").isNull() & F.col("__dv").isNull()
        ).select("u", "v")
        # one-dead-endpoint edges decrement the OTHER (surviving) endpoint
        dec = (
            flagged.where(F.col("__du").isNotNull() & F.col("__dv").isNull())
            .select(F.col("v"))
            .unionAll(
                flagged.where(
                    F.col("__dv").isNotNull() & F.col("__du").isNull()
                ).select(F.col("u").alias("v"))
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("__dec"))
        )
        new_d_plan = (
            d_state.where(F.col("deg") >= k)
            .join(dec, "v", "left")
            .select(
                "v",
                (F.col("deg") - F.coalesce("__dec", F.lit(0)))
                .cast("long")
                .alias("deg"),
            )
            .repartition(n_part, "v")
        )
        before = persistent_rdd_ids(spark)
        if (_it + 1) % _BARRIER_EVERY == 0:
            new_e, new_e_ids = barrier_checkpoint(new_e_plan)
            new_d, new_d_ids = barrier_checkpoint(new_d_plan)
        else:
            new_e, new_e_ids = tracked_checkpoint(new_e_plan, before=before)
            new_d, new_d_ids = tracked_checkpoint(new_d_plan)
        release_ids(spark, e_ids | d_ids)
        e_state, e_ids = new_e, new_e_ids
        d_state, d_ids = new_d, new_d_ids
    release_ids(spark, d_ids)
    return e_state


def _h_index_agg(values_col: str) -> F.Column:
    """Sort-free (no window) h-index of a group's values as ONE aggregate
    expression: with the multiset sorted descending, H = #{i : a_i ≥ i}
    (1-based) — the classic prefix characterization, equal to
    max_i min(i, a_i) because {i : a_i ≥ i} is a prefix of a non-increasing
    sequence. The per-group array sort happens inside the hash aggregate
    (bounded by the group's degree), replacing a full partition-wide
    window sort; ties need no tiebreak — H is order-independent."""
    arr = F.reverse(F.array_sort(F.collect_list(F.col(values_col))))
    return F.size(
        F.filter(arr, lambda x, i: x >= (i + F.lit(1)).cast("long"))
    ).cast("long")


def coreness(
    edges: DataFrame,
    max_iterations: int = 200,
    broadcast_rows: int = 8_000_000,
) -> DataFrame:
    """Per-vertex core number ``(v, coreness)`` via the distributed h-index
    fixpoint (Lü et al., "The H-index of a network node", Nature Comms 2016):

        h_0(v)   = deg(v)
        h_t+1(v) = H({ h_t(u) : u ~ v })   (H = the h-index operator)

    h is elementwise monotone non-increasing and converges to the core number
    — the whole decomposition in one fixpoint instead of one ``kcore`` peel
    per k. Absent from the reference (a TC engine, no vertex hierarchy);
    added for the link-graph suite (web-spam / importance tiers).

    Physical plan (round-6 rewrite — same integers, same recurrence, the
    round structure re-expressed per guide §8 "decide with small rows,
    keep big rows in place"):

    * ``|V| ≤ broadcast_rows`` (size-guarded small regime — the same
      driver-byte budget contract as the triangle kernel's hub CSR): the
      symmetric adjacency is grouped ONCE into Arrow list rows and
      cached; the |V|-row h state lives as two numpy arrays, broadcast
      each round, and a round is ONE narrow ``mapInArrow`` pass that maps
      every neighbor id to its h (vectorized ``searchsorted``) and
      computes every vertex's H with one segment-sorted prefix count —
      zero joins, zero exchanges, zero per-round checkpoints; the 2|E|
      neighbor volume never moves again after the one grouping shuffle.
      The |V|-row per-round collect is bounded by the same budget that
      bounds the broadcast (precedent: ``_select_hub_csr``'s flat-CSR
      ``toPandas``).
    * otherwise (web scale, |V| not driver-boundable): per-round shuffle
      join of adjacency against the h state + one hash aggregate with
      ``_h_index_agg`` — an in-group array sort instead of the previous
      partition-wide ``row_number`` window sort — with the h state
      checkpointed per round (tracked, file barrier every
      ``_BARRIER_EVERY``).

    Both regimes run the identical integer recurrence to the identical
    fixpoint (H is tie-order-independent), so results are regime- and
    partitioning-invariant.
    """
    import numpy as np

    spark = edges.sparkSession
    adj_plan = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj, adj_ids = tracked_checkpoint(adj_plan)
    h, h_ids = tracked_checkpoint(
        adj.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("h"))
        .select(F.col("u").alias("v"), "h")
    )
    n_v = h.count()

    if n_v <= broadcast_rows:
        # ---- small regime: driver-held state, one narrow pass per round ----
        grouped, grouped_ids = tracked_checkpoint(
            adj.groupBy(F.col("u").alias("src")).agg(
                F.collect_list("v").alias("nbrs")
            )
        )
        h_pdf = h.orderBy("v").toPandas()
        release_ids(spark, adj_ids | h_ids)
        ids = h_pdf["v"].to_numpy(dtype=np.int64)
        hvals = h_pdf["h"].to_numpy(dtype=np.int64)
        sc = spark.sparkContext
        for _ in range(max_iterations):
            h_bc = sc.broadcast((ids, hvals))

            def _round(batches, _bc=h_bc):
                import pyarrow as pa

                b_ids, b_h = _bc.value
                for rb in batches:
                    if rb.num_rows == 0:
                        continue
                    srcs = rb.column("src").to_numpy(zero_copy_only=False)
                    nb = rb.column("nbrs")
                    offs = np.asarray(nb.offsets).astype(np.int64, copy=False)
                    # a sliced ListArray's offsets need not start at 0 —
                    # normalize to the window this batch actually covers
                    vals = nb.values.to_numpy(zero_copy_only=False)[
                        offs[0] : offs[-1]
                    ]
                    offs = offs - offs[0]
                    nh = b_h[np.searchsorted(b_ids, vals)]
                    lens = np.diff(offs)
                    rows = np.repeat(np.arange(len(srcs), dtype=np.int64), lens)
                    # per-row descending h, then the prefix count #{i: a_i>=i}
                    order = np.lexsort((-nh, rows))
                    snh = nh[order]
                    pos = np.arange(len(snh), dtype=np.int64) - np.repeat(
                        offs[:-1], lens
                    )
                    flags = (snh >= pos + 1).astype(np.int64)
                    starts = offs[:-1][lens > 0]
                    hh = np.zeros(len(srcs), dtype=np.int64)
                    if len(starts):
                        hh[lens > 0] = np.add.reduceat(flags, starts)
                    yield pa.RecordBatch.from_pydict(
                        {
                            "v": pa.array(srcs, pa.int64()),
                            "h": pa.array(hh, pa.int64()),
                        }
                    )

            out = (
                grouped.mapInArrow(_round, schema="v long, h long")
                .toPandas()
                .sort_values("v")
            )
            new_hvals = out["h"].to_numpy(dtype=np.int64)
            h_bc.unpersist()
            if np.array_equal(new_hvals, hvals):
                break
            hvals = new_hvals
        release_ids(spark, grouped_ids)
        import pandas as pd

        res = spark.createDataFrame(
            pd.DataFrame({"v": ids, "coreness": hvals}),
            schema="v long, coreness long",
        )
        return res

    # ---- large regime: per-round shuffle join + sort-free H aggregate ----
    total = h.agg(F.sum("h")).collect()[0][0]
    for it in range(1, max_iterations + 1):
        hn = h.select(F.col("v").alias("__nbr"), F.col("h").alias("__nh"))
        new_plan = (
            adj.join(hn, F.col("v") == F.col("__nbr"))
            .groupBy("u")
            .agg(_h_index_agg("__nh").alias("h"))
            .select(F.col("u").alias("v"), "h")
        )
        before = persistent_rdd_ids(spark)
        if it % _BARRIER_EVERY == 0:
            new_h, new_ids = barrier_checkpoint(new_plan)
        else:
            new_h, new_ids = tracked_checkpoint(new_plan, before=before)
        new_total = new_h.agg(F.sum("h")).collect()[0][0]
        release_ids(spark, h_ids)
        h, h_ids = new_h, new_ids
        if new_total == total:
            break
        total = new_total
    release_ids(spark, adj_ids)
    return h.select("v", F.col("h").alias("coreness"))


def coreness_unrolled_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB oracle for ``coreness``: the identical h-index recurrence
    unrolled a fixed number of rounds (the operator is idempotent at the
    fixpoint, so any rounds ≥ the measured convergence depth matches)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "adj AS MATERIALIZED (SELECT u, v FROM e "
        "UNION ALL SELECT v AS u, u AS v FROM e)",
        "h0 AS MATERIALIZED (SELECT u AS v, CAST(count(*) AS BIGINT) AS h "
        "FROM adj GROUP BY u)",
    ]
    for r in range(rounds):
        parts.append(
            f"h{r+1} AS MATERIALIZED (SELECT u AS v, "
            "CAST(max(least(rnk, nh)) AS BIGINT) AS h FROM ("
            f"SELECT a.u, h.h AS nh, row_number() OVER (PARTITION BY a.u "
            f"ORDER BY h.h DESC, a.v ASC) AS rnk "
            f"FROM adj a JOIN h{r} h ON h.v = a.v) GROUP BY u)"
        )
    return ", ".join(parts) + (
        f" SELECT v, h AS coreness FROM h{rounds} ORDER BY v"
    )
