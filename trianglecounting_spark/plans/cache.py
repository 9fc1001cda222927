"""Deterministic cache/checkpoint block release.

The iterative operators truncate lineage with ``localCheckpoint(eager=True)``
each round. Spark frees those blocks only when the JVM's ContextCleaner sees
the RDD get garbage-collected — which, driven from Python, happens at some
unrelated future GC. On a long-running session (or a 1000-executor cluster
where executor storage memory is the scarce resource) that is a leak: every
round's state stays resident until both Python and JVM GCs happen to run.

These helpers make the release deterministic:

  * ``tracked_checkpoint(df)`` — eager localCheckpoint that also reports which
    persistent-RDD ids the materialization created, so the caller can release
    exactly the previous iteration's blocks once the new state is durable.
  * ``release_ids(spark, ids)`` — unpersist those blocks NOW (the iteration
    contract: state k is released as soon as state k+1 is materialized and
    any fixpoint probe that reads state k has run).
  * ``release_all_cached(spark)`` — session-level sweep used between benchmark
    queries and in tests; replaces the round-1 ``System.gc()`` workaround.

On a real cluster the same calls work unchanged: unpersist is a driver→executor
RPC, not a local-mode trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every currently persisted RDD (cache() / persist() /
    localCheckpoint() blocks all register here)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_ids(spark: SparkSession, ids: set[int], blocking: bool = False) -> int:
    """Unpersist the given RDD ids (best-effort; missing ids are skipped).
    Returns the number actually released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(blocking)
            released += 1
    return released


def release_all_cached(
    spark: SparkSession, blocking: bool = False, keep: set[int] | None = None
) -> int:
    """Unpersist EVERY persistent RDD in the session except ``keep``. Only
    call at a quiescent point (results consumed): localCheckpoint blocks are
    not recomputable."""
    ids = persistent_rdd_ids(spark) - (keep or set())
    return release_ids(spark, ids, blocking)


def locally_checkpointed_ids(spark: SparkSession, ids: set[int]) -> set[int]:
    """Subset of ``ids`` whose RDD is marked for LOCAL CHECKPOINT (the mark is
    set at ``localCheckpoint()`` call time, before materialization). SQL-cache
    buffer RDDs (``DataFrame.persist``, owned by the CacheManager) are never
    locally checkpointed, so this distinguishes "iteration scratch this helper
    owns" from "a cache some caller still relies on"."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    out: set[int] = set()
    for rid in ids:
        jrdd = jmap.get(rid)
        try:
            if jrdd is not None and jrdd.rdd().isLocallyCheckpointed():
                out.add(rid)
        except Exception:
            # introspection failure → leave the block alone (release here is
            # best-effort hygiene; wrongly unpersisting a live cache is worse)
            continue
    return out


def tracked_checkpoint(
    df: DataFrame, before: set[int] | None = None
) -> tuple[DataFrame, set[int]]:
    """Eager localCheckpoint that returns ``(materialized_df, its_block_ids)``
    and releases every OTHER *locally-checkpointed* block the step created.

    ``before`` — pass a ``persistent_rdd_ids`` snapshot taken before the input
    plan was *constructed* when that construction itself registers lazy
    localCheckpoints (e.g. the triangle kernel's internal DODG/adjacency
    materializations): those intermediates are only needed while this
    checkpoint materializes, so they are released here, deterministically,
    instead of waiting for a JVM GC. The checkpointed result's own block id is
    read off its LogicalRDD, so the release can never hit the result itself.

    The release sweeps ONLY locally-checkpointed RDDs: a ``DataFrame.persist``
    cache whose buffers first materialize *inside* this checkpoint's job
    (e.g. pagerank's pre-partitioned edge table on its first iteration) also
    shows up in the created-set, but unpersisting it would silently disable
    the cache for every later iteration — the CacheManager's plan entry stays
    while the direct RDD unpersist never re-persists the buffers.
    """
    spark = df.sparkSession
    if before is None:
        before = persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    created = persistent_rdd_ids(spark) - before
    own = {int(out._jdf.queryExecution().analyzed().rdd().id())}
    release_ids(spark, locally_checkpointed_ids(spark, created - own))
    return out, own


def barrier_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """TRUE lineage barrier: reliable ``checkpoint()`` to the context's
    checkpoint directory (files), which replaces the RDD's dependencies with
    a CheckpointRDD — unlike ``localCheckpoint``, whose underlying RDD DAG
    stays chained across rounds. Needed by deep iteration loops: a
    driver-side per-job traversal walks lineage PATHS, and with k≥2
    references per round the walk is O(k^depth) — measured as a flat
    ~0.5 s/round until depth ~11 and then 4× per round (operators/scc.py's
    flood, 4 refs/round). Dropping a barrier every few rounds caps the
    walkable depth. Returns ``(df, ids)`` like ``tracked_checkpoint`` (the
    ids are the file-backed checkpoint's persistent blocks, if any — usually
    empty; safe to pass to release_ids)."""
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    out = df.checkpoint(eager=True)
    return out, persistent_rdd_ids(spark) - before
