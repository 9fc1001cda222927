"""Deterministic random walks — DeepWalk/node2vec(p=q=1) corpus generation.

Training graph embeddings over a 100 TB link graph starts from a corpus of
short random walks (Perozzi et al., DeepWalk, KDD'14). A distributed walk
generator must pick a *random* neighbor per step WITHOUT driver-side RNG
state — here the choice at step t of walk w is

    rank = H(w, t) mod deg(u),   H(w, t) = ((w mod M)·A + t·B + seed) mod M

a counter-based integer hash (same constants style as the LSH salt split in
functions/similarity.py): pure int64 arithmetic with no overflow
((w mod M)·A < 2^62), identical in Spark and DuckDB, so entire walks are
bit-portable and the operator is exact-oracle-checkable despite being
"random". Every step is one shuffle join of the frontier against the ranked
adjacency — walk length L costs L−1 joins, each keyed on the current node;
no Python, no collect, no per-row RNG.

Plan shape: the ranked adjacency (u, rnk, nbr, deg) is built once (one
window over the symmetric edge list — same shape as adjacency_fp) and
reused by every step; the walk state stays (walk_id, step, node), exploded —
the natural sharded layout for feeding a skip-gram trainer downstream.

No counterpart in /root/reference (a triangle-counting engine); added for
the link-graph training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_M = 1_000_000_007
_A = 2_654_435_761
_B = 97_003_099


def _ranked_adjacency(edges: DataFrame) -> DataFrame:
    """(u, rnk, nbr, deg): both directions, neighbors ranked 1..deg by id."""
    adj = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u").orderBy(F.col("v").asc())
    return adj.select(
        "u",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.col("v").alias("nbr"),
        F.count(F.lit(1)).over(Window.partitionBy("u")).cast("long").alias("deg"),
    )


def _step_hash(walk_id: F.Column, t: int, seed: int) -> F.Column:
    return (
        (walk_id % F.lit(_M)) * F.lit(_A) + F.lit(t * _B + seed)
    ) % F.lit(_M)


def random_walks(edges: DataFrame, walk_len: int = 4,
                 seed: int = 42) -> DataFrame:
    """One walk per vertex, ``walk_len`` nodes (= walk_len − 1 hash-driven
    steps). Output ``(walk_id, step, node)`` with walk_id = the start vertex
    and step 0..walk_len−1 — exploded skip-gram-ready layout."""
    ranked = _ranked_adjacency(edges)
    starts = ranked.select(F.col("u").alias("node")).distinct()
    cur = starts.select(
        F.col("node").alias("walk_id"),
        F.lit(0).cast("long").alias("step"),
        "node",
    )
    out = [cur]
    for t in range(1, walk_len):
        pick = (_step_hash(F.col("walk_id"), t, seed) % F.col("deg")) + 1
        cur = (
            cur.join(ranked, cur["node"] == ranked["u"])
            .where(F.col("rnk") == pick)
            .select(
                "walk_id",
                F.lit(t).cast("long").alias("step"),
                F.col("nbr").alias("node"),
            )
        )
        out.append(cur)
    res = out[0]
    for nxt in out[1:]:
        res = res.unionAll(nxt)
    return res


def random_walks_sql(edges_sql: str, walk_len: int = 4,
                     seed: int = 42) -> str:
    """DuckDB twin of ``random_walks`` — identical hash, rank, and joins."""
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        "adj AS MATERIALIZED (SELECT u, v FROM e "
        "UNION ALL SELECT v AS u, u AS v FROM e)",
        "ranked AS MATERIALIZED (SELECT u, "
        "CAST(row_number() OVER (PARTITION BY u ORDER BY v ASC) AS BIGINT) AS rnk, "
        "v AS nbr, CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS deg FROM adj)",
        "w0 AS MATERIALIZED (SELECT DISTINCT u AS walk_id, "
        "CAST(0 AS BIGINT) AS step, u AS node FROM ranked)",
    ]
    for t in range(1, walk_len):
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT c.walk_id, "
            f"CAST({t} AS BIGINT) AS step, r.nbr AS node "
            f"FROM w{t-1} c JOIN ranked r ON r.u = c.node "
            f"AND r.rnk = ((c.walk_id % {_M}) * {_A} + {t * _B + seed}) "
            f"% {_M} % r.deg + 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM w{t}" for t in range(walk_len)
    )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT walk_id, step, node FROM ({union}) ORDER BY walk_id, step"
    )
