"""Deduplication operators over the `documents` table.

Exact dedup, MinHash+LSH near-dup, SimHash, and n-gram Jaccard — the core of
any 100 TB pre-training corpus pipeline. Design rules:

  * Everything that can be a Column expression is one (JVM, codegen).
  * Hash functions must be *engine-portable* so DuckDB oracles verify them:
    we derive all hashes from md5 (identical bytes in Spark and DuckDB), taking
    the first 8 hex chars as a 32-bit integer. Slower than xxhash64 but
    portable; the production path can swap the hash family without touching
    the plan shape.
  * LSH banding turns the O(n²) pair space into per-bucket joins — the scale
    path. Bucket keys are (band_index, band_hash); a self-join on bucket keys
    with doc_id< doc_id dedups candidate pairs.

Mirrors no reference code (the reference is graph-only); cited pattern:
shingle→minhash→band→bucket-join is the standard Broder construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Normalization shared by all dedup ops (and their SQL oracles, literally).
_NORM_SQL = "trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))"


def _norm_col() -> F.Column:
    return F.trim(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))


def _h32(col: F.Column) -> F.Column:
    """Portable 32-bit hash: first 8 hex chars of md5, as a long in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def _h32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Output (fp, n_dups, keep_id): one row per duplicated fingerprint, keeping
    the minimum doc_id — the standard "keep one representative" policy.
    """
    return (
        docs.select("doc_id", F.md5(_norm_col().cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


EXACT_DEDUP_SQL = (
    f"SELECT md5({_NORM_SQL}) AS fp, CAST(count(*) AS BIGINT) AS n_dups, "
    "min(doc_id) AS keep_id FROM documents "
    f"GROUP BY md5({_NORM_SQL}) HAVING count(*) > 1 ORDER BY fp"
)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, k: int = 5) -> DataFrame:
    """Distinct character k-shingles of the normalized text.
    Output (doc_id, shingle). Exploded form — the minhash input.

    The normalization is hoisted into its own projection BEFORE the transform
    lambda: an expression inside the lambda body is evaluated per element, so
    inlining ``regexp_replace(text, ...)`` there costs one full-text regex pass
    per shingle POSITION — O(len²) regex work per document (measured as the
    dominant minhash cost). As a plain column it runs once per document."""
    normed = docs.select("doc_id", _norm_col().alias("__t"))
    # substring(col, i, k) with a column start position needs the expr form:
    sh = F.expr(
        f"transform(sequence(1, greatest(length(__t) - {k - 1}, 1)), "
        f"i -> substring(__t, i, {k}))"
    )
    return normed.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def _spark_norm_expr() -> str:
    return r"trim(lower(regexp_replace(text, '\\s+', ' ')))"


# Universal-hash permutation constants over the 2^31−1 Mersenne prime —
# portable integer arithmetic in Spark AND SQL (products stay < 2^62, safe
# under ANSI int64), so ONE md5 per shingle replaces num_hashes md5 calls.
_MH_PRIME = (1 << 31) - 1


def _mh_params(num_hashes: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        a = 1 + int(hashlib.md5(f"mh-a-{i}".encode()).hexdigest()[:8], 16) % (_MH_PRIME - 1)
        b = int(hashlib.md5(f"mh-b-{i}".encode()).hexdigest()[:8], 16) % _MH_PRIME
        out.append((a, b))
    return out


def minhash_signatures(docs: DataFrame, k: int = 5, num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: base hash h0 = h32(shingle) mod (2^31−1)
    (one md5), then permutation i = (a_i·h0 + b_i) mod (2^31−1) — the standard
    universal-hash family. Output (doc_id, sig: array<long>)."""
    sh = shingles(docs, k).withColumn(
        "h0", F.pmod(_h32(F.col("shingle")), F.lit(_MH_PRIME))
    )
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("h0") + F.lit(b), F.lit(_MH_PRIME))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(_mh_params(num_hashes))
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 5, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    num_hashes/bands rows per band are concatenated and hashed to a bucket;
    docs sharing any bucket become a candidate pair. Output (id_a, id_b) with
    id_a < id_b, distinct. The self-join is per-bucket — never O(n²).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, k, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *parts).cast("binary")).alias("bkey"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a = buckets.select(F.col("doc_id").alias("id_a"), "band", "bkey")
    b2 = buckets.select(F.col("doc_id").alias("id_b"), "band", "bkey")
    return (
        a.join(b2, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _shingle_sql(k: int = 5) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(length({_NORM_SQL}) - {k - 1}, 1) + 1), "
        f"i -> substr({_NORM_SQL}, CAST(i AS INTEGER), {k})))"
    )


def minhash_lsh_pairs_sql(k: int = 5, num_hashes: int = 16, bands: int = 4) -> str:
    rows_per_band = num_hashes // bands
    h0 = f"({_h32_sql('shingle')} % {_MH_PRIME})"
    min_exprs = ", ".join(
        f"min(({a} * {h0} + {b}) % {_MH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(_mh_params(num_hashes))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '_' || ".join(
            f"CAST(h{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + ") AS bkey FROM sig"
        for b in range(bands)
    )
    return (
        f"WITH sh AS (SELECT doc_id, unnest({_shingle_sql(k)}) AS shingle FROM documents), "
        f"sig AS (SELECT doc_id, {min_exprs} FROM sh GROUP BY doc_id), "
        f"buckets AS ({band_selects}) "
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM buckets a "
        "JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id "
        "ORDER BY id_a, id_b"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash fingerprint over word tokens: bit j of the hash of each token
    votes ±1; sign of the total sets bit j. Output (doc_id, simhash: long)."""
    toks = F.expr(
        f"array_distinct(regexp_extract_all({_spark_norm_expr()}, '[a-z0-9\\']+', 0))"
    )
    t = docs.select("doc_id", F.explode(toks).alias("tok"))
    h = _h32(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = t.groupBy("doc_id").agg(*votes)
    acc = F.lit(0).cast("long")
    for j in range(bits):
        acc = acc + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return agg.select("doc_id", acc.alias("simhash"))


def simhash_sql(bits: int = 32) -> str:
    tok_expr = f"list_distinct(regexp_extract_all({_NORM_SQL}, '[a-z0-9'']+'))"
    h = _h32_sql("tok")
    votes = ", ".join(
        f"sum(CASE WHEN (({h} >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    acc = " + ".join(f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits))
    return (
        f"WITH t AS (SELECT doc_id, unnest({tok_expr}) AS tok FROM documents), "
        f"v AS (SELECT doc_id, {votes} FROM t GROUP BY doc_id) "
        f"SELECT doc_id, CAST({acc} AS BIGINT) AS simhash FROM v ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard on LSH candidates
# ---------------------------------------------------------------------------

def ngram_jaccard(docs: DataFrame, pairs: DataFrame, k: int = 5) -> DataFrame:
    """Exact character-k-gram Jaccard similarity for given candidate pairs.
    Output (id_a, id_b, jaccard: double rounded 1e-6). Set ops via exploded
    shingles + join-count (JVM) rather than array intersect on the driver."""
    sh = shingles(docs, k)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingle"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingle"))
    inter = (
        pairs.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_all_pairs_sql(k: int = 5, min_jaccard: float = 0.0) -> str:
    """Oracle: exact k-gram Jaccard over ALL doc pairs sharing ≥1 shingle."""
    return (
        f"WITH sh AS (SELECT doc_id, unnest({_shingle_sql(k)}) AS shingle FROM documents), "
        "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter "
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT i.id_a, i.id_b, round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b "
        f"WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= {min_jaccard} "
        "ORDER BY id_a, id_b"
    )


def ngram_jaccard_all_pairs(docs: DataFrame, k: int = 5, min_jaccard: float = 0.0) -> DataFrame:
    """Spark twin of the all-pairs oracle (shingle-join, not O(n²) crossjoin)."""
    sh = shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .where(jac >= min_jaccard)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def shingle_containment(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    k: int = 5,
    min_containment: float = 0.5,
) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT (Broder 1997,
    "On the resemblance and containment of documents"):

        c(A, B) = |S(A) ∩ S(B)| / min(|S(A)|, |S(B)|)

    — catches the pairs Jaccard structurally misses: a small document
    (quote, syndicated snippet, boilerplate block) wholly embedded in a much
    larger one has Jaccard ≈ |small|/|large| → 0 but containment ≈ 1. The
    standard companion filter to MinHash dedup in web-corpus pipelines.
    Output ``(id_a, id_b, n_inter, containment)`` with id_a < id_b,
    containment ≥ ``min_containment``, rounded 6dp.

    Scale: when ``pairs`` (LSH candidates) is given, only those pairs are
    scored — the 100 TB path, identical join shape to ``ngram_jaccard``.
    With ``pairs=None`` the shingle self-join enumerates collision pairs
    (the oracle-twin shape; fine at test scale, candidate-gated in
    production). Integer intersection counts; one final division.
    """
    sh = shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    if pairs is None:
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
        )
    else:
        inter = (
            pairs.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
        )
    cont = F.col("n_inter") / F.least("na", "nb")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .where(cont >= min_containment)
        .select("id_a", "id_b", "n_inter", F.round(cont, 6).alias("containment"))
    )


def shingle_containment_sql(k: int = 5, min_containment: float = 0.5) -> str:
    """DuckDB twin of ``shingle_containment`` (all collision pairs)."""
    return (
        f"WITH sh AS (SELECT doc_id, unnest({_shingle_sql(k)}) AS shingle FROM documents), "
        "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(count(*) AS BIGINT) AS n_inter "
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT i.id_a, i.id_b, i.n_inter, "
        "round(CAST(i.n_inter AS DOUBLE) / least(sa.n, sb.n), 6) AS containment "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.id_a "
        "JOIN sz sb ON sb.doc_id = i.id_b "
        f"WHERE CAST(i.n_inter AS DOUBLE) / least(sa.n, sb.n) >= {min_containment}"
    )


def dedup_clusters(docs: DataFrame, k: int = 5, num_hashes: int = 16,
                   bands: int = 4) -> DataFrame:
    """Near-duplicate CLUSTER assignment — the step a real dedup pipeline
    runs after pair generation: treat the MinHash-LSH pairs as an undirected
    graph, take connected components (large-star/small-star — near-dup
    similarity is not transitive, so clustering must close over chains), and
    keep the minimum doc_id per cluster as the canonical representative.

    Composes two verified operators end-to-end; at 100 TB the pair graph is
    tiny relative to the corpus (only near-dup docs appear), so the CC
    iterations run on a table orders of magnitude smaller than the input.
    Output: ``(doc_id, keep_id)`` for EVERY document — singletons keep
    themselves; a row survives the pipeline iff ``doc_id == keep_id``.
    """
    from trianglecounting_spark.operators.components import connected_components

    pairs = minhash_lsh_pairs(docs, k=k, num_hashes=num_hashes, bands=bands)
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    labels = connected_components(edges).select(
        F.col("v").alias("doc_id"), F.col("component").alias("keep_id")
    )
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("keep_id", F.col("doc_id")).cast("long").alias("keep_id")
    )


def dedup_clusters_sql(k: int = 5, num_hashes: int = 16, bands: int = 4,
                       cc_rounds: int = 50) -> str:
    """DuckDB twin: the pair SQL as an edge list + min-label flooding
    (rounds ≥ the pair-graph diameter) + the keep-self default.

    ``cc_rounds`` defaults to the ENGINE's connected-components iteration cap
    (components.connected_components max_iterations=50): near-dup clusters
    are usually near-cliques that settle in a handful of rounds, but a
    chain-shaped pair graph with diameter > rounds would silently break
    engine/oracle parity even with both sides individually correct — so the
    oracle floods at least as deep as the engine can converge. Each extra
    round is one tiny join over the (near-dup-only) pair graph."""
    from trianglecounting_spark.operators.components import cc_minlabel_unrolled_sql

    pair_edges = (
        f"SELECT id_a AS u, id_b AS v FROM ({minhash_lsh_pairs_sql(k, num_hashes, bands)})"
    )
    cc = cc_minlabel_unrolled_sql(pair_edges, rounds=cc_rounds)
    return (
        f"SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS keep_id "
        f"FROM documents d LEFT JOIN ({cc}) c ON c.v = d.doc_id ORDER BY d.doc_id"
    )


# ---------------------------------------------------------------------------
# Paragraph-level (line-level) exact dedup
# ---------------------------------------------------------------------------

# A "paragraph" is a newline-delimited segment, trimmed; empty segments are
# dropped. Exact fp = md5 of the trimmed segment (engine-portable).

def _paragraphs(docs: DataFrame) -> DataFrame:
    """``(doc_id, para_id, para, fp)`` — one row per non-empty paragraph.
    Narrow explode bounded by paragraphs-per-doc; para_id is the 1-based
    position so cleaned text can be reassembled in original order."""
    p = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\n")).alias("pid", "para")
    ).select(
        "doc_id",
        (F.col("pid") + 1).cast("long").alias("para_id"),
        F.trim(F.col("para")).alias("para"),
    ).where(F.col("para") != "")
    return p.withColumn("fp", F.md5(F.col("para").cast("binary")))


def _PARAS_SQL(docs_rel: str = "documents") -> str:
    return (
        f"(SELECT doc_id, CAST(pos AS BIGINT) AS para_id, trim(parts[pos]) AS para, "
        f"md5(trim(parts[pos])) AS fp "
        f"FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM {docs_rel}), "
        f"unnest(generate_series(1, len(parts))) AS t(pos) "
        f"WHERE trim(parts[pos]) <> '')"
    )


def paragraph_dup_stats(docs: DataFrame, min_docs: int = 2) -> DataFrame:
    """Per-document paragraph-duplication profile: ``(doc_id, n_paras,
    n_dup_paras, dup_ratio)`` where a paragraph is "duplicated" iff its exact
    fp occurs in ≥ ``min_docs`` DISTINCT documents (the MassiveText /
    RefinedWeb line-dedup signal — boilerplate lines shared across pages).

    Scale: one explode + one count-distinct groupBy on fp (map-side combined;
    the fp key space is the distinct-paragraph set, hot boilerplate fps cost
    one partial per partition) + one join back on fp. The dup-fp side is the
    duplicated subset only — orders of magnitude smaller than the corpus.
    """
    paras = _paragraphs(docs)
    dup_fps = (
        paras.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("fp", F.lit(1).alias("is_dup"))
    )
    marked = paras.join(dup_fps, "fp", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dup_paras"),
        F.round(
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))) / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


def paragraph_dup_stats_sql(min_docs: int = 2, docs_rel: str = "documents") -> str:
    """DuckDB twin of :func:`paragraph_dup_stats`."""
    return (
        f"WITH paras AS MATERIALIZED (SELECT * FROM {_PARAS_SQL(docs_rel)}), "
        f"dup AS (SELECT fp FROM paras GROUP BY fp "
        f"HAVING count(DISTINCT doc_id) >= {min_docs}) "
        f"SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_paras, "
        f"CAST(count(d.fp) AS BIGINT) AS n_dup_paras, "
        f"round(count(d.fp) * 1.0 / count(*), 6) AS dup_ratio "
        f"FROM paras p LEFT JOIN dup d ON d.fp = p.fp GROUP BY p.doc_id"
    )


def remove_duplicate_paragraphs(docs: DataFrame, min_docs: int = 2) -> DataFrame:
    """The cleaning pass: drop every paragraph whose fp occurs in ≥
    ``min_docs`` distinct documents (from ALL documents — the MassiveText
    rule: corpus-frequent lines are boilerplate, no copy is content), and
    reassemble the survivors in original order.

    Output: ``(doc_id, clean_text)`` — one row per document; a document whose
    every paragraph was boilerplate yields an empty string (downstream
    quality filters drop it, that's their call not ours).

    Scale: the dup-fp set rides a broadcast-able side (duplicated fps only);
    reassembly is one groupBy(doc_id) with an in-group sort of a bounded
    paragraph array — never a global order-sensitive collect.
    """
    paras = _paragraphs(docs)
    dup_fps = (
        paras.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("fp")
    )
    kept = paras.join(dup_fps, "fp", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_id", "para"))),
                lambda s: s.para,
            ),
            "\n",
        ).alias("clean_text")
    )
    return docs.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("clean_text", F.lit("")).alias("clean_text")
    )


def remove_duplicate_paragraphs_sql(min_docs: int = 2,
                                    docs_rel: str = "documents") -> str:
    """DuckDB twin of :func:`remove_duplicate_paragraphs`."""
    return (
        f"WITH paras AS MATERIALIZED (SELECT * FROM {_PARAS_SQL(docs_rel)}), "
        f"dup AS (SELECT fp FROM paras GROUP BY fp "
        f"HAVING count(DISTINCT doc_id) >= {min_docs}), "
        f"kept AS (SELECT p.* FROM paras p ANTI JOIN dup d ON d.fp = p.fp), "
        f"rebuilt AS (SELECT doc_id, "
        f"string_agg(para, chr(10) ORDER BY para_id) AS clean_text "
        f"FROM kept GROUP BY doc_id) "
        f"SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text "
        f"FROM {docs_rel} d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id"
    )
