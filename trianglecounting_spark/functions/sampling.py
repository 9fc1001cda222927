"""Deterministic sampling operators — the data-mixing stage of a training
pipeline.

At 100 TB you never sample with an RNG: selection must be reproducible across
reruns, restarts, and engines, and must not depend on partitioning. Both
operators here key selection off a counter-based integer hash of the ROW ID
(same constants family as the LSH salt split in functions/similarity.py —
pure int64 arithmetic, no overflow, identical in Spark and DuckDB):

* ``hash_sample`` — Bernoulli-style: keep a row iff H(id) mod 10⁶ falls under
  the fraction. A pure narrow filter: NO shuffle, pushes down to the scan,
  cost O(rows scanned). The standard "p% of the corpus" cut.
* ``stratified_sample`` — per-stratum fixed-size: rank rows inside each
  stratum by (H(id), id) and keep the first ``cap``. One window shuffle keyed
  on the stratum columns; a uniform-without-replacement draw per stratum, the
  shape used for language/source mixing quotas. Skewed strata cost only their
  own partition's sort; the per-stratum output is exactly min(cap, |stratum|)
  rows, so downstream sizes are known a priori.

No counterpart in /root/reference; part of the LLM-training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_M = 1_000_000_007
_A = 2_654_435_761


def _h(id_col: F.Column, seed: int) -> F.Column:
    return ((id_col % F.lit(_M)) * F.lit(_A) + F.lit(seed)) % F.lit(_M)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                seed: int = 42) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically: H(id) mod 10⁶ under the
    threshold. Narrow map — no shuffle, partitioning-invariant."""
    thresh = int(fraction * 1_000_000)
    return df.where((_h(F.col(id_col), seed) % F.lit(1_000_000)) < thresh)


def hash_sample_sql(table: str, id_col: str, fraction: float,
                    seed: int = 42) -> str:
    """DuckDB twin of ``hash_sample``."""
    thresh = int(fraction * 1_000_000)
    return (
        f"SELECT * FROM {table} WHERE "
        f"(({id_col} % {_M}) * {_A} + {seed}) % {_M} % 1000000 < {thresh} "
        f"ORDER BY {id_col}"
    )


def stratified_sample(df: DataFrame, strata_cols: list[str], id_col: str,
                      cap: int, seed: int = 42) -> DataFrame:
    """Exactly min(cap, |stratum|) rows per stratum, drawn uniformly without
    replacement in hash order (ties broken by id — total order, so the draw
    is unique)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _h(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def stratified_sample_sql(table: str, strata_cols: list[str], id_col: str,
                          cap: int, seed: int = 42,
                          select_cols: str = "* EXCLUDE (rk)") -> str:
    """DuckDB twin of ``stratified_sample``."""
    strata = ", ".join(strata_cols)
    return (
        f"SELECT {select_cols} FROM (SELECT *, row_number() OVER ("
        f"PARTITION BY {strata} ORDER BY "
        f"(({id_col} % {_M}) * {_A} + {seed}) % {_M} ASC, {id_col} ASC) AS rk "
        f"FROM {table}) WHERE rk <= {cap} ORDER BY {id_col}"
    )


def domain_mixture(docs: DataFrame, domain_col: str = "domain",
                   alpha: float = 0.7) -> DataFrame:
    """Temperature-based domain re-weighting — the data-MIXING step after
    sampling: each domain's draw probability is proportional to
    ``n_docs^alpha`` (alpha < 1 up-weights small domains / down-weights
    mega-domains; alpha = 1 is natural frequency, alpha = 0 uniform — the
    multinomial temperature scheme used for corpus/language balancing).
    Output one row per domain: ``(domain, n_docs, weight)`` with
    Σ weight = 1 (6dp).

    Determinism: per-domain ``pow(n, alpha)`` is a single IEEE op, but the
    normalizer Σ_d n_d^alpha must NOT be a distributed float sum. Like
    ``powerlaw_alpha``, it folds the exact integer count-HISTOGRAM
    (Σ_c k_c·c^alpha over counts c ascending) — at most max-count rows, a
    fixed operation sequence mirrored in the oracle. Everything else is two
    map-side-combined integer counts + one tiny crossJoin of the scalar.
    """
    counts = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    hist = counts.groupBy("n_docs").agg(F.count(F.lit(1)).cast("long").alias("k"))
    norm = hist.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("n_docs").alias("c"), "k"))),
            F.lit(0.0),
            lambda acc, s: acc
            + s.k.cast("double") * F.pow(s.c.cast("double"), F.lit(alpha)),
        ).alias("__s")
    )
    return counts.crossJoin(norm).select(
        F.col(domain_col).alias("domain"),
        "n_docs",
        F.round(
            F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("__s"), 6
        ).alias("weight"),
    )


def domain_mixture_sql(docs_sql: str, domain_col: str = "domain",
                       alpha: float = 0.7) -> str:
    """DuckDB twin of :func:`domain_mixture` — identical ascending-count
    histogram fold for the normalizer."""
    return (
        f"WITH src AS ({docs_sql}), "
        f"c AS (SELECT {domain_col} AS domain, CAST(count(*) AS BIGINT) AS n_docs "
        f"FROM src GROUP BY {domain_col}), "
        "h AS (SELECT n_docs AS cc, CAST(count(*) AS BIGINT) AS k FROM c GROUP BY n_docs), "
        "s AS (SELECT list_sum(list_transform(list_sort(list(struct_pack(c := cc, k := k))), "
        f"x -> CAST(x.k AS DOUBLE) * pow(CAST(x.c AS DOUBLE), {alpha}))) AS sv FROM h) "
        f"SELECT c.domain, c.n_docs, "
        f"round(pow(CAST(c.n_docs AS DOUBLE), {alpha}) / s.sv, 6) AS weight "
        "FROM c, s"
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096


def _hashed_ngram_buckets(docs: DataFrame, buckets: int) -> DataFrame:
    """Hashed n-gram (unigram + adjacent-bigram) feature buckets, one row per
    feature OCCURRENCE: ``(doc_id, bucket)`` with bucket in [0, buckets).

    The DSIR feature map: every token and every adjacent token pair hashes
    into a fixed-size bucket vocabulary, so the downstream bucket-count
    tables are bounded at ``buckets`` rows regardless of corpus size — the
    property that makes the estimator broadcastable at 100 TB. The hash is
    the repo's portable md5-prefix (functions/dedup.py `_h32`): identical
    bytes in Spark and DuckDB.
    """
    from trianglecounting_spark.functions.dedup import _h32
    from trianglecounting_spark.functions.textstats import WORD_RE

    tokked = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), 0).alias(
            "__toks"
        ),
    )
    n = F.size("__toks")
    unigrams = tokked.select("doc_id", F.explode("__toks").alias("feat"))
    # adjacent bigrams: zip the token array with its own tail (narrow map,
    # no shuffle) — same construction as textstats.collocations_pmi
    bigrams = tokked.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 2,
                F.arrays_zip(
                    F.slice(F.col("__toks"), 1, n - 1).alias("w1"),
                    F.slice(F.col("__toks"), 2, n - 1).alias("w2"),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    ).select(
        "doc_id",
        F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")).alias("feat"),
    )
    feats = unigrams.unionAll(bigrams)
    return feats.select(
        "doc_id", F.pmod(_h32(F.col("feat")), F.lit(buckets)).alias("bucket")
    )


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    buckets: int = _DSIR_BUCKETS,
    keep_frac: float = 0.25,
) -> DataFrame:
    """DSIR importance weights + deterministic top-fraction selection — the
    pretraining data-selection scheme of Xie et al. (NeurIPS 2023): score
    each raw document by how much more likely its hashed-n-gram features are
    under a TARGET-domain bag-of-ngrams model than under the RAW-corpus
    model, then keep the highest-weight fraction.

        feat(d)   = hashed unigrams + bigrams of d  → bucket in [0, B)
        p_t(b)    = (cnt_target(b) + 1) / (T_target + B)   (add-1 smoothing)
        p_r(b)    = (cnt_raw(b) + 1)    / (T_raw + B)
        logw(d)   = Σ_b c_d(b) · ( ln p_t(b) − ln p_r(b) )     (rounded 6dp)
        selected  = rank of (logw desc, doc_id asc) ≤ ceil(keep_frac·N)

    The paper resamples with Gumbel noise; selection here is the
    deterministic top-k variant (no RNG anywhere — reruns, restarts, and the
    DuckDB oracle all pick the identical set).

    Scale shape: the two distribution tables are bounded at ``buckets`` rows
    (broadcast joins, never a shuffled term join); per-doc bucket counts are
    one map-side-combined aggregate keyed (doc_id, bucket); the per-doc sum
    folds a SORTED in-row list (``F.aggregate`` over ``array_sort``) so the
    float accumulation order is fixed — partitioning-invariant and mirrored
    op-for-op in the oracle, like ``domain_mixture``'s normalizer; ranking
    is the distributed counting sort (``scalable_dense_rank``), no
    single-task window. In the intended use ``target_docs`` is a small
    high-quality sample (wiki/books-like); here it is any DataFrame with
    (doc_id, text).

    Output: ``(doc_id, logw: double 6dp, selected: boolean)``, one row per
    input doc; docs with no features (empty text) score 0.0 exactly when the
    corpus-level models agree, i.e. their logw is 0.0 by the empty sum.

    No counterpart in /root/reference; the data-selection member of the
    LLM-training-data family (see also domain_mixture, decontaminate).
    """
    from trianglecounting_spark.operators.normalize import scalable_dense_rank

    fb = _hashed_ngram_buckets(docs, buckets)
    tb = _hashed_ngram_buckets(target_docs, buckets)

    doc_counts = fb.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    raw_counts = fb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cr")
    )
    tgt_counts = tb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    totals = raw_counts.agg(
        F.sum("cr").cast("double").alias("tr")
    ).crossJoin(tgt_counts.agg(F.sum("ct").cast("double").alias("tt")))

    joined = (
        doc_counts.join(F.broadcast(raw_counts), "bucket")
        .join(F.broadcast(tgt_counts), "bucket", "left")
        .select(
            "doc_id",
            "bucket",
            "c",
            "cr",
            F.coalesce("ct", F.lit(0)).cast("long").alias("ct"),
        )
    )
    bd = float(buckets)
    # fixed-order fold: sort the per-doc (bucket, ...) list, then accumulate
    # left-to-right — the float sum order is part of the contract
    scored = (
        joined.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket", "c", "ct", "cr"))
            ).alias("__terms")
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.aggregate(
                    "__terms",
                    F.lit(0.0),
                    lambda acc, s: acc
                    + s.c.cast("double")
                    * (
                        F.log(
                            (s.ct.cast("double") + F.lit(1.0))
                            / (F.col("tt") + F.lit(bd))
                        )
                        - F.log(
                            (s.cr.cast("double") + F.lit(1.0))
                            / (F.col("tr") + F.lit(bd))
                        )
                    ),
                ),
                6,
            ).alias("logw"),
        )
    )
    all_docs = docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id", F.coalesce("logw", F.lit(0.0)).alias("logw")
    )
    ranked = scalable_dense_rank(
        all_docs,
        [F.col("logw").desc(), F.col("doc_id").asc()],
        ["doc_id", "logw"],
        out_col="__rn",
    )
    n_docs = all_docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    return ranked.crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "logw",
        ((F.col("__rn") + 1) <= F.ceil(F.lit(keep_frac) * F.col("__n"))).alias(
            "selected"
        ),
    )


def dsir_weights_sql(
    target_pred: str,
    buckets: int = _DSIR_BUCKETS,
    keep_frac: float = 0.25,
    docs_rel: str = "documents",
) -> str:
    """DuckDB twin of :func:`dsir_weights` with ``target_docs = docs WHERE
    target_pred`` — identical feature hash, smoothing, sorted fold, rounding,
    and top-fraction rule."""
    from trianglecounting_spark.functions.dedup import _h32_sql
    from trianglecounting_spark.functions.textstats import WORD_RE

    toks = f"regexp_extract_all(lower(text), '{WORD_RE.replace(chr(39), chr(39) * 2)}')"
    hb = _h32_sql("feat")
    bd = float(buckets)
    return (
        f"WITH tk AS MATERIALIZED (SELECT doc_id, {toks} AS t FROM {docs_rel}), "
        "fe AS MATERIALIZED ("
        "SELECT doc_id, unnest(t) AS feat FROM tk "
        "UNION ALL "
        "SELECT doc_id, t[pos] || ' ' || t[pos + 1] AS feat FROM tk, "
        "unnest(generate_series(1, len(t) - 1)) AS s(pos)), "
        f"fb AS MATERIALIZED (SELECT doc_id, {hb} % {buckets} AS bucket FROM fe), "
        f"tgt AS (SELECT doc_id FROM {docs_rel} WHERE {target_pred}), "
        "dc AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c "
        "FROM fb GROUP BY doc_id, bucket), "
        "rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr "
        "FROM fb GROUP BY bucket), "
        "tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct "
        "FROM fb WHERE doc_id IN (SELECT doc_id FROM tgt) GROUP BY bucket), "
        "tot AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM rc) AS tr, "
        "(SELECT CAST(sum(ct) AS DOUBLE) FROM tc) AS tt), "
        "jo AS (SELECT dc.doc_id, dc.bucket, dc.c, rc.cr, "
        "CAST(coalesce(tc.ct, 0) AS BIGINT) AS ct, tot.tt, tot.tr "
        "FROM dc JOIN rc USING (bucket) LEFT JOIN tc USING (bucket), tot), "
        "sc AS (SELECT doc_id, round(list_sum(list_transform("
        "list_sort(list(struct_pack(bucket := bucket, c := c, ct := ct, cr := cr))), "
        "x -> CAST(x.c AS DOUBLE) * ("
        f"ln((CAST(x.ct AS DOUBLE) + 1.0) / (tt + {bd})) - "
        f"ln((CAST(x.cr AS DOUBLE) + 1.0) / (tr + {bd}))))), 6) "
        "AS logw FROM jo GROUP BY doc_id, tt, tr), "
        f"ad AS (SELECT d.doc_id, coalesce(sc.logw, 0.0) AS logw "
        f"FROM {docs_rel} d LEFT JOIN sc USING (doc_id)), "
        "rk AS (SELECT doc_id, logw, "
        "row_number() OVER (ORDER BY logw DESC, doc_id ASC) AS pos, "
        "count(*) OVER () AS n FROM ad) "
        f"SELECT doc_id, logw, pos <= ceil({keep_frac} * n) AS selected "
        "FROM rk ORDER BY doc_id"
    )


def pack_sequences(docs: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Sequence packing — the "concatenate-and-chunk" sharding every LLM
    training run performs last: documents are laid end-to-end in a canonical
    order (doc_id ascending) and cut into fixed ``seq_len``-token training
    sequences, so each doc lands at a deterministic global token offset and
    may span several sequences (GPT-style packing; Brown et al. 2020 §2.2).

    Output, one row per document::

        (doc_id, n_tokens, offset,     -- exclusive global token offset
         first_seq, last_seq,          -- sequence ids covered (NULL if empty)
         n_seqs)                       -- sequences this doc touches

    All columns are int64 — no floats anywhere, so the result is bit-portable
    and the DuckDB twin (:func:`pack_sequences_sql`) matches by value-hash.

    Scale: token counting is a narrow projection; the global offset rides
    :func:`~trianglecounting_spark.operators.normalize.scalable_running_sum`
    (range-partitioned sort + Arrow per-partition cumsum + a ≤#partitions-row
    offset collect) — NEVER a single-task global window, which is the scale
    trap in the naive ``sum() OVER (ORDER BY doc_id)`` form the oracle uses.
    The chunk math after that is a pure narrow map. At 10¹² docs this is one
    sort shuffle, the same envelope as any distributed sort.

    No counterpart in /root/reference; the packing member of the
    LLM-training-data family (tokenize → pack → shard).
    """
    from trianglecounting_spark.functions.textstats import token_count
    from trianglecounting_spark.operators.normalize import scalable_running_sum

    counted = token_count(docs)
    summed = scalable_running_sum(
        counted,
        order=[F.col("doc_id").asc()],
        value_col="n_tokens",
        key_cols=["doc_id"],
        out_col="offset",
    )
    L = int(seq_len)
    nonempty = F.col("n_tokens") > 0
    first_seq = F.when(nonempty, F.expr(f"offset DIV {L}")).cast("long")
    last_seq = F.when(
        nonempty, F.expr(f"(offset + n_tokens - 1) DIV {L}")
    ).cast("long")
    return summed.select(
        "doc_id",
        "n_tokens",
        "offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        F.coalesce(last_seq - first_seq + F.lit(1), F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )


def pack_sequences_sql(seq_len: int = 2048, docs_rel: str = "documents") -> str:
    """DuckDB twin of :func:`pack_sequences` — the definitional single-window
    form (fine in DuckDB; the Spark plan replaces the global window with the
    distributed prefix sum)."""
    L = int(seq_len)
    return (
        f"WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all(text, "
        f"'[A-Za-z0-9'']+')) AS BIGINT) AS n_tokens FROM {docs_rel}), "
        "c AS (SELECT doc_id, n_tokens, CAST(coalesce(sum(n_tokens) OVER "
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
        "0) AS BIGINT) AS off FROM t) "
        "SELECT doc_id, n_tokens, off AS offset, "
        f"CASE WHEN n_tokens > 0 THEN off // {L} END AS first_seq, "
        f"CASE WHEN n_tokens > 0 THEN (off + n_tokens - 1) // {L} END AS last_seq, "
        f"CAST(CASE WHEN n_tokens > 0 THEN "
        f"(off + n_tokens - 1) // {L} - off // {L} + 1 ELSE 0 END "
        "AS BIGINT) AS n_seqs "
        "FROM c ORDER BY doc_id"
    )
