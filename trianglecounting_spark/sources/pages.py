"""Page→edge extraction: the Common-Crawl front door (BASELINE.json input_hint).

The reference has no text layer — this stage is our addition mandated by the
north_star: an Iceberg/parquet table of pages (url, warc_ts, html, text, lang)
becomes (a) a deterministic extracted-text column (byte-identical per url —
the per-row invariant) and (b) the canonical edge table via href extraction +
url→id dictionary encoding (the web-scale analogue of the reference's dense
renumbering, `pre_processing.h:155-197`).

Everything is Column expressions or Arrow-vectorized kernels — no per-row
Python. Extraction determinism: pure functions of the html bytes only (no
partition-order dependence), pinned by golden sha256 hashes in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Portable, deliberately simple href matcher: double-quoted hrefs only.
HREF_RE = 'href="([^"]*)"'


def extract_text(pages: DataFrame) -> DataFrame:
    """Deterministic text extraction from `html` (binary): strip tags,
    decode the few entities the fixtures use, normalize whitespace.

    Output: pages + `extracted_text` column. Byte-identical per url across
    runs/partitionings — it's a pure expression over the html bytes.
    """
    h = F.decode(F.col("html"), "UTF-8")
    no_script = F.regexp_replace(h, r"(?s)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_script, r"<[^>]*>", " ")
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&amp;", "&"), "&lt;", "<"
        ),
        "&gt;",
        ">",
    )
    text = F.trim(F.regexp_replace(unescaped, r"\s+", " "))
    return pages.withColumn("extracted_text", text)


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) pairs from every href in each page's html.

    Relative urls are resolved against the page's scheme+host; fragments and
    surrounding whitespace dropped. Output: (src_url, dst_url), one row per
    href occurrence (dedup happens at edge normalization).
    """
    h = F.decode(F.col("html"), "UTF-8")
    hrefs = F.regexp_extract_all(h, F.lit(HREF_RE), 1)
    exploded = pages.select(
        F.col("url").alias("src_url"), F.explode(hrefs).alias("href")
    )
    href = F.regexp_replace(F.trim(F.col("href")), "#.*$", "")
    base = F.regexp_extract(F.col("src_url"), r"^(https?://[^/]+)", 1)
    dst = (
        F.when(href.rlike("^https?://"), href)
        .when(href.startswith("/"), F.concat(base, href))
        .otherwise(F.concat(base, F.lit("/"), href))
    )
    return exploded.select("src_url", dst.alias("dst_url")).where(
        (F.col("dst_url").isNotNull()) & (F.col("dst_url") != "")
    )


def url_dictionary(pages: DataFrame, links: DataFrame | None = None) -> DataFrame:
    """Dictionary-encode urls → dense long ids (0..N-1), deterministic by url
    sort order. Includes link targets that have no page row (dangling urls).

    This is the analogue of the reference's old↔new vid dictionaries
    (`pre_processing.h:155-197`): a mapping table applied with joins. At
    10^12-url scale this is one range-partitioned sort + a narrow Arrow pass
    (`scalable_dense_rank`) — no single-window row_number, no per-row Python
    on the engine's front door.
    """
    from trianglecounting_spark.operators.normalize import scalable_dense_rank

    urls = pages.select(F.col("url"))
    if links is not None:
        urls = urls.unionAll(links.select(F.col("dst_url").alias("url")))
    urls = urls.distinct()
    return scalable_dense_rank(
        urls, [F.col("url").asc()], ["url"], out_col="page_id"
    ).select("url", F.col("page_id").cast("long"))


def pages_to_edges(pages: DataFrame) -> DataFrame:
    """End-to-end: pages → raw directed edge table (src, dst) of page ids.

    The full front-door pipeline: href extraction → url normalization →
    dictionary encoding → id edges. Feed to `normalize_edges` for the
    canonical simple graph.
    """
    links = extract_links(pages)
    d = url_dictionary(pages, links)
    src_d = d.select(F.col("url").alias("src_url"), F.col("page_id").alias("src"))
    dst_d = d.select(F.col("url").alias("dst_url"), F.col("page_id").alias("dst"))
    return links.join(src_d, "src_url").join(dst_d, "dst_url").select("src", "dst")


# Anchor pairs: href + inner text of the same <a> tag. Two extract_all
# passes over one pattern, zipped positionally — both engines' regex
# libraries (Java / RE2) agree on this subset.
ANCHOR_RE = '<a href="([^"]*)"[^>]*>([^<]*)</a>'


def anchor_text_terms(pages: DataFrame) -> DataFrame:
    """Per-target anchor-text term counts: ``(dst_host, term, n)``.

    Anchor text pointing AT a page is the classic off-page relevance signal
    (how the rest of the web describes the target); aggregating it per
    target host is a standard crawl-pipeline stage. Terms are
    whitespace-split, lowercased anchor words.

    Scale: one explode (bounded by anchors-per-page) + one count groupBy.
    The group key (dst_host, term) concentrates on mega-hosts exactly like
    ``host_link_graph``'s — the count agg is map-side combined, so a hot
    (host, term) cell costs one partial per partition, never a row pileup.
    """
    h = F.decode(F.col("html"), "UTF-8")
    hrefs = F.regexp_extract_all(h, F.lit(ANCHOR_RE), 1)
    texts = F.regexp_extract_all(h, F.lit(ANCHOR_RE), 2)
    pairs = pages.select(
        F.col("url").alias("src_url"),
        F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("atext"))).alias("z"),
    ).select("src_url", F.col("z.href").alias("href"), F.col("z.atext").alias("atext"))
    href = F.regexp_replace(F.trim(F.col("href")), "#.*$", "")
    base = F.regexp_extract(F.col("src_url"), r"^(https?://[^/]+)", 1)
    dst = (
        F.when(href.rlike("^https?://"), href)
        .when(href.startswith("/"), F.concat(base, href))
        .otherwise(F.concat(base, F.lit("/"), href))
    )
    terms = pairs.select(
        F.regexp_extract(dst, r"^https?://([^/]+)", 1).alias("dst_host"),
        F.explode(F.split(F.lower(F.trim(F.col("atext"))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    return terms.groupBy("dst_host", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# Tracking query params dropped by canonicalization (the standard crawl
# blocklist: analytics click-ids carry no content identity).
_TRACKING_PARAM_RE = "(?i)^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="


def canonical_url(url) -> "F.Column":
    """Canonical form of an http(s) URL, as one Column expression.

    The dedup key every crawl pipeline needs BEFORE dictionary encoding:
    distinct spellings of the same resource must collapse to one id, or the
    link graph splits vertices and every downstream count is wrong. Rules
    (each a pure regex/array expression — no per-row Python, no shuffle):

    * strip the fragment (``#...`` is client-side only);
    * lowercase scheme+host (case-insensitive per RFC 3986 §6.2.2.1), path
      case preserved (case-significant);
    * drop default ports (``:80`` for http, ``:443`` for https);
    * collapse duplicate slashes in the path and strip trailing slashes
      (empty path → ``/``);
    * drop tracking query params (``utm_*``/``fbclid``/``gclid``/
      ``msclkid``/``ref``) and sort the survivors (param order is not
      identity), dropping ``?`` entirely if none survive.

    Non-http(s) strings pass through trimmed + fragment-stripped (mailto:,
    javascript: etc. are not graph urls; the caller filters them).
    Idempotent: canonical_url(canonical_url(u)) == canonical_url(u)
    (pinned in tests). Scale: narrow map over the scan — cost O(rows), no
    exchange, pushes past any downstream filter.
    """
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    is_http = u.rlike("(?i)^https?://")
    sh = F.lower(F.regexp_extract(u, r"(?i)^(https?://[^/?]+)", 1))
    sh = F.regexp_replace(sh, r"^(http://[^/:]+):80$", "$1")
    sh = F.regexp_replace(sh, r"^(https://[^/:]+):443$", "$1")
    rest = F.regexp_replace(u, r"(?i)^https?://[^/?]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    qparts = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(qparts), "&")
    canon = F.concat(
        sh, path, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    )
    return F.when(is_http, canon).otherwise(u)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    """``df`` + a ``canonical_url`` column (see :func:`canonical_url`)."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` over the SQL expression ``expr``.

    Same rule set; DuckDB spellings (``\\1`` backrefs, explicit ``'g'`` flag
    where all occurrences matter, list_filter/list_sort lambdas for the
    query-param set).
    """
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    sh = (
        f"regexp_replace(regexp_replace("
        f"lower(regexp_extract({u}, '(?i)^(https?://[^/?]+)', 1)), "
        f"'^(http://[^/:]+):80$', '\\1'), '^(https://[^/:]+):443$', '\\1')"
    )
    rest = f"regexp_replace({u}, '(?i)^https?://[^/?]+', '')"
    path = (
        f"regexp_replace(regexp_replace("
        f"regexp_extract({rest}, '^([^?]*)', 1), '/{{2,}}', '/', 'g'), "
        f"'/+$', '')"
    )
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    qs = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_PARAM_RE}'))), '&')"
    )
    canon = f"({sh} || {path} || CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END)"
    return (
        f"CASE WHEN regexp_matches({u}, '(?i)^https?://') THEN {canon} "
        f"ELSE {u} END"
    )


def host_link_graph(pages: DataFrame) -> DataFrame:
    """Host-level rollup of the hyperlink graph: (src_host, dst_host,
    n_links) with n_links the number of href occurrences between the hosts —
    the standard web-graph aggregation (host graphs are 2-3 orders smaller
    than page graphs and drive site-level PageRank/spam scoring).

    Scale: one groupBy on the host pair; hosts are the canonical
    heavy-hitter keys but the count aggregate is map-side combined, so a
    mega-host costs one partial per partition, never a hot-key row pileup.
    """
    links = extract_links(pages)

    def host(c: str):
        return F.regexp_extract(F.col(c), r"^https?://([^/]+)", 1)

    return (
        links.select(host("src_url").alias("src_host"), host("dst_url").alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


def host_weighted_edges(pages: DataFrame) -> DataFrame:
    """Undirected weighted host graph ``(u, v, w)`` for site-level PageRank:
    the host rollup with self-host links dropped (intra-site navigation is
    noise for importance) and the two directions merged by lexicographic
    canonicalization — ``w`` sums the link multiplicities of both
    directions. Feeds ``operators.pagerank.pagerank_weighted`` directly;
    hosts stay strings end-to-end (the weighted walk never needs integer
    ids, and skipping the dictionary keeps the composition one shuffle
    shorter)."""
    hg = host_link_graph(pages).where(F.col("src_host") != F.col("dst_host"))
    return (
        hg.select(
            F.least("src_host", "dst_host").alias("u"),
            F.greatest("src_host", "dst_host").alias("v"),
            F.col("n_links").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
    )


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """Snapshot consolidation — the per-URL latest-capture dedup every
    Common-Crawl-style corpus performs before anything else: a crawl table
    holds MANY captures of the same url at different ``warc_ts`` (the input
    contract's timestamp column exists precisely for this), and downstream
    stages want exactly one row per url — the newest — plus churn statistics
    (how often was it re-crawled, did its text actually change).

    Output, one row per distinct url::

        (url,
         n_captures,     -- captures observed           (int64)
         n_versions,     -- DISTINCT text fingerprints  (int64)
         latest_epoch,   -- epoch seconds of max(warc_ts), int64
         latest_fp)      -- md5 of the newest capture's text

    ``n_versions > 1`` is the "content churned" signal; ``n_captures -
    n_versions`` captures are byte-identical re-crawls a training corpus
    drops for free.

    Scale: ONE url-keyed hash aggregate — count / max / ``max_by`` are all
    map-side combinable, and the exact distinct runs per key (never a global
    distinct). No window, no per-url capture collection: a url with 10⁵
    captures costs only its own aggregate buffer. At 10¹² rows this is the
    same single-shuffle envelope as any groupBy, and AQE's skew split
    handles hot urls. ``max_by`` is deterministic here because ``warc_ts``
    is unique per url within a crawl table (WARC records are
    timestamp-keyed); ties would need a (warc_ts, fp) struct-max instead.

    No counterpart in /root/reference (no text layer); the snapshot member
    of the web-corpus family (north_star's Common-Crawl framing).
    """
    fp = F.md5(F.col("text"))
    return pages.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.countDistinct(fp).cast("long").alias("n_versions"),
        F.unix_timestamp(F.max("warc_ts")).cast("long").alias("latest_epoch"),
        F.max_by(fp, F.col("warc_ts")).alias("latest_fp"),
    )


def latest_snapshot_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`latest_snapshot` over the same captures
    relation (columns url, warc_ts, text)."""
    return (
        f"WITH snap_p AS ({pages_sql}) "
        "SELECT url, CAST(count(*) AS BIGINT) AS n_captures, "
        "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_versions, "
        "CAST(epoch(max(warc_ts)) AS BIGINT) AS latest_epoch, "
        "arg_max(md5(text), warc_ts) AS latest_fp "
        "FROM snap_p GROUP BY url"
    )
