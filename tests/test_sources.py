"""Source readers (S1-S6) and the page→edge front door."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from trianglecounting_spark.operators.normalize import normalize_edges
from trianglecounting_spark.operators.triangles import triangle_count_sql
from trianglecounting_spark.sources import generators as g
from trianglecounting_spark.sources import fixtures as fx
from trianglecounting_spark.sources import pages as pg
from trianglecounting_spark.sources.readers import (
    read_edges_binary_pairs,
    read_edges_metis,
    read_edges_tsv,
    read_edges_yche_bin,
    write_edges_binary_pairs,
    write_edges_yche_bin,
)


def _clean(df):
    return sorted((r.u, r.v) for r in normalize_edges(df).collect())


def test_binary_pairs_roundtrip(spark, tmp_path):
    """S1/S6: write the canonical edge list as raw uint32 pairs, read it back
    (the reference's .bin contract: edge count from file size)."""
    e = g.two_cliques_bridge(spark)
    out = str(tmp_path / "pairs")
    write_edges_binary_pairs(e, out)
    back = read_edges_binary_pairs(spark, out)
    assert _clean(back) == sorted((r.u, r.v) for r in e.collect())
    assert triangle_count_sql(normalize_edges(back)).collect()[0].triangles == 40


def test_yche_bin_roundtrip_byte_exact(spark, tmp_path):
    """S5: the reference's count-prefixed undir_edge_list.bin
    (yche_serialization.h:53-58): uint64 count header + int32 pairs. The
    reader must skip the header (raw-pair decoding would shift every edge by
    8 bytes) and the writer must reproduce the format byte-for-byte."""
    import numpy as np

    # synthesize a count-prefixed file exactly as yche_serialization writes it
    pairs = np.array([[0, 1], [0, 2], [1, 2], [2, 3]], dtype="<i4")
    ref_file = tmp_path / "undir_edge_list.bin"
    with open(ref_file, "wb") as f:
        f.write(np.uint64(len(pairs)).tobytes())
        f.write(pairs.tobytes())
    got = sorted((r.src, r.dst) for r in read_edges_yche_bin(spark, str(ref_file)).collect())
    assert got == [(0, 1), (0, 2), (1, 2), (2, 3)]

    # byte-exact round trip through the single-file writer
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 2), (2, 3)], "u long, v long")
    out_file = tmp_path / "out.bin"
    assert write_edges_yche_bin(e.orderBy("u", "v"), str(out_file)) == 4
    assert out_file.read_bytes() == ref_file.read_bytes()

    # a headerless raw-pair file must fail loudly, not decode shifted garbage
    raw_file = tmp_path / "raw.bin"
    raw_file.write_bytes(pairs.tobytes())
    import pytest

    with pytest.raises(Exception):
        read_edges_yche_bin(spark, str(raw_file)).collect()


def test_metis_reader(spark, tmp_path):
    """S3: METIS header + 1-based adjacency lines; two_cliques_bridge-like
    tiny graph: triangle on {1,2,3} plus pendant 4 (1-based)."""
    metis = tmp_path / "g.metis"
    metis.write_text("% comment\n4 4\n2 3 4\n1 3\n1 2\n1\n")
    e = read_edges_metis(spark, str(metis))
    got = _clean(e)
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2)]
    assert triangle_count_sql(normalize_edges(e)).collect()[0].triangles == 1


def test_tsv_reader(spark, tmp_path):
    tsv = tmp_path / "g.tsv"
    tsv.write_text("0\t1\t1.0\n1\t2\t1.0\n0\t2\t1.0\n2\t3\t0.5\n")
    e = read_edges_tsv(spark, str(tsv))
    assert triangle_count_sql(normalize_edges(e)).collect()[0].triangles == 1


def test_extract_text_deterministic_golden(spark):
    """Byte-identical extracted text per url (input_hint invariant): golden
    sha256 for fixed fixture pages, stable across partitionings."""
    pages = fx.synth_pages(spark, n=50, out_deg=2)
    rows = pg.extract_text(pages).select("url", "extracted_text").collect()
    by_url = {r.url: hashlib.sha256(r.extracted_text.encode()).hexdigest() for r in rows}
    rows2 = (
        pg.extract_text(pages.repartition(7)).select("url", "extracted_text").collect()
    )
    by_url2 = {r.url: hashlib.sha256(r.extracted_text.encode()).hexdigest() for r in rows2}
    assert by_url == by_url2
    # golden: page 0's body text is fully deterministic
    p0 = [r for r in rows if r.url.endswith("/page/0")][0]
    assert p0.extracted_text == (
        "p0 Page 0 of site 0. The quick brown fox jumps over the lazy dog 0. link link"
    )


def test_extract_links_matches_closed_form(spark):
    pages = fx.synth_pages(spark, n=100, out_deg=3)
    got = sorted(
        (r.src_url, r.dst_url) for r in pg.extract_links(pages).collect()
    )
    want = sorted(
        (r.src_url, r.dst_url)
        for r in fx.expected_link_id_edges(spark, n=100, out_deg=3).collect()
    )
    assert got == want


def test_pages_to_edges_end_to_end(spark):
    """Full front door: pages → ids → normalized simple graph; edge count
    bounded by n*out_deg, ids dense in [0, n)."""
    pages = fx.synth_pages(spark, n=100, out_deg=3)
    raw = pg.pages_to_edges(pages)
    assert raw.count() == 300
    ids = raw.select(F.explode(F.array("src", "dst")).alias("i"))
    assert ids.agg(F.max("i")).collect()[0][0] <= 99
    e = normalize_edges(raw, "src", "dst")
    assert 0 < e.count() <= 300


def test_url_dictionary_dense_and_deterministic(spark):
    pages = fx.synth_pages(spark, n=64, out_deg=2)
    d1 = {r.url: r.page_id for r in pg.url_dictionary(pages).collect()}
    d2 = {r.url: r.page_id for r in pg.url_dictionary(pages.repartition(5)).collect()}
    assert d1 == d2
    assert sorted(d1.values()) == list(range(64))
    # sorted-url order
    assert [u for u, _ in sorted(d1.items(), key=lambda kv: kv[1])] == sorted(d1)


def test_binary_sinks_reject_out_of_range_ids(spark, tmp_path):
    """Ids past the target dtype must raise instead of silently wrapping and
    corrupting the interchange file handed to the reference tooling."""
    from trianglecounting_spark.sources.readers import (
        write_edges_binary_pairs,
        write_edges_yche_bin,
    )

    big = spark.createDataFrame([(1, 2**31 + 5)], "u long, v long")
    with pytest.raises(Exception, match="range"):
        write_edges_yche_bin(big, str(tmp_path / "y.bin"))
    try:
        write_edges_binary_pairs(big, str(tmp_path / "shards"))
        raise AssertionError("expected the u4 range check to fire")
    except Exception as exc:  # Spark wraps the executor-side ValueError
        assert "range" in str(exc)


def test_anchor_text_terms(spark):
    """Handcrafted html: multi-word anchors split to lowered terms, relative
    hrefs resolve against the page host, empty anchors drop out."""
    rows = [
        (
            "https://alpha.example/p1",
            b'<html><a href="https://beta.example/x">Great Site</a>'
            b'<a href="/local">home page</a>'
            b'<a href="https://beta.example/y"></a></html>',
        ),
        (
            "https://gamma.example/p2",
            b'<html><a href="https://beta.example/z">great</a></html>',
        ),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        (r.dst_host, r.term): r.n for r in pg.anchor_text_terms(pages).collect()
    }
    assert got == {
        ("beta.example", "great"): 2,
        ("beta.example", "site"): 1,
        ("alpha.example", "home"): 1,
        ("alpha.example", "page"): 1,
    }


def test_host_weighted_edges_merges_directions_and_drops_self(spark):
    from trianglecounting_spark.sources.pages import host_weighted_edges

    rows = [
        # a.example -> b.example twice, b -> a once => merged w=3
        (0, "https://a.example/1",
         '<a href="https://b.example/x">l</a> <a href="https://b.example/y">l</a>'),
        (1, "https://b.example/2", '<a href="https://a.example/z">l</a>'),
        # self-host link: dropped
        (2, "https://a.example/3", '<a href="https://a.example/4">l</a>'),
        # c -> a once
        (3, "https://c.example/1", '<a href="https://a.example/5">l</a>'),
    ]
    pages = spark.createDataFrame(
        [(i, u, h.encode()) for i, u, h in rows],
        "doc_id long, url string, html binary",
    )
    got = {(r.u, r.v): r.w for r in host_weighted_edges(pages).collect()}
    assert got == {("a.example", "b.example"): 3, ("a.example", "c.example"): 1}


def test_synth_corpus_planted_structure_and_determinism(spark):
    """The scale-bench corpus generator must reproduce its planted dups
    exactly (bench_corpus asserts on them) and be partition-invariant."""
    from pyspark.sql import functions as F

    from trianglecounting_spark.sources.generators import synth_corpus

    d = synth_corpus(spark, 400).cache()
    texts = {r.doc_id: r.text for r in d.collect()}
    assert len(texts) == 400
    # exact dup: id%100==7 is byte-identical to id-7
    assert texts[7] == texts[0] and texts[107] == texts[100]
    # near dup: id%100==8 is id-8 plus one unique trailing token
    assert texts[8] == texts[0] + " unique8"
    assert texts[108] == texts[100] + " unique108"
    # everything else distinct from its block seed
    assert texts[1] != texts[0] and texts[9] != texts[0]
    # lengths in the documented 30..200 word band (+1 for the near-dup tail)
    for i in (0, 1, 50, 399):
        assert 30 <= len(texts[i].split()) <= 201
    # partition-invariant content (no RNG, pure hash streams)
    agg = lambda df: df.agg(
        F.sum(F.crc32(F.concat_ws("|", F.col("doc_id").cast("string"), "text")))
    ).collect()[0][0]
    assert agg(d.repartition(7)) == agg(d.repartition(2))
    d.unpersist()
