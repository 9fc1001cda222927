"""Text analysis, dedup, similarity, multimodal — training-data pipeline ops."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trianglecounting_spark.functions import dedup as dd
from trianglecounting_spark.functions import multimodal as mm
from trianglecounting_spark.functions import similarity as sim
from trianglecounting_spark.functions import textstats as ts


def _docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog."),
        (1, "The quick brown fox jumps over the lazy dog."),  # exact dup of 0
        (2, "The quick brown fox jumps  over the lazy dog. "),  # ws-normalized dup
        (3, "A completely different document about Spark engines."),
        (4, "the and of to in is that for it with"),  # all stopwords
        (5, "der die und das ist nicht von mit den ein"),  # german
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark):
    got = {r.doc_id: r.n_tokens for r in ts.token_count(_docs(spark)).collect()}
    assert got[0] == 9
    assert got[4] == 10


def test_quality_score_ratios(spark):
    got = {r.doc_id: r for r in ts.quality_score(_docs(spark)).collect()}
    assert got[4].stop_ratio == 1.0
    assert got[5].stop_ratio == 0.0
    assert got[0].punct_ratio > 0
    assert got[0].n_words == 9


def test_language_id(spark):
    got = {r.doc_id: r.lang_pred for r in ts.language_id(_docs(spark)).collect()}
    assert got[4] == "en"
    assert got[5] == "de"
    assert got[3] == "und" or got[3] == "en"  # 'about' has no stopwords; 'a' not in list


def test_exact_dedup_groups(spark):
    groups = dd.exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 3  # 0, 1, 2 normalize to the same bytes
    assert groups[0].keep_id == 0


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(_docs(spark)).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert (0, 3) not in pairs


def test_simhash_near_dups_close(spark):
    h = {r.doc_id: r.simhash for r in dd.simhash(_docs(spark)).collect()}
    assert h[0] == h[1] == h[2]  # identical token sets
    assert bin(h[0] ^ h[3]).count("1") > 4


def test_ngram_jaccard(spark):
    j = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_all_pairs(_docs(spark), k=5, min_jaccard=0.0).collect()
    }
    assert math.isclose(j[(0, 1)], 1.0)
    assert j[(0, 2)] == 1.0  # whitespace-normalized identical
    assert j.get((0, 3), 0.0) < 0.2


def _embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 8))
    rows = []
    for i in range(10):
        rows.append((i, [float(x) for x in base[i]]))
    # 10+i = slightly perturbed copy of i (nearest neighbor by construction)
    for i in range(10):
        rows.append((10 + i, [float(x) for x in base[i] + 0.01 * rng.normal(size=8)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(spark):
    e = _embeddings(spark)
    top1 = {
        r.vec_id: r.nbr_id
        for r in sim.cosine_topk(e, k=1).collect()
    }
    for i in range(10):
        assert top1[i] == 10 + i
        assert top1[10 + i] == i


def test_cosine_kernel_matches_sql_plan(spark):
    e = _embeddings(spark)
    a = sorted(map(tuple, sim.cosine_topk(e, k=3).collect()))
    b = sorted(map(tuple, sim.cosine_topk_kernel(e, k=3).collect()))
    assert a == b


def test_ann_lsh_recall_at_1(spark):
    e = _embeddings(spark)
    exact = {r.vec_id: r.nbr_id for r in sim.cosine_topk(e, k=1).collect()}
    approx = {
        r.vec_id: r.nbr_id
        for r in sim.ann_lsh_topk(e, dim=8, k=1, n_planes=2).collect()
    }
    hits = sum(1 for v, n in approx.items() if exact.get(v) == n)
    assert hits / len(exact) >= 0.5  # twin pairs nearly always share buckets


def test_multimodal_image_features(spark):
    rows = [(i, mm.encode_fake_image(16, 8, seed=i)) for i in range(5)]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    feats = {r.media_id: r for r in mm.image_features(media).collect()}
    assert len(feats) == 5
    assert feats[0].width == 16 and feats[0].height == 8
    assert 0 <= feats[0].mean_px <= 255


def test_multimodal_resize_and_video(spark):
    rows = [(0, mm.encode_fake_image(16, 16, seed=1))]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    small = mm.image_resize(media, 4, 4).collect()[0]
    w, h, px = mm._decode_image(bytes(small.blob), "fake")
    assert (w, h) == (4, 4) and len(px) == 16

    video = b"".join(mm.encode_fake_image(4, 4, seed=s) for s in range(6))
    vmedia = spark.createDataFrame([(0, video)], "media_id long, blob binary")
    frames = mm.frame_sample(vmedia, every_n=2).collect()
    assert [f.frame_idx for f in frames] == [0, 2, 4]


def test_multimodal_real_decoder_stubbed(spark):
    rows = [(0, mm.encode_fake_image(4, 4, seed=1))]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        mm.image_features(media, decoder="real").collect()


def test_audio_features(spark):
    rows = [(0, mm.encode_fake_audio(16000, 1000, seed=3))]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    f = mm.audio_features(media).collect()[0]
    assert f.sample_rate == 16000 and f.n_samples == 1000 and f.rms > 0


def test_winnowing_guarantee_and_determinism(spark):
    """Winnowing's core guarantee (Schleimer et al. §2): two documents sharing
    a substring of length >= w + k - 1 share at least one fingerprint. Plus
    partitioning-determinism."""
    from trianglecounting_spark.functions.textstats import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, "AAA " + shared + " BBB ending part one"),
            (2, "CCC different head text " + shared + " DDD"),
            (3, "zyxw vuts rqpo nmlk jihg fedc ba98 7654 3210 qwer asdf"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=8, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "docs sharing a long substring must share a fingerprint"
    # doc 3 shares nothing that long with doc 1
    assert len(by_doc[3] & by_doc[1]) == 0
    again = winnow_fingerprints(docs.repartition(5), k=8, w=4)
    assert sorted(map(tuple, fps.collect())) == sorted(map(tuple, again.collect()))


def test_triangle_count_approx_unbiased_form(spark):
    from trianglecounting_spark.operators.triangles import triangle_count_approx
    from trianglecounting_spark.sources import generators as g

    e = g.complete_graph(spark, 12)  # C(12,3) = 220
    # p_inv=1 keeps every edge: the estimate IS the exact count
    r = triangle_count_approx(e, p_inv=1).collect()[0]
    assert r.triangles_est == 220 == r.sampled_triangles
    # p_inv=2: deterministic sample, estimate = 8 x sampled count
    r2 = triangle_count_approx(e, p_inv=2).collect()[0]
    assert r2.triangles_est == 8 * r2.sampled_triangles
    r2b = triangle_count_approx(e.repartition(7), p_inv=2).collect()[0]
    assert (r2.triangles_est, r2.sampled_triangles) == (r2b.triangles_est, r2b.sampled_triangles)


def test_ann_hot_bucket_salt_split(spark):
    """Adversarial same-bucket input (identical vectors — they collide under
    EVERY hyperplane, so no re-projection can split them): the salt split must
    bound every (bucket, salt) group near bucket_cap so no task's self-join
    emits O(n²) pairs, and the capped top-k must match the rule's closed form
    (identical vectors ⇒ sim 1.0 everywhere ⇒ top-k = smallest other ids
    within the member's salt group)."""
    n, cap, n_planes, seed = 2000, 100, 6, 42
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0) for _ in range(8)]).alias("embedding"),
    )
    bucketed = sim.srp_bucket(emb, dim=8, n_planes=n_planes, seed=seed)
    salted = sim._salted(bucketed, cap, seed)
    sizes = [r["c"] for r in salted.groupBy("bucket", "salt").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    assert len(sizes) >= n // cap          # the flood actually split
    assert max(sizes) <= 2 * cap           # ≈cap with universal-hash slack

    out = sim.ann_lsh_topk(
        emb, dim=8, k=3, n_planes=n_planes, seed=seed, tables=2, bucket_cap=cap
    ).collect()
    # closed form of the capped rule (same salt hash, nsplit = ceil(n/cap))
    nsplit = -(-n // cap)
    groups: dict[int, list[int]] = {}
    for v in range(n):
        groups.setdefault(
            ((v % sim._CAP_M) * sim._CAP_A + seed) % sim._CAP_M % nsplit, []
        ).append(v)
    expected = {}
    for members in groups.values():
        for v in members:
            expected[v] = sorted(m for m in members if m != v)[:3]
    got: dict[int, list[int]] = {}
    for r in sorted(out, key=lambda r: (r.vec_id, r.rnk)):
        got.setdefault(r.vec_id, []).append(r.nbr_id)
        assert r.sim == 1.0
    assert got == {v: e for v, e in expected.items() if e}


def test_ann_cap_inactive_below_threshold(spark):
    """Below the cap every salt is 0 — results identical to the uncapped
    join (the default-cap driver oracle stays hash-green)."""
    e = _embeddings(spark)
    capped = sorted(map(tuple, sim.ann_lsh_topk(
        e, dim=8, k=2, n_planes=2, bucket_cap=100).collect()))
    uncapped = sorted(map(tuple, sim.ann_lsh_topk(
        e, dim=8, k=2, n_planes=2, bucket_cap=10**9).collect()))
    assert capped == uncapped


def test_bmp_decode_roundtrip_and_real_image_features(spark):
    """decoder="real" is REAL for uncompressed BMP: a 24-bit r=g=b fixture
    round-trips bit-exactly (integer luma of r=g=b is the pixel itself), and
    the Spark feature kernel runs the same path."""
    import numpy as np

    blob = mm.encode_bmp_gray(13, 7, seed=3)  # odd width exercises row padding
    w, h, px = mm.decode_bmp(blob)
    assert (w, h) == (13, 7)
    rng = np.random.default_rng(3)
    expected = rng.integers(0, 256, size=(7, 13), dtype=np.uint8)
    assert (px.reshape(7, 13) == expected).all()

    media = spark.createDataFrame(
        [(i, mm.encode_bmp_gray(13, 7, seed=i)) for i in range(3)],
        "media_id long, blob binary",
    )
    feats = {r.media_id: r for r in mm.image_features(media, decoder="real").collect()}
    assert len(feats) == 3
    assert feats[0].width == 13 and feats[0].height == 7
    expected0 = np.random.default_rng(0).integers(0, 256, size=(7, 13), dtype=np.uint8)
    assert abs(feats[0].mean_px - round(float(expected0.mean()), 6)) < 1e-9


def test_bmp_8bit_palette_decode():
    """8-bit palette BMPs decode through the palette's integer luma."""
    import struct

    import numpy as np

    w, h = 5, 2
    idx = np.array([[0, 1, 2, 1, 0], [2, 2, 1, 0, 0]], dtype=np.uint8)
    pal = b""  # BGRA entries: gray 10, 20, 30
    for v in (10, 20, 30):
        pal += bytes([v, v, v, 0])
    pal += bytes(4 * 253)  # pad palette to 256 entries
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = idx
    body = rows[::-1].tobytes()
    data_off = 14 + 40 + 256 * 4
    blob = (
        b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
        + pal + body
    )
    dw, dh, px = mm.decode_bmp(blob)
    assert (dw, dh) == (w, h)
    assert (px.reshape(h, w) == idx * 10 + 10).all()


def test_wav_decode_and_real_audio_features(spark):
    """decoder="real" is REAL for 16-bit PCM WAV (mono and stereo: channel 0),
    and compressed blobs still raise toward the library boundary."""
    import numpy as np
    import pytest

    blob = mm.encode_wav_pcm16(8000, 64, seed=5)
    sr, samples = mm.decode_wav(blob)
    assert sr == 8000 and len(samples) == 64
    stereo = mm.encode_wav_pcm16(16000, 32, seed=6, channels=2)
    sr2, s2 = mm.decode_wav(stereo)
    assert sr2 == 16000 and len(s2) == 32

    media = spark.createDataFrame(
        [(0, blob)], "media_id long, blob binary"
    )
    row = mm.audio_features(media, decoder="real").collect()[0]
    assert row.sample_rate == 8000 and row.n_samples == 64
    exp = np.frombuffer(blob[44:], dtype="<i2").astype(np.float64)
    assert abs(row.rms - round(float(np.sqrt((exp ** 2).mean())), 6)) < 1e-9

    with pytest.raises(Exception, match="PIL|opencv"):
        mm._decode_image(b"\x89PNG\r\n\x1a\n....", "real")
    with pytest.raises(Exception, match="ffmpeg"):
        mm._decode_audio(b"ID3\x04....", "real")


def test_dedup_clusters_chain_closure(spark):
    """Near-dup similarity is not transitive: A~B and B~C must still land in
    ONE cluster with the minimum id kept, and unrelated docs keep
    themselves."""
    docs = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            (11, "the quick brown fox jumps over the lazy dog again and AGAIN!"),
            (12, "the quick brown fox jumps over the lazy dog AGAIN and AGAIN!!"),
            (30, "completely unrelated text about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.keep_id for r in dd.dedup_clusters(docs).collect()}
    assert got[30] == 30
    assert got[10] == 10
    # 11 and 12 reach 10 through the chain even if (10,12) never paired
    assert got[11] == 10 and got[12] == 10


def test_ngram_dup_ratio_known_values(spark):
    """Hand-checkable repetition ratios, incl. the <n-token degenerate doc."""
    from trianglecounting_spark.functions.textstats import ngram_dup_ratio

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b"),   # 3-grams: abc bca cab abc bca cab → 6 total, 3 distinct
            (1, "x y z w"),           # xyz yzw → 2 total, 2 distinct, ratio 0
            (2, "hi"),                # < 3 tokens → 0 ngrams, ratio 0
            (3, "go go go go"),       # gogogo ×2... 2 total, 1 distinct
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ngram_dup_ratio(docs, n=3).collect()}
    assert (rows[0].n_ngrams, rows[0].n_distinct) == (6, 3)
    assert rows[0].dup_ratio == 0.5
    assert (rows[1].n_ngrams, rows[1].dup_ratio) == (2, 0.0)
    assert (rows[2].n_ngrams, rows[2].dup_ratio) == (0, 0.0)
    assert (rows[3].n_ngrams, rows[3].n_distinct) == (2, 1)


def test_ngram_top_dups_degenerate_repeated_corpus(spark):
    """Skew shape: one boilerplate phrase repeated across the whole corpus
    (the hot-key case the salted count exists for) — the top-1 n-gram is the
    boilerplate with the exact corpus-wide occurrence count."""
    from trianglecounting_spark.functions.textstats import ngram_top_dups

    boiler = "click here to accept cookies"
    docs = spark.createDataFrame(
        [(i, f"doc {i} body text {boiler}") for i in range(200)]
        + [(1000, "completely unique content nothing repeated")],
        "doc_id long, text string",
    )
    top = ngram_top_dups(docs, n=3, top=5, salts=8).collect()
    assert top[0].ngram == "click here to" or top[0].cnt == 200
    # every returned n-gram is genuinely duplicated and sorted by count desc
    assert all(r.cnt > 1 for r in top)
    assert [r.cnt for r in top] == sorted([r.cnt for r in top], reverse=True)
    # the boilerplate's own 3-grams each appear exactly 200 times
    boiler_grams = {r.ngram for r in top if r.cnt == 200}
    assert "here to accept" in boiler_grams


def test_tfidf_top_terms_hand_values(spark):
    import math

    from trianglecounting_spark.functions.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"),
         (2, "cherry cherry cherry durian")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: apple tf=2 df=1 dominates (2·ln3); banana second
    assert [r.term for r in by_doc[0]] == ["apple", "banana"]
    assert by_doc[0][0].score == round(2 * math.log(3 / 1), 6)
    # doc 2: cherry 3·ln(3/2)=1.216... beats durian 1·ln(3)=1.098...
    assert [r.term for r in by_doc[2]] == ["cherry", "durian"]
    assert by_doc[2][0].score == round(3 * math.log(3 / 2), 6)
    assert all(len(v) <= 2 for v in by_doc.values())


def test_duplicated_spans_boilerplate_detection(spark):
    """Substring dedup (Lee et al. 2022 style): the shared boilerplate
    sentence is detected in every carrier doc; the unique doc reports zero
    duplicated fingerprints; positions fall inside the boilerplate region."""
    from trianglecounting_spark.functions.textstats import (
        duplicated_span_stats,
        duplicated_spans,
    )

    boiler = "subscribe to our newsletter and accept all cookies to continue reading this site"
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique tail alpha bravo charlie delta echo foxtrot"),
            (2, "some original head text here " + boiler),
            (3, "entirely original content with no repeated sentences at all xyz"),
        ],
        "doc_id long, text string",
    )
    k, w = 20, 8
    stats = {r.doc_id: r for r in duplicated_span_stats(docs, k=k, w=w).collect()}
    assert stats[1].n_dup_fps > 0 and stats[2].n_dup_fps > 0
    assert stats[3].n_dup_fps == 0 and stats[3].dup_span_ratio == 0.0
    assert 0 < stats[1].dup_span_ratio < 1.0
    # every duplicated position in doc 2 must lie inside the boilerplate span
    # (1-based normalized positions; boiler starts at len(head)+1)
    head = "some original head text here "
    spans2 = [r.fp_pos for r in duplicated_spans(docs, k=k, w=w).collect() if r.doc_id == 2]
    assert spans2, "carrier doc must surface duplicated spans"
    for pos in spans2:
        assert len(head) + 1 <= pos <= len(head) + len(boiler) - k + 1


def test_mask_duplicated_spans_merges_intervals(spark):
    """The masking plan merges overlapping/adjacent duplicated-fingerprint
    intervals into maximal spans covering the shared region."""
    from trianglecounting_spark.functions.textstats import mask_duplicated_spans

    boiler = "this exact legal disclaimer paragraph appears verbatim on every single page of the site"
    docs = spark.createDataFrame(
        [
            (1, boiler),
            (2, boiler),
            (3, "totally different words that never repeat anywhere else zzz"),
        ],
        "doc_id long, text string",
    )
    k, w = 20, 8
    out = {}
    for r in mask_duplicated_spans(docs, k=k, w=w).collect():
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert 3 not in out
    for d in (1, 2):
        ivs = sorted(out[d])
        # intervals are disjoint and non-adjacent after merging
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert s2 > e1 + 1
        # identical docs: the merged mask covers the winnow-guaranteed core
        # (every position selected by some window is inside the doc)
        assert ivs[0][0] >= 1 and ivs[-1][1] <= len(boiler)
        assert sum(e - s + 1 for s, e in ivs) >= len(boiler) // 2
    assert out[1] == out[2]


def test_duplicated_spans_hot_fp_skew(spark):
    """Boilerplate present in EVERY doc — the hottest possible fingerprint
    key — still aggregates correctly (the doc-distinct projection bounds the
    group, the count is map-side combined)."""
    from trianglecounting_spark.functions.textstats import duplicated_span_stats

    boiler = "identical cookie banner text shared across the whole crawl every page"
    rows = [(i, f"page {i} head words " + boiler) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    stats = duplicated_span_stats(docs, k=20, w=8).collect()
    assert len(stats) == 200
    assert all(r.n_dup_fps > 0 for r in stats)
    # partitioning-invariance of the whole aggregate
    again = duplicated_span_stats(docs.repartition(3), k=20, w=8).collect()
    assert sorted(map(tuple, stats)) == sorted(map(tuple, again))


def test_remove_duplicated_spans_rewrite(spark):
    """Detect → mask → REMOVE: the shared boilerplate is cut from the
    normalized text up to the winnowing boundary slack (the first selected
    fingerprint can start up to w-1 positions into a match and the last ends
    up to w-1 before it, so ≤ ~w+k chars may survive at each edge — exact
    boundaries are the suffix-array method's advantage; the candidate set
    here is distributable and oracle-expressible). Unique docs pass through
    byte-identical; identical carriers rewrite identically."""
    from trianglecounting_spark.functions.textstats import remove_duplicated_spans

    k, w = 20, 8
    boiler = (
        "this exact legal disclaimer paragraph appears verbatim on every "
        "single page of the site and should be stripped before training"
    )
    docs = spark.createDataFrame(
        [
            (1, "Head  text UNIQUE one " + boiler + " tail words here x"),
            (2, boiler + " completely different ending for document two"),
            (3, "no duplication at all in this one zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, k=k, w=w).collect()}
    # untouched doc: byte-identical normalized text, zero removed
    assert out[3].n_removed_chars == 0
    assert out[3].clean_text == "no duplication at all in this one zzz qqq www"
    # carriers: the bulk of the boilerplate is gone (≥ len - 2·(w+k) chars
    # removed) and the unique halves survive verbatim
    for d in (1, 2):
        assert out[d].n_removed_chars >= len(boiler) - 2 * (w + k)
    assert "head text unique one" in out[1].clean_text
    assert "tail words here x" in out[1].clean_text
    assert "completely different ending for document two" in out[2].clean_text
    assert "disclaimer" not in out[1].clean_text
    assert "disclaimer" not in out[2].clean_text
    # partitioning invariance
    again = {
        r.doc_id: r
        for r in remove_duplicated_spans(docs.repartition(5), k=k, w=w).collect()
    }
    assert {d: (r.clean_text, r.n_removed_chars) for d, r in out.items()} == {
        d: (r.clean_text, r.n_removed_chars) for d, r in again.items()
    }


def test_pii_scrub_counts_and_redaction(spark):
    from trianglecounting_spark.functions.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo-bar.example.org and d@e.io, call +44-123-4567 now"),
            (2, "no pii here at all"),
            (3, "broken@ not-an-email @nor.this +1-12-345 (bad phone shapes)"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones) == (2, 1)
    assert (out[2].n_emails, out[2].n_phones) == (0, 0)
    assert (out[3].n_emails, out[3].n_phones) == (0, 0)
    # redaction changes the fingerprint iff something matched
    import hashlib

    assert out[2].scrubbed_fp == hashlib.md5(b"no pii here at all").hexdigest()
    assert out[1].scrubbed_fp == hashlib.md5(
        b"mail [EMAIL] and [EMAIL], call [PHONE] now"
    ).hexdigest()


def test_host_link_graph_rollup(spark):
    from trianglecounting_spark.sources.pages import host_link_graph

    def page(url, hrefs):
        html = "<html><body>" + "".join(f'<a href="{h}">x</a>' for h in hrefs) + "</body></html>"
        return (url, html.encode())

    pages = spark.createDataFrame(
        [
            page("https://a.example/p1", ["https://b.example/x", "https://b.example/y", "/local"]),
            page("https://a.example/p2", ["https://b.example/x"]),
            page("https://b.example/q", ["https://a.example/z"]),
        ],
        "url string, html binary",
    )
    got = {(r.src_host, r.dst_host): r.n_links for r in host_link_graph(pages).collect()}
    assert got == {
        ("a.example", "b.example"): 3,
        ("a.example", "a.example"): 1,  # the relative href resolves same-host
        ("b.example", "a.example"): 1,
    }


def test_ann_ivf_recall_and_cap(spark):
    """IVF routing: recall@1 vs the exact baseline on the twin-pair fixture;
    the nprobe=all configuration must equal brute force exactly (probing
    every cell = scanning everything); hot-cell salting caps group sizes on
    an all-identical corpus without changing the under-cap result."""
    e = _embeddings(spark)
    exact = {r.vec_id: r.nbr_id for r in sim.cosine_topk(e, k=1).collect()}
    approx = {
        r.vec_id: r.nbr_id
        for r in sim.ann_ivf_topk(e, n_cells=4, nprobe=2, k=1).collect()
    }
    hits = sum(1 for v, n in approx.items() if exact.get(v) == n)
    assert hits / len(exact) >= 0.5

    # nprobe = n_cells ⇒ every vector probes every cell ⇒ exact
    full = {
        r.vec_id: r.nbr_id
        for r in sim.ann_ivf_topk(e, n_cells=4, nprobe=4, k=1).collect()
    }
    assert full == exact

    # under-cap invariance
    capped = sorted(map(tuple, sim.ann_ivf_topk(e, n_cells=4, nprobe=2, k=2,
                                                cell_cap=100).collect()))
    uncapped = sorted(map(tuple, sim.ann_ivf_topk(e, n_cells=4, nprobe=2, k=2,
                                                  cell_cap=10**9).collect()))
    assert capped == uncapped

    # degenerate corpus: identical vectors all route to one cell; the salt
    # must bound the candidate groups and keep per-salt closed-form top-k
    n, cap = 1000, 50
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0) for _ in range(8)]).alias("embedding"),
    )
    out = sim.ann_ivf_topk(emb, n_cells=2, nprobe=1, k=3, cell_cap=cap).collect()
    assert all(r.sim == 1.0 for r in out)
    per_vec = {}
    for r in out:
        per_vec.setdefault(r.vec_id, []).append(r.nbr_id)
    # every vector still finds neighbors, and no salt group exceeded ~cap
    # (closed form: k smallest other ids within the vector's salt group)
    nsplit = -(-n // cap)
    assert nsplit > 1
    groups = {}
    for v in range(n):
        groups.setdefault(
            ((v % sim._CAP_M) * sim._CAP_A + 42) % sim._CAP_M % nsplit, []
        ).append(v)
    for members in groups.values():
        for v in members:
            want = sorted(m for m in members if m != v)[:3]
            if want:
                assert sorted(per_vec.get(v, [])) == want


def test_gopher_rules_each_rule(spark):
    """Each Gopher rule fires on a purpose-built document; a plain long
    English paragraph passes all seven."""
    good = ("the quick brown fox jumps over the lazy dog and it runs far "
            "with great speed for many days in the wild open country ") * 3
    docs = spark.createDataFrame(
        [
            (0, good),                                   # passes everything
            (1, "the and of to in is that for it with"), # too few words
            (2, good + " ##### ##### ##### #####" * 9),  # symbol-heavy
            (3, "\n".join(f"- {good[:40]}" for _ in range(10))),   # bullets
            (4, "\n".join(f"{good[:40]}..." for _ in range(10))),  # ellipses
            (5, ("12345 67890 " * 30) + "the and is"),   # numeric words
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in ts.gopher_rules(docs).collect()}
    assert r[0].keep
    assert not r[1].keep and r[1].n_words == 10
    assert not r[2].keep and r[2].symbol_ratio > 0.1
    assert not r[3].keep and r[3].bullet_ratio == 1.0
    assert not r[4].keep and r[4].ellipsis_ratio == 1.0
    assert not r[5].keep and r[5].alpha_word_ratio < 0.8


def test_kmeans_deterministic_and_separates(spark):
    """Two tight blobs on opposite axes end up in two clusters, every point
    nearest its own blob; re-running yields the identical assignment."""
    from trianglecounting_spark.functions import clustering as cl

    rows = []
    for i in range(10):           # blob A around +e0
        rows.append((i, [1.0 + 0.01 * i, 0.0, 0.0, 0.0]))
    for i in range(10, 20):       # blob B around +e1
        rows.append((i, [0.0, 1.0 + 0.01 * (i - 10), 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r1 = sorted(
        (r.vec_id, r.cluster)
        for r in cl.kmeans_assign(emb, k=2, iters=3).collect()
    )
    r2 = sorted(
        (r.vec_id, r.cluster)
        for r in cl.kmeans_assign(emb, k=2, iters=3).collect()
    )
    assert r1 == r2
    by_cluster = {}
    for v, c in r1:
        by_cluster.setdefault(c, set()).add(v)
    assert sorted(map(sorted, by_cluster.values())) == [
        list(range(10)), list(range(10, 20))
    ]


def test_semantic_dedup_drops_higher_id_near_dups(spark):
    """Within a cluster, the LOWEST id of a near-dup group is kept and every
    higher-id member is dropped; far pairs survive."""
    from trianglecounting_spark.functions import clustering as cl

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.001, 0.0, 0.0]),   # near-dup of 0 -> dropped
            (2, [0.998, -0.002, 0.0, 0.0]),  # near-dup of 0 -> dropped
            (3, [0.0, 1.0, 0.0, 0.0]),       # other blob, kept
            (4, [0.001, 0.999, 0.0, 0.0]),   # near-dup of 3 -> dropped
        ],
        "vec_id long, embedding array<double>",
    )
    r = {x.vec_id: x.keep for x in
         cl.semantic_dedup(emb, k=2, iters=2, threshold=0.95).collect()}
    assert r == {0: True, 1: False, 2: False, 3: True, 4: False}


def test_bm25_prefers_query_dense_short_docs(spark):
    """A document saturated with the query term outranks one that mentions it
    once amid much other text; docs without the term score nothing."""
    docs = spark.createDataFrame(
        [
            (0, "apple apple apple apple"),
            (1, "apple " + "filler words here " * 30),
            (2, "no relevant terms at all " * 10),
            (3, "banana apple banana"),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x.score for x in ts.bm25_topk(docs, ["apple"], top=10).collect()}
    assert 2 not in r
    assert r[0] > r[3] > r[1] > 0


def test_sampling_deterministic_and_exact_quotas(spark):
    """hash_sample is partitioning-invariant and rerun-stable; the stratified
    draw returns exactly min(cap, |stratum|) rows per stratum."""
    from trianglecounting_spark.functions import sampling as samp

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(300)], "id long, grp string"
    )
    a = sorted(r.id for r in samp.hash_sample(df, "id", 0.2).collect())
    b = sorted(r.id for r in samp.hash_sample(df.repartition(13), "id", 0.2).collect())
    assert a == b and 30 <= len(a) <= 90

    strat = samp.stratified_sample(df, ["grp"], "id", cap=7).collect()
    from collections import Counter

    c = Counter(r.grp for r in strat)
    assert c == {"s0": 7, "s1": 7, "s2": 7}
    # a stratum smaller than the cap returns whole
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, grp string")
    assert samp.stratified_sample(tiny, ["grp"], "id", cap=7).count() == 2


def test_sessionize_gap_splits(spark):
    """Events within the gap share a session; a gap strictly over the
    threshold opens a new one; ties order by event_id."""
    from trianglecounting_spark.functions.events import sessionize

    rows = [
        (1, "2024-01-01 10:00:00", 7, 1.0),
        (2, "2024-01-01 10:20:00", 7, 2.0),   # 20 min -> same session
        (3, "2024-01-01 10:50:01", 7, 4.0),   # 30:01 gap -> new session
        (4, "2024-01-01 09:00:00", 8, 8.0),   # other user
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    out = {(r.user_id, r.session_no): r for r in sessionize(ev, 30).collect()}
    assert set(out) == {(7, 1), (7, 2), (8, 1)}
    assert out[(7, 1)].n_events == 2 and out[(7, 1)].sum_value == 3.0
    assert out[(7, 2)].n_events == 1
    # exactly-at-gap boundary stays in the same session
    ev2 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 9, 1.0), (2, "2024-01-01 10:30:00", 9, 1.0)],
        "event_id long, ts string, user_id long, value double",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    assert sessionize(ev2, 30).count() == 1


def test_canonical_url_rules_and_idempotence(spark):
    """Each canonicalization rule on a hand case, messy/clean collapse, and
    idempotence (canon(canon(u)) == canon(u)) — the dedup-key contract."""
    from pyspark.sql import functions as F

    from trianglecounting_spark.sources.pages import canonical_url

    cases = [
        # (input, expected canonical)
        ("HTTPS://Site7.Example:443//Page/9/?utm_source=f&b=2&a=1#frag",
         "https://site7.example/Page/9?a=1&b=2"),
        ("https://site7.example/Page/9?a=1&b=2&gclid=xyz",
         "https://site7.example/Page/9?a=1&b=2"),
        ("http://Host.Example:80/a//b///c/", "http://host.example/a/b/c"),
        ("http://host.example:8080/x", "http://host.example:8080/x"),  # non-default port kept
        ("https://host.example", "https://host.example/"),
        ("https://host.example/?utm_campaign=x&fbclid=1&ref=home",
         "https://host.example/"),
        ("  https://host.example/p#sec  ", "https://host.example/p"),
        ("mailto:a@b.example", "mailto:a@b.example"),  # non-http passthrough
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
    # idempotence over the canonical forms themselves
    df2 = spark.createDataFrame([(c,) for c in got], "url string")
    again = [
        r.c for r in df2.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert again == got


def test_canonical_url_spark_matches_duckdb(spark):
    """The Spark expression and the DuckDB twin agree string-for-string on
    the messy fixture family (the extras-lane gate in miniature)."""
    import duckdb
    from pyspark.sql import functions as F

    from trianglecounting_spark.sources.pages import canonical_url, canonical_url_sql

    urls = [
        "HTTPS://Site1.Example:443//Page/2/?utm_source=f&b=2&a=1#frag",
        "http://A.B:80/x//y/?z=1&utm_medium=m",
        "https://h.example/p?b=2&a=1&a=0",
        "https://h.example:443",
        "ftp://odd.example/path",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url')} FROM "
            f"(VALUES {values}) AS t(i, url) ORDER BY i"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_paragraph_dedup_stats_and_clean(spark):
    """Hand corpus: a boilerplate line shared by 3 docs is flagged and
    removed from all of them; unique lines survive; order and empty-doc
    semantics pinned."""
    from trianglecounting_spark.functions.dedup import (
        paragraph_dup_stats,
        remove_duplicate_paragraphs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha one\nsubscribe now\nbeta one"),
            (2, "gamma two\nsubscribe now"),
            (3, "subscribe now\ndelta three\n\n  "),  # empty segments dropped
            (4, "all unique here"),
            (5, "subscribe now"),  # becomes empty after cleaning
        ],
        "doc_id long, text string",
    )
    stats = {
        r.doc_id: (r.n_paras, r.n_dup_paras, r.dup_ratio)
        for r in paragraph_dup_stats(docs, min_docs=2).collect()
    }
    assert stats == {
        1: (3, 1, 0.333333),  # round 6dp, same as the oracle
        2: (2, 1, 0.5),
        3: (2, 1, 0.5),
        4: (1, 0, 0.0),
        5: (1, 1, 1.0),
    }
    clean = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_paragraphs(docs, min_docs=2).collect()
    }
    assert clean == {
        1: "alpha one\nbeta one",
        2: "gamma two",
        3: "delta three",
        4: "all unique here",
        5: "",
    }


def test_neighbor_mean_features_closed_form(spark):
    """Path 1-2-3 with unit-axis features: hop-1 means are exact by hand;
    hop-2 composes means-of-means; vertices keep only featured-neighbor
    aggregates."""
    from trianglecounting_spark.functions.features import neighbor_mean_features

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    feats = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 4.0]), (3, [6.0, 0.0])],
        "v long, feat array<double>",
    )
    h1 = {r.v: r.feat for r in neighbor_mean_features(edges, feats).collect()}
    assert h1 == {
        1: [0.0, 4.0],          # only neighbor: 2
        2: [4.0, 0.0],          # mean of 1 and 3
        3: [0.0, 4.0],          # only neighbor: 2
    }
    h2 = {
        r.v: r.feat
        for r in neighbor_mean_features(edges, feats, hops=2).collect()
    }
    assert h2 == {
        1: [4.0, 0.0],          # hop-1 of 2
        2: [0.0, 4.0],          # mean of hop-1(1) and hop-1(3)
        3: [4.0, 0.0],
    }
    # partially-featured graph: an unfeatured neighbor contributes nothing
    feats_partial = spark.createDataFrame(
        [(1, [10.0]), (3, [30.0])], "v long, feat array<double>"
    )
    hp = {
        r.v: r.feat
        for r in neighbor_mean_features(edges, feats_partial).collect()
    }
    assert hp == {2: [20.0]}  # mean over featured neighbors {1, 3} only


def test_build_vocab_ranking_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b zz")],
        "doc_id long, text string",
    )
    got = {r.term: (r.n, r.vocab_id) for r in ts.build_vocab(docs).collect()}
    # b:4 a:3 c:1 zz:1 — rank by (n desc, term asc)
    assert got == {"b": (4, 0), "a": (3, 1), "c": (1, 2), "zz": (1, 3)}
    got2 = {r.term for r in ts.build_vocab(docs, min_count=2).collect()}
    assert got2 == {"a", "b"}


def test_collocations_pmi_closed_form(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "new york new york new york"), (2, "old york new day")],
        "doc_id long, text string",
    )
    got = {
        (r.w1, r.w2): (r.n_pair, r.pmi)
        for r in ts.collocations_pmi(docs, min_count=2).collect()
    }
    # bigrams doc1: (new,york)x3 (york,new)x2; doc2: (old,york)(york,new)(new,day)
    # totals: nb=8, nt=10; n(new)=4, n(york)=4
    n_pair, pmi = got[("new", "york")]
    assert n_pair == 3
    assert math.isclose(pmi, round(math.log((3 * 10 * 10) / (8 * 4 * 4)), 6), abs_tol=1e-9)
    assert got[("york", "new")][0] == 3
    assert ("old", "york") not in got  # under min_count


def test_zipf_alpha_closed_form_and_empty_tail(spark):
    """Corpus with term counts a:9, b:5, c:1. fmin=5 -> tail {a, b},
    n_tail=2, s_ln = ln(5/4.5) + ln(9/4.5) (ascending-f fold),
    alpha = 1 + 2/s_ln. fmin=100 -> empty tail, alpha NULL."""
    docs = spark.createDataFrame(
        [(1, "a " * 9), (2, "b " * 5 + "c")], "doc_id long, text string"
    )
    r = ts.zipf_alpha(docs, fmin=5).collect()[0]
    assert (r.fmin, r.n_tail) == (5, 2)
    s_ln = math.log(5 / 4.5) + math.log(9 / 4.5)
    assert math.isclose(r.alpha, round(1.0 + 2.0 / s_ln, 6), abs_tol=1e-9)
    r2 = ts.zipf_alpha(docs, fmin=100).collect()[0]
    assert r2.n_tail == 0 and r2.alpha is None
    # partitioning determinism of the ordered fold
    r3 = ts.zipf_alpha(docs.repartition(4), fmin=5).collect()[0]
    assert r3.alpha == r.alpha


def test_shingle_containment_asymmetric_closed_form(spark):
    """doc 2 is an exact substring of doc 1 (plus extra text), so every
    shingle of 2 appears in 1: containment = 1.0 even though Jaccard is
    low. An unrelated doc 3 shares nothing -> filtered out entirely."""
    body = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, body + " and then runs far away into the woods tonight"),
            (2, body),
            (3, "zzzz completely different content qqqq xxxx yyyy wwww"),
        ],
        "doc_id long, text string",
    )
    rows = dd.shingle_containment(docs, k=5, min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.containment) == (1, 2, 1.0)
    # candidate-gated path scores the same pair identically
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r2 = dd.shingle_containment(docs, pairs, k=5, min_containment=0.9).collect()[0]
    assert (r2.id_a, r2.id_b, r2.n_inter, r2.containment) == (
        r.id_a, r.id_b, r.n_inter, r.containment,
    )


def test_readability_closed_form(spark):
    """'The cat sat.' -> words 3, sentences 1, vowel-groups e/a/a = 3.
    FRE = 206.835 - 1.015*3 - 84.6*1 = 119.19. Empty text -> NULL score,
    sentence floor 1."""
    docs = spark.createDataFrame(
        [(1, "The cat sat."), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ts.readability(docs).collect()}
    r = rows[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    assert math.isclose(r.flesch, round(206.835 - 1.015 * 3 - 84.6 * 1, 6), abs_tol=1e-9)
    assert rows[2].n_words == 0 and rows[2].flesch is None
    assert rows[2].n_sentences == 1


def test_heaps_beta_closed_form(spark):
    """Even-id doc contributes 4 tokens / 2 distinct terms; odd-id doc adds
    4 more tokens and 2 NEW terms: n_half=4, v_half=2, n_full=8, v_full=4
    -> beta = ln(4/2)/ln(8/4) = 1.0 exactly. Degenerate corpus (no growth)
    -> beta NULL."""
    docs = spark.createDataFrame(
        [(2, "aa bb aa bb"), (3, "cc dd cc dd")], "doc_id long, text string"
    )
    r = ts.heaps_beta(docs).collect()[0]
    assert (r.n_half, r.v_half, r.n_full, r.v_full) == (4, 2, 8, 4)
    assert r.beta == 1.0
    same = spark.createDataFrame(
        [(2, "aa bb"), (3, "aa bb")], "doc_id long, text string"
    )
    r2 = ts.heaps_beta(same).collect()[0]
    assert r2.beta is None and (r2.v_half, r2.v_full) == (2, 2)
    # partitioning determinism
    r3 = ts.heaps_beta(docs.repartition(4)).collect()[0]
    assert r3.beta == r.beta


def test_domain_mixture_closed_form(spark):
    """Domains with counts 1, 1, 4 at alpha=0.5: weights 1/4, 1/4, 2/4
    (S = 1 + 1 + 2 = 4) and they sum to 1. alpha=1 reproduces natural
    frequency (1/6, 1/6, 4/6)."""
    from trianglecounting_spark.functions import sampling as smp

    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("c",), ("c",), ("c",)], "domain string"
    )
    rows = {r.domain: r for r in smp.domain_mixture(docs, alpha=0.5).collect()}
    assert (rows["a"].n_docs, rows["a"].weight) == (1, 0.25)
    assert rows["b"].weight == 0.25
    assert (rows["c"].n_docs, rows["c"].weight) == (4, 0.5)
    nat = {r.domain: r.weight for r in smp.domain_mixture(docs, alpha=1.0).collect()}
    assert math.isclose(nat["c"], round(4 / 6, 6), abs_tol=1e-9)
    # partitioning determinism of the histogram-fold normalizer
    rows2 = {
        r.domain: r.weight
        for r in smp.domain_mixture(docs.repartition(5), alpha=0.5).collect()
    }
    assert rows2 == {d: r.weight for d, r in rows.items()}


def test_decontaminate_flags_exact_ngram_overlap(spark):
    """Training doc 1 contains the eval doc's 4-gram verbatim (embedded in
    longer text); doc 2 shares words but no 4-gram; doc 3 repeats the eval
    4-gram twice but it counts ONCE (distinct grams)."""
    ev = spark.createDataFrame(
        [(100, "the secret eval answer")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, "prefix words the secret eval answer suffix words"),
            (2, "the secret answer eval scrambled order here now"),
            (3, "the secret eval answer and the secret eval answer"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ts.decontaminate(tr, ev, n=4).collect()}
    assert (rows[1].n_hits, rows[1].contaminated) == (1, True)
    assert (rows[2].n_hits, rows[2].contaminated) == (0, False)
    assert (rows[3].n_hits, rows[3].contaminated) == (1, True)


def test_encode_docs_ids_positions_and_oov(spark):
    """Corpus 'aa bb aa cc' / 'aa aa bb': vocab at min_count=2 ranks
    aa (4) -> id 0, bb (2) -> id 1; cc is OOV -> -1. Positions 0-based in
    token order."""
    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa aa bb")], "doc_id long, text string"
    )
    vocab = ts.build_vocab(docs, min_count=2)
    got = sorted(
        (r.doc_id, r.pos, r.vocab_id) for r in ts.encode_docs(docs, vocab).collect()
    )
    assert got == [
        (1, 0, 0), (1, 1, 1), (1, 2, 0), (1, 3, -1),
        (2, 0, 0), (2, 1, 0), (2, 2, 1),
    ]


def test_token_count_quantiles_exact_positions(spark):
    """Ten docs with token counts 1..10: q=0.5 -> position ceil(5)=5 ->
    value 5; q=0.99 -> position 10 -> 10; q=0.25 -> position 3 -> 3."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i)) for i in range(1, 11)], "doc_id long, text string"
    )
    rows = {r.q: r for r in ts.token_count_quantiles(docs, qs=(0.25, 0.5, 0.99)).collect()}
    assert (rows[0.5].pos, rows[0.5].n_tokens) == (5, 5)
    assert (rows[0.25].pos, rows[0.25].n_tokens) == (3, 3)
    assert (rows[0.99].pos, rows[0.99].n_tokens) == (10, 10)
    # partitioning determinism (ties broken by doc_id in the global sort)
    rows2 = {
        r.q: (r.pos, r.n_tokens)
        for r in ts.token_count_quantiles(docs.repartition(7), qs=(0.25, 0.5, 0.99)).collect()
    }
    assert rows2 == {q: (r.pos, r.n_tokens) for q, r in rows.items()}


def test_pipeline_funnel_stage_arithmetic(spark):
    """Hand corpus: doc 2 is a byte-dup of doc 1 (falls at exact stage);
    doc 3 is a near-dup of doc 1 (same shingles, one word changed at the
    end — falls at near stage); doc 4 is unique but fails Gopher (too
    short); doc 0 is the eval doc (0 % 97 == 0, dropped at clean stage);
    doc 5 is unique, long, quality text sharing no 4-gram with doc 0.
    Expect n_docs=6, n_exact=5, and doc 5 + doc 0's fate per stage."""
    from trianglecounting_spark.functions.pipeline import pipeline_funnel

    sent = "the quick brown foxes jumped over many lazy sleeping dogs "
    body = (sent * 8).strip()  # 80 words, mean len ~4.6, stopwords present
    docs = spark.createDataFrame(
        [
            (0, "held out benchmark answer " + body),
            (1, body + " original tail marker one"),
            (2, body + " original tail marker one"),
            (3, body + " original tail marker two"),
            (4, "tiny"),
            (5, body + " completely fresh closing words"),
        ],
        "doc_id long, text string",
    )
    r = pipeline_funnel(docs, k=5, n_gram=4, eval_mod=97).collect()[0]
    assert r.n_docs == 6
    assert r.n_exact == 5  # doc 2 collapsed into doc 1
    # near stage: doc 3 clusters with doc 1 (min-id keeper wins)
    assert r.n_near == 4
    # quality: doc 4 fails the >=50-word rule
    assert r.n_quality == 3
    # clean: doc 0 is the eval split itself -> dropped; docs 1,5 share the
    # 80-word body with doc 0?? no — doc 0 contains body too, so 1,3,5 all
    # share 4-grams with it and are contaminated; survivors: none
    assert r.n_clean == 0 and r.tokens_clean == 0


def test_unigram_lm_score_buckets_and_empty_doc(spark):
    from trianglecounting_spark.functions.textstats import unigram_lm_score

    # doc 0: all common tokens (low nll = head); doc 2: rare tokens (tail);
    # doc 3: empty -> nll 0.0 and sorts to the head tercile
    docs = spark.createDataFrame(
        [
            (0, "the the the the"),
            (1, "the the rare1 rare2"),
            (2, "zq1 zq2 zq3 zq4"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.nll, r.bucket) for r in unigram_lm_score(docs).collect()}
    assert rows[3] == (0.0, "head")
    assert rows[0][0] < rows[1][0] < rows[2][0]
    # n=4 -> head = pos 1..2, middle = pos 3, tail = pos 4
    assert rows[0][1] == "head" and rows[1][1] == "middle" and rows[2][1] == "tail"


def test_unigram_lm_score_matches_duckdb(spark):
    import duckdb

    from trianglecounting_spark.functions.textstats import (
        unigram_lm_score,
        unigram_lm_score_sql,
    )

    docs = [
        (
            i,
            " ".join(
                ["the quick brown fox", "lorem ipsum dolor sit amet"][i % 2]
                for _ in range(i % 5 + 1)
            )
            + f" unique{i}",
        )
        for i in range(30)
    ] + [(100, "")]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {t!r})" for i, t in docs)
        + ") t(doc_id, text)"
    )
    oracle = {
        r[0]: (r[1], r[2]) for r in con.execute(unigram_lm_score_sql()).fetchall()
    }
    con.close()
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.nll, r.bucket) for r in unigram_lm_score(d).collect()}
    assert got == oracle


def test_native_approx_ops_error_bounds_vs_exact(spark):
    """Spark's native sketches (HLL++ count-distinct, GK approx-percentile)
    are the documented approximate fast path next to this repo's exact
    lanes (vocab, token_count_quantiles). Pin their error CONTRACT against
    the exact answers so a regression in either path surfaces: HLL++ at
    rsd=0.05 must land within 3*rsd; approx_percentile with accuracy 1000
    within 1% of the exact type-1 quantile on 5000 distinct values."""
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        (F.col("id") * 2654435761 % 100000).alias("x")
    )
    exact = df.select(F.count_distinct("x")).collect()[0][0]
    approx = df.select(F.approx_count_distinct("x", rsd=0.05)).collect()[0][0]
    assert abs(approx - exact) <= 0.15 * exact, (approx, exact)
    med_exact = df.orderBy("x").collect()[2499].x
    med_approx = df.select(
        F.percentile_approx("x", 0.5, accuracy=1000)
    ).collect()[0][0]
    assert abs(med_approx - med_exact) <= 0.01 * 100000, (med_approx, med_exact)


from tests.conftest import SF_SMALL


def test_dsir_weights_orders_target_like_docs_first(spark):
    """DSIR (Xie et al. 2023): docs sharing the target sample's vocabulary
    must outscore off-target docs; the top-fraction flag is exact; the
    result is partitioning-invariant."""
    from trianglecounting_spark.functions.sampling import dsir_weights

    rows = (
        # target-like: "alpha beta" world; off-target: "zulu yankee" world
        [(i, "alpha beta gamma alpha beta") for i in range(4)]
        + [(i, "zulu yankee xray zulu yankee") for i in range(4, 8)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id < 2")  # two alpha-world docs
    out = dsir_weights(docs, target, buckets=64, keep_frac=0.5).collect()
    byid = {r.doc_id: r for r in out}
    assert len(byid) == 8
    # every alpha-world doc outscores every zulu-world doc
    lo = min(byid[i].logw for i in range(4))
    hi = max(byid[i].logw for i in range(4, 8))
    assert lo > hi
    # exactly ceil(0.5 * 8) = 4 selected, and they are the alpha docs
    sel = {r.doc_id for r in out if r.selected}
    assert sel == {0, 1, 2, 3}
    # partitioning-invariance
    out2 = dsir_weights(
        docs.repartition(7), target.repartition(3), buckets=64, keep_frac=0.5
    ).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_dsir_weights_matches_duckdb_oracle(spark):
    """Full-value differential at sf0.001 (the same gate check_contract
    runs): identical logw at 6dp and identical selected set."""
    import duckdb

    from trianglecounting_spark.functions.sampling import (
        dsir_weights,
        dsir_weights_sql,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = sorted(
        tuple(r) for r in dsir_weights(docs, docs.where("doc_id % 23 = 0")).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(dsir_weights_sql("doc_id % 23 = 0")).fetchall()
    )
    assert got == want


def test_event_transition_graph_closed_form(spark):
    """Two users: A does login->search->buy, B does login->search->leave.
    Transitions: login->search ×2 (p=1.0), search->buy and search->leave
    ×1 each (p=0.5). Tie-broken deterministically by (ts, event_id)."""
    from datetime import datetime

    from trianglecounting_spark.functions.events import event_transition_graph

    t0 = datetime(2024, 1, 1)

    def ev(eid, uid, typ, sec):
        return (eid, datetime(2024, 1, 1, 0, 0, sec), uid, typ)

    events = spark.createDataFrame(
        [
            ev(1, 7, "login", 0), ev(2, 7, "search", 10), ev(3, 7, "buy", 20),
            ev(4, 8, "login", 0), ev(5, 8, "search", 5), ev(6, 8, "leave", 9),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {(r.src, r.dst): (r.n, r.p) for r in event_transition_graph(events).collect()}
    assert got[("login", "search")] == (2, 1.0)
    assert got[("search", "buy")] == (1, 0.5)
    assert got[("search", "leave")] == (1, 0.5)
    assert len(got) == 3
