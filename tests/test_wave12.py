"""Round-5 twelfth wave: sequence packing, BPE merge training, TrustRank
spam mass, and the ordered events funnel.

Closed-form fixtures plus differentials against independent sequential
implementations (pure-Python BPE, numpy walk replication) — the oracle-hash
gate for these lanes lives in tools/check_contract.py (extra registry)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_sequences_closed_form(spark):
    from trianglecounting_spark.functions.sampling import pack_sequences

    # token counts: 3, 0, 4, 2  → offsets 0, 3, 3, 7 ; seq_len=4
    docs = _mkdocs(spark, ["a b c", "", "d e f g", "h i"])
    rows = {r.doc_id: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert rows[0].n_tokens == 3 and rows[0].offset == 0
    assert (rows[0].first_seq, rows[0].last_seq, rows[0].n_seqs) == (0, 0, 1)
    # empty doc: no sequence coverage, NULL ids, n_seqs 0
    assert rows[1].n_tokens == 0 and rows[1].offset == 3
    assert rows[1].first_seq is None and rows[1].last_seq is None
    assert rows[1].n_seqs == 0
    # doc 2 spans tokens [3, 7) → sequences 0 and 1
    assert (rows[2].offset, rows[2].first_seq, rows[2].last_seq, rows[2].n_seqs) == (
        3, 0, 1, 2,
    )
    # doc 3 spans tokens [7, 9) → sequences 1 and 2
    assert (rows[3].offset, rows[3].first_seq, rows[3].last_seq, rows[3].n_seqs) == (
        7, 1, 2, 2,
    )


def test_pack_sequences_partitioning_invariant(spark):
    """The distributed prefix sum must not depend on physical layout."""
    from trianglecounting_spark.functions.sampling import pack_sequences

    texts = [f"tok {' x' * (i % 7)}" for i in range(101)]
    docs = _mkdocs(spark, texts)
    a = sorted(map(tuple, pack_sequences(docs, seq_len=16).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(13), seq_len=16).collect())
    )
    assert a == b
    # offsets are a proper exclusive prefix sum: sorted by doc_id they chain
    by_id = sorted(a)
    acc = 0
    for (_doc, n, off, _f, _l, _k) in by_id:
        assert off == acc
        acc += n


# ---------------------------------------------------------------------------
# bpe_train
# ---------------------------------------------------------------------------


def _bpe_reference(word_counts: dict[str, int], n_merges: int):
    """Sequential textbook BPE (Sennrich et al. 2016) for differentials."""
    state = {tuple(w) + ("</w>",): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        new_state: dict[tuple, int] = {}
        for syms, n in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + n
        state = new_state
    return merges


def test_bpe_train_matches_sequential_reference(spark):
    from trianglecounting_spark.functions.textstats import bpe_train

    corpus = ["the cat sat on the mat", "the bat and the cat", "that hat"]
    docs = _mkdocs(spark, corpus)
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    counts: dict[str, int] = {}
    for t in corpus:
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    assert got == _bpe_reference(counts, 6)


def test_bpe_train_overlapping_pairs_greedy(spark):
    """'aaaaa' must pair greedily left-to-right: (a,a) count 4 in round 1,
    and round 2 must see aa|aa|a</w> — the case naive string replace and
    double-counting pair extraction both get wrong."""
    from trianglecounting_spark.functions.textstats import bpe_train

    docs = _mkdocs(spark, ["aaaaa"])
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
    ]
    assert got == _bpe_reference({"aaaaa": 1}, 2)
    # round 1: overlapping adjacency counts all 4 (a,a) positions, and the
    # rewrite pairs greedily left-to-right → aa|aa|a|</w>
    assert got[0] == (1, "a", "a", 4)
    # round 2: all pairs tie at 1 → (count desc, l asc, r asc) picks
    # ('a','</w>') ('a' sorts before 'aa') — proves the rewrite produced
    # a trailing single 'a', i.e. greedy pairing, not naive replace
    assert got[1] == (2, "a", "</w>", 1)


# ---------------------------------------------------------------------------
# trustrank
# ---------------------------------------------------------------------------


def test_trustrank_spam_mass_separates_farm_from_core(spark):
    """Seeded trust must starve a link farm that PageRank alone rewards:
    the farm target's spam mass must exceed the trusted target's."""
    from trianglecounting_spark.operators.pagerank import trustrank

    # trusted core: 0→1→2→0 ring, seed {0}; spam farm: 10..14 all → 9,
    # 9 → 10..14 back (a classic boosting farm), no path from the core.
    edges = [(0, 1), (1, 2), (2, 0)]
    edges += [(f, 9) for f in range(10, 15)]
    edges += [(9, f) for f in range(10, 15)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r.v: r for r in trustrank(e, seeds=[0], iterations=12).collect()}
    # the farm hub earns real PageRank but ~zero trust
    assert out[9].pr_score > 0.05
    assert out[9].trust_score == pytest.approx(0.0, abs=1e-6)
    assert out[9].spam_mass == pytest.approx(1.0, abs=1e-6)
    # the trusted ring's members keep spam mass ≈ 0 (trust ≈ rank there)
    assert out[1].spam_mass < 0.5
    assert out[9].spam_mass > out[1].spam_mass


def test_trustrank_null_spam_mass_only_when_pr_rounds_to_zero(spark):
    from trianglecounting_spark.operators.pagerank import trustrank

    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    rows = trustrank(e, seeds=[0], iterations=5).collect()
    assert all(r.spam_mass is not None for r in rows)  # tiny graph: PR ≫ 0


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def _mkevents(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, t0 + dt.timedelta(minutes=m), u, ty, 1.0, "{}")
        for i, (u, ty, m) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_strict_order(spark):
    from trianglecounting_spark.functions.events import funnel

    ev = _mkevents(
        spark,
        [
            # user 1 completes all three in order
            (1, "view", 0), (1, "click", 5), (1, "purchase", 10),
            # user 2 clicks BEFORE viewing — click must not count
            (2, "click", 0), (2, "view", 5),
            # user 3 views only
            (3, "view", 0),
            # user 4 never views; their purchase is unreachable
            (4, "purchase", 0),
        ],
    )
    got = {r.step: (r.event_type, r.n_users) for r in funnel(ev).collect()}
    assert got[1] == ("view", 3)
    assert got[2] == ("click", 1)
    assert got[3] == ("purchase", 1)


def test_funnel_greedy_earliest_is_sufficient(spark):
    """view@0, click@1, purchase@2 with a decoy later click — greedy
    earliest matching must still find the completion."""
    from trianglecounting_spark.functions.events import funnel

    ev = _mkevents(
        spark,
        [(1, "view", 0), (1, "click", 1), (1, "purchase", 2), (1, "click", 9)],
    )
    got = {r.step: r.n_users for r in funnel(ev).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# simrank
# ---------------------------------------------------------------------------


def _simrank_reference(edges, iterations=3, c=0.8, state_digits=9):
    """Naive sequential SimRank with the same per-round rounding contract."""
    edges = sorted(set(edges))
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    inn = {v: [u for u, w in edges if w == v] for v in verts}
    s = {(v, v): 1.0 for v in verts}
    for _ in range(iterations):
        nxt = {}
        for a in verts:
            for b in verts:
                if a == b or not inn[a] or not inn[b]:
                    continue
                t = sum(s.get((i, j), 0.0) for i in inn[a] for j in inn[b])
                if t:
                    nxt[(a, b)] = round(c * t / (len(inn[a]) * len(inn[b])),
                                        state_digits)
        for v in verts:
            nxt[(v, v)] = 1.0
        s = nxt
    return {
        (a, b): round(v, 6)
        for (a, b), v in s.items()
        if a != b and v > 0
    }


def test_simrank_matches_sequential_reference(spark):
    from trianglecounting_spark.operators.linkpred import simrank

    # the paper's running example shape: two "universities" pointing at
    # professors/students plus a shared hub
    edges = [
        (0, 2), (0, 3), (1, 3), (1, 4), (2, 5), (3, 5), (4, 5),
        (5, 0), (5, 1), (2, 4),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.a, r.b): r.score for r in simrank(e, iterations=3).collect()
    }
    assert got == _simrank_reference(edges, 3)


def test_simrank_symmetric_and_bounded(spark):
    from trianglecounting_spark.operators.linkpred import simrank

    edges = [(i, (i * 3 + 1) % 11) for i in range(11)] + [(i, (i + 5) % 11)
                                                          for i in range(11)]
    e = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    rows = simrank(e, iterations=3).collect()
    got = {(r.a, r.b): r.score for r in rows}
    for (a, b), v in got.items():
        assert 0 < v <= 1.0
        assert got.get((b, a)) == pytest.approx(v)  # symmetric relation
