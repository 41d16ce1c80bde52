"""Corpus-curation tier: Gopher repetition metrics, benchmark
decontamination, deterministic stratified sampling.

Hand-computable planted fixtures (the oracle parity at sf0.01 is
covered by tests/test_oracle_parity.py + scripts/sweep.py; these pin
the SEMANTICS on inputs small enough to verify by eye).
"""

import pytest

from osgeo_gdal_spark.operators import corpus as CP


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        # doc 1: "a b a b a" -> 4 bigrams, top bigram "a b" x2
        (1, "a b a b a", "en"),
        # doc 2: all-distinct words
        (2, "w x y z", "en"),
        # doc 3: single repeated word -> one distinct bigram x3
        (3, "q q q q", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def test_repetition_stats_hand_computed(spark, tiny_docs):
    out = {r["doc_id"]: r for r in CP.repetition_stats(tiny_docs).collect()}
    r1 = out[1]
    assert r1["n_words"] == 5
    assert r1["top2_cnt"] == 2          # "a b" occurs twice
    assert r1["rep_frac"] == 2 / 4
    assert r1["uniq_frac"] == 2 / 5
    r2 = out[2]
    assert r2["top2_cnt"] == 1 and r2["uniq_frac"] == 1.0
    r3 = out[3]
    assert r3["top2_cnt"] == 3          # "q q" three times
    assert r3["rep_frac"] == 1.0 and r3["uniq_frac"] == 1 / 4


def test_repetition_single_word_doc_no_bigrams(spark):
    """n_words == 1 -> zero bigrams; top2_cnt coalesces to 0 and
    rep_frac divides by zero words-1 -> NULL (not a crash)."""
    docs = spark.createDataFrame([(7, "alone", "en")],
                                 "doc_id LONG, text STRING, lang STRING")
    r = CP.repetition_stats(docs).collect()[0]
    assert r["n_words"] == 1 and r["top2_cnt"] == 0
    assert r["rep_frac"] is None and r["uniq_frac"] == 1.0


def test_decontaminate_flags_planted_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "en"),     # seed
            (2, "i saw the quick brown fox yesterday", "en"),  # contains run
            (3, "quick the brown unrelated words here", "en"),  # shuffled: no run
            (4, "the quick brown the quick brown", "en"),       # run twice
            (5, "br own", "en"),                                 # shorter than n
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    phrases = CP.benchmark_phrases(docs, [1], n=3)
    assert phrases == ["the quick brown"]
    hits = {r["doc_id"]: r["n_hits"]
            for r in CP.decontaminate(docs, phrases, n=3).collect()}
    assert hits[1] == 1          # the seed contaminates itself
    assert hits[2] == 1
    assert hits[4] == 1          # distinct phrases per doc (matches oracle)
    assert 3 not in hits         # shuffled words are NOT a contiguous run
    assert 5 not in hits         # sub-n doc: no shingles, no crash


def test_stratified_sample_deterministic_and_exact(spark):
    # 200 docs, ids 0..199, two strata; doc_id % 100 < pct keeps exactly
    # pct docs per 100-block -> closed-form counts.
    rows = [(i, "t", "en" if i % 2 == 0 else "de") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = {r["stratum"]: r for r in
           CP.stratified_sample(docs, {"en": 50, "de": 10}).collect()}
    # en = even ids: per 100-block, evens < 50 -> 25 kept, 2 blocks -> 50
    assert out["en"]["n_total"] == 100 and out["en"]["n_kept"] == 50
    # de = odd ids: odds < 10 -> 5 kept per block -> 10
    assert out["de"]["n_total"] == 100 and out["de"]["n_kept"] == 10
    # re-run is bit-identical (no RNG anywhere)
    again = {r["stratum"]: r["n_kept"]
             for r in CP.stratified_sample(docs, {"en": 50, "de": 10}).collect()}
    assert again == {"en": 50, "de": 10}


def test_stratified_default_rate_applies_to_unlisted_stratum(spark):
    rows = [(i, "t", "fr") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = CP.stratified_sample(docs, {"en": 50}, default_pct=20).collect()[0]
    assert out["stratum"] == "fr" and out["n_kept"] == 20


# --- winnowing fingerprints ---------------------------------------------


def _py_fingerprints(text, k=3, w=4):
    """Pure-python reference of the exact same hash, for parity."""
    M, WB, GB = 2147483647, 31, 65599
    ws = [x for x in text.split(" ") if x != ""]
    hs = []
    for word in ws:
        acc = 0
        for c in word:
            acc = (acc * WB + ord(c)) % M
        hs.append(acc)
    gs = []
    for i in range(len(hs) - k + 1):
        g = hs[i]
        for j in range(1, k):
            g = (g * GB + hs[i + j]) % M
        gs.append(g)
    if len(gs) >= w:
        sel = []
        for i in range(len(gs) - w + 1):
            m = min(gs[i:i + w])
            if m not in sel:
                sel.append(m)
        return gs, sel
    out = []
    for g in gs:
        if g not in out:
            out.append(g)
    return gs, out


def test_winnow_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short doc",
        "a b c d e f g h i j",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = {r["doc_id"]: r for r in CP.winnow_fingerprints(docs).collect()}
    for i, t in enumerate(texts):
        gs, fps = _py_fingerprints(t)
        assert out[i]["n_grams"] == len(gs)
        assert out[i]["n_fp"] == len(fps)
        if fps:
            assert out[i]["min_fp"] == min(fps)
            assert out[i]["fp_digest"] == sum(fps)
        else:
            assert out[i]["min_fp"] is None and out[i]["fp_digest"] == 0


def test_winnow_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: two docs sharing a contiguous run of
    >= w+k-1 words (6 at k=3,w=4) share at least one fingerprint;
    unrelated docs share none."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7-word run
    docs = spark.createDataFrame(
        [
            (1, "intro words " + shared + " tail one", "en"),
            (2, "completely different prefix " + shared, "en"),
            (3, "nothing in common here at all whatsoever today", "en"),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in CP.fingerprint_candidates(docs, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_fingerprint_candidates_hot_bucket_cap(spark):
    """A fingerprint shared by > max_bucket docs is dropped, not
    O(bucket^2)-joined."""
    same = [(i, "boilerplate header text repeated verbatim everywhere", "en")
            for i in range(30)]
    docs = spark.createDataFrame(same, "doc_id LONG, text STRING, lang STRING")
    capped = CP.fingerprint_candidates(docs, min_shared=1, max_bucket=10)
    assert capped.count() == 0
    uncapped = CP.fingerprint_candidates(docs, min_shared=1, max_bucket=1000)
    assert uncapped.count() == 30 * 29 // 2


# --- sequence packing + keyword extraction ------------------------------


def test_pack_sequences_hand_computed(spark):
    # budget 10, one shard: docs of 4, 8, 3, 12 tokens
    # cum:        4, 12, 15, 27
    # starts:     0,  4, 12, 15
    rows = [
        (0, " ".join(["a"] * 4), "en"),
        (1, " ".join(["b"] * 8), "en"),
        (2, " ".join(["c"] * 3), "en"),
        (3, " ".join(["d"] * 12), "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = {r["doc_id"]: r
           for r in CP.pack_sequences(docs, 10, shard_size=100).collect()}
    assert (out[0]["seq_id"], out[0]["seq_off"], out[0]["n_seqs"]) == (0, 0, 1)
    # doc 1 starts at 4, ends at 11 -> straddles chunks 0 and 1
    assert (out[1]["seq_id"], out[1]["seq_off"], out[1]["n_seqs"]) == (0, 4, 2)
    assert (out[2]["seq_id"], out[2]["seq_off"], out[2]["n_seqs"]) == (1, 2, 1)
    # doc 3 starts at 15 (chunk 1, off 5), ends at 26 (chunk 2) -> 2 chunks
    assert (out[3]["seq_id"], out[3]["seq_off"], out[3]["n_seqs"]) == (1, 5, 2)
    # different shards pack independently
    rows2 = [(i * 100, " ".join(["x"] * 7), "en") for i in range(3)]
    docs2 = spark.createDataFrame(rows2, "doc_id LONG, text STRING, lang STRING")
    out2 = CP.pack_sequences(docs2, 10, shard_size=100).collect()
    assert all(r["seq_id"] == 0 and r["seq_off"] == 0 for r in out2)


def test_top_term_tf_then_df_tiebreak(spark):
    rows = [
        # doc 0: 'alpha' tf=2 wins outright
        (0, "alpha beta alpha gamma", "en"),
        # doc 1: 'beta' and 'delta' tie at tf=2; 'delta' has lower df
        (1, "beta delta beta delta", "en"),
        # doc 2: gives 'beta' df=3, 'delta' df=2
        (2, "beta only here", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = {r["doc_id"]: r for r in CP.top_term(docs, min_len=4).collect()}
    assert out[0]["term"] == "alpha" and out[0]["tf"] == 2
    assert out[1]["term"] == "delta"          # df tie-break: 1 < 3
    assert out[1]["tf"] == 2 and out[1]["df"] == 1
    # doc 2: beta/only/here all tf=1; lowest df wins (here=only=1 beat
    # beta=3), then lexical: 'here' < 'only'
    assert out[2]["term"] == "here" and out[2]["df"] == 1


def test_repetition_rowwise_equals_groupby(spark, tiny_docs):
    """The shuffle-free per-row metric form equals the groupBy form on
    every column, including the 1-word-doc NULL guard."""
    extra = spark.createDataFrame(
        [(7, "alone", "en"), (8, "x y x y x y zz", "en")],
        "doc_id LONG, text STRING, lang STRING",
    )
    docs = tiny_docs.unionByName(extra)
    a = {r["doc_id"]: (r["n_words"], r["top2_cnt"], r["rep_frac"],
                       r["uniq_frac"])
         for r in CP.repetition_stats(docs).collect()}
    b = {r["doc_id"]: (r["n_words"], r["top2_cnt"], r["rep_frac"],
                       r["uniq_frac"])
         for r in CP.repetition_stats_rowwise(docs).collect()}
    assert a == b and len(a) == 5


def test_sessionize_gap_semantics(spark):
    """Hand-built event stream: sessions split exactly at >30-min gaps;
    a gap of exactly 30 min does NOT split."""
    from osgeo_gdal_spark.entry_queries import q_sessionize
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, user, minutes, typ="view"):
        return (i, t0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        ev(1, 7, 0), ev(2, 7, 10), ev(3, 7, 40),      # gap 30 exactly: same
        ev(4, 7, 71), ev(5, 7, 75, "click"),           # gap 31 -> new session
        ev(6, 8, 0),                                   # other user
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {(r["user_id"], r["session_id"]): r
           for r in q_sessionize(spark, d).collect()}
    assert set(out) == {(7, 1), (7, 2), (8, 1)}
    assert out[(7, 1)]["n_events"] == 3
    assert out[(7, 2)]["n_events"] == 2 and out[(7, 2)]["n_types"] == 2
    assert out[(8, 1)]["n_events"] == 1


def test_dedup_incremental_flags_planted_newcomer(spark):
    """A new doc sharing a long run with an index doc is flagged with
    that doc as best_match; an unrelated new doc passes clean."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    idx = spark.createDataFrame(
        [
            (11, "corpus filler one " + shared, "en"),
            (12, "totally different corpus text entirely here", "en"),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    new = spark.createDataFrame(
        [
            (100, "new page with " + shared + " inside", "en"),
            (101, "fresh unrelated words nobody wrote before now", "en"),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = {r["doc_id"]: r for r in CP.dedup_incremental(idx, new).collect()}
    assert 100 in out and out[100]["best_match"] == 11
    assert 101 not in out


def test_shortest_paths_cyclic_graph_vs_dijkstra(spark):
    """The relaxation loop on a CYCLIC weighted graph (which the DAG
    oracle can't cover) equals a reference Dijkstra; undirected mode
    and unreachable nodes behave."""
    import heapq

    from osgeo_gdal_spark.operators import graph as GG

    edges = [
        (0, 1, 4.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0),
        (2, 3, 5.0), (3, 0, 1.0),          # cycle back
        (4, 5, 1.0),                        # disconnected component
    ]

    def dijkstra(src, es, undirected=False):
        adj = {}
        for s, t, w in es:
            adj.setdefault(s, []).append((t, w))
            if undirected:
                adj.setdefault(t, []).append((s, w))
        dist = {src: 0.0}
        pq = [(0.0, src)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        return dist

    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    got = {r["node"]: r["dist"]
           for r in GG.shortest_paths(df, 0, max_rounds=16).collect()}
    assert got == dijkstra(0, edges)
    assert 4 not in got and 5 not in got   # unreachable stays absent

    got_u = {r["node"]: r["dist"]
             for r in GG.shortest_paths(df, 3, max_rounds=16,
                                        directed=False).collect()}
    assert got_u == dijkstra(3, edges, undirected=True)


def test_k_shortest_paths_yen(spark):
    """Yen K-shortest on a diamond graph with known ranking, plus
    blocked-node semantics (GNMGraph::ChangeBlockState)."""
    from osgeo_gdal_spark.operators import graph as GG

    edges = [
        (0, 1, 1.0), (1, 3, 1.0),       # path A: cost 2
        (0, 2, 1.0), (2, 3, 2.0),       # path B: cost 3
        (0, 3, 4.0),                    # path C: direct, cost 4
        (1, 2, 0.5),                    # enables 0-1-2-3: cost 3.5
    ]
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    got = GG.k_shortest_paths(df, 0, 3, k=4, max_rounds=8)
    assert [(c, p) for c, p in got] == [
        (2.0, [0, 1, 3]),
        (3.0, [0, 2, 3]),
        (3.5, [0, 1, 2, 3]),
        (4.0, [0, 3]),
    ]
    # blocking node 1 forces the 0-2-3 route
    c, p = GG.shortest_path_route(df, 0, 3, max_rounds=8, blocked={1})
    assert (c, p) == (3.0, [0, 2, 3])


def test_k_shortest_bounded_gather(spark, monkeypatch):
    """Yen never collects the full edge table (the round-3 scale-killer):
    with 500 decoy edges off every path, no single collect() in the run
    may return more than a path-bounded handful of rows, and the ranking
    is unchanged."""
    # Spark 4: the classic DataFrame subclass overrides collect(), so
    # patch the concrete class, not the pyspark.sql.DataFrame base
    from pyspark.sql.classic.dataframe import DataFrame

    from osgeo_gdal_spark.operators import graph as GG

    edges = [
        (0, 1, 1.0), (1, 3, 1.0),
        (0, 2, 1.0), (2, 3, 2.0),
        (0, 3, 4.0),
        (1, 2, 0.5),
    ]
    # decoys: a far-away component Yen's accounting must never touch
    edges += [(1000 + i, 2000 + i, 1.0) for i in range(500)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    got = GG.k_shortest_paths(df, 0, 3, k=4, max_rounds=8)
    assert [(c, p) for c, p in got] == [
        (2.0, [0, 1, 3]),
        (3.0, [0, 2, 3]),
        (3.5, [0, 1, 2, 3]),
        (4.0, [0, 3]),
    ]
    # route-reconstruction collects see reachable nodes (a handful);
    # edge-weight gathers see <= |path| rows; 506 edges must never appear
    assert max(sizes) <= 20, sizes


def test_k_shortest_exact_rounds_carry(spark, monkeypatch):
    """exact_rounds: the path-carrying one-job-per-relaxation variant
    (r7, VERDICT r6 item 4) returns the identical ranking, every
    collect stays spur-bounded (never the decoy component), and the
    scoped conf overrides (shuffle width / AQE / codegen) are restored
    on exit."""
    from pyspark.sql.classic.dataframe import DataFrame

    from osgeo_gdal_spark.operators import graph as GG

    edges = [
        (0, 1, 1.0), (1, 3, 1.0),
        (0, 2, 1.0), (2, 3, 2.0),
        (0, 3, 4.0),
        (1, 2, 0.5),
    ]
    edges += [(1000 + i, 2000 + i, 1.0) for i in range(500)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")

    before = (spark.conf.get("spark.sql.shuffle.partitions"),
              spark.conf.get("spark.sql.adaptive.enabled"),
              spark.conf.get("spark.sql.codegen.wholeStage"))

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    got = GG.k_shortest_paths(df, 0, 3, k=4, max_rounds=8,
                              shuffle_partitions=4, exact_rounds=3)
    assert [(c, p) for c, p in got] == [
        (2.0, [0, 1, 3]),
        (3.0, [0, 2, 3]),
        (3.5, [0, 1, 2, 3]),
        (4.0, [0, 3]),
    ]
    # every relaxation collect returns <= |spurs| target rows
    assert max(sizes) <= 4, sizes
    after = (spark.conf.get("spark.sql.shuffle.partitions"),
             spark.conf.get("spark.sql.adaptive.enabled"),
             spark.conf.get("spark.sql.codegen.wholeStage"))
    assert after == before


def test_shortest_paths_warns_when_not_converged(spark):
    from osgeo_gdal_spark.operators import graph as GG

    chain = [(i, i + 1, 1.0) for i in range(10)]
    df = spark.createDataFrame(chain, "src LONG, dst LONG, w DOUBLE")
    with pytest.warns(RuntimeWarning, match="no relaxation fixpoint"):
        GG.shortest_paths(df, 0, max_rounds=2)


def test_route_reconstruction_is_path_bounded(spark, monkeypatch):
    """shortest_path_route must never hold O(V) driver state: with 300
    REACHABLE decoy nodes (all at distance 1 from the source, so the
    distance table holds them all), every reconstruction collect
    returns at most one row and the total collected row count is
    path-bounded (VERDICT r4: the full (node, dist, prev) collect)."""
    from pyspark.sql.classic.dataframe import DataFrame

    from osgeo_gdal_spark.operators import graph as GG

    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    edges += [(0, 100 + i, 1.0) for i in range(300)]   # reachable decoys
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    c, p = GG.shortest_path_route(df, 0, 3, max_rounds=8)
    assert (c, p) == (3.0, [0, 1, 2, 3])
    # per-hop gathers + per-round 1-row convergence fingerprints:
    # every collect is <= 1 row; the 303-node distance table must
    # never be collected
    assert max(sizes) <= 1, sizes


def test_duplicate_substring_spans_planted(spark):
    """ExactSubstr span planning on planted fixtures: a phrase
    repeated across two docs marks exactly its token range in both;
    merging joins overlapping grams; unique docs emit no row."""
    from osgeo_gdal_spark.operators.corpus import duplicate_substring_spans

    boiler = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"one two three four {boiler}"),
            (3, "unique words only here nothing repeats"),
            # doc 4 repeats a 4-token phrase INTERNALLY -> self-dup
            (4, "x y z w q x y z w"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in
           duplicate_substring_spans(docs, k=3, min_count=2).collect()}
    assert 3 not in out
    # doc 1: boiler occupies tokens 2..6 -> grams 2,3,4 -> span [2,6]
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 5
    # doc 2: boiler occupies tokens 4..8 -> span [4,8]
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 5
    # doc 4: 'x y z w' at 0..3 and 5..8; grams (x,y,z),(y,z,w) at
    # 0,1 and 5,6 -> spans [0,3] and [5,8] (gap 5-1 > 3 keeps them
    # separate) -> 8 duplicated tokens
    assert out[4]["n_spans"] == 2 and out[4]["dup_tokens"] == 8


def test_lm_quality_scores_hand_computed(spark):
    """Bigram LM scoring on a hand fixture: doc 0 is the reference
    slice (ref_mod leaves only it), so its own bigrams score high and
    an out-of-vocabulary doc scores the floor term ln(1/V)."""
    import math

    from osgeo_gdal_spark.operators.corpus import lm_quality_scores

    docs = spark.createDataFrame(
        [
            # ref: bigrams (a,b)x2, (b,a)x1 -> c1(a)=2, c1(b)=1, V=2
            (0, "a b a b"),
            (1, "a b"),            # in-vocab: ln((2+1)/(2+2))
            (3, "z q"),            # OOV: ln((0+1)/(0+2))
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in
           lm_quality_scores(docs, ref_mod=10).collect()}

    def q(x):
        return math.floor(math.log(x) * 1048576.0 + 0.5)

    assert out[1]["n_bigrams"] == 1
    assert out[1]["lm_score_q"] == q(3.0 / 4.0)
    assert out[3]["lm_score_q"] == q(1.0 / 2.0)
    # ref doc scores itself: (a,b) twice + (b,a) once at ln((1+1)/(1+2))
    assert out[0]["lm_score_q"] == 2 * q(3.0 / 4.0) + q(2.0 / 3.0)


def test_doc_lines_and_c4_filters(spark):
    """Hand-derived C4 line stats: 10-word doc at width 8 -> lines
    ['w0..w7' + sfx(doc,0), 'w8 w9' + sfx(doc,1)]; the (doc_id+i)%4
    terminal decides survival along with the width/curly rules."""
    from osgeo_gdal_spark.operators.corpus import c4_line_stats, doc_lines

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))),   # sfx '.', then ''
         (3, " ".join(f"w{i}" for i in range(16))),   # sfx ' {', then '.'
         (2, "a b c")],                               # one short '?' line
        "doc_id LONG, text STRING",
    )
    lines = {(r["doc_id"], r["line_idx"]): r
             for r in doc_lines(docs, width=8).collect()}
    assert lines[(0, 0)]["line"].endswith("w7.")
    assert lines[(0, 1)]["line"] == "w8 w9"
    assert lines[(3, 0)]["line"].endswith("{")
    assert lines[(2, 0)]["line"] == "a b c?"
    out = {r["doc_id"]: r
           for r in c4_line_stats(doc_lines(docs, width=8),
                                  min_kept_lines=1).collect()}
    # doc 0: line0 kept (terminal '.', 8 words); line1 dropped (no punct)
    assert (out[0]["n_lines"], out[0]["n_kept"], out[0]["kept_words"],
            out[0]["doc_keep"]) == (2, 1, 8, 1)
    # doc 3: line0 curly-dropped, line1 ('w8..w15.') kept
    assert (out[3]["n_kept"], out[3]["kept_words"]) == (1, 8)
    # doc 2: '?' terminal but only 3 words -> dropped
    assert (out[2]["n_kept"], out[2]["doc_keep"]) == (0, 0)


def test_line_dedup_first_occurrence_wins(spark):
    """Global line dedup keeps the (doc_id, line_idx)-first copy of each
    duplicated line and reports per-doc drop counts."""
    from osgeo_gdal_spark.operators.corpus import (doc_lines,
                                                   line_dedup_stats)

    # width=2, punctuation off -> lines are plain 2-word chunks
    docs = spark.createDataFrame(
        [(0, "x y x y a b"),     # lines: 'x y', 'x y', 'a b'
         (1, "x y a b c"),       # lines: 'x y', 'a b', 'c'
         (2, "c")],              # line: 'c'
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in line_dedup_stats(
        doc_lines(docs, width=2, punctuate=False)).collect()}
    assert (out[0]["n_lines"], out[0]["n_dropped"]) == (3, 1)  # 2nd 'x y'
    assert (out[1]["n_lines"], out[1]["n_dropped"]) == (3, 2)  # 'x y','a b'
    assert (out[2]["n_lines"], out[2]["n_dropped"]) == (1, 1)  # 'c' in doc1
    assert out[1]["n_kept"] == 1


def test_count_min_guarantee(spark):
    """CMS one-sided error: for every actual term, min over rows of its
    bucket counter >= its true count; totals per row == token count."""
    from osgeo_gdal_spark.operators.corpus import (
        CMS_A0, CMS_B0, CMS_DA, CMS_DB, FP_MOD, FP_WORD_BASE,
        count_min_sketch)

    docs = spark.createDataFrame(
        [(0, "a b a c d a"), (1, "b e f a g"), (2, "zz yy zz a")],
        "doc_id LONG, text STRING")
    mat = {(r["row"], r["bucket"]): r["cnt"]
           for r in count_min_sketch(docs, d=4, w=8).collect()}
    toks = "a b a c d a b e f a g zz yy zz a".split()
    import collections
    true = collections.Counter(toks)

    def h(word):
        acc = 0
        for c in word:
            acc = (acc * FP_WORD_BASE + ord(c)) % FP_MOD
        return acc

    for t, n in true.items():
        est = min(
            mat.get((i, ((CMS_A0 + CMS_DA * i) * h(t)
                         + CMS_B0 + CMS_DB * i) % FP_MOD % 8), 0)
            for i in range(4))
        assert est >= n, (t, est, n)
    for i in range(4):
        assert sum(c for (r, _), c in mat.items() if r == i) == len(toks)


def test_line_tier_randomized_parity(spark):
    """200 random word-soup docs (seeded): doc_lines + c4_line_stats +
    line_dedup_stats all match a pure-python transliteration exactly."""
    import random

    from osgeo_gdal_spark.operators.corpus import (c4_line_stats,
                                                   doc_lines,
                                                   line_dedup_stats)

    rng = random.Random(42)
    vocab = ["al", "be", "cat", "do", "e", "fable{", "gi\"", "ho."]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 23))))
            for i in range(200)]
    W = 4

    def py_lines(doc_id, text):
        ws = [w for w in text.split(" ") if w != ""]
        nl = (len(ws) + W - 1) // W
        out = []
        for i in range(nl):
            lw = ws[i * W:(i + 1) * W]
            sfx = {0: ".", 1: "", 2: "?", 3: " {"}[(doc_id + i) % 4]
            out.append((i, " ".join(lw) + sfx, len(lw)))
        return out

    exp_c4, exp_dd = {}, {}
    all_lines = []
    for did, text in docs:
        ls = py_lines(did, text)
        nk = kw = 0
        for i, line, nw in ls:
            keep = line[-1] in '.?!"' and nw >= 2 and "{" not in line
            if keep:
                nk += 1
                kw += nw
            all_lines.append((did, i, line))
        exp_c4[did] = (len(ls), nk, kw, 1 if nk >= 1 else 0)
    drops = {did: 0 for did, _ in docs}
    # first occurrence ordered by (doc_id, line_idx) per line value
    best = {}
    for did, i, line in all_lines:
        k = best.get(line)
        if k is None or (did, i) < k:
            best[line] = (did, i)
    for did, i, line in all_lines:
        if best[line] != (did, i):
            drops[did] += 1

    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    lines = doc_lines(df, width=W)
    got_c4 = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_words"],
                            r["doc_keep"])
              for r in c4_line_stats(lines, min_words=2,
                                     min_kept_lines=1).collect()}
    assert got_c4 == exp_c4
    got_dd = {r["doc_id"]: r["n_dropped"]
              for r in line_dedup_stats(lines).collect()}
    assert got_dd == drops
