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
