"""Operator-level semantics for the training-data pipeline ops (the parts
the SQL-oracle gate can't see: LSH candidate quality, SimHash locality,
ANN recall vs the exact baseline)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osgeo_gdal_spark.operators import dedup as DD, similarity as SIM
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet").cache()


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    """Plant exact near-dups (doc copies with one word changed) and check
    the LSH pipeline surfaces them as candidates."""
    base = docs.limit(5).select("doc_id", "text")
    clones = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    corpus = base.unionByName(clones)
    sig = DD.minhash_signatures(DD.shingles(corpus, n=3), num_hashes=16)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in DD.lsh_candidate_pairs(sig, 4, 4).collect()}
    for r in base.collect():
        assert (r["doc_id"], r["doc_id"] + 1_000_000) in pairs


def test_simhash_locality(spark, docs):
    """A doc and its near-copy get near-identical simhashes (small Hamming
    distance); unrelated docs are far."""
    base = docs.limit(2).select("doc_id", "text")
    clone = base.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    sh = {r["doc_id"]: r["simhash"]
          for r in DD.simhash64(base.unionByName(clone)).collect()}
    ids = sorted(k for k in sh if k < 1_000_000)
    near = bin(sh[ids[0]] ^ sh[ids[0] + 1_000_000]).count("1")
    far = bin(sh[ids[0]] ^ sh[ids[1]]).count("1")
    assert near <= 8 < far


def test_jaccard_identical_is_one(spark, docs):
    base = docs.limit(3).select("doc_id", "text")
    pairs = base.select(
        F.col("doc_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    out = DD.jaccard_pairs(base, pairs).collect()
    assert all(r["jaccard"] == 1.0 for r in out)


def test_ann_lsh_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = SIM.cosine_topk(emb, queries, k=3)
    tables = [SIM.hyperplanes(64, 3, seed=s) for s in range(1, 9)]
    approx = SIM.ann_topk_lsh(emb, queries, tables, k=3)
    ex = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5  # 8 tables x 3 bits: high union recall
    # every approx hit must be a genuine embedding (sanity)
    assert all(q != v for q, v in ap)


def test_lsh_bucket_is_deterministic(spark, emb):
    planes = SIM.hyperplanes(64, 6)
    a = {r["vec_id"]: r["lsh_bucket"]
         for r in SIM.with_lsh_bucket(emb.limit(50), planes).collect()}
    b = {r["vec_id"]: r["lsh_bucket"]
         for r in SIM.with_lsh_bucket(emb.limit(50), planes).collect()}
    assert a == b and len(set(a.values())) > 1


def test_cosine_topk_matmul_matches_fold(spark, emb):
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = SIM.cosine_topk(emb, queries_df, k=3)
    qlist = [(r["qid"], r["qvec"]) for r in queries_df.collect()]
    fast = SIM.cosine_topk_matmul(emb, qlist, k=3)
    a = {(r["qid"], r["rank"]): r["vec_id"] for r in exact.collect()}
    b = {(r["qid"], r["rank"]): r["vec_id"] for r in fast.collect()}
    assert a == b


def test_ann_lsh_plan_is_hash_join_not_bnlj(spark, emb):
    from osgeo_gdal_spark.operators import similarity as SIM

    queries = emb.limit(2).selectExpr("vec_id AS qid", "embedding AS qvec")
    tables = [SIM.hyperplanes(16, 4, seed=s) for s in (1, 2)]
    plan = (SIM.ann_topk_lsh(emb, queries, tables, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_lsh_hot_bucket_cap_drops_mega_bucket(spark, docs):
    from osgeo_gdal_spark.operators import dedup as DD

    # plant a template family: 40 docs with IDENTICAL text -> identical
    # minhash signatures -> one bucket of 40 per band
    import pandas as pd

    template = pd.DataFrame({
        "doc_id": range(100000, 100040),
        "text": ["the same boilerplate template page body " * 4] * 40,
    })
    base = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(template))
    sig = DD.minhash_signatures(DD.shingles(base), 16)

    uncapped = DD.lsh_candidate_pairs(sig, 4, 4)
    capped = DD.lsh_candidate_pairs(sig, 4, 4, max_bucket=10)
    mega = uncapped.filter((F.col("doc_a") >= 100000) & (F.col("doc_b") >= 100000))
    assert mega.count() == 40 * 39 // 2
    assert capped.filter(
        (F.col("doc_a") >= 100000) & (F.col("doc_b") >= 100000)
    ).count() == 0
    # pairs among normal docs are unaffected by the cap
    norm_a = {tuple(r) for r in uncapped.filter(F.col("doc_b") < 100000).collect()}
    norm_b = {tuple(r) for r in capped.filter(F.col("doc_b") < 100000).collect()}
    assert norm_a == norm_b

    stats = DD.lsh_bucket_stats(sig, 4, 4, max_bucket=10).collect()
    assert all(r["buckets_dropped"] >= 1 for r in stats)
    assert all(r["docs_dropped"] >= 40 for r in stats)
