"""Corpus-curation operators for the training-data pipeline tier.

The filters every 100 TB web-text run applies between dedup and
training (all public-recipe methods — Gopher/C4 repetition quality
rules, benchmark decontamination by contiguous n-gram overlap, and
deterministic stratified sampling). Everything here is native Spark SQL
(JVM-side, codegen'd) — no Python in the hot path — and each operator
has an exact DuckDB oracle in entry_queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles


def repetition_stats(docs: DataFrame, text_col="text",
                     id_col="doc_id") -> DataFrame:
    """Word-level repetition quality metrics (the Gopher rules' word
    tier; the documents table is single-line so the line-based rules
    don't apply): per doc —

      n_words        whitespace token count,
      top2_cnt       occurrences of the MOST FREQUENT word bigram,
      rep_frac       top2_cnt / (n_words - 1)  (top-2-gram fraction),
      uniq_frac      distinct words / words.

    A Gopher-style filter drops docs with rep_frac above ~0.18; emitting
    the metrics (not the verdict) keeps the threshold a caller choice.

    Plan: split + native transform builds bigrams (no UDF), one
    groupBy(doc, bigram) partial-aggregated count, one per-doc max —
    shuffles carry (doc, bigram) counts, never text.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("ts"),
    )
    base = toks.select(
        "doc_id",
        F.size("ts").alias("n_words"),
        F.size(F.array_distinct("ts")).alias("n_uniq"),
    )
    # guard: sequence(0, -1) DESCENDS in Spark (ROUND_NOTES trap), so a
    # 1-word doc would index ts[1]; single-word docs have no bigrams.
    bg = toks.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ts) - 2), "
                "i -> concat(ts[i], ' ', ts[i + 1]))"
            )
        ).alias("bigram"),
    )
    top = (
        bg.groupBy("doc_id", "bigram").count()
        .groupBy("doc_id").agg(F.max("count").alias("top2_cnt"))
    )
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id", "n_words",
            F.coalesce("top2_cnt", F.lit(0)).alias("top2_cnt"),
            # guard: ANSI div-by-zero on 1-word docs -> NULL rep_frac
            F.when(
                F.col("n_words") > 1,
                F.coalesce("top2_cnt", F.lit(0))
                / (F.col("n_words") - F.lit(1)).cast("double"),
            ).alias("rep_frac"),
            (F.col("n_uniq") / F.col("n_words").cast("double")).alias("uniq_frac"),
        )
    )


def benchmark_phrases(docs: DataFrame, seed_ids, n=5, text_col="text",
                      id_col="doc_id"):
    """Deterministic 'benchmark' set: the first ``n`` words of each seed
    document — the planted eval-set stand-in for decontamination tests.
    Returns a list of phrase strings (driver-side; benchmarks are tiny
    by nature)."""
    rows = (
        docs.filter(F.col(id_col).isin(list(seed_ids)))
        .select(
            F.col(id_col).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(F.split(F.col(text_col), " "), 1, n)
            ).alias("phrase"),
        )
        .collect()
    )
    return sorted(r["phrase"] for r in rows)


def decontaminate(docs: DataFrame, phrases, n=5, text_col="text",
                  id_col="doc_id") -> DataFrame:
    """Benchmark decontamination by contiguous word n-gram overlap (the
    GPT-3/PaLM 13-gram recipe at fixture-friendly n): a document is
    contaminated when it CONTAINS any benchmark phrase as a contiguous
    word run. Returns (doc_id, n_hits) for contaminated docs, where
    n_hits is the number of DISTINCT benchmark phrases present (corpus
    shingles are distinct per doc — matching the LIKE-join oracle,
    which also counts each phrase at most once per doc).

    Plan: corpus word n-gram shingles (native transform) equi-join the
    broadcast benchmark phrase table — the join key is the shingle
    string, so work is O(matching shingles), never text × benchmarks.
    """
    spark = docs.sparkSession
    bench = spark.createDataFrame(
        [(p,) for p in phrases], "shingle STRING"
    )
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    hits = sh.join(F.broadcast(bench), "shingle")
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_hits"))


def stratified_sample(docs: DataFrame, rates: dict, default_pct=20,
                      strat_col="lang", id_col="doc_id") -> DataFrame:
    """Deterministic stratified sampling: keep a document when
    ``doc_id % 100 < pct(stratum)``. Reproducible across runs/engines
    (no RNG), exactly the property a 100 TB curation run needs for
    resumable sampling. Returns per-stratum (stratum, n_total, n_kept).
    """
    pct = F.lit(int(default_pct))
    for k, v in sorted(rates.items()):
        pct = F.when(F.col(strat_col) == k, F.lit(int(v))).otherwise(pct)
    keep = (F.col(id_col) % 100) < pct
    return (
        docs.groupBy(F.col(strat_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_kept"),
        )
    )
