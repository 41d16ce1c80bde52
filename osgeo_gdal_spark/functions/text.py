"""Text-analysis column functions for the training-data pipeline.

All of these are native Spark SQL expressions (JVM-side, codegen'd) built
from the portable fragments in sqlgen.py, so each has an exact DuckDB
oracle. They cover the text-side operator set a 100 TB web-text pipeline
needs: token counting, quality scoring, language-ID heuristics, document
fingerprinting. (OGR SQL's string operator registry,
``/root/reference/ogr/swq_op_registrar.cpp:29-61``, is the reference
precedent for the expression surface.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from . import sqlgen as G

# language marker words; counts are computed with exact length arithmetic
LANG_MARKERS = {
    "en": [" the ", " and "],
    "de": [" der ", " und "],
    "fr": [" le ", " et "],
    "es": [" el ", " los "],
}

STOPWORDS = [" the ", " a ", " and ", " of ", " to "]


def token_count(text: str = "text") -> Column:
    return F.expr(G.token_count_sql(text))


def stopword_count_sql(text: str) -> str:
    terms = " + ".join(G.substring_count_sql(text, w) for w in STOPWORDS)
    return f"({terms})"


def quality_score_sql(text: str) -> str:
    """Quality ratio in [0,1]: stopword tokens per token (web-text
    quality heuristics, C4/Gopher-style) — pure arithmetic."""
    tok = G.token_count_sql(text)
    stop = stopword_count_sql(text)
    return f"(CASE WHEN {tok} = 0 THEN {G.D(0.0)} ELSE {stop} / ({tok} * {G.D(1.0)}) END)"


def lang_scores_sql(text: str) -> dict[str, str]:
    return {
        lang: " + ".join(G.substring_count_sql(text, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_pred_sql(text: str) -> str:
    """Argmax language by marker-word counts, deterministic tie-break by
    the fixed CASE order (en > de > fr > es > unknown)."""
    s = lang_scores_sql(text)
    scores = list(s.items())
    greatest = f"GREATEST({', '.join(v for _, v in scores)})"
    whens = " ".join(
        f"WHEN ({v}) = __g AND ({v}) > 0 THEN '{k}'" for k, v in scores
    )
    # inline __g via a nested expression (no variables in portable SQL)
    whens_inline = whens.replace("__g", greatest)
    return f"(CASE {whens_inline} ELSE 'unknown' END)"


def fingerprint_sql(text: str) -> str:
    """Deterministic document fingerprint: md5 of lowercased text (the
    normalize step keeps to lower() only — regexp semantics differ between
    engines)."""
    return f"MD5(LOWER({text}))"


def canonical_url_spark(url: str) -> Column:
    """URL canonicalization (the classic crawl-dedup normalizer:
    lowercase scheme/host, strip default ports and the ``www.`` prefix,
    drop the fragment and ``utm_*`` tracking params, sort the remaining
    query params, strip ``/index.html`` and the trailing slash) as a
    native Spark Column. ``canonical_url_duckdb_sql`` is the
    string-identical DuckDB twin — the regex patterns are kept inside
    the Java∩RE2 compatible subset."""
    scheme = F.lower(F.regexp_extract(F.col(url), r"^([A-Za-z]+)://", 1))
    hostport = F.lower(
        F.regexp_extract(F.col(url), r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.when(scheme == "http",
               F.regexp_replace(hostport, r":80$", ""))
        .otherwise(F.regexp_replace(hostport, r":443$", "")),
        r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(F.col(url), r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        r"/index\.html$", "")
    path = F.regexp_replace(path, r"/$", "")
    q = F.regexp_extract(F.col(url), r"\?([^#]*)", 1)
    q2 = F.array_join(
        F.array_sort(F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.startswith("utm_"))),
        "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def canonical_url_duckdb_sql(url: str) -> str:
    """DuckDB twin of ``canonical_url_spark`` (same steps, same regex
    subset; list_aggregate string_agg joins the sorted params)."""
    scheme = f"LOWER(regexp_extract({url}, '^([A-Za-z]+)://', 1))"
    hostport = f"LOWER(regexp_extract({url}, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = (
        f"regexp_replace(CASE WHEN {scheme} = 'http' THEN "
        f"regexp_replace({hostport}, ':80$', '') ELSE "
        f"regexp_replace({hostport}, ':443$', '') END, '^www\\.', '')"
    )
    path = (
        f"regexp_replace(regexp_replace("
        f"regexp_extract({url}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), "
        f"'/index\\.html$', ''), '/$', '')"
    )
    q = f"regexp_extract({url}, '\\?([^#]*)', 1)"
    q2 = (
        f"COALESCE(list_aggregate(list_sort(list_filter("
        f"string_split({q}, '&'), "
        f"x -> x <> '' AND NOT starts_with(x, 'utm_'))), "
        f"'string_agg', '&'), '')"
    )
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {q2} = '' THEN '' ELSE '?' || {q2} END)"
    )


# conservative PII patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): character classes + bounded quantifiers only
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[A-Za-z0-9./_-]+"
PII_LONG_DIGITS = r"[0-9]{7,}"


def pii_stats(col):
    """PII scrubbing report for a text Column — the curation step that
    runs before corpus publication (no reference analog; LLM tier):
    counts of emails / URLs / long digit runs (phone-ish), plus the
    text length after masking all three with fixed tags. NATIVE
    column expressions (regexp_count / regexp_replace, whole-stage
    codegen); the patterns are the Java-regex AND RE2-compatible
    subset so the DuckDB oracle uses them verbatim. Returns a struct
    column (n_email, n_url, n_digits, masked_len)."""
    from pyspark.sql import functions as F

    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, PII_EMAIL, "<EMAIL>"),
            PII_URL, "<URL>"),
        PII_LONG_DIGITS, "<NUM>")
    return F.struct(
        F.regexp_count(col, F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(col, F.lit(PII_URL)).alias("n_url"),
        F.regexp_count(col, F.lit(PII_LONG_DIGITS)).alias("n_digits"),
        F.length(masked).alias("masked_len"),
    )
