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
