"""Text-analysis operators for training-data pipelines: quality scoring,
token counting, document fingerprinting (SQL-twinned), and an n-gram
language-ID heuristic (pandas-UDF, rows-only checked).

All SQL-twinned transforms use only functions with exact DuckDB equivalents
(md5-prefix hash64, regexp_*, split) so the oracle comparison is bit-stable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

from .dedup import hash64, normalized_words

STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it", "on", "for")

# BPE-ish tokenization regex: letter runs / digit runs / single other glyphs
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    words = normalized_words(F.col(text_col))
    return docs.select(
        id_col,
        F.size(words).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars_computed"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: token count, mean token length, stopword
    ratio, punctuation ratio, and a combined [0,1] score — the standard
    pre-training corpus filters, all JVM-side."""
    words = normalized_words(F.col(text_col))
    n = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"), 0))
    mean_len = F.round(
        F.aggregate(words, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / F.greatest(n, F.lit(1)),
        6,
    )
    stop_ratio = F.round(n_stop / F.greatest(n, F.lit(1)), 6)
    punct_ratio = F.round(n_punct / F.greatest(F.length(text_col), F.lit(1)), 6)
    score = F.round(
        F.least(n / F.lit(100.0), F.lit(1.0)) * (1 - punct_ratio)
        * F.when((stop_ratio > 0.02) & (stop_ratio < 0.6), 1.0).otherwise(0.5),
        6,
    )
    return docs.select(
        id_col,
        n.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: the two smallest char-k-gram hashes per
    document (min + runner-up) — a compact near-dup / containment sketch.

    Scale shape: rank-≤2 via a window (sorts spill to disk) instead of
    ``sort_array(collect_list(...))`` — the collect_list form materializes
    every gram hash of a document in one aggregation buffer, O(doc_len)
    executor memory per group."""
    from pyspark.sql import Window

    grams = docs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(text_col) - k + 1, F.lit(1))),
                lambda i: F.col(text_col).substr(i, F.lit(k)),
            )
        ).alias("gram"),
    ).withColumn("gh", hash64(F.col("gram")))
    w = Window.partitionBy(id_col).orderBy("gh")
    two = grams.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 2)
    # duplicates of the minimum preserved: rn=2 can carry the same value as
    # rn=1, exactly like sorted_list[1]; a single-gram doc yields NULL
    return two.groupBy(id_col).agg(
        F.min("gh").alias("fp_min"),
        F.max(F.when(F.col("_rn") == 2, F.col("gh"))).alias("fp_second"),
    )


# ---------------------------------------------------------------- language ID
_LANG_PROFILES = {
    # tiny public-knowledge character-trigram hint lists; the heuristic is the
    # operator under test, not linguistic accuracy
    "en": (" th", "the", "ing", " an", "and", " of", "ion"),
    "es": (" de", "de ", " la", "os ", " el", "ión", " qu"),
    "fr": (" le", "es ", " de", "de ", "ent", " la", "que"),
    "de": ("en ", "er ", " de", "der", "ch ", "ein", "sch"),
    "zh": tuple(),  # CJK detected by codepoint range instead
}


def lang_id_py(text: str) -> str:
    if any("一" <= c <= "鿿" for c in text[:400]):
        return "zh"
    t = f" {text.lower()} "
    best, best_score = "en", -1.0
    for lang, tris in _LANG_PROFILES.items():
        if not tris:
            continue
        score = sum(t.count(tri) for tri in tris) / max(len(t), 1)
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Vectorized n-gram language-ID heuristic (no model download — a pure
    trigram-profile scorer). Rows-only correctness (not SQL-expressible)."""

    @F.pandas_udf(T.StringType())
    def _lang(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(lang_id_py)

    return docs.select(id_col, _lang(F.col(text_col)).alias("lang_pred"))
