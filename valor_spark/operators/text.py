"""Text-analysis operators for training-data pipelines over ``documents``.

All pure Column expressions (JVM-side, whole-stage codegen) — language ID,
quality scoring, token counting, fingerprinting.  Each is written so an
identical ANSI-SQL formulation exists (the DuckDB oracle in
``__spark_entry__.py``): same tokenization regex, same rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (heuristic language ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "in"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "de", "que", "y"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization, lowercased, empty tokens dropped.
    SQL equivalent: list_filter(string_split_regex(lower(x), '\\s+'), t -> t != '')."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def marker_hits(col: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker set."""
    toks = tokens(col)
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(col: Column) -> Column:
    """Pick the language whose marker set hits most tokens; ties and
    zero-hit rows -> 'und'.  Deterministic tie-break: higher count wins,
    then language-key order en > de > fr > es (strict > comparisons)."""
    hits = {lang: marker_hits(col, ms) for lang, ms in LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # first language wins ties via strict >
        h = hits[lang]
        is_better = h > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, h).otherwise(best_n)
    return best


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation [.,!?;:]."""
    stripped = F.regexp_replace(col, r"[.,!?;:]", "")
    return F.when(F.length(col) > 0,
                  (F.length(col) - F.length(stripped)) / F.length(col)
                  ).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n = F.size(toks)
    return F.when(
        n > 0, F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards moderate length, low
    punctuation density, and presence (but not dominance) of stopwords."""
    n = token_count(col)
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5)
    sw = stopword_ratio(col)
    sw_score = F.when((sw > 0.05) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score * 0.4 + punct_pen * 0.3 + sw_score * 0.3), 4)


def fingerprint(col: Column, length: int = 16) -> Column:
    """Document fingerprint: md5 prefix of whitespace-normalized lowercase
    text — stable across engines (md5 is md5 everywhere)."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.substring(F.md5(norm), 1, length)


def bigrams(col: Column) -> Column:
    """Adjacent token pairs as 'a b' strings (order-preserving).
    SQL equivalent: list_transform over 1..len-1 with array indexing."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        )
    )


def top_bigrams(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level top-k bigrams by document frequency (one explode +
    one aggregation; ties broken by bigram text for determinism)."""
    from pyspark.sql.window import Window

    exploded = df.select(F.explode(bigrams(F.col(text_col))).alias("bigram"))
    counts = exploded.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("bigram", "n", "rank")
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-select profile: tokens, ratios, language, quality, fingerprint."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        lang_id(c).alias("pred_lang"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )
