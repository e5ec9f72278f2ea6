"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side Spark column expressions (whole-stage codegen,
no Python) and are written to be expressible 1:1 in ANSI SQL so the
driver's DuckDB oracle can verify them value-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# words used by the portable language-ID heuristic and stopword ratio
_STOPWORDS = ["the", "and", "of", "to", "in"]

# marker-based language ID: deterministic, byte-equal in Spark and DuckDB
_LANG_MARKERS = [
    ("zh", "的"),
    ("ru", "и "),
    ("ja", "の"),
    ("de", " der "),
    ("fr", " le "),
    ("es", " el "),
]


def token_count_col(text: Column) -> Column:
    """Whitespace token count via length arithmetic (portable, no regex)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("long")


def token_count_sql(text: str = "text") -> str:
    t = f"trim({text})"
    return (
        f"CASE WHEN length({t}) = 0 THEN 0 "
        f"ELSE length({t}) - length(replace({t}, ' ', '')) + 1 END"
    )


def punct_ratio_col(text: Column) -> Column:
    """Fraction of . , ! ? ; characters (portable via replace-length)."""
    total = F.length(text)
    stripped = text
    for ch in [".", ",", "!", "?", ";"]:
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        (total - F.length(stripped)).cast("double") / total.cast("double")
    )


def punct_ratio_sql(text: str = "text") -> str:
    inner = text
    for ch in [".", ",", "!", "?", ";"]:
        inner = f"replace({inner}, '{ch}', '')"
    return (
        f"CASE WHEN length({text}) = 0 THEN 0.0 "
        f"ELSE CAST(length({text}) - length({inner}) AS DOUBLE) / length({text}) END"
    )


def stopword_hits_col(text: Column) -> Column:
    """Occurrences of common stopwords (surrounded by spaces)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0)
    for w in _STOPWORDS:
        pat = f" {w} "
        cnt = (
            F.length(padded)
            - F.length(F.replace(padded, F.lit(pat), F.lit("")))
        ) / len(pat)
        total = total + cnt
    return total.cast("long")


def stopword_hits_sql(text: str = "text") -> str:
    padded = f"concat(' ', lower({text}), ' ')"
    parts = []
    for w in _STOPWORDS:
        pat = f" {w} "
        parts.append(
            f"(length({padded}) - length(replace({padded}, '{pat}', ''))) / {len(pat)}"
        )
    return f"CAST({' + '.join(parts)} AS BIGINT)"


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score: length band + punctuation sanity +
    stopword presence.  Same arithmetic as quality_score_sql."""
    n = F.length(text).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct = punct_ratio_col(text)
    punct_score = F.when(punct > 0.2, F.lit(0.0)).otherwise(F.lit(1.0) - punct * 2)
    stop_score = F.least(
        stopword_hits_col(text).cast("double") / F.greatest(
            token_count_col(text).cast("double"), F.lit(1.0)
        ) * F.lit(10.0),
        F.lit(1.0),
    )
    return F.round((len_score + punct_score + stop_score) / F.lit(3.0), 6)


def quality_score_sql(text: str = "text") -> str:
    n = f"CAST(length({text}) AS DOUBLE)"
    len_score = f"least({n} / 500.0, 1.0)"
    punct = punct_ratio_sql(text)
    punct_score = f"CASE WHEN ({punct}) > 0.2 THEN 0.0 ELSE 1.0 - ({punct}) * 2 END"
    stop_score = (
        f"least(CAST(({stopword_hits_sql(text)}) AS DOUBLE) / "
        f"greatest(CAST(({token_count_sql(text)}) AS DOUBLE), 1.0) * 10.0, 1.0)"
    )
    return f"round(({len_score} + {punct_score} + {stop_score}) / 3.0, 6)"


def lang_id_col(text: Column) -> Column:
    """Marker-based language guess (portable CASE chain)."""
    expr = None
    for lang, marker in _LANG_MARKERS:
        cond = F.contains(text, F.lit(marker))
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("en"))


def lang_id_sql(text: str = "text") -> str:
    whens = " ".join(
        f"WHEN contains({text}, '{marker}') THEN '{lang}'"
        for lang, marker in _LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'en' END"


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 hex (portable across Spark and DuckDB)."""
    return F.md5(text)


def fingerprint_sql(text: str = "text") -> str:
    return f"md5({text})"


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document text analysis: the composite operator."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars_measured"),
        token_count_col(t).alias("n_tokens"),
        punct_ratio_col(t).alias("punct_ratio"),
        stopword_hits_col(t).alias("stopword_hits"),
        quality_score_col(t).alias("quality"),
        lang_id_col(t).alias("lang_guess"),
        fingerprint_col(t).alias("fingerprint"),
    )
