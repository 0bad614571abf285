"""Text-analysis library: tokenization, quality stats, language scoring,
fingerprints. All native Column expressions (codegen'd, shuffle-free);
the oracle-checked query forms live in ``queries.extensions``."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "\\s+"


def shingles(text_col: str, n: int = 5) -> Column:
    """Distinct character n-gram set (array<string>) of the named column."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
            f" i -> substring({text_col}, i, {n}))"
        )
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features: token/char/space counts, mean token
    length, uppercase ratio, punctuation density — the cheap per-document
    filters a training-data pipeline runs before anything expensive."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(F.trim(t), TOKEN_SPLIT)).cast("long")
    no_space = F.replace(t, F.lit(" "), F.lit(""))
    return docs.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars": F.length(t).cast("long"),
            "avg_token_len": F.length(no_space).cast("double") / n_tokens,
            "upper_ratio": (
                F.length(F.regexp_replace(t, "[^A-Z]", "")).cast("double")
                / F.greatest(F.length(t), F.lit(1))
            ),
            "punct_ratio": (
                F.length(F.regexp_replace(t, "[^.,;:!?]", "")).cast("double")
                / F.greatest(F.length(t), F.lit(1))
            ),
        }
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_avg_token_len: float = 20.0,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """The standard cheap quality gate (C4-style heuristics): drop docs that
    are too short, token-degenerate, or punctuation-soup."""
    stats = token_stats(docs, text_col)
    return stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("avg_token_len") <= max_avg_token_len)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )


def fingerprint(text: Column | str, modulus: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash of the full text (engine-portable content
    identity; see queries.extensions.x_fingerprint for the oracle twin)."""
    t = text if isinstance(text, str) else None
    assert t is not None, "pass a column name"
    return F.expr(
        f"aggregate(transform(split({t}, ''), c -> cast(ascii(c) as bigint)),"
        f" cast(0 as bigint), (acc, c) -> (acc*31 + c) % {modulus})"
    )


def lang_scores(docs: DataFrame, keywords: dict[str, list[str]], text_col: str = "text") -> DataFrame:
    """Stopword-marker language scores (one column per language) + argmax
    guess. ``keywords`` maps lang -> marker tokens."""
    t = f"(' ' || {text_col} || ' ')"
    out = docs
    for lang, kws in keywords.items():
        expr = " + ".join(
            f"CAST((length({t}) - length(replace({t}, ' {kw} ', ''))) / {len(kw) + 2} AS BIGINT)"
            for kw in kws
        )
        out = out.withColumn(f"score_{lang}", F.expr(expr))
    langs = list(keywords)
    guess = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return out.withColumn("lang_guess", guess)
