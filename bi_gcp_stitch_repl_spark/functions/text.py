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


def build_vocab(
    docs: DataFrame, vocab_size: int, text_col: str = "text"
) -> DataFrame:
    """(token, token_id) for the ``vocab_size`` most frequent whitespace
    tokens; id = 1-based frequency rank with deterministic (count DESC,
    token ASC) tiebreak, 0 reserved for OOV.

    Scale: the corpus-wide count is a map-side-combinable groupBy (the
    only corpus-linear stage); ranking then runs on the DISTINCT-TERM set,
    which is vocabulary-sized (Heaps' law: ~1e6 terms for a 100 TB web
    corpus), so the single-partition row_number window is a deliberate
    non-issue — never corpus-scale data through it."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(F.split(text_col, " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("token_id", F.row_number().over(w).cast("int"))
        .filter(F.col("token_id") <= vocab_size)
        .select("token", "token_id")
    )


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, token_ids) — each document's whitespace tokens mapped
    through ``vocab`` (OOV → 0), order preserved. The vocabulary is
    broadcast (it is bounded by vocab_size); the corpus side is explode →
    broadcast-hash left join → ordered regroup, linear with no
    corpus-side shuffle except the per-document regroup."""
    tok = docs.select(
        id_col, F.posexplode(F.split(text_col, " ")).alias("pos", "token")
    )
    enc = tok.join(F.broadcast(vocab), "token", "left").withColumn(
        "tid", F.coalesce("token_id", F.lit(0)).cast("int")
    )
    return enc.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.expr("transform(array_sort(collect_list(struct(pos, tid))), x -> x.tid)")
        .alias("token_ids"),
    )
