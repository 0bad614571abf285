"""Bloom-filter n-gram membership: the fixed-size decontamination prefilter.

``functions.curation.decontaminate`` broadcasts the benchmark's gram
STRINGS — exact, but the broadcast grows with the eval suite and every
comparison ships full gram text. Production corpus pipelines (the
Dolma/RedPajama-style bloom decontamination pass) replace that with an
m-bit Bloom filter: each gram sets k bit positions derived from its hash,
membership is "all k positions set", and the only thing that ever moves is
a FIXED-SIZE bitset — false positives are possible (measured, tunable via
m/k), false negatives are not.

This module keeps the filter in relational form — the set of SET bit
positions as a tiny DataFrame — so the whole operator stays inside
Catalyst (broadcast-hash semi-join on an int key, zero UDFs) and the exact
twin is plain SQL for the DuckDB oracle. Packing those positions into an
actual bitmask blob is a sink-side storage detail, not a plan change: the
join on position ints IS the bit probe.

Determinism contract (catalog rules): positions come from the portable
polynomial fold + xorshift finalizer (``functions.curation.
mixed_fold_spark``), never engine-specific hashes; ``BLOOM_M`` is prime so
one gram's k double-hashed positions are pairwise distinct and
"all k present" is a plain ``count == k``.

Reference parity note: the reference platform has no curation stage
(SURVEY.md §0) — this is §7.6 LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import mixed_fold_spark, word_ngram_expr

#: 2^17 - 1, a Mersenne prime. Primality is load-bearing: with step
#: h2 in [1, M), the double-hashed positions (h1 + i*h2) mod M are
#: pairwise distinct for i < M, so a gram always probes exactly k
#: DISTINCT bits and the membership test is count-of-matches == k.
BLOOM_M = 131_071
BLOOM_K = 3


def bloom_positions(gram_col: str, m: int = BLOOM_M, k: int = BLOOM_K) -> Column:
    """``array<bigint>`` of the k Bloom bit positions for a gram string.

    Classic double hashing (Kirsch–Mitzenmacher): one well-mixed 30-bit
    hash h supplies both the base position (low bits, ``h mod m``) and the
    step (high bits, ``1 + (h div m) mod (m-1)``), so k positions cost ONE
    string hash — the per-gram work is O(|gram| + k), not O(k·|gram|).
    The hash is LET-bound through a one-element ``transform`` (the
    word_ngram_expr lesson: Catalyst re-evaluates textual repetition)."""
    h = mixed_fold_spark(gram_col)
    pos = (
        f"((_g % {m}) + cast(i as bigint) * (1 + ((_g div {m}) % {m - 1}))) % {m}"
    )
    return F.expr(
        f"transform(array({h}), _g -> transform(sequence(0, {k - 1}), i -> {pos}))[0]"
    )


def bloom_bit_set(
    bench: DataFrame,
    text_col: str = "text",
    n: int = 8,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """The Bloom filter itself: the distinct set bit positions (column
    ``p``) of every word n-gram in ``bench``. At most ``m`` rows of one
    int64 no matter how large the eval suite grows — the fixed-size
    broadcast that replaces the gram-string set."""
    grams = bench.select(
        F.explode(F.expr(word_ngram_expr(text_col, n))).alias("gram")
    ).distinct()
    return (
        grams.select(F.explode(bloom_positions("gram", m, k)).alias("p")).distinct()
    )


def bloom_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    audit_exact: bool = True,
) -> DataFrame:
    """Flag training docs sharing a word n-gram with ``bench`` through the
    Bloom filter; per-doc output ``(id, n_bloom_grams, n_exact_grams,
    bloom_flagged, exact_flagged)``.

    Plan shape (the 100 TB story): the bench side collapses to the
    position set (≤ m rows — FIXED size, always broadcastable); the train
    side explodes each distinct per-doc gram to its k positions and
    broadcast-joins on the int key, then ``count == k`` per gram decides
    membership. Corpus text never shuffles; the only exchange is the
    per-doc count aggregation on ``id_col``. False positives are the m/k
    tradeoff, false negatives impossible (every exact-hit gram's
    positions are in the set by construction).

    ``audit_exact=True`` additionally runs the exact gram-string
    semi-join (``n_exact_grams``) so the false-positive rate is measured
    IN the result — ``n_bloom_grams >= n_exact_grams`` row-by-row is the
    operator's invariant. Production runs at scale disable the audit: the
    exact branch is the measurement, not the operator."""
    gram_arr = word_ngram_expr(text_col, n)
    tg = train.select(id_col, F.explode(F.expr(gram_arr)).alias("gram"))
    # The position set is ≤ m rows of one int64 NO MATTER how large the
    # bench side grows (unlike decontaminate's gram-string set, which is
    # why that one must leave the broadcast decision to AQE) — a forced
    # broadcast here is safe by construction, the filter's whole point.
    bloom = F.broadcast(bloom_bit_set(bench, text_col=text_col, n=n, m=m, k=k))
    tpos = tg.select(id_col, "gram", F.explode(bloom_positions("gram", m, k)).alias("p"))
    n_bloom = (
        tpos.join(bloom, "p")
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == k)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bloom_grams"))
    )
    out = train.select(id_col).join(n_bloom, id_col, "left")
    if audit_exact:
        bg = bench.select(
            F.explode(F.expr(gram_arr)).alias("gram")
        ).distinct()
        n_exact = (
            tg.join(bg, "gram", "left_semi")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_exact_grams"))
        )
        out = out.join(n_exact, id_col, "left")
    else:
        out = out.withColumn("n_exact_grams", F.lit(None).cast("long"))
    return out.select(
        id_col,
        F.coalesce("n_bloom_grams", F.lit(0)).cast("long").alias("n_bloom_grams"),
        F.coalesce("n_exact_grams", F.lit(0)).cast("long").alias("n_exact_grams"),
        (F.coalesce("n_bloom_grams", F.lit(0)) > 0).alias("bloom_flagged"),
        (F.coalesce("n_exact_grams", F.lit(0)) > 0).alias("exact_flagged"),
    )
