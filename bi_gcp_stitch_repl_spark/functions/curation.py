"""Training-data curation operators: decontamination, mixture sampling,
sequence packing.

The reference replicates SaaS tables into a warehouse (SURVEY.md §0); a
100 TB training-data pipeline additionally has to CURATE what it lands:

* **benchmark decontamination** — drop/flag training documents that share
  an n-gram with an evaluation set (the standard GPT-3/PaLM-style 8-gram
  overlap rule). The eval set is tiny and the corpus is huge, so the
  scalable shape is: build the eval n-gram set once, broadcast it, and
  stream the corpus through a broadcast semi-join — zero shuffle of the
  corpus text.
* **mixture sampling** — deterministic per-source sampling rates (data
  mixing). Hash-mod sampling, not `rand()`: re-runs pick the same rows,
  so downstream incremental merges stay idempotent, and the sample is
  reproducible across cluster sizes because it depends only on the key.
* **sequence packing** — stream documents in a stable order into
  fixed-token-budget bins (context windows). Expressed as a running-sum
  window per shard: one shuffle on the shard key, no driver state;
  shards pack independently, which is exactly how a 1000-executor run
  wants it.

All three are pure DataFrame ops — no UDFs, fully whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _sql_str

#: polynomial fold of a string to [0, P) — portable across Spark and DuckDB
#: (same fragment family as queries.extensions; kept here so library users
#: get deterministic sampling without importing the query catalog).
HASH_P = 1_000_000_007
FOLD_SPARK = (
    "aggregate(transform(split({s}, ''), c -> cast(ascii(c) as bigint)),"
    " cast(0 as bigint), (acc, c) -> (acc*31 + c) % {p})"
)

#: xorshift-multiply finalizer constants: Knuth's 2^32/φ multiplier and
#: xxhash's PRIME32_2. Both multiplications stay within int64 because the
#: operand is always masked to 30 bits first (< 2^30 × 2.7e9 < 2^63), so
#: the SAME expression runs on engines that error on overflow (DuckDB)
#: and engines that wrap (Spark).
MIX_C1, MIX_C2, MIX_MASK = 2654435761, 2246822519, (1 << 30) - 1


def mixed_fold_spark(s: str, p: int = HASH_P) -> str:
    """Spark SQL: polynomial fold + two xorshift-multiply rounds → a
    well-mixed 30-bit hash.

    The raw fold is AFFINE in trailing characters — h("…8") and h("…9")
    differ by exactly 1 — so fold-mod-N keep decisions for consecutive
    keys are maximally correlated (contiguous keep-runs instead of
    independent draws) and fold-ordered "shuffles" barely shuffle. The
    nonlinear finalizer (multiply → xor-shift → mask, twice) breaks the
    affine structure; repeated subexpressions are eliminated by codegen
    CSE. DuckDB twin: the query catalog's ``_mixed_fold_duck`` —
    identical arithmetic, xor() spelled as a function."""
    h = FOLD_SPARK.format(s=s, p=p)
    # LET-bind the fold (the word_ngram_expr lesson): Catalyst inlines
    # textual repetition, and the finalizer referenced h four times —
    # four evaluations of the per-character fold per row. Bound through
    # a one-element transform, it evaluates once; the finalizer
    # arithmetic on the bound value is cheap either way.
    r1 = f"((((_h) * {MIX_C1}) ^ shiftright(((_h) * {MIX_C1}), 15)) & {MIX_MASK})"
    fin = f"((({r1} * {MIX_C2}) ^ shiftright(({r1} * {MIX_C2}), 13)) & {MIX_MASK})"
    return f"transform(array({h}), _h -> {fin})[0]"


def word_ngram_expr(text_col: str, n: int) -> str:
    """Spark SQL expression: distinct word ``n``-grams of ``text_col`` as an
    array of space-joined strings (empty array when the document is shorter
    than ``n`` words).

    Tokenization is lowercased and whitespace-NORMALIZED (split on runs
    of any whitespace, empties dropped): contamination checks that split
    on a single literal space miss verbatim benchmark text that merely
    got line-wrapped, double-spaced, or case-shifted in the training copy
    — the normalization GPT-3/PaLM-style overlap rules apply before
    n-gramming.

    The token array is LET-BOUND via ``transform(array(<split>), ws ->
    ...)[0]``: the gram body references the tokens three times (two
    ``size`` calls + the ``slice``), and without the binding Catalyst
    inlines the regex split into each reference — measured 7× slower at
    sf0.1 (2.9 s vs 0.4 s for the full-corpus gram explode). Spark SQL
    has no LET; a 1-element transform is the standard binding idiom."""
    w = f"filter(split(lower(trim({text_col})), '\\\\s+'), t -> t <> '')"
    body = (
        f"case when size(ws) >= {n} then array_distinct("
        f"transform(sequence(1, size(ws) - {n} + 1),"
        f" i -> array_join(slice(ws, i, {n}), ' '))) "
        f"else array() end"
    )
    return f"transform(array({w}), ws -> {body})[0]"


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-training-document contamination counts against a benchmark set.

    Returns every ``train`` row's ``id_col`` with ``n_hit_grams`` (distinct
    word ``n``-grams also present anywhere in ``bench``) and a boolean
    ``contaminated``. With ``broadcast_bench=True`` (the default,
    matching the production contract: eval sets are FIXED-size, a few MB
    of grams at any corpus scale) the gram set broadcasts and the corpus
    side never shuffles its text. Pass ``False`` when the bench side
    SCALES with the corpus (e.g. a mod-slice of it, as the catalog's
    driver gate uses) — a forced broadcast hint on a growing side
    bypasses the size threshold and aborts at Spark's broadcast limit;
    unhinted, AQE still broadcasts it while it actually fits.
    """
    grams = word_ngram_expr(text_col, n)
    train_grams = train.select(
        F.col(id_col), F.explode(F.expr(grams)).alias("gram")
    )
    bench_grams = bench.select(F.explode(F.expr(grams)).alias("gram")).distinct()
    bench_side = F.broadcast(bench_grams) if broadcast_bench else bench_grams
    hits = (
        train_grams.join(bench_side, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def mixture_sample(
    df: DataFrame,
    rates_pct: dict[str, int],
    key_col: str = "doc_id",
    source_col: str = "source",
    default_pct: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted per-source sampling (data mixing).

    Keeps a row when ``mixed_fold(salt || key) % 100 < rates_pct[source]``.
    The decision is a pure function of the row key: stable under re-runs,
    partitioning changes, and AQE re-plans — unlike ``rand()``-based
    sampling, which breaks idempotent downstream merges.
    """
    rate = F.lit(default_pct)
    for src, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(source_col) == src, F.lit(pct)).otherwise(rate)
    h = mixed_fold_spark(f"concat({_sql_str(salt)}, cast({key_col} as string))")
    return df.withColumn("_r", rate).filter(F.expr(h) % 100 < F.col("_r")).drop("_r")


def weighted_sample(
    df: DataFrame,
    weight_bps_col: str,
    key_col: str = "doc_id",
    salt: str = "wt",
) -> DataFrame:
    """Deterministic PER-ROW weighted sampling: keeps a row when
    ``mixed_fold(salt || key) % 10000 < weight_bps`` (keep probability in
    basis points, 0..10000). The per-row generalization of
    ``mixture_sample``'s per-source rates — quality-weighted corpus
    downsampling whose keep decision is a pure function of the row key,
    so it is stable under re-runs, partitioning changes, and AQE
    re-plans, and downstream incremental merges stay idempotent.
    Row-local filter: no shuffle, no Python."""
    h = mixed_fold_spark(f"concat({_sql_str(salt)}, cast({key_col} as string))")
    return df.filter(F.expr(h) % 10000 < F.col(weight_bps_col))


def split_shard(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 90,
    valid_pct: int = 5,
    n_shards: int = 8,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test split + shard assignment + shuffle
    order for training-data export.

    Everything is a pure function of the row key (the same MIXED fold hash as
    ``mixture_sample`` — see ``mixed_fold_spark`` for why the raw fold's
    affine tail correlation is unacceptable here), so the split survives
    re-runs, repartitioning, and incremental loads — a document NEVER migrates between splits when
    the corpus grows, which is the property that keeps eval sets
    uncontaminated across data refreshes (``rand()`` splits lose it).

    - ``split``: hash(salt‖key) % 100 banded into train/valid/test;
    - ``shard``: hash('shard'‖key) % n_shards — the write-partitioning key
      for parallel export (at 100 TB, shards are the files);
    - ``shuffle_rank``: rank within (split, shard) by an independent hash —
      a deterministic within-shard shuffle so training reads are already
      order-randomized. Numbering is TWO-PHASE (range-partition on the
      full ordering key, rank locally, add broadcast per-(split, shard,
      partition) offsets): a plain window over (split, shard) has at
      most 3 × n_shards partitions, and a window partition cannot be
      split across tasks — at 100 TB each (train, shard) group is a
      multi-TB single-task sort. The two-phase ranks are identical for
      ANY range boundaries (offsets come from actual counts), so the
      output stays deterministic while every phase is fully parallel.
    """
    h_split = F.expr(
        mixed_fold_spark(f"concat({_sql_str(salt)}, cast({key_col} as string))")
    )
    h_shard = F.expr(
        mixed_fold_spark(f"concat('shard', cast({key_col} as string))")
    )
    h_order = F.expr(
        mixed_fold_spark(f"concat('order', cast({key_col} as string))")
    )
    from pyspark.sql import Window

    banded = df.select(
        "*",
        F.when(h_split % 100 < train_pct, "train")
        .when(h_split % 100 < train_pct + valid_pct, "valid")
        .otherwise("test")
        .alias("split"),
        (h_shard % n_shards).cast("int").alias("shard"),
        h_order.alias("_h"),
    )
    n_parts = max(64, df.sparkSession.sparkContext.defaultParallelism)
    parts = banded.repartitionByRange(
        n_parts, "split", "shard", F.col("_h"), F.col(key_col)
    ).withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid", "split", "shard").orderBy(
        F.col("_h"), F.col(key_col)
    )
    local = parts.withColumn("_lrk", F.row_number().over(w_local))
    # offsets frame: <= 64 × 3 × n_shards rows — tiny at any data scale
    w_off = (
        Window.partitionBy("split", "shard")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("split", "shard", "_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .select("split", "shard", "_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), ["split", "shard", "_pid"])
        .withColumn("shuffle_rank", (F.col("_off") + F.col("_lrk")).cast("long"))
        .drop("_h", "_pid", "_lrk", "_off")
    )


def pack_sequences(
    df: DataFrame,
    context_tokens: int,
    tokens_col: str,
    order_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Assign each document a ``bin_id``: fixed-token-budget context windows
    filled greedily in ``order_col`` order, independently per shard.

    ``bin_id = floor(tokens_before_this_doc / context_tokens)`` — a doc goes
    into the bin where the running stream stands when it arrives, so every
    bin holds >= ``context_tokens`` only by its last doc's overflow (the
    standard streaming-concat packing used for LLM pretraining shards).

    The running sum is TWO-PHASE (range-partition on (shard, order), sum
    locally, add broadcast per-(shard, partition) offsets): a plain
    window over the shard key serializes each shard — a handful of
    source values at 100 TB means a handful of tasks each
    cumulative-summing tens of TB. Identical results for any range
    boundaries; no driver-side state.
    """
    n_parts = max(64, df.sparkSession.sparkContext.defaultParallelism)
    parts = df.repartitionByRange(n_parts, shard_col, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid", shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = (
        Window.partitionBy(shard_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parts.groupBy(shard_col, "_pid")
        .agg(F.sum(tokens_col).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .select(shard_col, "_pid", "_off")
    )
    df = parts.join(F.broadcast(offsets), [shard_col, "_pid"])
    cum = F.col("_off") + F.sum(tokens_col).over(w_local)
    # Integer-exact: sum-of-longs window stays long, and the bin index is
    # a true integer `div` — `/` on longs is DOUBLE division in Spark,
    # which loses ULPs past 2^53 cumulative tokens and could floor a
    # boundary doc into the wrong bin.
    return (
        df.withColumn("_before", cum - F.col(tokens_col))
        .withColumn("bin_id", F.expr(f"_before div {int(context_tokens)}"))
        .drop("_before", "_pid", "_off")
    )


def pack_first_fit(
    df: DataFrame,
    context_tokens: int,
    tokens_col: str,
    order_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """First-fit bin packing per shard via grouped ``applyInPandas``.

    ``pack_sequences`` (streaming-concat) lets a bin's last doc overflow the
    budget; first-fit instead places each doc into the lowest-numbered bin
    it FITS in, never overflowing (docs longer than the budget get a
    singleton bin). That decision is inherently sequential within a shard —
    not window-expressible — so this is the legitimate Pandas-UDF case:
    one Arrow batch per shard, the sequential scan in C-speed pandas, shards
    in parallel across the cluster. State is per-shard only (bin loads),
    memory O(bins), and the output contract (schema + deterministic
    ``order_col`` scan) keeps re-runs identical.
    """
    import pandas as pd

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bin_id long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        loads: list[int] = []
        bins: list[int] = []
        for tok in pdf[tokens_col]:
            placed = None
            for i, load in enumerate(loads):
                if load + tok <= context_tokens:
                    placed = i
                    loads[i] += tok
                    break
            if placed is None:
                placed = len(loads)
                loads.append(tok)
            bins.append(placed)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, schema=schema)
