"""Multi-dimensional data layout: Z-order clustering for file skipping.

Parquet scans prune files and row groups with min/max footer statistics. A
table sorted by one column skips perfectly on that column and not at all on
any other; interleaving the bits of several columns' rank codes (a Z-order /
Morton curve) makes every output file cover a small hyper-rectangle of the
clustered key space, so predicates on ANY clustered column skip most files.
This is the layout `OPTIMIZE ... ZORDER BY` applies on lakehouse tables,
implemented here on plain parquet as a compaction-time rewrite.

Scale shape: one driver-side ``approxQuantile`` pass per clustered column
(boundaries are a few hundred doubles — broadcast-as-literal territory),
then bucket assignment + bit interleave as pure codegen'd Column
expressions, then ONE ``repartitionByRange`` shuffle on the z-value. No
Python row evaluation; at 100 TB the cost is the same single shuffle any
re-layout pays, amortized across every subsequent pruned scan.

The reference has no table-layout management at all (BigQuery re-clusters
internally; SURVEY.md §4.2 "Memory strategy: none"); this module is part of
owning that concern on open files.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__zval"


def _bucket(col: Column, boundaries: list[float], bits: int) -> Column:
    """Rank ``col`` into ``[0, 2**bits)`` by its position among the quantile
    ``boundaries``. NULL and NaN sink to bucket 0 (they carry no range
    information, so they cluster together at the curve origin). NaN is
    normalized to NULL FIRST (``nanvl``): Spark orders NaN greater than
    every double, so ``b <= NaN`` would keep every boundary and silently
    plant NaN rows in the TOP bucket next to the largest values,
    polluting that file's min/max stats."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    x = F.nanvl(col.cast("double"), F.lit(None).cast("double"))
    n = F.size(F.filter(arr, lambda b: b <= x))
    return F.coalesce(F.least(n, F.lit(2**bits - 1)), F.lit(0))


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave the ``bits``-wide bucket codes into one long.

    Bit k of bucket i lands at position ``k * n_cols + i`` — disjoint
    positions, so the combine is a plain sum (== bitwise OR), all native
    shiftleft/and arithmetic inside whole-stage codegen.

    ``n_cols * bits`` must stay ≤ 63: position 63 is the long's sign bit
    (sign-flipped rows would range-partition FIRST), and Java's
    ``shiftleft`` reduces its shift amount modulo 64, so position 64+
    would silently collide with the low-order bits — enforced loudly
    here rather than silently degrading the curve."""
    n_cols = len(buckets)
    if n_cols * bits > 63:
        raise ValueError(
            f"z-order needs n_cols*bits <= 63 (got {n_cols}*{bits}="
            f"{n_cols * bits}); lower bits= (e.g. bits={63 // n_cols}) — "
            "resolution beyond the sign bit would wrap shifts mod 64"
        )
    parts = [
        F.shiftleft(
            F.shiftright(b.cast("long"), k).bitwiseAND(F.lit(1)),
            k * n_cols + i,
        )
        for i, b in enumerate(buckets)
        for k in range(bits)
    ]
    return reduce(lambda a, c: a + c, parts)


def _rankable(df: DataFrame, col: str) -> Column:
    """``col`` as a rank-preserving double. DATE cannot cast to a numeric
    in Spark 3+ (AnalysisException — clustering on order_date, the most
    common BI key, crashed outright); route it through epoch days, and
    timestamps through their epoch value, before the double cast."""
    dt = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if dt == "date":
        c = F.unix_date(c)  # timestamps cast to double directly; DATE doesn't
    return c.cast("double")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Attach the Z-order curve position of ``cols`` as column ``__zval``.

    Boundaries are equi-depth (approxQuantile at an error that SCALES
    with the bucket count — a fixed 1% would exceed the 1/2**bits bucket
    width at bits=8 and let adjacent boundaries collapse, producing
    multi-sized output files), so the curve adapts to the data
    distribution — skewed columns still split into balanced buckets,
    which is what keeps output files equal-sized. Clustered columns must
    be numeric / date / timestamp (rank order is what the curve
    preserves; dates/timestamps are ranked via their epoch value).
    """
    probs = [i / 2**bits for i in range(1, 2**bits)]
    rel_err = min(0.01, 1.0 / (4 * 2**bits))
    dbl = df.select(
        *[_rankable(df, c).alias(f"__d{i}") for i, c in enumerate(cols)]
    )
    all_bounds = dbl.approxQuantile(
        [f"__d{i}" for i in range(len(cols))], probs, rel_err
    )
    buckets = [
        _bucket(_rankable(df, c), bounds, bits)
        for c, bounds in zip(cols, all_bounds)
    ]
    return df.withColumn(Z_COL, _interleave(buckets, bits))


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-order curve of ``cols``:
    ``n_files`` range partitions of the z-value, each internally sorted by
    it, so every output file's min/max footer stats cover a tight
    hyper-rectangle. Feed straight to a writer (one file per partition).
    """
    keyed = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
    )
