"""Data-quality expectations over DataFrames (dbt-test / Great-Expectations
class checks, Spark-native).

The reference loads API payloads into the warehouse with zero validation
(`autodetect=True` everywhere — SURVEY.md §1.3); broken payloads surface
as downstream BI bugs. The engine runs declared expectations BEFORE a
load and reports violations, so a bad batch can be quarantined instead
of merged.

Scale design: all row-local checks on a table collapse into ONE
aggregation pass (`sum(when(violated, 1))` per check — a single scan, no
per-check jobs); uniqueness is one groupBy on the key; referential
integrity is one anti-join with the parent side's distinct keys
broadcast when small. A 50-check suite over a 100 TB table costs one
scan plus one shuffle per unique/fk check, not 50 scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_SCHEMA = "check string, n_violations long, passed boolean"


@dataclass
class Expectations:
    """Declarative check suite over one DataFrame; ``report()`` returns a
    (check, n_violations, passed) DataFrame."""

    df: DataFrame
    _row_checks: list[tuple[str, Column]] = field(default_factory=list)
    _frames: list[DataFrame] = field(default_factory=list)

    # -- row-local checks: fused into one aggregation pass ------------------

    def expect_not_null(self, *cols: str) -> "Expectations":
        for c in cols:
            self._row_checks.append((f"not_null:{c}", F.col(c).isNull()))
        return self

    def expect_between(self, col: str, lo, hi) -> "Expectations":
        self._row_checks.append(
            (f"between:{col}", ~F.col(col).between(lo, hi) | F.col(col).isNull())
        )
        return self

    def expect_accepted_values(self, col: str, values: list) -> "Expectations":
        self._row_checks.append(
            (f"accepted_values:{col}", ~F.col(col).isin(values) | F.col(col).isNull())
        )
        return self

    def expect_matches(self, col: str, regex: str) -> "Expectations":
        self._row_checks.append(
            (f"matches:{col}", ~F.col(col).rlike(regex) | F.col(col).isNull())
        )
        return self

    def expect_row(self, name: str, violated: Column) -> "Expectations":
        """Custom row-level predicate; ``violated`` true = one violation."""
        self._row_checks.append((name, violated))
        return self

    # -- relational checks: one job each ------------------------------------

    def expect_unique(self, *keys: str) -> "Expectations":
        dup_rows = (
            self.df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n"))
            .select(
                F.lit(f"unique:{','.join(keys)}").alias("check"),
                F.col("n").cast("long").alias("n_violations"),
                (F.col("n") == 0).alias("passed"),
            )
        )
        self._frames.append(dup_rows)
        return self

    def expect_fk(
        self, cols: list[str], parent: DataFrame, parent_cols: list[str]
    ) -> "Expectations":
        """Referential integrity: every non-null child key exists in the
        parent. Parent keys are distinct-projected; Catalyst broadcasts
        them when small (dimension case), else the anti-join shuffles on
        the key once."""
        pk = parent.select(
            *[F.col(p).alias(c) for c, p in zip(cols, parent_cols)]
        ).distinct()
        orphans = (
            self.df.select(*cols)
            .na.drop(subset=cols)
            .join(pk, on=cols, how="left_anti")
            .agg(F.count("*").alias("n"))
            .select(
                F.lit(f"fk:{','.join(cols)}").alias("check"),
                F.col("n").cast("long").alias("n_violations"),
                (F.col("n") == 0).alias("passed"),
            )
        )
        self._frames.append(orphans)
        return self

    def flag_rows(self, flag_col: str = "_violated") -> DataFrame:
        """Tag each row with whether ANY row-local check fails — the
        quarantine split (relational checks are table-level and don't
        implicate individual rows). Pure projection: no extra pass."""
        cond = F.lit(False)
        for _, violated in self._row_checks:
            cond = cond | F.coalesce(violated, F.lit(False))
        return self.df.withColumn(flag_col, cond)

    # -- report -------------------------------------------------------------

    def report(self) -> DataFrame:
        """(check, n_violations, passed), one row per declared expectation.
        Row-local checks share a single aggregation over one scan."""
        frames = list(self._frames)
        if self._row_checks:
            aggs = [
                F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
                for name, cond in self._row_checks
            ]
            wide = self.df.agg(*aggs)

            def lit(name: str) -> str:
                # check names are user text — a quote or backtick must not
                # break (or inject into) the stack() expression
                return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

            def ref(name: str) -> str:
                return "`" + name.replace("`", "``") + "`"

            stack = ", ".join(
                f"{lit(name)}, {ref(name)}" for name, _ in self._row_checks
            )
            tall = wide.selectExpr(
                f"stack({len(self._row_checks)}, {stack}) as (check, n_violations)"
            ).select(
                "check",
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
            frames.insert(0, tall)
        if not frames:
            return self.df.sparkSession.createDataFrame([], REPORT_SCHEMA)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
