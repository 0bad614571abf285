"""Embedding similarity search.

Vectors are plain ``array<float>`` columns (the engine's multimodal column
convention); all math is JVM-side ``zip_with``/``aggregate`` folds — no
Python in the scoring loop, no UDFs.

Two tiers:
- ``brute_force_topk`` — exact linear scan; the correctness baseline and
  the right answer below ~10⁷ vectors per query batch.
- ``lsh_bucket_topk`` — sign-bit LSH over fixed hyperplanes; probes the
  query's bucket (plus optional Hamming-1 neighbors) so per-query cost is
  corpus_size / 2^n_planes. The partitioning is the point at 100 TB: the
  bucket id is a shuffle key, so each query touches a bounded slice.
  An IVF variant would swap the bucket fn for nearest-centroid; the
  plumbing (bucket → co-partitioned join → per-bucket top-k window) stays
  identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v))"
)


def cosine(a: str, b: str) -> Column:
    return F.expr(f"{DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)})")


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector (as a literal array —
    broadcast by construction)."""
    qexpr = "array(" + ", ".join(f"cast({float(v)} as float)" for v in query_vec) + ")"
    scored = corpus.withColumn("q", F.expr(qexpr)).withColumn(
        "cosine", cosine(vec_col, "q")
    )
    return (
        scored.drop("q")
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def bucket_expr(vec_col: str, n_planes: int = 8) -> Column:
    """Sign-bit LSH bucket id: bit i = sign of coordinate i (axis-aligned
    hyperplanes; deterministic, no stored model). For random hyperplanes,
    replace element_at with a dot against broadcast plane vectors."""
    bucket = None
    for i in range(n_planes):
        bit = F.when(
            F.try_element_at(F.col(vec_col), F.lit(i + 1)) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k for a whole DataFrame of queries at once.

    Both sides get a bucket id; the join is bucket-equi (co-partitioned —
    one shuffle each side on a 2^n_planes-ary key), then a per-query window
    keeps the k best. Recall < 1.0 by construction: only same-bucket
    neighbors are seen (multi-probe = union over neighbor buckets).
    """
    c = corpus.withColumn("bucket", bucket_expr(vec_col, n_planes)).alias("c")
    q = (
        queries.withColumn("bucket", bucket_expr(vec_col, n_planes))
        .select(query_id_col, "bucket", F.col(vec_col).alias("qv"))
        .alias("q")
    )
    scored = c.join(q, "bucket").withColumn("cosine", cosine(vec_col, "qv"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cosine", "rk")
    )
