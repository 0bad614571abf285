"""Product quantization for embedding columns (Jégou, Douze, Schmid 2011
— "Product Quantization for Nearest Neighbor Search", public): split each
d-dim vector into ``m`` subvectors, vector-quantize each subspace against
its own ``k``-centroid codebook, and score queries with an asymmetric
distance computation (ADC) lookup table. PQ is what turns a 100 TB float
embedding store into an in-memory-scannable code store (d×4 bytes →
m×1 byte at k ≤ 256) and, composed with the IVF family in
``functions/similarity.py``, is the standard billion-scale ANN layout
(IVF-PQ).

Spark-first shapes, in the catalog's determinism discipline:

* **train** — ``m`` independent deterministic Lloyd's runs
  (``similarity.kmeans_lloyd``: broadcast centroids, sequential-fold
  distances, value-sorted update sums — the oracled x_kmeans_assign
  trajectory) over the SLICED corpus, final codebook = value-sorted-fold
  mean of each final cluster. Every coordinate is bit-reproducible
  cross-engine.
* **encode** — the codebook is a bounded model object (m·k rows); it is
  collected once, guarded, and inlined as LITERAL nested arrays so
  encoding is a row-local whole-stage-codegen expression: zero shuffle,
  zero Python, scan speed. (The explode+join spelling would pay two
  corpus-sized exchanges for the same answer.)
* **ADC top-k** — the m×k distance table is computed driver-side from
  the query (tiny, sequential sums — bit-identical to an engine fold),
  inlined as a literal, and each code row scores with ONE bounded fold;
  the only non-map work is the top-k reduce (TakeOrdered).

Reference parity note: the reference repo (shore-gmbh/bi-gcp-stitch-repl)
has no vector search at all; this module extends the engine's §7.6 ANN
family (SURVEY.md §2.13) the same way ivf_topk/semdedup do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import SQDIST, kmeans_lloyd

#: collect guard for the codebook model object: m·k centroid rows. 1<<16
#: is far above any sane PQ configuration (m ≤ 64, k ≤ 256 → 16384) and
#: far below driver-memory hazard.
PQ_MODEL_ROW_LIMIT = 1 << 16


def _check_split(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(
            f"m must divide the vector dimension evenly (dim={dim}, m={m})"
        )
    return dim // m


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train the ``m`` per-subspace codebooks: ``(sub, cid, cv)`` with
    ``cv`` the ds-dim centroid (ds = dim/m). Subspace ``s`` runs the
    deterministic ``kmeans_lloyd`` trajectory on ``slice(vec, s·ds+1,
    ds)`` (seeded by the k smallest ids, ``n_iter`` rounds), then the
    codebook entry is the value-sorted-fold mean of each FINAL cluster —
    one more deterministic update step past the last assignment, so the
    codebook is a pure function of the corpus in both engines.

    Cost: m independent small Lloyd's loops (each the x_kmeans_assign
    shape); the corpus is scanned per subspace per round. At 100 TB,
    train on a SAMPLE (PQ codebooks need ~100k vectors, not the corpus
    — Jégou §V) and pass the result to pq_encode over the full store."""
    ds = _check_split(dim, m)
    out = None
    for s in range(m):
        sliced = corpus.select(
            F.col(id_col),
            F.expr(
                f"transform(slice({vec_col}, {s * ds + 1}, {ds}),"
                " x -> cast(x as double))"
            ).alias("embedding"),
        )
        asg = kmeans_lloyd(
            sliced, k=k, n_iter=n_iter, vec_col="embedding", id_col=id_col
        )
        cb = (
            sliced.join(asg, id_col)
            .select("cluster", F.posexplode("embedding").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(
                (
                    F.expr(
                        "aggregate(array_sort(collect_list(x)),"
                        " cast(0.0 as double), (acc, v) -> acc + v)"
                    )
                    / F.count("*").cast("double")
                ).alias("mval")
            )
            .groupBy("cluster")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, mval))),"
                    " p -> p.mval)"
                ).alias("cv")
            )
            .select(F.col("cluster"), "cv")
        )
        # dense re-rank: kmeans_lloyd's cluster ids are the seed row ids
        # (and clusters can die), but ADC's lookup table needs codes
        # 0..k'-1 — rank by cluster id, deterministically
        from pyspark.sql import Window

        cb = cb.select(
            F.lit(s).cast("int").alias("sub"),
            (
                F.row_number().over(Window.orderBy("cluster")) - 1
            ).cast("bigint").alias("cid"),
            "cv",
        )
        out = cb if out is None else out.unionByName(cb)
    return out


def _collect_codebooks(codebooks: DataFrame) -> list[list[tuple[int, list]]]:
    """(sub → sorted [(cid, cv), ...]) from the codebook frame, guarded."""
    rows = codebooks.limit(PQ_MODEL_ROW_LIMIT + 1).collect()
    if len(rows) > PQ_MODEL_ROW_LIMIT:
        raise ValueError(
            f"codebook exceeds PQ_MODEL_ROW_LIMIT={PQ_MODEL_ROW_LIMIT} rows"
            " — not a bounded model object; reduce m·k"
        )
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r.sub, []).append((r.cid, list(r.cv)))
    subs = sorted(by_sub)
    if subs != list(range(len(subs))):
        raise ValueError(f"codebook subs must be 0..m-1, got {subs}")
    return [sorted(by_sub[s]) for s in subs]


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Encode every vector as ``(id_col, codes array<bigint>)`` —
    ``codes[s]`` is the cid of subspace s's nearest centroid (sequential
    squared-L2 fold; ties to the smallest cid via lexicographic
    struct-min, deterministic cross-engine).

    The codebook inlines as literal nested arrays, so the whole encode
    is ONE row-local projection: zero shuffle, zero Python, pushdown and
    column pruning untouched. m·k·ds literals is bounded by the model
    guard (≤ PQ_MODEL_ROW_LIMIT centroids)."""
    cbs = _collect_codebooks(codebooks)
    m = len(cbs)
    ds = _check_split(dim, m)
    # materialize each subspace slice ONCE as its own column (the PSL
    # materialization discipline): the k candidate folds below are
    # interpreted higher-order functions, and re-slicing _v inside every
    # candidate multiplies the allocation k-fold
    sliced = corpus.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
    ).select(
        id_col,
        *[F.col(c) for c in keep_cols],
        *[
            F.expr(f"slice(_v, {s * ds + 1}, {ds})").alias(f"_s{s}")
            for s in range(m)
        ],
    )
    code_exprs = []
    for s, entries in enumerate(cbs):
        cand = ", ".join(
            f"struct({SQDIST.format(a=f'_s{s}', b=_lit_arr(cv))}"
            f" AS d, CAST({cid} AS BIGINT) AS cid)"
            for cid, cv in entries
        )
        code_exprs.append(f"array_min(array({cand})).cid")
    return sliced.select(
        id_col,
        *[F.col(c) for c in keep_cols],
        F.expr("array(" + ", ".join(code_exprs) + ")").alias("codes"),
    )


def pq_encode_fast(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Arrow-batched NumPy encode — the PRODUCTION kernel for the same
    ``(id_col, codes)`` contract as :func:`pq_encode`. Each batch is one
    ``(rows × ds) @ (ds × k)`` matrix product per subspace with the
    expanded-L2 argmin (‖x−c‖² ranks as ‖c‖²−2⟨x,c⟩ per row) — measured
    ~40× the interpreted-fold expression path at 200k×64 (PERF.md).

    Caveat, per the kmeans_lloyd / kmeans_ivf_index twin discipline:
    BLAS accumulation order differs from the sequential fold, so a
    distance tie decided inside float ulp noise can pick a different
    (still nearest-within-ulp) centroid than the exact twin. Codes are
    argmin-by-(distance, cid) with NumPy's stable first-min semantics —
    deterministic for a fixed batch, and property-pinned equal to
    pq_encode away from ulp ties. Use pq_encode where an oracle replays
    the choice; use this to encode the store."""
    import numpy as np
    import pandas as pd

    cbs = _collect_codebooks(codebooks)
    m = len(cbs)
    ds = _check_split(dim, m)
    mats = []
    for entries in cbs:
        mats.append(np.array([cv for _cid, cv in entries], dtype=np.float64))
    cids = [np.array([c for c, _ in entries]) for entries in cbs]

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vstack over the Arrow batch: one block allocation, no
            # per-row Python conversion loop (the loop spelling measured
            # SLOWER than the interpreted SQL twin — PERF.md)
            vs = np.vstack(pdf[vec_col].to_numpy()).astype(
                np.float64, copy=False
            )
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for s in range(m):
                xs = vs[:, s * ds:(s + 1) * ds]
                cb = mats[s]
                # ||x - c||^2 ranks as ||c||^2 - 2<x, c> per row
                scores = (cb * cb).sum(axis=1)[None, :] - 2.0 * (xs @ cb.T)
                codes[:, s] = cids[s][np.argmin(scores, axis=1)]
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    dtypes = dict(corpus.dtypes)
    keep_schema = "".join(f", {c} {dtypes[c]}" for c in keep_cols)
    return corpus.select(id_col, *keep_cols, vec_col).mapInPandas(
        encode,
        schema=f"{id_col} {dtypes[id_col]}{keep_schema}, codes array<bigint>",
    )


def _lit_arr(vals: list) -> str:
    return "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in vals) + ")"


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    query: list,
    k_top: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: ``(id_col, adc_dist)`` for the ``k_top``
    codes nearest the (un-quantized) query. The m×k lookup table
    ``dt[s][cid] = ||query_s - centroid||²`` is computed driver-side with
    the same sequential sum order as the engine folds (bit-identical),
    inlined as a literal, and each row scores with one bounded fold over
    its codes — scan-speed map work plus a single TakeOrdered reduce.
    Ties break on the id for a deterministic result set."""
    cbs = _collect_codebooks(codebooks)
    m = len(cbs)
    ds = _check_split(len(query), m)
    dt = []
    for s, entries in enumerate(cbs):
        qs = [float(x) for x in query[s * ds : (s + 1) * ds]]
        row = {}
        for cid, cv in entries:
            acc = 0.0
            for x, y in zip(qs, cv):
                acc += (x - y) * (x - y)
            row[cid] = acc
        if sorted(row) != list(range(len(row))):
            raise ValueError(
                f"subspace {s} cids must be dense 0..k-1 for table lookup"
                f" (got {sorted(row)})"
            )
        dt.append([row[c] for c in sorted(row)])
    dt_lit = "array(" + ", ".join(_lit_arr(r) for r in dt) + ")"
    scored = encoded.select(
        id_col,
        F.expr(
            f"aggregate(zip_with(codes, sequence(0, {m - 1}),"
            f" (c, s) -> element_at(element_at({dt_lit}, s + 1),"
            " cast(c + 1 as int))),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        ).alias("adc_dist"),
    )
    return scored.orderBy("adc_dist", id_col).limit(k_top)


#: bounded-query guard for ADC table construction: per (query, probed
#: cell) the driver computes an m×k table; 4096 queries × 32 probes of a
#: 16×256 table is ~0.5 GB of literals — far above any sane interactive
#: batch, far below driver hazard. Batch-score bigger query sets in
#: chunks upstream.
IVFPQ_QUERY_LIMIT = 4096


def ivf_pq_index(
    corpus: DataFrame,
    dim: int,
    n_cells: int | None = 16,
    m: int = 4,
    k_codes: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centers: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    fast_encode: bool = False,
):
    """Build the classic IVF-PQ layout (Jégou et al. §IV — the
    billion-scale standard): coarse cells from ``kmeans_ivf_index``
    (pyspark.ml Lloyd's; or a FROZEN ``centers`` frame ``(cell, cvec)``
    for deterministic replay), then ONE shared PQ codebook trained on
    the cell RESIDUALS ``v − center(cell)`` (residuals concentrate near
    0, so the same codebook budget quantizes far tighter than raw
    vectors), then every vector stored as ``(id, cell, codes)`` —
    m bytes of payload per row at k ≤ 256 where the raw vector cost
    d×4; the index table is the ONLY corpus-sized artifact.

    Returns ``(index_df, centers_df, codebooks_df)``. The residual
    subtraction is a broadcast hash join on ``cell`` + one row-local
    ``zip_with`` (centers are n_cells×dim — a bounded model frame that
    broadcasts; inlining literals would not survive sqrt(N) cells at
    100 TB). Train on a SAMPLE upstream when the corpus is large (PQ
    needs ~100k residuals, not the store).

    ``fast_encode=True`` with BOTH models frozen (``centers`` +
    ``codebooks``) takes the one-pass Arrow kernel: assignment +
    residual + codes in a single ``mapInPandas`` over the raw vectors —
    the production encode. The expression path's frozen-centers
    assignment is a corpus × n_cells crossJoin of interpreted folds
    (measured DOMINANT over the encode itself at 200k × 447 cells:
    PERF.md); it stays as the oracle-parity twin."""
    if fast_encode and centers is not None and codebooks is not None:
        return (
            _ivf_pq_encode_onepass(
                corpus, centers, codebooks, dim, vec_col, id_col
            ),
            centers,
            codebooks,
        )
    if centers is None:
        from .similarity import kmeans_ivf_index

        assigned, ctrs = kmeans_ivf_index(
            corpus, n_cells=n_cells, vec_col=vec_col, cell_col="_cell",
            return_centers=True,
        )
        spark = corpus.sparkSession
        centers = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(ctrs)],
            "cell int, cvec array<double>",
        )
        assigned = assigned.withColumnRenamed("_cell", "cell")
    else:
        # frozen-centers coarse assignment as a row-local argmin fold over
        # the 1-row centroid array: array_min over struct(_d, cell) is
        # bit-identical to the old row_number() OVER (PARTITION BY id
        # ORDER BY _d, cell) pick, without the corpus × n_cells
        # exchange+sort the window paid (guide §2.4 — at corpus scale
        # that shuffle dwarfed the encode itself)
        from .similarity import _centroid_array

        assigned = (
            corpus.crossJoin(
                F.broadcast(
                    _centroid_array(centers.select("cell", "cvec"), "cell", "cvec")
                )
            )
            .withColumn(
                "cell",
                F.expr(
                    "array_min(transform(_cs, c -> struct("
                    + SQDIST.format(a=vec_col, b="c.cvec")
                    + " AS d, c.cell AS cell))).cell"
                ),
            )
            .drop("_cs")
        )
    resid = assigned.join(
        F.broadcast(centers), "cell"
    ).select(
        id_col,
        "cell",
        F.expr(
            f"zip_with({vec_col}, cvec,"
            " (x, y) -> cast(x as double) - y)"
        ).alias("_resid"),
    )
    if codebooks is None:
        # fit here; pass a FROZEN ``codebooks`` frame to encode a large
        # corpus against sample-trained codebooks (the kmeans_ivf_index
        # frozen-quantizer discipline: stored codes must be argmin
        # against the SAME codebook the searcher's ADC tables use)
        codebooks = pq_train(
            resid, dim=dim, m=m, k=k_codes, n_iter=n_iter,
            vec_col="_resid", id_col=id_col,
        )
    enc = pq_encode_fast if fast_encode else pq_encode
    # cell rides THROUGH the encoder (keep_cols) — the join-back
    # spelling recomputed the residual frame twice and paid a
    # corpus-sized shuffle for a column the encoder already held
    # (measured: the join dominated encode wall time; PERF.md)
    index = enc(
        resid, codebooks, dim=dim, vec_col="_resid", id_col=id_col,
        keep_cols=("cell",),
    ).select(id_col, "cell", "codes")
    return index, centers, codebooks


def _ivf_pq_encode_onepass(
    corpus: DataFrame,
    centers: DataFrame,
    codebooks: DataFrame,
    dim: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """One Arrow pass over raw vectors: cell assignment (expanded-L2
    argmin against the bounded centers matrix, ties to the smallest
    cell id via NumPy first-min over the cell-sorted matrix), residual
    subtraction, and per-subspace code argmin — the vectors transit the
    Arrow boundary ONCE and nothing corpus-sized joins or shuffles.
    Same ulp-tie caveat as pq_encode_fast (DETERMINISM.md)."""
    import numpy as np
    import pandas as pd

    cbs = _collect_codebooks(codebooks)
    m = len(cbs)
    ds = _check_split(dim, m)
    crows = sorted(
        (r.cell, list(r.cv if hasattr(r, "cv") else r.cvec))
        for r in centers.collect()
    )
    cmat = np.array([cv for _c, cv in crows], dtype=np.float64)
    cells_arr = np.array([c for c, _ in crows], dtype=np.int32)
    mats = [
        np.array([cv for _cid, cv in entries], dtype=np.float64)
        for entries in cbs
    ]
    cids = [np.array([c for c, _ in entries]) for entries in cbs]

    def kernel(batches):
        cnorm = (cmat * cmat).sum(axis=1)[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vs = np.vstack(pdf[vec_col].to_numpy()).astype(
                np.float64, copy=False
            )
            pick = np.argmin(cnorm - 2.0 * (vs @ cmat.T), axis=1)
            resid = vs - cmat[pick]
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for s in range(m):
                xs = resid[:, s * ds:(s + 1) * ds]
                cb = mats[s]
                scores = (cb * cb).sum(axis=1)[None, :] - 2.0 * (xs @ cb.T)
                codes[:, s] = cids[s][np.argmin(scores, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cells_arr[pick],
                    "codes": list(codes),
                }
            )

    id_type = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, cell int, codes array<bigint>"
    )


def ivf_pq_topk(
    index: DataFrame,
    centers: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k_top: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    refine_with: DataFrame | None = None,
    refine_factor: int = 5,
) -> DataFrame:
    """IVF-PQ search: each query probes its ``n_probe`` nearest cells
    (squared-L2 to the coarse centers) and ranks ONLY those cells' codes
    by asymmetric distance against a per-(query, cell) m×k lookup table
    built from the query's cell RESIDUAL — cost per query is
    corpus/n_cells × n_probe fold lookups, never a full scan, and the
    scored payload is m small ints per row, not d floats.

    The query set and the tables are driver-built (guarded at
    ``IVFPQ_QUERY_LIMIT`` — queries × n_probe × m × k entries), shipped
    as ONE broadcast frame joined on ``cell``; scoring is a row-local
    bounded fold; the final exact top-k is the salted two-level window
    (``ops.skew.salted_topk``), so a hot cell cannot serialize one task.
    Ties break on the vector id; output ``(query_id, vec_id, adc_dist,
    rk)``.

    ``refine_with`` enables the standard refine stage (Jégou §VII /
    "IVFPQR"): the ADC pass keeps ``k_top × refine_factor`` candidates,
    joins them back to the TRUE vectors in ``refine_with`` (an
    ``(id_col, vec_col)`` frame — typically the corpus), and re-ranks
    by exact squared-L2 — the lossy-quantization recall repair whose
    extra cost is one equi-join on k·factor·|queries| rows, corpus-size
    independent. Output then carries ``exact_dist`` instead of
    ``adc_dist``; measured recall@10 uplift in PERF.md."""
    cbs = _collect_codebooks(codebooks)
    m = len(cbs)
    ctrs = {r.cell: list(r.cv if hasattr(r, "cv") else r.cvec)
            for r in centers.collect()}
    qrows = queries.limit(IVFPQ_QUERY_LIMIT + 1).collect()
    if len(qrows) > IVFPQ_QUERY_LIMIT:
        raise ValueError(
            f"query batch exceeds IVFPQ_QUERY_LIMIT={IVFPQ_QUERY_LIMIT}"
            " — chunk the query set upstream"
        )
    dim = None
    probe_rows = []
    for qr in qrows:
        qid = qr[query_id_col]
        qv = [float(x) for x in qr[vec_col]]
        dim = len(qv)
        ds = _check_split(dim, m)
        # n_probe nearest cells by L2, ties to the smaller cell id
        ranked = sorted(
            (
                (sum((x - y) * (x - y) for x, y in zip(qv, cv)), cell)
                for cell, cv in ctrs.items()
            )
        )[:n_probe]
        for _, cell in ranked:
            qres = [x - y for x, y in zip(qv, ctrs[cell])]
            dt = []
            for s, entries in enumerate(cbs):
                qs = qres[s * ds:(s + 1) * ds]
                row = []
                for _cid, cv in entries:
                    acc = 0.0
                    for x, y in zip(qs, cv):
                        acc += (x - y) * (x - y)
                    row.append(acc)
                dt.append(row)
            probe_rows.append((qid, cell, dt))
    spark = index.sparkSession
    probes = spark.createDataFrame(
        probe_rows,
        f"{query_id_col} long, cell int, dt array<array<double>>",
    )
    scored = index.join(F.broadcast(probes), "cell").select(
        query_id_col,
        id_col,
        F.expr(
            f"aggregate(zip_with(codes, sequence(0, {m - 1}),"
            " (c, s) -> element_at(element_at(dt, s + 1),"
            " cast(c + 1 as int))),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        ).alias("adc_dist"),
    )
    from ..ops.skew import salted_topk

    if refine_with is None:
        return salted_topk(
            scored,
            partition_by=[query_id_col],
            order_by=[F.col("adc_dist").asc(), F.col(id_col)],
            k=k_top,
            salt_on=id_col,
        ).select(query_id_col, id_col, "adc_dist", "rk")
    if refine_factor < 1:
        raise ValueError(f"refine_factor must be >= 1 (got {refine_factor})")
    cand_rows = (
        salted_topk(
            scored,
            partition_by=[query_id_col],
            order_by=[F.col("adc_dist").asc(), F.col(id_col)],
            k=k_top * refine_factor,
            salt_on=id_col,
        )
        .select(query_id_col, id_col)
        # materialize the BOUNDED candidate list (≤ |queries| × k_top ×
        # refine_factor rows, |queries| already guarded) and rebuild it
        # as a fresh frame: the lazy spelling joins refine_with (often
        # the same lineage the index was encoded from) against a plan
        # whose checkpointed LogicalRDD REUSES the corpus's exprIds —
        # two distinct LogicalRDDs sharing vec_id#N trips Spark's
        # relation dedup into INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at
        # execution (reproduced on 4.1.2; tools/pq_scale_trend.py was
        # the trigger). A literal rebuild shares no exprIds with
        # anything and broadcasts anyway.
        .collect()
    )
    cand = spark.createDataFrame(
        [(r[query_id_col], r[id_col]) for r in cand_rows],
        f"{query_id_col} long, {id_col} long",
    )
    qf = spark.createDataFrame(
        [(r[query_id_col], [float(x) for x in r[vec_col]]) for r in qrows],
        f"{query_id_col} long, _qv array<double>",
    )
    exact = (
        F.broadcast(cand).join(
            refine_with.select(id_col, F.col(vec_col).alias("_tv")), id_col
        )
        .join(F.broadcast(qf), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.expr(
                "aggregate(zip_with(_tv, _qv,"
                " (x, y) -> (cast(x as double) - y)"
                " * (cast(x as double) - y)),"
                " cast(0.0 as double), (acc, v) -> acc + v)"
            ).alias("exact_dist"),
        )
    )
    return salted_topk(
        exact,
        partition_by=[query_id_col],
        order_by=[F.col("exact_dist").asc(), F.col(id_col)],
        k=k_top,
        salt_on=id_col,
    ).select(query_id_col, id_col, "exact_dist", "rk")
