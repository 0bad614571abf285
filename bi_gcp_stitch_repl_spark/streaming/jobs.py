"""Structured Streaming jobs over the ``events`` table.

The reference has no true streaming (SURVEY §2.10) — its closest semantics
are daily micro-batch crons plus the keyset watermark. The engine models
those as ``Trigger.AvailableNow`` incremental runs (exactly the reference's
"process everything new, then stop" contract, with checkpointed offsets
replacing the Airflow-Variable cursor) and adds the real streaming operators
the extension surface needs: watermarked tumbling windows and session
windows.

Batch-equivalents of these aggregations live in ``queries.windows``
(st_tumbling_window / st_session_windows) where DuckDB can oracle-check the
semantics; these jobs are the same logical plans under ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: web_corpus_stream domain-counts fold trigger: once the counts table's
#: live file count (one increment file per batch + at most one folded
#: file) reaches this, the history is rolled into one row per domain —
#: the per-batch prior probe then reads O(domains) rows across a bounded
#: file set no matter how old the stream is
_COUNTS_FOLD_FILES = 16


def events_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """File-source stream over an events directory (parquet), normalizing
    ``ts`` to TIMESTAMP (LTZ) whichever parquet generation the fixture
    carries — the same footer sniff as ``queries.catalog.tables`` (the
    driver has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)):

    - nanos parquet → read long (nanosAsLong) → ``timestamp_micros(div 1000)``
    - micros parquet read through a long-typed schema → raw micros int64 →
      ``timestamp_micros(ts)`` (dividing by 1000 here would silently yield
      1970-era values — worse than an error)
    - micros parquet read natively → TIMESTAMP_NTZ → value-preserving cast
      under the pinned UTC session TZ

    The generation decision is made ONCE, at stream definition, and
    baked into the plan — a stream cannot re-sniff per arriving file. So
    every file in the directory must be the SAME generation: this is
    validated up front across all present files (one footer read each,
    no data read) and a mixed directory raises instead of silently
    producing 1970-era timestamps for the minority generation. Files of
    the other generation arriving AFTER the stream starts remain the
    caller's contract to prevent (land each generation in its own
    directory). Note the nanos path sets the session-wide
    ``nanosAsLong`` flag — the mechanism Spark provides is read-time and
    global, so don't interleave nanos and non-nanos event reads in one
    session.
    """
    import os as _os

    from ..queries.catalog import _events_ts_is_nanos

    if _os.path.isdir(path):
        gens = {
            _events_ts_is_nanos(_os.path.join(path, f))
            for f in sorted(_os.listdir(path))
            if f.endswith(".parquet")
        }
        if len(gens) > 1:
            raise ValueError(
                f"{path} mixes TIMESTAMP(NANOS) and non-nanos parquet "
                "generations — a single stream schema cannot read both; "
                "split them into per-generation directories"
            )
        nanos = gens.pop() if gens else False
    else:
        nanos = _events_ts_is_nanos(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    # the file stream source wants a directory; a single-file path becomes
    # its parent dir + a glob filter (the driver fixture is one file/table)
    if path.endswith(".parquet"):
        reader = reader.option("pathGlobFilter", _os.path.basename(path))
        path = _os.path.dirname(path)
    df = reader.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        expr = "timestamp_micros(ts div 1000)" if nanos else "timestamp_micros(ts)"
        df = df.withColumn("ts", F.expr(expr))
    elif ts_type == "timestamp_ntz":
        # value-preserving only under UTC — pin it (catalog.tables rule)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type. Late rows
    beyond the watermark are dropped (state is bounded — the property that
    lets this run forever on an unbounded stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (inactivity gap) per user — the streaming
    form of queries.windows.st_session_windows' gaps-and-islands batch
    plan. session_window keeps per-user state only until watermark + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime counters (event count, value sum, last event id) maintained
    across micro-batches.

    This is the extension point for operators Spark's built-ins can't
    express — per-key accumulators with arbitrary Python logic, bounded
    state, Arrow-batched. The reference has nothing stateful (SURVEY §2.10);
    this is the §7.6 pattern for e.g. per-source ingestion ledgers or
    per-entity quality counters in a continuous pipeline. State is
    per-group and partitioned by the grouping key — scales with keys, not
    events."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("last_event_id", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("last_id", T.LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        n, total, last_id = state.get if state.exists else (0, 0.0, -1)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_id = max(last_id, int(pdf["event_id"].max()))
        state.update((n, total, last_id))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "total_value": total,
                    "last_event_id": last_id,
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_ledger_tws(events: DataFrame) -> DataFrame:
    """Per-user lifetime ledger via ``transformWithStateInPandas`` — the
    Spark 4 stateful-processor API (successor to applyInPandasWithState):
    typed state variables on a handle, explicit init/close lifecycle, and
    RocksDB-backed state (set by the caller's session conf) so per-key state
    spills off-heap and scales with keys, not memory.

    Same semantics as ``running_user_totals`` — count, FLOAT value total
    (the identical per-key sequential accumulation, so the two APIs stay
    bit-comparable with each other; it is NOT decimal-exact, and a batch
    rollup cross-check must compare within float tolerance or sum cents),
    max event id per user.

    Requires the ``protobuf`` package (the transformWithState state-server
    protocol is protobuf-framed); raises ImportError where it's absent —
    ``running_user_totals`` is the dependency-free fallback with identical
    semantics."""
    import google.protobuf  # noqa: F401 — fail fast with a clear cause
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("last_event_id", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("last_id", T.LongType()),
        ]
    )

    class LedgerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ledger = handle.getValueState("ledger", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total, last_id = (
                self._ledger.get() if self._ledger.exists() else (0, 0.0, -1)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                last_id = max(last_id, int(pdf["event_id"].max()))
            self._ledger.update((n, total, last_id))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "total_value": total,
                        "last_event_id": last_id,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        LedgerProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def incremental_merge_stream(
    events: DataFrame,
    table,
    keys: list[str],
    checkpoint: str,
):
    """The reference's S4 incremental-replication pipeline as a streaming
    sink: each micro-batch merge-upserts into the parquet table
    (foreachBatch + sinks.merge.ParquetTable), with offsets checkpointed by
    Spark instead of a hand-rolled watermark variable. AvailableNow trigger
    = the daily-cron semantics; the same job with a processing-time trigger
    is continuous replication."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            table.merge_upsert(batch_df, keys=keys)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def versioned_append_stream(
    events: DataFrame,
    table,
    app_id: str,
    checkpoint: str,
):
    """Exactly-once streaming append into a commit-log table.

    foreachBatch delivers at-least-once (a batch re-runs after a crash
    between sink write and checkpoint commit); ``VersionedTable.
    append_txn`` dedups on (app_id, batch_id) inside the table's own
    transaction log, so the re-delivered batch is a no-op — end-to-end
    exactly-once without an idempotent-key merge, on plain parquet."""

    def append(batch_df: DataFrame, batch_id: int) -> None:
        table.append_txn(batch_df, app_id=app_id, batch_id=batch_id)

    return (
        events.writeStream.foreachBatch(append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: emit the first row seen per key,
    drop replays arriving within the watermark delay of each other.

    This is the streaming twin of the K7 append-if-absent contract — at-least-
    once sources (replayed files, retried batches) become effectively-once
    downstream. `dropDuplicatesWithinWatermark` bounds the key state to the
    watermark horizon, which is what lets it run forever: plain
    `dropDuplicates` on a stream would grow state without bound.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def click_attribution_stream(
    events: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time join: attribute each purchase to the same
    user's clicks in the preceding attribution window.

    Both sides carry watermarks and the join condition bounds event time
    from both directions, so Spark can expire join state — the requirement
    for an unbounded stream-stream inner join to run forever. This is the
    streaming twin of the as-of/funnel batch operators: same semantics,
    incremental delivery.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "value",
        "click_id",
        "click_ts",
    )


def scd2_dimension_stream(
    changes: DataFrame,
    table,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    checkpoint: str,
):
    """Maintain a materialized SCD2 dimension from a change STREAM
    (caller ``.start()``s the returned writer).

    Each micro-batch runs ``ops.scd.scd2_merge`` — close-outs + new
    versions for the batch's keys only. Replay safety comes from the
    transition itself rather than txn marks: re-applying an
    already-applied batch reproduces the existing open rows, the no-op
    suppression drops every batch row as equal to its surviving
    predecessor, and the composite-key merge upserts identical rows —
    a fixpoint, so foreachBatch's at-least-once delivery is harmless
    (tested in test_scd.py::test_replayed_scd2_batch_is_fixpoint)."""
    from ..ops.scd import scd2_merge

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scd2_merge(table, batch_df, key_cols, ts_col, tracked_cols)

    return (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def near_dedup_stream(
    docs: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Continuous near-duplicate detection: each micro-batch of documents
    probes the persisted MinHash band index, appends the candidate pairs
    it finds to ``pairs_path``, and commits its own bands to the index —
    the streaming form of ``jobs.pipelines.incremental_dedup_ingest``.

    Per micro-batch the work is O(batch grams) + one (band, sig) equi-join
    probe of the index; the corpus is never re-hashed, which is what makes
    this viable as a forever-running job in front of a 100 TB landing
    zone. Exactly-once under foreachBatch's at-least-once delivery: BOTH
    sinks carry a txn marker on (stream, batch_id). The pairs sink is a
    VersionedTable ``append_txn`` — NOT a key-anti-join append, whose
    history probe re-reads every pair ever found on every micro-batch
    (O(accumulated pairs), unbounded for a forever-running job). The txn
    marker alone suffices: a replayed batch re-probes against an index
    that now contains its own bands, and the pair set it derives is the
    IDENTICAL deterministic set (minhash is pure, id_a < id_b excludes
    self-pairs, in-batch pairs reappear via both the self-probe and the
    index probe and dedup away), so the replay is a no-op commit, not a
    duplicate append. AvailableNow trigger = the nightly-cron semantics;
    a processing-time trigger makes it continuous.
    """
    from ..jobs.pipelines import incremental_dedup_ingest
    from ..sinks.versioned import VersionedTable

    def probe_and_commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        pairs = incremental_dedup_ingest(
            spark,
            index_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            app_id=f"near_dedup_stream:{index_path}",
            batch_id=batch_id,
        )
        VersionedTable(spark, pairs_path).append_txn(
            pairs,
            app_id=f"near_dedup_stream:pairs:{index_path}",
            batch_id=batch_id,
        )

    return (
        docs.writeStream.foreachBatch(probe_and_commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def web_corpus_stream(
    crawl: DataFrame,
    bench: DataFrame,
    url_index_path: str,
    out_path: str,
    checkpoint: str,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    decon_ngram: int = 8,
    bloom_m: int | None = None,
    bloom_k: int | None = None,
    domain_cap: int | None = None,
    domain_counts_path: str | None = None,
    domain_psl: DataFrame | None = None,
    robots: DataFrame | None = None,
):
    """Streaming form of ``jobs.pipelines.prepare_web_corpus``: each
    micro-batch of raw ``(id, url, html)`` pages is URL-canonicalized,
    deduped against every PREVIOUS batch's canonical URLs (the persisted
    url index — a re-crawl is dropped before its HTML is parsed, the
    same 100 TB cost-model ordering as the batch job), then extracted and
    two-tier bloom→exact decontaminated against the static ``bench``.

    Per micro-batch cost is O(batch) work plus one canonical-key
    equi-probe of the url index — the corpus is never re-parsed
    (near_dedup_stream's index-probe discipline, applied to URLs).

    ``robots`` (optional per-host ``(host, robots_txt)`` frame) applies
    the batch job's politeness gate inside prepare_web_corpus — see the
    call-site note on how it composes with the url index.

    ``domain_cap`` (optional; requires ``domain_counts_path``) enforces
    the batch job's per-registrable-domain quota ACROSS micro-batches:
    per-domain running totals persist as txn-marked increments (read =
    one map-side-combinable groupBy sum), each batch ranks its own docs
    per domain with the exact salted top-k and keeps rows while
    ``prior + rank <= cap`` — the url-index probe discipline applied to
    ``groupBy(domain)`` counters. NULL/unparseable urls each form their
    own quota group (never capped, never persisted to the counts table).

    Exactly-once under foreachBatch's at-least-once delivery: every sink
    is VersionedTable ``append_txn`` on (stream, batch_id), committed in
    the order OUT → domain counts → url index. Order is load-bearing
    twice over: (a) index LAST — with index-first, a crash between the
    commits would replay the batch against an index that already
    contains its own URLs, anti-join away every row, and commit ZERO
    docs — silent data loss; (b) counts BEFORE the index and AFTER out —
    a replay before the counts commit recomputes the IDENTICAL kept set
    (the counts the cap read are unchanged), so the increments appended
    always match the docs the out sink committed, and a replay after it
    is a txn no-op. The url index records the batch's full post-probe
    URL set (not the surviving docs'), so its content is independent of
    the cap decision and identical under any replay.

    BEHAVIOR NOTE (r8, applies with or without ``domain_cap``): because
    the index holds every URL ever PROBED, a URL whose first fetch was
    dropped downstream (decontaminated, capped) is never re-ingested even
    if a later crawl of it has changed content. That is the intended
    "first crawl wins per canonical URL" semantic — the dedup decision is
    about the URL, not the payload (the r7 survivors-only index silently
    re-admitted changed re-crawls of dropped pages, making output depend
    on crawl timing). Callers wanting content-level reconsideration
    should dedup on a content key instead (``dedup_stream`` /
    ``near_dedup_stream``).
    """
    from ..jobs.pipelines import prepare_web_corpus
    from ..sinks.versioned import VersionedTable

    from ..functions.web import canonical_url_expr

    if domain_cap is not None and domain_counts_path is None:
        raise ValueError("domain_cap needs a domain_counts_path")

    def fold_domain_counts(counts_tbl, batch_id: int) -> None:
        """Bound the counts table (the r8 verdict's growth finding): the
        increment history gains one small file per batch, and the prior
        probe re-aggregates ALL of it — O(batches × domains) on a
        long-running crawl. Once the live file count reaches the fold
        threshold, replace the history with its one-row-per-domain sum in
        a single overwrite commit, so every batch's prior read touches
        O(domains) rows across ≤ threshold files forever. Exactly-once is
        untouched: txn markers live in the LOG, which an overwrite
        preserves (the fold only swaps data files), the fold is
        content-neutral (same per-domain sums), and a replayed batch hits
        the folded table with its append marker already present — the
        soak test pins all three."""
        if len(counts_tbl.files_at()) < _COUNTS_FOLD_FILES:
            return
        folded = (
            counts_tbl.read()
            .groupBy("domain")
            .agg(F.sum("n").cast("long").alias("n"))
            .coalesce(1)
        )
        counts_tbl.overwrite(
            folded,
            txn=(f"web_corpus_stream:domains-fold:{out_path}", batch_id),
        )

    def clean_and_commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        url_index = VersionedTable(spark, url_index_path)
        batch = batch_df.withColumn(
            "url_canonical", F.expr(canonical_url_expr(url_col, "spark"))
        )
        if url_index.exists():
            # NULL canonical urls never match an anti-join key — every
            # no-url page survives the cross-batch dedup, exactly like
            # the batch job's per-row fallback key
            batch = batch.join(
                url_index.read().select("url_canonical"),
                "url_canonical",
                "left_anti",
            )
        # keep url_canonical: prepare_web_corpus reuses it (no second
        # regexp pass), and the index append below reads it
        batch = batch.localCheckpoint(eager=True)
        # robots rides through prepare_web_corpus (post-index-probe, so
        # the url index still records every PROBED url — a robots-dropped
        # page follows the documented first-crawl-wins posture exactly
        # like a decontaminated or capped one)
        docs = prepare_web_corpus(
            spark,
            batch,
            bench,
            html_col=html_col,
            url_col=url_col,
            id_col=id_col,
            text_col=text_col,
            decon_ngram=decon_ngram,
            bloom_m=bloom_m,
            bloom_k=bloom_k,
            robots=robots,
        )
        increments = None
        if domain_cap is not None:
            from ..functions.web import registrable_domain_expr
            from ..ops.skew import salted_topk

            counts_tbl = VersionedTable(spark, domain_counts_path)
            if domain_psl is not None:
                from ..functions.web import registrable_domain_psl

                docs = registrable_domain_psl(
                    docs, "url_canonical", domain_psl, out_col="_rdom"
                )
                base = F.col("_rdom")
            else:
                base = F.expr(
                    registrable_domain_expr("url_canonical", "spark")
                )
            domain = F.coalesce(
                F.nullif(base, F.lit("")),
                F.concat(F.lit("_nodomain_"), F.col(id_col).cast("string")),
            )
            dom = docs.withColumn("_domain", domain)
            if domain_psl is not None:
                dom = dom.drop("_rdom")
            if counts_tbl.exists():
                prior = counts_tbl.read().groupBy("domain").agg(
                    F.sum("n").alias("_prior")
                ).withColumnRenamed("domain", "_domain")
                dom = dom.join(prior, "_domain", "left")
            else:
                dom = dom.withColumn("_prior", F.lit(None).cast("long"))
            # rank within the batch per domain (exact salted top-k — a
            # heavy domain inside one batch must not stall one reducer),
            # keep while the running total stays under the cap
            ranked = salted_topk(
                dom,
                partition_by=["_domain"],
                order_by=[F.col(id_col)],
                k=domain_cap,
                salt_on=id_col,
            )
            kept = ranked.filter(
                F.col("rk") + F.coalesce(F.col("_prior"), F.lit(0))
                <= F.lit(domain_cap)
            )
            # cache the COMMON ancestor: increments (Aggregate∘Filter)
            # and docs (Project) both derive from `kept` — persisting only
            # the projected docs would leave the counts sink's plan
            # outside the cache and re-run the whole parse/decontaminate
            # pipeline once more per micro-batch
            increments = (
                kept.filter(~F.col("_domain").startswith("_nodomain_"))
                .groupBy(F.col("_domain").alias("domain"))
                .agg(F.count("*").cast("long").alias("n"))
            )
            docs = kept.drop("_domain", "_prior", "rk")
            cached = kept
        else:
            cached = docs
        # one computation feeds every sink; without the persist each
        # append re-parses the batch's HTML (the ingest-stream lesson)
        cached.persist()
        try:
            VersionedTable(spark, out_path).append_txn(
                docs,
                app_id=f"web_corpus_stream:{out_path}",
                batch_id=batch_id,
            )
            if increments is not None:
                # coalesce(1): a batch's domain set is small post-aggregate,
                # and one increment file per batch keeps the fold trigger
                # (file count) an honest proxy for history length
                counts_tbl.append_txn(
                    increments.coalesce(1),
                    app_id=f"web_corpus_stream:domains:{out_path}",
                    batch_id=batch_id,
                )
            url_index.append_txn(
                batch.select("url_canonical").where(
                    F.col("url_canonical").isNotNull()
                ).distinct(),
                app_id=f"web_corpus_stream:urls:{out_path}",
                batch_id=batch_id,
            )
        finally:
            cached.unpersist()
        if increments is not None:
            # AFTER the three ordered commits: a crash anywhere in the fold
            # replays the batch as three txn no-ops and re-folds; a folded
            # table re-enters below the threshold and early-outs
            fold_domain_counts(counts_tbl, batch_id)

    return (
        crawl.writeStream.foreachBatch(clean_and_commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
