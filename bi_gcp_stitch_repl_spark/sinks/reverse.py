"""Reverse-ETL writer (SURVEY.md K8): warehouse aggregates → batched POSTs.

The reference groups warehouse rows per company, assembles batches of 100
(10 effective) and POSTs each to HubSpot's ``batch/update`` with a failure
counter (``dags/hubspot/BM/hubspot_bm_company_status_v3.py:24-100``). The
Spark form is ``foreachPartition``: each partition builds its own batches
and posts them through an injected sender, so the fan-out scales with the
cluster instead of one Celery worker, and no rows ever pass through the
driver.

Failure semantics match the reference: a failed batch is counted and
reported, not retried into a poison loop; callers read the returned counts
(via the driver-side accumulator) and decide.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def post_batches(
    df: DataFrame,
    send: Callable[[list[dict]], bool],
    batch_size: int = 100,
    min_interval_sec: float = 0.0,
) -> tuple[int, int]:
    """POST ``df``'s rows in batches of ``batch_size`` per partition.

    ``send(batch) -> bool`` is the transport (True = accepted). Returns
    (ok_batches, failed_batches) aggregated across the cluster via
    accumulators — the reference's success/failure counters
    (``hubspot_bm_company_status_v3.py:44-54``).

    ``min_interval_sec`` rate-limits each partition's POST cadence (the
    reference slept 2-3 s between calls — SURVEY §2.12). Per-partition
    pacing means total request rate = partitions / interval: cap the
    global rate by sizing ``df.repartition(n)``, exactly how MAX_WORKERS
    bounded the reference's thread pool.

    **Delivery semantics: AT-LEAST-ONCE.** A Spark task that fails
    mid-partition (executor loss, fetch failure) — or a speculative
    duplicate attempt — replays the WHOLE partition, re-POSTing batches
    the external API already accepted; Spark has no transactional
    foreach. The receiving endpoint must therefore be idempotent: key
    the upsert on a natural id (the reference's company-status POST is
    exactly that), or dedupe server-side. Disable ``spark.speculation``
    for this stage; do NOT point this sink at an endpoint where
    replaying a batch double-applies (counters, payments). For
    exactly-once, land to a VersionedTable (append_txn) and let a
    downstream idempotent sync drain it.
    """
    import time

    sc = df.sparkSession.sparkContext
    ok_acc = sc.accumulator(0)
    fail_acc = sc.accumulator(0)

    def run(rows) -> None:
        batch: list[dict] = []
        last_send = [0.0]

        def flush() -> None:
            nonlocal batch
            if not batch:
                return
            if min_interval_sec > 0:
                wait = last_send[0] + min_interval_sec - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                last_send[0] = time.monotonic()
            try:
                accepted = send(batch)
            except Exception:
                accepted = False
            if accepted:
                ok_acc.add(1)
            else:
                fail_acc.add(1)
            batch = []

        for row in rows:
            # recursive: nested struct/array-of-struct columns otherwise
            # arrive as pyspark Row objects, which json.dumps rejects —
            # every batch would then count as failed with no indication why
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                flush()
        flush()

    df.foreachPartition(run)
    return ok_acc.value, fail_acc.value
