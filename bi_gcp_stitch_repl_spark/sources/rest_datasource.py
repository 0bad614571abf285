"""REST scan as a Spark 4 Python Data Source: one input partition per page.

``sources.rest`` fetches pages on the driver (right for API-bound cadences);
this is the fully distributed form SURVEY S1 calls for at scale — page
fetching itself runs on executors, so a backfill over 10⁴ pages
parallelizes across the cluster:

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("rest")
          .schema("id long, amount double")
          .option("url", "https://api.example/items")
          .option("transport", "mymodule:make_transport")   # importable factory
          .option("total_rows", "100000")
          .option("page_size", "2000")
          .load())

Partition planning mirrors the reference's offset/limit protocol
(``dags/bexio/bexio_invoice_and_line_items_de.py:62-75``): the planner
splits [0, total_rows) into offset ranges; each executor task fetches its
own pages through the transport factory (a ``module:function`` path,
because the transport must be constructed ON the executor — sessions and
sockets don't pickle). Retry/backoff reuses ``rest.RetryPolicy``.

``total_rows`` bounds the scan; APIs that expose a count endpoint supply
it, otherwise use the driver-side iterators in ``sources.rest`` (unknown
length ⇒ sequential discovery by construction).
"""

from __future__ import annotations

import importlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .rest import RetryPolicy, paginate_keyset


def _load_factory(path: str):
    mod, _, fn = path.partition(":")
    return getattr(importlib.import_module(mod), fn)


class _PagePartition(InputPartition):
    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class RestDataSourceReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_obj = schema
        self.url = options["url"]
        self.transport_path = options["transport"]
        # same factory-argument channel the stream reader supports — a
        # supplied option must not be silently dropped on the batch path
        self.transport_arg = options.get("transport_arg")
        self.page_size = int(options.get("page_size", "500"))
        self.total_rows = int(options["total_rows"])
        self.retries = int(options.get("retries", "5"))

    def partitions(self):
        return [
            _PagePartition(off, self.page_size)
            for off in range(0, self.total_rows, self.page_size)
        ]

    def read(self, partition: _PagePartition):
        factory = _load_factory(self.transport_path)
        transport = (  # `is not None`, not truthiness: '' is a legitimate arg
            factory(self.transport_arg)
            if self.transport_arg is not None
            else factory()
        )
        retry = RetryPolicy(total=self.retries)
        rows = retry.call(
            lambda: transport(
                self.url, {"offset": partition.offset, "limit": partition.limit}
            )
        )
        names = [f.name for f in self.schema_obj.fields]
        for row in rows:
            yield tuple(row.get(n) for n in names)


class RestStreamReader(SimpleDataSourceStreamReader):
    """SURVEY S4 as a true Structured Streaming source: the keyset cursor
    IS the stream offset, checkpointed by the engine.

    The reference persists ``last_processed_id`` in an Airflow Variable and
    advances it by hand after each load (``dags/billwerk/billwerk_invoices.
    py:86-99,160-163``) — exactly the offset-management contract Structured
    Streaming already provides. Here each micro-batch keyset-pages from the
    committed cursor (capped at ``rows_per_batch``), the engine writes the
    new cursor to the checkpoint, and crash recovery replays
    ``readBetweenOffsets(start, end]`` deterministically — ids are the
    monotonic keyset cursor, so the replay filter is ``id <= end``.
    Exactly-once then composes with foreachBatch merge or an idempotent
    append sink downstream; ``Trigger.AvailableNow`` gives the reference's
    daily-cron cadence on the same code path.
    """

    def __init__(self, schema, options):
        self.schema_obj = schema
        self.url = options["url"]
        self.transport_path = options["transport"]
        # Optional string argument for the factory (e.g. an endpoint/config
        # path) — options are the only channel into the runner process.
        self.transport_arg = options.get("transport_arg")
        self.take = int(options.get("page_size", "500"))
        self.id_key = options.get("id_key", "Id")
        self.rows_per_batch = int(options.get("rows_per_batch", "100000"))
        self.retries = int(options.get("retries", "5"))

    def initialOffset(self) -> dict:
        return {"last_id": None}

    def _fetch(self, start_after, row_limit, stop_after_id=None):
        factory = _load_factory(self.transport_path)
        transport = (  # `is not None`, not truthiness: '' is a legitimate arg
            factory(self.transport_arg)
            if self.transport_arg is not None
            else factory()
        )
        retry = RetryPolicy(total=self.retries)
        rows: list[dict] = []
        for page in paginate_keyset(
            transport,
            self.url,
            take=self.take,
            id_key=self.id_key,
            start_after=start_after,
            row_limit=row_limit,
            retry=retry,
        ):
            rows.extend(page)
            if stop_after_id is not None and page[-1][self.id_key] >= stop_after_id:
                break  # replay upper bound reached (ids are monotonic)
        return rows

    def _tuples(self, rows):
        # a LIST, not a generator: the engine pickles prefetched batch rows
        # into the plan (simple-reader contract)
        names = [f.name for f in self.schema_obj.fields]
        return [tuple(r.get(n) for n in names) for r in rows]

    def read(self, start: dict):
        rows = self._fetch(start.get("last_id"), self.rows_per_batch)
        if not rows:
            return [], start
        end = {"last_id": rows[-1][self.id_key]}
        return self._tuples(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        last = end.get("last_id")
        # bound the replay at the committed end offset: fetching the whole
        # remaining upstream (which may have grown by millions of rows
        # since the crash) just to filter it down to one micro-batch is
        # unbounded in memory and API calls — pagination stops at the
        # first page whose last id reaches the bound (ids are monotonic)
        rows = self._fetch(start.get("last_id"), None, stop_after_id=last)
        return self._tuples([r for r in rows if r[self.id_key] <= last])


class RestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest"

    def reader(self, schema) -> DataSourceReader:
        return RestDataSourceReader(schema, self.options)

    def simpleStreamReader(self, schema) -> RestStreamReader:
        return RestStreamReader(schema, self.options)
