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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .rest import RetryPolicy


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
        self.page_size = int(options.get("page_size", "500"))
        self.total_rows = int(options["total_rows"])
        self.retries = int(options.get("retries", "5"))

    def partitions(self):
        return [
            _PagePartition(off, self.page_size)
            for off in range(0, self.total_rows, self.page_size)
        ]

    def read(self, partition: _PagePartition):
        transport = _load_factory(self.transport_path)()
        retry = RetryPolicy(total=self.retries)
        rows = retry.call(
            lambda: transport(
                self.url, {"offset": partition.offset, "limit": partition.limit}
            )
        )
        names = [f.name for f in self.schema_obj.fields]
        for row in rows:
            yield tuple(row.get(n) for n in names)


class RestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest"

    def reader(self, schema) -> DataSourceReader:
        return RestDataSourceReader(schema, self.options)
